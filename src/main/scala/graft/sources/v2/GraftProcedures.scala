package graft.sources.v2

import java.util.Collections

import graft.sources.Manifest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The SQL maintenance verbs — `CALL graft.system.<verb>(…)` — so the
  * whole operate-a-table loop the maintenance advisor recommends runs
  * from plain SQL, no Scala in sight:
  *
  * {{{
  *   CALL graft.system.advise(table => 'db/docs')
  *   CALL graft.system.compact(table => 'db/docs', target_mb => 1024)
  *   CALL graft.system.compact(table => 'db/docs',       -- Z-ORDER
  *     sort_columns => 'doc_id,n_chars', zorder_bits => 8)
  *   CALL graft.system.fold_deletes(table => 'db/docs')
  *   CALL graft.system.analyze(table => 'db/docs',
  *     columns => 'doc_id,n_chars', string_columns => 'source')
  *   CALL graft.system.vacuum(table => 'db/docs', keep => 5)
  *   CALL graft.system.history(table => 'db/docs')
  *   CALL graft.system.restore(table => 'db/docs', version => 3)
  *   CALL graft.system.tag(table => 'db/docs', name => 'corpus-v1')
  *   CALL graft.system.drop_tag(table => 'db/docs', name => 'corpus-v1')
  *   CALL graft.system.adopt(table => 'db/plain_parquet_dir')
  * }}}
  *
  * `compact(sort_columns => …)` with ONE column is a linear clustered
  * rewrite; with TWO it threads [[graft.sources.Layout.zValue]] — the
  * z-order maintenance loop becomes SQL-drivable end to end.
  * `history` serves the [[Manifest.history]] ledger (one row per
  * retained version: version, commit time, operation verb, entry
  * count) — "what happened to this table", the first operator
  * question, from SQL.
  *
  * Each verb IS the corresponding Manifest call (same optimistic
  * commits, same guards — a racing writer fails the verb loudly,
  * never a half state), and each returns a one-row summary (advise
  * returns the full report) as a LocalScan — driver metadata, no
  * executor work beyond what the verb itself distributes. `table` is
  * the warehouse-relative path (`namespace/name`, matching the
  * catalog's own layout).
  */
private[v2] object GraftProcedures {

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      Names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  private val Names = Seq("advise", "compact", "fold_deletes", "analyze",
    "vacuum", "history", "restore", "tag", "drop_tag", "adopt", "convert",
    "branch", "publish_branch", "drop_branch")

  def load(root: => String, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")) &&
      Names.contains(ident.name()),
      s"graft catalog: unknown procedure ${ident.namespace().mkString(".")}" +
        s".${ident.name()} — available: ${Names.map("system." + _).mkString(", ")}")
    new GraftProcedure(root, ident.name())
  }
}

private[v2] class GraftProcedure(root: => String, verb: String)
    extends UnboundProcedure with BoundProcedure {
  private def spark: SparkSession = SparkSession.active

  override def name(): String = verb
  override def description(): String = s"graft maintenance verb '$verb'"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false // commits move state

  private def p(n: String, dt: DataType) =
    ProcedureParameter.in(n, dt).build()
  private def pd(n: String, dt: DataType, default: String) =
    ProcedureParameter.in(n, dt).defaultValue(default).build()

  override def parameters(): Array[ProcedureParameter] = verb match {
    case "advise" | "fold_deletes" | "history" =>
      Array(p("table", StringType))
    case "compact" =>
      Array(p("table", StringType), pd("target_mb", IntegerType, "1024"),
        pd("sort_columns", StringType, "''"),
        pd("zorder_bits", IntegerType, "8"))
    case "analyze" =>
      Array(p("table", StringType), pd("columns", StringType, "''"),
        pd("string_columns", StringType, "''"))
    case "vacuum" =>
      Array(p("table", StringType), pd("keep", IntegerType, "2"),
        pd("retain_hours", IntegerType, "0"))
    case "restore" =>
      Array(p("table", StringType), p("version", LongType))
    case "tag" =>
      Array(p("table", StringType), p("name", StringType),
        pd("version", LongType, "-1"))
    case "drop_tag" =>
      Array(p("table", StringType), p("name", StringType))
    case "adopt" => Array(p("table", StringType))
    case "convert" =>
      Array(p("table", StringType), pd("target_mb", IntegerType, "1024"),
        pd("sort_columns", StringType, "''"))
    case "branch" | "publish_branch" | "drop_branch" =>
      Array(p("table", StringType), p("name", StringType))
  }

  private def out(fields: (String, DataType)*)(values: Any*): Scan = {
    val schema = StructType(fields.map { case (n, t) => StructField(n, t) })
    val row = InternalRow.fromSeq(values.map {
      case s: String => UTF8String.fromString(s)
      case other => other
    })
    new LocalScan {
      override def rows(): Array[InternalRow] = Array(row)
      override def readSchema(): StructType = schema
      override def description(): String = s"graft system.$verb result"
    }
  }

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    require(!input.isNullAt(0),
      s"graft system.$verb: table must not be NULL")
    val table = s"$root/${input.getString(0)}"
    if (verb == "adopt")
      require(!Manifest.isManifested(spark, table),
        s"graft system.adopt: $table is already manifested")
    else require(Manifest.isManifested(spark, table),
      s"graft system.$verb: $table is not a manifested table")
    val scan: Scan = verb match {
      case "advise" =>
        val report = Manifest.adviseMaintenance(spark, table)
        val schema = report.schema
        val reportRows: Array[InternalRow] =
          report.queryExecution.toRdd.collect().map(_.copy())
        new LocalScan {
          override def rows(): Array[InternalRow] = reportRows
          override def readSchema(): StructType = schema
          override def description(): String = "graft system.advise report"
        }
      case "compact" =>
        def intArg(i: Int, dflt: Int) =
          if (input.isNullAt(i)) dflt else input.getInt(i)
        val sortCols = (if (input.isNullAt(2)) None
          else Option(input.getString(2))).map(_.trim).filter(_.nonEmpty)
          .map(_.split(',').toSeq.map(_.trim)).getOrElse(Nil)
        // `sort_columns`: one column = a linear clustered rewrite;
        // two = a Z-ORDER rewrite (Morton-interleaved bucket ids via
        // [[graft.sources.Layout]]) so BOTH axes prune after the
        // compaction. Domain bounds come from the snapshot itself —
        // sound here, unlike incremental writes, because a compaction
        // rewrites the WHOLE key space in one pass.
        val sortBy: Option[org.apache.spark.sql.Column] = sortCols match {
          case Nil => None
          case Seq(c) => Some(org.apache.spark.sql.functions.col(c))
          case Seq(c1, c2) =>
            import org.apache.spark.sql.{functions => F}
            val bits = intArg(3, 8)
            val b = Manifest.read(spark, table).agg(
              F.min(F.col(c1).cast("double")),
              F.max(F.col(c1).cast("double")),
              F.min(F.col(c2).cast("double")),
              F.max(F.col(c2).cast("double"))).head()
            require(!b.isNullAt(0) && !b.isNullAt(2),
              s"graft system.compact: sort_columns $c1,$c2 are all-NULL " +
                "— nothing to cluster on")
            def hi(lo: Double, h: Double) =
              h + math.max((h - lo) * 1e-6, java.lang.Math.ulp(h))
            Some(graft.sources.Layout.zValue(
              graft.sources.Layout.axisBucket(F.col(c1),
                b.getDouble(0), hi(b.getDouble(0), b.getDouble(1)), bits),
              graft.sources.Layout.axisBucket(F.col(c2),
                b.getDouble(2), hi(b.getDouble(2), b.getDouble(3)), bits),
              bits))
          case more => throw new IllegalArgumentException(
            "graft system.compact: sort_columns takes at most TWO " +
              s"columns (the z-curve is 2-axis), got ${more.size}")
        }
        val snap = Manifest.compact(spark, table,
          targetBytes = intArg(1, 1024).toLong << 20, sortBy = sortBy)
        out("version" -> LongType, "n_entries" -> IntegerType)(
          snap.version, snap.paths.size)
      case "restore" =>
        // also the UNDROP: restore is the one verb a dropped table's
        // commit guard admits
        require(!input.isNullAt(1),
          "graft system.restore: version must not be NULL")
        val snap = Manifest.restore(spark, table, input.getLong(1))
        out("version" -> LongType, "restored_from" -> LongType)(
          snap.version, input.getLong(1))
      case "tag" =>
        require(!input.isNullAt(1),
          "graft system.tag: name must not be NULL")
        val v = if (input.isNullAt(2)) -1L else input.getLong(2)
        val pinned = Manifest.tag(spark, table,
          input.getString(1), version = v)
        out("tag" -> StringType, "version" -> LongType)(
          input.getString(1), pinned)
      case "drop_tag" =>
        require(!input.isNullAt(1),
          "graft system.drop_tag: name must not be NULL")
        Manifest.deleteTag(spark, table, input.getString(1))
        out("tag" -> StringType, "dropped" -> IntegerType)(
          input.getString(1), 1)
      case "adopt" =>
        val snap = Manifest.adopt(spark, table)
        out("version" -> LongType, "n_entries" -> IntegerType)(
          snap.version, snap.paths.size)
      case "convert" =>
        // hive → flat manifested layout: one atomic rewrite commit;
        // evolution/mapping/DV/sidecars unlock, old hive dirs stay
        // for pinned readers until vacuum
        val targetMb = if (input.isNullAt(1)) 1024 else input.getInt(1)
        val sortCols = (if (input.isNullAt(2)) None
          else Option(input.getString(2))).map(_.trim).filter(_.nonEmpty)
          .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
          .filter(_.nonEmpty)
        val sortBy = sortCols.map(cs =>
          org.apache.spark.sql.functions.struct(
            cs.map(org.apache.spark.sql.functions.col): _*))
        val snap = Manifest.convert(spark, table, sortBy,
          targetBytes = targetMb.toLong << 20)
        out("version" -> LongType, "n_entries" -> IntegerType)(
          snap.version, snap.paths.size)
      case "branch" =>
        require(!input.isNullAt(1),
          "graft system.branch: name must not be NULL")
        val snap = Manifest.branchCreate(spark, table, input.getString(1))
        out("branch" -> StringType, "forked_from" -> LongType)(
          input.getString(1), snap.meta("forked_from").toLong)
      case "publish_branch" =>
        require(!input.isNullAt(1),
          "graft system.publish_branch: name must not be NULL")
        val snap = Manifest.publishBranch(spark, table, input.getString(1))
        out("version" -> LongType, "n_entries" -> IntegerType)(
          snap.version, snap.paths.size)
      case "drop_branch" =>
        require(!input.isNullAt(1),
          "graft system.drop_branch: name must not be NULL")
        Manifest.dropBranch(spark, table, input.getString(1))
        out("branch" -> StringType, "dropped" -> IntegerType)(
          input.getString(1), 1)
      case "history" =>
        val report = Manifest.history(spark, table)
        val schema = report.schema
        val historyRows: Array[InternalRow] =
          report.queryExecution.toRdd.collect().map(_.copy())
        new LocalScan {
          override def rows(): Array[InternalRow] = historyRows
          override def readSchema(): StructType = schema
          override def description(): String = "graft system.history ledger"
        }
      case "fold_deletes" =>
        val snap = Manifest.foldDeletes(spark, table)
        out("version" -> LongType, "n_entries" -> IntegerType)(
          snap.version, snap.paths.size)
      case "analyze" =>
        // isNullAt BEFORE getString: an explicit NULL argument reaches
        // here as a null UTF8String, whose toString-inside-getString
        // NPEs before Option could wrap it
        def cols(i: Int) = (if (input.isNullAt(i)) None
          else Option(input.getString(i))).map(_.trim)
          .filter(_.nonEmpty).map(_.split(',').toSeq.map(_.trim))
          .getOrElse(Nil)
        val (num, str) = (cols(1), cols(2))
        require(num.nonEmpty || str.nonEmpty,
          "graft system.analyze: give columns and/or string_columns")
        val scannedNum =
          if (num.nonEmpty) Manifest.analyzeFiles(spark, table, num) else 0
        val scannedStr =
          if (str.nonEmpty) Manifest.analyzeFilesString(spark, table, str)
          else 0
        out("files_scanned_numeric" -> IntegerType,
          "files_scanned_string" -> IntegerType)(scannedNum, scannedStr)
      case "vacuum" =>
        def intArg(i: Int, dflt: Int) =
          if (input.isNullAt(i)) dflt else input.getInt(i)
        val before = Manifest.versions(spark, table).size
        Manifest.vacuum(spark, table, keep = intArg(1, 2),
          retainMs = intArg(2, 0).toLong * 3600 * 1000)
        val after = Manifest.versions(spark, table).size
        out("versions_before" -> IntegerType,
          "versions_retained" -> IntegerType)(before, after)
    }
    Collections.singletonList(scan).iterator()
  }
}
