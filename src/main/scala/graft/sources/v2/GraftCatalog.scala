package graft.sources.v2

import java.util

import graft.sources.Manifest
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{functions => F}

/** The SQL front door for manifested tables — engine-side completion
  * of O17 (the reference's `cube_field.rb:33-38` routes every query to
  * a NAMED CONNECTION; the Spark analogue of "a named connection any
  * external tool can speak" is a registered `TableCatalog`):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.v2.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.root", "/lake")
  *   spark.sql("SELECT day, count(*) FROM graft.db.events " +
  *     "WHERE day BETWEEN '2024-01-01' AND '2024-01-07' GROUP BY 1")
  *   spark.sql("SELECT * FROM graft.db.events VERSION AS OF 3")
  *   spark.sql("SELECT * FROM graft.db.events VERSION AS OF 'corpus-v1'")
  *   spark.sql("SELECT * FROM graft.db.events TIMESTAMP AS OF '2024-02-01'")
  * }}}
  *
  * Every manifest capability rides along without the CubeQuery front
  * door: reads pin a SNAPSHOT at scan-build time (immune to concurrent
  * commits and, inside the retention window, to vacuum), `VERSION AS
  * OF` resolves integers to versions and anything else to a TAG,
  * `TIMESTAMP AS OF` resolves through the commit wall clock, WHERE
  * filters prune FILES at the driver through both envelope-sidecar
  * families with full OR/IN tree admission ([[Manifest.admittedFilesFor]]),
  * MoR delete vectors mask deleted rows, and an evolved snapshot
  * serves pre-evolution files with NULL new columns.
  *
  * Read path: the scan implements the public [[V1Scan]] bridge, whose
  * relation returns the INNER Manifest frame's `InternalRow` RDD with
  * `needConversion = false` — the JDBC source's own pattern — so the
  * underlying parquet scan keeps columnar reads, predicate pushdown
  * (pushed filters are re-applied to the inner frame, reaching the
  * footers) and whole-stage codegen, with zero per-row conversion at
  * the bridge. Filters are additionally reported back to Spark as
  * residuals, so the engine re-applies them above the scan — the
  * standard sound double-application every file source does.
  *
  * The catalog is READ-ONLY by design: writes go through the
  * `Manifest.*` verbs (create/commitAppend/merge/deleteWhere/...),
  * whose optimistic-concurrency and WAP semantics a blind SQL INSERT
  * could not honor. DDL methods therefore refuse loudly.
  *
  * At 100 TB: table resolution and file skipping are driver metadata
  * (one manifest read + sidecar parquet reads); the data plan is the
  * same pruned, DV-masked parquet scan the native API serves — the
  * catalog adds interoperability, not a second execution path.
  */
class GraftCatalog extends TableCatalog {
  private var catName: String = _
  private var initRoot: Option[String] = None

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    initRoot = Option(options.get("root"))
  }

  override def name(): String = catName

  /** Root is re-read from the ACTIVE session conf on every resolution,
    * falling back to the initialize-time option — catalog instances
    * are cached per name by Spark's CatalogManager, and a stale root
    * captured at first load would silently serve the wrong warehouse
    * after a conf change (tests and multi-warehouse sessions both
    * re-point roots). */
  private def root: String =
    SparkSession.active.conf
      .getOption(s"spark.sql.catalog.$catName.root")
      .orElse(initRoot)
      .getOrElse(sys.error(
        s"GraftCatalog '$catName': set spark.sql.catalog.$catName.root"))

  private def pathOf(ident: Identifier): String =
    (root +: ident.namespace() :+ ident.name()).mkString("/")

  private def spark: SparkSession = SparkSession.active

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new java.io.File((root +: namespace).mkString("/"))
    if (!dir.isDirectory)
      throw new NoSuchNamespaceException(catName +: namespace)
    dir.listFiles().filter(f =>
        new java.io.File(f, "_manifest").isDirectory)
      .map(f => Identifier.of(namespace, f.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val path = pathOf(ident)
    if (!Manifest.isManifested(spark, path))
      throw new NoSuchTableException(ident)
    new GraftTable(path, None)
  }

  /** `VERSION AS OF x`: an integer pins that snapshot version; any
    * other string resolves as a TAG name — `VERSION AS OF 'corpus-v1'`
    * is the release-pinning read. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = pathOf(ident)
    if (!Manifest.isManifested(spark, path))
      throw new NoSuchTableException(ident)
    val v = version.toLongOption
      .getOrElse(Manifest.tagVersion(spark, path, version))
    require(Manifest.versions(spark, path).contains(v),
      s"GraftCatalog: $path has no retained version $v (vacuumed?)")
    new GraftTable(path, Some(v))
  }

  /** `TIMESTAMP AS OF t`: Spark hands MICROseconds since epoch; the
    * manifest's commit stamps are millis. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = pathOf(ident)
    if (!Manifest.isManifested(spark, path))
      throw new NoSuchTableException(ident)
    new GraftTable(path,
      Some(Manifest.versionAt(spark, path, timestampMicros / 1000L)))
  }

  private def readOnly: Nothing = throw new UnsupportedOperationException(
    s"GraftCatalog '$catName' is read-only — write through the " +
      "Manifest.* verbs (create/commitAppend/merge/deleteWhere/...), " +
      "whose optimistic-concurrency commits a blind SQL write cannot honor")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = readOnly
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = readOnly
  override def dropTable(ident: Identifier): Boolean = readOnly
  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly
}

/** Observability hook: the most recent scan's admitted file list per
  * table path — what a spec (or an operator watching skip rates) pins
  * the driver-side pruning decision against, since `Dataset.inputFiles`
  * cannot see through a non-FileTable DSv2 relation. */
object GraftScanInfo {
  private val last =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
  private[v2] def record(table: String, files: Seq[String]): Unit =
    last.put(table, files)
  def lastFiles(table: String): Option[Seq[String]] = Option(last.get(table))
}

private[v2] class GraftTable(path: String, pinned: Option[Long])
    extends Table with SupportsRead {
  override def name(): String = path + pinned.fold("")(v => s"@v$v")

  override lazy val schema: StructType = pinned match {
    case Some(v) => Manifest.readVersion(SparkSession.active, path, v).schema
    case None => Manifest.read(SparkSession.active, path).schema
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path, pinned, schema)
}

private[v2] class GraftScanBuilder(path: String, pinned: Option[Long],
    tableSchema: StructType) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = tableSchema
  private var accepted: Array[Filter] = Array.empty

  /** Every filter is kept for the DRIVER file-skipping decision and
    * re-applied to the inner frame (reaching the parquet footers), but
    * ALL filters are also returned as residuals so Spark re-evaluates
    * them above the scan — pruning may only ever drop files, never
    * substitute for the predicate. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters
    filters
  }
  override def pushedFilters(): Array[Filter] =
    accepted.filter(f => GraftScan.toColumn(f).nonEmpty)

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftScan(path, pinned, required, accepted)
}

private[v2] class GraftScan(path: String, pinned: Option[Long],
    required: StructType, filters: Array[Filter]) extends V1Scan {

  override def readSchema(): StructType = required

  override def description(): String = {
    val v = pinned.fold("current")(v => s"v$v")
    s"graft-table $path @$v cols=[${required.fieldNames.mkString(",")}] " +
      s"filters=[${filters.mkString(", ")}]"
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val scan = this
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = required
      // the inner frame's toRdd already carries InternalRows — the
      // JDBC source's zero-conversion bridge contract
      override def needConversion: Boolean = false
      override def buildScan(): org.apache.spark.rdd.RDD[Row] =
        scan.innerFrame(context.sparkSession).queryExecution.toRdd
          .asInstanceOf[org.apache.spark.rdd.RDD[Row]]
    }.asInstanceOf[T]
  }

  /** The Manifest-served frame this scan wraps: snapshot-pinned,
    * file-skipped from the pushed filters' tree, DV-masked, filtered
    * (sound double-application; also what reaches parquet's row-group
    * stats), and projected to exactly the pruned schema. */
  private[v2] def innerFrame(spark: SparkSession): DataFrame = {
    val pred = GraftScan.toPredicate(filters)
    val (df, admitted) = Manifest.readAdmitted(spark, path, pinned, pred)
    GraftScanInfo.record(path, admitted)
    val filtered = pred.fold(df)(df.filter)
    if (required.fieldNames.sameElements(filtered.columns)) filtered
    else filtered.select(required.fieldNames.toIndexedSeq.map(F.col): _*)
  }
}

private[v2] object GraftScan {
  /** v1 Filter → Column, EXACT translations only (None = the filter
    * stays a Spark-side residual; since every filter is re-applied
    * above the scan anyway, dropping an untranslatable conjunct is
    * sound — it only widens the inner read). */
  def toColumn(f: Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(F.col(a) === F.lit(v))
    case sources.EqualNullSafe(a, v) => Some(F.col(a) <=> F.lit(v))
    case sources.GreaterThan(a, v) => Some(F.col(a) > F.lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(F.col(a) >= F.lit(v))
    case sources.LessThan(a, v) => Some(F.col(a) < F.lit(v))
    case sources.LessThanOrEqual(a, v) => Some(F.col(a) <= F.lit(v))
    case sources.In(a, vs) => Some(F.col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(F.col(a).isNull)
    case sources.IsNotNull(a) => Some(F.col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(F.col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(F.col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(F.col(a).contains(v))
    case sources.And(l, r) => (toColumn(l), toColumn(r)) match {
      // one translatable conjunct alone is still sound (a superset)
      case (Some(a), Some(b)) => Some(a && b)
      case (Some(a), None) => Some(a)
      case (None, Some(b)) => Some(b)
      case _ => None
    }
    case sources.Or(l, r) => for {
      a <- toColumn(l); b <- toColumn(r) // BOTH, or the Or is dropped
    } yield a || b
    case sources.Not(c) => toColumn(c).map(!_) // exact inner only
    case _ => None
  }

  def toPredicate(filters: Array[Filter]): Option[Column] =
    filters.flatMap(toColumn).reduceOption(_ && _)
}
