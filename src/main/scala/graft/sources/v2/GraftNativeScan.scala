package graft.sources.v2

import java.util.OptionalLong

import graft.sources.Manifest
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.execution.datasources.{FileFormat, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The NATIVE DataSourceV2 batch scan for catalog tables — admitted
  * parquet files become [[InputPartition]]s read through Spark's own
  * parquet reader ([[ParquetFileFormat.buildReaderWithPartitionValues]],
  * vectorized, footer-pushdown, the machinery FileSourceScanExec
  * ships), which buys the three capabilities the one-shot
  * [[org.apache.spark.sql.connector.read.V1Scan]] bridge structurally
  * could not offer:
  *
  *  - '''runtime (DPP-style) filtering''' ([[SupportsRuntimeFiltering]]):
  *    a selective dimension filter in a SQL star join arrives as an IN
  *    set on the join key AFTER physical planning; the scan re-admits
  *    its file list through the same envelope-sidecar tree decision
  *    ([[Manifest.admittedFilesFor]]) and re-plans partitions — at
  *    100 TB, the difference between scanning a day and scanning the
  *    table when the dimension side names that day;
  *  - '''statistics reporting''' ([[SupportsReportStatistics]]): exact
  *    byte size from the snapshot listing and exact row counts from
  *    the envelope sidecar (net of DV masks), so Spark's CBO
  *    broadcasts a small graft table instead of sort-merging it;
  *  - '''per-file DV masking''' without a join: the takedown-sized
  *    delete vectors ship as per-partition sorted position lists and
  *    the reader drops masked row indexes in a single merge pass.
  *
  * Claimed-filter honesty: filters the builder claimed as handled are
  * re-evaluated ROW-LEVEL here by a bound Catalyst predicate
  * ([[GraftNativeScan.boundFilterExpr]]) — parquet footer pushdown
  * alone only skips row groups, and a claimed filter Spark never
  * re-applies must hold exactly. DV-carrying files read with NO
  * parquet filters (row-group skipping would break positional
  * masking) and clean files read with the claimed filters pushed to
  * the footers; both paths then apply the bound predicate and project
  * to the pruned schema.
  *
  * Hive-partitioned snapshots stay on the V1 bridge ([[GraftScan]]):
  * their partition columns live in directory names a per-file reader
  * would drop.
  */
private[v2] class GraftNativeScan(path: String, pinned: Option[Long],
    snap: Manifest.Snapshot, required: StructType,
    claimed: Array[Filter], allFilters: Array[Filter],
    tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Scan with Batch
    with SupportsReportStatistics with SupportsRuntimeFiltering {

  private def spark: SparkSession = SparkSession.active

  private val filesWithLen: Seq[(String, Long)] =
    Manifest.listSnapshotFilesWithLen(spark, path, snap)
  private val sizeOf: Map[String, Long] = filesWithLen.toMap

  private val staticPred =
    allFilters.flatMap(GraftScan.toColumnLoose).reduceOption(_ && _)

  /** Files admitted by the STATIC predicate tree; narrowed in place by
    * [[filter]] when a runtime filter lands (And only ever shrinks the
    * admitted set — tree admission is conjunction-monotone). */
  @volatile private var admitted: Seq[String] = {
    staticPred
      .flatMap(p => Manifest.admittedFilesFor(spark, path, snap, p))
      .getOrElse(filesWithLen.map(_._1))
  }

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    GraftStreamFace.toMicroBatchStream(path, pinned, required, options,
      checkpointLocation)

  override def description(): String = {
    val v = pinned.fold("current")(v => s"v$v")
    s"graft-table $path @$v native cols=[${required.fieldNames.mkString(",")}] " +
      s"filters=[${claimed.mkString(", ")}]"
  }

  // ---- SupportsRuntimeFiltering --------------------------------------

  /** Only columns an envelope sidecar covers can narrow the file set —
    * offering anything else would make Spark build and ship a dynamic
    * filter the scan cannot use. Restricted to the scan's OUTPUT
    * columns: Spark resolves these refs against the pruned relation,
    * and a covered-but-unread column would fail that resolution (and
    * a runtime filter can only arrive on a join key, which is always
    * read). */
  override def filterAttributes(): Array[NamedReference] = {
    val covered = Manifest.envelopeColumns(spark, path, snap)
    required.fieldNames.filter(covered.contains)
      .map(Expressions.column)
  }

  override def filter(filters: Array[Filter]): Unit = {
    val runtime = filters.flatMap(GraftScan.toColumnLoose).toSeq
    if (runtime.nonEmpty) {
      val pred = (staticPred.toSeq ++ runtime).reduce(_ && _)
      Manifest.admittedFilesFor(spark, path, snap, pred)
        .foreach(rt => admitted = rt)
    }
  }

  // ---- SupportsReportStatistics --------------------------------------

  /** Exact bytes from the pinned listing; exact rows from the sidecar
    * minus the DV mask when the sidecar covers every admitted file.
    * Zero data-file opens either way — at 100 TB this is what lets the
    * CBO see a 2 MB dimension table as broadcastable without a single
    * footer read. */
  override def estimateStatistics(): Statistics = {
    val files = admitted
    val bytes = files.iterator.map(f => sizeOf.getOrElse(f, 0L)).sum
    val rows = Manifest.sidecarRawRowCount(spark, path, snap, files).map {
      raw =>
        val masked = Manifest.dvPositionsFor(spark, path, snap, files)
          .valuesIterator.map(_.length.toLong).sum
        raw - masked
    }
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong =
        rows.fold(OptionalLong.empty())(OptionalLong.of)
    }
  }

  // ---- Batch ----------------------------------------------------------

  override def planInputPartitions(): Array[InputPartition] = {
    val files = admitted
    GraftScanInfo.record(path, files)
    val dv = Manifest.dvPositionsFor(spark, path, snap, files)
    val maxBytes =
      org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes
    files.iterator.flatMap { f =>
      val len = sizeOf.getOrElse(f, 0L)
      val key = Manifest.relFileKey(
        new org.apache.hadoop.fs.Path(f).toUri.getPath)
      dv.get(key) match {
        case Some(positions) =>
          // positional masking needs the WHOLE file in one reader —
          // a split's row index would not start at 0
          Iterator.single(
            GraftFilePartition(f, 0L, len, positions): InputPartition)
        case None =>
          if (len <= maxBytes)
            Iterator.single(
              GraftFilePartition(f, 0L, len, Array.empty): InputPartition)
          else (0L until len by maxBytes).iterator.map(start =>
            GraftFilePartition(f, start, math.min(maxBytes, len - start),
              Array.empty): InputPartition)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftNativeScan.readerFactory(spark, snap, required, claimed,
      tableSchema)
}

private[v2] object GraftNativeScan {
  import org.apache.spark.sql.catalyst.{expressions => CE}
  import org.apache.spark.sql.{sources => S}

  /** The schema the parquet reader materializes: the pruned output
    * columns PLUS whatever the claimed filters reference — Spark
    * prunes claimed-filter columns out of `required`, but the honest
    * row-level re-check needs them; the reader output is then
    * projected back down to `required` (a prefix, by construction). */
  def readerSchemaFor(required: StructType, claimed: Array[Filter],
      tableSchema: StructType): StructType = {
    val extra = claimed.flatMap(_.references).distinct
      .filterNot(required.fieldNames.contains)
      .filter(tableSchema.fieldNames.contains)
    StructType(required.fields ++ extra.map(tableSchema(_)))
  }

  /** Build the partition-reader factory both catalog scans share:
    * parquet fields come from the file; a requested [[GraftFileMetaColumn]]
    * is synthesized per partition from the file's manifest-relative
    * key; claimed filters are re-checked row-level. `outOrdinals`
    * maps each output position to a parquet ordinal (or -1 for the
    * file-key column). */
  def readerFactory(spark: SparkSession, snap: Manifest.Snapshot,
      required: StructType, claimed: Array[Filter],
      tableSchema: StructType): PartitionReaderFactory = {
    val metaName = GraftFileMetaColumn.name()
    val dataRequired = StructType(
      required.fields.filterNot(_.name == metaName))
    val readerSchema = readerSchemaFor(dataRequired, claimed, tableSchema)
    var next = -1
    val outOrdinals: Array[Int] = required.fields.map { f =>
      if (f.name == metaName) -1 else { next += 1; next }
    }
    val dataSchema = Manifest.committedSchemaOf(snap).getOrElse(tableSchema)
    val fmt = new ParquetFileFormat()
    val opts = Map(FileFormat.OPTION_RETURNING_BATCH -> "false")
    val hc = spark.sessionState.newHadoopConf()
    val filtered = fmt.buildReaderWithPartitionValues(spark, dataSchema,
      new StructType(), readerSchema, claimed.toIndexedSeq, opts, hc)
    val plain =
      if (snap.meta.contains(Manifest.DvKey))
        fmt.buildReaderWithPartitionValues(spark, dataSchema,
          new StructType(), readerSchema, Nil, opts, hc)
      else filtered
    GraftNativeReaderFactory(filtered, plain,
      boundFilterExpr(claimed, readerSchema), readerSchema, outOrdinals)
  }

  /** True when every claimed filter can be re-evaluated natively —
    * all referenced columns are top-level table fields and the shape
    * is in [[boundFilterExpr]]'s vocabulary. The builder only routes
    * to the native scan when this holds (else the V1 bridge, which
    * applies claims through the inner frame, keeps the table sound). */
  def bindable(claimed: Array[Filter], tableSchema: StructType): Boolean = {
    val names = tableSchema.fieldNames.toSet
    claimed.forall(f => f.references.forall(names.contains)) && {
      val schema = readerSchemaFor(new StructType(), claimed, tableSchema)
      claimed.forall(f => toCatalyst(f, schema).nonEmpty)
    }
  }

  /** The claimed filters as ONE bound, serializable Catalyst predicate
    * over `readerSchema` ordinals — evaluated per row on executors. */
  def boundFilterExpr(claimed: Array[Filter],
      readerSchema: StructType): Option[CE.Expression] =
    claimed.toSeq.flatMap(f => toCatalyst(f, readerSchema))
      .reduceOption(CE.And)

  /** v1 Filter → bound Catalyst expression; the exact vocabulary
    * [[GraftScan.toColumn]] claims, so a claim is always re-checkable.
    * Values convert through `Literal.create` (external → internal
    * representation, e.g. String → UTF8String, java.sql.Date → days). */
  def toCatalyst(f: Filter, schema: StructType): Option[CE.Expression] = {
    def ref(name: String): Option[CE.BoundReference] = {
      val i = schema.fieldNames.indexOf(name)
      if (i < 0) None
      else Some(CE.BoundReference(i, schema(i).dataType, schema(i).nullable))
    }
    def lit(v: Any, dt: org.apache.spark.sql.types.DataType): CE.Expression =
      CE.Literal.create(v, dt)
    def cmp(a: String, v: Any,
        mk: (CE.Expression, CE.Expression) => CE.Expression)
        : Option[CE.Expression] =
      ref(a).map(b => mk(b, lit(v, b.dataType)))
    f match {
      case S.EqualTo(a, v) => cmp(a, v, CE.EqualTo)
      case S.EqualNullSafe(a, v) => cmp(a, v, CE.EqualNullSafe)
      case S.GreaterThan(a, v) => cmp(a, v, CE.GreaterThan)
      case S.GreaterThanOrEqual(a, v) => cmp(a, v, CE.GreaterThanOrEqual)
      case S.LessThan(a, v) => cmp(a, v, CE.LessThan)
      case S.LessThanOrEqual(a, v) => cmp(a, v, CE.LessThanOrEqual)
      case S.In(a, vs) => ref(a).map(b =>
        CE.In(b, vs.toIndexedSeq.map(v => lit(v, b.dataType))))
      case S.IsNull(a) => ref(a).map(CE.IsNull)
      case S.IsNotNull(a) => ref(a).map(CE.IsNotNull)
      case S.StringStartsWith(a, v) => cmp(a, v, CE.StartsWith)
      case S.StringEndsWith(a, v) => cmp(a, v, CE.EndsWith)
      case S.StringContains(a, v) => cmp(a, v, CE.Contains)
      case S.And(l, r) => for {
        a <- toCatalyst(l, schema); b <- toCatalyst(r, schema)
      } yield CE.And(a, b)
      case S.Or(l, r) => for {
        a <- toCatalyst(l, schema); b <- toCatalyst(r, schema)
      } yield CE.Or(a, b)
      case S.Not(c) => toCatalyst(c, schema).map(CE.Not)
      case _ => None
    }
  }
}

/** One admitted parquet file (or a byte-range split of one), plus its
  * sorted MoR-masked row positions (whole-file partitions only). */
private[v2] case class GraftFilePartition(file: String, start: Long,
    length: Long, dvPositions: Array[Long]) extends InputPartition

/** Wraps the driver-built parquet reader function: per partition,
  * read (footer-filtered for clean files, positional for DV files),
  * drop masked positions, re-check the claimed predicate, assemble
  * the output schema (parquet ordinals, -1 = the partition's
  * manifest-relative file key — the `_graft_file` metadata column). */
private[v2] case class GraftNativeReaderFactory(
    filtered: PartitionedFile => Iterator[InternalRow],
    plain: PartitionedFile => Iterator[InternalRow],
    predicate: Option[org.apache.spark.sql.catalyst.expressions.Expression],
    readerSchema: StructType, outOrdinals: Array[Int])
    extends PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, Predicate => CPred, UnsafeProjection}

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFilePartition]
    val pf = PartitionedFile(InternalRow.empty,
      SparkPath.fromPathString(p.file), p.start, p.length,
      Array.empty[String])
    val masked = p.dvPositions.nonEmpty
    val base = if (masked) plain(pf) else filtered(pf)
    // NO prefetch: the vectorized reader returns ONE mutable row view
    // advanced in place, so the wrapper must not call base.next()
    // until the consumer is done with the previous row — hasNext
    // finds the next live row, next() hands it over untouched.
    val rowsAfterDv: Iterator[InternalRow] =
      if (!masked) base
      else new Iterator[InternalRow] {
        private var pos = -1L
        private var di = 0
        private val dv = p.dvPositions
        private var pending: InternalRow = _
        override def hasNext: Boolean = {
          while (pending == null && base.hasNext) {
            val r = base.next(); pos += 1
            while (di < dv.length && dv(di) < pos) di += 1
            if (di < dv.length && dv(di) == pos) di += 1
            else pending = r
          }
          pending != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = pending; pending = null; r
        }
      }
    val checked = predicate match {
      case None => rowsAfterDv
      case Some(expr) =>
        val pr = CPred.create(expr)
        pr.initialize(0)
        rowsAfterDv.filter(pr.eval)
    }
    val identity = outOrdinals.length == readerSchema.length &&
      outOrdinals.zipWithIndex.forall { case (o, i) => o == i }
    val out =
      if (identity) checked
      else {
        // assemble output: parquet ordinals straight through, the
        // file-key metadata column (-1) from a constant side row
        val keyRow = InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(
            Manifest.relFileKey(
              new org.apache.hadoop.fs.Path(p.file).toUri.getPath)))
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow()
        val width = readerSchema.length
        val proj = UnsafeProjection.create(
          outOrdinals.map { o =>
            if (o >= 0) BoundReference(o, readerSchema(o).dataType,
              readerSchema(o).nullable): Expression
            else BoundReference(width,
              org.apache.spark.sql.types.StringType,
              nullable = false): Expression
          })
        checked.map(r => proj(joined(r, keyRow)))
      }
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean =
        if (out.hasNext) { row = out.next(); true } else false
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** The one streaming face both batch scans share. */
private[v2] object GraftStreamFace {
  def toMicroBatchStream(path: String, pinned: Option[Long],
      required: StructType, options: CaseInsensitiveStringMap,
      checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(pinned.isEmpty,
      "graft catalog: a VERSION/TIMESTAMP AS OF table cannot stream — " +
        "a pinned snapshot has no tail; stream the bare table")
    def bool(k: String) = Option(options.get(k))
      .exists(_.trim.equalsIgnoreCase("true"))
    require(!bool("changefeed"),
      "graft catalog: changeFeed widens the schema with CDC columns, " +
        "which a catalog table's fixed schema cannot carry — use " +
        "spark.readStream.format(\"graft-table\").option(\"changeFeed\", " +
        "\"true\") for the row-level feed")
    val latest = Option(options.get("startingversion"))
      .orElse(Option(options.get("startingVersion")))
      .exists(_.trim.equalsIgnoreCase("latest"))
    val o = graft.sources.ManifestStream.Opts(path, changeFeed = false,
      ignoreDeletes = bool("ignoredeletes"), startLatest = latest)
    new graft.sources.ManifestMicroBatchStream(SparkSession.active, o,
      required, checkpointLocation)
  }
}
