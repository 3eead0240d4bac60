package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{functions => F}

/** Structured Streaming SOURCE over a manifested table — the read-side
  * complement of the exactly-once sinks: a manifested table becomes a
  * tailable stream whose offsets are SNAPSHOT VERSIONS, so a restarted
  * stream resumes from its checkpointed version with no rows lost or
  * repeated (snapshots are immutable within the retention window, so a
  * replayed `(v1, v2]` batch is bit-identical — the property the
  * engine's offset log turns into exactly-once). This is the
  * Delta-style "stream from a table" face (reference behavior scope:
  * activecube serves only batch queries; streaming tails are this
  * engine's extension), and it completes the incremental story:
  * manifest table → versioned stream → [[graft.streaming.Streaming]]
  * sinks lands table-to-table pipelines where BOTH ends are
  * exactly-once.
  *
  * Modes (options on `spark.readStream.format("graft-table")`):
  *   - default (append): the initial batch serves the FULL snapshot
  *     current at first trigger, then each batch serves the rows
  *     appended by `(v1, v2]`. A commit that removed or masked rows
  *     FAILS the stream loudly — an append-only consumer cannot
  *     represent it.
  *   - `ignoreDeletes=true`: delete-carrying spans serve their NET
  *     inserted rows and drop the deletes (the consumer owns the
  *     divergence — same contract as Delta's ignoreDeletes).
  *   - `changeFeed=true`: the full row-level feed — table columns plus
  *     `_change_type` ('insert'|'delete') and `_commit_version`,
  *     attributed per commit.
  *   - `startingVersion=latest`: skip the initial snapshot and tail
  *     only commits after stream start (the "new data only" shape).
  *   - `startingVersion=N`: resume from version N — the first span
  *     serves the net effect of commits N..now (requires snapshot N-1
  *     retained; N=1 ≡ the default full-snapshot start). The
  *     downstream CDC consumer's "I have processed through N-1" shape.
  *
  * Scale: every batch is costed by WHAT CHANGED, never by the table —
  * a pure-append span is detected STRUCTURALLY from the manifest diff
  * (no removed entries, delete-vector and schema metadata unchanged)
  * and reads exactly the appended entries; only genuinely
  * delete-carrying spans pay [[Manifest.readChanges]]'s
  * changed-entries multiset diff. At 100 TB the per-trigger driver
  * work is one directory listing plus two manifest parses.
  *
  * Guards: a vacuumed start version or a schema evolution inside the
  * span fails loudly with the recovery path (fresh checkpoint /
  * restart to adopt the new schema — the restarted source freezes the
  * WIDENED schema and serves pre-evolution rows NULL-filled, exactly
  * like the batch reader).
  */
object ManifestStream {

  private[graft] final case class Opts(table: String, changeFeed: Boolean,
      ignoreDeletes: Boolean, startLatest: Boolean,
      startAt: Option[Long] = None, startTs: Option[Long] = None)

  private[graft] def opts(parameters: Map[String, String]): Opts = {
    val table = parameters.getOrElse("path", sys.error(
      "graft-table stream: option 'path' (the manifested table root) is required"))
    def bool(k: String) = parameters.get(k).exists(_.trim.equalsIgnoreCase("true"))
    val cf = bool("changefeed")
    val ign = bool("ignoredeletes")
    require(!(cf && ign),
      "graft-table stream: changeFeed and ignoreDeletes are mutually exclusive")
    // startingVersion: 'latest' tails from the version current at
    // stream creation; a NUMBER N serves the effect of commits N..now
    // (the CDC-consumer resume shape — requires version N-1 retained,
    // since a span is a snapshot diff; N=1 ≡ the default full-snapshot
    // start); omitted = the full current snapshot first, then the tail
    var latest = false
    var startAt: Option[Long] = None
    parameters.get("startingversion").foreach { v =>
      if (v.trim.equalsIgnoreCase("latest")) latest = true
      else v.trim.toLongOption match {
        case Some(n) if n >= 1 => if (n > 1) startAt = Some(n)
        case _ => sys.error(
          s"graft-table stream: startingVersion='$v' unsupported — " +
            "'latest', a version number >= 1, or omit it to serve the " +
            "full current snapshot first")
      }
    }
    // startingTimestamp: resume at a WALL-CLOCK instant — resolved to
    // the first version committed at or after it when the source
    // starts (the commit stamps are the same clock readAsOf uses)
    val startTs = parameters.get("startingtimestamp").map(parseTs)
    require(startTs.isEmpty || (startAt.isEmpty && !latest),
      "graft-table stream: startingTimestamp and startingVersion are " +
        "mutually exclusive")
    Opts(table, cf, ign, latest, startAt, startTs)
  }

  /** Epoch millis of a `startingTimestamp` value: bare millis, a
    * date (`yyyy-MM-dd`, UTC midnight), a local timestamp
    * (`yyyy-MM-dd HH:mm:ss[.S]`, session-naive = UTC here), or an ISO
    * instant. */
  private[graft] def parseTs(v: String): Long = {
    val t = v.trim
    t.toLongOption.getOrElse {
      try java.time.Instant.parse(t).toEpochMilli
      catch { case _: java.time.format.DateTimeParseException =>
        try java.time.LocalDate.parse(t)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
        catch { case _: java.time.format.DateTimeParseException =>
          try java.time.LocalDateTime.parse(t.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          catch { case _: java.time.format.DateTimeParseException =>
            sys.error(s"graft-table stream: cannot parse " +
              s"startingTimestamp='$v' — use epoch millis, yyyy-MM-dd, " +
              "yyyy-MM-dd HH:mm:ss, or an ISO instant")
          }
        }
      }
    }
  }

  /** The FIRST version whose commit stamp is at or after `ts` — the
    * startingTimestamp resolution. Refuses when the answer could be
    * hidden in a vacuumed window (the matched version's predecessor
    * must be retained with a stamp strictly before `ts`, unless the
    * match is version 1 — then nothing precedes it); returns
    * `last+1` when every retained commit precedes `ts` (the stream
    * tails forward from creation, serving nothing until new commits
    * land). */
  private[graft] def versionAtOrAfter(spark: SparkSession, table: String,
      ts: Long): Long = {
    val vs = Manifest.versions(spark, table)
    require(vs.nonEmpty,
      s"graft-table stream: $table has no committed snapshot")
    def stamp(v: Long): Long = Manifest.readSnapshotMeta(spark, table, v)
      .get("committed_at").map(_.toLong).getOrElse(0L)
    vs.find(v => stamp(v) >= ts) match {
      case None => vs.last + 1
      case Some(v) =>
        require(v == 1L || (vs.contains(v - 1) && stamp(v - 1) < ts),
          s"graft-table stream: cannot resolve startingTimestamp=$ts on " +
            s"$table — versions before v$v were vacuumed, so commits in " +
            "the window cannot be proven earlier than the instant; use " +
            "startingVersion or a fresh (full-snapshot) start")
        v
    }
  }

  /** The frozen source schema: the table's committed read schema (all
    * nullable — a NULL-filled pre-evolution row must fit), plus the
    * CDC columns in changeFeed mode. */
  private[graft] def sourceSchema(spark: SparkSession, o: Opts): StructType = {
    val base = StructType(Manifest.read(spark, o.table).schema.fields
      .map(_.copy(nullable = true)))
    if (!o.changeFeed) base
    else StructType(base.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
  }

  /** Sugar: `Manifest` table → streaming frame. */
  def read(spark: SparkSession, table: String, changeFeed: Boolean = false,
      ignoreDeletes: Boolean = false, startLatest: Boolean = false,
      startingVersion: Option[Long] = None,
      startingTimestamp: Option[String] = None): DataFrame = {
    var r = spark.readStream.format(classOf[ManifestStreamProvider].getName)
      .option("path", table)
    if (changeFeed) r = r.option("changeFeed", "true")
    if (ignoreDeletes) r = r.option("ignoreDeletes", "true")
    if (startLatest) r = r.option("startingVersion", "latest")
    startingVersion.foreach(n => r = r.option("startingVersion", n.toString))
    startingTimestamp.foreach(t => r = r.option("startingTimestamp", t))
    r.load()
  }

  /** The rows a batch `(v1, v2]` must serve, as a BATCH frame aligned
    * to `schema` — the whole source semantics, factored out of the
    * Source so specs can pin it version-pair by version-pair. */
  private[graft] def batchFrame(spark: SparkSession, o: Opts,
      schema: StructType, frozenSchemaJson: Option[String],
      v1: Option[Long], v2: Long): DataFrame = {
    val table = o.table
    val retained = Manifest.versions(spark, table)
    require(retained.contains(v2),
      s"graft-table stream: version $v2 of $table is not retained (vacuumed?)")
    val s2 = Manifest.readSnapshot(spark, table, v2)
    if (s2.meta.get(Manifest.SchemaKey) != frozenSchemaJson) sys.error(
      s"graft-table stream: $table's schema evolved at or before version $v2 " +
        "mid-stream — restart the stream (same checkpoint) to adopt the new " +
        "schema; pre-evolution rows will serve NULL for the added columns")
    // a COLUMN MAPPING landing mid-stream (RENAME/DROP COLUMN) can
    // leave SchemaKey byte-identical while the logical names moved —
    // the frozen schema would silently NULL-fill; fail loudly instead
    // (sources refuse to START on a mapped table, so frozen = unmapped)
    if (s2.meta.contains(Manifest.ColumnMapKey)) sys.error(
      s"graft-table stream: a column rename/drop landed on $table at or " +
        s"before version $v2 mid-stream — compact() folds the mapping; " +
        "restart the stream after it")
    val df = v1 match {
      case None if !o.startLatest =>
        // initial batch: the whole snapshot at v2, as inserts
        withCdc(Manifest.readVersion(spark, table, v2), o, "insert", v2)
      case None => changes(spark, o, s2, retained,
        v1 = retainedStart(retained, v2), v2)
      case Some(a) => changes(spark, o, s2, retained, a, v2)
    }
    align(df, schema)
  }

  /** `startingVersion=latest` anchors the first span at the version
    * current when the SOURCE was created — carried through the Opts
    * closure via [[ManifestSource]]; this fallback (used only when
    * batchFrame is driven directly in specs) anchors at v2 itself, so
    * a directly-driven first span is always EMPTY rather than
    * inverted (retained.last can exceed v2 when commits landed after
    * the probe picked its end version — an inverted span built an
    * empty change list whose `.reduce` threw instead of serving the
    * empty batch). batchFrame already requires `retained.contains
    * (v2)`, so "newest retained version at or below v2" IS v2 — the
    * identity is stated rather than re-derived with a filter, so the
    * invariant stays visible. */
  private def retainedStart(retained: Seq[Long], v2: Long): Long = v2

  private def changes(spark: SparkSession, o: Opts, s2: Manifest.Snapshot,
      retained: Seq[Long], v1: Long, v2: Long): DataFrame = {
    val table = o.table
    if (v1 == v2)
      return Manifest.readSnapshotData(spark, table, s2).limit(0)
    require(retained.contains(v1),
      s"graft-table stream: checkpointed version $v1 of $table is no longer " +
        "retained (vacuumed beneath the stream) — the span's rows are " +
        "unrecoverable; restart from a fresh checkpoint")
    if (!o.changeFeed) spanNet(spark, o, v1, v2)
    else {
      // per-commit attribution: one netted feed per retained pair.
      // The span must be GAPLESS — versions are sequential, so any
      // missing intermediate means vacuum reclaimed a commit between
      // original delivery and this (checkpoint-replay) call; a netted
      // multi-commit pair would no longer be bit-identical to what
      // was first delivered, which is the exactly-once property.
      val span = retained.filter(v => v > v1 && v <= v2)
      val expected = (v1 + 1) to v2
      if (span != expected) sys.error(
        s"graft-table stream: versions ${expected.filterNot(span.contains)
          .mkString(",")} of $table inside the change span ($v1,$v2] were " +
          "vacuumed — the per-commit feed is unrecoverable; restart from a " +
          "fresh checkpoint (and vacuum with retainMs covering the stream's " +
          "replay window)")
      span.zip(v1 +: span.dropRight(1)).map { case (v, p) =>
        withCdcFeed(pairNet(spark, o, p, v), v)
      }.reduce(_ unionByName _)
    }
  }

  /** Net rows over a whole span for the append-shaped modes: the
    * structural pure-append fast path, else readChanges with the
    * delete rows either refused or dropped. */
  private def spanNet(spark: SparkSession, o: Opts, v1: Long, v2: Long): DataFrame =
    pureAppend(spark, o.table, v1, v2) match {
      case Some(df) => df
      case None if o.ignoreDeletes =>
        Manifest.readChanges(spark, o.table, v1, v2)
          .filter(F.col("_change_type") === "insert").drop("_change_type")
      case None => sys.error(
        s"graft-table stream: commits in ($v1,$v2] of ${o.table} removed or " +
          "masked rows; an append-only stream cannot represent deletes — set " +
          "changeFeed=true for the full feed, or ignoreDeletes=true to serve " +
          "net inserts only")
    }

  /** One version pair's netted feed (with `_change_type`), riding the
    * pure-append fast path when the pair qualifies. */
  private def pairNet(spark: SparkSession, o: Opts, v1: Long, v2: Long): DataFrame =
    pureAppend(spark, o.table, v1, v2) match {
      case Some(df) => df.withColumn("_change_type", F.lit("insert"))
      case None => Manifest.readChanges(spark, o.table, v1, v2)
    }

  /** The structural fast path: a span that removed no manifest entry
    * and changed neither the delete-vector nor the schema metadata can
    * only have APPENDED rows — serve exactly the added entries (under
    * the snapshot's reader, so committed-schema and mask discipline
    * hold) with no multiset diff. Returns None when the span needs the
    * full readChanges treatment. */
  private def pureAppend(spark: SparkSession, table: String,
      v1: Long, v2: Long): Option[DataFrame] = {
    val (added, removed) = Manifest.diffSnapshots(spark, table, v1, v2)
    val s1 = Manifest.readSnapshot(spark, table, v1)
    val s2 = Manifest.readSnapshot(spark, table, v2)
    val dvSame = s1.meta.get(Manifest.DvKey) == s2.meta.get(Manifest.DvKey)
    if (removed.nonEmpty || !dvSame) None
    else if (added.isEmpty)
      Some(Manifest.readSnapshotData(spark, table, s2).limit(0))
    else Some(Manifest.readSnapshotData(spark, table, s2.copy(paths = added)))
  }

  /** The parquet files a span `(v1, v2]` can serve ZERO-COPY — no
    * UnsafeRow staging, the appended files themselves become input
    * partitions — with the SAME guards batchFrame applies (retention,
    * schema fingerprint). Some(files-with-length) when servable:
    *
    *  - the initial snapshot (`v1 = None`) of a DV-less snapshot:
    *    every file of the snapshot;
    *  - a structurally pure-append span (no removed manifest entry,
    *    DV metadata unchanged): exactly the added entries' files.
    *
    * None when the span must stage: changeFeed (synthesized CDC
    * columns), a hive layout (directory-encoded partition columns a
    * per-file reader would drop), or a delete-carrying span (netting
    * joins / DV anti-joins need a driver-planned frame).
    *
    * Replay contract: data files are immutable and the retention
    * guards refuse a vacuumed span loudly, so a replayed zero-copy
    * batch serves the identical multiset — the same exactly-once
    * property the staged path provides, minus the double write of
    * every streamed byte. */
  private[sources] def zeroCopyFiles(spark: SparkSession, o: Opts,
      frozenSchemaJson: Option[String], v1: Option[Long], v2: Long)
      : Option[Seq[(String, Long)]] = {
    if (o.changeFeed) return None
    val table = o.table
    val retained = Manifest.versions(spark, table)
    require(retained.contains(v2),
      s"graft-table stream: version $v2 of $table is not retained (vacuumed?)")
    val s2 = Manifest.readSnapshot(spark, table, v2)
    if (s2.meta.get(Manifest.SchemaKey) != frozenSchemaJson) sys.error(
      s"graft-table stream: $table's schema evolved at or before version $v2 " +
        "mid-stream — restart the stream (same checkpoint) to adopt the new " +
        "schema; pre-evolution rows will serve NULL for the added columns")
    // a COLUMN MAPPING landing mid-stream (RENAME/DROP COLUMN) can
    // leave SchemaKey byte-identical while the logical names moved —
    // the frozen schema would silently NULL-fill; fail loudly instead
    // (sources refuse to START on a mapped table, so frozen = unmapped)
    if (s2.meta.contains(Manifest.ColumnMapKey)) sys.error(
      s"graft-table stream: a column rename/drop landed on $table at or " +
        s"before version $v2 mid-stream — compact() folds the mapping; " +
        "restart the stream after it")
    if (Manifest.hiveLayout(spark, table, s2)) return None
    v1 match {
      case None =>
        if (o.startLatest || s2.meta.contains(Manifest.DvKey)) None
        else Some(Manifest.listSnapshotFilesWithLen(spark, table, s2))
      case Some(a) if a == v2 => Some(Nil)
      case Some(a) =>
        require(retained.contains(a),
          s"graft-table stream: span-start version $a of $table is not " +
            "retained (vacuumed, or a startingVersion whose predecessor " +
            "is gone) — the span's rows are unrecoverable; restart from " +
            "a fresh checkpoint or a retained startingVersion")
        val (added, removed) = Manifest.diffSnapshots(spark, table, a, v2)
        val s1 = Manifest.readSnapshot(spark, table, a)
        val dvSame = s1.meta.get(Manifest.DvKey) == s2.meta.get(Manifest.DvKey)
        if (removed.nonEmpty || !dvSame) None
        else if (added.isEmpty) Some(Nil)
        else Some(Manifest.listSnapshotFilesWithLen(spark, table,
          s2.copy(paths = added)))
    }
  }

  /** The dataSchema a zero-copy parquet reader resolves files against:
    * the committed (evolved) schema when stamped, else the snapshot's
    * own read schema at stream start. */
  private[sources] def zeroCopyDataSchema(spark: SparkSession, o: Opts,
      startVersion: Long, frozenSchemaJson: Option[String]): StructType =
    frozenSchemaJson
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[StructType])
      .getOrElse(Manifest.readVersion(spark, o.table, startVersion).schema)

  private def withCdc(df: DataFrame, o: Opts, tpe: String, v: Long): DataFrame =
    if (!o.changeFeed) df
    else df.withColumn("_change_type", F.lit(tpe))
      .withColumn("_commit_version", F.lit(v))

  private def withCdcFeed(feed: DataFrame, v: Long): DataFrame =
    feed.withColumn("_commit_version", F.lit(v))

  /** Reorder (and NULL-fill, defensively) to the frozen schema. */
  private def align(df: DataFrame, schema: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(schema.fields.toSeq.map { f =>
      if (have(f.name)) F.col(f.name).cast(f.dataType).as(f.name)
      else F.lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }
}

/** A snapshot-version stream offset. -1 is the pre-initial marker —
  * "nothing served yet; the first span is the full snapshot". */
private[sources] case class VersionOffset(v: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json: String = v.toString
}

/** `spark.readStream.format("graft-table").option("path", table)` —
  * registered via META-INF/services; the fully-qualified class name
  * works as the format string too.
  *
  * DataSourceV2: [[org.apache.spark.sql.connector.catalog.TableProvider]]
  * → Table(MICRO_BATCH_READ) → Scan → [[ManifestMicroBatchStream]] —
  * entirely the public connector API (the earlier DSv1 `Source` needed
  * a `private[sql]` shim to re-wrap batch frames as streaming frames;
  * a Spark minor bump could break it silently). */
class ManifestStreamProvider
    extends org.apache.spark.sql.connector.catalog.TableProvider
    with DataSourceRegister {
  import org.apache.spark.sql.util.CaseInsensitiveStringMap

  override def shortName(): String = "graft-table"

  private def optsOf(options: java.util.Map[String, String]) = {
    import scala.jdk.CollectionConverters._
    ManifestStream.opts(options.asScala.toMap
      .map { case (k, v) => k.toLowerCase -> v })
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestStream.sourceSchema(SparkSession.active, optsOf(options))

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table =
    new ManifestStreamTable(schema, optsOf(properties))
}

private[sources] class ManifestStreamTable(tableSchema: StructType,
    o: ManifestStream.Opts)
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability

  override def name(): String = s"graft-table ${o.table}"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    () => new org.apache.spark.sql.connector.read.Scan {
      override def readSchema(): StructType = tableSchema
      override def description(): String = name()
      override def toMicroBatchStream(checkpointLocation: String)
          : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
        new ManifestMicroBatchStream(SparkSession.active, o, tableSchema,
          checkpointLocation)
    }
}

/** The DSv2 micro-batch stream: offsets are manifest versions.
  *
  * The DOMINANT path is ZERO-COPY ([[ManifestStream.zeroCopyFiles]]):
  * the initial snapshot and every structurally pure-append span serve
  * the appended parquet files directly as input partitions through
  * Spark's own parquet reader — no byte of streamed data is written
  * twice. Only spans that need a driver-planned frame — changeFeed
  * (synthesized CDC columns), delete-carrying spans (netting joins /
  * DV anti-joins), hive layouts — plan through
  * [[ManifestStream.batchFrame]] and STAGE their rows as
  * length-prefixed UnsafeRow bytes under the stream's checkpoint
  * (a [[org.apache.spark.sql.connector.read.PartitionReader]]
  * produces InternalRows, not a re-plannable DataFrame).
  *
  * Exactly-once, both paths: snapshots are immutable within retention
  * — a replayed zero-copy span reads the identical files (vacuumed
  * spans refuse loudly), and a staged dir is keyed by the span and
  * reused when its _SUCCESS marker exists, so a mid-write crash
  * re-stages and a completed stage replays its exact bytes.
  * [[commit]] reclaims staged spans at or below the committed
  * offset. Cost: ∝ WHAT CHANGED, never the table, with the staging
  * round trip paid only on delete-carrying/CDC spans. */
class ManifestMicroBatchStream(spark: SparkSession, o: ManifestStream.Opts,
    schema: StructType, checkpointLocation: String)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.hadoop.fs.Path
  import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset}
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}

  /** Version current at stream creation — the anchor for
    * `startingVersion=latest`, and the floor latestOffset never goes
    * below. */
  private val startVersion: Long =
    Manifest.currentSnapshot(spark, o.table).getOrElse(sys.error(
      s"graft-table stream: ${o.table} has no committed snapshot")).version

  /** Schema-evolution fingerprint frozen at stream creation; a
    * mid-stream evolution fails the batch loudly (restart adopts). */
  private val frozenSchemaJson: Option[String] = {
    val start = Manifest.readSnapshot(spark, o.table, startVersion)
    // a mapped table's stream would zero-copy files under PHYSICAL
    // names and align() would NULL-fill the logical ones — refuse at
    // source creation; compact() folds the mapping and the stream runs
    require(!start.meta.contains(Manifest.ColumnMapKey),
      s"graft-table stream: ${o.table} carries a column mapping " +
        "(rename/drop) — run compact() to fold it, then start the stream")
    start.meta.get(Manifest.SchemaKey)
  }

  private val stagingRoot = new Path(checkpointLocation, "graft-staged")

  /** The table's full base schema (all nullable) frozen at stream
    * creation — the parquet reader's dataSchema for zero-copy spans.
    * The serving `schema` may be a catalog-pruned SUBSET of this. */
  private val baseSchema: StructType = StructType(
    ManifestStream.zeroCopyDataSchema(spark, o, startVersion,
      frozenSchemaJson).fields.map(_.copy(nullable = true)))

  /** `startingTimestamp` resolved ONCE at source creation — the same
    * first-version-at-or-after rule readAsOf's versionAt mirrors,
    * with the vacuumed-window refusal. Resolving to 1 degrades to the
    * full-snapshot start (commits 1..now ARE the snapshot). */
  private val resolvedStartAt: Option[Long] = o.startTs match {
    case None => o.startAt
    case Some(ts) =>
      Some(ManifestStream.versionAtOrAfter(spark, o.table, ts))
        .filter(_ > 1L)
  }

  override def initialOffset(): V2Offset =
    VersionOffset(
      if (o.startLatest) startVersion
      else resolvedStartAt match {
        // the first span is (N-1, latest]: exactly the net effect of
        // commits N..latest; changes() itself refuses loudly when the
        // N-1 snapshot is no longer retained
        case Some(n) => n - 1
        case None => -1L
      })

  override def latestOffset(): V2Offset = {
    val vs = Manifest.versions(spark, o.table)
    VersionOffset(math.max(vs.lastOption.getOrElse(startVersion), startVersion))
  }

  override def deserializeOffset(json: String): V2Offset =
    VersionOffset(json.trim.toLong)

  /** Zero-copy first: a pure-append span (and the DV-less initial
    * snapshot) serves its appended parquet files DIRECTLY as input
    * partitions — no staging write, no re-read; only spans that
    * genuinely need a driver-planned frame (deletes, changeFeed, hive
    * layouts) pay the UnsafeRow staging round trip. */
  override def planInputPartitions(start: V2Offset,
      end: V2Offset): Array[InputPartition] = {
    val v1 = start match {
      case VersionOffset(-1L) => None
      case VersionOffset(v) => Some(v)
      case other => Some(other.json.trim.toLong)
    }
    val v2 = end match {
      case VersionOffset(v) => v
      case other => other.json.trim.toLong
    }
    ManifestStream.zeroCopyFiles(spark, o, frozenSchemaJson, v1, v2) match {
      case Some(files) =>
        val maxBytes =
          org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes
        files.iterator.flatMap { case (f, len) =>
          if (len <= maxBytes)
            Iterator.single(StreamFilePartition(f, 0L, len): InputPartition)
          else (0L until len by maxBytes).iterator.map(s =>
            StreamFilePartition(f, s, math.min(maxBytes, len - s))
              : InputPartition)
        }.toArray
      case None =>
        val batch = ManifestStream.batchFrame(spark, o, schema,
          frozenSchemaJson, v1, v2)
        val dir = new Path(stagingRoot, s"span-${v1.getOrElse(-1L)}-$v2")
        StagedRows.stage(batch, dir)
          .map(f => StagedPartition(f): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val staged = StagedRowReaderFactory(schema.fields.length,
      new SerializedHadoopConf(spark.sessionState.newHadoopConf()))
    // the zero-copy parquet reader function (driver-built, shipped in
    // the factory); changeFeed never zero-copies, so it skips the build
    val parquetFn =
      if (o.changeFeed) None
      else {
        import org.apache.spark.sql.execution.datasources.FileFormat
        val fmt = new org.apache.spark.sql.execution.datasources.parquet
          .ParquetFileFormat()
        Some(fmt.buildReaderWithPartitionValues(spark, baseSchema,
          new StructType(), schema, Nil,
          Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
          spark.sessionState.newHadoopConf()))
      }
    StreamReaderFactory(staged, parquetFn)
  }

  /** Batches at or below the committed offset can never replay —
    * their staged bytes are reclaimed. The span-end is parsed with a
    * sign-aware regex: the initial snapshot's dir is `span--1-<v>`
    * (start offset -1), which a naive split('-') shatters into four
    * pieces that match nothing — the one dir that MUST be reclaimed
    * (it is table-sized) would leak under the checkpoint forever. */
  override def commit(end: V2Offset): Unit = {
    val committed = end.json.trim.toLong
    val spanName = """^span-(-?\d+)-(-?\d+)$""".r
    val fs = stagingRoot.getFileSystem(
      spark.sessionState.newHadoopConf())
    if (fs.exists(stagingRoot))
      fs.listStatus(stagingRoot).foreach { st =>
        st.getPath.getName match {
          case spanName(_, b) if b.toLong <= committed =>
            fs.delete(st.getPath, true)
          case _ => ()
        }
      }
  }

  override def stop(): Unit = ()
}

/** One staged file = one input partition. */
private[sources] case class StagedPartition(path: String)
    extends org.apache.spark.sql.connector.read.InputPartition

/** One zero-copy parquet file (or byte-range split of one). */
private[sources] case class StreamFilePartition(path: String, start: Long,
    length: Long) extends org.apache.spark.sql.connector.read.InputPartition

/** Dispatches between the two partition kinds a graft stream plans:
  * staged UnsafeRow spans and zero-copy parquet files. */
private[sources] case class StreamReaderFactory(
    staged: StagedRowReaderFactory,
    parquet: Option[org.apache.spark.sql.execution.datasources
      .PartitionedFile => Iterator[org.apache.spark.sql.catalyst.InternalRow]])
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = partition match {
    case sp: StagedPartition => staged.createReader(sp)
    case fp: StreamFilePartition =>
      val fn = parquet.getOrElse(sys.error(
        "graft-table stream: zero-copy partition without a parquet reader " +
          "(changeFeed spans must stage)"))
      val it = fn(org.apache.spark.sql.execution.datasources.PartitionedFile(
        InternalRow.empty,
        org.apache.spark.paths.SparkPath.fromPathString(fp.path),
        fp.start, fp.length, Array.empty[String]))
      new PartitionReader[InternalRow] {
        private var row: InternalRow = _
        override def next(): Boolean =
          if (it.hasNext) { row = it.next(); true } else false
        override def get(): InternalRow = row
        override def close(): Unit = ()
      }
    case other => sys.error(s"graft-table stream: unknown partition $other")
  }
}

/** The SESSION's Hadoop conf, shipped to executors — `new
  * Configuration()` there would drop per-session settings (object-store
  * credentials, endpoint overrides), silently breaking staging on any
  * checkpoint whose filesystem needs them. Hadoop's Configuration is
  * not Serializable, so it rides as XML bytes. */
private[sources] class SerializedHadoopConf(
    @transient private var conf: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  def value: org.apache.hadoop.conf.Configuration = conf
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new org.apache.hadoop.conf.Configuration(false)
    conf.readFields(in)
  }
}

private[sources] object StagedRows {
  import org.apache.hadoop.fs.Path

  /** Write a batch's rows as per-partition files of length-prefixed
    * UnsafeRow bytes (terminator -1), write-once per span: a dir with
    * _SUCCESS replays its exact bytes; a partial dir from a crashed
    * stage is rebuilt from scratch (tmp + rename, so _SUCCESS implies
    * complete). Returns the staged data files. */
  def stage(batch: DataFrame, dir: Path): Seq[String] = {
    val spark = batch.sparkSession
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles: Seq[String] =
      fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith("part-")).map(_.toString).sorted.toSeq
    if (fs.exists(new Path(dir, "_SUCCESS"))) return dataFiles
    val tmp = new Path(dir.getParent, s".${dir.getName}.tmp")
    fs.delete(tmp, true); fs.delete(dir, true)
    fs.mkdirs(tmp)
    val schema = batch.schema
    val tmpStr = tmp.toString
    val serConf = new SerializedHadoopConf(spark.sessionState.newHadoopConf())
    // executes the batch's (driver-pinned) plan DISTRIBUTED; each task
    // serializes its own partition — no driver collect
    batch.queryExecution.toRdd.mapPartitionsWithIndex { (i, rows) =>
      val proj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(schema)
      val p = new Path(f"$tmpStr/part-$i%05d")
      val pfs = p.getFileSystem(serConf.value)
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(pfs.create(p, true), 1 << 16))
      val buf = new Array[Byte](1 << 16)
      var n = 0L
      try {
        while (rows.hasNext) {
          val u = proj(rows.next())
          out.writeInt(u.getSizeInBytes)
          u.writeToStream(out, buf)
          n += 1
        }
        out.writeInt(-1)
      } finally out.close()
      Iterator(n)
    }.collect()
    if (!fs.rename(tmp, dir))
      sys.error(s"graft-table stream: failed to publish staged span $dir")
    fs.create(new Path(dir, "_SUCCESS"), true).close()
    dataFiles
  }
}

private[sources] case class StagedRowReaderFactory(numFields: Int,
    conf: SerializedHadoopConf)
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[StagedPartition].path
    new PartitionReader[InternalRow] {
      private val p = new org.apache.hadoop.fs.Path(path)
      private val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(
          p.getFileSystem(conf.value).open(p), 1 << 16))
      private var row: org.apache.spark.sql.catalyst.expressions.UnsafeRow = _

      override def next(): Boolean = {
        val len = in.readInt()
        if (len < 0) { row = null; false }
        else {
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          val r = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(numFields)
          r.pointTo(bytes, len)
          row = r
          true
        }
      }
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}
