package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Versioned-manifest table commits — the object-store-safe protocol
  * the directory-rename swap cannot be: directory rename is atomic on
  * HDFS/posix but COPY+DELETE on S3-class stores, where a concurrent
  * reader can see a half-moved table or a missing path. Here nothing
  * visible is ever renamed or mutated; a commit is the appearance of
  * ONE new manifest file, and data files are immutable once written
  * (the Delta/Iceberg snapshot discipline, reduced to its core).
  *
  * On-disk layout of a manifested table:
  * {{{
  *   <table>/_manifest/v00000001.list   one committed snapshot per file
  *   <table>/_v00000001/...             data of snapshot 1 (files, or
  *                                      hive-partitioned directories)
  * }}}
  * Underscore prefixes keep both invisible to Spark's file index, so a
  * stray plain `read.parquet(table)` of an adopted table cannot
  * double-count old and new data.
  *
  * A manifest is a newline-separated list of paths relative to the
  * table root — plain files, or whole directories for partitioned
  * snapshots (readers hand directories to the parquet source, so
  * hive-style partition columns keep working). COMMIT protocol: write
  * the list to `_manifest/.tmp-<uuid>`, then rename onto
  * `v<N+1>.list`. A file rename is atomic on posix/HDFS; on an
  * S3-class store the destination appears as one atomic PUT and the
  * dot-prefixed tmp name is never considered by readers. A rename that
  * finds the destination occupied FAILS — two racing committers
  * serialize on the version number, and the loser must re-resolve and
  * retry (optimistic concurrency).
  *
  * READERS PIN a snapshot: [[read]] resolves the current manifest once
  * (driver-side metadata), then scans exactly its files. A commit that
  * lands mid-query changes the current version, never the pinned list;
  * old snapshots remain on disk until [[vacuum]], which keeps the
  * newest `keep` versions — retention is the reader lease, exactly as
  * in production table formats.
  *
  * CRASH SAFETY between steps: data written but no manifest =
  * invisible (every writer lands in its own uniquely-suffixed version
  * directory, so nothing ever overwrites or deletes another writer's
  * data), and [[vacuum]] reclaims orphaned directories once the
  * version number has passed them; manifest present = committed,
  * regardless of when the writer died; [[vacuum]] is idempotent.
  */
object Manifest {

  /** `meta` carries commit annotations as `#key=value` comment lines
    * in the manifest file (readers of any vintage skip them — a path
    * never starts with '#'): the streaming sink records its micro-batch
    * id here, which is what makes replay-after-crash exactly-once. */
  final case class Snapshot(version: Long, paths: Seq[String],
      meta: Map[String, String] = Map.empty)

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Read a snapshot's entries as one frame. A hive-partitioned
    * snapshot with MULTIPLE entries (appends, CoW deletes) reads per
    * entry and unions by name: a single multi-root relation would make
    * partition inference see the non-partition `_v*` level between the
    * common base and the `col=` dirs and refuse
    * (CONFLICTING_DIRECTORY_STRUCTURES). Filters still push into every
    * union branch, so partition pruning survives. Single-entry or
    * unpartitioned snapshots keep the one-relation fast path (one file
    * index, one pushdown). */
  private def readSnapshotData(spark: SparkSession, table: String,
      snap: Snapshot): DataFrame = {
    val paths = snap.paths.map(p => s"$table/$p")
    val reader = snapshotReader(spark, snap)
    if (snap.paths.size <= 1 || !snap.meta.contains(PartitionKey))
      reader.parquet(paths: _*)
    else paths.map(reader.parquet(_)).reduce(_ unionByName _)
  }

  /** The reader EVERY path that opens a snapshot's files — or any
    * SUBSET of them — must use: an evolved snapshot reads under its
    * COMMITTED schema ([[SchemaKey]]), so parquet serves the columns a
    * pre-evolution file lacks as NULL. A raw spark.read.parquet over a
    * mixed pre-/post-evolution file set would infer from ONE footer
    * and nondeterministically drop the evolved columns — in the CoW
    * rewrite that is silent data loss, in a pruned read a resolution
    * error. */
  private def snapshotReader(spark: SparkSession, snap: Snapshot)
      : org.apache.spark.sql.DataFrameReader =
    snap.meta.get(SchemaKey) match {
      case Some(json) if !snap.meta.contains(PartitionKey) =>
        spark.read.schema(
          org.apache.spark.sql.types.DataType.fromJson(json)
            .asInstanceOf[org.apache.spark.sql.types.StructType])
      case _ => spark.read
    }

  /** rel-path → owning manifest entry. Entries within one snapshot are
    * disjoint (none nests inside another), so the owner is either the
    * path itself or its truncation at some '/' boundary — O(path
    * depth) hash lookups per file, independent of the entry count. */
  private def prefixResolver(entries: Seq[String]): String => Option[String] = {
    val set = entries.toSet
    (rel: String) =>
      if (set.contains(rel)) Some(rel)
      else {
        var i = rel.length
        var found: Option[String] = None
        while (found.isEmpty && { i = rel.lastIndexOf('/', i - 1); i > 0 }) {
          val p = rel.substring(0, i)
          if (set.contains(p)) found = Some(p)
        }
        found
      }
  }

  private def manifestDir(table: String) = new Path(s"$table/_manifest")
  private def manifestFile(table: String, v: Long) =
    new Path(s"$table/_manifest/v${"%08d".format(v)}.list")
  private[graft] def dataDirName(v: Long): String = s"_v${"%08d".format(v)}"

  private val ManifestName = """^v(\d{8})\.list$""".r
  /** Commit-metadata key recording a table's hive partitioning so
    * compaction can preserve it. */
  private val PartitionKey = "partition_by"
  /** Commit-metadata key recording the snapshot's EVOLVED schema (as
    * StructType json) after an additive-evolution append — what lets
    * readers serve pre-evolution files with NULL new columns, without
    * a per-footer merge pass. Inherits until the next evolution. */
  private val SchemaKey = "table_schema"
  /** A version data dir: the version prefix plus the writer's unique
    * suffix ([[writeData]]). */
  private val DataDirName = """^_v(\d{8})(-[0-9a-f]{8})?$""".r

  /** All committed versions, ascending (empty for a plain table). */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val fs = fsFor(spark, table)
    val dir = manifestDir(table)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case ManifestName(v) => v.toLong
    }.sorted
  }

  def isManifested(spark: SparkSession, table: String): Boolean =
    versions(spark, table).nonEmpty

  /** The current snapshot: the HIGHEST committed manifest, parsed. */
  def currentSnapshot(spark: SparkSession, table: String): Option[Snapshot] =
    versions(spark, table).lastOption.map(v => readSnapshot(spark, table, v))

  def readSnapshot(spark: SparkSession, table: String, v: Long): Snapshot = {
    val fs = fsFor(spark, table)
    val in = fs.open(manifestFile(table, v))
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      out.toString("UTF-8")
    } finally in.close()
    val lines = text.split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
    val meta = lines.filter(_.startsWith("#")).flatMap { l =>
      l.drop(1).split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      }
    }.toMap
    Snapshot(v, lines.filterNot(_.startsWith("#")), meta)
  }

  /** Pinned read of the current snapshot: the file list is resolved
    * HERE, once, so the returned frame is immune to later commits and
    * (within the retention window) to vacuum. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val snap = currentSnapshot(spark, table).getOrElse(
      sys.error(s"Manifest.read: $table has no committed snapshot"))
    readSnapshotData(spark, table, snap)
  }

  /** Commit `paths` (relative to the table root) as version
    * `expected + 1`. Fails loudly if that version already exists — the
    * optimistic-concurrency loser must re-resolve and retry. */
  def commit(spark: SparkSession, table: String,
      expected: Long, paths: Seq[String],
      meta: Map[String, String] = Map.empty): Snapshot = {
    require(paths.nonEmpty, "refusing to commit an empty snapshot")
    require(paths.forall(!_.startsWith("#")), "paths cannot start with '#'")
    require(meta.forall { case (k, v) =>
      !k.contains("=") && !(k + v).exists(c => c == '\n' || c == '\r') },
      "meta keys cannot contain '='; keys and values cannot contain newlines")
    val fs = fsFor(spark, table)
    fs.mkdirs(manifestDir(table))
    val target = manifestFile(table, expected + 1)
    if (fs.exists(target)) sys.error(
      s"Manifest.commit: $target already exists — a concurrent commit won; " +
        "re-resolve the current snapshot and retry")
    val tmp = new Path(s"$table/_manifest/.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    // every commit stamps its wall time (ms) — the AS OF timestamp
    // resolution key for [[readAsOf]]; an inherited stamp is replaced
    val stamped = meta + ("committed_at" -> System.currentTimeMillis().toString)
    val metaLines = stamped.toSeq.sortBy(_._1).map { case (k, v) => s"#$k=$v" }
    try out.write(((metaLines ++ paths).mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      sys.error(s"Manifest.commit: rename to $target failed (lost the race?); " +
        "nothing committed")
    }
    Snapshot(expected + 1, paths, stamped)
  }

  /** Create a manifested table from a frame: write snapshot 1's data
    * under its version directory, then commit. */
  def create(spark: SparkSession, table: String, df: DataFrame,
      partitionBy: Seq[String] = Nil,
      meta: Map[String, String] = Map.empty): Snapshot = {
    require(versions(spark, table).isEmpty,
      s"Manifest.create: $table already has committed snapshots")
    commit(spark, table, 0L,
      Seq(writeData(spark, table, 1L, df, partitionBy)),
      withPartitionMeta(meta, partitionBy))
  }

  /** Adopt an existing PLAIN parquet directory: commit a v1 manifest
    * listing its current root files in place (no data movement). From
    * then on the table must be read through the manifest — the next
    * rewrite lands in a version directory invisible to plain reads. */
  def adopt(spark: SparkSession, table: String): Snapshot = {
    require(versions(spark, table).isEmpty,
      s"Manifest.adopt: $table already has committed snapshots")
    val fs = fsFor(spark, table)
    val files = fs.listStatus(new Path(table)).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName)
    require(files.nonEmpty, s"Manifest.adopt: no parquet files at $table")
    commit(spark, table, 0L, files)
  }

  /** Write `df` as version `v`'s data directory, reclaiming any
    * uncommitted leftover from a crashed writer of the same version
    * (safe: no manifest references it). Returns the relative name. */
  /** Write `df` as a version-prefixed data directory with a UNIQUE
    * writer suffix, so two racing committers of the same version can
    * NEVER touch each other's data — the loser's commit fails on the
    * manifest rename and its orphaned directory (like any crashed
    * writer's) is reclaimed by [[vacuum]] once the version number has
    * passed it. (An earlier design reused the bare version name and
    * deleted leftovers before writing, which let a losing racer delete
    * data the winner had already COMMITTED.) Returns the relative
    * name. */
  private def writeData(spark: SparkSession, table: String, v: Long,
      df: DataFrame, partitionBy: Seq[String]): String = {
    val rel = dataDirName(v) + "-" +
      java.util.UUID.randomUUID().toString.take(8)
    val dir = new Path(s"$table/$rel")
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dir.toString)
    rel
  }

  /** [[writeData]] plus the exact written-row count, in ONE pass over
    * the input: the count comes from the WRITTEN files afterwards (a
    * column-less parquet count() is footer metadata, not a data scan),
    * instead of probing the input with isEmpty first — which re-reads
    * the touched inputs precisely when a takedown deleted everything.
    * An empty write's directory is deleted immediately (it was never
    * visible — no manifest references it). */
  private def writeDataCounted(spark: SparkSession, table: String, v: Long,
      df: DataFrame, partitionBy: Seq[String]): (String, Long) = {
    val rel = writeData(spark, table, v, df, partitionBy)
    val fs = fsFor(spark, table)
    val dir = new Path(s"$table/$rel")
    val it = fs.listFiles(dir, true)
    var hasParquet = false
    while (!hasParquet && it.hasNext)
      hasParquet = it.next().getPath.getName.endsWith(".parquet")
    val n = if (!hasParquet) 0L
      else spark.read.parquet(dir.toString).count()
    if (n == 0) { fs.delete(dir, true); () }
    (rel, n)
  }

  /** Full-rewrite commit: materialize `df` as the next version's data
    * and commit it as the complete new snapshot (the shape compaction
    * and index-folding use). */
  def commitRewrite(spark: SparkSession, table: String, df: DataFrame,
      partitionBy: Seq[String] = Nil,
      meta: Map[String, String] = Map.empty,
      expected: Option[Long] = None): Snapshot = {
    val snap = currentSnapshot(spark, table).getOrElse(
      sys.error(s"Manifest.commitRewrite: $table has no committed snapshot"))
    // callers whose REWRITE content derives from an earlier resolve
    // (the MV refresh) pass that version: a concurrent rewrite then
    // fails loudly here or on the commit rename, never lands stale
    // content over the winner's
    expected.foreach(e => require(snap.version == e,
      s"Manifest.commitRewrite: $table moved to v${snap.version} " +
        s"(expected v$e) — re-resolve and retry"))
    val rel = writeData(spark, table, snap.version + 1, df, partitionBy)
    // carry the metadata forward (new keys win) — but a REWRITE defines
    // the new layout, so a stale partition_by from the old layout is
    // dropped rather than resurrected by a later compact(), and an
    // inherited evolved-schema stamp is RE-STAMPED to the rewritten
    // frame's own schema (the rewrite may reshape columns entirely —
    // an index fold — and a stale stamp would force the old shape
    // onto the new files)
    val restamped =
      if (snap.meta.contains(SchemaKey))
        Map(SchemaKey -> df.schema.json)
      else Map.empty[String, String]
    commit(spark, table, snap.version, Seq(rel),
      withPartitionMeta((snap.meta - PartitionKey) ++ restamped ++ meta,
        partitionBy))
  }

  /** APPEND commit: write `df` as version N+1's data directory and
    * commit the old snapshot's paths PLUS the new one — the
    * incremental-ingest path (landed micro-batches, daily loads)
    * without rewriting history. Every data dir stays immutable and
    * uniquely named, so a crashed appender's uncommitted leftover is
    * invisible until [[vacuum]] reclaims it. Appended snapshots SHARE
    * their predecessors' data dirs, which [[vacuum]]'s referenced-set
    * check already honors: dropping old versions never deletes a dir
    * a surviving snapshot still lists.
    *
    * With `mergeSchema = true` this is ADDITIVE SCHEMA EVOLUTION (the
    * Delta `mergeSchema` story): the batch may carry NEW columns —
    * overlapping columns must still type-match, and every current
    * column must be present (dropping or retyping is never silent).
    * The widened schema rides the commit as metadata ([[SchemaKey]]),
    * and [[readSnapshotData]] reads the snapshot under that EXPLICIT
    * schema, so pre-evolution files serve the new columns as NULL —
    * consistent reads with no per-footer schema-merge pass over the
    * table. Evolution and hive partitioning are mutually exclusive in
    * BOTH directions: a partitioned table refuses evolution, and an
    * evolved table refuses partitioned appends — either combination
    * would put SchemaKey beside PartitionKey and break the
    * multi-entry union read. */
  def commitAppend(spark: SparkSession, table: String, df: DataFrame,
      partitionBy: Seq[String] = Nil,
      meta: Map[String, String] = Map.empty,
      mergeSchema: Boolean = false): Snapshot = {
    val snap = currentSnapshot(spark, table).getOrElse(
      sys.error(s"Manifest.commitAppend: $table has no committed snapshot"))
    // fail loudly on drift: parquet's per-file schemas would otherwise
    // surface as missing-column reads long after the bad commit landed.
    // Types compare only outside partitionBy columns (hive partition
    // inference narrows their types on read).
    val curDf = readSnapshotData(spark, table, snap)
    val curS = curDf.schema
    def key(s: org.apache.spark.sql.types.StructType) = s.map(f =>
      if (partitionBy.contains(f.name)) (f.name, "partition")
      else (f.name, f.dataType.sql)).toSet
    val (cur, nxt) = (key(curS), key(df.schema))
    val ok = if (mergeSchema) cur.subsetOf(nxt) else cur == nxt
    require(ok,
      s"Manifest.commitAppend: schema mismatch vs current snapshot — " +
        s"only in table: ${(cur -- nxt).map(_._1).toSeq.sorted.mkString(",")}; " +
        s"only in batch: ${(nxt -- cur).map(_._1).toSeq.sorted.mkString(",")}" +
        (if (mergeSchema) "" else " (additive evolution needs mergeSchema=true)"))
    if (mergeSchema && cur != nxt) {
      // the TABLE's persisted layout decides, not this call's
      // partitionBy argument — a partitioned table evolved through a
      // partitionBy=Nil call would land SchemaKey beside PartitionKey
      // and brick every later read on the strict unionByName
      val hiveLayout = snap.meta.contains(PartitionKey) ||
        curDf.inputFiles.exists(f => f.split('/').exists(_.contains("=")))
      require(partitionBy.isEmpty && !hiveLayout,
        "Manifest.commitAppend: additive schema evolution is not " +
          "supported on hive-partitioned tables (explicit-schema reads " +
          "would fight partition inference)")
    }
    // ...and the converse: once evolved, a partitioned APPEND would
    // land PartitionKey beside the inherited SchemaKey — the union
    // read would then drop the explicit schema and fail on the
    // pre-evolution entries
    require(!(snap.meta.contains(SchemaKey) && partitionBy.nonEmpty),
      "Manifest.commitAppend: cannot add hive-partitioned entries to " +
        "a schema-evolved table")
    val rel = writeData(spark, table, snap.version + 1, df, partitionBy)
    val evolved =
      if (mergeSchema && cur != nxt) Map(SchemaKey -> df.schema.json)
      else Map.empty[String, String]
    // metadata INHERITS across commits (new keys win): table-state
    // annotations like the streaming sink's batch high-water mark must
    // survive interleaved compactions + vacuum, or a crash replay after
    // retention could double-append
    commit(spark, table, snap.version, snap.paths :+ rel,
      withPartitionMeta(snap.meta ++ meta ++ evolved, partitionBy))
  }

  private def withPartitionMeta(meta: Map[String, String],
      partitionBy: Seq[String]): Map[String, String] =
    if (partitionBy.isEmpty) meta
    else meta + (PartitionKey -> partitionBy.mkString(","))

  /** TIME TRAVEL: pinned read of any still-retained version — the
    * manifest list IS the version history, so reading `AS OF v` is
    * just resolving that manifest instead of the newest. Fails loudly
    * on a vacuumed (or never-committed) version. */
  def readVersion(spark: SparkSession, table: String, v: Long): DataFrame = {
    require(versions(spark, table).contains(v),
      s"Manifest.readVersion: $table has no retained version $v")
    val snap = readSnapshot(spark, table, v)
    readSnapshotData(spark, table, snap)
  }

  /** TIME TRAVEL by wall clock: the newest retained version whose
    * commit stamp is at or before `tsMillis` (commits made before the
    * stamp existed count as time 0). The stamp is commit METADATA, so
    * it rides the same atomic manifest appearance as everything else —
    * no file-mtime archaeology. */
  def readAsOf(spark: SparkSession, table: String, tsMillis: Long): DataFrame = {
    val vs = versions(spark, table).map(v => readSnapshot(spark, table, v))
      .filter(_.meta.get("committed_at").map(_.toLong).getOrElse(0L) <= tsMillis)
    require(vs.nonEmpty,
      s"Manifest.readAsOf: no retained version of $table at or before $tsMillis")
    val snap = vs.last
    readSnapshotData(spark, table, snap)
  }

  /** File-level diff between two retained versions: (added, removed)
    * relative paths, v1 → v2. Driver-side manifest metadata only —
    * nothing scans data. The row-level diff is [[readChanges]]. */
  def diffSnapshots(spark: SparkSession, table: String,
      v1: Long, v2: Long): (Seq[String], Seq[String]) = {
    val a = readSnapshot(spark, table, v1).paths.toSet
    val b = readSnapshot(spark, table, v2).paths.toSet
    ((b -- a).toSeq.sorted, (a -- b).toSeq.sorted)
  }

  /** Row-level change feed between two retained versions — the CDC
    * complement of [[diffSnapshots]], costed by what CHANGED, never by
    * the table: only the added/removed manifest entries are read
    * (carried-forward entries appear in both snapshots and drop out of
    * the diff), and the multiset difference each way cancels the
    * rewrite churn a compaction or a [[deleteWhere]] copy-on-write
    * introduces — a compacted-but-identical row set yields ZERO
    * changes, a delete yields exactly the deleted rows. Output: the
    * table's columns plus `_change_type` ('insert' | 'delete').
    * The exceptAll shuffles hash by full row across the changed
    * entries only — at 100 TB the feed costs ∝ the commit being
    * explained, which is what lets the incremental sidecar/stats path
    * and downstream consumers avoid full-snapshot anti-joins. */
  def readChanges(spark: SparkSession, table: String,
      v1: Long, v2: Long): DataFrame = {
    val (added, removed) = diffSnapshots(spark, table, v1, v2)
    val template = readVersion(spark, table, v2).limit(0)
    def readSide(rels: Seq[String], v: Long): DataFrame =
      if (rels.isEmpty) template
      // ride the snapshot reader so multi-entry hive sides union
      // per entry instead of tripping partition inference
      else readSnapshotData(spark, table,
        readSnapshot(spark, table, v).copy(paths = rels))
    // column order can differ across layouts (hive partition columns
    // trail) and column SETS across an additive schema evolution (a
    // pre-evolution side lacks the new columns — fill NULL, exactly
    // how v2 itself reads those files, so rewrite churn still cancels)
    val cols = template.columns.toSeq
    def align(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      df.select(cols.map(c =>
        if (have(c)) F.col(c)
        else F.lit(null).cast(template.schema(c).dataType).as(c)): _*)
    }
    val a = align(readSide(added, v2))
    val r = align(readSide(removed, v1))
    a.exceptAll(r).withColumn("_change_type", F.lit("insert"))
      .unionByName(r.exceptAll(a).withColumn("_change_type", F.lit("delete")))
  }

  /** COPY-ON-WRITE row delete — the takedown / right-to-be-forgotten
    * path every training corpus needs: rewrite ONLY the files that
    * actually contain matching rows, carry everything else forward
    * verbatim into one atomic snapshot commit.
    *
    * Phase 1 finds the touched files EXACTLY — a scan of the predicate
    * columns only (columnar projection + parquet row-group pushdown)
    * grouped by `input_file_name()`; range/equality bounds DERIVED
    * FROM THE PREDICATE ([[boundsFromPred]] — sound by construction)
    * first prune the scan to the envelope-intersecting files when an
    * [[analyzeFiles]] sidecar exists, so at 100 TB a clustered
    * takedown touches a handful of files and phase 1 reads little
    * more. Phase 2 rewrites the touched files' survivors into the new
    * version directory; untouched entries are CARRIED: whole
    * directories when clean, per-file entries when a directory is
    * partially touched (file-grain CoW). Hive-partitioned snapshots
    * rewrite at version-DIRECTORY grain instead (a carried entry must
    * stay a whole hive directory or the partition columns would drop
    * on read), preserving the partitioned layout.
    *
    * Sidecar upkeep stays incremental: data files are immutable, so
    * the next [[analyzeFiles]]/[[analyzeFilesBloom]] reuses every
    * carried file's rows and scans only the rewritten files
    * (LakehouseSpec pins the count). Returns the new snapshot, or the
    * CURRENT one untouched when nothing matches (no empty commit).
    * Deleting every row of an unpartitioned single-entry table is
    * refused (a snapshot cannot be empty) — takedowns are selective
    * by nature; drop the table instead. */
  def deleteWhere(spark: SparkSession, table: String, pred: Column): Snapshot =
    deleteCore(spark, table, pred,
      scanFor = (snap, full) => {
        // envelope pruning is derived from the PREDICATE ITSELF, so it
        // cannot be unsound: only conjunctive numeric range/equality
        // shapes yield bounds, everything else scans fully. (An earlier
        // design took caller-supplied ranges on trust — a hint narrower
        // than the predicate would have silently left matching rows
        // alive in pruned files, in the takedown path of all places.)
        val ranges = boundsFromPred(pred)
        if (ranges.nonEmpty) readPrunedAll(spark, table, ranges) else full
      })

  /** Per-column [lo, hi] bounds IMPLIED by a predicate — sound for
    * file pruning: a file whose envelope misses the bounds cannot hold
    * a matching row. Conjunctions intersect; bare numeric
    * comparisons/equality/between bound one side; any other shape
    * (OR, UDFs, strings, IN) contributes nothing — the caller of the
    * pruned scan then reads everything, conservatively. */
  private[graft] def boundsFromPred(pred: Column): Seq[(String, Double, Double)] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    def num(l: Any): Option[Double] = l match {
      case n: Number => Some(n.doubleValue())
      case d: java.math.BigDecimal => Some(d.doubleValue())
      case d: scala.math.BigDecimal => Some(d.toDouble)
      case _ => None
    }
    def attr(e: Expression): Option[String] = e match {
      // deliberately NO Cast unwrapping: a narrowing cast can wrap
      // values, so a bound on cast(col) does not bound col
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def lower(a: Expression, v: Any) = (attr(a), num(v)) match {
      case (Some(c), Some(x)) => Seq((c, x, Double.PositiveInfinity))
      case _ => Nil
    }
    def upper(a: Expression, v: Any) = (attr(a), num(v)) match {
      case (Some(c), Some(x)) => Seq((c, Double.NegativeInfinity, x))
      case _ => Nil
    }
    def point(a: Expression, v: Any) = (attr(a), num(v)) match {
      case (Some(c), Some(x)) => Seq((c, x, x))
      case _ => Nil
    }
    def walk(e: Expression): Seq[(String, Double, Double)] = e match {
      case And(l, r) => walk(l) ++ walk(r)
      case GreaterThan(a, Literal(v, _)) => lower(a, v)
      case GreaterThan(Literal(v, _), a) => upper(a, v)
      case GreaterThanOrEqual(a, Literal(v, _)) => lower(a, v)
      case GreaterThanOrEqual(Literal(v, _), a) => upper(a, v)
      case LessThan(a, Literal(v, _)) => upper(a, v)
      case LessThan(Literal(v, _), a) => lower(a, v)
      case LessThanOrEqual(a, Literal(v, _)) => upper(a, v)
      case LessThanOrEqual(Literal(v, _), a) => lower(a, v)
      case EqualTo(a, Literal(v, _)) => point(a, v)
      case EqualTo(Literal(v, _), a) => point(a, v)
      case _ => Nil
    }
    // intersect multiple bounds on the same column
    walk(GraftBridge.expression(pred))
      .groupBy(_._1).toSeq.map { case (c, bs) =>
        (c, bs.map(_._2).max, bs.map(_._3).min)
      }.filter { case (_, lo, hi) => lo <= hi }.sortBy(_._1)
  }

  /** POINT takedown: delete the rows whose `column` is one of
    * `values` — the literal right-to-be-forgotten shape ("remove
    * these 37 opted-out ids"). Phase 1's candidate files come from
    * the BLOOM sidecar when one covers the column ([[readPoint]]'s
    * per-value decision, OR'd across the values; Bloom false
    * negatives are impossible, so the restriction is sound and false
    * positives only cost scanning an extra candidate) — at 100 TB a
    * handful-of-ids takedown opens a handful of files, decided at
    * the driver before any footer. No sidecar / partitioned layout /
    * uncovered files degrade to the exact full phase-1 scan. */
  def deleteKeys(spark: SparkSession, table: String, column: String,
      values: Seq[Any]): Snapshot = {
    require(values.nonEmpty, "Manifest.deleteKeys: no values to delete")
    deleteCore(spark, table, F.col(column).isin(values: _*),
      scanFor = (snap, full) =>
        pointCandidates(spark, table, snap, full, column, values)
          .getOrElse(full))
  }

  private def deleteCore(spark: SparkSession, table: String, pred: Column,
      scanFor: (Snapshot, DataFrame) => DataFrame): Snapshot = {
    val snap = currentSnapshot(spark, table).getOrElse(
      sys.error(s"Manifest.deleteWhere: $table has no committed snapshot"))
    val fs = fsFor(spark, table)
    val full = readSnapshotData(spark, table, snap)
    val partitioned =
      full.inputFiles.exists(f => f.split('/').exists(_.contains("=")))
    val scanned = scanFor(snap, full)
    def norm(f: String) = new Path(f).toUri.getPath
    val touched = scanned.filter(pred)
      .select(F.input_file_name().as("f")).distinct()
      .collect().map(r => norm(r.getString(0))).toSet
    if (touched.isEmpty) return snap
    val tableAbs = norm(fs.makeQualified(new Path(table)).toString)
    val allFiles = full.inputFiles.map(norm)
    // file → owning manifest entry via prefixResolver's '/'-boundary
    // hash lookups (O(F·depth)); a per-file linear scan of the entry
    // list is O(F·E) — quadratic at the 100k-file manifests
    // ManifestScale measures
    val entryFor = prefixResolver(snap.paths)
    val filesUnder = allFiles.groupBy { f =>
      val rel = f.stripPrefix(tableAbs).stripPrefix("/")
      entryFor(rel).getOrElse(
        sys.error(s"Manifest.deleteWhere: $f outside the pinned snapshot"))
    }
    val parts = snap.meta.get(PartitionKey)
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    if (!partitioned) {
      val (dirty, clean) = snap.paths.partition(p =>
        filesUnder.getOrElse(p, Array.empty[String]).exists(touched))
      // file-grain carry inside partially-touched entries: every
      // untouched file survives as its own manifest entry (readers
      // accept file entries on unpartitioned layouts)
      val carriedFiles = dirty.flatMap(p =>
        filesUnder(p).filterNot(touched)
          .map(_.stripPrefix(tableAbs).stripPrefix("/")))
      // survivors = rows where pred is NOT TRUE — `!pred` alone would
      // silently drop NULL-evaluating rows from rewritten files (they
      // don't match the delete, but three-valued NOT(NULL) is NULL).
      // Read under the COMMITTED schema: a mixed pre-/post-evolution
      // touched set read raw would drop evolved columns from the
      // rewrite (silent data loss)
      val survivors = snapshotReader(spark, snap)
        .parquet(touched.toSeq.sorted: _*)
        .filter(!F.coalesce(pred, F.lit(false)))
      val keepPaths = clean ++ carriedFiles
      val (rel, written) =
        writeDataCounted(spark, table, snap.version + 1, survivors, Nil)
      if (written == 0 && keepPaths.isEmpty) sys.error(
        s"Manifest.deleteWhere: predicate deletes every row of $table — " +
          "a snapshot cannot be empty; drop the table instead")
      val rels = if (written == 0) Nil else Seq(rel)
      commit(spark, table, snap.version, keepPaths ++ rels, snap.meta)
    } else {
      // hive layout: version-DIRECTORY-grain CoW — a carried entry
      // must remain a whole hive directory (a leaf-file or
      // partition-subdir entry would drop the partition columns on
      // read), so the rewrite unit is the version directory: dirty
      // ones re-read whole (partition columns intact), their
      // survivors land partitioned in the new version, clean ones
      // carry verbatim. Partition-predicate deletes still prune
      // phase 1 via partition pruning.
      val (dirtyEntries, cleanEntries) = snap.paths.partition(p =>
        filesUnder.getOrElse(p, Array.empty[String]).exists(touched))
      val survivors = dirtyEntries
        .map(p => spark.read.parquet(s"$table/$p"))
        .reduce(_ unionByName _)
        .filter(!F.coalesce(pred, F.lit(false))) // keep NULL-evaluating rows
      val (rel, written) =
        writeDataCounted(spark, table, snap.version + 1, survivors, parts)
      if (written == 0 && cleanEntries.isEmpty) sys.error(
        s"Manifest.deleteWhere: predicate deletes every row of $table — " +
          "a snapshot cannot be empty; drop the table instead")
      val rels = if (written == 0) Nil else Seq(rel)
      commit(spark, table, snap.version, cleanEntries ++ rels, snap.meta)
    }
  }

  // ---- file skipping (per-file envelopes as a snapshot sidecar) ----

  private def statsDir(table: String, v: Long) =
    new Path(s"$table/_manifest/stats_v${"%08d".format(v)}")

  /** Sidecar read, degraded-not-failed: sidecars are an OPTIONAL
    * accelerator, so any read race — a concurrent [[buildSidecar]]
    * swap, a [[vacuum]] reclaiming the version — must collapse to
    * "no sidecar" (conservative full read), never a reader error.
    * The rows are pulled to the driver ONCE and handed to the pruning
    * decision as raw rows (#files grain — the size every decision
    * already collects); no re-wrapped relation, so a snapshot with
    * large per-file Bloom sidecars holds ONE driver copy, not two. */
  private def sidecarRows(spark: SparkSession, dir: Path)
      : Option[(org.apache.spark.sql.types.StructType,
        Array[org.apache.spark.sql.Row])] =
    try {
      val df = spark.read.parquet(dir.toString)
      Some((df.schema, df.collect()))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Record per-FILE min/max envelopes of `cols` for the current
    * snapshot, as a sidecar parquet under `_manifest/` (invisible to
    * data readers; version-scoped, so immutable-file semantics carry
    * over). Numeric columns record a double envelope (exact below
    * 2⁵³); others are skipped (string pruning can be added the same
    * way — the [[Stats.analyzeSketch]] type-split). The sidecar is an
    * OPTIONAL accelerator: [[readPruned]] falls back to the full file
    * list for versions without one, and files the stats frame does
    * not mention are always read.
    *
    * INCREMENTAL: data files are immutable, so any retained prior
    * sidecar's rows (same column set) are reused for the files still
    * in the snapshot, and only uncovered files — the appended ones —
    * are scanned. Per-append maintenance cost is therefore ∝ new
    * data, never the table (the [[Stats.mergeSketchStats]] argument
    * at file grain); a fully-covered snapshot is a no-op. Returns the
    * number of files actually scanned. */
  def analyzeFiles(spark: SparkSession, table: String,
      cols: Seq[String]): Int = {
    require(cols.nonEmpty, "analyzeFiles needs at least one column")
    buildSidecar(spark, table, statsDir,
      keepCol = (df, c) => df.schema(c).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      statNames = c => Seq(s"${c}__min", s"${c}__max"),
      fieldType = org.apache.spark.sql.types.DoubleType,
      aggsFor = cs => cs.flatMap(c =>
        Seq(F.min(F.col(c)).cast("double").as(s"${c}__min"),
          F.max(F.col(c)).cast("double").as(s"${c}__max"))),
      cols, "analyzeFiles")
  }

  /** The incremental-sidecar engine shared by [[analyzeFiles]] and
    * [[analyzeFilesBloom]]. Column evolution is NON-DESTRUCTIVE: the
    * effective column set is the UNION of the request and whatever the
    * newest retained sidecar already covers (recovered from its stat
    * column names), so a narrower re-run never drops a column a reader
    * may still be pruning on; rows carry over verbatim only when the
    * prior sidecar covers the full effective set, otherwise every file
    * rescans for the union. Returns the number of files scanned. */
  private def buildSidecar(spark: SparkSession, table: String,
      dirFor: (String, Long) => Path,
      keepCol: (DataFrame, String) => Boolean,
      statNames: String => Seq[String],
      fieldType: org.apache.spark.sql.types.DataType,
      aggsFor: Seq[String] => Seq[Column],
      cols: Seq[String], what: String): Int = {
    val snap = currentSnapshot(spark, table).getOrElse(
      sys.error(s"Manifest.$what: $table has no committed snapshot"))
    val fs = fsFor(spark, table)
    val df = readSnapshotData(spark, table, snap)
    val prior = versions(spark, table)
      .filter(v => fs.exists(dirFor(table, v))).lastOption
      .flatMap(v => sidecarRows(spark, dirFor(table, v)))
    // data columns the prior sidecar covers, recovered from its stat
    // names (everything before the last "__" marker)
    val priorCols = prior.toSeq.flatMap(_._1.fieldNames.toSeq)
      .filter(_ != "file").map(n => n.substring(0, n.lastIndexOf("__")))
      .distinct
    val effCols = (cols ++ priorCols).distinct
      .filter(c => df.columns.contains(c) && keepCol(df, c))
    require(effCols.nonEmpty,
      s"$what: no eligible columns among ${cols.mkString(",")}")
    val statCols = "file" +: effCols.flatMap(statNames)
    val allFiles = df.inputFiles.toSet
    // rows carry over verbatim (files are immutable) when the prior
    // sidecar covers the FULL effective column set
    val reuse: Seq[org.apache.spark.sql.Row] = prior.toSeq.flatMap {
      case (sch, rows) =>
        if (statCols.forall(sch.fieldNames.contains)) {
          // rows are already driver metadata at #files grain, detached
          // from the old sidecar files before the swap
          val idx = statCols.map(sch.fieldIndex)
          rows.toSeq.map(r =>
              org.apache.spark.sql.Row.fromSeq(idx.map(r.get)))
            .filter(r => allFiles.contains(r.getString(0)))
        } else Nil
    }
    val covered = reuse.map(_.getString(0)).toSet
    val newFiles = (allFiles -- covered).toSeq.sorted
    val target = dirFor(table, snap.version)
    if (newFiles.isEmpty && fs.exists(target) && reuse.size == allFiles.size)
      return 0 // fully covered at this version already
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("file",
        org.apache.spark.sql.types.StringType) +:
        effCols.flatMap(statNames).map(n =>
          org.apache.spark.sql.types.StructField(n, fieldType)))
    val reused = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(reuse).asJava), schema)
    val aggs = aggsFor(effCols)
    val fresh =
      if (newFiles.isEmpty) reused.limit(0)
      else {
        val nf = spark.read.parquet(newFiles: _*)
        // hive-partitioned snapshots carry partition columns only when
        // read through their directories — a leaf-file read loses
        // them, so analyze such a column from the full snapshot scan
        val src = if (effCols.forall(c => nf.columns.contains(c))) nf
          else df.filter(F.input_file_name().isInCollection(newFiles))
        src.groupBy(F.input_file_name().as("file"))
          .agg(aggs.head, aggs.tail: _*)
      }
    // tmp-write + rename-in: the visible swap is two metadata ops
    // (delete + atomic rename) instead of a whole overwrite job, so a
    // racing reader resolves either the complete old sidecar or —
    // inside the tiny delete→rename window — nothing, and
    // [[sidecarLocal]] degrades that (and any other race) to the
    // conservative full read. Dot-prefixed tmp dirs are invisible to
    // every listing; leftovers from a crashed build are reclaimed on
    // the next run.
    val parent = target.getParent
    if (fs.exists(parent)) fs.listStatus(parent).map(_.getPath)
      .filter(_.getName.startsWith(s".${target.getName}.tmp-"))
      .foreach(fs.delete(_, true))
    val tmp = new Path(parent,
      s".${target.getName}.tmp-${java.util.UUID.randomUUID}")
    reused.unionByName(fresh).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(target, true)
    if (!fs.rename(tmp, target))
      sys.error(s"Manifest.$what: failed to swap sidecar into $target")
    newFiles.size
  }

  private def bloomDir(table: String, v: Long) =
    new Path(s"$table/_manifest/bloom_v${"%08d".format(v)}")

  /** Per-file BLOOM sidecar — the point-lookup complement of
    * [[analyzeFiles]]: min/max envelopes prune RANGE predicates on
    * clustered columns, but an equality probe on an unclustered
    * high-cardinality column (a doc id, a user id) intersects every
    * envelope; a per-file Bloom filter of the column's xxhash64 values
    * answers "might this file contain v?" instead. Built with the same
    * internal `BloomFilterAggregate` the runtime bloom-join uses, one
    * grouped pass, INCREMENTAL exactly like [[analyzeFiles]] (prior
    * sidecar rows reused for still-present files; returns the number
    * of files scanned). False positives only cost an extra file read;
    * false negatives cannot happen, so pruning is always sound. */
  def analyzeFilesBloom(spark: SparkSession, table: String,
      cols: Seq[String], expectedItemsPerFile: Long = 1000000L,
      fpp: Double = 0.01): Int = {
    require(cols.nonEmpty, "analyzeFilesBloom needs at least one column")
    require(expectedItemsPerFile > 0 && fpp > 0 && fpp < 1,
      s"bad sizing: $expectedItemsPerFile items, fpp $fpp")
    val ln2 = math.log(2)
    val numBits = math.ceil(
      -expectedItemsPerFile * math.log(fpp) / (ln2 * ln2)).toLong
    // BloomFilterAggregate silently Math.min-clamps against the
    // runtime bloom-join caps (the historyBloom lesson — a clamped
    // filter saturates and the skip rate silently collapses): raise
    // them to what this sizing asks for. The build below executes
    // EAGERLY (the sidecar write), so the caps are saved first and
    // restored before returning — the raise never leaks into
    // Catalyst's own runtime bloom-join decisions.
    val conf = spark.conf
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val saved = Seq(bitsKey, itemsKey).map(k => k -> conf.getOption(k))
    if (conf.get(bitsKey, "67108864").toLong < numBits)
      conf.set(bitsKey, numBits.toString)
    if (conf.get(itemsKey, "4000000").toLong < expectedItemsPerFile)
      conf.set(itemsKey, expectedItemsPerFile.toString)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    try buildSidecar(spark, table, bloomDir,
      keepCol = (_, _) => true,
      statNames = c => Seq(s"${c}__bloom"),
      fieldType = org.apache.spark.sql.types.BinaryType,
      aggsFor = cs => cs.map { c =>
        GraftBridge.column(new BloomFilterAggregate(
          GraftBridge.expression(F.xxhash64(F.col(c))),
          Literal(expectedItemsPerFile), Literal(numBits))
          .toAggregateExpression()).as(s"${c}__bloom")
      },
      cols, "analyzeFilesBloom")
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** Point-lookup read: the current snapshot restricted to the files
    * whose Bloom sidecar says MIGHT contain `value` in `column` — the
    * [[readPruned]] decision shape (driver-side, sidecar only,
    * uncovered files conservatively read, no sidecar or a partitioned
    * snapshot = plain read). The probe hashes through a 1-row Spark
    * query with the value cast to the column's own type, so the bits
    * agree with the aggregate's xxhash64 exactly. */
  def readPoint(spark: SparkSession, table: String,
      column: String, value: Any): DataFrame =
    readPointAny(spark, table, column, Seq(value))

  /** [[readPoint]] for a SET of probe values (OR semantics): the
    * current snapshot restricted to the files whose Bloom sidecar says
    * MIGHT contain ANY of them — one sidecar pass however many values
    * (the multi-id takedown's phase-1 restriction, and a point-read in
    * its own right). Same conservatism: no sidecar / hive layout /
    * uncovered column ⇒ the plain pinned read. */
  def readPointAny(spark: SparkSession, table: String, column: String,
      values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "Manifest.readPointAny: no probe values")
    val snap = currentSnapshot(spark, table).getOrElse(
      sys.error(s"Manifest.readPointAny: $table has no committed snapshot"))
    val full = readSnapshotData(spark, table, snap)
    pointCandidates(spark, table, snap, full, column, values).getOrElse(full)
  }

  /** The bloom-sidecar pruning decision shared by [[readPointAny]]
    * and [[deleteKeys]]: Some(pruned frame) when a sidecar covers the
    * column on an unpartitioned layout, None ⇒ caller serves the full
    * read. The pruned subset reads under the snapshot's committed
    * schema like every other partial read. */
  private def pointCandidates(spark: SparkSession, table: String,
      snap: Snapshot, full: DataFrame, column: String,
      values: Seq[Any]): Option[DataFrame] = {
    val fs = fsFor(spark, table)
    val bd = bloomDir(table, snap.version)
    if (!fs.exists(bd) ||
        full.inputFiles.exists(f => f.split('/').exists(_.contains("="))))
      return None
    val (sch, rows) = sidecarRows(spark, bd).getOrElse(return None)
    // sidecar predates this column: conservative full read, never a
    // resolution error
    if (!sch.fieldNames.contains(s"${column}__bloom")) return None
    val dt = full.schema(column).dataType
    val probes = spark.range(1).select(
        F.array(values.map(v => F.xxhash64(F.lit(v).cast(dt))): _*))
      .first().getSeq[Long](0)
    val fi = sch.fieldIndex("file")
    val bi = sch.fieldIndex(s"${column}__bloom")
    val known = rows.map(_.getString(fi)).toSet
    val keep = rows.filter { r =>
      val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](bi)))
      probes.exists(bf.mightContainLong)
    }.map(_.getString(fi))
    val unknown = full.inputFiles.filterNot(known.contains)
    val paths = (keep ++ unknown).distinct
    Some(if (paths.isEmpty) full.limit(0)
      else snapshotReader(spark, snap).parquet(paths.toIndexedSeq: _*))
  }

  /** Pinned read of the current snapshot restricted — at the DRIVER,
    * from sidecar metadata alone, before any footer is opened — to the
    * files whose recorded `[min, max]` envelope of `column` intersects
    * `[lo, hi]`. The 100 TB point: after a range-clustering compaction
    * ([[compact]] with `sortBy`, or a Z-order layout), a narrow
    * predicate reads a handful of files out of thousands, and the
    * skipping decision costs one tiny sidecar scan instead of a
    * listing + footer pass over the data. Files without stats rows are
    * conservatively read; no sidecar at all = plain [[read]]. The
    * caller still applies its own row-level filter — envelopes prune
    * files, not rows. */
  def readPruned(spark: SparkSession, table: String,
      column: String, lo: Double, hi: Double): DataFrame =
    readPrunedAll(spark, table, Seq((column, lo, hi)))

  /** [[readPruned]] for a CONJUNCTION of ranges — a file survives only
    * if EVERY predicate's envelope intersects, which is where a
    * z-clustered layout pays twice (LakehouseSpec's grid test). */
  def readPrunedAll(spark: SparkSession, table: String,
      ranges: Seq[(String, Double, Double)]): DataFrame = {
    require(ranges.nonEmpty, "readPrunedAll needs at least one range")
    val snap = currentSnapshot(spark, table).getOrElse(
      sys.error(s"Manifest.readPruned: $table has no committed snapshot"))
    val fs = fsFor(spark, table)
    val sd = statsDir(table, snap.version)
    if (!fs.exists(sd))
      return readSnapshotData(spark, table, snap)
    // hive-partitioned snapshots: leaf-file reads would silently drop
    // the partition columns, and their pruning is already partition
    // pruning's job — serve the plain pinned read instead
    val full = readSnapshotData(spark, table, snap)
    if (full.inputFiles.exists(f => f.split('/').exists(_.contains("="))))
      return full
    val (sch, rows) = sidecarRows(spark, sd).getOrElse(return full)
    // sidecar predates one of the probed columns: conservative full
    // read, never a resolution error
    if (!ranges.forall { case (c, _, _) =>
        sch.fieldNames.contains(s"${c}__min") &&
          sch.fieldNames.contains(s"${c}__max") })
      return full
    val fi = sch.fieldIndex("file")
    val known = rows.map(_.getString(fi)).toSet
    val keep = rows.filter { r =>
      ranges.forall { case (c, lo, hi) =>
        val mi = sch.fieldIndex(s"${c}__min")
        val ma = sch.fieldIndex(s"${c}__max")
        // mirrors the SQL semantics of !(max < lo OR min > hi): NULL
        // stats (an all-NULL column in that file) are never kept — a
        // range predicate cannot match a NULL row anyway
        !r.isNullAt(mi) && !r.isNullAt(ma) &&
          !(r.getDouble(ma) < lo || r.getDouble(mi) > hi)
      }
    }.map(_.getString(fi))
    // every file of the pinned snapshot the sidecar does not cover
    // stays in (stats are an accelerator, never a correctness gate)
    val unknown = full.inputFiles.filterNot(f => known.contains(f))
    val paths = (keep ++ unknown).distinct
    if (paths.isEmpty) full.limit(0)
    else snapshotReader(spark, snap).parquet(paths.toIndexedSeq: _*)
  }

  /** Total bytes of a snapshot's data (driver-side metadata listing). */
  def snapshotBytes(spark: SparkSession, table: String, snap: Snapshot): Long = {
    val fs = fsFor(spark, table)
    snap.paths.map(p => fs.getContentSummary(new Path(s"$table/$p")).getLength).sum
  }

  /** Compact the current snapshot into ⌈bytes / targetBytes⌉ files —
    * the manifest-protocol replacement for the rename-swap compaction:
    * write the folded data as the NEXT version, then one atomic
    * manifest commit. Readers mid-flight keep their pinned snapshot;
    * new readers see the compacted one; a crash at any point leaves
    * either the old current (data written, commit missing — reclaimed
    * next run) or the new one (committed). Old versions stay for
    * pinned readers until [[vacuum]]. */
  def compact(spark: SparkSession, table: String, targetBytes: Long,
      sortBy: Option[Column] = None): Snapshot = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val snap = currentSnapshot(spark, table).getOrElse(
      sys.error(s"Manifest.compact: $table has no committed snapshot"))
    val totalBytes = snapshotBytes(spark, table, snap)
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = readSnapshotData(spark, table, snap)
    val laid = sortBy match {
      case Some(c) => df.repartitionByRange(nFiles, c).sortWithinPartitions(c)
      case None => df.coalesce(nFiles)
    }
    // a hive-partitioned table stays partitioned through compaction —
    // the layout is recorded as commit metadata at create/append time,
    // since nothing else remembers it and silently flattening would
    // destroy partition pruning for every later reader
    val parts = snap.meta.get(PartitionKey)
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val rel = writeData(spark, table, snap.version + 1, laid, parts)
    // carry the metadata forward — see commitAppend
    commit(spark, table, snap.version, Seq(rel), snap.meta)
  }

  /** Retention: drop every snapshot except the newest `keep` — delete
    * their manifests first (so no reader can newly pin them), then any
    * version data directory no surviving manifest references. Root
    * files from an [[adopt]]-ed v1 are removed once v1 is dropped.
    * Never touches the current version; idempotent. */
  def vacuum(spark: SparkSession, table: String, keep: Int = 2): Unit = {
    require(keep >= 1, s"must keep at least the current snapshot, got $keep")
    val fs = fsFor(spark, table)
    val vs = versions(spark, table)
    if (vs.isEmpty) return // plain / never-committed table: documented no-op
    val current = vs.last
    val (dead, live) = vs.splitAt(math.max(0, vs.size - keep))
    val deadSnaps = dead.map(readSnapshot(spark, table, _))
    dead.foreach { v =>
      fs.delete(manifestFile(table, v), false)
      fs.delete(statsDir(table, v), true) // file-skipping sidecars, if any
      fs.delete(bloomDir(table, v), true)
    }
    val referenced = live.map(readSnapshot(spark, table, _))
      .flatMap(_.paths).toSet
    // an entry is live if a surviving snapshot lists it — or, since
    // [[deleteWhere]] carries per-FILE entries out of older dirs,
    // lists a file INSIDE it: deleting the whole dir would take the
    // CURRENT snapshot's carried files with it. Partially-referenced
    // dirs reclaim only their unreferenced parquet files. Lookup is a
    // sorted-range scan (O(log R) to locate, output-sized to read) —
    // a filter over the referenced set per dead entry is O(D·R),
    // quadratic at the 100k-file manifests ManifestScale measures.
    val refSorted = referenced.toArray.sorted
    def liveUnder(p: String): Set[String] = {
      val pref = p + "/"
      var lo = java.util.Arrays.binarySearch(
        refSorted.asInstanceOf[Array[AnyRef]], pref)
      if (lo < 0) lo = -lo - 1
      val out = Set.newBuilder[String]
      if (referenced.contains(p)) out += p
      var i = lo
      while (i < refSorted.length && refSorted(i).startsWith(pref)) {
        out += refSorted(i); i += 1
      }
      out.result()
    }
    deadSnaps.flatMap(_.paths).distinct.foreach { p =>
      val keep = liveUnder(p)
      if (keep.isEmpty) fs.delete(new Path(s"$table/$p"), true)
      else if (!keep.contains(p)) {
        val root = new Path(s"$table/$p")
        if (fs.exists(root)) {
          val keepAbs = keep.map(k =>
            fs.makeQualified(new Path(s"$table/$k")).toString)
          val it = fs.listFiles(root, true)
          while (it.hasNext) {
            val f = it.next().getPath
            if (f.getName.endsWith(".parquet") &&
                !keepAbs.contains(fs.makeQualified(f).toString))
              fs.delete(f, false)
          }
        }
      }
    }
    // reclaim ORPHANED data dirs — crashed or race-losing writers'
    // uncommitted uniquely-suffixed directories. Only versions at or
    // below the current one: an in-flight writer is building
    // version current+1, which this predicate can never touch.
    fs.listStatus(new Path(table)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .foreach {
        case n @ DataDirName(v, _) if v.toLong <= current &&
            liveUnder(n).isEmpty =>
          fs.delete(new Path(s"$table/$n"), true)
        case _ => ()
      }
  }
}
