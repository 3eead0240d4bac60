package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Multi-dimensional data layout for scan pruning — the Z-ORDER
  * clustering Delta/Iceberg expose as `OPTIMIZE ZORDER BY`, built from
  * primitives: interleave the bits of two bucketized axes into one
  * locality-preserving sort key, range-partition and sort the write by
  * it, and every written file ends up covering a small RECTANGLE of the
  * (axis1, axis2) space instead of a full-width stripe.
  *
  * Why it matters at 100 TB: parquet min/max file statistics prune
  * whole files, but only along the sort prefix — a layout sorted by
  * `user_id` answers `value BETWEEN …` by reading every file. Z-order
  * gives BOTH predicates sub-linear file counts (≈√F of F files for a
  * point-ish query on either axis, vs F on the non-prefix axis of a
  * linear sort). LakehouseSpec measures exactly that: the same range
  * predicate touches strictly fewer files under the z-layout than under
  * the single-axis sort.
  *
  * Everything is plain Column bit arithmetic (codegen'd, engine- and
  * partition-independent, SQL-replayable — q167's oracle recomputes the
  * key bit-for-bit in DuckDB).
  */
object Layout {

  /** Fixed-domain bucketizer: maps `v` in [min, max) onto
    * [0, 2^bits), clamping outliers into the edge buckets. The domain
    * bounds are LITERALS by design — layout keys must not depend on
    * run-time data statistics, or two incremental writes of the same
    * table would disagree on the key space. */
  def axisBucket(v: Column, min: Double, max: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in 1..31, got $bits")
    require(max > min, s"need max > min, got [$min, $max)")
    val n = 1L << bits
    F.least(
      F.greatest(
        F.floor((v.cast("double") - min) / (max - min) * n).cast("long"),
        F.lit(0L)),
      F.lit(n - 1))
  }

  /** Morton/Z interleave of two `bits`-wide bucket ids: bit i of `b1`
    * lands at position 2i, bit i of `b2` at 2i+1. Statically unrolled
    * shift/mask/or chain — whole-stage codegen keeps it branch-free. */
  def zValue(b1: Column, b2: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in 1..31, got $bits")
    (0 until bits).foldLeft(F.lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(F.shiftleft(F.shiftright(b1, i).bitwiseAND(F.lit(1L)), 2 * i))
        .bitwiseOR(F.shiftleft(F.shiftright(b2, i).bitwiseAND(F.lit(1L)), 2 * i + 1))
    }
  }

  /** Write `df` clustered by the z-curve over two numeric axes: one
    * range exchange on the z key into `files` writers, a partition-local
    * sort, and a parquet write whose per-file min/max stats are tight on
    * BOTH axes. The returned frame re-reads the layout. */
  def zorderWrite(df: DataFrame, path: String,
      axis1: Column, min1: Double, max1: Double,
      axis2: Column, min2: Double, max2: Double,
      bits: Int, files: Int): DataFrame = {
    val z = zValue(
      axisBucket(axis1, min1, max1, bits),
      axisBucket(axis2, min2, max2, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, F.col("__z"))
      .sortWithinPartitions(F.col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Small-files compaction — the other half of layout maintenance:
    * a table accreted by many incremental writes (micro-batches,
    * per-day backfills) degrades into thousands of KB-scale files
    * whose open/footer costs dominate the scan. Rewrite it into
    * ⌈totalBytes / targetBytes⌉ files, optionally re-sorted so the
    * per-file min/max envelopes stay tight.
    *
    * A [[Manifest]]-committed table routes to [[Manifest.compact]] —
    * the 100 TB-true protocol: snapshot write + one atomic manifest
    * commit, valid on object stores, readers pinned throughout.
    *
    * A PLAIN directory keeps the legacy rename swap: refuse on
    * leftover state from a crashed run, rename-or-die both hops,
    * delete the old data only once the new directory is verifiably in
    * place. The swap assumes an HDFS/posix-style filesystem with
    * atomic directory rename; even there, readers see the old or the
    * new layout, never a mixture — but between the two renames the
    * table path briefly does not exist, and a concurrent reader can
    * fail with path-not-found. On S3-class stores directory rename is
    * copy+delete and the swap is NOT safe — adopt the table into a
    * manifest ([[Manifest.adopt]]) instead.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long, sortBy: Option[Column] = None): Unit = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    if (Manifest.isManifested(spark, path)) {
      Manifest.compact(spark, path, targetBytes, sortBy)
      return
    }
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(path)
    val old = new Path(s"$path/../${dir.getName}__old")
    val tmp = new Path(s"$path/../${dir.getName}__compacting")
    if (fs.exists(old)) sys.error(
      s"Layout.compact: $old exists — a previous compaction did not " +
        "finish. Recover (restore or delete it) before compacting.")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val totalBytes = fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(path)
    val laid = sortBy match {
      case Some(c) => df.repartitionByRange(nFiles, c).sortWithinPartitions(c)
      case None => df.coalesce(nFiles)
    }
    laid.write.mode("overwrite").parquet(tmp.toString)
    def renameOrDie(src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst)) sys.error(
        s"Layout.compact: rename $src -> $dst failed; table left un-swapped")
    renameOrDie(dir, old)
    renameOrDie(tmp, dir)
    if (!fs.exists(dir)) sys.error(
      s"Layout.compact: $dir missing after swap; old data retained at $old")
    fs.delete(old, true)
  }

  /** Pruning audit: per written file, the min/max envelope of both
    * axes — the information parquet stats give a scan planner. A file
    * must be read by a predicate `axis ∈ [lo, hi]` iff the envelope
    * intersects it; [[filesTouched]] counts them. */
  def fileEnvelopes(layout: DataFrame, axis1: Column, axis2: Column): DataFrame =
    layout
      .groupBy(F.input_file_name().as("file"))
      .agg(
        F.min(axis1).as("a1_min"), F.max(axis1).as("a1_max"),
        F.min(axis2).as("a2_min"), F.max(axis2).as("a2_max"))

  /** How many files a single-axis range predicate must touch under the
    * layout (axis = 1 or 2). */
  def filesTouched(envelopes: DataFrame, axis: Int, lo: Double, hi: Double): Long = {
    val (mn, mx) =
      if (axis == 1) ("a1_min", "a1_max") else ("a2_min", "a2_max")
    envelopes
      .filter(F.col(mx) >= lo && F.col(mn) <= hi)
      .count()
  }
}
