package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Distributed global running sum. `Window.orderBy(...)` with no
  * partitionBy collapses the whole dataset into ONE partition — the
  * classic silent scale-killer (fine at 60k rows, a single-executor
  * sort at 100 TB). This is the two-phase alternative:
  *
  *   1. range-partition by the sort keys (a distributed sort — the same
  *      machinery as any global orderBy),
  *   2. per-partition local running sums via a window PARTITIONED by
  *      the physical partition id (parallel, no data movement),
  *   3. per-partition totals (numPartitions rows) come to the driver,
  *      turn into prefix offsets, and broadcast back as a literal map —
  *      the only driver traffic is one tiny row per partition, exactly
  *      what RangePartitioner itself already ships.
  *
  * Result: `cum` = inclusive running total of `value` in (sortKeys)
  * order, identical to the single-partition window, with the widest
  * stage fully parallel.
  *
  * Consistency: RangePartitioner samples with a seed derived from the
  * RDD id, so two separate actions over an UNPERSISTED lineage can pick
  * different range boundaries — the totals would then describe a
  * different row→partition assignment than the output's. We persist the
  * locally-summed frame before the totals action and materialize the
  * result (eager localCheckpoint) from that same cache before
  * unpersisting, so offsets and output provably share one physical
  * partitioning. The checkpoint stores the output once — the same
  * footprint as the cache it replaces, and a prefix-summed frame is
  * normally written out immediately anyway.
  */
object PrefixSum {

  /** Adds `outCol` = inclusive global running sum of `value` ordered by
    * `sortKeys` (ties must be broken by the keys for determinism —
    * include a unique tiebreaker). `partitions` bounds the range split.
    * Integral inputs keep exact Long arithmetic end-to-end (no silent
    * double coercion past 2^53); everything else runs in Double. */
  def runningTotal(
      df: DataFrame, sortKeys: Seq[Column], value: Column,
      outCol: String = "cum", partitions: Int = 32): DataFrame = {
    require(sortKeys.nonEmpty, "runningTotal needs at least one sort key")
    val local = localStage(df, sortKeys, value, partitions)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // per-partition totals: numPartitions tiny rows -> prefix offsets.
      // An all-null partition sums to SQL NULL -> contributes 0.
      val rows = local.groupBy(F.col("__ps_pid"))
        .agg(F.sum(F.col("__ps_v")).as("__t")).collect()
      val sumIsLong = local.schema("__ps_local").dataType == LongType
      val offsetCol: Column =
        if (sumIsLong) {
          val totals = rows.map(r =>
            r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
          val pids = totals.keys.toSeq.sorted
          val offs = pids.zip(pids.scanLeft(0L)(_ + totals(_)).init).toMap
          pids.foldRight(F.lit(0L): Column) { (p, els) =>
            F.when(F.col("__ps_pid") === p, F.lit(offs(p))).otherwise(els)
          }
        } else {
          val totals = rows.map(r =>
            r.getInt(0) -> (if (r.isNullAt(1)) 0.0
                            else r.getAs[Number](1).doubleValue())).toMap
          val pids = totals.keys.toSeq.sorted
          val offs = pids.zip(pids.scanLeft(0.0)(_ + totals(_)).init).toMap
          pids.foldRight(F.lit(0.0): Column) { (p, els) =>
            F.when(F.col("__ps_pid") === p, F.lit(offs(p))).otherwise(els)
          }
        }
      local.withColumn(outCol, F.col("__ps_local") + offsetCol)
        .drop("__ps_pid", "__ps_v", "__ps_local")
        .localCheckpoint(eager = true) // materialize off the SAME cache
    } finally local.unpersist(blocking = false)
  }

  /** The distributed stage (range split + per-partition cumsum) before
    * any action — exposed so specs can assert the plan shape (no
    * SinglePartition exchange) that the eager checkpoint in
    * [[runningTotal]] hides behind a LogicalRDD scan. */
  private[graft] def localStage(
      df: DataFrame, sortKeys: Seq[Column], value: Column,
      partitions: Int = 32): DataFrame = {
    val ranged = df.repartitionByRange(partitions, sortKeys: _*)
      .withColumn("__ps_pid", F.spark_partition_id())
      .withColumn("__ps_v", value)
    val w = Window.partitionBy(F.col("__ps_pid")).orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.withColumn("__ps_local", F.sum(F.col("__ps_v")).over(w))
  }
}
