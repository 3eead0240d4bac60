package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

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
  */
object PrefixSum {

  /** Adds `outCol` = inclusive global running sum of `value` ordered by
    * `sortKeys` (ties must be broken by the keys for determinism —
    * include a unique tiebreaker). `partitions` bounds the range split. */
  def runningTotal(
      df: DataFrame, sortKeys: Seq[Column], value: Column,
      outCol: String = "cum", partitions: Int = 32): DataFrame = {
    require(sortKeys.nonEmpty, "runningTotal needs at least one sort key")
    val ranged = df.repartitionByRange(partitions, sortKeys: _*)
      .withColumn("__ps_pid", F.spark_partition_id())
      .withColumn("__ps_v", value)
    val w = Window.partitionBy(F.col("__ps_pid")).orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__ps_local", F.sum(F.col("__ps_v")).over(w))
    // per-partition totals: numPartitions tiny rows -> prefix offsets
    val totals = local.groupBy(F.col("__ps_pid"))
      .agg(F.sum(F.col("__ps_v")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getAs[Number](1).doubleValue()).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0.0)((acc, p) => acc + totals(p)).init).toMap
    val offsetCol = pids.foldRight(F.lit(0.0): Column) { (p, els) =>
      F.when(F.col("__ps_pid") === p, F.lit(offsets(p))).otherwise(els)
    }
    local.withColumn(outCol, F.col("__ps_local") + offsetCol)
      .drop("__ps_pid", "__ps_v", "__ps_local")
  }
}
