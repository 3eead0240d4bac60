package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Skew-resistant aggregation: two-phase salted groupBy.
  *
  * At 100 TB a hot grouping key (one return flag, one event type) turns a
  * single reducer into the job's critical path. Salting splits each key
  * into `salts` sub-keys for the first (wide) aggregation, then combines
  * the per-salt partials with a second, tiny aggregation — both phases
  * stay re-aggregatable (count = sum of counts, sum = sum of sums).
  *
  * The salt is derived deterministically from a high-cardinality column
  * (not rand()) so runs are reproducible and AQE can still coalesce.
  * Spark's own AQE skew handling covers joins; this covers aggregations.
  */
object Skew {

  /** count + sums per key, salted. `sumCols`: output name → column. */
  def saltedCountSum(
      df: DataFrame,
      keys: Seq[(String, Column)],
      sumCols: Seq[(String, Column)],
      saltSource: Column,
      salts: Int = 16,
      countName: String = "cnt"): DataFrame = {
    val salt = F.pmod(F.xxhash64(saltSource), F.lit(salts)).as("__salt")
    val phase1 = df
      .groupBy((keys.map { case (n, c) => c.as(n) } :+ salt): _*)
      .agg(
        F.count(F.lit(1)).as("__pc"),
        sumCols.map { case (n, c) => F.sum(c).as(s"__ps_$n") }: _*)
    phase1
      .groupBy(keys.map { case (n, _) => F.col(n) }: _*)
      .agg(
        F.sum("__pc").as(countName),
        sumCols.map { case (n, _) => F.sum(s"__ps_$n").as(n) }: _*)
  }
}
