package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Top-K frequent values per group — the reference ecosystem's tuple
  * metric (ClickHouse `topK`; SURVEY §1.2 "Array-of-tuples metric values",
  * response_builder.rb:111-138 decodes `(value, count)` pairs).
  *
  * Scalable two-phase shape: partial-aggregated counts by
  * (group, value) — map-side combine keeps the shuffle proportional to
  * distinct pairs, not rows — then a per-group `row_number` window trims
  * to K *before* any array materialization, so no `collect_list` blowup
  * at 100 TB. Ties broken by value ascending for determinism.
  */
object TopK {

  /** Flat form: one row per (group, value) kept, `cnt` + `rank` columns. */
  def perGroupFlat(
      df: DataFrame,
      groupCols: Seq[(String, Column)],
      valueKey: String,
      valueCol: Column,
      k: Int): DataFrame = {
    val counted = df
      .groupBy((groupCols.map { case (n, c) => c.as(n) } :+ valueCol.as(valueKey)): _*)
      .agg(F.count(F.lit(1)).as("cnt"))
    val w = Window.partitionBy(groupCols.map { case (n, _) => F.col(n) }: _*)
      .orderBy(F.col("cnt").desc_nulls_last, F.col(valueKey).asc_nulls_first)
    counted.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
  }

  /** Tuple form: one row per group with `topk: array<struct<value,cnt>>`
    * ordered by count desc, value asc (deterministic). */
  def perGroupTuples(
      df: DataFrame,
      groupCols: Seq[(String, Column)],
      valueCol: Column,
      k: Int,
      outKey: String = "topk"): DataFrame = {
    val flat = perGroupFlat(df, groupCols, "value", valueCol, k)
    // array_sort orders struct fields lexicographically ascending, so sort
    // on (-cnt, value) then strip the sort key
    val sorted = F.array_sort(F.collect_list(F.struct(
      (-F.col("cnt")).as("neg"), F.col("value"), F.col("cnt"))))
    flat.groupBy(groupCols.map { case (n, _) => F.col(n) }: _*)
      .agg(F.transform(sorted,
        x => F.struct(x.getField("value").as("value"), x.getField("cnt").as("cnt")))
        .as(outKey))
  }

  /** [[perGroupTuples]] with the SKETCH METRIC's group contract: one row
    * for EVERY group present in `df` (not just groups with surviving
    * values), empty array — never null — where `pred` filtered every
    * value out. This is the exact plan-backed form behind the `topParts`
    * metric's `exact: true` arg ([[graft.model.Metric.planBuild]]): two
    * scans of the fact (group set + counted values) instead of one, the
    * price of bit-exactness at any scale; the join back is on the tiny
    * group cardinality, AQE-broadcast.
    */
  def perGroupTuplesComplete(
      df: DataFrame,
      groupCols: Seq[(String, Column)],
      valueCol: Column,
      k: Int,
      pred: Option[Column],
      outKey: String = "__pb_value"): DataFrame = {
    PlanBacked.groupContract(df, groupCols, pred, outKey)(
      (vals, keyed) => perGroupTuples(vals, keyed, valueCol, k, outKey))(
      t => F.array().cast(t.schema(outKey).dataType))
  }
}
