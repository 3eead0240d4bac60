package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Map-valued aggregation (ClickHouse `sumMap` family): per group, a
  * key→sum map over a secondary key column. Not expressible as ONE
  * aggregate expression over raw rows (the per-key sums need their own
  * grouping level), so it ships as a plan-backed metric
  * ([[graft.model.Metric.planBuild]]): two cascaded hash aggregations —
  * (group, key) partial sums, then a per-group map assembly — both
  * map-side combined, shuffle ∝ distinct (group, key) pairs.
  */
object MapAgg {

  /** (groups..., `__pb_value` = JSON {key: sum}) with the plan-backed
    * group contract: one row for EVERY group in `df`, `{}` — never
    * null — where `pred` filtered all values out. Keys sorted, so the
    * JSON is deterministic. */
  def sumMapJson(
      df: DataFrame,
      groupCols: Seq[(String, Column)],
      keyCol: Column,
      valCol: Column,
      pred: Option[Column],
      outKey: String = "__pb_value"): DataFrame = {
    PlanBacked.groupContract(df, groupCols, pred, outKey) { (vals, keyed) =>
      val pairs = vals
        .groupBy((keyed.map { case (n, c) => c.as(n) } :+ keyCol.as("__k")): _*)
        .agg(F.sum(valCol).as("__v"))
      pairs.groupBy(keyed.map { case (n, _) => F.col(n) }: _*)
        .agg(F.to_json(F.map_from_entries(F.array_sort(
          F.collect_list(F.struct(F.col("__k"), F.col("__v")))))).as(outKey))
    }(_ => F.lit("{}"))
  }
}
