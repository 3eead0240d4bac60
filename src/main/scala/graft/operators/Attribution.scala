package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Multi-touch attribution over an event stream: for every conversion,
  * the touch events of the same user inside a lookback window share
  * the credit — the three standard position rules at once (linear =
  * 1/n each, first-touch, last-touch). The conversion report is the
  * per-channel sum.
  *
  * Scale shape: ONE equi-join on the user key (conversions × touches
  * co-partition on `user`; the window predicate is a residual filter
  * on the join, not a second exchange), then two window passes keyed
  * by conversion id and one final aggregation by channel. Nothing is
  * ever corpus²: a user's touches only meet that user's conversions.
  * Skewed power users salt like any hot join key (q29's pattern).
  *
  * Determinism: ties on touch timestamp break by event id — earliest
  * id wins first-touch, latest id wins last-touch — so the report is
  * identical across engines and partitionings. Conversions with no
  * touch in the window carry no credit anywhere (they simply have no
  * joined rows); `n_conversions` counts the ATTRIBUTED conversions
  * per channel.
  */
object Attribution {

  def report(events: DataFrame, idCol: Column, userCol: Column,
      tsCol: Column, typeCol: Column, conversionType: String,
      lookbackHours: Int): DataFrame = {
    require(lookbackHours >= 1, s"lookbackHours must be >= 1, got $lookbackHours")
    val conv = events.filter(typeCol === conversionType)
      .select(idCol.as("conv_id"), userCol.as("user"), tsCol.as("conv_ts"))
    val touch = events.filter(typeCol =!= conversionType)
      .select(idCol.as("touch_id"), userCol.as("user"),
        tsCol.as("touch_ts"), typeCol.as("touch_type"))
    val joined = conv.join(touch, Seq("user"))
      .filter(F.col("touch_ts") <= F.col("conv_ts") &&
        F.col("touch_ts") >=
          F.col("conv_ts") - F.expr(s"INTERVAL $lookbackHours HOURS"))
    val w = Window.partitionBy("conv_id")
    joined
      .withColumn("n", F.count(F.lit(1)).over(w))
      .withColumn("rf", F.row_number().over(
        w.orderBy(F.col("touch_ts").asc, F.col("touch_id").asc)))
      .withColumn("rl", F.row_number().over(
        w.orderBy(F.col("touch_ts").desc, F.col("touch_id").desc)))
      .groupBy(F.col("touch_type").as("event_type"))
      .agg(
        // per-touch linear credit summed as 6dp micro-units in LONGs
        // (the q189 pattern): a double sum's value depends on
        // partition order, and a total within 1 ulp of a 6th-decimal
        // boundary would flip against any fixed-order re-computation
        F.round(F.sum(F.round(F.lit(1e6) / F.col("n")).cast("long"))
          .cast("double") / 1e6, 6).as("credit_linear"),
        F.sum(F.when(F.col("rf") === 1, 1L).otherwise(0L)).as("credit_first"),
        F.sum(F.when(F.col("rl") === 1, 1L).otherwise(0L)).as("credit_last"),
        F.count_distinct(F.col("conv_id")).as("n_conversions"))
      .orderBy(F.col("event_type").asc)
  }
}
