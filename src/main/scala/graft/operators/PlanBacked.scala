package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** The shared group contract of every PLAN-BACKED cube metric
  * ([[graft.model.Metric]] `planBuild`): one output row for EVERY group
  * present in `df` — a group whose rows are all removed by `pred` (or
  * that produces no value rows) gets `default`, never null, and a flat
  * (no-slice) build yields exactly one row. Previously copied verbatim
  * at five sites (Funnel ×2, TopK, MapAgg, Similarity), which is
  * exactly how contract drift starts; the anchor/join/coalesce shape
  * lives here once.
  *
  * `value(vals, keyed)` builds the site-specific per-group frame with
  * columns (keyed names..., `outKey`) from the pred-filtered rows;
  * `default(t)` supplies the missing-group value (a function of the
  * value frame because e.g. TopK's empty array must match `t`'s element
  * type).
  */
object PlanBacked {
  def groupContract(
      df: DataFrame,
      groupCols: Seq[(String, Column)],
      pred: Option[Column],
      outKey: String)(
      value: (DataFrame, Seq[(String, Column)]) => DataFrame)(
      default: DataFrame => Column): DataFrame = {
    val (base, keyed) =
      if (groupCols.nonEmpty)
        (df.select(groupCols.map { case (n, c) => c.as(n) }: _*).distinct(), groupCols)
      else
        // one-row anchor for the flat build. spark.range(1), NOT an
        // agg over df — the previous df.agg(count) paid a full scan of
        // the fact just to manufacture a constant row.
        (df.sparkSession.range(1).select(F.lit(1).as("__pb_g")),
          Seq("__pb_g" -> F.lit(1)))
    val vals = pred.map(df.filter).getOrElse(df)
    val t = value(vals, keyed)
    // null-safe equality: a NULL group value is a real group and must
    // still find its value row
    val cond = keyed.map(_._1).map(n => base(n) <=> t(n)).reduce(_ && _)
    val joined = keyed.map(_._1)
      .foldLeft(base.join(t, cond, "left")) { (d, n) => d.drop(t(n)) }
      .withColumn(outKey, F.coalesce(F.col(outKey), default(t)))
    if (groupCols.nonEmpty) joined else joined.drop("__pb_g")
  }
}
