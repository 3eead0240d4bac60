package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** ClickHouse `ORDER BY … WITH FILL` (ref: the ClickHouse dialect behind
  * activecube's production use): densify an ordered date/numeric key so
  * every step in [min, max] appears, default-filling the metric columns
  * of absent rows — the standard "no data ≠ no row" fix for time-series
  * readouts.
  *
  * Scale shape: the per-group bounds are ONE map-side-combined min/max
  * aggregation (rows ∝ groups); the spine is `sequence(lo, hi, step)`
  * exploded FROM those group rows — generated distributed, no driver
  * loop, linear in emitted rows; real rows come back via a left join on
  * (group, key). Nothing in the plan holds a full series in one place.
  */
object Fill {

  /** Densify `df` on `key` with `step` (e.g. `expr("interval 1 day")`
    * for dates, `lit(1)` for ints). `groupCols` get an independent
    * spine per group (their own min..max). `fills` maps metric column →
    * default for manufactured rows; columns not listed stay null.
    * `from`/`to` pin the spine bounds (ClickHouse WITH FILL FROM/TO —
    * a dashboard's fixed axis) instead of the observed min/max; with
    * both pinned the spine exists even over empty input.
    */
  def fillSeries(
      df: DataFrame, key: String, groupCols: Seq[String],
      step: Column, fills: Map[String, Column],
      from: Option[Column] = None, to: Option[Column] = None): DataFrame = {
    val g = groupCols.map(F.col)
    val bounds =
      if (groupCols.nonEmpty)
        df.groupBy(g: _*).agg(F.min(key).as("__lo"), F.max(key).as("__hi"))
      else df.agg(F.min(key).as("__lo"), F.max(key).as("__hi"))
    val lo = from.getOrElse(F.col("__lo"))
    val hi = to.getOrElse(F.col("__hi"))
    val spine = bounds
      .where(lo.isNotNull && hi.isNotNull) // empty unpinned input -> empty spine
      .select(g :+ F.explode(F.sequence(lo, hi, step)).as(key): _*)
    val joined = spine.join(df, groupCols :+ key, "left")
    val filled = fills.foldLeft(joined) { case (d, (c, dflt)) =>
      d.withColumn(c, F.coalesce(F.col(c), dflt))
    }
    // the using-column join fronts (each..., key); restore the input's
    // declared column order
    filled.select(df.columns.map(F.col).toSeq: _*)
  }
}
