package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** ClickHouse `ORDER BY … WITH FILL` (ref: the ClickHouse dialect behind
  * activecube's production use): densify an ordered date/numeric key so
  * every step in [min, max] appears, default-filling the metric columns
  * of absent rows — the standard "no data ≠ no row" fix for time-series
  * readouts.
  *
  * ClickHouse bound semantics, matched exactly: FROM is inclusive, TO is
  * EXCLUSIVE (`WITH FILL FROM x TO y` manufactures [x, y)), and real
  * input rows falling OUTSIDE the pinned window are preserved, not
  * dropped — pinning narrows where rows are manufactured, never which
  * input rows appear.
  *
  * Scale shape: the per-group bounds are ONE map-side-combined min/max
  * aggregation (rows ∝ groups); the spine is `sequence(lo, hi, step)`
  * exploded FROM those group rows — generated distributed, no driver
  * loop, linear in emitted rows; real rows come back via a full-outer
  * join on (group, key). Nothing in the plan holds a full series in one
  * place.
  */
object Fill {

  /** Densify `df` on `key` with `step` (e.g. `expr("interval 1 day")`
    * for dates, `lit(1)` for ints). `groupCols` get an independent
    * spine per group (their own min..max). `fills` maps metric column →
    * default for manufactured rows; columns not listed stay null.
    * `from`/`to` pin the spine bounds (ClickHouse WITH FILL FROM/TO —
    * a dashboard's fixed axis) instead of the observed min/max; `from`
    * is inclusive, `to` exclusive; with both pinned the spine exists
    * even over empty input. An inverted window (`from` past the data's
    * max, or from > to) yields an empty spine — never a runtime error —
    * and the input rows pass through untouched.
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
    val spine0 = bounds
      // empty unpinned input -> empty spine; inverted pinned window ->
      // empty spine (sequence() throws on lo > hi with a positive step).
      // greatest(lo, hi) keeps the sequence arguments legal even when
      // Catalyst constant-folds literal pinned bounds at optimize time —
      // the row filter already removes inverted windows at runtime.
      .where(lo.isNotNull && hi.isNotNull && lo <= hi)
      .select(g :+ F.explode(F.sequence(lo, F.greatest(lo, hi), step)).as(key): _*)
    // sequence() is inclusive of hi; ClickHouse TO is exclusive — trim
    // the pinned upper bound off the manufactured keys
    val spine = to.fold(spine0)(t => spine0.where(F.col(key) < t))
    // full outer: spine keys absent from df are manufactured; real input
    // rows outside the pinned window survive on the df side
    val joined = spine.join(df, groupCols :+ key, "full_outer")
    val filled = fills.foldLeft(joined) { case (d, (c, dflt)) =>
      d.withColumn(c, F.coalesce(F.col(c), dflt))
    }
    // the using-column join fronts (each..., key); restore the input's
    // declared column order
    filled.select(df.columns.map(F.col).toSeq: _*)
  }
}
