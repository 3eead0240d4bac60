package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Audience-overlap estimation via HLL inclusion–exclusion:
  * |A∩B| ≈ est(A) + est(B) − est(A∪B), with every term a MERGEABLE
  * Datasketches HLL aggregate — the sketch family ClickHouse serves the
  * same ask with (uniqCombined over conditional sets).
  *
  * Why not sketch the intersection directly: HLL cannot — it stores
  * hashed register maxima, which union losslessly but carry no
  * membership. Inclusion–exclusion over three sketches is the standard
  * composition; its absolute error is bounded by the sum of the three
  * term errors (each ~1% relative at lgK=14), so the ESTIMAND for the
  * bound is |A|+|B|+|A∪B|, not the (possibly tiny) intersection — a
  * 1%-of-union absolute band around a small overlap is the documented
  * trade-off, and exactly what the q148 invariant asserts.
  *
  * Scale shape: one hash aggregation (three conditional sketch buffers
  * per group, map-side combined); the rollup face stores the three
  * sketches per cell so ANY day range serves by lossless `hll_union_agg`
  * without touching the fact table — same
  * AggregatingMergeTree discipline as the distinct/quantile rollups
  * (SURVEY "mergeable distinct rollup").
  */
object Overlap {

  private def sk(cond: Column, key: Column, lgK: Int): Column =
    F.hll_sketch_agg(F.when(cond, key), lgK)

  /** Single-shot overlap estimate per group: (groups..., est_a, est_b,
    * est_intersect). `est_intersect` can be slightly negative on
    * near-disjoint sets (subtractive noise) — clamped at 0. */
  def overlapEstimate(df: DataFrame, groupCols: Seq[(String, Column)],
      key: Column, condA: Column, condB: Column, lgK: Int = 14): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) df.groupBy()
      else df.groupBy(groupCols.map { case (n, c) => c.as(n) }: _*)
    grouped
      .agg(sk(condA, key, lgK).as("__sa"), sk(condB, key, lgK).as("__sb"),
        sk(condA || condB, key, lgK).as("__sab"))
      .select(groupCols.map { case (n, _) => F.col(n) } ++ Seq(
        F.hll_sketch_estimate(F.col("__sa")).as("est_a"),
        F.hll_sketch_estimate(F.col("__sb")).as("est_b"),
        F.greatest(F.lit(0.0),
          F.hll_sketch_estimate(F.col("__sa")) +
            F.hll_sketch_estimate(F.col("__sb")) -
            F.hll_sketch_estimate(F.col("__sab"))).as("est_intersect")): _*)
  }

  /** The rollup face: per-cell (cellKeys..., sk_a, sk_b, sk_ab) sketch
    * columns, storable alongside the other daily rollup cells. */
  def overlapCells(df: DataFrame, cellKeys: Seq[(String, Column)],
      key: Column, condA: Column, condB: Column, lgK: Int = 14): DataFrame =
    df.groupBy(cellKeys.map { case (n, c) => c.as(n) }: _*)
      .agg(sk(condA, key, lgK).as("sk_a"), sk(condB, key, lgK).as("sk_b"),
        sk(condA || condB, key, lgK).as("sk_ab"))

  /** [[overlapEstimate]] as a PLAN-BACKED cube metric
    * ([[graft.model.Metric]] `planBuild` contract): per slice group, the
    * estimated |A∩B| of `key` values. One hash aggregation per group
    * set, map-side combined. Group contract: every group present in
    * `df` gets a row — a group emptied by `pred` gets 0.0, never null. */
  def overlapPlan(
      df: DataFrame,
      groupCols: Seq[(String, Column)],
      key: Column, condA: Column, condB: Column,
      pred: Option[Column],
      outKey: String = "__pb_value",
      lgK: Int = 14): DataFrame =
    PlanBacked.groupContract(df, groupCols, pred, outKey) { (vals, keyed) =>
      overlapEstimate(vals, keyed, key, condA, condB, lgK)
        .withColumnRenamed("est_intersect", outKey)
        .drop("est_a", "est_b")
    }(_ => F.lit(0.0))

  /** Serve an overlap estimate from [[overlapCells]] over any cell
    * subset (e.g. a day range): lossless HLL union per term, then the
    * same inclusion–exclusion. One row: (est_a, est_b, est_intersect).
    * Sketch union at equal lgK is LOSSLESS, so this is BIT-IDENTICAL to
    * the single-shot estimate over the same rows (PropertySpec pins
    * it). */
  def overlapFromCells(cells: DataFrame): DataFrame =
    cells
      .agg(F.hll_union_agg(F.col("sk_a")).as("__ua"),
        F.hll_union_agg(F.col("sk_b")).as("__ub"),
        F.hll_union_agg(F.col("sk_ab")).as("__uab"))
      .select(
        F.hll_sketch_estimate(F.col("__ua")).as("est_a"),
        F.hll_sketch_estimate(F.col("__ub")).as("est_b"),
        F.greatest(F.lit(0.0),
          F.hll_sketch_estimate(F.col("__ua")) +
            F.hll_sketch_estimate(F.col("__ub")) -
            F.hll_sketch_estimate(F.col("__uab"))).as("est_intersect"))
}
