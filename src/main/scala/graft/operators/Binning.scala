package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Quantile binning — equal-probability bucketing by the EXACT
  * percentile boundaries of a column (histogram equalization): the
  * stratification primitive behind curriculum phases ("shortest
  * quartile first"), length-balanced eval slices, and skew diagnosis,
  * where fixed-width buckets ([[graft.functions]] width_bucket paths)
  * put 90% of a long-tailed column in bin 1.
  *
  * Two passes by construction: boundaries are ONE exact-percentile
  * aggregation (Spark's `percentile` — a single reduced row of n−1 cut
  * points), then assignment is a row-local fold over that tiny
  * boundary array (crossJoined 1-row literal — no shuffle, no UDF).
  * Both Spark and DuckDB define interpolated percentiles as
  * a + frac·(b−a) over the sorted values, so the boundaries — and
  * therefore every assignment — replay exactly.
  */
object Binning {

  /** (n−1)-element ascending boundary array for `n` equal-probability
    * bins, as a 1-row frame (`__bnd`). `valueCol` is a column NAME
    * (it rides inside the exact-percentile SQL expression). */
  def quantileBoundaries(df: DataFrame, valueCol: String, n: Int): DataFrame = {
    require(n >= 2, s"need at least 2 bins, got $n")
    val ps = (1 until n).map(i => i.toDouble / n)
    df.agg(F.expr(
      s"percentile(`$valueCol`, array(${ps.mkString(", ")}))")
      .as("__bnd"))
  }

  /** Input plus `bin` in [1, n]: 1 + #boundaries at or below the
    * value (values exactly on a cut point go to the HIGHER bin — the
    * convention both engines replay). */
  def withQuantileBin(df: DataFrame, valueCol: String, n: Int): DataFrame =
    df.crossJoin(F.broadcast(quantileBoundaries(df, valueCol, n)))
      .withColumn("bin",
        F.aggregate(F.col("__bnd"), F.lit(1),
          (acc, b) => acc + F.when(F.col(valueCol) >= b, 1).otherwise(0)))
      .drop("__bnd")

  /** PER-STRATUM boundaries: one (stratum, boundary-array) row per
    * group — curriculum phases and length-balanced slices computed
    * per language / per source instead of globally (a global cut on a
    * mixed corpus puts one stratum's entire mass in one bin). Still a
    * single grouped exact-percentile aggregation; the result is
    * #strata rows, broadcastable by construction. */
  def stratumQuantileBoundaries(df: DataFrame, stratumCol: String,
      valueCol: String, n: Int): DataFrame = {
    require(n >= 2, s"need at least 2 bins, got $n")
    val ps = (1 until n).map(i => i.toDouble / n)
    df.groupBy(F.col(stratumCol))
      .agg(F.expr(
        s"percentile(`$valueCol`, array(${ps.mkString(", ")}))")
        .as("__bnd"))
  }

  /** Input plus `bin` in [1, n] against the row's OWN stratum's
    * boundaries — the grouped form of [[withQuantileBin]] (same
    * higher-bin-on-tie convention). The boundary frame joins back by
    * stratum as a broadcast (#strata rows); the corpus itself never
    * shuffles. Degenerate strata behave by the convention alone: a
    * stratum whose values are all equal puts every row in bin n
    * (every boundary equals the value, ties go high) — deterministic
    * and replayed by the oracle, never an error. */
  def withStratumQuantileBin(df: DataFrame, stratumCol: String,
      valueCol: String, n: Int): DataFrame = {
    // NULL-SAFE stratum match: groupBy makes NULL its own stratum with
    // its own boundaries, and the join must honor that — a plain
    // equi-join never matches NULL keys and would silently DROP every
    // null-stratum row (the global withQuantileBin keeps them)
    val b = stratumQuantileBoundaries(df, stratumCol, valueCol, n)
      .withColumnRenamed(stratumCol, "__stratum")
    df.join(F.broadcast(b), F.col(stratumCol) <=> F.col("__stratum"))
      .drop("__stratum")
      .withColumn("bin",
        F.aggregate(F.col("__bnd"), F.lit(1),
          (acc, bd) => acc + F.when(F.col(valueCol) >= bd, 1).otherwise(0)))
      .drop("__bnd")
  }
}
