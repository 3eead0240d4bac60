package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Time-decayed aggregates (the ClickHouse `exponentialTimeDecayed*`
  * family): every event contributes weight exp(−(T − t)/τ) toward a
  * reference instant T, so "recent activity" is ONE plain aggregation
  * — no window recursion, no per-user state. Decayed sums are
  * mergeable (a sum of exponentials is a sum), so the same expression
  * drops into rollup cells or streaming update-mode aggs unchanged.
  */
object Decay {

  /** exp(−(ref − ts)/τ) as a Column, seconds-based. */
  def weight(tsCol: Column, refTime: String, tauSeconds: Double): Column =
    F.exp(
      -(F.unix_millis(F.lit(refTime).cast("timestamp")) -
        F.unix_millis(tsCol)).cast("double") / (1000.0 * tauSeconds))

  /** Per-key decayed sum / weight mass / decayed average at `refTime`.
    * Events after the reference weigh > 1 — callers pre-filter if the
    * reference is a cutoff. */
  def decayedAggs(events: DataFrame, keyCol: Column, tsCol: Column,
      valueCol: Column, refTime: String, tauSeconds: Double): DataFrame = {
    val w = weight(tsCol, refTime, tauSeconds)
    events.groupBy(keyCol.as("key"))
      .agg(
        F.round(F.sum(valueCol * w), 4).as("decayed_sum"),
        F.round(F.sum(w), 6).as("weight_mass"),
        F.round(F.sum(valueCol * w) / F.sum(w), 6).as("decayed_avg"))
  }
}
