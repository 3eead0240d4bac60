package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** ANALYZE-style table statistics — the warehouse maintenance pass
  * that feeds cost-based planning and data-skipping audits: per
  * column, row/null counts, exact and approximate distinct counts,
  * and the min/max envelope, in ONE aggregation pass over the table
  * (every column's stats are parallel aggregate expressions in the
  * same partial+final hash agg — the table is scanned once however
  * many columns are analyzed). Values are stringified so one frame
  * carries mixed column types.
  */
object Stats {

  def analyze(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "analyze needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        F.count(F.col(c)).as(s"__${c}_n"),
        F.count_distinct(F.col(c)).as(s"__${c}_ndv"),
        F.approx_count_distinct(F.col(c)).as(s"__${c}_andv"),
        F.min(F.col(c)).cast("string").as(s"__${c}_min"),
        F.max(F.col(c)).cast("string").as(s"__${c}_max"))
    }
    val total = F.count(F.lit(1)).as("__rows")
    val row = df.agg(total, aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__${c}_n`, `__${c}_ndv`, `__${c}_andv`, `__${c}_min`, `__${c}_max`"
    }.mkString(", ")
    row.select(F.col("__rows"), F.expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column, n_non_null, ndv, ndv_approx, min_s, max_s)"))
      .select(F.col("column"),
        F.col("__rows").as("n_rows"),
        (F.col("__rows") - F.col("n_non_null")).as("n_nulls"),
        F.col("ndv"), F.col("ndv_approx"),
        F.col("min_s"), F.col("max_s"))
  }

  // ---- planning consumers of analyze ------------------------------
  // In production the analyze frame is materialized once per table per
  // maintenance cycle; the reads below are 1-row / #cols-row METADATA
  // collects of that tiny frame, never data-plane scans.

  /** Measured table cardinality from an [[analyze]] frame. */
  def rowCount(stats: DataFrame): Long =
    stats.agg(F.max(F.col("n_rows"))).first().getLong(0)

  /** Measured distinct count of one analyzed column. At fixture scale
    * the exact NDV and the HLL estimate agree; planning reads the
    * exact column for determinism — at 100 TB a caller that analyzed
    * with approx-only stats would read `ndv_approx`, and every
    * consumer here only ever compares NDVs against row-count RATIOS,
    * where the HLL's ~2% error is noise. */
  def ndv(stats: DataFrame, column: String): Long =
    stats.filter(F.col("column") === column)
      .agg(F.max(F.col("ndv"))).first().getLong(0)

  /** Re-cost a [[graft.model.CubeSource]] from MEASURED statistics:
    * the chooser's static `cost` is declaration-time folklore ("the
    * rollup is smaller"), which drifts as tables accrete — ANALYZE
    * rows are ground truth. The chooser itself is untouched (it still
    * sorts by `cost`); re-costing is an explicit maintenance step, so
    * existing registrations keep their pinned routing. */
  def costedSource(src: graft.model.CubeSource, stats: DataFrame): graft.model.CubeSource =
    src.copy(cost = rowCount(stats))

  /** Is a runtime bloom-filter join worth injecting, by the measured
    * stats? Worth it iff the probe side is at least `factor`× the
    * creation side's distinct-key count — then the filter rejects most
    * probe rows and the build cost amortizes. (Spark's own gate is a
    * creation-side SIZE threshold; size says cheap-to-build, only
    * measured NDV-vs-probe-rows says worth-building.) */
  def bloomJoinWorthwhile(creationStats: DataFrame, creationKey: String,
      probeStats: DataFrame, factor: Long = 4): Boolean = {
    val keyNdv = ndv(creationStats, creationKey)
    keyNdv > 0 && rowCount(probeStats) >= factor * keyNdv
  }

  /** Apply [[bloomJoinWorthwhile]] to the session: when the stats say
    * the filter pays for itself, drop the application-side scan-size
    * gate (it is sized for multi-GB cluster scans and would never fire
    * at smaller scales where the stats STILL say the join benefits);
    * when they say it does not, restore the default so the join skips
    * the build. Returns the decision. Session-scoped and reversible —
    * the injection itself remains Catalyst's InjectRuntimeFilter rule;
    * this only tunes its gate from measured evidence. */
  def applyBloomJoinAdvice(spark: SparkSession,
      creationStats: DataFrame, creationKey: String,
      probeStats: DataFrame, factor: Long = 4): Boolean = {
    val gate =
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val worth = bloomJoinWorthwhile(creationStats, creationKey, probeStats, factor)
    if (worth) spark.conf.set(gate, "0") else spark.conf.unset(gate)
    worth
  }
}
