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

  // ---- mergeable sketch statistics (incremental ANALYZE) ----------

  /** MERGEABLE per-column statistics — the incremental form of
    * [[analyze]]: row/non-null counts (sums), a KMV distinct sketch
    * (lossless bit-identical union — [[graft.functions.KmvSketch]]),
    * and the min/max envelope split by type class so merges compare in
    * NATIVE order: numeric columns carry a double envelope
    * (`min_d`/`max_d` — exact for integers below 2⁵³, i.e. any id or
    * count column), everything else a string envelope (`min_s`/
    * `max_s` — lexicographic, which IS native order for strings and
    * for ISO-stringified dates/timestamps). Stringified min/max of a
    * LONG would merge in the wrong order ("10" < "9"); the type split
    * is what makes the merge exact. One aggregation pass however many
    * columns (the [[analyze]] shape); null inputs never reach the
    * sketch (the hash is null-guarded — xxhash64(NULL) would
    * contribute a phantom distinct).
    *
    * The contract that makes this the 100 TB maintenance path:
    * `mergeSketchStats(batches.map(analyzeSketch(_)))` EQUALS
    * `analyzeSketch(union of batches)` — bit-identical, sketch
    * included — so per-partition/per-day stats roll up to any range
    * without ever rescanning data (CurateSpec asserts equality, q197
    * hash-verifies the merged result against SQL ground truth). */
  def analyzeSketch(df: DataFrame, cols: Seq[String], k: Int = 1024): DataFrame = {
    require(cols.nonEmpty, "analyzeSketch needs at least one column")
    val kmv = graft.functions.KmvSketch(k)
    val isNum: String => Boolean = c => df.schema(c).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val aggs = cols.flatMap { c =>
      val col = F.col(c)
      Seq(
        F.count(col).as(s"__${c}_n"),
        kmv(F.when(col.isNotNull, F.xxhash64(col))).as(s"__${c}_kmv"),
        (if (isNum(c)) F.min(col).cast("double")
         else F.lit(null).cast("double")).as(s"__${c}_mind"),
        (if (isNum(c)) F.max(col).cast("double")
         else F.lit(null).cast("double")).as(s"__${c}_maxd"),
        (if (isNum(c)) F.lit(null).cast("string")
         else F.min(col).cast("string")).as(s"__${c}_mins"),
        (if (isNum(c)) F.lit(null).cast("string")
         else F.max(col).cast("string")).as(s"__${c}_maxs"))
    }
    val row = df.agg(F.count(F.lit(1)).as("__rows"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__${c}_n`, `__${c}_kmv`, `__${c}_mind`, `__${c}_maxd`, " +
        s"`__${c}_mins`, `__${c}_maxs`"
    }.mkString(", ")
    row.select(F.col("__rows"), F.expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column, n_non_null, kmv, min_d, max_d, min_s, max_s)"))
      .select(F.col("column"), F.col("__rows").as("n_rows"),
        (F.col("__rows") - F.col("n_non_null")).as("n_nulls"),
        F.col("kmv"), F.col("min_d"), F.col("max_d"),
        F.col("min_s"), F.col("max_s"))
  }

  /** Merge [[analyzeSketch]] frames (per batch, per partition, per
    * day) into the combined statistics WITHOUT touching data: counts
    * sum, envelopes take min/max in their native order, sketches union
    * losslessly. Associative and commutative, so any rollup tree
    * works. `k` must match the frames'. */
  def mergeSketchStats(frames: Seq[DataFrame], k: Int = 1024): DataFrame = {
    require(frames.nonEmpty, "mergeSketchStats needs at least one frame")
    frames.reduce(_.unionByName(_))
      .groupBy("column")
      .agg(
        F.sum("n_rows").as("n_rows"),
        F.sum("n_nulls").as("n_nulls"),
        graft.functions.KmvSketch.unionAgg(k)(F.col("kmv")).as("kmv"),
        F.min("min_d").as("min_d"), F.max("max_d").as("max_d"),
        F.min("min_s").as("min_s"), F.max("max_s").as("max_s"))
  }

  /** Distinct-count estimate of one column from a sketch-stats frame
    * (exact below sketch saturation — [[graft.functions.KmvSketch]]). */
  def ndvEstimate(stats: DataFrame, column: String, k: Int = 1024): Double =
    stats.filter(F.col("column") === column)
      .select(graft.functions.KmvSketch.estimateDistinct(F.col("kmv"), k))
      .first().getDouble(0)

  /** View a sketch-stats frame through the [[analyze]] column contract
    * (`n_rows`/`ndv_approx`), so every planning consumer below —
    * [[costedSource]], [[bloomJoinWorthwhile]] — reads incremental
    * statistics unchanged. `ndv` is the rounded estimate: the
    * consumers only ever compare NDVs against row-count ratios, where
    * the KMV ~3% error is noise (same argument as the HLL note on
    * [[ndv]]). */
  def sketchStatsAsAnalyze(stats: DataFrame, k: Int = 1024): DataFrame =
    stats.select(F.col("column"), F.col("n_rows"), F.col("n_nulls"),
      F.round(graft.functions.KmvSketch.estimateDistinct(F.col("kmv"), k))
        .cast("long").as("ndv"),
      F.round(graft.functions.KmvSketch.estimateDistinct(F.col("kmv"), k))
        .cast("long").as("ndv_approx"),
      F.coalesce(F.col("min_s"), F.col("min_d").cast("string")).as("min_s"),
      F.coalesce(F.col("max_s"), F.col("max_d").cast("string")).as("max_s"))

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
