package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Relational join helpers beyond the cube surface (SURVEY §2.4 Joins:
  * the reference has no explicit join operators — dimension resolution is
  * the implicit one — but a complete engine exposes them). Thin,
  * Catalyst-native: semi/anti map to Spark's LeftSemi/LeftAnti, which
  * broadcast automatically when the right side is small.
  */
object Joins {
  /** Rows of `left` with at least one match in `right` (SQL EXISTS). */
  def semi(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** Rows of `left` with no match in `right` (SQL NOT EXISTS). */
  def anti(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** Broadcast inner equi-join against a small dimension table. */
  def dim(fact: DataFrame, dimTable: DataFrame, cond: Column,
      joinType: String = "inner"): DataFrame =
    fact.join(F.broadcast(dimTable), cond, joinType)

  /** As-of join: for every left row, the single latest right row with
    * `rightTs <= leftTs` on the same key (pandas merge_asof / DuckDB
    * ASOF JOIN / kdb aj semantics, inner flavor).
    *
    * Implemented as the scalable union+window composition rather than a
    * per-left-row range join: tag both sides, union, and per key take
    * `last(right columns, ignoreNulls)` over rows ordered by (ts, side) —
    * ONE shuffle on the key, no row-multiplying interval join, skew
    * bounded by the hottest key like any window. Ties (equal ts) prefer
    * the right row (inclusive <=), matching DuckDB's `>=` bound.
    *
    * @param valueCols right-side columns to carry (renamed as given)
    * @param joinType  "inner" (drop lefts with no prior right) or "left"
    *                  (keep them with NULL value columns — DuckDB's
    *                  `ASOF LEFT JOIN`)
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      valueCols: Seq[(String, String)],
      joinType: String = "inner",
      direction: String = "backward"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"asOf joinType must be inner or left, got '$joinType'")
    require(direction == "backward" || direction == "forward",
      s"asOf direction must be backward or forward, got '$direction'")
    import org.apache.spark.sql.expressions.Window
    val fwd = direction == "forward"
    val leftCols = left.columns.toSeq
    // the whole right payload rides in ONE struct so the matched row is
    // atomic — per-column last(ignoreNulls) could stitch different right
    // rows together when payload columns contain nulls
    val payload = F.struct(valueCols.map { case (src, dst) => F.col(src).as(dst) }: _*)
    // backward: right tags 0 (sorts BEFORE a same-ts left → inclusive <=)
    // and the match is last(right) over the preceding frame; forward is
    // the mirror — right tags 1 (sorts AFTER a same-ts left → inclusive
    // >=), first(right) over the following frame
    val (rightTag, leftTag) = if (fwd) (1, 0) else (0, 1)
    val taggedRight = right.select(
      keys.map(F.col) :+ F.col(rightTs).as("__ts") :+ F.lit(rightTag).as("__side") :+
        payload.as("__rv"): _*)
    val taggedLeft = left.select(
      (keys.map(F.col) :+ F.col(leftTs).as("__ts") :+ F.lit(leftTag).as("__side")) ++
        leftCols.filterNot(keys.contains).map(F.col): _*)
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val base = Window.partitionBy(keys.map(F.col): _*)
      .orderBy(F.col("__ts").asc, F.col("__side").asc)
    val (w, pick) =
      if (fwd) (base.rowsBetween(Window.currentRow, Window.unboundedFollowing),
        F.first(F.col("__rv"), ignoreNulls = true))
      else (base.rowsBetween(Window.unboundedPreceding, Window.currentRow),
        F.last(F.col("__rv"), ignoreNulls = true))
    val matched = unioned
      .withColumn("__m", pick.over(w))
      .filter(F.col("__side") === leftTag)
    val flavored =
      if (joinType == "inner") matched.filter(F.col("__m").isNotNull)
      else matched // left: unmatched rows keep a NULL payload struct
    flavored
      .select(keys.map(F.col) ++ Seq(F.col("__ts").as(leftTs)) ++
        leftCols.filterNot(c => keys.contains(c) || c == leftTs).map(F.col) ++
        valueCols.map { case (_, dst) => F.col("__m").getField(dst).as(dst) }: _*)
  }

  /** Banded range join: every fact row against every range row whose
    * `[lo, hi)` interval contains the fact's `factValue` — the
    * IP-to-geolocation / value-to-tier lookup shape.
    *
    * The naive formulation (`fact JOIN ranges ON v >= lo AND v < hi`)
    * has no equi-key, so Spark plans a BroadcastNestedLoopJoin —
    * O(|fact|·|ranges|) compares, a non-starter once the ranges side
    * outgrows a broadcast. This operator manufactures the equi-key:
    * quantize the value axis into buckets of `bucketWidth`, explode each
    * range into the buckets it covers, hash-join on the bucket id, and
    * re-check exact containment. A value lands in exactly ONE bucket, so
    * no post-join dedup is needed; each range contributes
    * ~⌈width/bucketWidth⌉+1 rows, so pick `bucketWidth` near the median
    * range width (cost ≈ 2× the ranges row count). Both sides now
    * shuffle (or broadcast) on an equi-key — the plan scales like any
    * hash join, and EngineSpec asserts no nested-loop node survives.
    *
    * @param factValue   point column on `fact`
    * @param loCol/hiCol column NAMES of the interval bounds on `ranges`
    *                    (lo inclusive, hi exclusive)
    */
  def rangeJoinBanded(fact: DataFrame, factValue: Column,
      ranges: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val w = F.lit(bucketWidth)
    // cover floor(hi/w) even though hi is exclusive: the extra bucket
    // only adds candidates the exact re-check below discards
    val banded = ranges.withColumn("__bk",
      F.explode(F.sequence(
        F.floor(F.col(loCol) / w), F.floor(F.col(hiCol) / w))))
    fact.withColumn("__bk", F.floor(factValue / w))
      .join(banded,
        Seq("__bk")) // equi-key first: hash join, never nested-loop
      .filter(factValue >= F.col(loCol) && factValue < F.col(hiCol))
      .drop("__bk")
  }
}
