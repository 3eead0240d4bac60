package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Data-mixture construction under token budgets — the "assemble the
  * training mix" step: per stratum (source, lang, domain, …), keep the
  * highest-priority documents until that stratum's token budget is
  * exhausted. Deterministic greedy prefix, so the same corpus and
  * budgets always produce the same mix (re-runs and backfills agree),
  * unlike rand()-weighted sampling.
  *
  * Scale shape: ONE window aggregation — shuffle by stratum, ranked
  * running sum, O(1) state per row, no collect or driver loop. A
  * pathologically large stratum makes a skewed window partition; the
  * 100 TB mitigation is to pre-prune with an approximate priority
  * threshold (e.g. the stratum's quantile sketch at roughly
  * budget/avg_tokens rank) so the exact window only sees candidates
  * near the cut, then apply this operator unchanged.
  */
object Mixture {

  /** One row per input doc: (doc_id, stratum, n_tokens, cum_tokens,
    * kept). `kept` = the doc's INCLUSIVE running token sum within its
    * stratum — ranked by (priority desc, id asc) — fits the budget;
    * the doc that would cross the budget is dropped (no partial docs).
    * `budget` is a Column, so per-stratum budgets are one map literal
    * away. */
  def tokenBudgetSample(
      docs: DataFrame, stratum: Column, id: Column, nTokens: Column,
      priority: Column, budget: Column): DataFrame = {
    val w = Window.partitionBy("stratum")
      .orderBy(F.col("__prio").desc, F.col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(id.as("doc_id"), stratum.as("stratum"),
        nTokens.as("n_tokens"), priority.as("__prio"), budget.as("__budget"))
      .withColumn("cum_tokens", F.sum(F.col("n_tokens")).over(w))
      .withColumn("kept", F.col("cum_tokens") <= F.col("__budget"))
      .drop("__prio", "__budget")
  }

  /** Temperature-scaled mixing weights (the mT5/XLM-R multilingual
    * recipe, arXiv:1910.10683 §3.4.2 family): stratum weight ∝ n_s^α
    * for α ∈ (0, 1] — α = 1 is proportional sampling, α → 0 flattens
    * toward uniform, lifting low-resource strata without letting any
    * stratum's epoch count explode. One tiny aggregation (≤ strata
    * rows); weights and the resulting per-stratum token allocations of
    * `totalBudget` are emitted together so the allocation can feed
    * [[tokenBudgetSample]]'s per-stratum budget Column directly.
    * Rounded to 6dp — deterministic, engine-replayable. */
  def temperatureAllocations(
      docs: DataFrame, stratum: Column, nTokens: Column,
      alpha: Double, totalBudget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(totalBudget > 0, s"totalBudget must be positive, got $totalBudget")
    val per = docs.groupBy(stratum.as("stratum"))
      .agg(F.sum(nTokens.cast("long")).as("n_tokens"))
    val powed = per.withColumn("__p", F.pow(F.col("n_tokens").cast("double"), alpha))
    val z = powed.agg(F.sum("__p").as("__z"))
    powed.crossJoin(z)
      .select(F.col("stratum"), F.col("n_tokens"),
        F.round(F.col("__p") / F.col("__z"), 6).as("weight"),
        F.floor(F.col("__p") / F.col("__z") * totalBudget).cast("long")
          .as("budget_tokens"))
  }

  /** The token-budget mixture as a PLAN-BACKED cube metric
    * ([[graft.model.Metric]] `planBuild` contract): per slice group,
    * the total tokens KEPT by the greedy budget prefix — each group is
    * its own stratum (slice keys become the window partition via one
    * struct column), so "tokens the mix takes from each source under a
    * per-stratum budget" is an ordinary parsed cube query. Same scale
    * shape as the library operator: one window aggregation, shuffle by
    * group.
    *
    * Group contract: a group whose every doc is pred-filtered (or whose
    * first doc already overflows the budget) gets 0, never null. */
  def mixTokensPlan(
      df: DataFrame,
      groupCols: Seq[(String, Column)],
      id: Column, nTokens: Column, priority: Column,
      budget: Long,
      pred: Option[Column],
      outKey: String = "__pb_value"): DataFrame = {
    require(budget > 0, s"mixture budget must be positive, got $budget")
    graft.operators.PlanBacked.groupContract(df, groupCols, pred, outKey) { (vals, keyed) =>
      val sampled = tokenBudgetSample(
        vals, F.struct(keyed.map { case (n, c) => c.as(n) }: _*),
        id, nTokens, priority, F.lit(budget))
      sampled.filter(F.col("kept"))
        .select((keyed.map { case (n, _) =>
          F.col("stratum").getField(n).as(n) } :+ F.col("n_tokens")): _*)
        .groupBy(keyed.map { case (n, _) => F.col(n) }: _*)
        .agg(F.sum(F.col("n_tokens")).cast("long").as(outKey))
    }(_ => F.lit(0L))
  }
}
