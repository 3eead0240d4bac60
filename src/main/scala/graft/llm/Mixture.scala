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
}
