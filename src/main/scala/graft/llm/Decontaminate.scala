package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Benchmark decontamination for training corpora: flag (and drop)
  * training documents that share word n-grams with an evaluation /
  * benchmark set — the standard n-gram-overlap contamination check run
  * before any LLM training job.
  *
  * Scale shape: each side explodes to (ngram, id) — a map-only scan of
  * the 100 TB training side — then an equi-join on the gram joins the
  * two. The benchmark side (eval sets are MBs, not TBs) is broadcast, so
  * the training corpus NEVER shuffles; per-pair gram counts come from a
  * map-side-combined aggregation whose key space is the contaminated
  * pairs only. No doc×doc comparison anywhere. If the benchmark side
  * ever outgrows broadcast, drop the hint and the same plan becomes a
  * shuffle hash join on the gram key.
  */
object Decontaminate {

  /** (doc_id, bench_id, n_shared): training docs sharing ≥ `minHits`
    * DISTINCT word n-grams with a benchmark doc. Grams are deduplicated
    * per document BEFORE the join, so `n_shared` is exactly
    * |grams(doc) ∩ grams(bench)| — a plain count after the join. */
  def contaminationPairs(
      train: DataFrame, trainId: Column, trainText: Column,
      bench: DataFrame, benchId: Column, benchText: Column,
      n: Int, minHits: Int): DataFrame = {
    val t = train.select(trainId.as("doc_id"),
      F.explode(F.array_distinct(TextAnalysis.wordNgrams(trainText, n))).as("gram"))
    val b = bench.select(benchId.as("bench_id"),
      F.explode(F.array_distinct(TextAnalysis.wordNgrams(benchText, n))).as("gram"))
    t.join(F.broadcast(b), "gram")
      .groupBy(F.col("doc_id"), F.col("bench_id"))
      .agg(F.count(F.lit(1)).as("n_shared"))
      .filter(F.col("n_shared") >= minHits)
  }

  /** The keep-list: training docs with NO contaminating benchmark match
    * (left-anti join against the flagged ids). */
  def decontaminated(
      train: DataFrame, trainId: Column, trainText: Column,
      bench: DataFrame, benchId: Column, benchText: Column,
      n: Int, minHits: Int): DataFrame = {
    val bad = contaminationPairs(train, trainId, trainText,
      bench, benchId, benchText, n, minHits)
      .select(F.col("doc_id").as("__contaminated_id")).distinct()
    train.join(bad, trainId === F.col("__contaminated_id"), "left_anti")
  }
}
