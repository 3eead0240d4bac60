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

  /** FUZZY decontamination — near-match contamination that exact n-gram
    * overlap ([[contaminationPairs]]) passes through: a paraphrased or
    * lightly-edited benchmark document shares few exact n-grams with its
    * training-set copy but keeps a high shingle-Jaccard similarity. This
    * reuses the MinHash band machinery from [[Dedup]] with the benchmark
    * as the small static side: both sides band row-locally
    * ([[Dedup.bandIndex]] — signing never shuffles), the tiny benchmark
    * band index is BROADCAST against the training bands, and only
    * candidate (doc, bench) pairs — contamination is rare by definition —
    * flow into the distinct + exact-Jaccard verify, with the candidate
    * list and benchmark shingles broadcast back. The 100 TB training
    * side is scanned map-only and NEVER shuffles, the same discipline as
    * the exact path.
    *
    * Banding must match the threshold: with rows-per-band r =
    * numHashes/bands, a pair at similarity s is missed by all bands with
    * probability (1−s^r)^bands. The defaults (32 hashes, 32 bands ⇒
    * r=1) give a 2e-10 structural miss at s=0.5 — paraphrase-range
    * recall, where the whole-doc-dedup default (16×2) would miss ~1% at
    * 0.5. The Jaccard VALUE is exact (full shingle sets); banding only
    * bounds recall, and q156's all-cross-pairs oracle pins recall = 1 at
    * fixture scale.
    *
    * Returns (doc_id, bench_id, jaccard ≥ threshold). */
  def fuzzyContaminationPairs(
      train: DataFrame, trainId: Column, trainText: Column,
      bench: DataFrame, benchId: Column, benchText: Column,
      shingleK: Int = 3, numHashes: Int = 32, bands: Int = 32,
      threshold: Double = 0.5, seed: Long = 1234L): DataFrame = {
    val tBands = Dedup.bandIndex(train, trainId, trainText,
        shingleK, numHashes, bands, seed)
      .select(F.col("bk"), F.col("id").as("doc_id"))
    val bBands = Dedup.bandIndex(bench, benchId, benchText,
        shingleK, numHashes, bands, seed)
      .select(F.col("bk"), F.col("id").as("bench_id"))
    val cand = tBands.join(F.broadcast(bBands), "bk")
      .select("doc_id", "bench_id").distinct()
    val tSh = Dedup.shingleDocs(train, trainId, trainText, shingleK)
      .select(F.col("id").as("doc_id"), F.col("sh").as("t_sh"))
    val bSh = Dedup.shingleDocs(bench, benchId, benchText, shingleK)
      .select(F.col("id").as("bench_id"), F.col("sh").as("b_sh"))
    tSh.join(F.broadcast(cand), "doc_id")
      .join(F.broadcast(bSh), "bench_id")
      .withColumn("jaccard",
        F.size(F.array_intersect(F.col("t_sh"), F.col("b_sh"))).cast("double") /
          F.size(F.array_union(F.col("t_sh"), F.col("b_sh"))))
      .filter(F.col("jaccard") >= threshold)
      .select(F.col("doc_id"), F.col("bench_id"),
        F.round(F.col("jaccard"), 6).as("jaccard"))
  }

  /** EMBEDDING-SPACE decontamination — the semantic tier above
    * [[fuzzyContaminationPairs]]: a benchmark document that was
    * TRANSLATED or heavily paraphrased into the training set shares no
    * shingles with its copy (MinHash banding is lexical and misses it)
    * but keeps a high embedding cosine. Flag every (train, bench) pair
    * at cosine ≥ `threshold`.
    *
    * Scale shape = [[graft.llm.Similarity.bruteForceTopK]]'s: the
    * benchmark embedding set (eval suites are thousands of rows, MBs)
    * is BROADCAST against a map-only scan of the training embeddings —
    * the 100 TB train side never shuffles, cost is scan bandwidth ×
    * |bench| codegen'd [[CosineSim]] evaluations per row. Exact by
    * construction (no recall loss — this is the gate where a miss is a
    * benchmark leak); if |bench| ever outgrows the broadcast budget,
    * route bench through [[Similarity.ivfBuildIndex]] and probe
    * train-side cells instead. */
  def embeddingContaminationPairs(
      train: DataFrame, trainId: Column, trainEmb: Column,
      bench: DataFrame, benchId: Column, benchEmb: Column,
      threshold: Double): DataFrame =
    train.select(trainId.as("doc_id"), trainEmb.as("t_emb"))
      .crossJoin(F.broadcast(
        bench.select(benchId.as("bench_id"), benchEmb.as("b_emb"))))
      .withColumn("cosine",
        graft.functions.CosineSim(F.col("t_emb"), F.col("b_emb")))
      .filter(F.col("cosine") >= threshold)
      .select(F.col("doc_id"), F.col("bench_id"),
        F.round(F.col("cosine"), 6).as("cosine"))

  /** The keep-list under the embedding gate: training rows with NO
    * benchmark neighbor at cosine ≥ `threshold` (flagged ids broadcast
    * into one anti-join — train side still never shuffles). */
  def embeddingDecontaminated(
      train: DataFrame, trainId: Column, trainEmb: Column,
      bench: DataFrame, benchId: Column, benchEmb: Column,
      threshold: Double): DataFrame = {
    val bad = embeddingContaminationPairs(train, trainId, trainEmb,
      bench, benchId, benchEmb, threshold)
      .select(F.col("doc_id").as("__contaminated_id")).distinct()
    train.join(F.broadcast(bad),
      trainId === F.col("__contaminated_id"), "left_anti")
  }

  /** Keep-list under BOTH gates: exact n-gram overlap AND fuzzy
    * near-match — the production decontamination a pipeline actually
    * wants (Lee/Brown-style exact grams catch verbatim leakage, the
    * MinHash band pass catches paraphrase). Train side still never
    * shuffles; both flagged-id sets are broadcast into one anti-join. */
  def fuzzyDecontaminated(
      train: DataFrame, trainId: Column, trainText: Column,
      bench: DataFrame, benchId: Column, benchText: Column,
      n: Int = 4, minHits: Int = 1,
      shingleK: Int = 3, threshold: Double = 0.5): DataFrame = {
    val exactBad = contaminationPairs(train, trainId, trainText,
      bench, benchId, benchText, n, minHits).select(F.col("doc_id"))
    val fuzzyBad = fuzzyContaminationPairs(train, trainId, trainText,
      bench, benchId, benchText, shingleK = shingleK, threshold = threshold)
      .select(F.col("doc_id"))
    val bad = exactBad.union(fuzzyBad).distinct()
      .select(F.col("doc_id").as("__contaminated_id"))
    train.join(F.broadcast(bad),
      trainId === F.col("__contaminated_id"), "left_anti")
  }
}
