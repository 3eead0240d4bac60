package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Data selection via importance resampling (DSIR — Xie et al. 2023,
  * arXiv:2302.03169): choose raw-corpus documents whose hashed-n-gram
  * distribution looks like a small high-quality TARGET corpus, by
  * importance weights between two bag-of-hashed-n-grams models.
  *
  * Pipeline shape (all declarative, one plan):
  *   1. FEATURIZE  — unigrams + bigrams, hashed into `buckets` ids.
  *      Row-local explode + the engine-independent md5 bucket
  *      ([[Splits.hashBucket]]), then a per-doc count aggregation.
  *   2. FIT        — each side's bucket distribution with add-α
  *      smoothing: logp_b = ln((c_b + α) / (N + α·B)). However large
  *      the corpus, a model is ≤ B rows — broadcastable by design.
  *   3. WEIGH      — per doc, log w = Σ_b c_b · (logp_target −
  *      logp_raw): explode-join the B-row model, one groupBy(id).
  *   4. RESAMPLE   — Gumbel top-k: key = log w + g(id) with
  *      g = −ln(−ln(u)) and u = [[Splits.hashUniform]], so the k
  *      largest keys are a without-replacement sample ∝ softmax(log w)
  *      (the Gumbel-max theorem), yet a pure function of row identity:
  *      reproducible across engines/runs/partitionings and replayable
  *      in SQL (q158's oracle re-derives every formula above).
  *
  * 100 TB posture: the raw side is scanned map-only for features; its
  * model is derived FROM the per-doc feature frame (one explode in the
  * plan, reused), so scoring adds one groupBy(id) shuffle whose payload
  * is (id, bucket, cnt) — never text. The target side (quality corpora
  * are GBs, not TBs) fits in one aggregation. Both models join as
  * broadcasts. Selection is TakeOrdered (distributed partial top-k),
  * never a single-partition sort.
  */
object Importance {

  /** Per-doc hashed n-gram counts: (id, bucket, cnt). Unigrams plus
    * bigrams (the paper's featurization), bucketed by the
    * engine-independent md5 hash so any engine recomputes the same
    * features. Row-local until the final per-doc count. */
  def hashedFeatures(df: DataFrame, idCol: Column, textCol: Column,
      buckets: Int = 4096): DataFrame = {
    val grams = F.concat(TextAnalysis.tokens(textCol),
      TextAnalysis.wordNgrams(textCol, 2))
    df.select(idCol.as("id"), F.explode(grams).as("gram"))
      .select(F.col("id"), Splits.hashBucket(F.col("gram"), buckets).as("bucket"))
      .groupBy("id", "bucket").agg(F.count(F.lit(1)).as("cnt"))
  }

  /** Smoothed bucket log-probabilities from an exploded feature frame
    * ((…, bucket, cnt)): every bucket in [0, B) present, absent ones at
    * the α floor. The total flows in as a broadcast 1-row aggregate so
    * the model stays a single declarative plan (no driver collect). */
  private def modelFromCounts(spark: org.apache.spark.sql.SparkSession,
      counts: DataFrame, buckets: Int, alpha: Double): DataFrame = {
    val perBucket = counts.groupBy("bucket").agg(F.sum("cnt").as("c"))
    val total = perBucket.agg(F.sum("c").as("n"))
    spark.range(buckets).select(F.col("id").cast("long").as("bucket"))
      .join(perBucket, Seq("bucket"), "left")
      .crossJoin(F.broadcast(total))
      .select(F.col("bucket"),
        F.log((F.coalesce(F.col("c"), F.lit(0L)) + F.lit(alpha)) /
          (F.coalesce(F.col("n"), F.lit(0L)) + F.lit(alpha * buckets))).as("logp"))
  }

  /** Bag-of-hashed-n-grams model of a corpus: (bucket, logp), ≤ B rows. */
  def fitHashedLM(df: DataFrame, textCol: Column,
      buckets: Int = 4096, alpha: Double = 1.0): DataFrame =
    modelFromCounts(df.sparkSession,
      hashedFeatures(df, F.monotonically_increasing_id(), textCol, buckets),
      buckets, alpha)

  /** Raw docs with their DSIR log importance weight:
    * input columns + `log_w` = Σ_b c_b(doc) · (logp_target(b) −
    * logp_raw(b)). Docs whose text yields no grams keep log_w = 0. */
  def importanceWeights(
      raw: DataFrame, idCol: Column, textCol: Column,
      target: DataFrame, targetTextCol: Column,
      buckets: Int = 4096, alpha: Double = 1.0): DataFrame = {
    val feats = hashedFeatures(raw, idCol, textCol, buckets)
    val rawModel = modelFromCounts(raw.sparkSession, feats, buckets, alpha)
      .withColumnRenamed("logp", "logp_raw")
    val tgtModel = fitHashedLM(target, targetTextCol, buckets, alpha)
      .withColumnRenamed("logp", "logp_tgt")
    val dlog = tgtModel.join(rawModel, "bucket")
      .select(F.col("bucket"), (F.col("logp_tgt") - F.col("logp_raw")).as("dlog"))
    val scores = feats.join(F.broadcast(dlog), "bucket")
      .groupBy("id")
      .agg(F.sum(F.col("cnt") * F.col("dlog")).as("log_w"))
      .withColumnRenamed("id", "__imp_id")
    raw.join(scores, idCol === F.col("__imp_id"), "left")
      .drop("__imp_id")
      .withColumn("log_w", F.coalesce(F.col("log_w"), F.lit(0.0)))
  }

  /** Plan-backed cube metric face (the avgLogprob pattern): per group,
    * the mean DSIR log importance weight of its documents, with the
    * TARGET side = the `targetPred` subset of the same pred-filtered
    * corpus (e.g. the deterministic validation split) and the RAW model
    * trained on the whole filtered corpus. Curation dashboards slice
    * this by source/lang to see which shards look most (or least) like
    * the distribution they actually want to train toward. Pure
    * DataFrame lineage — both models re-derive from the live table per
    * execution, nothing is baked as a literal, so the metric is
    * cacheable without snapshot semantics. Groups emptied by `pred`
    * yield NULL. */
  def avgWeightPlan(
      df: DataFrame, groupCols: Seq[(String, Column)],
      id: Column, text: Column, targetPred: Column,
      pred: Option[Column],
      buckets: Int = 4096, alpha: Double = 1.0,
      outKey: String = "__pb_value"): DataFrame =
    graft.operators.PlanBacked.groupContract(df, groupCols, pred, outKey) {
      (vals, keyed) =>
        importanceWeights(vals, id, text, vals.filter(targetPred), text,
            buckets, alpha)
          .select((keyed.map { case (n, c) => c.as(n) } :+
            F.col("log_w")): _*)
          .groupBy(keyed.map { case (n, _) => F.col(n) }: _*)
          .agg(F.round(F.avg(F.col("log_w")), 6).as(outKey))
    }(_ => F.lit(null).cast("double"))

  /** DSIR selection: the k docs with the largest `log_w + gumbel(id)`
    * keys — a deterministic without-replacement sample ∝ softmax(log_w).
    * Returns the input columns plus `log_w` and `dsir_key`. */
  def dsirSample(
      raw: DataFrame, idCol: Column, textCol: Column,
      target: DataFrame, targetTextCol: Column, k: Int,
      buckets: Int = 4096, alpha: Double = 1.0): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val weighted = importanceWeights(raw, idCol, textCol,
      target, targetTextCol, buckets, alpha)
    val gumbel = -F.log(-F.log(Splits.hashUniform(idCol)))
    weighted.withColumn("dsir_key", F.col("log_w") + gumbel)
      .orderBy(F.col("dsir_key").desc, idCol.asc)
      .limit(k)
  }
}
