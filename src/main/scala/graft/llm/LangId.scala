package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** TRAINED language identification — one-vs-rest logistic regression
  * over hashed n-gram features (the fastText lang-id recipe, Joulin et
  * al. 2016, arXiv:1607.01759, reduced to the engine's own
  * SQL-replayable trainer): one [[Classifier.trainLogReg]] per
  * language, prediction by argmax over the per-language scores. This
  * upgrades [[TextAnalysis.langId]]'s stopword-argmax heuristic to a
  * supervised multiclass model while staying a pure function of the
  * corpus — every weight lands on the 1e-9 grid, so the whole
  * pipeline (train + predict) replays exactly in DuckDB (q203).
  *
  * Scale shape: training reuses the classifier's two-aggregation GD
  * rounds (driver holds L·(B+1) doubles, never a row); prediction is
  * ONE aggregation over the feature frame — the per-language scores
  * are parallel SUM aggregates in a single groupBy(id), not L joins —
  * followed by a row-local argmax fold.
  *
  * Decision rule — PRIOR-CORRECTED argmax: languages are compared on
  * the feature score z_L alone, WITHOUT the trained bias. The bias of
  * a one-vs-rest model converges to (roughly) the class prior's logit,
  * and with mean-normalized features (x sums to 1 per doc) the
  * achievable z is small — scoring z+bias would let the majority
  * class's prior swamp every real signal and predict one language for
  * the whole corpus. Dropping the bias is the standard class-balanced
  * correction for imbalanced OvR; per-class calibrated probabilities
  * remain available via [[Classifier.scoreText]] when needed.
  *
  * EXACT cross-engine argmax: a float dot-product's value depends on
  * summation order, and an argmax between two near-equal scores would
  * flake between engines (the q189 lesson). Instead the comparison
  * runs in integer micro-units: with weights on the 1e-9 grid,
  * tot·z_L·1e9 = Σ cnt_b·round(w_b·1e9) is an exact LONG (tot > 0 is
  * constant across languages per doc, so the argmax is unchanged),
  * identical in any engine and partitioning. Ties break by language
  * ascending; docs with no tokens score 0 for every language and take
  * the same tiebreak.
  */
object LangId {

  /** One model per language, language-ascending (the prediction
    * tiebreak order). `langCol` supplies the supervision.
    *
    * Trains all L models in ONE fused GD loop: per iteration, a single
    * groupBy(id) computes every model's score (L parallel sum
    * aggregates), a single groupBy(bucket) computes every model's
    * gradient, and one L-column aggregate the bias gradients — 2 jobs
    * per iteration instead of 2·L, which is what keeps the wall-clock
    * flat as languages are added (measured ~5× on q203). The per-model
    * ARITHMETIC is exactly [[Classifier.trainLogReg]]'s — same
    * residuals, same gradients, same 1e-9 grid snap each step — so
    * the fused weights equal the one-at-a-time weights (the grid
    * absorbs float-sum order, the established cross-engine argument;
    * CurateSpec pins the equality) and q203's per-model DuckDB replay
    * is unchanged. */
  def train(docs: DataFrame, idCol: Column, textCol: Column,
      langCol: Column, langs: Seq[String], buckets: Int = 64,
      iters: Int = 5, lr: Double = 0.5): Seq[(String, Classifier.LinearModel)] = {
    require(langs.nonEmpty && buckets >= 1 && iters >= 1,
      "need langs, buckets >= 1 and iters >= 1")
    val ls = langs.sorted
    val feats = Importance.hashedFeatures(docs, idCol, textCol, buckets)
    val tot = feats.groupBy("id").agg(F.sum("cnt").as("__tot"))
    val data = feats.join(tot, "id")
      .select(F.col("id"), F.col("bucket"),
        (F.col("cnt").cast("double") / F.col("__tot")).as("x"))
      .join(docs.select(idCol.as("id"), langCol.as("__lang")), "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = data.select("id").distinct().count().toDouble
    val L = ls.length
    val bias = Array.fill(L)(0.0)
    val w = Array.fill(L)(Array.fill(buckets)(0.0))
    for (_ <- 1 to iters) {
      val zAggs = ls.indices.map { i =>
        val wLit = F.array(w(i).map(F.lit): _*)
        F.sum(F.col("x") *
          F.element_at(wLit, F.col("bucket").cast("int") + 1)).as(s"__z$i")
      }
      val scored = data.groupBy("id")
        .agg(F.first("__lang").as("__lang"), zAggs: _*)
      val resid = scored.select(F.col("id") +: ls.indices.map { i =>
        (F.lit(1.0) / (F.lit(1.0) +
          F.exp(-(F.col(s"__z$i") + F.lit(bias(i))))) -
          F.when(F.col("__lang") === ls(i), 1.0).otherwise(0.0)).as(s"__r$i")
      }: _*)
      val gAggs = ls.indices.map(i =>
        F.sum(F.col("x") * F.col(s"__r$i")).as(s"__g$i"))
      val grads = data.join(resid, "id").groupBy("bucket")
        .agg(gAggs.head, gAggs.tail: _*)
        .collect()
        .map(r => r.getLong(0).toInt ->
          ls.indices.map(i => r.getDouble(i + 1)).toArray).toMap
      val bAggs = ls.indices.map(i => F.sum(F.col(s"__r$i")).as(s"__b$i"))
      val bg = resid.agg(bAggs.head, bAggs.tail: _*).collect()(0)
      ls.indices.foreach { i =>
        val gi = grads.map { case (b, g) => b -> g(i) }
        w(i) = w(i).zipWithIndex.map { case (wv, b) =>
          Classifier.round9(wv - lr * gi.getOrElse(b, 0.0) / n) }
        bias(i) = Classifier.round9(bias(i) - lr * bg.getDouble(i) / n)
      }
    }
    data.unpersist()
    ls.indices.map(i =>
      ls(i) -> Classifier.LinearModel(bias(i), w(i))).toSeq
  }

  /** (id, lang_pred) for every doc — integer-exact argmax over the
    * one-vs-rest scores (see object doc). One shuffle on id. */
  def predict(docs: DataFrame, idCol: Column, textCol: Column,
      models: Seq[(String, Classifier.LinearModel)]): DataFrame = {
    require(models.nonEmpty, "predict needs at least one language model")
    val ms = models.sortBy(_._1)
    val buckets = ms.head._2.w.length
    require(ms.forall(_._2.w.length == buckets),
      "all language models must share the bucket count")
    val feats = Importance.hashedFeatures(docs, idCol, textCol, buckets)
    val zAggs = ms.map { case (lang, m) =>
      val wLit = F.array(m.w.map(v => F.lit(math.round(v * 1e9))): _*)
      F.sum(F.col("cnt") *
        F.element_at(wLit, F.col("bucket").cast("int") + 1)).as(s"__z_$lang")
    }
    val wide = feats.groupBy("id").agg(zAggs.head, zAggs.tail: _*)
    val scores = ms.map { case (lang, _) => lang -> F.col(s"__z_$lang") }
    // greatest() demands ≥2 args; one language degenerates to itself
    val maxS =
      if (scores.size == 1) scores.head._2
      else F.greatest(scores.map(_._2): _*)
    // first language in ascending order whose score is maximal
    val pred = scores.foldRight(F.lit(ms.head._1): Column) {
      case ((lang, s), els) => F.when(s === maxS, F.lit(lang)).otherwise(els)
    }
    docs.select(idCol.as("id")).distinct()
      .join(wide.select(F.col("id"), pred.as("lang_pred")), Seq("id"), "left")
      // no tokens ⇒ every score 0 ⇒ the same lang-ascending tiebreak
      .withColumn("lang_pred",
        F.coalesce(F.col("lang_pred"), F.lit(ms.head._1)))
  }
}
