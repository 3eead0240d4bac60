package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.storage.StorageLevel

/** In-engine TRAINED quality classifier — the fastText/CCNet
  * discriminator family (logistic regression over hashed n-gram
  * features) without an external model artifact: train the linear
  * model on the corpus itself (e.g. "looks like the curated reference
  * source" vs everything else), then score every doc row-locally.
  * Completes the model-based-gate trio next to the bigram LM
  * ([[LangModel]], generative) and DSIR ([[Importance]], importance
  * ratio): this one is the actual supervised discriminator.
  *
  * Scale shape: features are [[Importance.hashedFeatures]] (row-local
  * explode + md5 buckets — engine-independent), so the feature frame
  * is (id, bucket, cnt), never text. Each gradient-descent iteration
  * is TWO aggregations — per-doc score (shuffle on id) and per-bucket
  * gradient (shuffle on bucket, ≤ B rows out) — with the weight
  * vector riding as a broadcast literal; the driver holds B+1 doubles
  * and never sees a row. Batch GD, not SGD, so the model is a pure
  * function of the corpus: weights are rounded to a 1e-9 grid after
  * every step, which pins them across engines and partitionings
  * (within-step float-sum drift ~1e-14 cannot straddle the grid), and
  * q174's DuckDB oracle replays every iteration to equality.
  */
object Classifier {

  /** bias + per-bucket weights after training. */
  final case class LinearModel(bias: Double, w: Array[Double])

  private[llm] def round9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Train logistic regression by `iters` batch-GD steps on hashed
    * n-gram frequencies. `labelCol` is the supervision (0/1); docs
    * with no tokens carry no features and drop from the train set
    * (both engine and oracle). */
  def trainLogReg(docs: DataFrame, idCol: Column, textCol: Column,
      labelCol: Column, buckets: Int = 32, iters: Int = 5,
      lr: Double = 0.5): LinearModel = {
    require(buckets >= 1 && iters >= 1, "need buckets >= 1 and iters >= 1")
    val feats = Importance.hashedFeatures(docs, idCol, textCol, buckets)
    val tot = feats.groupBy("id").agg(F.sum("cnt").as("__tot"))
    val y = docs.select(idCol.as("id"), labelCol.cast("double").as("y"))
    val data = feats.join(tot, "id")
      .select(F.col("id"), F.col("bucket"),
        (F.col("cnt").cast("double") / F.col("__tot")).as("x"))
      .join(y, "id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = data.select("id").distinct().count().toDouble

    var bias = 0.0
    var w = Array.fill(buckets)(0.0)
    for (_ <- 1 to iters) {
      val wLit = F.array(w.map(F.lit): _*)
      val resid = data.groupBy("id")
        .agg(
          F.sum(F.col("x") *
            F.element_at(wLit, F.col("bucket").cast("int") + 1)).as("z"),
          F.first("y").as("y"))
        .select(F.col("id"),
          (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("z") + F.lit(bias))))
            - F.col("y")).as("r"))
      val parts = data.join(resid, "id")
        .groupBy("bucket").agg(F.sum(F.col("x") * F.col("r")).as("g"))
        .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
      val biasGrad = resid.agg(F.sum("r")).collect()(0).getDouble(0)
      w = w.zipWithIndex.map { case (wv, i) =>
        round9(wv - lr * parts.getOrElse(i, 0.0) / n) }
      bias = round9(bias - lr * biasGrad / n)
    }
    data.unpersist()
    LinearModel(bias, w)
  }

  /** Per-doc model probability via the feature frame — the exact
    * arithmetic of training's score step, so a trained-then-scored
    * corpus reproduces the final training residual inputs. */
  def scoreViaFeatures(docs: DataFrame, idCol: Column, textCol: Column,
      model: LinearModel): DataFrame = {
    val b = model.w.length
    val feats = Importance.hashedFeatures(docs, idCol, textCol, b)
    val tot = feats.groupBy("id").agg(F.sum("cnt").as("__tot"))
    val wLit = F.array(model.w.map(F.lit): _*)
    feats.join(tot, "id")
      .groupBy("id")
      .agg(F.sum(F.col("cnt").cast("double") / F.col("__tot") *
        F.element_at(wLit, F.col("bucket").cast("int") + 1)).as("z"))
      .select(F.col("id"),
        (F.lit(1.0) / (F.lit(1.0) +
          F.exp(-(F.col("z") + F.lit(model.bias))))).as("__p"))
  }

  /** Plan-backed cube metric: per-group AVERAGE model probability,
    * with the model trained IN-PLAN on the whole pred-filtered corpus
    * (`labelPred` supplies the supervision) — the q161/avgDsirWeight
    * contract shape. Docs with no tokens score sigmoid(bias) (z = 0),
    * mirrored by the oracle's coalesce. */
  def avgScorePlan(
      df: DataFrame, groupCols: Seq[(String, Column)],
      id: Column, text: Column, labelPred: Column,
      pred: Option[Column],
      buckets: Int = 32, iters: Int = 5, lr: Double = 0.5,
      outKey: String = "__pb_value"): DataFrame =
    graft.operators.PlanBacked.groupContract(df, groupCols, pred, outKey) {
      (vals, keyed) =>
        val m = trainLogReg(vals, id, text, labelPred.cast("int"),
          buckets, iters, lr)
        val pEmpty = 1.0 / (1.0 + math.exp(-m.bias))
        vals.select((keyed.map { case (n, c) => c.as(n) } :+
            id.as("__cid")): _*)
          .join(scoreViaFeatures(vals, id, text, m)
            .withColumnRenamed("id", "__cid"), Seq("__cid"), "left")
          .withColumn("__p", F.coalesce(F.col("__p"), F.lit(pEmpty)))
          .groupBy(keyed.map { case (n, _) => F.col(n) }: _*)
          .agg(F.round(F.avg(F.col("__p")), 6).as(outKey))
    }(_ => F.lit(null).cast("double"))

  /** Row-local scoring Column: P(label=1 | text) under a trained
    * model — grams recomputed in place (no feature-frame join), so the
    * gate fuses into any scan. */
  def scoreText(textCol: Column, model: LinearModel): Column = {
    // the EXACT gram construction of Importance.hashedFeatures, so a
    // score here equals a score through the feature frame
    val grams = F.concat(TextAnalysis.tokens(textCol),
      TextAnalysis.wordNgrams(textCol, 2))
    val wLit = F.array(model.w.map(F.lit): _*)
    val z = F.aggregate(grams, F.lit(0.0),
      (acc, g) => acc + F.element_at(wLit,
        Splits.hashBucket(g, model.w.length).cast("int") + 1))
    val zn = F.when(F.size(grams) > 0, z / F.size(grams)).otherwise(F.lit(0.0))
    F.lit(1.0) / (F.lit(1.0) + F.exp(-(zn + F.lit(model.bias))))
  }
}
