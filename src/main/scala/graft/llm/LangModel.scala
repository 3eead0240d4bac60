package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Corpus-trained bigram language model for perplexity-style quality
  * gating (the CCNet/Gopher filter family, without an external model):
  * the corpus itself is the training set, so boilerplate-heavy or
  * templated documents — whose bigrams are common — score HIGH average
  * log-probability, while line-noise scores low, and both tails are
  * gateable. Deliberately simple math (add-one smoothing over the
  * corpus vocabulary) so the score is exactly reproducible by any
  * engine — the q137 oracle replays it to the last logarithm.
  *
  * Scale shape: training is two hash aggregations (bigram counts,
  * predecessor counts — shuffle ∝ distinct bigrams, map-side combined);
  * scoring re-joins each document's bigrams to those counts ON THE SAME
  * KEYS, so the exchanges line up, then one per-doc aggregation. No
  * driver-side model object: the "model" stays a distributed table,
  * which is what lets the same code train on 100 TB.
  */
object LangModel {

  /** (doc_id, n_bigrams, logprob): per document, the average
    * ln P(w_i | w_{i-1}) under the corpus bigram model with add-one
    * smoothing — P = (C(prev,cur) + 1) / (C(prev,·) + |V|). Documents
    * with fewer than two tokens carry no bigram evidence and are
    * omitted (mirror a WHERE len >= 2 in SQL). Tokens are
    * lowercase-whitespace, the same normalization as the dedup path. */
  def bigramScore(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = Dedup.tokens(F.lower(text))
    val base = docs.select(id.as("doc_id"), toks.as("w"))
      .filter(F.size(F.col("w")) >= 2)
    val bg = base.select(F.col("doc_id"),
      F.explode(F.zip_with(
        F.slice(F.col("w"), F.lit(1), F.size(F.col("w")) - 1),
        F.slice(F.col("w"), F.lit(2), F.size(F.col("w")) - 1),
        (p, c) => F.struct(p.as("p"), c.as("c")))).as("b"))
      .select(F.col("doc_id"), F.col("b.p").as("p"), F.col("b.c").as("c"))
    val c2 = bg.groupBy("p", "c").agg(F.count(F.lit(1)).as("cnt2"))
    val c1 = bg.groupBy("p").agg(F.count(F.lit(1)).as("cnt1"))
    // vocabulary over ALL tokens (including docs too short to score —
    // they still contribute evidence of existing words)
    val v = docs.select(F.explode(Dedup.tokens(F.lower(text))).as("t"))
      .agg(F.count_distinct(F.col("t")).as("nv"))
    bg.join(c2, Seq("p", "c")).join(c1, Seq("p")).crossJoin(v)
      .groupBy("doc_id")
      .agg(
        F.count(F.lit(1)).cast("int").as("n_bigrams"),
        F.round(F.avg(F.log(
          (F.col("cnt2") + 1.0) / (F.col("cnt1") + F.col("nv")))), 6)
          .as("logprob"))
  }
}
