package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.storage.StorageLevel

/** Corpus-trained bigram language model for perplexity-style quality
  * gating (the CCNet/Gopher filter family, without an external model):
  * the corpus itself is the training set, so boilerplate-heavy or
  * templated documents — whose bigrams are common — score HIGH average
  * log-probability, while line-noise scores low, and both tails are
  * gateable. Deliberately simple math (add-one smoothing over the
  * corpus vocabulary) so the score is exactly reproducible by any
  * engine — the q137/q138 oracles replay it to the last logarithm.
  *
  * Scale shape: training is ONE hash aggregation over the corpus
  * bigrams (shuffle ∝ distinct bigrams, map-side combined) — the
  * predecessor totals are DERIVED from the bigram counts
  * (`Σ_c C(p,c) = C(p,·)`), an aggregation over distinct-bigram rows,
  * never a second corpus scan. Scoring left-joins each document's
  * bigrams to those counts ON THE SAME KEYS, so the exchanges line up,
  * then one per-doc aggregation. No driver-side model object: the
  * "model" stays a pair of distributed tables, which is what lets the
  * same code train on 100 TB.
  */
object LangModel {

  /** The trained model, as distributed tables: `bigrams` = (p, c,
    * cnt2) — one row per distinct training bigram — and `vocabSize` =
    * the single-row (nv) distinct-token count of the training corpus. */
  final case class BigramModel(bigrams: DataFrame, vocabSize: DataFrame)

  /** (doc_id, p, c): one row per adjacent lowercase-whitespace token
    * pair — the same normalization as the dedup path. Documents with
    * fewer than two tokens carry no bigram evidence and drop here. */
  private def docBigrams(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = Dedup.tokens(F.lower(text))
    docs.select(id.as("doc_id"), toks.as("w"))
      .filter(F.size(F.col("w")) >= 2)
      .select(F.col("doc_id"),
        F.explode(F.zip_with(
          F.slice(F.col("w"), F.lit(1), F.size(F.col("w")) - 1),
          F.slice(F.col("w"), F.lit(2), F.size(F.col("w")) - 1),
          (p, c) => F.struct(p.as("p"), c.as("c")))).as("b"))
      .select(F.col("doc_id"), F.col("b.p").as("p"), F.col("b.c").as("c"))
  }

  /** Train on a corpus: bigram counts + vocabulary size. The
    * vocabulary spans ALL the corpus' tokens, including docs too short
    * to contribute bigrams — they still attest that their words exist. */
  def trainBigramModel(corpus: DataFrame, id: Column, text: Column): BigramModel = {
    val c2 = docBigrams(corpus, id, text)
      .groupBy("p", "c").agg(F.count(F.lit(1)).as("cnt2"))
    val v = corpus.select(F.explode(Dedup.tokens(F.lower(text))).as("t"))
      .agg(F.count_distinct(F.col("t")).as("nv"))
    BigramModel(c2, v)
  }

  /** Score documents against a trained model: (doc_id, n_bigrams,
    * logprob) — per document, the average ln P(w_i | w_{i-1}) with
    * add-one smoothing, P = (C(prev,cur) + 1) / (C(prev,·) + |V|),
    * counts taken from the MODEL (so held-out shards score against a
    * disjoint training corpus). OOV semantics: an unseen bigram scores
    * with C(prev,cur) = 0; an unseen predecessor additionally has
    * C(prev,·) = 0, i.e. P = 1 / |V| — the smoothing floor. Documents
    * with fewer than two tokens are omitted (mirror WHERE len >= 2). */
  def scoreAgainst(model: BigramModel, docs: DataFrame, id: Column, text: Column): DataFrame =
    scoreBigrams(model, docBigrams(docs, id, text))

  /** Unrounded per-doc scores, for paths that AVERAGE the scores again
    * (the grouped gate). Rounding per doc AND per group is double
    * rounding: every doc becomes an independent rounding-boundary
    * exposure, and one flipped 6th decimal shifts its group mean across
    * the mean's own boundary. Feed raw doubles to the group average and
    * round ONCE at the end. */
  def scoreAgainstRaw(model: BigramModel, docs: DataFrame, id: Column, text: Column): DataFrame =
    scoreBigrams(model, docBigrams(docs, id, text), roundPerDoc = false)

  private def scoreBigrams(model: BigramModel, bg: DataFrame,
      roundPerDoc: Boolean = true): DataFrame = {
    // predecessor totals DERIVED from the bigram counts (Σ_c C(p,c)):
    // an aggregation over distinct-bigram rows, not a corpus re-scan
    val c1 = model.bigrams.groupBy("p").agg(F.sum("cnt2").as("cnt1"))
    val lp = F.avg(F.log(
      (F.coalesce(F.col("cnt2"), F.lit(0L)) + 1.0) /
        (F.coalesce(F.col("cnt1"), F.lit(0L)) + F.col("nv"))))
    bg.join(model.bigrams, Seq("p", "c"), "left")
      .join(c1, Seq("p"), "left")
      .crossJoin(model.vocabSize)
      .groupBy("doc_id")
      .agg(
        F.count(F.lit(1)).cast("int").as("n_bigrams"),
        (if (roundPerDoc) F.round(lp, 6) else lp).as("logprob"))
  }

  /** The bigram gate as a PLAN-BACKED cube metric ([[graft.model.Metric]]
    * `planBuild` contract): per slice group, the mean per-document
    * logprob. The model trains on the WHOLE pred-filtered corpus
    * (cross-group, like the SemDeDup metric's k-means — a quality gate
    * scores against corpus statistics, not each slice's own) and each
    * group averages its own documents' scores. Training and scoring are
    * pure DataFrame lineage — no action runs at compile and nothing is
    * baked as a literal — so unlike `semanticSurvivors` this metric does
    * NOT set `snapshotsData`: a cached plan re-derives the model from
    * the live table on every execution. (That is also why this path
    * must not `persist`: frozen blocks would be the snapshot problem
    * through the back door.)
    *
    * Group contract: a group whose docs all have < 2 tokens (no bigram
    * evidence) gets NULL — the SQL `avg` of an empty set — not a row
    * drop. */
  def avgLogprobPlan(
      df: DataFrame,
      groupCols: Seq[(String, Column)],
      id: Column, text: Column,
      pred: Option[Column],
      outKey: String = "__pb_value"): DataFrame =
    graft.operators.PlanBacked.groupContract(df, groupCols, pred, outKey) { (vals, keyed) =>
      val model = trainBigramModel(vals, id, text)
      // raw per-doc scores: the SINGLE rounding happens on the group
      // mean below (per-doc round + group round = double rounding, the
      // round-7 q140 1-ulp hash flip)
      val scored = scoreAgainstRaw(model, vals, id, text)
      vals.select((keyed.map { case (n, c) => c.as(n) } :+ id.as("doc_id")): _*)
        .join(scored, "doc_id")
        .groupBy(keyed.map { case (n, _) => F.col(n) }: _*)
        .agg(F.round(F.avg(F.col("logprob")), 6).as(outKey))
    }(_ => F.lit(null).cast("double"))

  // ---- trigram model with stupid backoff ----------------------------

  /** Backoff discount (Brants et al. 2007, "Large Language Models in
    * Machine Translation" — the 'stupid backoff' α). 0.16 is α² written
    * as a literal: 0.4*0.4 in binary floating point is
    * 0.16000000000000003, and the oracle writes 0.16 — both engines
    * must use the same literal or held-out OOV scores drift 1 ulp. */
  private val Alpha = 0.4
  private val Alpha2 = 0.16

  /** The trained trigram model, as distributed tables: trigram counts
    * (a, b, c, cnt3), raw adjacent-pair bigram counts (a, b, cnt2),
    * unigram counts (w, cnt1), and the 1-row totals (n_tokens,
    * n_vocab). Like [[BigramModel]], no driver-side object — every
    * table scales with distinct n-grams, never the corpus. */
  final case class TrigramModel(trigrams: DataFrame, bigrams: DataFrame,
      unigrams: DataFrame, totals: DataFrame)

  /** (doc_id, a, b, c): one row per adjacent lowercase token triple.
    * Docs with fewer than three tokens carry no trigram evidence. */
  private def docTrigrams(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = Dedup.tokens(F.lower(text))
    docs.select(id.as("doc_id"), toks.as("w"))
      .filter(F.size(F.col("w")) >= 3)
      .select(F.col("doc_id"),
        F.explode(F.zip_with(
          F.slice(F.col("w"), F.lit(1), F.size(F.col("w")) - 2),
          F.zip_with(
            F.slice(F.col("w"), F.lit(2), F.size(F.col("w")) - 2),
            F.slice(F.col("w"), F.lit(3), F.size(F.col("w")) - 2),
            (b, c) => F.struct(b.as("b"), c.as("c"))),
          (a, bc) => F.struct(a.as("a"),
            bc.getField("b").as("b"), bc.getField("c").as("c")))).as("g"))
      .select(F.col("doc_id"), F.col("g.a").as("a"),
        F.col("g.b").as("b"), F.col("g.c").as("c"))
  }

  /** Train the trigram model: three hash aggregations over the SAME
    * tokenized corpus lineage (trigram, bigram, unigram counts — each
    * map-side combined, shuffle ∝ its distinct-gram count), plus the
    * derived 1-row totals. The same one-corpus-pass-per-order shape
    * that makes [[trainBigramModel]] 100 TB-safe. */
  def trainTrigramModel(corpus: DataFrame, id: Column, text: Column): TrigramModel = {
    val c3 = docTrigrams(corpus, id, text)
      .groupBy("a", "b", "c").agg(F.count(F.lit(1)).as("cnt3"))
    val c2 = docBigrams(corpus, id, text)
      .groupBy("p", "c").agg(F.count(F.lit(1)).as("cnt2"))
      .select(F.col("p").as("a"), F.col("c").as("b"), F.col("cnt2"))
    val u = corpus.select(F.explode(Dedup.tokens(F.lower(text))).as("w"))
      .groupBy("w").agg(F.count(F.lit(1)).as("cnt1"))
    val totals = u.agg(
      F.sum("cnt1").cast("double").as("n_tokens"),
      F.count(F.lit(1)).cast("double").as("n_vocab"))
    TrigramModel(c3, c2, u, totals)
  }

  /** Score documents against a trained trigram model with STUPID
    * BACKOFF: per trigram position (a, b, c),
    *   S = C(a,b,c) / C(a,b)                 if the trigram was seen,
    *     = 0.4 · C(b,c) / C(b)               else if the bigram was,
    *     = 0.16 · (C(c) + 1) / (N + |V|)     otherwise (add-one floor
    *                                          at the base so OOV stays
    *                                          finite under ln),
    * and per doc the average ln S. A seen trigram implies its (a,b)
    * context bigram was seen, and a seen (b,c) bigram implies b was —
    * so every branch's denominator is positive by construction.
    * Docs with fewer than three tokens are omitted (mirror len >= 3).
    *
    * Plan: the doc-trigram stream left-joins THREE count tables (the
    * trigram table pre-enriched with its context-bigram count, the
    * (b,c) bigram table pre-enriched with its b-unigram count, and the
    * c unigrams) plus the broadcast 1-row totals, then one per-doc
    * aggregation. The enrichments are MODEL-sized joins (rows ∝
    * distinct grams) and are sound because each ridden count is only
    * read when its carrier row matched: cnt2_ab only when the trigram
    * was seen — and a model trigram (a,b,c) guarantees its (a,b)
    * adjacent pair is in the model's bigrams — and cnt1_b only when
    * the (b,c) bigram was seen, which guarantees b is in the unigrams.
    * cnt1_c still joins the doc stream directly: the base branch fires
    * exactly when both higher orders MISS, so no model row carries it.
    * At 100 TB this turns five doc-corpus-sized join shuffles on five
    * different keys into three. */
  def trigramScoreAgainst(model: TrigramModel, docs: DataFrame,
      id: Column, text: Column): DataFrame = {
    val tri = docTrigrams(docs, id, text)
    val ab = model.bigrams.select(F.col("a"), F.col("b"),
      F.col("cnt2").as("cnt2_ab"))
    val bc = model.bigrams.select(F.col("a").as("b"), F.col("b").as("c"),
      F.col("cnt2").as("cnt2_bc"))
    val ub = model.unigrams.select(F.col("w").as("b"), F.col("cnt1").as("cnt1_b"))
    val uc = model.unigrams.select(F.col("w").as("c"), F.col("cnt1").as("cnt1_c"))
    val triCnt = model.trigrams.join(ab, Seq("a", "b"), "left")
    val bcCnt = bc.join(ub, Seq("b"), "left")
    val s = F.when(F.col("cnt3").isNotNull,
        F.col("cnt3").cast("double") / F.col("cnt2_ab"))
      .when(F.col("cnt2_bc").isNotNull,
        F.lit(Alpha) * F.col("cnt2_bc") / F.col("cnt1_b"))
      .otherwise(F.lit(Alpha2) *
        (F.coalesce(F.col("cnt1_c"), F.lit(0L)) + 1.0) /
        (F.col("n_tokens") + F.col("n_vocab")))
    tri.join(triCnt, Seq("a", "b", "c"), "left")
      .join(bcCnt, Seq("b", "c"), "left")
      .join(uc, Seq("c"), "left")
      .crossJoin(model.totals)
      .groupBy("doc_id")
      .agg(
        F.count(F.lit(1)).cast("int").as("n_trigrams"),
        F.round(F.avg(F.log(s)), 6).as("logprob"))
  }

  /** Self-scoring convenience (the trigram face of [[bigramScore]]):
    * train on the corpus, score the same corpus. On the training set
    * every trigram is in the model, so only the first backoff branch
    * fires — the held-out split (q186) is what exercises the backoff
    * chain. */
  def trigramScore(docs: DataFrame, id: Column, text: Column): DataFrame =
    trigramScoreAgainst(trainTrigramModel(docs, id, text), docs, id, text)

  // ---- interpolated Kneser-Ney trigram scoring ----------------------

  /** Absolute discount (Ney, Essen & Kneser 1994's D; Chen & Goodman
    * 1998 §3 fixed-discount variant). A shared literal on engine and
    * oracle sides — the same 1-ulp discipline as [[Alpha2]]. */
  private val KnD = 0.75

  /** Score documents against a trained trigram model with INTERPOLATED
    * KNESER-NEY smoothing (Kneser & Ney 1995; the fixed-discount
    * formulation of Chen & Goodman 1998): per trigram position
    * (a, b, c),
    *   P₃ = max(C(a,b,c) − D, 0)/C(a,b·) + D·N₁₊(a,b,·)/C(a,b·) · P₂
    *   P₂ = max(N₁₊(·,b,c) − D, 0)/N₁₊(·,b,·)
    *        + D·N₁₊(b,·)/N₁₊(·,b,·) · P₁
    *   P₁ = (N₁₊(·,·,c) + 1) / (N₁₊(·,·,·) + |V|)
    * with D = 0.75, every count derived from the TRIGRAM type table
    * (so the distribution telescopes exactly), an unseen (a,b) or (b)
    * context falling through to the next order entirely (λ = 1), and
    * the unigram base add-one-smoothed over continuation types so OOV
    * tokens stay finite under ln — the same floor move as the stupid-
    * backoff base. Per doc, the average ln P₃, rounded to 6 dp.
    *
    * Unlike stupid backoff — where on the training corpus only the
    * first branch ever fires — interpolation mixes ALL three orders
    * into every position, so even the self-score face exercises the
    * full formula; held-out scoring additionally exercises the
    * unseen-context fallthroughs.
    *
    * Scale shape: the four continuation tables are aggregations over
    * the DISTINCT-trigram table (rows ∝ distinct grams, never the
    * corpus); scoring left-joins the doc trigrams to five count tables
    * on their gram keys plus two broadcast 1-row totals, then one
    * per-doc aggregation — the [[trigramScoreAgainst]] plan with
    * continuation counts in place of raw counts. */
  def kneserNeyScoreAgainst(model: TrigramModel, docs: DataFrame,
      id: Column, text: Column): DataFrame = {
    val tri = docTrigrams(docs, id, text)
    val (ctx, cbc, cb, cc, ctot) = knCountTables(model)
    tri.join(model.trigrams, Seq("a", "b", "c"), "left")
      .join(ctx, Seq("a", "b"), "left")
      .join(cbc, Seq("b", "c"), "left")
      .join(cb, Seq("b"), "left")
      .join(cc, Seq("c"), "left")
      .crossJoin(ctot)
      .crossJoin(model.totals.select(F.col("n_vocab")))
      .groupBy("doc_id")
      .agg(
        F.count(F.lit(1)).cast("int").as("n_trigrams"),
        F.round(F.avg(F.log(knP3)), 6).as("logprob"))
  }

  /** The four derived KN count tables, in TWO grouping-sets passes
    * instead of five separate aggregations (ctx/cbc share one shuffle
    * of the type table; cb/cc/ctot share one shuffle of cbc — Spark's
    * ReuseExchange serves every branch from the same exchange). All
    * aggregated values are integer-valued doubles below 2⁵³, so the
    * fold order cannot perturb a bit — the tables are value-identical
    * to the separate-aggregation shape. */
  private def knCountTables(model: TrigramModel)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    // grouping_id bits follow groupBy column order, 1 = aggregated-out:
    // over (a,b,c), set (a,b) → 0b001 = 1, set (b,c) → 0b100 = 4
    val g1 = model.trigrams.groupingSets(
        Seq(Seq(F.col("a"), F.col("b")), Seq(F.col("b"), F.col("c"))),
        F.col("a"), F.col("b"), F.col("c"))
      .agg(F.sum("cnt3").cast("double").as("__s3"),
        F.count(F.lit(1)).cast("double").as("__n1p"),
        F.grouping_id().as("__gid"))
    // context totals + distinct-successor counts: each c3 row IS a
    // distinct (a,b,c) type, so count(*) per (a,b) = N1+(a,b,·)
    val ctx = g1.filter(F.col("__gid") === 1).select(
      F.col("a"), F.col("b"),
      F.col("__s3").as("ctx2"), F.col("__n1p").as("n1p_ab"))
    // continuation counts: N1+(·,b,c) = distinct predecessors of (b,c)
    val cbc = g1.filter(F.col("__gid") === 4).select(
      F.col("b"), F.col("c"), F.col("__n1p").as("cont_bc"))
    // over (b,c): set (b) → 0b01 = 1, set (c) → 0b10 = 2, set () → 3
    val g2 = cbc.groupingSets(
        Seq(Seq(F.col("b")), Seq(F.col("c")), Seq.empty),
        F.col("b"), F.col("c"))
      .agg(F.sum("cont_bc").as("__sbc"),
        F.count(F.lit(1)).cast("double").as("__cnt"),
        F.grouping_id().as("__gid"))
    val cb = g2.filter(F.col("__gid") === 1).select(
      F.col("b"), F.col("__sbc").as("cont_b"), F.col("__cnt").as("n1p_b"))
    val cc = g2.filter(F.col("__gid") === 2).select(
      F.col("c"), F.col("__cnt").as("cont_c"))
    val ctot = g2.filter(F.col("__gid") === 3).select(
      F.col("__cnt").as("cont_tot"))
    (ctx, cbc, cb, cc, ctot)
  }

  /** The interpolated-KN per-position probability, over the joined
    * count columns (shared by the held-out and self-score faces). */
  private def knP3: Column = {
    val p1 = (F.coalesce(F.col("cont_c"), F.lit(0.0)) + 1.0) /
      (F.col("cont_tot") + F.col("n_vocab"))
    val p2 = F.when(F.col("cont_b").isNotNull,
      F.greatest(F.coalesce(F.col("cont_bc"), F.lit(0.0)) - KnD, F.lit(0.0)) /
        F.col("cont_b") +
        F.lit(KnD) * F.col("n1p_b") / F.col("cont_b") * p1).otherwise(p1)
    F.when(F.col("ctx2").isNotNull,
      F.greatest(F.coalesce(F.col("cnt3"), F.lit(0.0)).cast("double") - KnD,
        F.lit(0.0)) / F.col("ctx2") +
        F.lit(KnD) * F.col("n1p_ab") / F.col("ctx2") * p2).otherwise(p2)
  }

  /** Self-scoring convenience: train on the corpus, score the same
    * corpus under interpolated KN.
    *
    * Two self-score-only structural savings (results bit-identical —
    * every scored trigram is IN the model by construction, so all five
    * count joins of the held-out path are guaranteed hits):
    *   - the per-doc trigram lineage (tokenize + explode, the
    *     corpus-sized pass) feeds BOTH the type counts and the scoring
    *     side, and both hash by the SAME (a,b,c) key, so Spark's
    *     runtime exchange reuse serves them from ONE shuffle of the
    *     tokenized stream — deliberately NOT persisted: a corpus-sized
    *     persist is bigger than the corpus at 100 TB and A/B-measured
    *     a net loss (round-21 record §2);
    *   - the count tables are joined AMONG THEMSELVES first (all
    *     type-table-sized) into one enriched (a,b,c) table, and the
    *     corpus-sized trigram stream joins ONCE on (a,b,c) — instead of
    *     five corpus-side joins on five different keys. A held-out
    *     trigram could miss the type row while its suborders match, so
    *     only the self-score face may take this shape; here every
    *     (a,b,c) matches and carries exactly the suborder counts the
    *     five-join plan would have attached. */
  def kneserNeyScore(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val tri = docTrigrams(docs, id, text)
    val c3 = tri.groupBy("a", "b", "c").agg(F.count(F.lit(1)).as("cnt3"))
    // bigrams ride along for TrigramModel shape-completeness only — the
    // KN score never evaluates them (lazy plan, zero execution cost)
    val c2 = docBigrams(docs, id, text)
      .groupBy("p", "c").agg(F.count(F.lit(1)).as("cnt2"))
      .select(F.col("p").as("a"), F.col("c").as("b"), F.col("cnt2"))
    val u = docs.select(F.explode(Dedup.tokens(F.lower(text))).as("w"))
      .groupBy("w").agg(F.count(F.lit(1)).as("cnt1"))
    val totals = u.agg(
      F.sum("cnt1").cast("double").as("n_tokens"),
      F.count(F.lit(1)).cast("double").as("n_vocab"))
    val model = TrigramModel(c3, c2, u, totals)
    // plain aggregations over c3 (not the grouping-sets shape): the
    // held-out face batches count derivation, but here the scoring
    // join and the type-count aggregation already share one exchange,
    // and A/B runs measured the grouping-sets variant no faster
    val ctx = c3.groupBy("a", "b").agg(
      F.sum("cnt3").cast("double").as("ctx2"),
      F.count(F.lit(1)).cast("double").as("n1p_ab"))
    val cbc = c3.groupBy("b", "c")
      .agg(F.count(F.lit(1)).cast("double").as("cont_bc"))
    val cb = cbc.groupBy("b").agg(
      F.sum("cont_bc").as("cont_b"),
      F.count(F.lit(1)).cast("double").as("n1p_b"))
    val cc = cbc.groupBy("c")
      .agg(F.count(F.lit(1)).cast("double").as("cont_c"))
    val ctot = cbc.agg(F.count(F.lit(1)).cast("double").as("cont_tot"))
    val enriched = model.trigrams
      .join(ctx, Seq("a", "b"), "left")
      .join(cbc, Seq("b", "c"), "left")
      .join(cb, Seq("b"), "left")
      .join(cc, Seq("c"), "left")
      .crossJoin(ctot)
      .crossJoin(model.totals.select(F.col("n_vocab")))
    tri.join(enriched, Seq("a", "b", "c"), "left")
      .groupBy("doc_id")
      .agg(
        F.count(F.lit(1)).cast("int").as("n_trigrams"),
        F.round(F.avg(F.log(knP3)), 6).as("logprob"))
  }

  /** Persist a trained trigram model as four parquet tables — the
    * stored form the live perplexity gate
    * ([[graft.streaming.Streaming.scoreArrivals]]) serves from. The
    * model is distributed tables (rows ∝ distinct grams), so the store
    * is a normal partitioned write, not a driver-side artifact. */
  def writeTrigramModel(model: TrigramModel, path: String): Unit = {
    model.trigrams.write.mode("overwrite").parquet(s"$path/trigrams")
    model.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
    model.unigrams.write.mode("overwrite").parquet(s"$path/unigrams")
    model.totals.write.mode("overwrite").parquet(s"$path/totals")
  }

  /** Re-open a [[writeTrigramModel]] store. */
  def readTrigramModel(spark: org.apache.spark.sql.SparkSession,
      path: String): TrigramModel =
    TrigramModel(
      spark.read.parquet(s"$path/trigrams"),
      spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/unigrams"),
      spark.read.parquet(s"$path/totals"))

  /** Self-scoring convenience (the q137 gate): train on the corpus and
    * score the same corpus. The shared bigram table is persisted
    * (memory-with-disk-spill) so the lineage — tokenize + explode over
    * every document — materializes once and feeds both the count
    * aggregation and the scoring join; blocks spill/evict LRU and the
    * plan stays correct either way, so no explicit unpersist hook is
    * needed for a transient query. On the training corpus every bigram
    * and predecessor is present in the model by construction, so the
    * left joins reduce to the inner-join semantics the q137 oracle
    * replays. */
  def bigramScore(docs: DataFrame, id: Column, text: Column,
      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    // storage is caller-scoped: a long-lived serving session passes
    // StorageLevel.NONE (recompute the shared lineage twice rather
    // than leave unowned cached blocks to LRU eviction); the one-shot
    // verify/bench caller keeps the default single materialization
    val bg0 = docBigrams(docs, id, text)
    val bg = if (storage == StorageLevel.NONE) bg0 else bg0.persist(storage)
    val c2 = bg.groupBy("p", "c").agg(F.count(F.lit(1)).as("cnt2"))
    val v = docs.select(F.explode(Dedup.tokens(F.lower(text))).as("t"))
      .agg(F.count_distinct(F.col("t")).as("nv"))
    scoreBigrams(BigramModel(c2, v), bg)
  }
}
