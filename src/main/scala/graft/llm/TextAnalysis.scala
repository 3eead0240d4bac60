package graft.llm

import graft.functions.PolyHash64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Text-quality operators for training-data curation: token counting,
  * quality scoring, language ID, fingerprinting. All row-local Column
  * expressions (codegen'd, no UDFs, no shuffles) — they compose with any
  * cube/filter and scale linearly.
  */
object TextAnalysis {

  def tokens(text: Column): Column = F.split(F.trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = F.size(tokens(text))

  /** BPE-ish subword-piece estimate: letter runs, single digits, and
    * punctuation each count as one piece (a cheap proxy for tokenizer
    * cost, good enough for length filtering). */
  def subwordCount(text: Column): Column =
    F.size(F.call_function("regexp_extract_all", text,
      F.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), F.lit(0)))

  /** REAL tokenizer-apply: greedy longest-match subword segmentation
    * against a fixed vocabulary (the codegen'd
    * [[graft.functions.SubwordEncode]] — see its scaladoc for the
    * algorithm and scale shape). Returns the subword token array; a
    * character no vocab entry covers is emitted as itself (unknown —
    * recognizable by non-membership). Replaces the [[subwordCount]]
    * regex APPROXIMATION wherever an actual vocabulary exists: packing,
    * mixture, and chunking budgets all take the count as a Column, so
    * `F.size(subwordTokens(text, vocab))` drops in directly. */
  def subwordTokens(text: Column, vocab: Seq[String]): Column =
    graft.functions.SubwordEncode(text, vocab)

  /** Vocabulary-true token count (size of [[subwordTokens]]). */
  def subwordCount(text: Column, vocab: Seq[String]): Column =
    F.size(subwordTokens(text, vocab))

  /** Deterministic fixture vocabulary for the subword demo query (q155)
    * and its DuckDB replay: full words, multi-char pieces, and most —
    * deliberately not all — single letters, so the unknown path is
    * exercised by real fixture words (f/k/v/q-initial words). Ids are
    * 1-based positions in this list, shared by both sides. */
  val DemoVocab: Seq[String] = Seq(
    "spark", "filter", "scan", "sort", "key", "batch", "tab", "le", "jo",
    "in", "me", "rge", "row", "da", "ta", "val", "ue", "str", "eam",
    "wind", "ow", "gr", "oup", "er", "qu",
    "a", "b", "c", "d", "e", "g", "h", "i", "j", "l", "m", "n", "o", "p",
    "r", "s", "t", "u", "w", "y")

  /** Ratio of characters that are not lowercase alphanumerics/space. */
  def punctRatio(text: Column): Column =
    F.round(
      (F.length(text) - F.length(F.regexp_replace(F.lower(text), "[^a-z0-9 ]", "")))
        .cast("double") / F.greatest(F.length(text), F.lit(1)), 6)

  /** English stopword occurrence ratio over tokens. */
  val StopwordsEn: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "is", "in", "it", "that")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    F.round(
      F.size(F.filter(toks, t => t.isin(StopwordsEn: _*))).cast("double") /
        F.greatest(F.size(toks), F.lit(1)), 6)
  }

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    F.round(
      F.aggregate(toks, F.lit(0L), (acc, t) => acc + F.length(t)).cast("double") /
        F.greatest(F.size(toks), F.lit(1)), 6)
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with low
    * punctuation noise and a sane stopword rate. Deterministic, documented
    * formula so it can be reproduced in SQL for verification. */
  def qualityScore(text: Column): Column = {
    val lenScore = F.least(tokenCount(text).cast("double") / 100.0, F.lit(1.0))
    val punctPenalty = F.lit(1.0) - F.least(punctRatio(text) * 5.0, F.lit(1.0))
    val stopScore = F.least(stopwordRatio(text) * 5.0, F.lit(1.0))
    F.round(lenScore * 0.5 + punctPenalty * 0.3 + stopScore * 0.2, 6)
  }

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Kept tiny and disjoint-ish on purpose; real pipelines
    * plug in fastText — the *operator shape* (argmax over per-language
    * scores, fixed priority tie-break) is what matters. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "et", "une", "dans"))

  /** Detected language = first language (in declaration order) whose
    * stopword-hit count is maximal; "und" (undetermined) if all zero. */
  def langId(text: Column): Column =
    langIdFromTokens(tokens(F.lower(text)))

  /** [[langId]] over an already-tokenized LOWERCASE token array — the
    * shape the staged [[profile]] projection feeds. Each language's
    * hit count is evaluated ONCE into an array of (score, lang)
    * structs and the argmax is a 4-element fold keeping the FIRST
    * strictly-greater score — exactly the previous when-chain's
    * declaration-order tie-break and its "und" when no score is
    * positive, but without re-evaluating every language's
    * filter-count in every CASE branch (the old expression tree
    * computed each count up to 8×; higher-order functions are
    * codegen-fallback, so nothing deduplicated them). */
  private[llm] def langIdFromTokens(toks: Column): Column = {
    val pairs = F.array(LangStopwords.map { case (lang, words) =>
      F.struct(
        F.size(F.filter(toks, t => t.isin(words: _*))).as("s"),
        F.lit(lang).as("n")) }: _*)
    F.aggregate(pairs,
        F.struct(F.lit(0).as("s"), F.lit("und").as("n")),
        (acc, p) => F.when(p.getField("s") > acc.getField("s"), p)
          .otherwise(acc))
      .getField("n")
  }

  /** Overlapping word n-grams as an array column ("a b c", "b c d", …).
    * Row-local; empty array when the document has fewer than n tokens
    * (guarded — `sequence` would otherwise run DESCENDING for a negative
    * span and fabricate grams). */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val starts = F.size(toks) - (n - 1)
    F.when(starts >= 1,
        F.transform(F.sequence(F.lit(1), starts),
          i => F.concat_ws(" ", F.slice(toks, i, F.lit(n)))))
      .otherwise(F.array().cast("array<string>"))
  }

  /** Gopher-style repetition signal: the fraction of word n-grams that
    * are repeats of an earlier n-gram in the SAME document
    * (1 − distinct/total). Templated or looping machine text scores
    * high; natural prose stays near 0. Row-local (no shuffle, no join) —
    * at 100 TB this is a map-only scan, and it composes with any
    * cube filter as a quality selector. Backed by the one-pass
    * codegen'd [[graft.functions.NgramStats]] (the declarative
    * array form was interpreted and quadratic per row). */
  def dupNgramFraction(text: Column, n: Int): Column = {
    val st = graft.functions.NgramStats(text, n)
    val total = st.getField("total")
    F.when(total > 0,
        F.round(F.lit(1.0) -
          st.getField("distinct").cast("double") / total, 6))
      .otherwise(F.lit(0.0))
  }

  /** Most-repeated n-gram coverage (the other Gopher axis): occurrences
    * of the modal n-gram over total n-grams. A doc that is one phrase
    * stamped 50 times scores ~1.0 even when pairwise-distinct grams keep
    * [[dupNgramFraction]] moderate. Same one-pass
    * [[graft.functions.NgramStats]] backing. */
  def topNgramCoverage(text: Column, n: Int): Column = {
    val st = graft.functions.NgramStats(text, n)
    val total = st.getField("total")
    F.when(total > 0,
        F.round(st.getField("top").cast("double") / total, 6))
      .otherwise(F.lit(0.0))
  }

  /** Sliding-window document chunking for context-window training prep:
    * array of struct(idx, chunk, n_tokens), window `sizeTokens` tokens
    * advancing by `stride` (= size − overlap). Chunk starts run 0,
    * stride, 2·stride… up to the FIRST window reaching the end of the
    * doc — every token is covered, the final chunk may be short, and no
    * redundant trailing sub-window (fully contained in its predecessor)
    * is emitted; a doc at or under one window yields exactly one chunk.
    * Row-local (no shuffle): total work per doc is n·(size/stride) — a
    * constant overlap factor over the token count, never quadratic.
    * Explode the result for the one-row-per-chunk training shape.
    */
  def chunks(text: Column, sizeTokens: Int, stride: Int): Column = {
    require(sizeTokens > 0, s"chunk size must be positive, got $sizeTokens")
    require(stride > 0 && stride <= sizeTokens,
      s"stride must be in 1..sizeTokens, got $stride")
    val toks = tokens(text)
    val n = F.size(toks)
    // last start = stride * ceil((n - size) / stride), floored at 0
    val over = F.greatest(n - F.lit(sizeTokens), F.lit(0))
    val maxStart =
      F.floor((over + F.lit(stride - 1)) / F.lit(stride)).cast("int") * stride
    // NULL text → NULL (explode then drops the row, matching a SQL
    // mirror where NULL propagates through the window math); without
    // the guard, greatest() skips the null size and fabricates one
    // empty chunk
    F.when(text.isNotNull,
      F.transform(
        F.sequence(F.lit(0), maxStart, F.lit(stride)),
        s => {
          val piece = F.slice(toks, s + 1, F.lit(sizeTokens))
          F.struct(
            (s / stride).cast("int").as("idx"),
            F.concat_ws(" ", piece).as("chunk"),
            F.size(piece).as("n_tokens"))
        }))
  }

  /** Order-sensitive content fingerprint: polynomial rolling hash (custom
    * codegen'd expression) of the lowercase-collapsed text. */
  def rollingFingerprint(text: Column): Column =
    PolyHash64(F.regexp_replace(F.lower(text), "\\s+", " "))

  /** Canonical md5 fingerprint of the normalized text (see
    * [[Dedup.normalizedFingerprint]] for the bag-of-words variant). */
  def md5Fingerprint(text: Column): Column =
    F.md5(F.regexp_replace(F.lower(F.trim(text)), "\\s+", " "))

  // ---- C4 line-level cleanup (Raffel et al. 2020, arXiv 1910.10683 §2.2)

  /** The C4 line-keep predicate: a line survives iff it ends in
    * terminal punctuation, has at least five whitespace words, and
    * does not mention javascript (case-insensitive). Row-local — a
    * higher-order `filter` over the split lines, map-only at any SF. */
  def c4LineKeep(line: Column): Column =
    F.trim(line).rlike("[.!?]$") &&
      F.size(F.split(F.trim(line), "\\s+")) >= 5 &&
      !F.lower(line).contains("javascript")

  /** C4-style cleanup as one map-only projection: per document, the
    * line counts before/after the line filter, the page-level keep
    * verdict (≥3 surviving lines, no "lorem ipsum", no curly brace —
    * the C4 page rules), and the cleaned text (surviving lines
    * re-joined). Zero shuffles: every rule is a function of the one
    * row. */
  def c4Clean(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    // staged like [[profile]]: the line split and the per-line keep
    // filter (a regex per line) each evaluate ONCE, instead of the
    // filter running 3× per row (n_kept, the page verdict, and the
    // re-joined text all referenced it). Same formulas, same output.
    docs.select(idCol.as("doc_id"), textCol.as("__text"),
        F.split(textCol, "\n").as("__lines"))
      .select(F.col("doc_id"), F.col("__text"), F.col("__lines"),
        F.filter(F.col("__lines"), l => c4LineKeep(l)).as("__kept"))
      .select(
        F.col("doc_id"),
        F.size(F.col("__lines")).as("n_lines"),
        F.size(F.col("__kept")).as("n_kept"),
        (F.size(F.col("__kept")) >= 3 &&
          !F.lower(F.col("__text")).contains("lorem ipsum") &&
          !F.col("__text").contains("{")).as("kept_doc"),
        F.array_join(F.col("__kept"), "\n").as("text_clean"))

  // ---- Gopher quality rules (Rae et al. 2021, arXiv 2112.11446 §A1.1)

  /** The Gopher "stop words" — presence of ≥2 is rule G7. (Distinct
    * from [[StopwordsEn]], which feeds the ratio heuristic: this is the
    * published 8-word containment list.) */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher document-quality rule set as ONE map-only projection:
    * per document every published signal, each rule's verdict computed
    * on the ROUNDED signal (so the gate replays bit-for-bit in SQL),
    * and `kept` = the conjunction. Signals/thresholds (defaults = the
    * published values; the ellipsis test is ASCII `...`, and the two
    * repetition axes are the token-fraction adaptations already proven
    * by q114/q121):
    *   G1 n_words ∈ [minWords, maxWords]
    *   G2 mean word length ∈ [3, 10]
    *   G3 symbol-to-word ratio (# and ...) ≤ 0.1
    *   G4 fraction of lines starting with a bullet ≤ 0.1
    *   G5 fraction of lines ending in ... ≤ 0.3
    *   G6 fraction of words with an alphabetic char ≥ 0.8
    *   G7 ≥ 2 distinct Gopher stop words present
    *   G8 top 2-gram coverage ≤ 0.2
    *   G9 duplicate 3-gram fraction ≤ 0.3
    * Row-local like [[c4Clean]] — zero shuffles at any SF. */
  def gopherRules(docs: DataFrame, idCol: Column, textCol: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.1,
      maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2, maxTop2Cov: Double = 0.2,
      maxDup3Frac: Double = 0.3): DataFrame = {
    // staged like [[profile]]: the token/line arrays materialize ONCE
    // in a first projection instead of re-splitting inside every
    // signal's codegen-fallback higher-order function (the flat form
    // recomputed `split(trim(text))` 4× and the line split 3× per
    // row — at 100 TB the gate is a map-only scan, so per-row work IS
    // its cost). Signal formulas and rounding are byte-identical.
    val toks = F.col("__toks")
    val lines = F.col("__lines")
    val nWords = F.size(toks)
    val nLines = F.size(lines)
    val nHash = F.length(F.col("__text")) -
      F.length(F.regexp_replace(F.col("__text"), "#", ""))
    val nEllipsis = (F.length(F.col("__text")) -
      F.length(F.regexp_replace(F.col("__text"), "\\.\\.\\.", ""))) / 3
    val stopHits = F.size(F.filter(F.array_distinct(F.col("__ltoks")),
      t => t.isin(GopherStopwords: _*)))
    docs.select(
      idCol.as("doc_id"), textCol.as("__text"),
      tokens(textCol).as("__toks"),
      tokens(F.lower(textCol)).as("__ltoks"),
      F.split(textCol, "\n").as("__lines"))
    .select(
      F.col("doc_id"),
      nWords.as("n_words"),
      F.round(
        F.aggregate(toks, F.lit(0L), (acc, t) => acc + F.length(t))
          .cast("double") / F.greatest(nWords, F.lit(1)), 6)
        .as("mean_word_len"),
      F.round((nHash + nEllipsis).cast("double") /
        F.greatest(nWords, F.lit(1)), 6).as("symbol_ratio"),
      F.round(F.size(F.filter(lines, l => F.trim(l).rlike("^[-*•]")))
        .cast("double") / F.greatest(nLines, F.lit(1)), 6).as("bullet_frac"),
      F.round(F.size(F.filter(lines, l => F.trim(l).rlike("\\.\\.\\.$")))
        .cast("double") / F.greatest(nLines, F.lit(1)), 6).as("ellipsis_frac"),
      F.round(F.size(F.filter(toks, t => t.rlike("[A-Za-z]")))
        .cast("double") / F.greatest(nWords, F.lit(1)), 6).as("alpha_frac"),
      stopHits.as("stop_hits"),
      topNgramCoverage(F.col("__text"), 2).as("top2_cov"),
      dupNgramFraction(F.col("__text"), 3).as("dup3_frac"))
    .withColumn("kept",
      F.col("n_words") >= minWords && F.col("n_words") <= maxWords &&
        F.col("mean_word_len") >= minMeanLen &&
        F.col("mean_word_len") <= maxMeanLen &&
        F.col("symbol_ratio") <= maxSymbolRatio &&
        F.col("bullet_frac") <= maxBulletFrac &&
        F.col("ellipsis_frac") <= maxEllipsisFrac &&
        F.col("alpha_frac") >= minAlphaFrac &&
        F.col("stop_hits") >= minStopHits &&
        F.col("top2_cov") <= maxTop2Cov &&
        F.col("dup3_frac") <= maxDup3Frac)
  }

  // ---- tf-idf term weighting ---------------------------------------

  /** Per-document top-k terms by tf-idf (the smooth-idf formulation:
    * idf = ln((1+N)/(1+df)) + 1, so corpus-universal terms still get
    * weight 1·tf and nothing divides by zero). Scale shape: one hash
    * aggregation to (doc, term) counts — shuffle ∝ distinct doc-term
    * pairs, map-side combined — then document frequency DERIVED from
    * those rows (never a second corpus scan), a join back on `term`,
    * the broadcast 1-row corpus size, and a per-doc top-k window.
    * Ties break on the ROUNDED score then term, so the ranking is
    * identical across engines. */
  def tfIdfTopTerms(docs: DataFrame, idCol: Column, textCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"tfIdfTopTerms needs k >= 1, got $k")
    val tf = docs.select(idCol.as("doc_id"),
        F.explode(Dedup.tokens(F.lower(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(F.count(F.lit(1)).as("tf"))
    // each tf row IS a distinct (doc, term) pair: count per term = df
    val dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).as("df"))
    val n = docs.agg(F.count(F.lit(1)).cast("double").as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(F.col("score").desc, F.col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(n)
      .withColumn("score", F.round(F.col("tf") *
        (F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df"))) +
          1.0), 6))
      .withColumn("rnk", F.row_number().over(w))
      .filter(F.col("rnk") <= k)
      .select("doc_id", "term", "tf", "df", "score", "rnk")
  }

  /** One-stop profile projection for a documents table.
    *
    * STAGED on purpose (guide §1.2's per-task work): the signal
    * formulas all derive from the same token arrays, and composing
    * them as independent Column functions re-embedded
    * `split(trim(text))` / `split(trim(lower(text)))` ~20× per row in
    * one giant projection — each copy inside a codegen-fallback
    * higher-order function, so neither whole-stage codegen's
    * subexpression elimination nor CollapseProject deduplicated
    * anything. The arrays now materialize ONCE in a first projection
    * (CollapseProject keeps the boundary: the aliases are referenced
    * many times and split is not cheap), the signals read them, and
    * the composite quality score reads the ROUNDED sibling signals in
    * a third stage — the identical arithmetic on identical inputs,
    * bit-for-bit (quality always consumed the rounded ratios). */
  def profile(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val toks = F.col("__toks")
    val nToks = F.size(toks)
    val staged = df.select(
        idCol.as("doc_id"), textCol.as("__text"),
        tokens(textCol).as("__toks"),
        tokens(F.lower(textCol)).as("__ltoks"))
      .select(
        F.col("doc_id"),
        nToks.as("n_tokens"),
        subwordCount(F.col("__text")).as("n_subwords"),
        F.length(F.col("__text")).as("n_chars"),
        F.round(
          F.aggregate(toks, F.lit(0L), (acc, t) => acc + F.length(t))
            .cast("double") / F.greatest(nToks, F.lit(1)), 6)
          .as("avg_token_len"),
        punctRatio(F.col("__text")).as("punct_ratio"),
        F.round(
          F.size(F.filter(toks, t => t.isin(StopwordsEn: _*))).cast("double") /
            F.greatest(nToks, F.lit(1)), 6).as("stopword_ratio"),
        langIdFromTokens(F.col("__ltoks")).as("lang_pred"),
        md5Fingerprint(F.col("__text")).as("fingerprint"))
    staged.select(
      F.col("doc_id"), F.col("n_tokens"), F.col("n_subwords"),
      F.col("n_chars"), F.col("avg_token_len"), F.col("punct_ratio"),
      F.col("stopword_ratio"),
      F.round(
        F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0)) * 0.5 +
          (F.lit(1.0) - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.3 +
          F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.2, 6)
        .as("quality"),
      F.col("lang_pred"), F.col("fingerprint"))
  }
}
