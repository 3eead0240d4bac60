package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.storage.StorageLevel

/** In-engine BPE merge TRAINING (Sennrich et al. 2016, arXiv:1508.07909)
  * — the other half of the tokenizer story: [[TextAnalysis.subwordTokens]]
  * applies a FIXED vocabulary; this learns the merge table from the
  * corpus itself.
  *
  * Scale shape — the reason this trains on 100 TB: BPE statistics
  * depend only on the WORD-FREQUENCY table, so the corpus is touched
  * exactly once (one hash aggregation, map-side combined; output ∝
  * distinct words, not corpus size). Every merge round then runs on
  * that compact table: one pair-count aggregation (shuffle ∝ distinct
  * pairs) + a 1-row argmax to the driver + a row-local merge rewrite.
  * The driver holds only the merge TABLE (nMerges rows) — never corpus
  * data. Lineage from the iterated rewrites is cut by periodic
  * localCheckpoint, the same discipline as the connected-components
  * loop ([[Dedup.nearDupClusters]]).
  *
  * Determinism: the winning pair per round is (count DESC, a ASC,
  * b ASC) — total order, so the learned table is a pure function of
  * the corpus, reproducible by any engine (q168's DuckDB oracle
  * replays every round end-to-end).
  *
  * Symbol model: a word's symbols start as its characters; no
  * end-of-word marker (documented simplification — the operator shape
  * is identical with one, and the oracle replays this exact form).
  */
object Bpe {

  /** (word, cnt, sym): the word-frequency table with initial
    * character symbols — the ONLY corpus-wide aggregation. */
  def wordFrequencies(corpus: DataFrame, text: Column): DataFrame =
    corpus.select(F.explode(Dedup.tokens(F.lower(text))).as("word"))
      .filter(F.col("word") =!= "")
      .groupBy("word").agg(F.count(F.lit(1)).as("cnt"))
      .withColumn("sym", F.split(F.col("word"), ""))

  /** One greedy left-to-right merge pass: every non-overlapping
    * adjacent (a, b) in `sym` becomes the single symbol a+b. Row-local
    * fold over the symbol array (codegen'd, no UDF): state carries the
    * rebuilt array plus a skip flag for the consumed right element. */
  def applyMerge(sym: Column, a: String, b: String): Column = {
    val n = F.size(sym)
    val zero = F.struct(
      F.array().cast("array<string>").as("out"), F.lit(false).as("skip"))
    val folded = F.aggregate(
      F.sequence(F.lit(1), n),
      zero,
      (st, i) => {
        val cur = F.element_at(sym, i)
        val nxt = F.try_element_at(sym, i + 1) // null on the last symbol
        F.when(st.getField("skip"),
            F.struct(st.getField("out").as("out"), F.lit(false).as("skip")))
          .otherwise(F.when(cur === a && nxt === b,
            F.struct(
              F.concat(st.getField("out"), F.array(F.lit(a + b))).as("out"),
              F.lit(true).as("skip")))
          .otherwise(F.struct(
            F.concat(st.getField("out"), F.array(cur)).as("out"),
            F.lit(false).as("skip"))))
      },
      st => st.getField("out"))
    F.when(n >= 2, folded).otherwise(sym)
  }

  /** The ranked adjacent-pair count frame over a symbolized
    * word-frequency table — ONE definition shared by the sequential
    * and batched trainers, because its total order (count DESC, a ASC,
    * b ASC) IS the cross-engine determinism contract q168 replays:
    * forking it would silently fork the two schedules. */
  private def rankedPairs(wf: DataFrame): DataFrame =
    wf.select(F.col("cnt"),
        F.explode(F.zip_with(
          F.slice(F.col("sym"), F.lit(1), F.size(F.col("sym")) - 1),
          F.slice(F.col("sym"), F.lit(2), F.size(F.col("sym")) - 1),
          (x, y) => F.struct(x.as("a"), y.as("b")))).as("p"))
      .groupBy(F.col("p.a").as("a"), F.col("p.b").as("b"))
      .agg(F.sum(F.col("cnt")).as("c"))
      .orderBy(F.col("c").desc, F.col("a").asc, F.col("b").asc)

  /** Learn `nMerges` merge rules from the corpus. Returns the ranked
    * merge table; stops early when no pair reaches `minCount`. */
  def trainMerges(corpus: DataFrame, text: Column, nMerges: Int,
      minCount: Long = 2, checkpointEvery: Int = 4): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be positive, got $nMerges")
    var wf = wordFrequencies(corpus, text)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val pairs = rankedPairs(wf).limit(1).collect()
      if (pairs.isEmpty || pairs(0).getLong(2) < minCount) done = true
      else {
        val (a, b) = (pairs(0).getString(0), pairs(0).getString(1))
        merges += ((a, b))
        val next = wf.withColumn("sym", applyMerge(F.col("sym"), a, b))
        val cut = // bound the fold-upon-fold lineage like the CC loop
          if ((round + 1) % checkpointEvery == 0) next.localCheckpoint(true)
          else next.persist(StorageLevel.MEMORY_AND_DISK)
        cut.count() // materialize before dropping the parent
        wf.unpersist()
        wf = cut
        round += 1
      }
    }
    wf.unpersist()
    merges.toSeq
  }

  /** Batched trainer — the wall-clock fix for [[trainMerges]]'s
    * one-driver-round-per-merge shape (a production 32k-merge
    * vocabulary is 32k sequential Spark jobs there; data-scale is
    * fine, latency is not). Each round ranks pairs by the SAME total
    * order (count DESC, a ASC, b ASC), collects the top `batchK`, and
    * applies — in rank order — the greedy prefix of MUTUALLY
    * NON-INTERACTING pairs: no symbol shared with an already-selected
    * pair, nor with a symbol an already-selected merge creates. This
    * is the standard fast-BPE batching trick. Disjointness makes every
    * selected pair's count invariant under the batch's earlier merges,
    * so the batched schedule EQUALS the sequential one whenever no
    * newly-created pair would have outranked the batch mid-way
    * (CurateSpec's property test pins the equality on non-interacting
    * corpora and on the interacting 'abab' fixture); where one would,
    * the batched table is the documented approximation fast BPE
    * trainers ship. Rounds shrink to ≈ nMerges/batchK with per-round
    * cost unchanged (one pair aggregation + one k-row collect + one
    * chained row-local rewrite).
    * Returns (ranked merge table, rounds executed). */
  def trainMergesBatched(corpus: DataFrame, text: Column, nMerges: Int,
      minCount: Long = 2, batchK: Int = 16, checkpointEvery: Int = 4)
      : (Seq[(String, String)], Int) = {
    require(nMerges >= 1, s"nMerges must be positive, got $nMerges")
    require(batchK >= 1, s"batchK must be positive, got $batchK")
    var wf = wordFrequencies(corpus, text)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (merges.size < nMerges && !done) {
      val top = rankedPairs(wf).limit(batchK).collect()
        .filter(_.getLong(2) >= minCount)
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        for (r <- top if merges.size + batch.size < nMerges) {
          val (a, b) = (r.getString(0), r.getString(1))
          // interaction check includes the CREATED symbol: a+b may
          // collide with a symbol an earlier round already minted
          if (!used(a) && !used(b)) {
            batch += ((a, b))
            used ++= Seq(a, b, a + b)
          }
        }
        merges ++= batch
        val next = batch.foldLeft(wf)((df, m) =>
          df.withColumn("sym", applyMerge(F.col("sym"), m._1, m._2)))
        val cut =
          if ((round + 1) % checkpointEvery == 0) next.localCheckpoint(true)
          else next.persist(StorageLevel.MEMORY_AND_DISK)
        cut.count()
        wf.unpersist()
        wf = cut
        round += 1
      }
    }
    wf.unpersist()
    (merges.toSeq, round)
  }

  /** Encode text with a learned merge table: characters of each
    * lowercase word, merges applied in rank order (the standard BPE
    * inference simplification: rank order, one greedy pass each — and
    * exactly what the training loop itself does, so train-then-encode
    * of the training corpus reproduces the final training symbols).
    * Returns array<array<string>> — per word, its subword symbols.
    * Row-local: cost ∝ tokens × merges, no shuffle. */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    F.transform(Dedup.tokens(F.lower(text)), w => {
      val chars = F.split(w, "")
      merges.foldLeft(chars) { case (sym, (a, b)) => applyMerge(sym, a, b) }
    })
}
