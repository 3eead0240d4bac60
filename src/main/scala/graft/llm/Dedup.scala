package graft.llm

import graft.functions.{SimHash64, WordShingles}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Document deduplication for training-data pipelines, designed for the
  * 100 TB shape: every method is shuffle-bounded by candidate pairs (LSH
  * bucketing), never all-pairs. Signatures are computed row-local (no
  * explode of shingles through a shuffle), so the only wide exchanges are
  * the bucket join and the final pair-dedup.
  */
object Dedup {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = F.split(F.trim(text), "\\s+")

  /** Distinct word k-shingles ("w1 w2 w3"), via the single-pass codegen'd
    * [[WordShingles]] expression. Documents shorter than k tokens yield an
    * empty array. */
  def shingles(text: Column, k: Int = 3): Column =
    WordShingles(tokens(text), k)

  /** Exact-duplicate groups by raw text hash: (fingerprint, keep_id = min
    * id, n_copies). Hash-groupBy — one shuffle on the 128-bit digest, the
    * canonical exact-dedup at any scale. */
  def exactDuplicateGroups(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(F.md5(textCol.cast("string")).as("fingerprint"))
      .agg(F.min(idCol).as("keep_id"), F.count(F.lit(1)).as("n_copies"))

  /** Order-insensitive normal form: lowercase, strip non-alnum, collapse
    * whitespace, sort the token multiset — catches shuffled/reformatted
    * copies that raw-hash dedup misses. */
  def normalizedFingerprint(text: Column): Column = {
    val norm = F.regexp_replace(
      F.regexp_replace(F.lower(text), "[^a-z0-9 ]", " "), "\\s+", " ")
    F.md5(F.concat_ws(" ", F.array_sort(F.split(F.trim(norm), " "))))
  }

  /** MinHash signatures for (id, sh: array<string>) docs → (id, mh:
    * array<long>).
    *
    * Row-local: the codegen'd [[graft.functions.MinHashSig]] expression
    * hashes each shingle once and folds all k affine permutations in a
    * single pass, so signing is shuffle-FREE — the only exchange in
    * MinHash dedup is the band join. (History: k nested
    * `transform`/`array_min` higher-order calls evaluate interpreted and
    * bench ~10× slower; the earlier explode → codegen'd xxhash64 →
    * map-side-combined min-aggregate was exchange-bound on corpus ×
    * shingles rows. The custom expression computes the identical
    * signatures with neither cost.) */
  def minHashSignatures(docs: DataFrame, numHashes: Int = 32, seed: Long = 1234L): DataFrame =
    docs.select(F.col("id"),
      graft.functions.MinHashSig(F.col("sh"), numHashes, seed).as("mh"))

  /** MinHash + LSH candidate pairs with exact-Jaccard verification.
    *
    * numHashes = bands × rowsPerBand. Each doc emits `bands` (band_idx,
    * band_hash) keys; the bucket self-join finds docs agreeing on ANY full
    * band — shuffle is by band key, proportional to corpus size, not n².
    * Candidates are then verified with exact Jaccard over the shingle
    * sets, so the threshold is exact, LSH only bounds recall.
    *
    * Band count: 16 bands × 2 rows keeps the per-pair structural miss
    * probability at the 0.8 threshold near 1e-7 (vs ~1.5% at 8×4), so
    * recall is corpus-independent, not fixture luck; the exact verify
    * absorbs the extra low-similarity candidates 2-row bands admit.
    *
    * Skew note for 100 TB: candidate count is quadratic in the size of a
    * bucket, so a corpus with millions of IDENTICAL documents makes one
    * bucket explode. Run [[exactDuplicateGroups]] first and near-dup only
    * the keep-list — exact copies are cheaper to remove by hash. Residual
    * hot buckets (near-identical boilerplate surviving exact dedup) are
    * split deterministically by the band-key salting in
    * [[bandCandidates]] — AQE's byte-based skew-join does NOT catch them,
    * because identical-key rows compress away in shuffle.
    *
    * Returns (a_id, b_id, jaccard) with a_id < b_id.
    */
  def minHashPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 16,
      threshold: Double = 0.8,
      seed: Long = 1234L,
      saltThreshold: Int = 4096,
      salts: Int = 16,
      sampleMod: Int = 64): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val docSh = df.select(idCol.as("id"), shingles(textCol, shingleK).as("sh"))
      .filter(F.size(F.col("sh")) > 0)
    bandCandidates(docSh, numHashes, bands, seed, saltThreshold, salts, sampleMod)
      .withColumn("jaccard",
        F.size(F.array_intersect(F.col("a_sh"), F.col("b_sh"))).cast("double") /
          F.size(F.array_union(F.col("a_sh"), F.col("b_sh"))))
      .filter(F.col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** MinHash-banded candidate pairs for (id, sh: array<any>) docs: sign,
    * band, bucket-self-join. Only (id, band-key) flows through the wide
    * exchanges — the shingle arrays stay behind and are re-attached per
    * candidate afterwards (candidates ≪ corpus; carrying arrays through
    * the band join is what hurts at scale). Returns distinct (a_id, b_id,
    * a_sh, b_sh) with a_id < b_id, ready for an exact verify.
    *
    * Hot-bucket salting: a band bucket of near-identical boilerplate docs
    * concentrates |B|² candidate work on ONE reducer, and AQE's skew-join
    * cannot see it — identical-key rows compress ~50× in shuffle, so the
    * hot partition's BYTES (what AQE measures) stay unremarkable while
    * its row count (what makes the reducer quadratic) explodes (measured
    * in LlmSpec + BASELINE.md). So the split is done deterministically
    * here instead: a hash-sampled probe over the already-signed banded
    * frame — 1/`sampleMod` of its (id, band-key) rows, chosen by
    * xxhash64(id, bk), reproducible on recompute (rand() sampling could
    * flag different buckets on the two join branches and lose pairs),
    * and costing one cheap pass over the shared exchange, no extra
    * signing — counts bucket memberships; buckets whose extrapolated
    * size exceeds
    * `saltThreshold` get their A-side rows salted into `salts` sub-keys
    * by id-hash, with the B side replicated across all salts — every
    * cross pair still meets exactly once, at the A row's salt. Cold
    * buckets keep salt 0 and pay nothing; detection is a perf heuristic
    * only (a missed hot bucket = the status quo, a false positive = a
    * few replicated rows), never a correctness input. */
  /** The (band, band_hash) key columns over an `mh` signature column —
    * shared by [[bandCandidates]], [[bandIndex]] and the arrival side of
    * [[nearDupScreen]] so index and probe can never band differently. */
  private def bandKeyCols(numHashes: Int, bands: Int): Seq[Column] = {
    val r = numHashes / bands
    (0 until bands).map { bIdx =>
      F.struct(
        F.lit(bIdx).as("band"),
        F.xxhash64(F.concat_ws("_",
          (0 until r).map(j => F.col("mh").getItem(bIdx * r + j)): _*)).as("bh"))
    }
  }

  /** (id, sh) projection with empty-shingle docs dropped — the common
    * head of every MinHash path, and the frame a production pipeline
    * materializes alongside [[bandIndex]] for [[nearDupScreen]]. */
  def shingleDocs(df: DataFrame, idCol: Column, textCol: Column,
      shingleK: Int = 3): DataFrame =
    df.select(idCol.as("id"), shingles(textCol, shingleK).as("sh"))
      .filter(F.size(F.col("sh")) > 0)

  private def bandCandidates(
      docSh: DataFrame, numHashes: Int, bands: Int, seed: Long,
      saltThreshold: Int = 4096, salts: Int = 16, sampleMod: Int = 64): DataFrame = {
    // salts = 0 would make the A-side salt pmod(x, 0) = NULL while the B
    // side explodes sequence(0, -1) = [0, -1]: the join silently drops
    // every hot-bucket pair — exactly what "never a correctness input"
    // forbids, so reject loudly
    require(salts > 0, s"salts must be positive, got $salts")
    require(sampleMod > 0, s"sampleMod must be positive, got $sampleMod")
    require(saltThreshold > 0, s"saltThreshold must be positive, got $saltThreshold")
    val bandCols = bandKeyCols(numHashes, bands)
    // signature is a row-local projection (MinHashSig) — joining the
    // frame with its own signature projection would add a pointless
    // SMJ + two exchanges (a leftover from the pre-expression design).
    // The explicit repartition pins ONE exchange that all three
    // consumers below (A side, B side, probe) canonicalize to and
    // REUSE, so the corpus is scanned, shingled and signed exactly once
    // however many branches read the banded frame. It deliberately
    // partitions by id, NOT bk: a bk-partitioning would satisfy the
    // salted join's (bk, __salt) clustering via the subset rule, Spark
    // would skip the salted exchange, and the hot bucket would land on
    // one reducer again — exactly what the salt exists to prevent.
    val banded = docSh.select(F.col("id"),
        graft.functions.MinHashSig(F.col("sh"), numHashes, seed).as("mh"))
      .select(F.col("id"), F.explode(F.array(bandCols: _*)).as("bk"))
      .repartition(F.col("id"))
    // deterministic sampled bucket-size probe over the shared exchange:
    // 1/sampleMod of rows feed a map-side-combined count, so the probe
    // costs one cheap pass, no extra signing; hot buckets are few by
    // definition (≤ corpus*bands/saltThreshold), so broadcast
    val hot = banded
      .filter(F.pmod(F.xxhash64(F.col("id"), F.col("bk")), F.lit(sampleMod.toLong)) === 0)
      .groupBy(F.col("bk")).agg(F.count(F.lit(1)).as("__bn"))
      .filter(F.col("__bn") * sampleMod >= saltThreshold)
      .select(F.col("bk"), F.lit(true).as("__hot"))
    val flagged = banded.join(F.broadcast(hot), Seq("bk"), "left")
    val aSide = flagged.select(F.col("id").as("a_id"), F.col("bk"),
      F.when(F.col("__hot"),
          F.pmod(F.xxhash64(F.col("id")), F.lit(salts.toLong)))
        .otherwise(F.lit(0L)).as("__salt"))
    val bSide = flagged.select(F.col("id").as("b_id"), F.col("bk"),
      F.explode(F.when(F.col("__hot"),
          F.sequence(F.lit(0L), F.lit(salts.toLong - 1)))
        .otherwise(F.array(F.lit(0L)))).as("__salt"))
    aSide.join(bSide, Seq("bk", "__salt"))
      .filter(F.col("a_id") < F.col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id") // same pair may collide in many bands
      .join(docSh.select(F.col("id").as("a_id"), F.col("sh").as("a_sh")), "a_id")
      .join(docSh.select(F.col("id").as("b_id"), F.col("sh").as("b_sh")), "b_id")
  }

  /** Slim (bk, id) MinHash band index of a corpus, for ingestion-time
    * screening ([[nearDupScreen]]). Deliberately WITHOUT shingle arrays:
    * at 100 TB the index is materialized to parquet once by a batch job
    * and re-read every screening micro-batch, so each row must stay a
    * few bytes — candidate verification re-attaches shingles from the
    * corpus side afterwards (candidates ≪ corpus), the same
    * arrays-stay-out-of-the-wide-exchange discipline as
    * [[bandCandidates]]. */
  def bandIndex(corpus: DataFrame, idCol: Column, textCol: Column,
      shingleK: Int = 3, numHashes: Int = 32, bands: Int = 16,
      seed: Long = 1234L): DataFrame =
    shingleDocs(corpus, idCol, textCol, shingleK)
      .select(F.col("id"),
        graft.functions.MinHashSig(F.col("sh"), numHashes, seed).as("mh"))
      .select(F.explode(F.array(bandKeyCols(numHashes, bands): _*)).as("bk"),
        F.col("id"))

  /** Materialize a corpus' SCREENING STORE: its band index
    * (`<path>/bands`) and shingle sets (`<path>/shingles`) — the two
    * static sides [[nearDupScreen]] joins, written once per corpus
    * generation. [[graft.streaming.Streaming.screenAndMaintain]]
    * appends admitted arrivals beside them as
    * `bands_delta/batch=<id>` / `shingles_delta/batch=<id>`. */
  def writeBandIndexStore(corpus: DataFrame, idCol: Column, textCol: Column,
      path: String, shingleK: Int = 3, numHashes: Int = 32, bands: Int = 16,
      seed: Long = 1234L): Unit = {
    bandIndex(corpus, idCol, textCol, shingleK, numHashes, bands, seed)
      .write.mode("overwrite").parquet(s"$path/bands")
    shingleDocs(corpus, idCol, textCol, shingleK)
      .write.mode("overwrite").parquet(s"$path/shingles")
  }

  /** The store's two sides — (band index, shingles) — base plus every
    * live-appended delta batch. `excludeBatch` omits one batch id: a
    * REPLAYED micro-batch must screen against the store as its first
    * attempt saw it, not against its own crashed half-write (a doc
    * finding its own bands would flag itself as a jaccard-1 dup). */
  def readBandIndexStore(spark: org.apache.spark.sql.SparkSession,
      path: String, excludeBatch: Option[Long] = None)
      : (DataFrame, DataFrame) = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def side(base: String, delta: String): DataFrame = {
      val b = spark.read.parquet(s"$path/$base")
      val d = new org.apache.hadoop.fs.Path(s"$path/$delta")
      if (!fs.exists(d)) return b
      // exclusion happens at the DIRECTORY level, not as a filter on the
      // inferred partition column: a predicate there needs a type cast
      // (dir names infer int, batch ids are long), the cast defeats
      // partition pruning, and the scan then lists the excluded batch's
      // files — which the replaying writer is about to overwrite
      val kept = fs.listStatus(d).toSeq
        .filter(_.isDirectory).map(_.getPath)
        .filter(p => excludeBatch.forall(id => p.getName != s"batch=$id"))
      if (kept.isEmpty) b
      else b.unionByName(
        spark.read.option("basePath", d.toString)
          .parquet(kept.map(_.toString): _*).drop("batch"))
    }
    (side("bands", "bands_delta"), side("shingles", "shingles_delta"))
  }

  /** Ingestion-time near-dup screening: each arriving document against a
    * fixed historical corpus, returning its BEST corpus match at or above
    * `threshold` — (doc_id, match_id, jaccard), novel docs absent.
    *
    * MODE-AGNOSTIC: `arrivals` may be a batch frame (backfill audit; the
    * DuckDB-oracled registry query q147) or a stream
    * ([[graft.streaming.Streaming.screenArrivals]]): sign + band the
    * arrival row-locally, join the static band index, re-attach both
    * shingle sets, verify with EXACT Jaccard, keep the argmax. As a
    * stream this is a STREAM-STATIC join — stateless, no watermark
    * needed; the only stateful op is the tiny per-doc argmax, and each
    * doc's groups complete within its own micro-batch (update mode).
    *
    * Scale: arrival batches are small next to the corpus, so screening
    * cost per batch is (arrival bands) × index-bucket lookups + exact
    * verifies on candidates. Duplicate (doc, match) candidates from
    * multi-band hits are NOT pre-deduped — a distinct would add a
    * stateful shuffle; the ≤ bands× repeated verifies are row-local and
    * the argmax absorbs them. Recall: at 16 bands × 2 rows the
    * structural miss probability at 0.8 Jaccard is ~1e-7 (see
    * [[minHashPairs]]); the verify keeps precision exact.
    *
    * `index` must come from [[bandIndex]] (same shingleK/numHashes/
    * bands/seed) and `corpusSh` from the same corpus ((id, sh) —
    * [[shingleDocs]] or its materialized parquet). */
  def nearDupScreen(arrivals: DataFrame, idCol: Column, textCol: Column,
      index: DataFrame, corpusSh: DataFrame,
      shingleK: Int = 3, numHashes: Int = 32, bands: Int = 16,
      threshold: Double = 0.8, seed: Long = 1234L): DataFrame = {
    // the arrival's OWN shingles ride along through its band explode —
    // an arrival micro-batch is small, so bands× array duplication on
    // this side is cheap, and re-attaching them by id would be a second
    // join against the stream (stream-stream — unsupported and
    // pointless); only the CORPUS arrays stay behind until candidates
    val arrBanded = shingleDocs(arrivals, idCol, textCol, shingleK)
      .select(F.col("id").as("doc_id"), F.col("sh").as("a_sh"),
        graft.functions.MinHashSig(F.col("sh"), numHashes, seed).as("mh"))
      .select(F.col("doc_id"), F.col("a_sh"),
        F.explode(F.array(bandKeyCols(numHashes, bands): _*)).as("bk"))
    arrBanded
      .join(index.select(F.col("bk"), F.col("id").as("match_id")), "bk")
      .join(corpusSh.select(F.col("id").as("match_id"), F.col("sh").as("b_sh")),
        "match_id")
      .withColumn("jaccard",
        F.size(F.array_intersect(F.col("a_sh"), F.col("b_sh"))).cast("double") /
          F.size(F.array_union(F.col("a_sh"), F.col("b_sh"))))
      .filter(F.col("jaccard") >= threshold)
      .groupBy(F.col("doc_id"))
      // argmax by (jaccard, then LOWEST match id) — deterministic under
      // ties. min_by over (-jaccard, match_id) negates only the DOUBLE
      // score, so the id is compared in its own type: numeric OR string
      // ids both get a well-defined "lowest id wins" (negating a string
      // id would cast to null and silently break determinism).
      .agg(F.min_by(
        F.struct(F.col("match_id"), F.col("jaccard")),
        F.struct((-F.col("jaccard")).as("nj"), F.col("match_id"))).as("best"))
      .select(F.col("doc_id"), F.col("best.match_id").as("match_id"),
        F.round(F.col("best.jaccard"), 6).as("jaccard"))
  }

  /** [[nearDupScreen]] deriving index and corpus shingles from the corpus
    * frame directly (small corpora / tests; production materializes both
    * to parquet). */
  def nearDupScreen(arrivals: DataFrame, corpus: DataFrame,
      idCol: Column, textCol: Column): DataFrame =
    nearDupScreen(arrivals, idCol, textCol,
      bandIndex(corpus, idCol, textCol),
      shingleDocs(corpus, idCol, textCol, shingleK = 3))

  /** Cross-document SPAN duplication — the substring-dedup signal of Lee
    * et al., "Deduplicating Training Data Makes Language Models Better"
    * (arXiv:2107.06499): for each doc, what fraction of its k-token
    * spans also occurs in at least one OTHER document. Boilerplate,
    * licenses, and templated text light up here even when whole-doc
    * near-dup (MinHash) misses them; the full Lee et al. treatment
    * REMOVES the duplicated spans — this emits the per-doc signal a
    * filtering gate thresholds on.
    *
    * Per doc: `n_spans` (k-token span instances), `n_dup_spans` (those
    * whose span text appears in ≥2 distinct docs), `dup_span_frac`.
    * Docs shorter than k tokens report 0 spans, fraction 0.0.
    *
    * Scale shape: one explode → span-key aggregation (map-side
    * combined; key space = distinct spans) → join back → per-doc
    * re-count: two shuffles, no doc×doc work. `hashed = true` (the 100
    * TB default) shuffles 64-bit xxhash64 span keys instead of the span
    * strings — identical answers modulo hash collisions
    * (~n²/2⁶⁵ expected, zero in any real corpus); `false` is the
    * string-keyed exact configuration the DuckDB oracle replays (q152),
    * and LlmSpec asserts the two agree on the fixtures. */
  def crossDocSpanStats(df: DataFrame, idCol: Column, textCol: Column,
      k: Int = 8, hashed: Boolean = true): DataFrame = {
    require(k >= 1, s"span length must be positive, got $k")
    val spanStr = TextAnalysis.wordNgrams(textCol, k)
    val spans = df.select(idCol.as("doc_id"),
        F.explode(spanStr).as("__span"))
      .select(F.col("doc_id"),
        (if (hashed) F.xxhash64(F.col("__span")) else F.col("__span"))
          .as("__key"))
    val docsPerSpan = spans.distinct()
      .groupBy("__key").agg(F.count(F.lit(1)).as("__ndocs"))
    val perDoc = spans.join(docsPerSpan, "__key")
      .groupBy("doc_id")
      .agg(F.count(F.lit(1)).as("n_spans"),
        F.sum(F.when(F.col("__ndocs") > 1, 1L).otherwise(0L)).as("n_dup_spans"))
    // docs with no spans (shorter than k tokens) still get a row
    df.select(idCol.as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(F.col("doc_id"),
        F.coalesce(F.col("n_spans"), F.lit(0L)).as("n_spans"),
        F.coalesce(F.col("n_dup_spans"), F.lit(0L)).as("n_dup_spans"))
      .withColumn("dup_span_frac",
        F.round(F.when(F.col("n_spans") > 0,
          F.col("n_dup_spans").cast("double") / F.col("n_spans"))
          .otherwise(F.lit(0.0)), 6))
  }

  /** Span-level DEDUPLICATION — the full treatment of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better"
    * (arXiv:2107.06499), where [[crossDocSpanStats]] stops at the
    * signal: spans whose text occurs in ≥2 distinct documents are
    * EXCISED from every document except one canonical owner, and the
    * rewritten text is emitted. Boilerplate and license blocks that
    * whole-doc MinHash misses (they sit inside otherwise-distinct docs)
    * are removed instead of merely measured.
    *
    * Policy, per distinct duplicated span text: the doc with the MIN id
    * among those containing it keeps its occurrences (the canonical
    * copy — exactly one doc still carries the text); every other doc
    * removes ALL its occurrences. A doc's hit positions are merged into
    * maximal covered intervals (overlapping and adjacent k-token hits
    * coalesce), and tokens inside any interval are dropped; the
    * rewritten text is the kept tokens joined with single spaces
    * (token-normalizing, like every text op here).
    *
    * Returns one row per input doc: (doc_id, text_clean, n_tokens,
    * n_removed, n_intervals). Docs shorter than k tokens pass through
    * untouched (0 removed).
    *
    * Scale shape: explode → span-key aggregation (map-side combined) →
    * join back → per-doc hit-list aggregation → join to the doc tokens:
    * the wide exchanges are on span keys and doc ids, never doc×doc.
    * Only DUPLICATED span instances survive past the second shuffle, so
    * the hit side is proportional to the duplication actually present.
    * The rewrite itself is row-local: interval merge is a single
    * fold over the sorted hit list, and the token filter tests the
    * MERGED intervals (heavy boilerplate collapses to few intervals, so
    * the per-row cost is tokens × intervals, not tokens × hits).
    * `hashed = true` (default) shuffles 64-bit xxhash64 span keys — the
    * 100 TB path; `false` is the string-keyed configuration the DuckDB
    * oracle replays (q154), and LlmSpec asserts the two agree. */
  def removeDuplicatedSpans(df: DataFrame, idCol: Column, textCol: Column,
      k: Int = 8, hashed: Boolean = true): DataFrame = {
    require(k >= 1, s"span length must be positive, got $k")
    val spans = df.select(idCol.as("doc_id"),
        F.posexplode(TextAnalysis.wordNgrams(textCol, k)))
      .select(F.col("doc_id"), F.col("pos"),
        (if (hashed) F.xxhash64(F.col("col")) else F.col("col")).as("__key"))
    // per span text: is it cross-doc duplicated, and who keeps it
    val owners = spans.groupBy("__key")
      .agg(F.count_distinct(F.col("doc_id")).as("__ndocs"),
        F.min(F.col("doc_id")).as("__keeper"))
      .filter(F.col("__ndocs") >= 2)
    val hits = spans.join(owners, "__key")
      .filter(F.col("doc_id") =!= F.col("__keeper"))
      .groupBy("doc_id").agg(F.collect_list(F.col("pos")).as("__hits"))
    val emptyInts = F.array().cast("array<int>")
    val base = df.select(idCol.as("doc_id"), tokens(textCol).as("__toks"))
    val withHits = base.join(hits, Seq("doc_id"), "left")
      .withColumn("__hs", F.array_sort(F.coalesce(F.col("__hits"), emptyInts)))
    // merge sorted fixed-length hits [p, p+k) into maximal intervals
    val zero = F.transform(emptyInts,
      x => F.struct(x.as("s"), x.as("e")))
    val merged = F.aggregate(F.col("__hs"), zero, (acc, p) => {
      val last = F.element_at(acc, -1)
      F.when(F.size(acc) === 0 || p > last.getField("e"),
          F.concat(acc, F.array(F.struct(p.as("s"), (p + F.lit(k)).as("e")))))
        .otherwise(F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
          F.array(F.struct(last.getField("s").as("s"),
            F.greatest(last.getField("e"), p + F.lit(k)).as("e")))))
    })
    withHits.withColumn("__iv", merged)
      .withColumn("__kept", F.filter(F.col("__toks"), (tok, j) =>
        !F.exists(F.col("__iv"), iv =>
          iv.getField("s") <= j && j < iv.getField("e"))))
      .select(F.col("doc_id"),
        F.concat_ws(" ", F.col("__kept")).as("text_clean"),
        F.size(F.col("__toks")).cast("long").as("n_tokens"),
        (F.size(F.col("__toks")) - F.size(F.col("__kept"))).cast("long")
          .as("n_removed"),
        F.size(F.col("__iv")).cast("long").as("n_intervals"))
  }

  /** Connected components over a near-dup PAIR graph — the transitive-
    * closure step between pairwise dedup ([[minHashPairs]] etc.) and a
    * keep-list: near-dup is not transitive, but dropping all-but-one per
    * component is the standard corpus-dedup policy (one representative
    * per chain a∼b∼c even when a≁c directly).
    *
    * Algorithm: min-label propagation with POINTER JUMPING — each round
    * (1) every vertex takes the min label over itself and its
    * neighbors, (2) labels chase their own label's label (path
    * halving). The jump step is what makes long chains collapse in
    * O(log n) rounds instead of O(diameter) (the CC-MR / large-star
    * family); each round is two hash-join shuffles over (edges,
    * labels), and the checkpoint cuts the iterative lineage so round
    * k doesn't replay rounds 1..k-1. Deterministic: labels are ids,
    * min is order-free. Convergence is checked WITHOUT an extra join
    * job: each round carries its starting label alongside the new one
    * through the checkpoint, so "did anything change" is a scalar
    * aggregation over the already-materialized frame — two jobs per
    * round total (checkpoint + scalar), not three. `maxIters` (default
    * 25 ⇒ graphs of diameter ≫ 2²⁵ would be required to exhaust it) is
    * a safety rail; overrun raises rather than returning half-merged
    * components.
    *
    * 100 TB hardening knobs, both default-off so the fixture-scale
    * behavior (q150's oracle) is unchanged:
    * - `reliableCheckpoint = true` swaps `localCheckpoint` (executor-
    *   local blocks — an executor loss mid-iteration kills the
    *   lineage-cut state and the job) for reliable `checkpoint` to the
    *   configured checkpoint dir (`sc.setCheckpointDir` first).
    * - `hubSalt > 1` bounds the jump join's per-reducer fan-in: in a
    *   corpus with one giant near-dup component, every member row
    *   carries the SAME label key and the label-chase join lands the
    *   whole component on one reducer. Salting replicates the parent
    *   side `hubSalt`× and routes probes by xxhash64(id) — the
    *   deterministic-salt discipline of [[bandCandidates]], trading a
    *   bounded replication for an even spread. (The large-star/
    *   small-star edge-rewriting family solves the same skew by
    *   shrinking edges instead; at this operator's input — near-dup
    *   pairs AFTER exact dedup — components are boilerplate families,
    *   and salting the chase is the cheaper fix.)
    *
    * Returns (doc_id, cluster_id = min id reachable); only ids that
    * appear in `pairs`. Keep-list policy: keep `cluster_id == doc_id`
    * (the representative) plus every doc absent from `pairs`. */
  def nearDupClusters(pairs: DataFrame, maxIters: Int = 25,
      reliableCheckpoint: Boolean = false, hubSalt: Int = 1): DataFrame = {
    require(hubSalt >= 1, s"hubSalt must be positive, got $hubSalt")
    def cut(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(true) else df.localCheckpoint(true)
    val edges = pairs.select(F.col("a_id").as("src"), F.col("b_id").as("dst"))
      .union(pairs.select(F.col("b_id").as("src"), F.col("a_id").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = cut(edges.select(F.col("src").as("id")).distinct()
        .select(F.col("id"), F.col("id").as("label")))
      var iter = 0
      var converged = false
      while (!converged && iter < maxIters) {
        // (1) min over self ∪ neighbors; the round's starting label
        // rides along as __old for the post-checkpoint convergence scan
        val viaNbr = edges
          .join(labels.withColumnRenamed("id", "src"), "src")
          .groupBy(F.col("dst").as("id"))
          .agg(F.min(F.col("label")).as("__nbr_min"))
        val stepped = labels.join(viaNbr, Seq("id"), "left")
          .select(F.col("id"), F.col("label").as("__old"),
            F.least(F.col("label"), F.coalesce(F.col("__nbr_min"), F.col("label")))
              .as("label"))
        // (2) pointer jump: label <- label(label)
        val parents = stepped.select(F.col("id").as("__pid"),
          F.col("label").as("__plabel"))
        val chased =
          if (hubSalt == 1)
            stepped.join(parents, stepped("label") === parents("__pid"), "left")
          else {
            val probe = stepped.withColumn("__s",
              F.pmod(F.xxhash64(F.col("id")), F.lit(hubSalt.toLong)))
            val repl = parents.withColumn("__s",
              F.explode(F.sequence(F.lit(0L), F.lit(hubSalt.toLong - 1))))
            probe.join(repl,
              probe("label") === repl("__pid") && probe("__s") === repl("__s"),
              "left")
          }
        val jumped = cut(chased
          .select(F.col("id"), F.col("__old"),
            F.least(F.col("label"), F.coalesce(F.col("__plabel"), F.col("label")))
              .as("label")))
        // scalar scan of the frame the checkpoint just materialized —
        // no join, no extra wide job
        val changed = jumped
          .agg(F.sum(F.when(F.col("label") =!= F.col("__old"), 1L)
            .otherwise(0L)).as("c")).first()
        labels = jumped.select("id", "label")
        converged = changed.isNullAt(0) || changed.getLong(0) == 0L
        iter += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"nearDupClusters did not converge in $maxIters rounds")
      labels.select(F.col("id").as("doc_id"), F.col("label").as("cluster_id"))
    } finally edges.unpersist()
  }

  /** SimHash near-dup pairs. 64-bit signature (custom codegen'd
    * expression), banded into four 16-bit chunks: any pair within Hamming
    * distance 3 shares ≥1 chunk (pigeonhole), so the chunk join finds all
    * of them without an all-pairs scan. */
  def simHashPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding is only exhaustive up to Hamming 3")
    // shingle features (not bare tokens): aligns the signature with
    // set-overlap similarity, so hamming tracks shingle-jaccard
    val docs = df.select(idCol.as("id"), SimHash64(shingles(textCol, 3)).as("sig"))
    val chunks = (0 until 4).map { i =>
      F.struct(F.lit(i).as("c"),
        F.shiftrightunsigned(F.col("sig"), i * 16).bitwiseAND(F.lit(0xFFFFL)).as("v"))
    }
    val banded = docs.select(F.col("id"), F.col("sig"),
      F.explode(F.array(chunks: _*)).as("ck"))
    val a = banded.select(F.col("id").as("a_id"), F.col("sig").as("a_sig"), F.col("ck"))
    val b = banded.select(F.col("id").as("b_id"), F.col("sig").as("b_sig"), F.col("ck"))
    a.join(b, a("ck") === b("ck") && F.col("a_id") < F.col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig"))))
      .filter(F.col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Exact n-gram Jaccard with MinHash-banded candidate generation — the
    * scale path: the only wide exchanges are the band self-join (by band
    * key, corpus-linear) and the two candidate re-attach joins; the
    * Jaccard VALUE is exact (computed over the full 64-bit shingle-hash
    * sets), banding only bounds recall, like [[minHashPairs]]. This is
    * the registered operator; [[ngramJaccardPairs]] (all pairs, O(n²))
    * is the small-corpus verifier it is measured against in LlmSpec. */
  def ngramJaccardPairsBanded(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      n: Int = 3,
      threshold: Double = 0.5,
      numHashes: Int = 32,
      bands: Int = 16,
      seed: Long = 1234L,
      saltThreshold: Int = 4096,
      salts: Int = 16,
      sampleMod: Int = 64): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val docSh = df.select(idCol.as("id"),
        F.array_distinct(F.transform(shingles(textCol, n), s => F.xxhash64(s))).as("sh"))
      .filter(F.size(F.col("sh")) > 0)
    bandCandidates(docSh, numHashes, bands, seed, saltThreshold, salts, sampleMod)
      .withColumn("jaccard",
        F.size(F.array_intersect(F.col("a_sh"), F.col("b_sh"))).cast("double") /
          F.size(F.array_union(F.col("a_sh"), F.col("b_sh"))))
      .filter(F.col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Exact n-gram Jaccard for ALL pairs — O(n²) by definition: the
    * verifier [[ngramJaccardPairsBanded]] is measured against on small
    * corpora, never the registered scale path. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    // compare 64-bit shingle hashes, not strings: array_intersect on longs
    // is ~20× faster and the Jaccard VALUE is unchanged (collision odds
    // over a corpus of ~1M distinct shingles ≈ 1e-8)
    val docs = df.select(idCol.as("id"),
        F.array_distinct(F.transform(shingles(textCol, n), s => F.xxhash64(s))).as("sh"))
      .filter(F.size(F.col("sh")) > 0)
    val a = docs.select(F.col("id").as("a_id"), F.col("sh").as("a_sh"))
    val b = docs.select(F.col("id").as("b_id"), F.col("sh").as("b_sh"))
    a.join(b, F.col("a_id") < F.col("b_id"))
      .withColumn("jaccard",
        F.size(F.array_intersect(F.col("a_sh"), F.col("b_sh"))).cast("double") /
          F.size(F.array_union(F.col("a_sh"), F.col("b_sh"))))
      .filter(F.col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  // ---- banding parameter selection ---------------------------------

  /** LSH S-curve: the probability a pair with Jaccard `s` becomes a
    * candidate under (bands b × rows r) banding, 1 − (1 − s^r)^b. */
  def candidateProbability(s: Double, bands: Int, rows: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rows), bands)

  /** Pick the (bands, rows) factorization of `numHashes` whose S-curve
    * threshold (the similarity where candidate probability crosses
    * 1/2 — ≈ (1/b)^(1/r)) sits closest to the TARGET similarity, with
    * recall at the target at least `minRecallAtTarget`. This is the
    * knob-setting arithmetic every MinHash deployment does by hand;
    * making it a function keeps the dedup stack's parameters honest
    * when numHashes or the threshold changes. Deterministic, driver-
    * side, O(divisors(numHashes)). */
  def pickBanding(numHashes: Int, targetThreshold: Double,
      minRecallAtTarget: Double = 0.9): (Int, Int) = {
    require(numHashes >= 2, s"need numHashes >= 2, got $numHashes")
    require(targetThreshold > 0 && targetThreshold < 1,
      s"threshold must be in (0,1), got $targetThreshold")
    val options = (1 to numHashes)
      .filter(numHashes % _ == 0)
      .map(b => (b, numHashes / b))
      .filter { case (b, r) =>
        candidateProbability(targetThreshold, b, r) >= minRecallAtTarget }
    require(options.nonEmpty,
      s"no (bands, rows) split of $numHashes reaches recall " +
        s"$minRecallAtTarget at s=$targetThreshold — raise numHashes")
    options.minBy { case (b, r) =>
      math.abs(math.pow(1.0 / b, 1.0 / r) - targetThreshold) }
  }

  // ---- incremental exact-dup screening (bloom) ---------------------

  import org.apache.spark.sql.GraftBridge

  /** Bloom filter of the history corpus' 64-bit text hashes — the
    * compact screen side for [[bloomExactScreen]]. `numBits` sized from
    * the target false-positive rate: m = ⌈−n·ln p / ln²2⌉ (≈1.2 GB per
    * 10⁹ docs at p=0.01 — broadcastable where the corpus itself never
    * is). Built on the INTERNAL `BloomFilterAggregate` the runtime
    * bloom-join optimizer uses (not SQL-registered; bridged like the
    * other Catalyst internals) — mergeable, map-side combined, ONE
    * history scan. In production this is materialized once and unioned
    * incrementally as batches land, not rebuilt per screen. */
  def historyBloom(history: DataFrame, textCol: Column,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"need expectedItems > 0 and fpp in (0,1), got $expectedItems / $fpp")
    val ln2 = math.log(2)
    val numBits = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    // BloomFilterAggregate silently Math.min-clamps its sizing against
    // spark.sql.optimizer.runtime.bloomFilter.{maxNumBits (64 Mbit
    // default), maxNumItems (4M default)} — at the documented 1e9-doc
    // scale a clamped filter saturates, fpp drifts toward 1, and every
    // arrival falls through to the exact semi-join: still correct, but
    // the screen's cost model silently collapses. Raise the caps to
    // what THIS filter needs, build EAGERLY (one collect of the 1-row
    // aggregate) inside a save/restore of both caps — mirroring
    // Manifest.analyzeFilesBloom — and return the bytes as a local
    // 1-row relation: a lazy return could never restore, leaking the
    // raise into Catalyst's own runtime bloom-join sizing for every
    // later query in the session. Eager is also the documented
    // production shape (materialize once, screen many batches).
    val spark = history.sparkSession
    val conf = spark.conf
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val saved = Seq(bitsKey, itemsKey).map(k => k -> conf.getOption(k))
    if (conf.get(bitsKey, "67108864").toLong < numBits)
      conf.set(bitsKey, numBits.toString)
    if (conf.get(itemsKey, "4000000").toLong < expectedItems)
      conf.set(itemsKey, expectedItems.toString)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val bytes =
      try history.agg(GraftBridge.column(
          new BloomFilterAggregate(
            GraftBridge.expression(F.xxhash64(textCol)),
            Literal(expectedItems), Literal(numBits)).toAggregateExpression())
          .as("__bf")).head().getAs[Array[Byte]]("__bf")
      finally saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    import spark.implicits._
    Seq(Tuple1(bytes)).toDF("__bf")
  }

  /** Incremental EXACT-dup screen of an arriving batch against a huge
    * historical corpus — the first gate real ingestion runs, shaped so
    * the 100 TB side never joins: the history collapses to a broadcast
    * Bloom filter ([[historyBloom]]); every arrival tests membership
    * row-locally; only the bloom-POSITIVE arrivals (true dups + the fpp
    * false alarms) proceed to the exact md5-fingerprint semi-join
    * against `historyFps`, so the verify join's probe side is
    * |arrivals|·(dup_rate+fpp). Bloom membership has NO false
    * negatives, so `is_dup ⇒ bloom_hit` — every true duplicate is
    * caught (q172 emits the implication as an invariant).
    *
    * @param historyFps distinct md5 fingerprints of the history
    *   (`history.select(md5(text))`) — in production a pre-materialized
    *   table appended per batch, exactly like the bloom side
    * @return one row per arrival: (doc_id, bloom_hit, is_dup) */
  def bloomExactScreen(arrivals: DataFrame, idCol: Column, textCol: Column,
      bloom: DataFrame, historyFps: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
    // might_contain demands a CONSTANT or scalar-subquery bloom — the
    // same shape the runtime bloom-join optimizer injects: the 1-row
    // aggregate rides as a subquery result broadcast to every task,
    // never a joined column
    val bfSub = GraftBridge.column(ScalarSubquery(
      GraftBridge.analyzed(bloom.select(F.col("__bf")))))
    def mightContain(v: Column): Column =
      GraftBridge.column(BloomFilterMightContain(
        GraftBridge.expression(bfSub), GraftBridge.expression(v)))
    val tagged = arrivals.select(idCol.as("doc_id"),
        F.xxhash64(textCol).as("__h"), F.md5(textCol).as("__fp"))
      .withColumn("bloom_hit", mightContain(F.col("__h")))
    val dupIds = tagged.filter(F.col("bloom_hit"))
      .join(historyFps.select(F.col(historyFps.columns.head).as("__fp")),
        Seq("__fp"), "left_semi")
      .select(F.col("doc_id"), F.lit(true).as("__d"))
    tagged.join(dupIds, Seq("doc_id"), "left")
      .select(F.col("doc_id"), F.col("bloom_hit"),
        F.coalesce(F.col("__d"), F.lit(false)).as("is_dup"))
  }
}
