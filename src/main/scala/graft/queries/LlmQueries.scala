package graft.queries

import graft.cubes.Tables
import graft.llm.{Decontaminate, Dedup, Importance, Mixture, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{functions => F}

/** LLM-training-data pipeline queries (build brief: dedup, similarity
  * search, multimodal columns, text analysis). Where the operator is
  * SQL-expressible the DuckDB oracle mirrors the exact formula (including
  * rounding); hash/LSH-based operators are rows-only here and covered by
  * LlmSpec instead.
  */
object LlmQueries {
  import org.apache.spark.sql.functions.col

  /** Shared invariant reduction for the ANN entries (q58/q64): turns an
    * approximate top-k result into the DECIDABLE part of its contract —
    * dense ranks, sort order, corpus membership, self-exclusion, recall
    * vs the engine's exact brute force — so the driver's DuckDB oracle
    * can anchor it (the q76 discipline, folded into the entry itself).
    */
  private def annChecked(ann: org.apache.spark.sql.DataFrame,
      brute: org.apache.spark.sql.DataFrame,
      corpus: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = Seq("query_id", "neighbor_id")
    val nExact = brute.agg(F.count(F.lit(1)).as("n_exact"))
    val perQ = ann.groupBy(col("query_id")).agg(
      F.count(F.lit(1)).as("__n"), F.max(col("rnk")).as("__mr"),
      F.count_distinct(col("rnk")).as("__dr"))
    val ranksBad = perQ.filter(col("__n") > k || col("__mr") =!= col("__n") ||
        col("__dr") =!= col("__n"))
      .agg(F.count(F.lit(1)).as("__rb"))
    val w = Window.partitionBy("query_id").orderBy(col("rnk").asc)
    val sortBad = ann
      .withColumn("__prev", F.lag(col("cosine"), 1).over(w))
      .filter(col("__prev").isNotNull && col("cosine") > col("__prev") + 1e-9)
      .agg(F.count(F.lit(1)).as("__sb"))
    val corpusBad = ann.join(corpus.select(col("id").as("neighbor_id")),
        Seq("neighbor_id"), "left_anti")
      .agg(F.count(F.lit(1)).as("__cb"))
    val selfBad = ann.filter(col("query_id") === col("neighbor_id"))
      .agg(F.count(F.lit(1)).as("__fb"))
    val hits = brute.select(keys.head, keys.tail: _*)
      .join(ann.select(keys.head, keys.tail: _*), keys, "left_semi")
      .agg(F.count(F.lit(1)).as("__h"))
    nExact.crossJoin(ranksBad).crossJoin(sortBad).crossJoin(corpusBad)
      .crossJoin(selfBad).crossJoin(hits)
      .select(col("n_exact"),
        (col("__rb") === 0).as("ranks_ok"),
        (col("__sb") === 0).as("sorted_ok"),
        (col("__cb") === 0).as("in_corpus_ok"),
        (col("__fb") === 0).as("no_self_ok"),
        (col("__h") >= col("n_exact") * 0.6).as("recall_ok"))
  }

  private val annCheckedOracle: String =
    """SELECT CAST(5 * count(*) AS BIGINT) AS n_exact,
      |true AS ranks_ok, true AS sorted_ok, true AS in_corpus_ok,
      |true AS no_self_ok, true AS recall_ok
      |FROM embeddings WHERE vec_id < 10""".stripMargin

  val qs: Seq[NamedQuery] = Seq(

    // exact dedup: hash-groupBy fingerprint groups
    NamedQuery("q50_exact_dedup",
      (s, d) => Dedup.exactDuplicateGroups(
          Tables.documents(s, d), col("doc_id"), col("text"))
        .orderBy(col("fingerprint").asc_nulls_first),
      Some("""SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id,
             |count(*) AS n_copies
             |FROM documents GROUP BY 1
             |ORDER BY fingerprint ASC NULLS FIRST""".stripMargin)),

    // MinHash+LSH near-dup pairs, exact-Jaccard-verified. The oracle is
    // the EXACT all-pairs Jaccard — equality also proves 100% LSH recall
    // at this threshold on this corpus (32 hashes / 8 bands).
    NamedQuery("q51_minhash_pairs",
      (s, d) => Dedup.minHashPairs(
          Tables.documents(s, d), col("doc_id"), col("text"),
          shingleK = 3, numHashes = 32, bands = 8, threshold = 0.8)
        .withColumn("jaccard", F.round(col("jaccard"), 6))
        .orderBy(col("a_id").asc, col("b_id").asc),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
             |sh AS (SELECT doc_id,
             |  list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS ss
             |  FROM t WHERE len(w) >= 3)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  round(len(list_intersect(a.ss, b.ss))::DOUBLE /
             |        len(list_distinct(list_concat(a.ss, b.ss))), 6) AS jaccard
             |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |WHERE len(list_intersect(a.ss, b.ss))::DOUBLE /
             |      len(list_distinct(list_concat(a.ss, b.ss))) >= 0.8
             |ORDER BY a_id ASC, b_id ASC""".stripMargin)),

    // SimHash banded near-dup pairs — xxhash-based, so the raw pairs are
    // not SQL-expressible; the entry folds its own invariant oracle (the
    // q88 discipline): canonical ordering (a_id < b_id always), Hamming
    // monotonicity (pairs at ≤1 ⊆ pairs at ≤3 — the (h+1)-block banding
    // is complete, so a broken banding breaks the subset), and
    // non-emptiness on this corpus. n_docs anchors the oracle. The
    // precision claim (simhash ⊆ exact Jaccard 0.8) stays with q88.
    NamedQuery("q52_simhash_pairs",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val keys = Seq("a_id", "b_id")
        val loose = Dedup.simHashPairs(docs, col("doc_id"), col("text"), maxHamming = 3)
          .select(keys.head, keys.tail: _*)
        val strict = Dedup.simHashPairs(docs, col("doc_id"), col("text"), maxHamming = 1)
          .select(keys.head, keys.tail: _*)
        val nDocs = docs.agg(F.count(F.lit(1)).as("n_docs"))
        val nLoose = loose.agg(F.count(F.lit(1)).as("__n"))
        val nonCanon = loose.filter(col("a_id") >= col("b_id"))
          .agg(F.count(F.lit(1)).as("__c"))
        val mono = strict.join(loose, keys, "left_anti")
          .agg(F.count(F.lit(1)).as("__m"))
        nDocs.crossJoin(nLoose).crossJoin(nonCanon).crossJoin(mono).select(
          col("n_docs"),
          (col("__n") >= 1).as("found_some"),
          (col("__c") === 0).as("pairs_canonical"),
          (col("__m") === 0).as("hamming_monotone"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |true AS found_some, true AS pairs_canonical,
             |true AS hamming_monotone FROM documents""".stripMargin)),

    // per-doc n-gram set cardinality
    NamedQuery("q53_ngram_profile",
      (s, d) => Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          F.size(Dedup.shingles(col("text"), 3)).as("n_shingles"),
          F.size(Dedup.tokens(col("text"))).as("n_tokens"))
        .orderBy(col("doc_id").asc),
      Some("""SELECT doc_id,
             |CAST(CASE WHEN len(w) >= 3 THEN
             |  len(list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]))
             |  ELSE 0 END AS INT) AS n_shingles,
             |CAST(len(w) AS INT) AS n_tokens
             |FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |      FROM documents WHERE doc_id < 50)
             |ORDER BY doc_id ASC""".stripMargin)),

    // exact n-gram Jaccard pairs over MinHash-banded candidates — the
    // scale path (shuffle by band key, never n²); the oracle is the
    // EXACT all-pairs Jaccard, so equality also proves full banding
    // recall on this corpus. The all-pairs form is the LlmSpec verifier.
    NamedQuery("q54_jaccard_pairs",
      (s, d) => Dedup.ngramJaccardPairsBanded(
          Tables.documents(s, d),
          col("doc_id"), col("text"), n = 3, threshold = 0.8)
        .withColumn("jaccard", F.round(col("jaccard"), 6))
        .orderBy(col("a_id").asc, col("b_id").asc),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
             |sh AS (SELECT doc_id,
             |  list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS ss
             |  FROM t WHERE len(w) >= 3)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  round(len(list_intersect(a.ss, b.ss))::DOUBLE /
             |        len(list_distinct(list_concat(a.ss, b.ss))), 6) AS jaccard
             |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |WHERE len(list_intersect(a.ss, b.ss))::DOUBLE /
             |      len(list_distinct(list_concat(a.ss, b.ss))) >= 0.8
             |ORDER BY a_id ASC, b_id ASC""".stripMargin)),

    // full text-analysis profile: token/subword counts, quality score,
    // language ID, fingerprint — every formula mirrored in SQL
    NamedQuery("q55_text_profile",
      (s, d) => TextAnalysis.profile(
          Tables.documents(s, d).filter(col("doc_id") < 100),
          col("doc_id"), col("text"))
        .orderBy(col("doc_id").asc),
      Some("""WITH base AS (
             |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks,
             |    length(text) AS n_chars
             |  FROM documents WHERE doc_id < 100),
             |m AS (
             |  SELECT doc_id, text, toks, n_chars,
             |    CAST(len(toks) AS INT) AS n_tokens,
             |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS n_subwords,
             |    round(list_sum(list_transform(toks, x -> length(x)))::DOUBLE /
             |          greatest(len(toks), 1), 6) AS avg_token_len,
             |    round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))::DOUBLE /
             |          greatest(length(text), 1), 6) AS punct_ratio,
             |    round(len(list_filter(toks, x -> list_contains(
             |      ['the','a','an','and','of','to','is','in','it','that'], x)))::DOUBLE /
             |          greatest(len(toks), 1), 6) AS stopword_ratio,
             |    len(list_filter(list_transform(toks, x -> lower(x)),
             |      x -> list_contains(['the','a','and','of','to','is'], x))) AS s_en,
             |    len(list_filter(list_transform(toks, x -> lower(x)),
             |      x -> list_contains(['el','la','de','que','y','en'], x))) AS s_es,
             |    len(list_filter(list_transform(toks, x -> lower(x)),
             |      x -> list_contains(['der','die','das','und','ist'], x))) AS s_de,
             |    len(list_filter(list_transform(toks, x -> lower(x)),
             |      x -> list_contains(['le','les','et','une','dans'], x))) AS s_fr
             |  FROM base)
             |SELECT doc_id, n_tokens, n_subwords, CAST(n_chars AS INT) AS n_chars,
             |  avg_token_len, punct_ratio, stopword_ratio,
             |  round(least(n_tokens / 100.0, 1.0) * 0.5 +
             |        (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.3 +
             |        least(stopword_ratio * 5.0, 1.0) * 0.2, 6) AS quality,
             |  CASE
             |    WHEN s_en >= greatest(s_en, s_es, s_de, s_fr) AND greatest(s_en, s_es, s_de, s_fr) > 0 THEN 'en'
             |    WHEN s_es >= greatest(s_es, s_de, s_fr) AND greatest(s_es, s_de, s_fr) > 0 THEN 'es'
             |    WHEN s_de >= greatest(s_de, s_fr) AND greatest(s_de, s_fr) > 0 THEN 'de'
             |    WHEN s_fr > 0 THEN 'fr'
             |    ELSE 'und' END AS lang_pred,
             |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
             |FROM m ORDER BY doc_id ASC""".stripMargin)),

    // rolling-hash fingerprint (custom codegen'd expression). The oracle
    // mirrors the PolyHash64 fold exactly: a list_reduce over the utf8
    // codepoints in HUGEINT with mod-2^64 wraparound, mapped back to the
    // signed 64-bit value Java's native overflow produces.
    NamedQuery("q56_rolling_fingerprint",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.rollingFingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id").asc),
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS s
             |  FROM documents),
             |u AS (
             |  SELECT doc_id,
             |    list_reduce(
             |      list_prepend(1125899906842597::HUGEINT,
             |        [ord(s[i])::HUGEINT for i in range(1, strlen(s) + 1)]),
             |      (acc, b) -> (acc * 1000003 + b) % 18446744073709551616::HUGEINT) AS h
             |  FROM t)
             |SELECT doc_id,
             |  CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
             |            THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS fp
             |FROM u ORDER BY doc_id ASC""".stripMargin)),

    // brute-force exact cosine top-5 for 10 query vectors; oracle computes
    // the dot in DOUBLE sequentially, matching CosineSim bit-for-bit
    NamedQuery("q57_cosine_topk",
      (s, d) => Similarity.bruteForceTopK(
          Tables.embeddings(s, d).filter(col("vec_id") < 10)
            .select(col("vec_id").as("id"), col("embedding")),
          Tables.embeddings(s, d)
            .select(col("vec_id").as("id"), col("embedding")),
          k = 5)
        .withColumn("cosine", F.round(col("cosine"), 6))
        .orderBy(col("query_id").asc, col("rnk").asc),
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
             |c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
             |scored AS (
             |  SELECT query_id, neighbor_id,
             |    list_sum([ (qe[i]::DOUBLE) * (ce[i]::DOUBLE) for i in range(1, 65)]) /
             |    (sqrt(list_sum([ (qe[i]::DOUBLE) * (qe[i]::DOUBLE) for i in range(1, 65)])) *
             |     sqrt(list_sum([ (ce[i]::DOUBLE) * (ce[i]::DOUBLE) for i in range(1, 65)]))) AS cosine
             |  FROM c CROSS JOIN q WHERE query_id <> neighbor_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id, cosine, row_number() OVER (
             |    PARTITION BY query_id
             |    ORDER BY cosine DESC NULLS LAST, neighbor_id ASC) AS rnk
             |  FROM scored)
             |SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rnk
             |FROM ranked WHERE rnk <= 5
             |ORDER BY query_id ASC, rnk ASC""".stripMargin)),

    // LSH-bucketed ANN (scale path). Fixed-seed hyperplanes aren't
    // SQL-expressible, so the entry folds its own invariant oracle (the
    // q76 discipline) via [[annChecked]]: dense 1..n ranks, cosine
    // sorted within query, neighbors drawn from the corpus, no
    // self-matches, and ≥0.6 recall vs the engine's exact brute-force
    // top-k. n_exact (10 queries × k=5) anchors the oracle.
    NamedQuery("q58_ann_lsh",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding"))
        val queries = emb.filter(col("id") < 10)
        annChecked(
          Similarity.lshTopK(queries, emb, k = 5, dim = 64,
            tables = 8, probeBits = 6), // nBits: occupancy-adaptive
          Similarity.bruteForceTopK(queries, emb, 5), emb, k = 5)
      },
      Some(annCheckedOracle)),

    // IVF-style ANN (coarse k-means quantizer + nProbe cells + exact
    // re-rank) — the other scale path beside LSH; same folded invariant
    // oracle as q58 (the q79 companion keeps the indexed-vs-inline
    // equality claim).
    NamedQuery("q64_ann_ivf",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding"))
        val queries = emb.filter(col("id") < 10)
        annChecked(
          Similarity.ivfTopK(s, queries, emb, k = 5, nLists = 16, nProbe = 6),
          Similarity.bruteForceTopK(queries, emb, 5), emb, k = 5)
      },
      Some(annCheckedOracle)),

    // embedding near-dup pairs via LSH buckets + cosine threshold. The
    // entry folds the PRECISION half of the contract as its oracle:
    // every returned pair is canonical (a_id < b_id) and its exact
    // cosine — recomputed per RETURNED pair, O(|pairs|), never
    // all-pairs — clears the threshold and matches the reported value.
    // The completeness/subset half (quadratic to check) stays with the
    // allowlisted q77 companion. n_vecs anchors the oracle.
    NamedQuery("q59_cosine_neardup",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding"))
        val pairs = Similarity.cosineNearDupPairs(emb, threshold = 0.4, dim = 64)
        val nVecs = emb.agg(F.count(F.lit(1)).as("n_vecs"))
        val nPairs = pairs.agg(F.count(F.lit(1)).as("__n"))
        val nonCanon = pairs.filter(col("a_id") >= col("b_id"))
          .agg(F.count(F.lit(1)).as("__c"))
        val rechecked = pairs
          .join(emb.select(col("id").as("a_id"), col("embedding").as("__ae")), "a_id")
          .join(emb.select(col("id").as("b_id"), col("embedding").as("__be")), "b_id")
          .withColumn("__exact", graft.functions.CosineSim(col("__ae"), col("__be")))
        val precBad = rechecked.filter(col("__exact") < 0.4 - 1e-9 ||
            F.abs(col("__exact") - col("cosine")) > 1e-6)
          .agg(F.count(F.lit(1)).as("__p"))
        nVecs.crossJoin(nPairs).crossJoin(nonCanon).crossJoin(precBad).select(
          col("n_vecs"),
          (col("__n") >= 1).as("found_some"),
          (col("__c") === 0).as("pairs_canonical"),
          (col("__p") === 0).as("precision_ok"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_vecs,
             |true AS found_some, true AS pairs_canonical, true AS precision_ok
             |FROM embeddings""".stripMargin)),

    // exact embedding-cosine near-dup pairs — oracled in double precision
    // (the LSH-bucketed q59 is the scale path; this is the verifier)
    NamedQuery("q65_cosine_neardup_exact",
      (s, d) => Similarity.cosineNearDupPairsExact(
          Tables.embeddings(s, d).select(col("vec_id").as("id"), col("embedding")),
          threshold = 0.45)
        .withColumn("cosine", F.round(col("cosine"), 6))
        .orderBy(col("a_id").asc, col("b_id").asc),
      Some("""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |round(list_sum([ (a.embedding[i]::DOUBLE) * (b.embedding[i]::DOUBLE) for i in range(1, 65)]) /
             |  (sqrt(list_sum([ (a.embedding[i]::DOUBLE) * (a.embedding[i]::DOUBLE) for i in range(1, 65)])) *
             |   sqrt(list_sum([ (b.embedding[i]::DOUBLE) * (b.embedding[i]::DOUBLE) for i in range(1, 65)]))), 6) AS cosine
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE list_sum([ (a.embedding[i]::DOUBLE) * (b.embedding[i]::DOUBLE) for i in range(1, 65)]) /
             |  (sqrt(list_sum([ (a.embedding[i]::DOUBLE) * (a.embedding[i]::DOUBLE) for i in range(1, 65)])) *
             |   sqrt(list_sum([ (b.embedding[i]::DOUBLE) * (b.embedding[i]::DOUBLE) for i in range(1, 65)]))) >= 0.45
             |ORDER BY a_id ASC, b_id ASC""".stripMargin)),

    // multimodal: binary payload metadata (columnar, no decode)
    NamedQuery("q60_media_stats",
      (s, d) => Multimodal.mediaStats(
          Multimodal.mediaFromDocuments(Tables.documents(s, d)))
        .orderBy(col("media_id").asc),
      Some("""SELECT doc_id AS media_id,
             |CAST(octet_length(CAST(text AS BLOB)) AS INT) AS byte_len,
             |sha256(text) AS sha_hex
             |FROM documents ORDER BY media_id ASC""".stripMargin)),

    // multimodal: REAL codec round-trip. Each document renders to a tiny
    // genuine grayscale PNG on the executors, and the decode stage reads
    // width/height/mean-luminance back out of the PNG bytes with JDK
    // ImageIO. The renderer is deterministic in (doc_id, text), so the
    // oracle recomputes the decoded features analytically — a broken
    // encode OR decode cannot hash-match.
    NamedQuery("q61_media_features",
      (s, d) => Multimodal.extractFeatures(s,
          Multimodal.pngMediaFromDocuments(s, Tables.documents(s, d)))
        .toDF()
        .select(col("media_id"), col("width"), col("height"), col("brightness"))
        .orderBy(col("media_id").asc),
      Some("""WITH m AS (
             |  SELECT doc_id, text,
             |    CAST(1 + (doc_id % 8) AS INT) AS width,
             |    CAST(1 + (octet_length(CAST(text AS BLOB)) % 8) AS INT) AS height,
             |    octet_length(CAST(text AS BLOB)) AS blen
             |  FROM documents)
             |SELECT doc_id AS media_id, width, height,
             |  round(list_avg([ord(text[((i-1) % blen) + 1])
             |                  for i in range(1, width*height + 1)]), 6) AS brightness
             |FROM m ORDER BY media_id ASC""".stripMargin)),

    // REAL audio decode (q61's pattern for the audio modality): docs
    // render to genuine PCM WAVs on the executors (javax.sound.sampled),
    // the extractor parses the container back (rate/width/channels from
    // the decoded header) and reads the frames into RMS amplitude. The
    // synth is deterministic in the text's codepoints, so the oracle
    // recomputes frame count, duration and RMS analytically — a broken
    // encode OR decode cannot hash-match.
    NamedQuery("q133_audio_features",
      (s, d) => Multimodal.extractAudioFeatures(s,
          Multimodal.wavMediaFromDocuments(s, Tables.documents(s, d)))
        .toDF()
        .select(col("media_id"), col("sample_rate"), col("n_samples"),
          col("duration_ms"), col("rms"))
        .orderBy(col("media_id").asc),
      Some("""WITH t AS (
             |  SELECT doc_id, text, length(text) AS ncp,
             |    200 + (length(text) % 100) AS n
             |  FROM documents),
             |sm AS (
             |  SELECT doc_id, n,
             |    [ ((unicode(text[(i % ncp) + 1]) * 131 + i * 7) % 65536) - 32768
             |      for i in range(0, n) ] AS s
             |  FROM t)
             |SELECT doc_id AS media_id, 8000 AS sample_rate,
             |  CAST(n AS INT) AS n_samples,
             |  round(n * 1000.0 / 8000.0, 6) AS duration_ms,
             |  round(sqrt(list_sum([ (x * x)::DOUBLE for x in s ]) / n), 6) AS rms
             |FROM sm ORDER BY media_id ASC""".stripMargin)),

    // REAL video-frame sampling (the q61/q133 pattern for the frame
    // table): docs render to motion-PNG containers, sampleFrames parses
    // the length-prefixed table seeking past skipped frames, and every
    // 2nd frame decodes through the real image codec. Frame f's pixels
    // are the doc image advanced f text-bytes, so the oracle recomputes
    // per-frame brightness analytically — container parse, frame seek
    // and PNG decode all have to be right to hash-match.
    NamedQuery("q134_video_frames",
      (s, d) => Multimodal.frameFeatures(s,
          Multimodal.sampleFrames(s,
            Multimodal.videoMediaFromDocuments(s, Tables.documents(s, d)), 2))
        .toDF()
        .select(col("media_id"), col("frame_idx"), col("width"), col("height"),
          col("brightness"))
        .orderBy(col("media_id").asc, col("frame_idx").asc),
      Some("""WITH m AS (
             |  SELECT doc_id, text,
             |    CAST(1 + (doc_id % 8) AS INT) AS width,
             |    CAST(1 + (octet_length(CAST(text AS BLOB)) % 8) AS INT) AS height,
             |    octet_length(CAST(text AS BLOB)) AS blen,
             |    2 + (doc_id % 3) AS n_frames
             |  FROM documents),
             |fr AS (
             |  SELECT doc_id, text, width, height, blen,
             |    unnest(range(0, n_frames::INT)) AS f
             |  FROM m)
             |SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx, width, height,
             |  round(list_avg([ord(text[((p + f) % blen) + 1])
             |                  for p in range(0, width*height)]), 6) AS brightness
             |FROM fr WHERE f % 2 = 0
             |ORDER BY media_id ASC, frame_idx ASC""".stripMargin)),

    // REAL image resize: decode → integer-exact nearest-neighbor
    // downscale to fit 4px → re-encode → decode again for features.
    // The floor pixel mapping (dst (x,y) reads src (x*w/w', y*h/h'))
    // is replayed analytically by the oracle, so the whole
    // decode-transform-encode-decode chain must be exact to hash-match;
    // images already within bounds pass through byte-identical.
    NamedQuery("q135_media_resize",
      (s, d) => Multimodal.extractFeatures(s,
          Multimodal.resizeImages(s,
            Multimodal.pngMediaFromDocuments(s, Tables.documents(s, d)), 4))
        .toDF()
        .select(col("media_id"), col("width"), col("height"), col("brightness"))
        .orderBy(col("media_id").asc),
      Some("""WITH m AS (
             |  SELECT doc_id, text,
             |    CAST(1 + (doc_id % 8) AS INT) AS w,
             |    CAST(1 + (octet_length(CAST(text AS BLOB)) % 8) AS INT) AS h,
             |    octet_length(CAST(text AS BLOB)) AS blen
             |  FROM documents),
             |r AS (
             |  SELECT doc_id, text, blen, w, h,
             |    CASE WHEN greatest(w, h) <= 4 THEN w
             |         ELSE greatest(1, w * 4 // greatest(w, h)) END AS w2,
             |    CASE WHEN greatest(w, h) <= 4 THEN h
             |         ELSE greatest(1, h * 4 // greatest(w, h)) END AS h2
             |  FROM m)
             |SELECT doc_id AS media_id, CAST(w2 AS INT) AS width,
             |  CAST(h2 AS INT) AS height,
             |  round(list_avg([ord(text[((((p // w2) * h // h2) * w + ((p % w2) * w // w2)) % blen) + 1])
             |                  for p in range(0, w2*h2)]), 6) AS brightness
             |FROM r ORDER BY media_id ASC""".stripMargin)),

    // the full training-data dedup PIPELINE as one declarative plan:
    // exact dedup (hash keep-list) → near-dup detection over the
    // keep-list only (banded, the skew mitigation the Dedup scaladoc
    // prescribes) → greedy survivor choice (drop the higher id of each
    // near-dup pair) → per-source accounting. Every stage is exact-
    // oracle-able, so the whole composition is hash-verified.
    NamedQuery("q82_dedup_pipeline",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val keepIds = Dedup.exactDuplicateGroups(docs, col("doc_id"), col("text"))
          .select(col("keep_id").as("doc_id"))
        val kept = docs.join(keepIds, "doc_id")
        val nearDrop = Dedup.ngramJaccardPairsBanded(
            kept, col("doc_id"), col("text"), n = 3, threshold = 0.8)
          .select(col("b_id").as("doc_id")).distinct()
        kept.join(nearDrop, Seq("doc_id"), "left_anti")
          .groupBy(col("source"))
          .agg(F.count(F.lit(1)).as("n_survivors"),
            F.sum(col("n_chars")).as("chars_kept"))
          .orderBy(col("source").asc)
      },
      Some("""WITH keep AS (
             |  SELECT * FROM documents WHERE doc_id IN (
             |    SELECT min(doc_id) FROM documents GROUP BY md5(text))),
             |sh AS (
             |  SELECT doc_id,
             |    list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS ss
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM keep)
             |  WHERE len(w) >= 3),
             |drop_ids AS (
             |  SELECT DISTINCT b.doc_id
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.ss, b.ss))::DOUBLE /
             |        len(list_distinct(list_concat(a.ss, b.ss))) >= 0.8)
             |SELECT source, count(*) AS n_survivors,
             |CAST(sum(n_chars) AS BIGINT) AS chars_kept
             |FROM keep WHERE doc_id NOT IN (SELECT doc_id FROM drop_ids)
             |GROUP BY 1 ORDER BY source ASC""".stripMargin)),

    // dedup keep-list: the end-to-end "which docs survive" projection
    // (exact + normalized fingerprint agree on this corpus)
    NamedQuery("q62_dedup_keeplist",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val keep = Dedup.exactDuplicateGroups(docs, col("doc_id"), col("text"))
          .select(col("keep_id"))
        docs.join(keep, col("doc_id") === col("keep_id"))
          .groupBy(col("source"))
          .agg(F.count(F.lit(1)).as("n_kept"),
            F.sum(col("n_chars")).as("chars_kept"))
          .orderBy(col("source").asc)
      },
      Some("""SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS chars_kept
             |FROM documents WHERE doc_id IN (
             |  SELECT min(doc_id) FROM documents GROUP BY md5(text))
             |GROUP BY 1 ORDER BY source ASC""".stripMargin)),

    // deterministic hash split (train/val/test): md5-bucketed assignment
    // is engine-independent and partitioning-independent — the oracle
    // recomputes the SAME buckets in DuckDB, proving any loader can
    // reproduce the split without Spark (rand()/sample() cannot do this).
    NamedQuery("q94_hash_split",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs.select(col("doc_id"),
            graft.llm.Splits.assignSplit(col("doc_id"),
              Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
          .groupBy(col("split"))
          .agg(F.count(F.lit(1)).as("n_docs"),
            F.min(col("doc_id")).as("min_id"),
            F.max(col("doc_id")).as("max_id"))
          .orderBy(col("split").asc)
      },
      Some("""WITH b AS (SELECT doc_id,
             |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS bucket
             |  FROM documents)
             |SELECT CASE WHEN bucket < 80 THEN 'train'
             |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
             |CAST(count(*) AS BIGINT) AS n_docs,
             |min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM b GROUP BY 1 ORDER BY split ASC""".stripMargin)),

    // quality-weighted deterministic sampling: keep each doc with
    // probability ≈ its quality score, decided by the SAME md5 bucket
    // machinery as the splits — reproducible in any engine (the oracle
    // re-derives both the quality formula and the buckets), unlike
    // rand()-thinning which resharding silently changes. The canonical
    // "upsample clean text" pipeline step.
    NamedQuery("q108_quality_sampling",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val q = TextAnalysis.qualityScore(col("text"))
        val keep = graft.llm.Splits.hashBucket(col("doc_id"), 100) <
          F.round(q * 100, 0)
        docs.groupBy(col("source"))
          .agg(F.count(F.lit(1)).as("n_total"),
            F.sum(F.when(keep, 1L).otherwise(0L)).as("n_kept"),
            F.sum(F.when(keep, TextAnalysis.tokenCount(col("text")))
              .otherwise(0L)).as("tokens_kept"))
          .orderBy(col("source").asc)
      },
      Some("""WITH m AS (
             |  SELECT doc_id, source, text,
             |    string_split_regex(trim(text), '\s+') AS toks
             |  FROM documents),
             |sc AS (
             |  SELECT doc_id, source, len(toks) AS n_tokens,
             |    round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))::DOUBLE /
             |          greatest(length(text), 1), 6) AS punct_ratio,
             |    round(len(list_filter(toks, x -> list_contains(
             |      ['the','a','an','and','of','to','is','in','it','that'], x)))::DOUBLE /
             |          greatest(len(toks), 1), 6) AS stopword_ratio
             |  FROM m),
             |q AS (
             |  SELECT doc_id, source, n_tokens,
             |    round(least(n_tokens / 100.0, 1.0) * 0.5 +
             |          (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.3 +
             |          least(stopword_ratio * 5.0, 1.0) * 0.2, 6) AS quality
             |  FROM sc),
             |k AS (
             |  SELECT source, n_tokens,
             |    (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100
             |      < round(quality * 100, 0)) AS keep
             |  FROM q)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_total,
             |CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
             |FROM k GROUP BY 1 ORDER BY source ASC""".stripMargin)),

    // ingestion-time near-dup screening (stream-static band join run in
    // batch mode): docs >= 400 arrive against the < 400 corpus index,
    // each reporting its best >= 0.8-Jaccard corpus match. The oracle is
    // the EXACT all-cross-pairs argmax — equality also proves LSH recall
    // at the threshold, as with q51.
    NamedQuery("q147_neardup_screen",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.nearDupScreen(
            docs.filter(col("doc_id") >= 400),
            docs.filter(col("doc_id") < 400),
            col("doc_id"), col("text"))
          .orderBy(col("doc_id").asc)
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
             |sh AS (SELECT doc_id,
             |  list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS ss
             |  FROM t WHERE len(w) >= 3),
             |cand AS (SELECT a.doc_id AS doc_id, c.doc_id AS match_id,
             |    len(list_intersect(a.ss, c.ss))::DOUBLE /
             |      len(list_distinct(list_concat(a.ss, c.ss))) AS j
             |  FROM sh a JOIN sh c ON a.doc_id >= 400 AND c.doc_id < 400),
             |best AS (SELECT doc_id, match_id, j,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY j DESC, match_id ASC) AS rn
             |  FROM cand WHERE j >= 0.8)
             |SELECT doc_id, match_id, round(j, 6) AS jaccard
             |FROM best WHERE rn = 1 ORDER BY doc_id ASC""".stripMargin)),

    // near-dup CLUSTERS: connected components over the minhash pair
    // graph (transitive closure — the keep-one-per-component policy).
    // The oracle replays it as a recursive CTE over the EXACT all-pairs
    // jaccard graph, so equality proves both the LSH pair recall and
    // the component labels.
    NamedQuery("q150_neardup_clusters",
      (s, d) => Dedup.nearDupClusters(
          Dedup.minHashPairs(Tables.documents(s, d), col("doc_id"), col("text"),
            shingleK = 3, numHashes = 32, bands = 8, threshold = 0.8))
        .orderBy(col("doc_id").asc),
      Some("""WITH RECURSIVE
             |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
             |sh AS (SELECT doc_id,
             |  list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS ss
             |  FROM t WHERE len(w) >= 3),
             |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.ss, b.ss))::DOUBLE /
             |        len(list_distinct(list_concat(a.ss, b.ss))) >= 0.8),
             |e AS (SELECT a_id AS src, b_id AS dst FROM p
             |      UNION SELECT b_id, a_id FROM p),
             |reach(id, r) AS (
             |  SELECT src, src FROM e
             |  UNION
             |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id)
             |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
             |FROM reach GROUP BY id ORDER BY doc_id ASC""".stripMargin)),

    // deterministic weighted sampling without replacement (Efraimidis–
    // Spirakis over the md5-derived uniform): 10 docs per source,
    // char-count-weighted. The oracle replays the EXACT key formula —
    // equality proves the sample is a pure function of row identity,
    // not of engine, run, or partitioning.
    NamedQuery("q151_weighted_sample",
      (s, d) => graft.llm.Splits.weightedSample(
          Tables.documents(s, d), col("doc_id"), col("n_chars"), k = 10,
          strata = Seq(col("source")))
        .select(col("source"), col("doc_id"),
          F.round(col("es_key"), 6).as("es_key"))
        .orderBy(col("source").asc, col("es_key").desc, col("doc_id").asc),
      Some("""WITH keyed AS (
             |  SELECT source, doc_id,
             |    ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 0.5)
             |       / 4294967296.0) / n_chars AS es
             |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
             |ranked AS (
             |  SELECT source, doc_id, es,
             |    row_number() OVER (PARTITION BY source ORDER BY es DESC, doc_id ASC) AS rn
             |  FROM keyed)
             |SELECT source, doc_id, round(es, 6) AS es_key
             |FROM ranked WHERE rn <= 10
             |ORDER BY source ASC, es_key DESC, doc_id ASC""".stripMargin)),

    // cross-doc span duplication (Lee et al. substring-dedup signal):
    // per doc, the fraction of its 8-token spans that appear in ≥2
    // distinct docs. Registered in the string-keyed exact configuration
    // the oracle can replay; the hashed fast path is asserted equal in
    // LlmSpec.
    NamedQuery("q152_cross_doc_spans",
      (s, d) => Dedup.crossDocSpanStats(
          Tables.documents(s, d), col("doc_id"), col("text"),
          k = 8, hashed = false)
        .orderBy(col("doc_id").asc),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
             |sp AS (SELECT doc_id,
             |  unnest([array_to_string(w[i:i+7], ' ') for i in range(1, len(w) - 6)]) AS span
             |  FROM t WHERE len(w) >= 8),
             |nd AS (SELECT span, count(DISTINCT doc_id) AS ndocs FROM sp GROUP BY span),
             |pd AS (SELECT sp.doc_id, count(*) AS n_spans,
             |    sum(CASE WHEN nd.ndocs > 1 THEN 1 ELSE 0 END) AS n_dup
             |  FROM sp JOIN nd USING (span) GROUP BY sp.doc_id)
             |SELECT d.doc_id,
             |CAST(coalesce(pd.n_spans, 0) AS BIGINT) AS n_spans,
             |CAST(coalesce(pd.n_dup, 0) AS BIGINT) AS n_dup_spans,
             |round(CASE WHEN coalesce(pd.n_spans, 0) > 0
             |      THEN pd.n_dup::DOUBLE / pd.n_spans ELSE 0.0 END, 6) AS dup_span_frac
             |FROM (SELECT DISTINCT doc_id FROM documents) d
             |LEFT JOIN pd USING (doc_id)
             |ORDER BY doc_id ASC""".stripMargin)),

    // span-level REMOVAL (the full Lee et al. substring-dedup
    // treatment): cross-doc duplicated 8-token spans are excised from
    // every doc but the min-id canonical owner; hit positions merge
    // into maximal intervals before excision. The oracle replays the
    // whole transform — span extraction, ownership, interval merge,
    // token excision, rewrite — on the string-keyed configuration; the
    // hashed default is asserted equal in LlmSpec.
    NamedQuery("q154_span_removal",
      (s, d) => Dedup.removeDuplicatedSpans(
          Tables.documents(s, d), col("doc_id"), col("text"),
          k = 8, hashed = false)
        .orderBy(col("doc_id").asc),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
             |sp0 AS (SELECT doc_id,
             |  unnest([{'p': i, 's': array_to_string(w[i:i+7], ' ')} for i in range(1, len(w) - 6)]) AS u
             |  FROM t WHERE len(w) >= 8),
             |sp AS (SELECT doc_id, u.p AS pos, u.s AS span FROM sp0),
             |ag AS (SELECT span, count(DISTINCT doc_id) AS nd, min(doc_id) AS keeper
             |  FROM sp GROUP BY span),
             |h AS (SELECT sp.doc_id, sp.pos FROM sp JOIN ag USING (span)
             |  WHERE nd >= 2 AND sp.doc_id <> keeper),
             |hl AS (SELECT doc_id, list_sort(list(pos)) AS hs FROM h GROUP BY doc_id),
             |o AS (SELECT t.doc_id, t.w, coalesce(hl.hs, CAST([] AS BIGINT[])) AS hs
             |  FROM t LEFT JOIN hl USING (doc_id)),
             |r AS (SELECT doc_id, w, hs,
             |  list_transform(
             |    list_filter(range(1, len(w) + 1), j ->
             |      len(list_filter(hs, h -> h <= j AND j < h + 8)) = 0),
             |    j -> w[j]) AS kept,
             |  len(list_filter(range(1, len(hs) + 1), i ->
             |    i = 1 OR hs[i] > hs[i - 1] + 8)) AS n_iv
             |  FROM o)
             |SELECT doc_id,
             |coalesce(array_to_string(kept, ' '), '') AS text_clean,
             |CAST(len(w) AS BIGINT) AS n_tokens,
             |CAST(len(w) - len(kept) AS BIGINT) AS n_removed,
             |CAST(n_iv AS BIGINT) AS n_intervals
             |FROM r ORDER BY doc_id ASC""".stripMargin)),

    // tokenizer-APPLY (greedy longest-match subword segmentation, the
    // codegen'd SubwordEncode expression) with real token ids from a
    // broadcast vocab join: per doc, whitespace words, vocabulary-true
    // subword count, unknown count, and the id checksum. The oracle
    // replays the greedy walk exactly — a (word, pos) jump table of
    // longest vocab matches, then a recursive CTE following it — over
    // the SAME vocab/id list (generated from TextAnalysis.DemoVocab, so
    // the two sides cannot drift).
    NamedQuery("q155_subword_tokens",
      (s, d) => {
        import s.implicits._
        val vocab = TextAnalysis.DemoVocab
        val vocabDf = F.broadcast(vocab.zipWithIndex
          .map { case (t, i) => (t, (i + 1).toLong) }.toDF("__tok", "__tid"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            F.size(TextAnalysis.tokens(col("text"))).cast("long").as("n_words"),
            F.explode(TextAnalysis.subwordTokens(col("text"), vocab)).as("__tok"))
          .join(vocabDf, Seq("__tok"), "left")
          .groupBy("doc_id", "n_words")
          .agg(F.count(F.lit(1)).as("n_subwords"),
            F.sum(F.when(col("__tid").isNull, 1L).otherwise(0L)).as("n_unk"),
            F.sum(F.coalesce(col("__tid"), F.lit(0L))).as("id_sum"))
          .select(col("doc_id"), col("n_words"), col("n_subwords"),
            col("n_unk"), col("id_sum"))
          .orderBy(col("doc_id").asc)
      },
      Some {
        val values = TextAnalysis.DemoVocab.zipWithIndex
          .map { case (t, i) => s"('$t', ${i + 1})" }.mkString(",")
        s"""WITH RECURSIVE v(tok, tid) AS (VALUES $values),
           |t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
           |words AS (SELECT doc_id, unnest(w) AS word FROM t),
           |dw AS (SELECT DISTINCT word FROM words WHERE len(word) >= 1),
           |pos AS (SELECT word, unnest(range(1, len(word) + 1)) AS p FROM dw),
           |jmp AS (SELECT pos.word, pos.p,
           |    coalesce(max(len(v.tok)), 1) AS step,
           |    coalesce(max_by(v.tid, len(v.tok)), 0) AS tid,
           |    max(len(v.tok)) IS NULL AS unk
           |  FROM pos LEFT JOIN v ON substring(pos.word, pos.p, len(v.tok)) = v.tok
           |  GROUP BY pos.word, pos.p),
           |wk(word, p, nt, nu, ids) AS (
           |  SELECT word, CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM dw
           |  UNION ALL
           |  SELECT wk.word, wk.p + j.step, wk.nt + 1,
           |    wk.nu + (CASE WHEN j.unk THEN 1 ELSE 0 END), wk.ids + j.tid
           |  FROM wk JOIN jmp j ON j.word = wk.word AND j.p = wk.p
           |  WHERE wk.p <= len(wk.word)),
           |res AS (SELECT word, nt AS nsub, nu AS nunk, ids FROM wk WHERE p > len(word))
           |SELECT words.doc_id, CAST(count(*) AS BIGINT) AS n_words,
           |CAST(sum(res.nsub) AS BIGINT) AS n_subwords,
           |CAST(sum(res.nunk) AS BIGINT) AS n_unk,
           |CAST(sum(res.ids) AS BIGINT) AS id_sum
           |FROM words JOIN res USING (word)
           |GROUP BY words.doc_id ORDER BY doc_id ASC""".stripMargin
      }),

    // FUZZY decontamination: MinHash-banded near-match of training docs
    // against a benchmark side (docs with id % 25 == 0 stand in for the
    // eval set). The oracle computes the EXACT all-cross-pairs shingle
    // Jaccard at this threshold — equality proves the banded plan's
    // recall is 1 at fixture scale while the engine side never goes
    // train×bench.
    NamedQuery("q156_fuzzy_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Decontaminate.fuzzyContaminationPairs(
          docs.filter(col("doc_id") % 25 =!= 0), col("doc_id"), col("text"),
          docs.filter(col("doc_id") % 25 === 0), col("doc_id"), col("text"))
          .orderBy(col("doc_id").asc, col("bench_id").asc)
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
             |sh AS (SELECT doc_id,
             |  list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS ss
             |  FROM t WHERE len(w) >= 3),
             |tr AS (SELECT * FROM sh WHERE doc_id % 25 <> 0),
             |be AS (SELECT * FROM sh WHERE doc_id % 25 = 0)
             |SELECT tr.doc_id AS doc_id, be.doc_id AS bench_id,
             |round(len(list_intersect(tr.ss, be.ss))::DOUBLE /
             |      len(list_distinct(list_concat(tr.ss, be.ss))), 6) AS jaccard
             |FROM tr JOIN be ON true
             |WHERE len(list_intersect(tr.ss, be.ss))::DOUBLE /
             |      len(list_distinct(list_concat(tr.ss, be.ss))) >= 0.5
             |ORDER BY 1, 2""".stripMargin)),

    // CAPSTONE v2 — the round-11/12 dedup operators composed into the
    // curation pass as ONE declarative plan: exact dedup keep-list →
    // near-dup CLUSTER keep-list (minhash pairs → connected components,
    // representatives only) → cross-doc span-duplication gate → token-
    // budget mixture. The oracle chains each stage's already-proven
    // mirror (q50 / q150 / q152 / q122) over the same intermediate
    // corpora, so the composition is hash-verified end to end.
    NamedQuery("q157_curation_v2",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val keepIds = Dedup.exactDuplicateGroups(
            docs, col("doc_id"), col("text"))
          .select(col("keep_id").as("doc_id"))
        val deduped = docs.join(keepIds, Seq("doc_id"), "left_semi")
        val clusters = Dedup.nearDupClusters(
          Dedup.minHashPairs(deduped, col("doc_id"), col("text"),
            shingleK = 3, numHashes = 32, bands = 8, threshold = 0.8))
        val reps = deduped.join(
          clusters.filter(col("doc_id") =!= col("cluster_id"))
            .select("doc_id"),
          Seq("doc_id"), "left_anti")
        val spanOk = Dedup.crossDocSpanStats(
            reps, col("doc_id"), col("text"), k = 8)
          .filter(col("dup_span_frac") <= 0.5).select("doc_id")
        val gated = reps.join(spanOk, Seq("doc_id"), "left_semi")
        Mixture.tokenBudgetSample(gated, col("source"), col("doc_id"),
            TextAnalysis.tokenCount(col("text")),
            TextAnalysis.qualityScore(col("text")), F.lit(300L))
          .filter(col("kept"))
          .select(col("doc_id"), col("stratum").as("source"),
            col("n_tokens"), col("cum_tokens"))
          .orderBy(col("source").asc, col("cum_tokens").asc)
      },
      Some("""WITH RECURSIVE
             |keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
             |d AS (SELECT doc.* FROM documents doc JOIN keep USING (doc_id)),
             |t AS (SELECT doc_id, source, text, string_split_regex(trim(text), '\s+') AS w FROM d),
             |sh AS (SELECT doc_id,
             |  list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS ss
             |  FROM t WHERE len(w) >= 3),
             |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.ss, b.ss))::DOUBLE /
             |        len(list_distinct(list_concat(a.ss, b.ss))) >= 0.8),
             |e AS (SELECT a_id AS src, b_id AS dst FROM p UNION SELECT b_id, a_id FROM p),
             |reach(id, r) AS (
             |  SELECT src, src FROM e
             |  UNION
             |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id),
             |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
             |k2 AS (SELECT t.* FROM t LEFT JOIN cl USING (doc_id)
             |  WHERE cl.cluster_id IS NULL OR cl.cluster_id = t.doc_id),
             |sp AS (SELECT doc_id,
             |  unnest([array_to_string(w[i:i+7], ' ') for i in range(1, len(w) - 6)]) AS span
             |  FROM k2 WHERE len(w) >= 8),
             |nd AS (SELECT span, count(DISTINCT doc_id) AS ndocs FROM sp GROUP BY span),
             |pd AS (SELECT sp.doc_id, count(*) AS n_spans,
             |    sum(CASE WHEN nd.ndocs > 1 THEN 1 ELSE 0 END) AS n_dup
             |  FROM sp JOIN nd USING (span) GROUP BY sp.doc_id),
             |gated AS (SELECT k2.* FROM k2 LEFT JOIN pd USING (doc_id)
             |  WHERE coalesce(round(CASE WHEN pd.n_spans > 0
             |          THEN pd.n_dup::DOUBLE / pd.n_spans ELSE 0.0 END, 6), 0.0) <= 0.5),
             |sc AS (
             |  SELECT doc_id, source, len(w) AS n_tokens,
             |    round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))::DOUBLE /
             |          greatest(length(text), 1), 6) AS punct_ratio,
             |    round(len(list_filter(w, x -> list_contains(
             |      ['the','a','an','and','of','to','is','in','it','that'], x)))::DOUBLE /
             |          greatest(len(w), 1), 6) AS stopword_ratio
             |  FROM gated),
             |q AS (
             |  SELECT doc_id, source, n_tokens,
             |    round(least(n_tokens / 100.0, 1.0) * 0.5 +
             |          (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.3 +
             |          least(stopword_ratio * 5.0, 1.0) * 0.2, 6) AS quality
             |  FROM sc),
             |sel AS (
             |  SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
             |    CAST(sum(n_tokens) OVER (PARTITION BY source
             |      ORDER BY quality DESC, doc_id ASC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |      AS cum_tokens
             |  FROM q)
             |SELECT doc_id, source, n_tokens, cum_tokens FROM sel
             |WHERE cum_tokens <= 300
             |ORDER BY source ASC, cum_tokens ASC""".stripMargin)),

    // DSIR importance resampling (Xie et al. 2302.03169): select raw
    // docs whose hashed-n-gram distribution resembles a target corpus
    // (docs with id % 10 == 0 stand in for the quality set). The oracle
    // re-derives EVERY formula — md5 bucket hash, add-1 smoothed bucket
    // log-probs on both sides, per-doc Σ c_b·Δlogp, and the
    // deterministic Gumbel top-k key — so equality proves the whole
    // pipeline is a pure function of row identity, not of engine or
    // partitioning.
    NamedQuery("q158_dsir_sample",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Importance.dsirSample(
            docs.filter(col("doc_id") % 10 =!= 0), col("doc_id"), col("text"),
            docs.filter(col("doc_id") % 10 === 0), col("text"), k = 25)
          .select(col("doc_id"), F.round(col("log_w"), 6).as("log_w"),
            F.round(col("dsir_key"), 6).as("dsir_key"))
          .orderBy(col("dsir_key").desc, col("doc_id").asc)
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
             |g AS (SELECT doc_id, unnest(list_concat(w,
             |    [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))])) AS gram
             |  FROM t),
             |bk AS (SELECT doc_id,
             |    CAST(CAST(('0x' || substring(md5(gram), 1, 8)) AS UBIGINT) % 4096 AS BIGINT) AS bucket
             |  FROM g),
             |feats AS (SELECT doc_id, bucket, count(*) AS cnt FROM bk
             |  WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
             |rawc AS (SELECT bucket, sum(cnt) AS c FROM feats GROUP BY 1),
             |rawn AS (SELECT sum(c) AS n FROM rawc),
             |tgtc AS (SELECT bucket, count(*) AS c FROM bk
             |  WHERE doc_id % 10 = 0 GROUP BY 1),
             |tgtn AS (SELECT sum(c) AS n FROM tgtc),
             |buckets AS (SELECT unnest(range(0, 4096)) AS bucket),
             |model AS (SELECT buckets.bucket,
             |    ln((coalesce(tgtc.c, 0) + 1.0) / (tgtn.n + 4096.0)) -
             |    ln((coalesce(rawc.c, 0) + 1.0) / (rawn.n + 4096.0)) AS dlog
             |  FROM buckets LEFT JOIN tgtc USING (bucket)
             |  LEFT JOIN rawc USING (bucket), tgtn, rawn),
             |sc AS (SELECT feats.doc_id, sum(feats.cnt * model.dlog) AS log_w
             |  FROM feats JOIN model USING (bucket) GROUP BY 1),
             |keyed AS (SELECT a.doc_id, coalesce(sc.log_w, 0.0) AS log_w,
             |    coalesce(sc.log_w, 0.0) - ln(-ln(
             |      (CAST(('0x' || substring(md5(CAST(a.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 0.5)
             |      / 4294967296.0)) AS k
             |  FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) a
             |  LEFT JOIN sc USING (doc_id)),
             |top AS (SELECT doc_id, log_w, k,
             |    row_number() OVER (ORDER BY k DESC, doc_id ASC) AS rn FROM keyed)
             |SELECT doc_id, round(log_w, 6) AS log_w, round(k, 6) AS dsir_key
             |FROM top WHERE rn <= 25
             |ORDER BY dsir_key DESC, doc_id ASC""".stripMargin)),

    // deterministic shard plan: the audit face of the shuffle-and-shard
    // writer (Sharding.shardStats) — per-shard membership, token mass,
    // order ENDPOINTS under the (shuffle_key, id) order, and the key
    // checksum. The oracle recomputes the md5 shard hash, the order
    // key, and the endpoint argmin/argmax — equality proves the emitted
    // training stream is a pure function of row identity.
    NamedQuery("q159_shard_plan",
      (s, d) => graft.llm.Sharding.shardStats(
          Tables.documents(s, d), col("doc_id"),
          TextAnalysis.tokenCount(col("text")), shards = 8)
        .orderBy(col("shard").asc),
      Some("""WITH a AS (SELECT doc_id,
             |    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 8 AS BIGINT) AS shard,
             |    (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 0.5) / 4294967296.0 AS sk,
             |    len(string_split_regex(trim(text), '\s+')) AS nt
             |  FROM documents),
             |agg AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(nt) AS BIGINT) AS n_tokens,
             |    round(sum(sk), 6) AS key_sum
             |  FROM a GROUP BY shard),
             |r AS (SELECT shard, doc_id,
             |    row_number() OVER (PARTITION BY shard ORDER BY sk ASC, doc_id ASC) AS rn,
             |    count(*) OVER (PARTITION BY shard) AS cnt
             |  FROM a),
             |fl AS (SELECT shard,
             |    max(CASE WHEN rn = 1 THEN doc_id END) AS first_doc,
             |    max(CASE WHEN rn = cnt THEN doc_id END) AS last_doc
             |  FROM r GROUP BY shard)
             |SELECT agg.shard, n_docs, n_tokens, first_doc, last_doc, key_sum
             |FROM agg JOIN fl USING (shard) ORDER BY shard ASC""".stripMargin))
  )
}
