package graft.queries

import graft.cubes.Tables
import graft.functions.KmvSketch
import graft.llm.{Bpe, Pii}
import graft.operators.Joins
import graft.sources.Layout
import org.apache.spark.sql.{functions => F}

/** Round-12 curation/layout additions: PII scrubbing, the KMV/theta
  * distinct sketch with direct set-intersection estimates, the banded
  * range join, and the Z-order layout key. Exact DuckDB replays where
  * SQL can express the computation (PII, range join, z-key); the
  * sketch estimates follow the exact-anchored invariant pattern of
  * q96/q101 — the oracle recomputes the exact cardinalities, the
  * engine emits the estimate's bound verdict, and a wrong estimate
  * breaks the hash.
  */
object CurateQueries {
  import org.apache.spark.sql.functions.col

  /** The deterministic PII augmentation shared by q163 and the v3
    * capstone: address/phone/IP derived from doc_id, identical on the
    * oracle side ([[augmentSql]]). */
  private def plantedPii(text: org.apache.spark.sql.Column) = F.concat(
    text, F.lit(" reach user"), col("doc_id").cast("string"),
    F.lit("@ex-mail.org via 10."),
    (col("doc_id") % 256).cast("string"), F.lit(".0."),
    ((col("doc_id") * 7) % 256).cast("string"),
    F.lit(" or call +1 555-"),
    F.lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
    F.lit("-0199 now"))

  /** PII planted deterministically from doc identity — the fixtures'
    * synthetic prose contains none, so both engine and oracle append
    * the SAME address/phone/IP derived from doc_id and the scrub is
    * exercised on every row. */
  private val augmentSql =
    """SELECT doc_id,
      |  text || ' reach user' || CAST(doc_id AS VARCHAR) ||
      |  '@ex-mail.org via 10.' || CAST(doc_id % 256 AS VARCHAR) ||
      |  '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) ||
      |  ' or call +1 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
      |  '-0199 now' AS t
      |FROM documents""".stripMargin

  val qs: Seq[NamedQuery] = Seq(

    // PII scrub: per-doc hit counts by type, the gate flag, and the md5
    // of the redacted text (proving every replacement site and order).
    // Row-local codegen'd regexps — map-only at any scale. The oracle
    // replays the identical patterns in DuckDB (RE2∩Java dialect only).
    NamedQuery("q163_pii_scrub",
      (s, d) => {
        val aug = Tables.documents(s, d).select(col("doc_id"),
          plantedPii(col("text")).as("text"))
        Pii.scrub(aug, col("doc_id"), col("text"))
          .select(col("doc_id"), col("n_email"), col("n_phone"),
            col("n_ip"), col("has_pii"),
            F.md5(col("text_redacted")).as("redacted_md5"))
          .orderBy(col("doc_id").asc)
      },
      Some(s"""WITH a AS ($augmentSql),
             |c AS (SELECT doc_id, t,
             |  len(regexp_extract_all(t, '${Pii.EmailRe}')) AS n_email,
             |  len(regexp_extract_all(t, '${Pii.PhoneRe}')) AS n_phone,
             |  len(regexp_extract_all(t, '${Pii.Ipv4Re}')) AS n_ip
             |  FROM a)
             |SELECT doc_id, n_email, n_phone, n_ip,
             |  (n_email + n_phone + n_ip > 0) AS has_pii,
             |  md5(regexp_replace(regexp_replace(regexp_replace(t,
             |    '${Pii.EmailRe}', '<EMAIL>', 'g'),
             |    '${Pii.PhoneRe}', '<PHONE>', 'g'),
             |    '${Pii.Ipv4Re}', '<IP>', 'g')) AS redacted_md5
             |FROM c ORDER BY doc_id ASC""".stripMargin)),

    // KMV distinct sketch per event type, exact-anchored: the estimate
    // must land within the documented KMV bound of the exact count the
    // oracle recomputes. Sketching event_id (≈2000/type at sf0.01)
    // with k=512 exercises the SATURATED estimator path at the
    // driver's verify scale and the exact identity path at sf0.001 —
    // both under one invariant. k=512 ⇒ σ ≈ 4.4%; the 15% bound is
    // ≈3.4σ of headroom against refixturing.
    NamedQuery("q164_kmv_distinct",
      (s, d) => {
        val k = 512
        val kmv = KmvSketch(k)
        Tables.events(s, d).groupBy(col("event_type"))
          .agg(
            kmv(F.xxhash64(col("event_id"))).as("__sk"),
            F.count_distinct(col("event_id")).as("n_exact"))
          .select(col("event_type"), col("n_exact"),
            (F.abs(KmvSketch.estimateDistinct(col("__sk"), k) - col("n_exact"))
              <= col("n_exact") * 0.15 + 1).as("within_bound"))
          .orderBy(col("event_type").asc)
      },
      Some("""SELECT event_type,
             |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_exact,
             |  true AS within_bound
             |FROM events GROUP BY event_type ORDER BY event_type ASC""".stripMargin)),

    // The reason KMV is here at all: DIRECT |A∩B| / |A∪B| estimates by
    // theta-sketch combine (HLL needs inclusion–exclusion, q148). A =
    // viewers, B = purchasers; one pass builds both sketches via
    // FILTERed aggs, the estimates are pure Column arithmetic over the
    // two arrays, and both are bound-checked against the exact counts
    // the oracle recomputes.
    NamedQuery("q165_kmv_overlap",
      (s, d) => {
        val k = 1024
        val kmv = KmvSketch(k)
        val h = F.xxhash64(col("user_id"))
        val ev = Tables.events(s, d)
        val sk = ev.agg(
          kmv(F.when(col("event_type") === "view", h)).as("a"),
          kmv(F.when(col("event_type") === "purchase", h)).as("b"))
        val exact = ev.agg(
          F.count_distinct(F.when(col("event_type") === "view", col("user_id")))
            .as("__na"),
          F.count_distinct(F.when(col("event_type") === "purchase", col("user_id")))
            .as("__nb"),
          F.count_distinct(
            F.when(col("event_type").isin("view", "purchase"), col("user_id")))
            .as("n_union_exact"))
        val inter = ev.filter(col("event_type") === "view")
          .select(col("user_id")).distinct()
          .intersect(ev.filter(col("event_type") === "purchase")
            .select(col("user_id")).distinct())
          .agg(F.count(F.lit(1)).as("n_inter_exact"))
        sk.crossJoin(exact).crossJoin(inter).select(
          col("n_inter_exact"), col("n_union_exact"),
          (F.abs(KmvSketch.estimateIntersection(col("a"), col("b"), k)
            - col("n_inter_exact")) <= col("n_union_exact") * 0.1 + 2)
            .as("inter_within_bound"),
          (F.abs(KmvSketch.estimateUnion(col("a"), col("b"), k)
            - col("n_union_exact")) <= col("n_union_exact") * 0.1 + 2)
            .as("union_within_bound"))
      },
      Some("""SELECT
             |  CAST((SELECT count(*) FROM
             |    (SELECT user_id FROM events WHERE event_type = 'view'
             |     INTERSECT
             |     SELECT user_id FROM events WHERE event_type = 'purchase'))
             |    AS BIGINT) AS n_inter_exact,
             |  CAST((SELECT count(DISTINCT user_id) FROM events
             |    WHERE event_type IN ('view', 'purchase'))
             |    AS BIGINT) AS n_union_exact,
             |  true AS inter_within_bound,
             |  true AS union_within_bound""".stripMargin)),

    // Banded range join: unequal-width value bands (derived
    // deterministically from nation so both engines build the same dim)
    // joined to events by interval containment — via the bucket
    // equi-key, never a nested-loop (EngineSpec asserts the plan).
    // Oracle does the naive BETWEEN join, exact per-band aggregates.
    NamedQuery("q166_range_join",
      (s, d) => {
        val nk = col("n_nationkey")
        val bands = Tables.nation(s, d).select(
          nk.as("band_id"),
          (nk * nk * 0.7).as("lo"),
          (nk * nk * 0.7 + 15.0 + (nk % 5) * 25.0).as("hi"))
        Joins.rangeJoinBanded(
            Tables.events(s, d), col("value"), bands, "lo", "hi",
            bucketWidth = 16.0)
          .groupBy(col("band_id"))
          .agg(F.count(F.lit(1)).as("n_events"),
            F.round(F.sum(col("value")), 2).as("sum_value"))
          .orderBy(col("band_id").asc)
      },
      Some("""WITH bands AS (SELECT n_nationkey AS band_id,
             |  n_nationkey * n_nationkey * 0.7 AS lo,
             |  n_nationkey * n_nationkey * 0.7 + 15.0 + (n_nationkey % 5) * 25.0 AS hi
             |  FROM nation)
             |SELECT band_id, CAST(count(*) AS BIGINT) AS n_events,
             |  round(sum(e.value), 2) AS sum_value
             |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
             |GROUP BY band_id ORDER BY band_id ASC""".stripMargin),
      ),

    // Z-order layout key: the exact Morton interleave every row would
    // be clustered by (bits=8 per axis, fixed [0,2048)/[0,512) domains
    // — literals by design, layout keys must not depend on data stats).
    // Grouped by z so EVERY row's key is pinned by (count, id-sum)
    // without dumping the full table. The oracle replays the bucket
    // clamp and the full bit interleave in SQL.
    NamedQuery("q167_zorder_key",
      (s, d) => {
        val bits = 8
        val bu = Layout.axisBucket(col("user_id"), 0.0, 2048.0, bits)
        val bv = Layout.axisBucket(col("value"), 0.0, 512.0, bits)
        Tables.events(s, d)
          .select(col("event_id"),
            Layout.zValue(bu, bv, bits).as("z"))
          .groupBy(col("z"))
          .agg(F.count(F.lit(1)).as("n"),
            F.sum(col("event_id")).as("id_sum"))
          .orderBy(col("z").asc)
      },
      Some {
        val bu = "least(greatest(CAST(floor((CAST(user_id AS DOUBLE) - 0.0) / 2048.0 * 256) AS BIGINT), 0), 255)"
        val bv = "least(greatest(CAST(floor((CAST(value AS DOUBLE) - 0.0) / 512.0 * 256) AS BIGINT), 0), 255)"
        val inter = (0 until 8).map { i =>
          s"(((bu >> $i) & 1) << ${2 * i}) | (((bv >> $i) & 1) << ${2 * i + 1})"
        }.mkString(" | ")
        s"""WITH b AS (SELECT event_id, $bu AS bu, $bv AS bv FROM events),
           |z AS (SELECT event_id, $inter AS z FROM b)
           |SELECT z, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(event_id) AS BIGINT) AS id_sum
           |FROM z GROUP BY z ORDER BY z ASC""".stripMargin
      }),

    // BPE merge training, replayed ROUND BY ROUND by the oracle: the
    // word-frequency table (the only corpus-wide aggregation), then per
    // round the weighted pair argmax (count DESC, a ASC, b ASC — the
    // engine's exact tie-break) and the greedy left-to-right merge
    // rewrite (list_reduce replays the same non-overlapping fold).
    // Early stop (no pair with count >= 2) composes identically on both
    // sides: an empty m_i empties every later stage, so both emit the
    // same short merge table.
    NamedQuery("q168_bpe_merges",
      (s, d) => {
        val merges = Bpe.trainMerges(
          Tables.documents(s, d), col("text"), nMerges = 8)
        import s.implicits._
        merges.zipWithIndex
          .map { case ((a, b), i) => (i + 1, a, b) }
          .toDF("rank", "a", "b")
          .orderBy(col("rank").asc)
      },
      Some(bpeOracleSql(8)),
      ),

    // the KMV metric THROUGH THE CUBE FRONT DOOR (the q102 shape):
    // slice day × (uniqueUsersKmv, count), exact per-day distincts
    // anchor the oracle, the estimate is bound-checked (k=1024 ⇒
    // σ≈3.1%; 10%+1 ≈ 3σ; exact — σ=0 — below saturation, which is
    // every day at the driver's verify scale). A metric-level FILTER
    // estimate is checked the same way on the purchase arm.
    NamedQuery("q169_parsed_kmv",
      (s, d) => {
        import graft.query.CubeQuery
        val cube = graft.cubes.Cubes.eventsCube(s, d)
        val via = CubeQuery(cube).slice("day", "ts", "day")
          .measure("uniq_est", "uniqueUsersKmv")
          .measureWhen("purch_est", "uniqueUsersKmv",
            graft.query.Pred.Op("eventType", "eq", Some("purchase")))
          .measure("cnt", "count").toDF
        val exact = Tables.events(s, d)
          .groupBy(col("ts").cast("date").as("day"))
          .agg(F.count_distinct(col("user_id")).as("n_exact"),
            F.count_distinct(
              F.when(col("event_type") === "purchase", col("user_id")))
              .as("n_purch_exact"),
            F.count(F.lit(1)).as("__n"))
        via.join(exact, "day").select(
          col("day"), col("n_exact"), col("n_purch_exact"),
          (F.abs(col("uniq_est") - col("n_exact")) <= col("n_exact") * 0.1 + 1)
            .as("est_within_bound"),
          (F.abs(col("purch_est") - col("n_purch_exact"))
            <= col("n_purch_exact") * 0.1 + 1).as("filtered_within_bound"),
          (col("cnt") === col("__n")).as("count_exact"))
          .orderBy(col("day").asc)
      },
      Some("""SELECT CAST(ts AS DATE) AS day,
             |CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
             |CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
             |  THEN user_id END) AS BIGINT) AS n_purch_exact,
             |true AS est_within_bound, true AS filtered_within_bound,
             |true AS count_exact
             |FROM events GROUP BY 1 ORDER BY day ASC""".stripMargin)),

    // KMV ROLLUP (the q101 pre-aggregation shape, stronger claim):
    // daily sketch cells unioned over a range must be BIT-IDENTICAL to
    // sketching the range's raw rows — KMV is a pure function of the
    // value set, so cell union has ZERO estimate drift, not just a
    // lossless-within-error bound. Exact distinct anchors the oracle.
    NamedQuery("q170_kmv_rollup",
      (s, d) => {
        val k = 1024
        val kmv = KmvSketch(k)
        val kun = KmvSketch.unionAgg(k)
        val ev = Tables.events(s, d).withColumn("day", F.to_date(col("ts")))
        val lo = F.lit("2024-01-08").cast("date")
        val hi = F.lit("2024-01-22").cast("date")
        val daily = ev.groupBy(col("day"))
          .agg(kmv(F.xxhash64(col("user_id"))).as("__sk"))
        val rolled = daily.filter(col("day") >= lo && col("day") < hi)
          .agg(kun(col("__sk")).as("__roll"))
        val direct = ev.filter(col("day") >= lo && col("day") < hi)
          .agg(kmv(F.xxhash64(col("user_id"))).as("__direct"),
            F.count_distinct(col("user_id")).as("n_exact"))
        rolled.crossJoin(direct).select(
          col("n_exact"),
          (col("__roll") === col("__direct")).as("rollup_bit_identical"),
          (F.abs(KmvSketch.estimateDistinct(col("__roll"), k) - col("n_exact"))
            <= col("n_exact") * 0.1 + 1).as("est_within_bound"))
      },
      Some("""SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
             |true AS rollup_bit_identical, true AS est_within_bound
             |FROM events
             |WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
             |  AND CAST(ts AS DATE) < DATE '2024-01-22'""".stripMargin)),

    // CURATION CAPSTONE v3 — the round-12b ops composed as ONE plan,
    // in the order a real pipeline runs them: PII scrub FIRST (so
    // dedup sees canonical text — two docs differing only in planted
    // addresses collapse AFTER redaction, which is exactly why
    // scrub-before-dedup matters), exact dedup on the REDACTED text,
    // Gopher 3-gram repetition gate, then a token-budget mixture
    // priced in VOCABULARY-TRUE subword tokens (SubwordEncode) instead
    // of whitespace words. The oracle chains the proven q163 / q50 /
    // q114 / q155 / q122 mirrors over the same intermediate corpora.
    NamedQuery("q171_curation_v3",
      (s, d) => {
        import graft.llm.{Dedup, Mixture, Pii, TextAnalysis}
        val aug = Tables.documents(s, d).select(
          col("doc_id"), col("source"), plantedPii(col("text")).as("text"))
        val red = aug.select(col("doc_id"), col("source"),
          Pii.redact(col("text")).as("rtext"))
        val keep = Dedup.exactDuplicateGroups(red, col("doc_id"), col("rtext"))
          .select(col("keep_id").as("doc_id"))
        val deduped = red.join(keep, Seq("doc_id"), "left_semi")
        val gated = deduped.filter(
          TextAnalysis.dupNgramFraction(col("rtext"), 3) <= 0.2)
        Mixture.tokenBudgetSample(gated, col("source"), col("doc_id"),
            TextAnalysis.subwordCount(col("rtext"), TextAnalysis.DemoVocab),
            TextAnalysis.qualityScore(col("rtext")), F.lit(800L))
          .filter(col("kept"))
          .select(col("doc_id"), col("stratum").as("source"),
            col("n_tokens"), col("cum_tokens"))
          .orderBy(col("source").asc, col("cum_tokens").asc)
      },
      Some {
        val values = graft.llm.TextAnalysis.DemoVocab.zipWithIndex
          .map { case (t, i) => s"('$t', ${i + 1})" }.mkString(",")
        s"""WITH RECURSIVE v(tok, tid) AS (VALUES $values),
           |a AS (SELECT doc_id, source,
           |  text || ' reach user' || CAST(doc_id AS VARCHAR) ||
           |  '@ex-mail.org via 10.' || CAST(doc_id % 256 AS VARCHAR) ||
           |  '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) ||
           |  ' or call +1 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
           |  '-0199 now' AS t
           |  FROM documents),
           |r AS (SELECT doc_id, source,
           |  regexp_replace(regexp_replace(regexp_replace(t,
           |    '${Pii.EmailRe}', '<EMAIL>', 'g'),
           |    '${Pii.PhoneRe}', '<PHONE>', 'g'),
           |    '${Pii.Ipv4Re}', '<IP>', 'g') AS rt
           |  FROM a),
           |keep AS (SELECT min(doc_id) AS doc_id FROM r GROUP BY md5(rt)),
           |d AS (SELECT r.* FROM r JOIN keep USING (doc_id)),
           |t AS (SELECT doc_id, source, rt,
           |  string_split_regex(trim(rt), '\\s+') AS w FROM d),
           |g AS (SELECT doc_id, CASE WHEN len(w) >= 3
           |    THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]
           |    ELSE [] END AS g3 FROM t),
           |rep AS (SELECT doc_id, CASE WHEN len(g3) > 0
           |    THEN round(1 - len(list_distinct(g3))::DOUBLE / len(g3), 6)
           |    ELSE 0.0 END AS dup3 FROM g),
           |gated AS (SELECT t.* FROM t JOIN rep USING (doc_id)
           |  WHERE rep.dup3 <= 0.2),
           |words AS (SELECT doc_id, unnest(w) AS word FROM gated),
           |dw AS (SELECT DISTINCT word FROM words WHERE len(word) >= 1),
           |pos AS (SELECT word, unnest(range(1, len(word) + 1)) AS p FROM dw),
           |jmp AS (SELECT pos.word, pos.p,
           |    coalesce(max(len(v.tok)), 1) AS step,
           |    coalesce(max_by(v.tid, len(v.tok)), 0) AS tid
           |  FROM pos LEFT JOIN v ON substring(pos.word, pos.p, len(v.tok)) = v.tok
           |  GROUP BY pos.word, pos.p),
           |wk(word, p, nt) AS (
           |  SELECT word, CAST(1 AS BIGINT), CAST(0 AS BIGINT) FROM dw
           |  UNION ALL
           |  SELECT wk.word, wk.p + j.step, wk.nt + 1
           |  FROM wk JOIN jmp j ON j.word = wk.word AND j.p = wk.p
           |  WHERE wk.p <= len(wk.word)),
           |res AS (SELECT word, nt AS nsub FROM wk WHERE p > len(word)),
           |sub AS (SELECT words.doc_id, CAST(sum(res.nsub) AS BIGINT) AS n_sub
           |  FROM words JOIN res USING (word) GROUP BY words.doc_id),
           |sc AS (
           |  SELECT doc_id, source, len(w) AS n_words,
           |    round((length(rt) - length(regexp_replace(lower(rt), '[^a-z0-9 ]', '', 'g')))::DOUBLE /
           |          greatest(length(rt), 1), 6) AS punct_ratio,
           |    round(len(list_filter(w, x -> list_contains(
           |      ['the','a','an','and','of','to','is','in','it','that'], x)))::DOUBLE /
           |          greatest(len(w), 1), 6) AS stopword_ratio
           |  FROM gated),
           |q AS (
           |  SELECT doc_id, source,
           |    round(least(n_words / 100.0, 1.0) * 0.5 +
           |          (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.3 +
           |          least(stopword_ratio * 5.0, 1.0) * 0.2, 6) AS quality
           |  FROM sc),
           |sel AS (
           |  SELECT q.doc_id, q.source, CAST(sub.n_sub AS INT) AS n_tokens,
           |    CAST(sum(sub.n_sub) OVER (PARTITION BY q.source
           |      ORDER BY q.quality DESC, q.doc_id ASC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS cum_tokens
           |  FROM q JOIN sub USING (doc_id))
           |SELECT doc_id, source, n_tokens, cum_tokens FROM sel
           |WHERE cum_tokens <= 800
           |ORDER BY source ASC, cum_tokens ASC""".stripMargin
      }),

    // Incremental exact-dup screen: arrivals (doc_id % 3 == 0) against
    // the history (the rest) via a broadcast Bloom of history hashes +
    // an exact md5 semi-join probed ONLY by bloom positives. The
    // oracle recomputes is_dup exactly (text equality); bloom_hit
    // itself is implementation detail, surfaced through the Bloom
    // no-false-negative invariant is_dup ⇒ bloom_hit.
    NamedQuery("q172_bloom_screen",
      (s, d) => {
        import graft.llm.Dedup
        val docs = Tables.documents(s, d)
        val hist = docs.filter(col("doc_id") % 3 =!= 0)
        val arr = docs.filter(col("doc_id") % 3 === 0)
        Dedup.bloomExactScreen(arr, col("doc_id"), col("text"),
            Dedup.historyBloom(hist, col("text"), expectedItems = 10000L),
            hist.select(F.md5(col("text"))).distinct())
          .select(col("doc_id"), col("is_dup"),
            (col("bloom_hit") || !col("is_dup")).as("no_false_negative"))
          .orderBy(col("doc_id").asc)
      },
      Some("""SELECT a.doc_id,
             |  EXISTS (SELECT 1 FROM documents h
             |          WHERE h.doc_id % 3 <> 0 AND h.text = a.text) AS is_dup,
             |  true AS no_false_negative
             |FROM documents a WHERE a.doc_id % 3 = 0
             |ORDER BY a.doc_id ASC""".stripMargin)),

    // the full KMV set algebra in one pass: difference (inexpressible
    // under HLL at any cost) and 3-way intersection, all from the same
    // three FILTERed sketches, each bound-checked against the exact
    // counts the oracle recomputes.
    NamedQuery("q173_kmv_algebra",
      (s, d) => {
        val k = 1024
        val kmv = KmvSketch(k)
        val h = F.xxhash64(col("user_id"))
        val ev = Tables.events(s, d)
        def sk(t: String) = kmv(F.when(col("event_type") === t, h))
        val sks = ev.agg(sk("view").as("a"), sk("signup").as("b"),
          sk("purchase").as("c"))
        val exact = ev.agg(
          F.count_distinct(F.when(col("event_type") === "view", col("user_id")))
            .as("__nv"),
          F.count_distinct(
            F.when(col("event_type").isin("view", "signup", "purchase"),
              col("user_id"))).as("n_any_exact"))
        val viewNotSignup = ev.filter(col("event_type") === "view")
          .select(col("user_id")).distinct()
          .exceptAll(ev.filter(col("event_type") === "signup")
            .select(col("user_id")).distinct())
          .agg(F.count(F.lit(1)).as("n_diff_exact"))
        val all3 = ev.filter(col("event_type") === "view")
          .select(col("user_id")).distinct()
          .intersect(ev.filter(col("event_type") === "signup")
            .select(col("user_id")).distinct())
          .intersect(ev.filter(col("event_type") === "purchase")
            .select(col("user_id")).distinct())
          .agg(F.count(F.lit(1)).as("n_tri_exact"))
        sks.crossJoin(exact).crossJoin(viewNotSignup).crossJoin(all3).select(
          col("n_diff_exact"), col("n_tri_exact"),
          (F.abs(KmvSketch.estimateDifference(col("a"), col("b"), k)
            - col("n_diff_exact")) <= col("n_any_exact") * 0.1 + 2)
            .as("diff_within_bound"),
          (F.abs(KmvSketch.estimateIntersection3(
              col("a"), col("b"), col("c"), k)
            - col("n_tri_exact")) <= col("n_any_exact") * 0.1 + 2)
            .as("tri_within_bound"))
      },
      Some("""SELECT
             |  CAST((SELECT count(*) FROM
             |    (SELECT user_id FROM events WHERE event_type = 'view'
             |     EXCEPT
             |     SELECT user_id FROM events WHERE event_type = 'signup'))
             |    AS BIGINT) AS n_diff_exact,
             |  CAST((SELECT count(*) FROM
             |    (SELECT user_id FROM events WHERE event_type = 'view'
             |     INTERSECT
             |     SELECT user_id FROM events WHERE event_type = 'signup'
             |     INTERSECT
             |     SELECT user_id FROM events WHERE event_type = 'purchase'))
             |    AS BIGINT) AS n_tri_exact,
             |  true AS diff_within_bound, true AS tri_within_bound""".stripMargin)),

    // TRAINED quality classifier: logistic regression over hashed
    // n-gram frequencies, 5 batch-GD steps (supervision: "is this doc
    // from the curated reference source src0"). Weights live on a 1e-9
    // grid after every step, so the model is an exact, engine-
    // independent function of the corpus — the oracle re-trains it in
    // SQL, replaying every score/residual/gradient/update round, and
    // the final weight table must match to 6 decimals.
    NamedQuery("q174_quality_classifier",
      (s, d) => {
        import graft.llm.Classifier
        val model = Classifier.trainLogReg(
          Tables.documents(s, d), col("doc_id"), col("text"),
          (col("source") === "src0").cast("int"),
          buckets = 32, iters = 5, lr = 0.5)
        import s.implicits._
        ((-1, model.bias) +: model.w.zipWithIndex.toSeq
          .map { case (wv, i) => (i, wv) })
          .toDF("bucket", "weight")
          .select(col("bucket"), F.round(col("weight"), 6).as("weight"))
          .orderBy(col("bucket").asc)
      },
      Some(logRegOracleSql(buckets = 32, iters = 5, lr = 0.5))),

    // the trained classifier THROUGH THE CUBE FRONT DOOR: per-source
    // average model probability (src0 — the supervision target — must
    // read highest), model re-trained in-plan on the
    // selector-filtered corpus (the avgDsirWeight plan-backed
    // contract). The oracle re-trains on the same filtered relation
    // and replays the scoring join, docs without features at
    // sigmoid(bias).
    NamedQuery("q175_parsed_classifier",
      (s, d) => {
        import graft.parse.QueryParser
        QueryParser.parse(graft.cubes.Cubes.documentsCube(s, d),
          """{ "cube": "documents",
            |  "args": { "nChars": {"gt": 100}, "options": {"asc": "source"} },
            |  "fields": [
            |    {"name": "source"},
            |    {"name": "count", "alias": "n_docs"},
            |    {"name": "avgModelQuality", "alias": "avg_q"} ] }""".stripMargin)
          .query.toDF
      },
      Some(s"""WITH d AS MATERIALIZED (SELECT * FROM documents WHERE n_chars > 100),
             |${logRegCtes(32, "d")},
             |${logRegRounds(5, 0.5)},
             |sc AS MATERIALIZED (SELECT f.doc_id, sum(f.x * w.w) AS z
             |  FROM feats f JOIN w5 w ON w.b = f.bucket GROUP BY 1),
             |p AS (SELECT d.doc_id, d.source,
             |    1.0 / (1.0 + exp(-(coalesce(sc.z, 0.0) +
             |      (SELECT w FROM w5 WHERE b = -1)))) AS p
             |  FROM d LEFT JOIN sc USING (doc_id))
             |SELECT source, count(*) AS n_docs, round(avg(p), 6) AS avg_q
             |FROM p GROUP BY 1
             |ORDER BY source ASC NULLS FIRST, n_docs ASC, avg_q ASC""".stripMargin)),

    // domain governance: URLs synthesized deterministically from doc
    // identity (the PII-planting trick — the fixture has no url
    // column), parsed into host/registered-domain/TLD/path-depth, then
    // the per-domain contribution cap (5 best-by-quality docs per
    // registered domain). Output aggregates per domain; the oracle
    // replays the string surgery AND the cap window exactly.
    NamedQuery("q176_domain_cap",
      (s, d) => {
        import graft.llm.{Domains, TextAnalysis}
        val withUrl = Tables.documents(s, d).withColumn("url",
          F.concat(F.lit("https://sub"), (col("doc_id") % 7).cast("string"),
            F.lit(".site"), (col("doc_id") % 13).cast("string"),
            F.lit(".example/p"), (col("doc_id") % 3).cast("string"),
            F.lit("/"), col("doc_id").cast("string")))
        Domains.capPerDomain(withUrl, col("doc_id"), col("url"),
            TextAnalysis.qualityScore(col("text")), n = 5)
          .withColumn("tld", graft.llm.Domains.tld(col("url")))
          .withColumn("depth", graft.llm.Domains.pathDepth(col("url")))
          .groupBy(col("domain"))
          .agg(F.count(F.lit(1)).as("n_docs"),
            F.sum(F.when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            F.sum(F.when(col("kept"), col("doc_id"))).as("kept_id_sum"),
            F.first(col("tld")).as("tld"),
            F.max(col("depth")).as("max_depth"))
          .orderBy(col("domain").asc)
      },
      Some("""WITH u AS (SELECT doc_id, text,
             |    'https://sub' || CAST(doc_id % 7 AS VARCHAR) ||
             |    '.site' || CAST(doc_id % 13 AS VARCHAR) ||
             |    '.example/p' || CAST(doc_id % 3 AS VARCHAR) ||
             |    '/' || CAST(doc_id AS VARCHAR) AS url
             |  FROM documents),
             |h AS (SELECT doc_id, text, url,
             |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1) AS host
             |  FROM u),
             |dd AS (SELECT doc_id, url,
             |    array_to_string(string_split(host, '.')[-2:], '.') AS domain,
             |    string_split(host, '.')[-1] AS tld,
             |    len(list_filter(string_split(
             |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]+(/[^?#]*)', 1),
             |      '/'), x -> x <> '')) AS depth,
             |    round(least(len(string_split_regex(trim(text), '\s+')) / 100.0, 1.0) * 0.5 +
             |      (1.0 - least(round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))::DOUBLE /
             |        greatest(length(text), 1), 6) * 5.0, 1.0)) * 0.3 +
             |      least(round(len(list_filter(string_split_regex(trim(text), '\s+'),
             |        x -> list_contains(['the','a','an','and','of','to','is','in','it','that'], x)))::DOUBLE /
             |        greatest(len(string_split_regex(trim(text), '\s+')), 1), 6) * 5.0, 1.0) * 0.2,
             |      6) AS quality
             |  FROM h),
             |k AS (SELECT doc_id, domain, tld, depth,
             |    row_number() OVER (PARTITION BY domain
             |      ORDER BY quality DESC, doc_id ASC) <= 5 AS kept
             |  FROM dd)
             |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(sum(CASE WHEN kept THEN doc_id END) AS BIGINT) AS kept_id_sum,
             |  min(tld) AS tld, CAST(max(depth) AS INT) AS max_depth
             |FROM k GROUP BY domain ORDER BY domain ASC""".stripMargin)),

    // time-decayed aggregates (exponentialTimeDecayed* family): every
    // event weighs exp(-(T-t)/tau) toward the reference instant — ONE
    // plain aggregation, mergeable, no window recursion. The oracle
    // replays the exponentials term for term.
    NamedQuery("q177_decayed_aggs",
      (s, d) => graft.operators.Decay.decayedAggs(
          Tables.events(s, d), col("event_type"), col("ts"), col("value"),
          refTime = "2024-02-01 00:00:00", tauSeconds = 259200.0)
        .withColumnRenamed("key", "event_type")
        .orderBy(col("event_type").asc),
      Some("""SELECT event_type,
             |  round(sum(value * exp(-(epoch_ms(TIMESTAMP '2024-02-01 00:00:00')
             |    - epoch_ms(ts)) / 1000.0 / 259200.0)), 4) AS decayed_sum,
             |  round(sum(exp(-(epoch_ms(TIMESTAMP '2024-02-01 00:00:00')
             |    - epoch_ms(ts)) / 1000.0 / 259200.0)), 6) AS weight_mass,
             |  round(sum(value * exp(-(epoch_ms(TIMESTAMP '2024-02-01 00:00:00')
             |    - epoch_ms(ts)) / 1000.0 / 259200.0)) /
             |    sum(exp(-(epoch_ms(TIMESTAMP '2024-02-01 00:00:00')
             |    - epoch_ms(ts)) / 1000.0 / 259200.0)), 6) AS decayed_avg
             |FROM events GROUP BY 1 ORDER BY event_type ASC""".stripMargin)),

    // behavioral-sequence extraction: gap sessions rendered as ordered
    // action strings — the events table AS a training corpus. The
    // oracle re-sessionizes (the q43 gap mirror) and string_aggs the
    // same deterministic (ts, event_id) order. Split on gap >= 30min:
    // session_window's half-open windows start a NEW session at a gap
    // of exactly the threshold (see Sessions.sessionSequences doc).
    NamedQuery("q178_session_seqs",
      (s, d) => graft.llm.Sessions.sessionSequences(Tables.events(s, d))
        .orderBy(col("user_id").asc, col("session_start").asc),
      Some("""WITH marked AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |         >= INTERVAL 30 MINUTES OR
             |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |    THEN 1 ELSE 0 END AS new_sess
             |  FROM events),
             |sess AS (
             |  SELECT *, sum(new_sess) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marked)
             |SELECT user_id, epoch_ms(min(ts)) AS session_start,
             |  CAST(count(*) AS INT) AS n_events,
             |  string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id ASC, session_start ASC""".stripMargin)),

    // ANALYZE-style per-column statistics in ONE scan: row/null
    // counts, exact NDV, min/max envelopes — plus the HLL NDV estimate
    // surfaced through its exact-anchored bound (the q101 pattern).
    NamedQuery("q179_table_stats",
      (s, d) => graft.sources.Stats.analyze(
          Tables.documents(s, d), Seq("doc_id", "lang", "source", "n_chars"))
        .select(col("column"), col("n_rows"), col("n_nulls"), col("ndv"),
          // 3 sigma of approx_count_distinct's default rsd=0.05
          (F.abs(col("ndv_approx") - col("ndv")) <= col("ndv") * 0.15 + 1)
            .as("approx_ok"),
          col("min_s"), col("max_s"))
        .orderBy(col("column").asc),
      Some("""SELECT * FROM (
             |  SELECT 'doc_id' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
             |    CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |    CAST(count(DISTINCT doc_id) AS BIGINT) AS ndv, true AS approx_ok,
             |    CAST(min(doc_id) AS VARCHAR) AS min_s, CAST(max(doc_id) AS VARCHAR) AS max_s
             |  FROM documents
             |  UNION ALL
             |  SELECT 'lang', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(count(DISTINCT lang) AS BIGINT), true, min(lang), max(lang)
             |  FROM documents
             |  UNION ALL
             |  SELECT 'source', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(count(DISTINCT source) AS BIGINT), true, min(source), max(source)
             |  FROM documents
             |  UNION ALL
             |  SELECT 'n_chars', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(count(DISTINCT n_chars) AS BIGINT), true,
             |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
             |  FROM documents
             |) ORDER BY "column" ASC""".stripMargin)),

    // temperature-scaled corpus mixing (the mT5/XLM-R multilingual
    // recipe): per-source weight ∝ tokens^0.5, a 5000-token global
    // budget allocated by weight, then the greedy per-stratum prefix
    // under each source's OWN allocation — allocation and mixture
    // composed end-to-end, every number (pow, floor, window) replayed
    // by the oracle.
    NamedQuery("q180_temperature_mix",
      (s, d) => {
        import graft.llm.{Mixture, TextAnalysis}
        val docs = Tables.documents(s, d)
        val toks = TextAnalysis.tokenCount(col("text"))
        val alloc = Mixture.temperatureAllocations(
          docs, col("source"), toks, alpha = 0.5, totalBudget = 5000L)
        val withB = docs.select(col("doc_id"), col("source"),
            toks.as("nt"), TextAnalysis.qualityScore(col("text")).as("q"))
          .join(alloc.select(col("stratum").as("source"),
            col("budget_tokens")), "source")
        val mixed = Mixture.tokenBudgetSample(withB, col("source"),
            col("doc_id"), col("nt"), col("q"), col("budget_tokens"))
          .groupBy(col("stratum").as("source"))
          .agg(
            F.sum(F.when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            F.sum(F.when(col("kept"), col("n_tokens").cast("long"))
              .otherwise(0L)).as("kept_tokens"))
        alloc.withColumnRenamed("stratum", "source")
          .join(mixed, "source")
          .select(col("source"), col("n_tokens"), col("weight"),
            col("budget_tokens"), col("n_kept"), col("kept_tokens"))
          .orderBy(col("source").asc)
      },
      Some("""WITH t AS (SELECT doc_id, source,
             |    string_split_regex(trim(text), '\s+') AS w, text FROM documents),
             |per AS (SELECT source, CAST(sum(len(w)) AS BIGINT) AS n_tokens
             |  FROM t GROUP BY 1),
             |z AS (SELECT sum(pow(n_tokens, 0.5)) AS z FROM per),
             |alloc AS (SELECT source, n_tokens,
             |    round(pow(per.n_tokens, 0.5) / z.z, 6) AS weight,
             |    CAST(floor(pow(per.n_tokens, 0.5) / z.z * 5000) AS BIGINT)
             |      AS budget_tokens
             |  FROM per, z),
             |q AS (SELECT doc_id, source, len(w) AS nt,
             |    round(least(len(w) / 100.0, 1.0) * 0.5 +
             |      (1.0 - least(round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))::DOUBLE /
             |        greatest(length(text), 1), 6) * 5.0, 1.0)) * 0.3 +
             |      least(round(len(list_filter(w,
             |        x -> list_contains(['the','a','an','and','of','to','is','in','it','that'], x)))::DOUBLE /
             |        greatest(len(w), 1), 6) * 5.0, 1.0) * 0.2, 6) AS quality
             |  FROM t),
             |sel AS (SELECT q.doc_id, q.source, q.nt,
             |    sum(q.nt) OVER (PARTITION BY q.source
             |      ORDER BY q.quality DESC, q.doc_id ASC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      <= alloc.budget_tokens AS kept
             |  FROM q JOIN alloc USING (source)),
             |m AS (SELECT source,
             |    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |    CAST(sum(CASE WHEN kept THEN nt ELSE 0 END) AS BIGINT) AS kept_tokens
             |  FROM sel GROUP BY 1)
             |SELECT alloc.source, alloc.n_tokens, alloc.weight,
             |  alloc.budget_tokens, m.n_kept, m.kept_tokens
             |FROM alloc JOIN m USING (source)
             |ORDER BY source ASC""".stripMargin)),

    // quantile binning (histogram equalization): n_chars quartiles by
    // EXACT interpolated percentile boundaries — both engines define
    // percentile as a + frac·(b−a) over the sorted values, so the cut
    // points and every bin assignment replay bit-for-bit. Per
    // (quartile × source): counts and the n_chars envelope.
    NamedQuery("q181_quantile_bins",
      (s, d) => graft.operators.Binning.withQuantileBin(
          Tables.documents(s, d), "n_chars", n = 4)
        .groupBy(col("bin"), col("source"))
        .agg(F.count(F.lit(1)).as("n_docs"),
          F.min(col("n_chars")).as("min_chars"),
          F.max(col("n_chars")).as("max_chars"))
        .orderBy(col("bin").asc, col("source").asc),
      Some("""WITH b AS (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75]) AS bnd
             |  FROM documents),
             |a AS (SELECT d.source, d.n_chars,
             |    1 + len(list_filter(b.bnd, x -> d.n_chars >= x)) AS bin
             |  FROM documents d, b)
             |SELECT bin, source, CAST(count(*) AS BIGINT) AS n_docs,
             |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM a GROUP BY 1, 2 ORDER BY bin ASC, source ASC""".stripMargin)),

    // PII scrub idempotency as a DRIVER-GATED invariant (the q153
    // pattern): re-scrubbing redacted text must change nothing —
    // placeholders never re-match any pattern — per doc over the same
    // planted-PII corpus as q163. The companion per-doc counts anchor
    // the oracle.
    NamedQuery("q182_pii_idempotent",
      (s, d) => {
        val aug = Tables.documents(s, d).select(col("doc_id"),
          plantedPii(col("text")).as("text"))
        val once = aug.select(col("doc_id"),
          Pii.redact(col("text")).as("r1"))
        once.select(col("doc_id"),
            (Pii.redact(col("r1")) === col("r1")).as("idempotent"),
            Pii.emailCount(col("r1")).as("n_email_left"))
          .orderBy(col("doc_id").asc)
      },
      Some("""SELECT doc_id, true AS idempotent,
             |  CAST(0 AS INT) AS n_email_left
             |FROM documents ORDER BY doc_id ASC""".stripMargin))
  )

  /** DuckDB replay of [[graft.llm.Classifier.trainLogReg]]: one
    * (score, residual, gradient, update) CTE block per GD iteration,
    * weights re-rounded to the same 1e-9 grid each step. */
  private def logRegOracleSql(buckets: Int, iters: Int, lr: Double): String =
    s"""WITH ${logRegCtes(buckets, "documents")},
       |${logRegRounds(iters, lr)}
       |SELECT CAST(b AS INT) AS bucket, round(w, 6) AS weight
       |FROM w$iters ORDER BY bucket ASC""".stripMargin

  /** One (score, residual, gradient, update) CTE block per GD step. */
  private def logRegRounds(iters: Int, lr: Double): String =
    (0 until iters).map { i =>
      s"""s$i AS MATERIALIZED (SELECT f.doc_id, sum(f.x * w.w) AS z
         |  FROM feats f JOIN w$i w ON w.b = f.bucket GROUP BY 1),
         |r$i AS MATERIALIZED (SELECT y.doc_id,
         |    1.0 / (1.0 + exp(-(s.z + (SELECT w FROM w$i WHERE b = -1)))) - y.y AS r
         |  FROM y JOIN s$i s USING (doc_id)),
         |g$i AS MATERIALIZED (SELECT f.bucket AS b, sum(f.x * r.r) AS g
         |  FROM feats f JOIN r$i r USING (doc_id) GROUP BY 1),
         |w${i + 1} AS MATERIALIZED (SELECT wp.b,
         |    round(wp.w - $lr * (CASE WHEN wp.b = -1
         |        THEN (SELECT sum(r) FROM r$i)
         |        ELSE coalesce((SELECT g FROM g$i gg WHERE gg.b = wp.b), 0.0)
         |      END) / (SELECT n FROM nn), 9) AS w
         |  FROM w$i wp)""".stripMargin
    }.mkString(",\n")

  /** The featurize + label + init CTE prefix of the log-reg replay,
    * parameterized by the training relation (shared by q174 and the
    * front-door q175). */
  private def logRegCtes(buckets: Int, docsRel: String): String =
    s"""t AS MATERIALIZED (SELECT doc_id, source,
       |    string_split_regex(trim(text), '\\s+') AS w FROM $docsRel),
       |g AS MATERIALIZED (SELECT doc_id, unnest(list_concat(w,
       |    [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))])) AS gram
       |  FROM t),
       |bk AS MATERIALIZED (SELECT doc_id,
       |    CAST(CAST(('0x' || substring(md5(gram), 1, 8)) AS UBIGINT) % $buckets AS BIGINT) AS bucket
       |  FROM g),
       |fc AS MATERIALIZED (SELECT doc_id, bucket, count(*) AS cnt FROM bk GROUP BY 1, 2),
       |tt AS MATERIALIZED (SELECT doc_id, sum(cnt) AS tot FROM fc GROUP BY 1),
       |feats AS MATERIALIZED (SELECT fc.doc_id, fc.bucket, fc.cnt::DOUBLE / tt.tot AS x
       |  FROM fc JOIN tt USING (doc_id)),
       |y AS MATERIALIZED (SELECT t.doc_id,
       |    CASE WHEN t.source = 'src0' THEN 1.0 ELSE 0.0 END AS y
       |  FROM t JOIN tt ON tt.doc_id = t.doc_id),
       |nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM y),
       |w0 AS MATERIALIZED (SELECT unnest(range(-1, $buckets)) AS b, 0.0 AS w)""".stripMargin

  /** DuckDB replay of [[graft.llm.Bpe.trainMerges]] for `n` rounds —
    * generated CTE chain, one (pair-count, argmax, rewrite) stage per
    * round. chr(31) is the fold's token separator (never occurs in
    * word characters or their concatenations). */
  private def bpeOracleSql(n: Int): String = {
    val rounds = (0 until n).map { i =>
      s"""p$i AS (
         |  SELECT a, b, sum(cnt) AS c FROM (
         |    SELECT cnt, sym[j] AS a, sym[j + 1] AS b
         |    FROM s$i, UNNEST(range(1, len(sym))) AS t(j)
         |  ) GROUP BY a, b
         |),
         |m$i AS (SELECT a AS ma, b AS mb FROM p$i WHERE c >= 2
         |        ORDER BY c DESC, a ASC, b ASC LIMIT 1),
         |s${i + 1} AS (
         |  SELECT word, cnt,
         |    CASE WHEN len(sym) < 2 THEN sym ELSE
         |      string_split(
         |        list_reduce(sym, (acc, x) -> CASE
         |          WHEN x = mb AND (acc = ma OR ends_with(acc, chr(31) || ma))
         |          THEN acc[1:len(acc) - len(ma)] || ma || mb
         |          ELSE acc || chr(31) || x END),
         |        chr(31))
         |    END AS sym
         |  FROM s$i, m$i
         |)""".stripMargin
    }.mkString(",\n")
    val union = (0 until n).map { i =>
      s"SELECT ${i + 1} AS rank, ma AS a, mb AS b FROM m$i"
    }.mkString("\nUNION ALL ")
    s"""WITH w AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |        FROM documents)
       |  WHERE word <> '' GROUP BY word
       |),
       |s0 AS (SELECT word, cnt, regexp_extract_all(word, '.') AS sym FROM w),
       |$rounds
       |SELECT * FROM (
       |$union
       |) ORDER BY rank ASC""".stripMargin
  }
}
