package graft.queries

import graft.cubes.{Cubes, Tables}
import graft.llm.{Decontaminate, Mixture, Packing, Similarity, TextAnalysis}
import graft.operators.Funnel
import graft.parse.QueryParser
import org.apache.spark.sql.{functions => F}

/** Round-4 training-pipeline depth: repetition quality signals,
  * benchmark decontamination, event-sequence pattern matching, semantic
  * dedup, and sequence packing. Oracles mirror the exact formulas in
  * DuckDB (list comprehensions over the same tokenization) wherever
  * SQL-expressible; the rest are invariant-oracled like
  * [[InvariantQueries]].
  */
object TrainQueries {
  import org.apache.spark.sql.functions.col

  val qs: Seq[NamedQuery] = Seq(

    // Gopher-style repetition filters: duplicate-ngram fraction (2- and
    // 3-gram) and modal-3-gram coverage, plus the keep/drop decision a
    // curation pipeline would make. Row-local — a map-only scan at any
    // scale. Oracle recomputes every formula from the raw text.
    NamedQuery("q114_repetition_profile",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.dupNgramFraction(col("text"), 2).as("dup2"),
          TextAnalysis.dupNgramFraction(col("text"), 3).as("dup3"),
          TextAnalysis.topNgramCoverage(col("text"), 3).as("top3_cov"))
        .withColumn("keep",
          col("dup3") <= 0.2 && col("top3_cov") <= 0.18)
        .orderBy(col("doc_id").asc),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
             |          FROM documents),
             |g AS (SELECT doc_id,
             |  CASE WHEN len(w) >= 2
             |    THEN [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]
             |    ELSE [] END AS g2,
             |  CASE WHEN len(w) >= 3
             |    THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]
             |    ELSE [] END AS g3
             |  FROM t),
             |m AS (SELECT doc_id,
             |  CASE WHEN len(g2) > 0
             |    THEN round(1 - len(list_distinct(g2))::DOUBLE / len(g2), 6)
             |    ELSE 0.0 END AS dup2,
             |  CASE WHEN len(g3) > 0
             |    THEN round(1 - len(list_distinct(g3))::DOUBLE / len(g3), 6)
             |    ELSE 0.0 END AS dup3,
             |  CASE WHEN len(g3) > 0
             |    THEN round(list_max([len(list_filter(g3, x -> x = y))
             |                         for y in list_distinct(g3)])::DOUBLE
             |               / len(g3), 6)
             |    ELSE 0.0 END AS top3_cov
             |  FROM g)
             |SELECT doc_id, dup2, dup3, top3_cov,
             |  (dup3 <= 0.2 AND top3_cov <= 0.18) AS keep
             |FROM m ORDER BY doc_id ASC""".stripMargin)),

    // Benchmark decontamination: src0 plays the eval set, every other
    // source is the training corpus; a training doc sharing any distinct
    // 4-gram with an eval doc is contaminated. Engine: explode → gram
    // equi-join (bench side broadcast — the 100 TB side never shuffles)
    // → pair counts. Oracle: exact list-intersect over the same grams
    // (all-pairs is fine at oracle scale).
    NamedQuery("q115_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Decontaminate.contaminationPairs(
            docs.filter(col("source") =!= "src0"), col("doc_id"), col("text"),
            docs.filter(col("source") === "src0"), col("doc_id"), col("text"),
            n = 4, minHits = 1)
          .orderBy(col("doc_id").asc, col("bench_id").asc)
      },
      Some("""WITH t AS (SELECT doc_id, source,
             |            string_split_regex(trim(text), '\s+') AS w FROM documents),
             |g AS (SELECT doc_id, source,
             |  CASE WHEN len(w) >= 4
             |    THEN list_distinct([array_to_string(w[i:i+3], ' ')
             |                        for i in range(1, len(w) - 2)])
             |    ELSE [] END AS grams
             |  FROM t)
             |SELECT tr.doc_id AS doc_id, be.doc_id AS bench_id,
             |  CAST(len(list_intersect(tr.grams, be.grams)) AS BIGINT) AS n_shared
             |FROM g tr, g be
             |WHERE tr.source <> 'src0' AND be.source = 'src0'
             |  AND len(list_intersect(tr.grams, be.grams)) >= 1
             |ORDER BY doc_id ASC, bench_id ASC""".stripMargin)),

    // ClickHouse sequenceMatch('(?1).*(?2).*(?3)') per user: did the
    // user ever do view → signup → purchase
    // in event order. Oracle: EXISTS over a join chain increasing in the
    // engine's deterministic (ts, step) lexicographic order — because the
    // three aliases carry fixed ascending step ranks, "b after a" reduces
    // to b.ts >= a.ts.
    NamedQuery("q116_sequence_match",
      (s, d) => Funnel.sequenceCount(
          Tables.events(s, d), col("user_id"), col("ts"), col("event_type"),
          steps = Seq("view", "signup", "purchase"))
        .select(col("user_id"), col("matched"))
        .orderBy(col("user_id").asc),
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events
             |          WHERE event_type IN ('view', 'signup', 'purchase'))
             |SELECT u.user_id, EXISTS (
             |  SELECT 1 FROM events a, events b, events c
             |  WHERE a.user_id = u.user_id AND b.user_id = u.user_id
             |    AND c.user_id = u.user_id
             |    AND a.event_type = 'view' AND b.event_type = 'signup'
             |    AND c.event_type = 'purchase'
             |    AND b.ts >= a.ts AND c.ts >= b.ts) AS matched
             |FROM u ORDER BY user_id ASC""".stripMargin)),

    // sequenceCount: greedy non-overlapping view → signup → purchase
    // occurrences per user. The oracle replays the SAME automaton as a
    // recursive-CTE walk over the per-user event ordinals — exact, not
    // an invariant bound.
    NamedQuery("q117_sequence_count",
      (s, d) => Funnel.sequenceCount(
          Tables.events(s, d), col("user_id"), col("ts"), col("event_type"),
          steps = Seq("view", "signup", "purchase"))
        .select(col("user_id"), col("n_matches"))
        .orderBy(col("user_id").asc),
      Some("""WITH RECURSIVE ev AS (
             |  SELECT user_id,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, step) AS i,
             |    step
             |  FROM (SELECT user_id, ts,
             |          CASE event_type WHEN 'view' THEN 0 WHEN 'signup' THEN 1
             |               ELSE 2 END AS step
             |        FROM events
             |        WHERE event_type IN ('view', 'signup', 'purchase'))),
             |n AS (SELECT user_id, count(*) AS cnt FROM ev GROUP BY 1),
             |walk AS (
             |  SELECT user_id, 0 AS i, 0 AS stage, 0 AS matches FROM n
             |  UNION ALL
             |  SELECT w.user_id, w.i + 1,
             |    CASE WHEN e.step = w.stage
             |         THEN (CASE WHEN w.stage = 2 THEN 0 ELSE w.stage + 1 END)
             |         ELSE w.stage END,
             |    w.matches + (CASE WHEN e.step = w.stage AND w.stage = 2
             |                      THEN 1 ELSE 0 END)
             |  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.i = w.i + 1)
             |SELECT w.user_id AS user_id, CAST(w.matches AS INT) AS n_matches
             |FROM walk w JOIN n ON w.user_id = n.user_id AND w.i = n.cnt
             |ORDER BY 1 ASC""".stripMargin)),

    // SemDeDup invariant contract (the k-means cells aren't SQL-
    // reproducible, so the DECIDABLE claims go through the oracle, the
    // q75/q77 pattern): the drop set partitions the corpus, every drop
    // has a genuine ≥τ cosine partner somewhere (checked in-engine
    // against the EXACT all-pairs operator — the verifier is quadratic,
    // the operator is not), and no two survivors in one cell are still
    // near-dups of each other. n_corpus anchors the oracle exactly.
    NamedQuery("q118_semdedup",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding"))
        val out = Similarity.semanticDedup(emb, threshold = 0.45, nLists = 16)
        val exact = Similarity.cosineNearDupPairsExact(emb, 0.45)
        val dupIds = exact.select(col("a_id").as("id"))
          .union(exact.select(col("b_id").as("id"))).distinct()
        val partStats = out.agg(
          F.count(F.lit(1)).as("__n_rows"),
          F.count_distinct(col("id")).as("__n_ids"),
          F.sum(F.when(col("dropped"), 1L).otherwise(0L)).as("__n_dropped"))
        val subsetBad = out.filter(col("dropped"))
          .join(dupIds, Seq("id"), "left_anti")
          .agg(F.count(F.lit(1)).as("__bad_drops"))
        val kept = out.filter(!col("dropped"))
          .join(emb, Seq("id"))
        val ka = kept.select(col("cell"), col("id").as("a_id"),
          col("embedding").as("a_emb"))
        val kb = kept.select(col("cell"), col("id").as("b_id"),
          col("embedding").as("b_emb"))
        val survivorsBad = ka.join(kb, "cell")
          .filter(col("a_id") < col("b_id"))
          .filter(graft.functions.CosineSim(col("a_emb"), col("b_emb")) >= 0.45)
          .agg(F.count(F.lit(1)).as("__bad_pairs"))
        val total = emb.agg(F.count(F.lit(1)).as("n_corpus"))
        total.crossJoin(partStats).crossJoin(subsetBad).crossJoin(survivorsBad)
          .select(col("n_corpus"),
            (col("__n_rows") === col("n_corpus") &&
              col("__n_ids") === col("n_corpus")).as("partition_ok"),
            (col("__n_dropped") > 0).as("found_dups"),
            (col("__bad_drops") === 0).as("drops_are_real_dups"),
            (col("__bad_pairs") === 0).as("cells_deduped"))
      },
      Some("""SELECT count(*) AS n_corpus, true AS partition_ok,
             |true AS found_dups, true AS drops_are_real_dups,
             |true AS cells_deduped FROM embeddings""".stripMargin)),

    // Sequence packing invariant contract: every doc lands in exactly
    // one bin, no bin over capacity (single oversize docs excepted by
    // construction), and the bin count meets the ⌈total/cap⌉ lower
    // bound. n_docs and total_tokens anchor the oracle exactly (the
    // token count is the same whitespace formula as q55).
    NamedQuery("q119_sequence_packing",
      (s, d) => {
        val cap = 128
        val docs = Tables.documents(s, d)
        val packed = Packing.packSequences(
          docs, col("doc_id"), TextAnalysis.tokenCount(col("text")),
          maxTokens = cap, partitions = 8)
        val stats = packed.agg(
          F.count(F.lit(1)).as("__n_rows"),
          F.count_distinct(col("doc_id")).as("__n_ids"),
          F.sum(col("n_tokens")).as("total_tokens"))
        val bins = packed.groupBy(col("bin_id")).agg(
            F.sum(col("n_tokens")).as("__fill"),
            F.count(F.lit(1)).as("__n_in_bin"))
          .agg(F.count(F.lit(1)).as("__n_bins"),
            F.sum(F.when(col("__fill") > cap && col("__n_in_bin") > 1, 1L)
              .otherwise(0L)).as("__over"))
        val total = docs.agg(F.count(F.lit(1)).as("n_docs"))
        total.crossJoin(stats).crossJoin(bins)
          .select(col("n_docs"), col("total_tokens"),
            (col("__n_rows") === col("n_docs") &&
              col("__n_ids") === col("n_docs")).as("packed_once"),
            (col("__over") === 0).as("bins_within_cap"),
            (col("__n_bins") >= F.ceil(col("total_tokens").cast("double") / cap))
              .as("bins_meet_lower_bound"))
      },
      Some("""SELECT count(*) AS n_docs,
             |CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
             |  AS total_tokens,
             |true AS packed_once, true AS bins_within_cap,
             |true AS bins_meet_lower_bound FROM documents""".stripMargin)),

    // sequenceCount THROUGH the front door: the plan-backed
    // seqConversions metric (total completed view→signup→purchase
    // chains) sliced by experiment arm, next to uniqueUsers — the
    // ClickHouse `sequenceCount(...) GROUP BY dim` shape as one cube
    // query. Oracle: per-user greedy walk (the q117 recursive CTE)
    // re-aggregated over the md5 arm buckets.
    NamedQuery("q120_parsed_seq_conversions",
      (s, d) => QueryParser.parse(Cubes.eventsCube(s, d),
        """{ "cube": "events",
          |  "args": { "options": {"asc": "arm"} },
          |  "fields": [
          |    {"name": "arm"},
          |    {"name": "seqConversions", "alias": "conversions"},
          |    {"name": "uniqueUsers", "alias": "users"} ] }""".stripMargin).query.toDF,
      Some("""WITH RECURSIVE ev AS (
             |  SELECT user_id,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, step) AS i,
             |    step
             |  FROM (SELECT user_id, ts,
             |          CASE event_type WHEN 'view' THEN 0 WHEN 'signup' THEN 1
             |               ELSE 2 END AS step
             |        FROM events
             |        WHERE event_type IN ('view', 'signup', 'purchase'))),
             |n AS (SELECT user_id, count(*) AS cnt FROM ev GROUP BY 1),
             |walk AS (
             |  SELECT user_id, 0 AS i, 0 AS stage, 0 AS matches FROM n
             |  UNION ALL
             |  SELECT w.user_id, w.i + 1,
             |    CASE WHEN e.step = w.stage
             |         THEN (CASE WHEN w.stage = 2 THEN 0 ELSE w.stage + 1 END)
             |         ELSE w.stage END,
             |    w.matches + (CASE WHEN e.step = w.stage AND w.stage = 2
             |                      THEN 1 ELSE 0 END)
             |  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.i = w.i + 1),
             |pm AS (SELECT w.user_id AS user_id, w.matches FROM walk w
             |       JOIN n ON w.user_id = n.user_id AND w.i = n.cnt),
             |u AS (SELECT DISTINCT
             |  CAST(CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 4 AS BIGINT) AS arm,
             |  user_id FROM events)
             |SELECT u.arm, CAST(sum(coalesce(pm.matches, 0)) AS BIGINT) AS conversions,
             |  CAST(count(*) AS BIGINT) AS users
             |FROM u LEFT JOIN pm ON u.user_id = pm.user_id
             |GROUP BY 1 ORDER BY u.arm ASC NULLS FIRST""".stripMargin)),

    // the WHALE CAP through the front door: seqConversions with the
    // maxEventsPerUser metric arg (dispatched like mixTokens' budget),
    // bounding per-user aggregation state at 2n everywhere incl.
    // map-side partials (functions/EarliestN). The cap (500) is far
    // above any fixture user's event count, so results are bit-equal
    // to the uncapped path and the oracle is q120's uncapped greedy
    // walk; ParserSpec proves the same arg with a BINDING cap changes
    // the count and equals the library operator's capped result.
    NamedQuery("q144_parsed_seq_capped",
      (s, d) => QueryParser.parse(Cubes.eventsCube(s, d),
        """{ "cube": "events",
          |  "args": { "options": {"asc": "arm"} },
          |  "fields": [
          |    {"name": "arm"},
          |    {"name": "seqConversions", "alias": "conversions",
          |     "args": {"maxEventsPerUser": 500}},
          |    {"name": "uniqueUsers", "alias": "users"} ] }""".stripMargin).query.toDF,
      Some("""WITH RECURSIVE ev AS (
             |  SELECT user_id,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, step) AS i,
             |    step
             |  FROM (SELECT user_id, ts,
             |          CASE event_type WHEN 'view' THEN 0 WHEN 'signup' THEN 1
             |               ELSE 2 END AS step
             |        FROM events
             |        WHERE event_type IN ('view', 'signup', 'purchase'))),
             |n AS (SELECT user_id, count(*) AS cnt FROM ev GROUP BY 1),
             |walk AS (
             |  SELECT user_id, 0 AS i, 0 AS stage, 0 AS matches FROM n
             |  UNION ALL
             |  SELECT w.user_id, w.i + 1,
             |    CASE WHEN e.step = w.stage
             |         THEN (CASE WHEN w.stage = 2 THEN 0 ELSE w.stage + 1 END)
             |         ELSE w.stage END,
             |    w.matches + (CASE WHEN e.step = w.stage AND w.stage = 2
             |                      THEN 1 ELSE 0 END)
             |  FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.i = w.i + 1),
             |pm AS (SELECT w.user_id AS user_id, w.matches FROM walk w
             |       JOIN n ON w.user_id = n.user_id AND w.i = n.cnt),
             |u AS (SELECT DISTINCT
             |  CAST(CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 4 AS BIGINT) AS arm,
             |  user_id FROM events)
             |SELECT u.arm, CAST(sum(coalesce(pm.matches, 0)) AS BIGINT) AS conversions,
             |  CAST(count(*) AS BIGINT) AS users
             |FROM u LEFT JOIN pm ON u.user_id = pm.user_id
             |GROUP BY 1 ORDER BY u.arm ASC NULLS FIRST""".stripMargin)),

    // the SESSION dimension through the front door, batch side: the
    // parsed document groups on the gap-based session_window expression
    // (the same document StreamingSpec serves from a live stream); the
    // oracle replays gaps-and-islands SQL (q43's construction), proving
    // Spark's session-window rewrite equals the classic lag + running-sum
    // island numbering on real data. The registry fn only flattens the
    // {start, end} struct to epoch millis for the compare, per the q41/
    // q43 timestamp convention.
    NamedQuery("q145_parsed_session",
      (s, d) => QueryParser.parse(Cubes.eventsCube(s, d),
        """{ "cube": "events",
          |  "fields": [
          |    {"name": "session"},
          |    {"name": "user", "alias": "user_id"},
          |    {"name": "count", "alias": "n_events"},
          |    {"name": "sumValue", "alias": "sum_value"} ] }""".stripMargin).query.toDF
        .select(col("user_id"),
          F.unix_millis(col("session.start")).as("session_start"),
          F.unix_millis(col("session.end")).as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id").asc, col("session_start").asc),
      Some("""WITH marked AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |         > INTERVAL 30 MINUTES OR
             |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |    THEN 1 ELSE 0 END AS new_sess
             |  FROM events),
             |sess AS (
             |  SELECT *, sum(new_sess) OVER (
             |    PARTITION BY user_id ORDER BY ts
             |    ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marked)
             |SELECT user_id, epoch_ms(min(ts)) AS session_start,
             |epoch_ms(max(ts) + INTERVAL 30 MINUTES) AS session_end,
             |count(*) AS n_events, round(sum(value), 2) AS sum_value
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id ASC, session_start ASC""".stripMargin)),

    // SemDeDup in its SCALE mode: occupancy-adaptive √n cells (the
    // single-level IVF optimum — see Similarity.semanticDedup scaladoc).
    // q118 is the semantic gate (exact all-pairs truth set proves drops
    // are real — deliberately quadratic, like q65); q131 is the exact
    // nLists=1 mode with a hash oracle. THIS query is what the scaling
    // gate measures: the operator as a 100 TB user would run it, with
    // the checks restricted to the linear-side invariants (partition is
    // a permutation of the corpus, cell count matches the √n formula) so
    // the measurement is of the operator, not of an O(n²) verifier.
    NamedQuery("q146_semdedup_scale",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding"))
        val out = Similarity.semanticDedup(emb, threshold = 0.45)
        val total = emb.agg(F.count(F.lit(1)).as("n_corpus"))
        val stats = out.agg(
          F.count(F.lit(1)).as("__rows"),
          F.count_distinct(col("id")).as("__ids"),
          F.count_distinct(col("cell")).as("__cells"),
          F.sum(F.when(col("dropped"), 1L).otherwise(0L)).as("__drops"))
        total.crossJoin(stats).select(
          col("n_corpus"),
          (col("__rows") === col("n_corpus") &&
            col("__ids") === col("n_corpus")).as("partition_ok"),
          (col("__cells") >= 1 &&
            col("__cells") <= F.round(F.sqrt(col("n_corpus").cast("double"))))
            .as("cells_sqrt_bounded"),
          (col("__drops") >= 0 && col("__drops") < col("n_corpus"))
            .as("some_survive"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_corpus, true AS partition_ok,
             |true AS cells_sqrt_bounded, true AS some_survive
             |FROM embeddings""".stripMargin)),

    // the repetition gate THROUGH the front door: dup3 as a selector
    // (`when dup3 <= 0.2` — row-local predicate, composes with pushdown)
    // and avgDup3 as a sliced metric. Oracle recomputes the whole
    // formula per doc from raw text.
    NamedQuery("q121_parsed_repetition_gate",
      (s, d) => QueryParser.parse(Cubes.documentsCube(s, d),
        """{ "cube": "documents",
          |  "args": { "dup3": {"lteq": 0.2}, "options": {"asc": "source"} },
          |  "fields": [
          |    {"name": "source"},
          |    {"name": "count", "alias": "n_docs"},
          |    {"name": "avgDup3", "alias": "avg_dup3"} ] }""".stripMargin).query.toDF,
      Some("""WITH t AS (SELECT doc_id, source,
             |            string_split_regex(trim(text), '\s+') AS w FROM documents),
             |g AS (SELECT doc_id, source,
             |  CASE WHEN len(w) >= 3
             |    THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]
             |    ELSE [] END AS g3
             |  FROM t),
             |m AS (SELECT doc_id, source,
             |  CASE WHEN len(g3) > 0
             |    THEN round(1 - len(list_distinct(g3))::DOUBLE / len(g3), 6)
             |    ELSE 0.0 END AS dup3
             |  FROM g)
             |SELECT source, count(*) AS n_docs,
             |  round(avg(dup3), 4) AS avg_dup3
             |FROM m WHERE dup3 <= 0.2 GROUP BY 1
             |ORDER BY source ASC NULLS FIRST, n_docs ASC, avg_dup3 ASC""".stripMargin)),

    // token-budget mixture: per source, keep the best-quality docs while
    // the running token sum fits a 300-token budget — deterministic
    // greedy prefix (quality desc, id asc). The oracle replays the
    // identical window, including the quality formula (q108's mirror).
    NamedQuery("q122_token_budget_mix",
      (s, d) => Mixture.tokenBudgetSample(
          Tables.documents(s, d), col("source"), col("doc_id"),
          TextAnalysis.tokenCount(col("text")),
          TextAnalysis.qualityScore(col("text")), F.lit(300L))
        .filter(col("kept"))
        .select(col("doc_id"), col("stratum").as("source"),
          col("n_tokens"), col("cum_tokens"))
        .orderBy(col("source").asc, col("cum_tokens").asc),
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

    // CAPSTONE: the full curation pass as ONE declarative plan — exact
    // dedup keep-list → repetition gate → benchmark decontamination →
    // token-budget mixture. Four pipeline stages, four shuffles total
    // (dedup agg, gram join agg, anti-join, mixture window) — and the
    // whole composition is hash-oracled end to end, each stage the
    // mirror already proven by q50/q114/q115/q122.
    NamedQuery("q123_curation_pipeline",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val keepIds = graft.llm.Dedup.exactDuplicateGroups(
            docs, col("doc_id"), col("text"))
          .select(col("keep_id").as("doc_id"))
        val deduped = docs.join(keepIds, Seq("doc_id"), "left_semi")
        val gated = deduped.filter(
          TextAnalysis.dupNgramFraction(col("text"), 3) <= 0.2)
        val clean = Decontaminate.decontaminated(
          gated.filter(col("source") =!= "src0"), col("doc_id"), col("text"),
          docs.filter(col("source") === "src0"), col("doc_id"), col("text"),
          n = 4, minHits = 1)
        Mixture.tokenBudgetSample(clean, col("source"), col("doc_id"),
            TextAnalysis.tokenCount(col("text")),
            TextAnalysis.qualityScore(col("text")), F.lit(300L))
          .filter(col("kept"))
          .select(col("doc_id"), col("stratum").as("source"),
            col("n_tokens"), col("cum_tokens"))
          .orderBy(col("source").asc, col("cum_tokens").asc)
      },
      Some("""WITH keep AS (
             |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
             |d AS (SELECT doc.* FROM documents doc JOIN keep USING (doc_id)),
             |t AS (SELECT doc_id, source, text,
             |        string_split_regex(trim(text), '\s+') AS w FROM d),
             |gated AS (
             |  SELECT doc_id, source, text, w FROM (
             |    SELECT *, CASE WHEN len(g) > 0
             |      THEN round(1 - len(list_distinct(g))::DOUBLE / len(g), 6)
             |      ELSE 0.0 END AS dup3
             |    FROM (SELECT *, CASE WHEN len(w) >= 3
             |      THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]
             |      ELSE [] END AS g FROM t))
             |  WHERE dup3 <= 0.2),
             |bench AS (
             |  SELECT CASE WHEN len(w) >= 4
             |    THEN list_distinct([array_to_string(w[i:i+3], ' ')
             |                        for i in range(1, len(w) - 2)])
             |    ELSE [] END AS grams
             |  FROM (SELECT string_split_regex(trim(text), '\s+') AS w
             |        FROM documents WHERE source = 'src0')),
             |tr AS (
             |  SELECT doc_id, source, text, w, CASE WHEN len(w) >= 4
             |    THEN list_distinct([array_to_string(w[i:i+3], ' ')
             |                        for i in range(1, len(w) - 2)])
             |    ELSE [] END AS grams
             |  FROM gated WHERE source <> 'src0'),
             |clean AS (
             |  SELECT doc_id, source, text, w FROM tr
             |  WHERE NOT EXISTS (SELECT 1 FROM bench be
             |                    WHERE len(list_intersect(tr.grams, be.grams)) >= 1)),
             |sc AS (
             |  SELECT doc_id, source, len(w) AS n_tokens,
             |    round((length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))::DOUBLE /
             |          greatest(length(text), 1), 6) AS punct_ratio,
             |    round(len(list_filter(w, x -> list_contains(
             |      ['the','a','an','and','of','to','is','in','it','that'], x)))::DOUBLE /
             |          greatest(len(w), 1), 6) AS stopword_ratio
             |  FROM clean),
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

    // ClickHouse ORDER BY ... WITH FILL: daily high-value purchase
    // revenue with the 9 silent days manufactured back as zero rows
    // (no data ≠ no row). Spine = distributed sequence explode over the
    // min/max bounds; oracle = generate_series + left join.
    NamedQuery("q124_date_fill",
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type") === "purchase" && col("value") >= 200)
          .groupBy(col("ts").cast("date").as("day"))
          .agg(F.count(F.lit(1)).as("n"),
            F.round(F.sum(col("value")), 2).as("revenue"))
        graft.operators.Fill.fillSeries(daily, "day", Seq.empty,
            F.expr("interval 1 day"),
            Map("n" -> F.lit(0L), "revenue" -> F.lit(0.0)))
          .orderBy(col("day").asc)
      },
      Some("""WITH f AS (
             |  SELECT CAST(ts AS DATE) AS day, value FROM events
             |  WHERE event_type = 'purchase' AND value >= 200),
             |b AS (SELECT min(day) AS lo, max(day) AS hi FROM f),
             |spine AS (
             |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM b),
             |agg AS (SELECT day, count(*) AS n, round(sum(value), 2) AS revenue
             |        FROM f GROUP BY 1)
             |SELECT spine.day AS day, CAST(coalesce(agg.n, 0) AS BIGINT) AS n,
             |  coalesce(agg.revenue, 0.0) AS revenue
             |FROM spine LEFT JOIN agg USING (day)
             |ORDER BY day ASC""".stripMargin)),

    // WITH FILL through the front door: the fill QUERY OPTION composes
    // with selectors, a sub-field slice, and the ordered-options fold
    // (asc then fill; the fold re-sorts after densifying) — ClickHouse
    // `ORDER BY day WITH FILL` as one cube query.
    NamedQuery("q125_parsed_fill",
      (s, d) => QueryParser.parse(Cubes.eventsCube(s, d),
        """{ "cube": "events",
          |  "args": { "eventType": {"eq": "purchase"}, "value": {"gteq": 200},
          |            "options": {"asc": "ts__day", "fill": "ts__day"} },
          |  "fields": [
          |    {"name": "ts", "fields": [{"name": "day"}]},
          |    {"name": "count", "alias": "n"},
          |    {"name": "sumValue", "alias": "revenue"} ] }""".stripMargin).query.toDF,
      Some("""WITH f AS (
             |  SELECT CAST(ts AS DATE) AS day, value FROM events
             |  WHERE event_type = 'purchase' AND value >= 200),
             |agg AS (SELECT day, CAST(count(*) AS BIGINT) AS n,
             |        round(sum(value), 2) AS revenue FROM f GROUP BY 1),
             |b AS (SELECT min(day) AS lo, max(day) AS hi FROM f),
             |spine AS (
             |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM b)
             |SELECT spine.day AS ts__day, coalesce(agg.n, 0) AS n,
             |  coalesce(agg.revenue, 0.0) AS revenue
             |FROM spine LEFT JOIN agg USING (day)
             |ORDER BY ts__day ASC NULLS FIRST, n ASC, revenue ASC""".stripMargin)),

    // ClickHouse uniqUpTo(N): exact distinct count saturating at N+1
    // with aggregation state bounded at N+1 values per group — the
    // "more than N distinct?" check that must not materialize a full
    // distinct set at 100 TB. lineNumbers (7 distinct) exercises the
    // exact path, suppliers (hundreds) the saturation witness.
    NamedQuery("q126_uniq_upto",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          graft.functions.UniqUpTo(100)(col("l_linenumber")).as("uniq_lines"),
          graft.functions.UniqUpTo(100)(col("l_suppkey")).as("uniq_supp"))
        .orderBy(col("flag").asc_nulls_first),
      Some("""SELECT l_returnflag AS flag,
             |CAST(least(count(DISTINCT l_linenumber), 101) AS INT) AS uniq_lines,
             |CAST(least(count(DISTINCT l_suppkey), 101) AS INT) AS uniq_supp
             |FROM lineitem GROUP BY 1
             |ORDER BY flag ASC NULLS FIRST""".stripMargin)),

    // FORWARD as-of through the native exec (q66's operator, mirrored
    // direction): each purchase matched to the user's EARLIEST signup
    // at-or-after it — "next event" attribution. Same single merge pass;
    // the oracle is DuckDB ASOF JOIN with the <= inequality.
    NamedQuery("q127_asof_forward",
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.plans.AsOfJoin.dataframe(s,
            left = ev.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("event_id")),
            right = ev.filter(col("event_type") === "signup")
              .select(col("user_id"), col("ts"), col("event_id")),
            keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
            valueCols = Seq("event_id" -> "signup_event_id", "ts" -> "signup_ts"),
            direction = "forward")
          .select(col("user_id"), F.unix_millis(col("ts")).as("purchase_ms"),
            col("event_id").as("purchase_event_id"),
            col("signup_event_id"), F.unix_millis(col("signup_ts")).as("signup_ms"))
          .orderBy(col("user_id").asc, col("purchase_ms").asc,
            col("purchase_event_id").asc)
      },
      Some("""SELECT p.user_id, epoch_ms(p.ts) AS purchase_ms,
             |p.event_id AS purchase_event_id,
             |s.event_id AS signup_event_id, epoch_ms(s.ts) AS signup_ms
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
             |ON p.user_id = s.user_id AND p.ts <= s.ts
             |ORDER BY p.user_id ASC, purchase_ms ASC, purchase_event_id ASC"""
        .stripMargin)),

    // uniqUpTo THROUGH the front door: metric arg n=10 plus a
    // metric-level FILTER (value >= 250), sliced by event type — at this
    // threshold two types stay exact (7, 8 distinct) and three saturate
    // at n+1=11, exercising both paths in one query.
    NamedQuery("q128_parsed_uniq_upto",
      (s, d) => QueryParser.parse(Cubes.eventsCube(s, d),
        """{ "cube": "events",
          |  "args": { "options": {"asc": "eventType"} },
          |  "fields": [
          |    {"name": "eventType"},
          |    {"name": "count", "alias": "n_events"},
          |    {"name": "usersUpTo", "alias": "users_capped",
          |     "args": {"n": 10, "value": {"gteq": 250}}} ] }""".stripMargin)
        .query.toDF,
      Some("""SELECT event_type AS "eventType",
             |CAST(count(*) AS BIGINT) AS n_events,
             |CAST(least(count(DISTINCT CASE WHEN value >= 250 THEN user_id END), 11) AS INT)
             |  AS users_capped
             |FROM events GROUP BY 1
             |ORDER BY "eventType" ASC NULLS FIRST, n_events ASC, users_capped ASC"""
        .stripMargin)),

    // WITH FILL ... INTERPOLATE through the front door: counts zero-fill
    // on manufactured days, but the average carries the last observation
    // forward — the ClickHouse INTERPOLATE clause. Oracle mirrors with
    // last_value IGNORE NULLS over the densified spine.
    NamedQuery("q129_parsed_fill_interpolate",
      (s, d) => QueryParser.parse(Cubes.eventsCube(s, d),
        """{ "cube": "events",
          |  "args": { "eventType": {"eq": "purchase"}, "value": {"gteq": 200},
          |            "options": {"asc": "ts__day",
          |              "fill": {"key": "ts__day",
          |                       "interpolate": "avg_value"}} },
          |  "fields": [
          |    {"name": "ts", "fields": [{"name": "day"}]},
          |    {"name": "count", "alias": "n"},
          |    {"name": "avgValue", "alias": "avg_value"} ] }""".stripMargin)
        .query.toDF,
      Some("""WITH f AS (
             |  SELECT CAST(ts AS DATE) AS day, value FROM events
             |  WHERE event_type = 'purchase' AND value >= 200),
             |agg AS (SELECT day, CAST(count(*) AS BIGINT) AS n,
             |        round(avg(value), 4) AS av FROM f GROUP BY 1),
             |b AS (SELECT min(day) AS lo, max(day) AS hi FROM f),
             |spine AS (
             |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM b),
             |j AS (SELECT spine.day AS ts__day, coalesce(agg.n, 0) AS n, agg.av
             |      FROM spine LEFT JOIN agg USING (day))
             |SELECT ts__day, n,
             |  coalesce(av, last_value(av IGNORE NULLS) OVER (
             |    ORDER BY ts__day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |    AS avg_value
             |FROM j
             |ORDER BY ts__day ASC NULLS FIRST, n ASC, avg_value ASC""".stripMargin)),

    // tokenizer-style vocabulary build: tokens ranked by frequency, keep
    // the prefix covering 95% of corpus occurrences. The running total
    // uses the DISTRIBUTED two-phase prefix sum (operators/PrefixSum) —
    // a bare Window.orderBy cumsum would collapse the vocabulary into
    // ONE partition, the classic silent scale-killer this operator
    // exists to avoid. Oracle: the single-window cumsum (fine at oracle
    // scale), proving the two-phase split is exact.
    NamedQuery("q130_vocab_coverage",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(F.explode(graft.llm.Dedup.tokens(F.lower(col("text")))).as("token"))
          .groupBy(col("token")).agg(F.count(F.lit(1)).as("cnt"))
        val total = counts.agg(F.sum(col("cnt")).as("__total"))
        graft.operators.PrefixSum.runningTotal(counts,
            Seq(col("cnt").desc, col("token").asc), col("cnt"),
            outCol = "cum", partitions = 8)
          .crossJoin(total)
          .filter(col("cum") - col("cnt") < col("__total") * 0.95)
          .select(col("token"), col("cnt"), col("cum").cast("long").as("cum"))
          .orderBy(col("cum").asc)
      },
      Some("""WITH t AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
             |          FROM documents),
             |c AS (SELECT token, count(*) AS cnt FROM t GROUP BY 1),
             |tot AS (SELECT sum(cnt) AS total FROM c),
             |r AS (SELECT token, CAST(cnt AS BIGINT) AS cnt,
             |       CAST(sum(cnt) OVER (ORDER BY cnt DESC, token ASC
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |      FROM c)
             |SELECT token, cnt, cum FROM r, tot
             |WHERE cum - cnt < 0.95 * total
             |ORDER BY cum ASC""".stripMargin)),

    // SemDeDup THROUGH the front door (q118's operator as a parsed cube
    // query): corpus size next to the count surviving semantic dedup at
    // cosine 0.45. nLists=1 runs the operator in its EXACT mode — one
    // cell, so no cross-cell recall loss — which is what makes a hash
    // oracle possible: survivors = n − |exact near-dup pairs| whenever
    // the pair graph is a matching (isolated edges, true here: this
    // corpus's 14 planted pairs share no endpoint and sit at cosine
    // 0.45–0.51, far from near-identical, so ANY cell split k>1 may
    // legitimately separate some pair — measured: k=16 co-cells 6/14,
    // k=2 co-cells 11/14). The banded scale posture (nLists≫1, accepted
    // cross-cell loss) is q118's invariant gate. Exact-pair cosine
    // mirror = q65's formula.
    NamedQuery("q131_parsed_semdedup",
      (s, d) => QueryParser.parse(Cubes.embeddingsCube(s, d),
        """{ "cube": "embeddings",
          |  "fields": [
          |    {"name": "vectors"},
          |    {"name": "semanticSurvivors", "alias": "survivors",
          |     "args": {"threshold": 0.45, "nLists": 1}} ] }""".stripMargin)
        .query.toDF,
      Some("""WITH p AS (
             |  SELECT a.vec_id AS a_id FROM embeddings a
             |  JOIN embeddings b ON a.vec_id < b.vec_id
             |  WHERE list_sum([ (a.embedding[i]::DOUBLE) * (b.embedding[i]::DOUBLE) for i in range(1, 65)]) /
             |    (sqrt(list_sum([ (a.embedding[i]::DOUBLE) * (a.embedding[i]::DOUBLE) for i in range(1, 65)])) *
             |     sqrt(list_sum([ (b.embedding[i]::DOUBLE) * (b.embedding[i]::DOUBLE) for i in range(1, 65)]))) >= 0.45)
             |SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS vectors,
             |  CAST((SELECT count(*) FROM embeddings) - (SELECT count(*) FROM p) AS BIGINT)
             |    AS survivors""".stripMargin)),

    // sequence packing THROUGH the front door: per source, the context
    // windows (128-token next-fit bins over docs in doc_id order) needed
    // to hold the shard — the packedBins metric (functions/NextFitBins)
    // next to count and sumTokens. The oracle replays the identical
    // next-fit walk as a recursive CTE (the q120 per-group walk pattern),
    // so a single misplaced bin boundary hash-mismatches.
    NamedQuery("q132_parsed_packing",
      (s, d) => QueryParser.parse(Cubes.documentsCube(s, d),
        """{ "cube": "documents",
          |  "args": { "options": {"asc": "source"} },
          |  "fields": [
          |    {"name": "source"},
          |    {"name": "count", "alias": "n_docs"},
          |    {"name": "sumTokens", "alias": "total_tokens"},
          |    {"name": "packedBins", "alias": "n_bins",
          |     "args": {"maxTokens": 128}} ] }""".stripMargin)
        .query.toDF,
      Some("""WITH RECURSIVE m AS (
             |  SELECT doc_id, source,
             |    len(string_split_regex(trim(text), '\s+')) AS n FROM documents),
             |s AS (SELECT doc_id, source, n,
             |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS i FROM m),
             |cnt AS (SELECT source, count(*) AS m_total,
             |    CAST(sum(n) AS BIGINT) AS tot FROM s GROUP BY 1),
             |walk AS (
             |  SELECT source, 0 AS i, 0 AS bins, 0 AS rem FROM cnt
             |  UNION ALL
             |  SELECT w.source, w.i + 1,
             |    CASE WHEN s.n >= 128 THEN w.bins + 1
             |         WHEN w.bins > 0 AND w.rem >= s.n THEN w.bins
             |         ELSE w.bins + 1 END,
             |    CASE WHEN s.n >= 128 THEN 0
             |         WHEN w.bins > 0 AND w.rem >= s.n THEN w.rem - s.n
             |         ELSE 128 - s.n END
             |  FROM walk w JOIN s ON s.source = w.source AND s.i = w.i + 1)
             |SELECT c.source, CAST(c.m_total AS BIGINT) AS n_docs,
             |  c.tot AS total_tokens, CAST(w.bins AS INT) AS n_bins
             |FROM walk w JOIN cnt c ON w.source = c.source AND w.i = c.m_total
             |ORDER BY c.source ASC NULLS FIRST, n_docs ASC, total_tokens ASC,
             |  n_bins ASC""".stripMargin)),

    // sliding-window document chunking (context-window training prep):
    // 40-token windows advancing by 30 (10-token overlap), one output
    // row per chunk, the chunk text carried as its md5 so the compare
    // hashes content without shipping it. Row-local explode — map-only
    // at any scale. The oracle replays the identical window arithmetic
    // with DuckDB list slices.
    NamedQuery("q136_doc_chunks",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          F.explode(TextAnalysis.chunks(col("text"), 40, 30)).as("c"))
        .select(col("doc_id"), col("c.idx").as("chunk_idx"),
          col("c.n_tokens").as("n_tokens"), F.md5(col("c.chunk")).as("chunk_md5"))
        .orderBy(col("doc_id").asc, col("chunk_idx").asc),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w,
             |    ((greatest(len(string_split_regex(trim(text), '\s+')) - 40, 0)
             |      + 29) // 30) * 30 AS max_start
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, w,
             |    unnest(range(0, max_start + 1, 30)) AS s
             |  FROM t)
             |SELECT doc_id, CAST(s // 30 AS INT) AS chunk_idx,
             |  CAST(len(w[s+1:s+40]) AS INT) AS n_tokens,
             |  md5(array_to_string(w[s+1:s+40], ' ')) AS chunk_md5
             |FROM c ORDER BY doc_id ASC, chunk_idx ASC""".stripMargin)),

    // corpus-trained bigram LM score (perplexity-gate family, no
    // external model): per doc, avg ln P(w_i | w_{i-1}) with add-one
    // smoothing over the corpus vocabulary — templated text scores
    // high, line-noise low. The oracle retrains the identical model in
    // SQL and replays every logarithm, so counts, smoothing and the
    // join shape must all be exact.
    NamedQuery("q137_bigram_lm",
      (s, d) => graft.llm.LangModel.bigramScore(
          Tables.documents(s, d), col("doc_id"), col("text"))
        .orderBy(col("doc_id").asc),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
             |  FROM documents),
             |bg AS (
             |  SELECT doc_id,
             |    unnest([{'p': w[i], 'c': w[i+1]} for i in range(1, len(w))],
             |           recursive := true)
             |  FROM t WHERE len(w) >= 2),
             |c2 AS (SELECT p, c, count(*) AS cnt2 FROM bg GROUP BY 1, 2),
             |c1 AS (SELECT p, count(*) AS cnt1 FROM bg GROUP BY 1),
             |v AS (SELECT count(DISTINCT tok) AS nv
             |      FROM (SELECT unnest(w) AS tok FROM t))
             |SELECT bg.doc_id, CAST(count(*) AS INT) AS n_bigrams,
             |  round(avg(ln((cnt2 + 1.0) / (cnt1 + nv))), 6) AS logprob
             |FROM bg JOIN c2 USING (p, c) JOIN c1 USING (p) CROSS JOIN v
             |GROUP BY 1 ORDER BY doc_id ASC""".stripMargin)),

    // HELD-OUT bigram scoring (the real quality-gate shape): train the
    // model on every source EXCEPT src0, score src0's documents against
    // it. Unseen bigrams take C(p,c)=0; unseen predecessors take
    // C(p,·)=0 too (P = 1/|V|, the smoothing floor) — the oracle
    // retrains the identical model on the same split and replays the
    // left-join + coalesce OOV arithmetic logarithm for logarithm.
    NamedQuery("q138_bigram_heldout",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val model = graft.llm.LangModel.trainBigramModel(
          docs.filter(col("source") =!= "src0"), col("doc_id"), col("text"))
        graft.llm.LangModel.scoreAgainst(
            model, docs.filter(col("source") === "src0"), col("doc_id"), col("text"))
          .orderBy(col("doc_id").asc)
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    string_split_regex(trim(lower(text)), '\s+') AS w
             |  FROM documents),
             |bgtr AS (
             |  SELECT doc_id,
             |    unnest([{'p': w[i], 'c': w[i+1]} for i in range(1, len(w))],
             |           recursive := true)
             |  FROM t WHERE len(w) >= 2 AND source <> 'src0'),
             |c2 AS (SELECT p, c, count(*) AS cnt2 FROM bgtr GROUP BY 1, 2),
             |c1 AS (SELECT p, CAST(sum(cnt2) AS BIGINT) AS cnt1 FROM c2 GROUP BY 1),
             |v AS (SELECT count(DISTINCT tok) AS nv
             |      FROM (SELECT unnest(w) AS tok FROM t WHERE source <> 'src0')),
             |bgte AS (
             |  SELECT doc_id,
             |    unnest([{'p': w[i], 'c': w[i+1]} for i in range(1, len(w))],
             |           recursive := true)
             |  FROM t WHERE len(w) >= 2 AND source = 'src0')
             |SELECT bgte.doc_id, CAST(count(*) AS INT) AS n_bigrams,
             |  round(avg(ln((coalesce(cnt2, 0) + 1.0) / (coalesce(cnt1, 0) + nv))), 6)
             |    AS logprob
             |FROM bgte LEFT JOIN c2 USING (p, c) LEFT JOIN c1 USING (p) CROSS JOIN v
             |GROUP BY 1 ORDER BY doc_id ASC""".stripMargin))
  )
}
