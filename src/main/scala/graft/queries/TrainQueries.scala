package graft.queries

import graft.cubes.Tables
import graft.llm.{Decontaminate, TextAnalysis}
import graft.operators.Funnel
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
             |ORDER BY 1 ASC""".stripMargin))
  )
}
