package graft.queries

import graft.cubes.Cubes
import graft.parse.QueryParser
import graft.respond.Renest

/** End-to-end front-door queries: JSON query tree → element tree →
  * CubeQuery → compiled plan (→ optionally re-nested response). These
  * exercise the same path a GraphQL adapter would drive (SURVEY §3
  * lifecycle; the wire layer itself is out of scope).
  */
object ParsedQueries {

  private val flatDoc =
    """{ "cube": "lineitem",
      |  "args": {
      |    "shipDate": {"between": ["1996-01-01", "1998-12-31"]},
      |    "quantity": {"gt": 5, "not_eq": null},
      |    "options": {"desc": "cnt", "limit": 10} },
      |  "fields": [
      |    {"name": "returnFlag", "alias": "flag"},
      |    {"name": "shipDate", "fields": [{"name": "year"}]},
      |    {"name": "count", "alias": "cnt"},
      |    {"name": "amount", "args": {"quantity": {"gt": 25}}} ] }""".stripMargin

  private val nestedDoc =
    """{ "cube": "lineitem",
      |  "args": { "options": {"asc": "flag"} },
      |  "fields": [
      |    {"name": "returnFlag", "alias": "flag"},
      |    {"name": "shipDate", "alias": "shipDate",
      |     "fields": [{"name": "year"}, {"name": "month"}]},
      |    {"name": "count", "alias": "cnt"} ] }""".stripMargin

  private val anyDoc =
    """{ "cube": "lineitem",
      |  "args": {
      |    "any": [ {"returnFlag": {"eq": "R"}, "quantity": {"gt": 30}},
      |             {"lineStatus": {"eq": "F"}, "quantity": {"lt": 5}} ],
      |    "options": {"desc": "cnt", "limitBy": {"each": "flag", "limit": 2}, "limit": 4} },
      |  "fields": [
      |    {"name": "returnFlag", "alias": "flag"},
      |    {"name": "shipDate", "fields": [{"name": "year"}]},
      |    {"name": "count", "alias": "cnt"} ] }""".stripMargin

  private val topkDoc =
    """{ "cube": "lineitem",
      |  "args": { "options": {"asc": "flag"} },
      |  "fields": [
      |    {"name": "returnFlag", "alias": "flag"},
      |    {"name": "count", "alias": "cnt"},
      |    {"name": "topParts", "alias": "top_parts",
      |     "args": {"size": 2, "quantity": {"gt": 25}}} ] }""".stripMargin

  private val topkExactDoc =
    """{ "cube": "lineitem",
      |  "args": { "options": {"asc": "flag"} },
      |  "fields": [
      |    {"name": "returnFlag", "alias": "flag"},
      |    {"name": "count", "alias": "cnt"},
      |    {"name": "topParts", "alias": "top_parts",
      |     "args": {"size": 2, "exact": true, "quantity": {"gt": 25}}} ] }""".stripMargin

  private val unionDoc =
    """{ "cube": "events", "union": true,
      |  "discriminator": {"on": "etype",
      |    "mapping": {"purchase": "PurchaseStats", "signup": "SignupStats"},
      |    "default": "EventStats"},
      |  "args": { "options": {"asc": "etype"} },
      |  "fields": [
      |    {"name": "__typename"},
      |    {"name": "eventType", "alias": "etype"},
      |    {"name": "count", "alias": "cnt"},
      |    {"name": "sumValue", "alias": "revenue", "onType": "PurchaseStats"},
      |    {"name": "avgValue", "alias": "avg_signup_value", "onType": "SignupStats"} ] }""".stripMargin

  private val docsDoc =
    """{ "cube": "documents",
      |  "args": { "nChars": {"gt": 100}, "options": {"asc": ["lang", "source"]} },
      |  "fields": [
      |    {"name": "lang"},
      |    {"name": "source"},
      |    {"name": "count", "alias": "cnt"},
      |    {"name": "avgQuality", "alias": "avg_quality"},
      |    {"name": "sumTokens", "alias": "sum_tokens"},
      |    {"name": "uniqueTexts", "alias": "uniq_texts"}] }""".stripMargin

  val qs: Seq[NamedQuery] = Seq(

    // the documents cube through the front door: text-analysis derived
    // dimension (language ID) and metrics (quality, token counts,
    // distinct texts) compiled from the same JSON tree as OLAP queries.
    // Every formula is mirrored exactly in the oracle (q55's proven
    // mirrors, grouped).
    NamedQuery("q90_docs_cube",
      (s, d) => QueryParser.parse(Cubes.documentsCube(s, d), docsDoc).query.toDF,
      Some("""WITH m AS (
             |  SELECT source, text, string_split_regex(trim(text), '\s+') AS toks
             |  FROM documents WHERE n_chars > 100),
             |sc AS (
             |  SELECT source, text, len(toks) AS n_tokens,
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
             |  FROM m),
             |q AS (
             |  SELECT source, text, n_tokens,
             |    round(least(n_tokens / 100.0, 1.0) * 0.5 +
             |          (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.3 +
             |          least(stopword_ratio * 5.0, 1.0) * 0.2, 6) AS quality,
             |    CASE
             |      WHEN s_en >= greatest(s_en, s_es, s_de, s_fr) AND greatest(s_en, s_es, s_de, s_fr) > 0 THEN 'en'
             |      WHEN s_es >= greatest(s_es, s_de, s_fr) AND greatest(s_es, s_de, s_fr) > 0 THEN 'es'
             |      WHEN s_de >= greatest(s_de, s_fr) AND greatest(s_de, s_fr) > 0 THEN 'de'
             |      WHEN s_fr > 0 THEN 'fr'
             |      ELSE 'und' END AS lang
             |  FROM sc)
             |SELECT lang, source, count(*) AS cnt,
             |round(avg(quality), 4) AS avg_quality,
             |CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
             |CAST(count(DISTINCT md5(text)) AS BIGINT) AS uniq_texts
             |FROM q GROUP BY 1, 2
             |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST,
             |cnt ASC, avg_quality ASC, sum_tokens ASC, uniq_texts ASC""".stripMargin)),

    // per-row union discriminator through the front door (R8,
    // response_builder.rb:21-24: __typename resolves from the runtime
    // row): each result row is one of three member types keyed off the
    // etype column; onType-gated metrics are NULL on rows of other
    // members. Gated metrics are doubles on both sides so the driver's
    // pandas dtypes agree (a nullable BIGINT would come back float64
    // from DuckDB but Int64 from parquet).
    NamedQuery("q74_parsed_union",
      (s, d) => {
        val parsed = QueryParser.parse(Cubes.eventsCube(s, d), unionDoc)
        Renest.nest(parsed.query.toDF, parsed.root)
      },
      Some("""SELECT CASE event_type WHEN 'purchase' THEN 'PurchaseStats'
             |  WHEN 'signup' THEN 'SignupStats' ELSE 'EventStats' END AS "__typename",
             |event_type AS "etype", count(*) AS "cnt",
             |CASE WHEN event_type = 'purchase' THEN round(sum(value), 2) END AS "revenue",
             |CASE WHEN event_type = 'signup' THEN round(avg(value), 4) END AS "avg_signup_value"
             |FROM events GROUP BY event_type
             |ORDER BY "etype" ASC NULLS FIRST""".stripMargin)),

    // parameterized tuple metric through the front door: topParts takes a
    // size arg dispatched onto the metric (parse_tree.rb:127-130
    // apply_args) PLUS a selector arg that becomes a FILTER predicate —
    // both on the same metric element. Tuple output serialized with
    // to_json for the driver harness.
    //
    // Oracle bounds: the SpaceSaving sketch behind topParts is exact only
    // while per-group distinct l_partkey < capacity=65536; TPC-H has
    // 200k×SF partkeys, so this exact-equality oracle holds to SF≈0.3.
    // Beyond that the sketch answers within its guaranteed error and the
    // exact two-phase TopK operator (q22/q23) is the bit-exact path. The
    // LEFT JOIN + COALESCE('[]') keeps flag groups whose every row fails
    // the quantity filter — the engine emits those with an empty list.
    NamedQuery("q73_parsed_topk_arg",
      (s, d) => {
        import org.apache.spark.sql.functions.{col, to_json}
        QueryParser.parse(Cubes.lineitemCube(s, d), topkDoc).query.toDF
          .withColumn("top_parts", to_json(col("top_parts")))
      },
      Some("""WITH counted AS (
             |  SELECT l_returnflag AS flag, l_partkey AS pk, count(*) AS c
             |  FROM lineitem WHERE l_quantity > 25 GROUP BY 1, 2),
             |ranked AS (
             |  SELECT flag, pk, c, row_number() OVER (
             |    PARTITION BY flag ORDER BY c DESC, pk ASC) AS rn
             |  FROM counted)
             |SELECT f.flag AS "flag", f.cnt AS "cnt",
             |  CAST(COALESCE(to_json(list({'value': r.pk, 'cnt': r.c} ORDER BY r.c DESC, r.pk ASC)
             |    FILTER (WHERE r.pk IS NOT NULL)), '[]') AS VARCHAR) AS "top_parts"
             |FROM (SELECT l_returnflag AS flag, count(*) AS cnt
             |      FROM lineitem GROUP BY 1) f
             |LEFT JOIN ranked r ON r.flag = f.flag AND r.rn <= 2
             |GROUP BY f.flag, f.cnt
             |ORDER BY "flag" ASC NULLS FIRST, "cnt" ASC, "top_parts" ASC""".stripMargin)),

    // the SAME front-door query with `exact: true`: the metric arg flips
    // topParts to the plan-backed two-phase TopK (Metric.planBuild —
    // count by (flag, part), window-trim to K, null-safe join back on
    // the slice key), so the result is bit-exact at ANY SF with no
    // sketch capacity bound. Same oracle as q73 — equality here is the
    // claim that sketch and exact paths agree below capacity.
    NamedQuery("q99_parsed_topk_exact",
      (s, d) => {
        import org.apache.spark.sql.functions.{col, to_json}
        QueryParser.parse(Cubes.lineitemCube(s, d), topkExactDoc).query.toDF
          .withColumn("top_parts", to_json(col("top_parts")))
      },
      Some("""WITH counted AS (
             |  SELECT l_returnflag AS flag, l_partkey AS pk, count(*) AS c
             |  FROM lineitem WHERE l_quantity > 25 GROUP BY 1, 2),
             |ranked AS (
             |  SELECT flag, pk, c, row_number() OVER (
             |    PARTITION BY flag ORDER BY c DESC, pk ASC) AS rn
             |  FROM counted)
             |SELECT f.flag AS "flag", f.cnt AS "cnt",
             |  CAST(COALESCE(to_json(list({'value': r.pk, 'cnt': r.c} ORDER BY r.c DESC, r.pk ASC)
             |    FILTER (WHERE r.pk IS NOT NULL)), '[]') AS VARCHAR) AS "top_parts"
             |FROM (SELECT l_returnflag AS flag, count(*) AS cnt
             |      FROM lineitem GROUP BY 1) f
             |LEFT JOIN ranked r ON r.flag = f.flag AND r.rn <= 2
             |GROUP BY f.flag, f.cnt
             |ORDER BY "flag" ASC NULLS FIRST, "cnt" ASC, "top_parts" ASC""".stripMargin)),

    // training-data slicing through the front door: the deterministic
    // hash split is a first-class DIMENSION on the documents cube, so
    // "how many docs/tokens per split per language, excluding test"
    // is one declarative cube query — and the oracle re-derives the
    // split from the same md5 buckets, proving any engine reproduces it.
    NamedQuery("q107_parsed_split_dim",
      (s, d) => QueryParser.parse(Cubes.documentsCube(s, d),
        """{ "cube": "documents",
          |  "args": { "split": {"notEq": "test"},
          |            "options": {"asc": ["split", "lang"]} },
          |  "fields": [
          |    {"name": "split"},
          |    {"name": "lang"},
          |    {"name": "count", "alias": "n_docs"},
          |    {"name": "sumTokens", "alias": "n_tokens"} ] }""".stripMargin).query.toDF,
      Some("""WITH m AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
             |  FROM documents),
             |sc AS (
             |  SELECT doc_id, len(toks) AS n_tokens,
             |    len(list_filter(list_transform(toks, x -> lower(x)),
             |      x -> list_contains(['the','a','and','of','to','is'], x))) AS s_en,
             |    len(list_filter(list_transform(toks, x -> lower(x)),
             |      x -> list_contains(['el','la','de','que','y','en'], x))) AS s_es,
             |    len(list_filter(list_transform(toks, x -> lower(x)),
             |      x -> list_contains(['der','die','das','und','ist'], x))) AS s_de,
             |    len(list_filter(list_transform(toks, x -> lower(x)),
             |      x -> list_contains(['le','les','et','une','dans'], x))) AS s_fr
             |  FROM m),
             |q AS (
             |  SELECT doc_id, n_tokens,
             |    CASE
             |      WHEN s_en >= greatest(s_en, s_es, s_de, s_fr) AND greatest(s_en, s_es, s_de, s_fr) > 0 THEN 'en'
             |      WHEN s_es >= greatest(s_es, s_de, s_fr) AND greatest(s_es, s_de, s_fr) > 0 THEN 'es'
             |      WHEN s_de >= greatest(s_de, s_fr) AND greatest(s_de, s_fr) > 0 THEN 'de'
             |      WHEN s_fr > 0 THEN 'fr'
             |      ELSE 'und' END AS lang,
             |    CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 80 THEN 'train'
             |         WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 90 THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM sc)
             |SELECT split, lang, count(*) AS n_docs,
             |CAST(sum(n_tokens) AS BIGINT) AS n_tokens
             |FROM q WHERE split <> 'test' GROUP BY 1, 2
             |ORDER BY split ASC NULLS FIRST, lang ASC NULLS FIRST,
             |n_docs ASC, n_tokens ASC""".stripMargin)),

    // EXPLODING dimension through the front door (ClickHouse arrayJoin):
    // top tokens by frequency — slicing on `token` emits one row per
    // array element before aggregation, so `count` counts tokens
    NamedQuery("q111_parsed_token_freq",
      (s, d) => QueryParser.parse(Cubes.documentsCube(s, d),
        """{ "cube": "documents",
          |  "args": { "options": {"desc": "cnt", "limit": 10} },
          |  "fields": [
          |    {"name": "token"},
          |    {"name": "count", "alias": "cnt"} ] }""".stripMargin).query.toDF,
      Some("""SELECT token, count(*) AS cnt FROM (
             |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
             |  FROM documents)
             |GROUP BY 1
             |ORDER BY cnt DESC NULLS LAST, token ASC NULLS FIRST
             |LIMIT 10""".stripMargin)),

    // round-4 composition capstone: exploding dimension × deterministic
    // split selector × pushdown-able row filter in ONE front-door query
    // — "top training-split tokens among substantial documents"
    NamedQuery("q112_parsed_train_tokens",
      (s, d) => QueryParser.parse(Cubes.documentsCube(s, d),
        """{ "cube": "documents",
          |  "args": { "split": {"eq": "train"}, "nChars": {"gt": 200},
          |            "options": {"desc": "cnt", "limit": 5} },
          |  "fields": [
          |    {"name": "token"},
          |    {"name": "count", "alias": "cnt"} ] }""".stripMargin).query.toDF,
      Some("""WITH t AS (
             |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
             |  FROM documents
             |  WHERE n_chars > 200
             |    AND CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 80)
             |SELECT token, count(*) AS cnt FROM t
             |GROUP BY 1
             |ORDER BY cnt DESC NULLS LAST, token ASC NULLS FIRST
             |LIMIT 5""".stripMargin)),

    // retention THROUGH the front door: the plan-backed retentionWeekly
    // metric sliced by deterministic experiment arm — the ClickHouse
    // `retention(...) GROUP BY dim` shape as one declarative cube query.
    // The per-user flag level compiles as its own two-level aggregation
    // and joins back on the slice key (Compiler plan-backed path).
    NamedQuery("q113_parsed_retention_arm",
      (s, d) => QueryParser.parse(Cubes.eventsCube(s, d),
        """{ "cube": "events",
          |  "args": { "options": {"asc": "arm"} },
          |  "fields": [
          |    {"name": "arm"},
          |    {"name": "retentionWeekly", "alias": "retention"},
          |    {"name": "uniqueUsers", "alias": "users"} ] }""".stripMargin).query.toDF,
      Some("""WITH f AS (
             |  SELECT CAST(CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 4 AS BIGINT) AS arm,
             |         user_id, event_type, ts
             |  FROM events),
             |pu AS (
             |  SELECT arm, user_id,
             |    max(CASE WHEN event_type = 'signup'
             |             AND ts < TIMESTAMP '2024-01-04' THEN 1 ELSE 0 END) AS r0,
             |    max(CASE WHEN ts >= TIMESTAMP '2024-01-08'
             |             AND ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END) AS r1,
             |    max(CASE WHEN ts >= TIMESTAMP '2024-01-22'
             |             AND ts < TIMESTAMP '2024-01-29' THEN 1 ELSE 0 END) AS r2
             |  FROM f GROUP BY 1, 2)
             |SELECT arm,
             |  CAST(to_json([CAST(sum(r0) AS BIGINT), CAST(sum(r0 * r1) AS BIGINT),
             |                CAST(sum(r0 * r2) AS BIGINT)]) AS VARCHAR) AS retention,
             |  CAST(count(*) AS BIGINT) AS users
             |FROM pu GROUP BY 1
             |ORDER BY arm ASC NULLS FIRST""".stripMargin)),

    // the funnel frame AS a cube fact, queried through the front door:
    // slice by stage, count users, selector filters out stage-0 (users
    // with funnel events but no anchor) — event-sequence analytics
    // composing with the generic query surface. Oracle = q97's
    // min-join-chain with the same filter.
    NamedQuery("q103_parsed_funnel_cube",
      (s, d) => QueryParser.parse(Cubes.funnelCube(s, d),
        """{ "cube": "funnel",
          |  "args": { "stage": {"gt": 0}, "options": {"asc": "stage"} },
          |  "fields": [
          |    {"name": "stage"},
          |    {"name": "users", "alias": "n_users"} ] }""".stripMargin).query.toDF,
      Some("""WITH f AS (SELECT user_id, ts, event_type FROM events
             |          WHERE event_type IN ('signup', 'view', 'purchase')),
             |u AS (SELECT DISTINCT user_id FROM f),
             |s1 AS (SELECT user_id, min(ts) AS t1 FROM f WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (SELECT f.user_id, min(f.ts) AS t2 FROM f JOIN s1 USING (user_id)
             |       WHERE f.event_type = 'view' AND f.ts > s1.t1
             |         AND f.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY 1),
             |s3 AS (SELECT f.user_id, min(f.ts) AS t3 FROM f
             |       JOIN s2 USING (user_id) JOIN s1 USING (user_id)
             |       WHERE f.event_type = 'purchase' AND f.ts > s2.t2
             |         AND f.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY 1),
             |st AS (SELECT u.user_id,
             |       CASE WHEN s3.user_id IS NOT NULL THEN 3
             |            WHEN s2.user_id IS NOT NULL THEN 2
             |            WHEN s1.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage
             |       FROM u LEFT JOIN s1 USING (user_id)
             |              LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id))
             |SELECT CAST(stage AS INT) AS stage, CAST(count(*) AS BIGINT) AS n_users
             |FROM st WHERE stage > 0 GROUP BY 1
             |ORDER BY stage ASC NULLS FIRST, n_users ASC""".stripMargin)),

    // CHUNKING through the front door: the sliding-window chunk table
    // (q136's library operator) as an EXPLODING dimension — one row per
    // chunk, the (idx, n_tokens, chunk_md5) element serialized by the
    // `json` sub-field. The oracle replays the window arithmetic AND
    // the json serialization, so explode placement, chunk math and
    // struct field order all have to be right.
    NamedQuery("q139_parsed_chunks",
      (s, d) => QueryParser.parse(Cubes.documentsCube(s, d),
        """{ "cube": "documents",
          |  "args": { "options": {"asc": ["doc_id", "chunk__json"]} },
          |  "fields": [
          |    {"name": "docId", "alias": "doc_id"},
          |    {"name": "chunk", "fields": [{"name": "json"}]},
          |    {"name": "count", "alias": "cnt"} ] }""".stripMargin).query.toDF,
      Some("""WITH t AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w,
             |    ((greatest(len(string_split_regex(trim(text), '\s+')) - 40, 0)
             |      + 29) // 30) * 30 AS max_start
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, w,
             |    unnest(range(0, max_start + 1, 30)) AS s
             |  FROM t)
             |SELECT doc_id,
             |  CAST(to_json({'idx': CAST(s // 30 AS INT),
             |                'n_tokens': CAST(len(w[s+1:s+40]) AS INT),
             |                'chunk_md5': md5(array_to_string(w[s+1:s+40], ' '))})
             |    AS VARCHAR) AS chunk__json,
             |  count(*) AS cnt
             |FROM c GROUP BY 1, 2
             |ORDER BY doc_id ASC NULLS FIRST, chunk__json ASC NULLS FIRST,
             |cnt ASC""".stripMargin)),

    // the BIGRAM QUALITY GATE through the front door: avgLogprob is the
    // plan-backed corpus-trained bigram score (q137's operator), model
    // trained on the WHERE-filtered corpus, each source averaging its
    // own documents' scores. The oracle retrains the identical model —
    // predecessor counts derived from the bigram counts — and, like the
    // engine, keeps per-doc scores UNROUNDED: the one round(…,6) sits
    // on the group mean (double rounding flipped a 6th decimal in r7).
    NamedQuery("q140_parsed_bigram_gate",
      (s, d) => QueryParser.parse(Cubes.documentsCube(s, d),
        """{ "cube": "documents",
          |  "args": { "nChars": {"gt": 100}, "options": {"asc": "source"} },
          |  "fields": [
          |    {"name": "source"},
          |    {"name": "count", "alias": "n_docs"},
          |    {"name": "avgLogprob", "alias": "avg_logprob"} ] }""".stripMargin).query.toDF,
      Some("""WITH d AS (SELECT * FROM documents WHERE n_chars > 100),
             |t AS (
             |  SELECT doc_id, source,
             |    string_split_regex(trim(lower(text)), '\s+') AS w
             |  FROM d),
             |bg AS (
             |  SELECT doc_id,
             |    unnest([{'p': w[i], 'c': w[i+1]} for i in range(1, len(w))],
             |           recursive := true)
             |  FROM t WHERE len(w) >= 2),
             |c2 AS (SELECT p, c, count(*) AS cnt2 FROM bg GROUP BY 1, 2),
             |c1 AS (SELECT p, CAST(sum(cnt2) AS BIGINT) AS cnt1 FROM c2 GROUP BY 1),
             |v AS (SELECT count(DISTINCT tok) AS nv
             |      FROM (SELECT unnest(w) AS tok FROM t)),
             |sc AS (
             |  SELECT bg.doc_id,
             |    avg(ln((cnt2 + 1.0) / (cnt1 + nv))) AS lp
             |  FROM bg JOIN c2 USING (p, c) JOIN c1 USING (p) CROSS JOIN v
             |  GROUP BY 1)
             |SELECT t.source, count(*) AS n_docs,
             |  round(avg(sc.lp), 6) AS avg_logprob
             |FROM t LEFT JOIN sc USING (doc_id)
             |GROUP BY 1
             |ORDER BY source ASC NULLS FIRST, n_docs ASC, avg_logprob ASC""".stripMargin)),

    // the TOKEN-BUDGET MIXTURE through the front door: mixTokens is the
    // plan-backed greedy budget prefix (q122's operator) with the
    // budget as a metric arg — each source is its own stratum, the
    // metric is the tokens the mix takes from it. The oracle replays
    // the identical (quality desc, id asc) running-sum window.
    NamedQuery("q141_parsed_mixture",
      (s, d) => QueryParser.parse(Cubes.documentsCube(s, d),
        """{ "cube": "documents",
          |  "args": { "options": {"asc": "source"} },
          |  "fields": [
          |    {"name": "source"},
          |    {"name": "count", "alias": "n_docs"},
          |    {"name": "mixTokens", "alias": "mix_tokens",
          |     "args": {"budget": 300}} ] }""".stripMargin).query.toDF,
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
             |  SELECT doc_id, source, n_tokens,
             |    sum(n_tokens) OVER (PARTITION BY source
             |      ORDER BY quality DESC, doc_id ASC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM q),
             |kept AS (
             |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS mix_tokens
             |  FROM sel WHERE cum <= 300 GROUP BY 1),
             |g AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
             |SELECT g.source, g.n_docs,
             |  coalesce(k.mix_tokens, 0) AS mix_tokens
             |FROM g LEFT JOIN kept k USING (source)
             |ORDER BY source ASC NULLS FIRST, n_docs ASC, mix_tokens ASC""".stripMargin)),

    // the AUDIO FEATURE TABLE through the front door: the decoded
    // per-media features (q133's real-codec pipeline) as a cube fact —
    // media metadata readouts are ordinary parsed queries. Oracle =
    // q133's analytic synth mirror, grouped per media.
    NamedQuery("q142_parsed_audio_cube",
      (s, d) => QueryParser.parse(Cubes.audioCube(s, d),
        """{ "cube": "audio",
          |  "args": { "options": {"asc": "media_id"} },
          |  "fields": [
          |    {"name": "mediaId", "alias": "media_id"},
          |    {"name": "count", "alias": "cnt"},
          |    {"name": "sumSamples", "alias": "n_samples"},
          |    {"name": "avgDurationMs", "alias": "duration_ms"},
          |    {"name": "avgRms", "alias": "rms"} ] }""".stripMargin).query.toDF,
      Some("""WITH t AS (
             |  SELECT doc_id, text, length(text) AS ncp,
             |    200 + (length(text) % 100) AS n
             |  FROM documents),
             |sm AS (
             |  SELECT doc_id, n,
             |    [ ((unicode(text[(i % ncp) + 1]) * 131 + i * 7) % 65536) - 32768
             |      for i in range(0, n) ] AS s
             |  FROM t)
             |SELECT doc_id AS media_id, CAST(1 AS BIGINT) AS cnt,
             |  CAST(n AS BIGINT) AS n_samples,
             |  round(n * 1000.0 / 8000.0, 6) AS duration_ms,
             |  round(sqrt(list_sum([ (x * x)::DOUBLE for x in s ]) / n), 6) AS rms
             |FROM sm ORDER BY media_id ASC""".stripMargin)),

    // the VIDEO FRAME TABLE through the front door: per-frame decoded
    // features (q134's seek-sampled motion-PNG pipeline) as a cube
    // fact, with a selector picking frame 0 — "first-frame thumbnail
    // stats per media" as one parsed query. Oracle = q134's analytic
    // mirror restricted to f = 0.
    NamedQuery("q143_parsed_video_cube",
      (s, d) => QueryParser.parse(Cubes.videoCube(s, d),
        """{ "cube": "video",
          |  "args": { "frameIdx": {"eq": 0},
          |            "options": {"asc": "media_id"} },
          |  "fields": [
          |    {"name": "mediaId", "alias": "media_id"},
          |    {"name": "frames", "alias": "cnt"},
          |    {"name": "maxWidth", "alias": "width"},
          |    {"name": "maxHeight", "alias": "height"},
          |    {"name": "avgBrightness", "alias": "brightness"} ] }""".stripMargin).query.toDF,
      Some("""WITH m AS (
             |  SELECT doc_id, text,
             |    CAST(1 + (doc_id % 8) AS INT) AS width,
             |    CAST(1 + (octet_length(CAST(text AS BLOB)) % 8) AS INT) AS height,
             |    octet_length(CAST(text AS BLOB)) AS blen
             |  FROM documents)
             |SELECT doc_id AS media_id, CAST(1 AS BIGINT) AS cnt, width, height,
             |  round(list_avg([ord(text[(p % blen) + 1])
             |                  for p in range(0, width*height)]), 6) AS brightness
             |FROM m ORDER BY media_id ASC""".stripMargin)),

    // parser → compiler, flat response; desc cnt + limit with tiebreaks;
    // metric-level filter via args on the metric; nil-arg op pruned
    NamedQuery("q70_parsed_flat",
      (s, d) => QueryParser.parse(Cubes.lineitemCube(s, d), flatDoc).query.toDF,
      Some("""SELECT * FROM (
             |SELECT l_returnflag AS "flag",
             |CAST(year(l_shipdate) AS INT) AS "shipDate__year",
             |count(*) AS "cnt",
             |round(sum(l_extendedprice) FILTER (WHERE l_quantity > 25), 2) AS "amount"
             |FROM lineitem
             |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1998-12-31 00:00:00'
             |AND l_quantity > 5
             |GROUP BY 1, 2)
             |ORDER BY cnt DESC NULLS LAST, "flag" ASC NULLS FIRST,
             |"shipDate__year" ASC NULLS FIRST, "amount" ASC NULLS FIRST
             |LIMIT 10""".stripMargin)),

    // parser → compiler → Renest: nested struct response (R3). The native
    // struct form is spec-covered (ParserSpec); the driver-facing row
    // serializes the struct with to_json — the driver's pandas harness
    // cannot hash nested values (round-1 red row).
    NamedQuery("q71_parsed_nested",
      (s, d) => {
        import org.apache.spark.sql.functions.{col, to_json}
        val parsed = QueryParser.parse(Cubes.lineitemCube(s, d), nestedDoc)
        Renest.nest(parsed.query.toDF, parsed.root)
          .withColumn("shipDate", to_json(col("shipDate")))
      },
      Some("""SELECT l_returnflag AS "flag",
             |CAST(to_json({'year': CAST(year(l_shipdate) AS INT),
             | 'month': CAST(month(l_shipdate) AS INT)}) AS VARCHAR) AS "shipDate",
             |count(*) AS "cnt"
             |FROM lineitem GROUP BY 1, year(l_shipdate), month(l_shipdate)
             |ORDER BY "flag" ASC NULLS FIRST,
             |CAST(year(l_shipdate) AS INT) ASC NULLS FIRST,
             |CAST(month(l_shipdate) AS INT) ASC NULLS FIRST, "cnt" ASC""".stripMargin)),

    // parser with any: OR-tree + ordered options desc→limitBy→limit (O10+O16)
    NamedQuery("q72_parsed_any_limitby",
      (s, d) => QueryParser.parse(Cubes.lineitemCube(s, d), anyDoc).query.toDF,
      Some("""SELECT "flag", "shipDate__year", "cnt" FROM (
             |SELECT "flag", "shipDate__year", "cnt", row_number() OVER (
             |  PARTITION BY "flag"
             |  ORDER BY "cnt" DESC NULLS LAST, "shipDate__year" ASC NULLS FIRST) AS rn
             |FROM (SELECT l_returnflag AS "flag",
             |  CAST(year(l_shipdate) AS INT) AS "shipDate__year", count(*) AS "cnt"
             |  FROM lineitem
             |  WHERE (l_returnflag = 'R' AND l_quantity > 30)
             |     OR (l_linestatus = 'F' AND l_quantity < 5)
             |  GROUP BY 1, 2))
             |WHERE rn <= 2
             |ORDER BY "cnt" DESC NULLS LAST, "flag" ASC NULLS FIRST,
             |"shipDate__year" ASC NULLS FIRST
             |LIMIT 4""".stripMargin)),

    // DSIR importance through the front door: avgDsirWeight is the
    // plan-backed per-group mean log importance weight of the slice's
    // docs against the VALIDATION split as the target distribution
    // (q158's operator as a cube metric). The oracle re-derives the
    // hashed-n-gram models, the per-doc weights, and the deterministic
    // split — composed with the nChars predicate the metric must honor.
    NamedQuery("q161_parsed_dsir",
      (s, d) => QueryParser.parse(Cubes.documentsCube(s, d),
        """{ "cube": "documents",
          |  "args": { "nChars": {"gt": 100}, "options": {"asc": "source"} },
          |  "fields": [
          |    {"name": "source"},
          |    {"name": "count", "alias": "n_docs"},
          |    {"name": "avgDsirWeight", "alias": "avg_dsir"} ] }""".stripMargin).query.toDF,
      Some("""WITH d AS (SELECT * FROM documents WHERE n_chars > 100),
             |t AS (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS w FROM d),
             |g AS (SELECT doc_id, unnest(list_concat(w,
             |    [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))])) AS gram
             |  FROM t),
             |bk AS (SELECT doc_id,
             |    CAST(CAST(('0x' || substring(md5(gram), 1, 8)) AS UBIGINT) % 4096 AS BIGINT) AS bucket
             |  FROM g),
             |feats AS (SELECT doc_id, bucket, count(*) AS cnt FROM bk GROUP BY 1, 2),
             |rawc AS (SELECT bucket, sum(cnt) AS c FROM feats GROUP BY 1),
             |rawn AS (SELECT sum(c) AS n FROM rawc),
             |sp AS (SELECT doc_id FROM d
             |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 >= 80
             |    AND CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 90),
             |tgtc AS (SELECT bucket, sum(cnt) AS c FROM feats JOIN sp USING (doc_id) GROUP BY bucket),
             |tgtn AS (SELECT sum(c) AS n FROM tgtc),
             |buckets AS (SELECT unnest(range(0, 4096)) AS bucket),
             |model AS (SELECT buckets.bucket,
             |    ln((coalesce(tgtc.c, 0) + 1.0) / (coalesce(tgtn.n, 0) + 4096.0)) -
             |    ln((coalesce(rawc.c, 0) + 1.0) / (coalesce(rawn.n, 0) + 4096.0)) AS dlog
             |  FROM buckets LEFT JOIN tgtc USING (bucket)
             |  LEFT JOIN rawc USING (bucket), tgtn, rawn),
             |sc AS (SELECT feats.doc_id, sum(feats.cnt * model.dlog) AS log_w
             |  FROM feats JOIN model USING (bucket) GROUP BY 1),
             |w AS (SELECT t.doc_id, t.source, coalesce(sc.log_w, 0.0) AS log_w
             |  FROM t LEFT JOIN sc USING (doc_id))
             |SELECT source, count(*) AS n_docs, round(avg(log_w), 6) AS avg_dsir
             |FROM w GROUP BY 1
             |ORDER BY source ASC NULLS FIRST, n_docs ASC, avg_dsir ASC""".stripMargin)),

    // the deterministic output-shard assignment as a front-door slice:
    // per shard, membership and token mass — the q159 audit composed
    // through the generic cube path instead of the dedicated operator.
    NamedQuery("q162_parsed_shard",
      (s, d) => QueryParser.parse(Cubes.documentsCube(s, d),
        """{ "cube": "documents",
          |  "args": { "options": {"asc": "shard"} },
          |  "fields": [
          |    {"name": "shard"},
          |    {"name": "count", "alias": "n_docs"},
          |    {"name": "sumTokens", "alias": "n_tokens"} ] }""".stripMargin).query.toDF,
      Some("""SELECT
             |CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 8 AS BIGINT) AS shard,
             |count(*) AS n_docs,
             |CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
             |FROM documents GROUP BY 1
             |ORDER BY shard ASC NULLS FIRST, n_docs ASC, n_tokens ASC""".stripMargin))
  )
}
