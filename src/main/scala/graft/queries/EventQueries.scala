package graft.queries

import graft.cubes.{Cubes, Tables}
import graft.query.{CubeQuery, Pred}
import graft.streaming.Streaming
import org.apache.spark.sql.{functions => F}

/** Event-stream queries. The windowed transforms are the SAME functions
  * StreamingSpec runs as live streams — here they execute in batch mode
  * so DuckDB can oracle them (window starts as epoch millis; session
  * islands via lag/cumsum).
  */
object EventQueries {
  import org.apache.spark.sql.functions.col

  val qs: Seq[NamedQuery] = Seq(

    // events as a plain cube (slice by type/hour, standard metrics)
    NamedQuery("q40_events_cube",
      (s, d) => CubeQuery(Cubes.eventsCube(s, d))
        .slice("event_type", "eventType")
        .measure("cnt", "count")
        .measure("sum_value", "sumValue")
        .measure("uniq_users", "uniqueUsers")
        .when(Pred.gteq("value", 10))
        .asc("event_type")
        .toDF,
      Some("""SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value,
             |count(DISTINCT user_id) AS uniq_users
             |FROM events WHERE value >= 10
             |GROUP BY 1 ORDER BY event_type ASC NULLS FIRST, cnt ASC, sum_value ASC, uniq_users ASC"""
        .stripMargin)),

    // tumbling 1h windows
    NamedQuery("q41_tumbling_window",
      (s, d) => Streaming.tumblingCounts(Tables.events(s, d))
        .orderBy(col("win_start").asc, col("event_type").asc),
      Some("""SELECT epoch_ms(date_trunc('hour', ts)) AS win_start,
             |epoch_ms(date_trunc('hour', ts) + INTERVAL 1 HOUR) AS win_end,
             |event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
             |FROM events GROUP BY 1, 2, 3
             |ORDER BY win_start ASC, event_type ASC, win_end ASC, cnt ASC, sum_value ASC"""
        .stripMargin)),

    // sliding 1h/30min windows (each event lands in 2 windows)
    NamedQuery("q42_sliding_window",
      (s, d) => Streaming.slidingCounts(Tables.events(s, d))
        .orderBy(col("win_start").asc, col("event_type").asc),
      Some("""WITH w AS (
             |  SELECT e.*, time_bucket(INTERVAL 30 MINUTES, ts) - (off * INTERVAL 30 MINUTES) AS win_start
             |  FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS off))
             |SELECT epoch_ms(win_start) AS win_start,
             |epoch_ms(win_start + INTERVAL 1 HOUR) AS win_end,
             |event_type, count(*) AS cnt
             |FROM w GROUP BY 1, 2, 3
             |ORDER BY win_start ASC, event_type ASC, win_end ASC, cnt ASC""".stripMargin)),

    // session windows (30 min gap) per user
    NamedQuery("q43_session_window",
      (s, d) => Streaming.sessionAggs(Tables.events(s, d))
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

    // JSON payload extraction from props
    NamedQuery("q44_props_json",
      (s, d) => Streaming.propsExtract(Tables.events(s, d))
        .orderBy(col("event_type").asc),
      Some("""SELECT event_type, count(*) AS cnt,
             |CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
             |round(avg(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)), 4) AS avg_k
             |FROM events
             |WHERE CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) > 50
             |GROUP BY 1 ORDER BY event_type ASC""".stripMargin)),

    // the same props pipeline through Spark 4's VARIANT type: parse the
    // JSON ONCE into the binary variant encoding, then field access is
    // a byte-offset read — at 100 TB this replaces a regex/JSON reparse
    // per access (q44's shape) with one parse per row, and variant
    // columns can be stored parsed. Same oracle family as q44.
    NamedQuery("q83_props_variant",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
          F.variant_get(F.parse_json(col("props")), "$.k", "long").as("k"))
        .filter(col("k") > 50)
        .groupBy(col("event_type"))
        .agg(F.count(F.lit(1)).as("cnt"), F.sum("k").as("sum_k"),
          F.round(F.avg("k"), 4).as("avg_k"))
        .orderBy(col("event_type").asc),
      Some("""SELECT event_type, count(*) AS cnt,
             |CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
             |round(avg(CAST(props->>'$.k' AS BIGINT)), 4) AS avg_k
             |FROM events
             |WHERE CAST(props->>'$.k' AS BIGINT) > 50
             |GROUP BY 1 ORDER BY event_type ASC""".stripMargin)),

    // as-of join: each purchase matched to the user's latest prior-or-
    // simultaneous signup (DuckDB has native ASOF JOIN — the oracle);
    // implemented as union+window, one shuffle, no interval explosion
    NamedQuery("q46_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.operators.Joins.asOf(
            left = ev.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("event_id"), col("value")),
            right = ev.filter(col("event_type") === "signup")
              .select(col("user_id"), col("ts"), col("event_id"), col("value")),
            keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
            valueCols = Seq("event_id" -> "signup_event_id", "ts" -> "signup_ts"))
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
             |ON p.user_id = s.user_id AND p.ts >= s.ts
             |ORDER BY p.user_id ASC, purchase_ms ASC, purchase_event_id ASC"""
        .stripMargin)),

    // the SAME as-of semantics through the native custom operator
    // (AsOfJoinPlan -> AsOfStrategy -> AsOfJoinExec, single merge pass) —
    // identical oracle to q46 proves logical/physical equivalence
    NamedQuery("q66_asof_native",
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.plans.AsOfJoin.dataframe(s,
            left = ev.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("event_id")),
            right = ev.filter(col("event_type") === "signup")
              .select(col("user_id"), col("ts"), col("event_id")),
            keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
            valueCols = Seq("event_id" -> "signup_event_id", "ts" -> "signup_ts"))
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
             |ON p.user_id = s.user_id AND p.ts >= s.ts
             |ORDER BY p.user_id ASC, purchase_ms ASC, purchase_event_id ASC"""
        .stripMargin)),

    // LEFT as-of flavor through the native exec: purchases with no prior
    // signup survive with NULL payload (coalesced to -1 on both sides so
    // the driver's pandas dtypes stay integral). Oracle is DuckDB's
    // native ASOF LEFT JOIN.
    NamedQuery("q78_asof_left",
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.plans.AsOfJoin.dataframe(s,
            left = ev.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("event_id")),
            right = ev.filter(col("event_type") === "signup")
              .select(col("user_id"), col("ts"), col("event_id")),
            keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
            valueCols = Seq("event_id" -> "signup_event_id", "ts" -> "signup_ts"),
            joinType = "left")
          .select(col("user_id"), F.unix_millis(col("ts")).as("purchase_ms"),
            col("event_id").as("purchase_event_id"),
            F.coalesce(col("signup_event_id"), F.lit(-1L)).as("signup_event_id"),
            F.coalesce(F.unix_millis(col("signup_ts")), F.lit(-1L)).as("signup_ms"))
          .orderBy(col("user_id").asc, col("purchase_ms").asc,
            col("purchase_event_id").asc)
      },
      Some("""SELECT p.user_id, epoch_ms(p.ts) AS purchase_ms,
             |p.event_id AS purchase_event_id,
             |COALESCE(s.event_id, -1) AS signup_event_id,
             |COALESCE(epoch_ms(s.ts), -1) AS signup_ms
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
             |ON p.user_id = s.user_id AND p.ts >= s.ts
             |ORDER BY p.user_id ASC, purchase_ms ASC, purchase_event_id ASC"""
        .stripMargin)),

    // stream-stream interval join transform, batch-executed (the same
    // function runs watermarked in StreamingSpec)
    NamedQuery("q49_interval_join",
      (s, d) => Streaming.purchasesWithRecentSignup(Tables.events(s, d))
        .orderBy(col("user_id").asc, col("purchase_ms").asc,
          col("purchase_id").asc, col("signup_id").asc),
      Some("""SELECT p.user_id, p.event_id AS purchase_id, s.event_id AS signup_id,
             |epoch_ms(p.ts) AS purchase_ms, epoch_ms(s.ts) AS signup_ms
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |JOIN (SELECT * FROM events WHERE event_type = 'signup') s
             |ON p.user_id = s.user_id AND s.ts <= p.ts
             |AND s.ts >= p.ts - INTERVAL 1 HOUR
             |ORDER BY p.user_id ASC, purchase_ms ASC, purchase_id ASC, signup_id ASC"""
        .stripMargin)),

    // streaming dedup transform, batch-executed (event_id is unique in the
    // fixture, so dedup must be a no-op — oracled as the raw count)
    NamedQuery("q45_stream_dedup",
      (s, d) => Streaming.dedupedEvents(
          Tables.events(s, d).unionAll(Tables.events(s, d)))
        .groupBy(col("event_type"))
        .agg(F.count(F.lit(1)).as("cnt"))
        .orderBy(col("event_type").asc),
      Some("""SELECT event_type, count(*) AS cnt FROM events
             |GROUP BY 1 ORDER BY event_type ASC""".stripMargin)),

    // window funnel (ClickHouse windowFunnel analogue): furthest
    // signup -> view -> purchase stage within 7 days of the user's FIRST
    // signup, strictly ordered. ONE shuffle (per-user collect + codegen'd
    // chain scan); the oracle mirrors the greedy-earliest chain as
    // successive min-joins.
    NamedQuery("q97_window_funnel",
      (s, d) => graft.operators.Funnel.funnelStages(
          Tables.events(s, d), col("user_id"), col("ts"), col("event_type"),
          Seq("signup", "view", "purchase"), windowMicros = 7L * 86400 * 1000000)
        .groupBy(col("stage"))
        .agg(F.count(F.lit(1)).as("n_users"))
        .orderBy(col("stage").asc),
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
             |FROM st GROUP BY 1 ORDER BY stage ASC""".stripMargin)),

    // ANY-anchor window funnel (full ClickHouse windowFunnel semantics):
    // the chain may start at ANY signup, so users who missed the window
    // from their first anchor but converted from a later one count.
    // The oracle is the EXACT exists-a-chain form (triple join) — the
    // DP must agree with brute force on every user.
    NamedQuery("q106_window_funnel_any",
      (s, d) => graft.operators.Funnel.funnelStages(
          Tables.events(s, d), col("user_id"), col("ts"), col("event_type"),
          Seq("signup", "view", "purchase"), windowMicros = 7L * 86400 * 1000000,
          anyAnchor = true)
        .groupBy(col("stage"))
        .agg(F.count(F.lit(1)).as("n_users"))
        .orderBy(col("stage").asc),
      Some("""WITH f AS (SELECT user_id, ts, event_type FROM events
             |          WHERE event_type IN ('signup', 'view', 'purchase')),
             |u AS (SELECT DISTINCT user_id FROM f),
             |c1 AS (SELECT DISTINCT user_id FROM f WHERE event_type = 'signup'),
             |c2 AS (SELECT DISTINCT a.user_id FROM f a
             |       JOIN f b ON b.user_id = a.user_id AND b.event_type = 'view'
             |         AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 7 DAY
             |       WHERE a.event_type = 'signup'),
             |c3 AS (SELECT DISTINCT a.user_id FROM f a
             |       JOIN f b ON b.user_id = a.user_id AND b.event_type = 'view'
             |         AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 7 DAY
             |       JOIN f c ON c.user_id = a.user_id AND c.event_type = 'purchase'
             |         AND c.ts > b.ts AND c.ts <= a.ts + INTERVAL 7 DAY
             |       WHERE a.event_type = 'signup'),
             |st AS (SELECT u.user_id,
             |       CASE WHEN u.user_id IN (SELECT user_id FROM c3) THEN 3
             |            WHEN u.user_id IN (SELECT user_id FROM c2) THEN 2
             |            WHEN u.user_id IN (SELECT user_id FROM c1) THEN 1
             |            ELSE 0 END AS stage FROM u)
             |SELECT CAST(stage AS INT) AS stage, CAST(count(*) AS BIGINT) AS n_users
             |FROM st GROUP BY 1 ORDER BY stage ASC""".stripMargin)),

    // cohort retention (ClickHouse retention analogue): of users who
    // signed up in the first 3 days, how many returned in week 2 and in
    // week 4 — per-user boolean flags, one aggregation, no joins.
    NamedQuery("q98_retention",
      (s, d) => graft.operators.Funnel.retention(
          Tables.events(s, d), col("user_id"), Seq(
            col("event_type") === "signup" &&
              col("ts") < F.lit("2024-01-04").cast("timestamp"),
            col("ts") >= F.lit("2024-01-08").cast("timestamp") &&
              col("ts") < F.lit("2024-01-15").cast("timestamp"),
            col("ts") >= F.lit("2024-01-22").cast("timestamp") &&
              col("ts") < F.lit("2024-01-29").cast("timestamp"))),
      Some("""SELECT CAST(sum(r0) AS BIGINT) AS n_cohort,
             |CAST(sum(r0 * r1) AS BIGINT) AS retained_1,
             |CAST(sum(r0 * r2) AS BIGINT) AS retained_2
             |FROM (SELECT user_id,
             |  max(CASE WHEN event_type = 'signup'
             |           AND ts < TIMESTAMP '2024-01-04' THEN 1 ELSE 0 END) AS r0,
             |  max(CASE WHEN ts >= TIMESTAMP '2024-01-08'
             |           AND ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END) AS r1,
             |  max(CASE WHEN ts >= TIMESTAMP '2024-01-22'
             |           AND ts < TIMESTAMP '2024-01-29' THEN 1 ELSE 0 END) AS r2
             |  FROM events GROUP BY 1)""".stripMargin))
  )
}
