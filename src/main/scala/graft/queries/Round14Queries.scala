package graft.queries

import graft.cubes.Tables
import org.apache.spark.sql.{functions => F}

/** Round-14 additions: row-level DELETE on manifested tables
  * (copy-on-write takedown — the right-to-be-forgotten path) and the
  * row-level change feed between snapshots (CDC from the file diff,
  * costed by what changed). Both verified the q196 way: the manifest
  * machinery runs for real against a scratch table built from the
  * fixture, and every decidable claim lands in the output with the
  * exact counts recomputed independently by the DuckDB oracle.
  */
object Round14Queries {
  import org.apache.spark.sql.functions.col

  /** Scratch dir per invocation with age-reaped siblings — the
    * Round13Queries.freshQueryDir discipline (two concurrent runs must
    * not wipe each other's live tables). */
  private def freshQueryDir(name: String): String = {
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - 2L * 3600 * 1000
    val siblings = java.nio.file.Files.list(tmp)
    try siblings.forEach { p =>
      if (p.getFileName.toString.startsWith(s"graft_q_${name}_") &&
          java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff) {
        val w = java.nio.file.Files.walk(p)
        try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.delete(f))
        finally w.close()
      }
    } finally siblings.close()
    java.nio.file.Files.createTempDirectory(s"graft_q_${name}_").toString
  }

  /** Language → planted marker tokens for q203, language-ascending.
    * The markers are the heuristic's OWN stopwords for the four
    * languages it knows (so the heuristic is confident on them) plus a
    * disjoint zh set the heuristic is blind to (coverage the trained
    * model adds; en uses the stopwords ABSENT from the fixture's
    * natural vocabulary — 'the'/'a' occur in every doc and would hand
    * the en model a corpus-wide score floor). The fixture's text
    * carries no real language signal —
    * its lang column is label-only — so the signal is planted
    * deterministically from the label, the same discipline as the PII
    * and domain queries (both engines plant identically). */
  private val langMarkers = Seq(
    "de" -> "der die das", "en" -> "and of is", "es" -> "el la que",
    "fr" -> "le les et", "zh" -> "shi zai bu")

  /** Shared featurization CTEs of the lang-id replay: the planted
    * relation d, tokens, grams, hashed buckets, per-doc totals, the
    * normalized feature frame, and the train-set size — one copy for
    * all five one-vs-rest models (the q174 CTEs, planted + lang kept). */
  private def langIdCtes(buckets: Int): String = {
    val markerCase = langMarkers.map { case (l, m) =>
      s"WHEN '$l' THEN '$m '" }.mkString(" ")
    s"""d AS MATERIALIZED (SELECT doc_id, lang,
       |    text || ' ' || repeat(CASE lang $markerCase ELSE '' END,
       |      CAST(doc_id % 3 + 5 AS INT)) AS text
       |  FROM documents),
       |t AS MATERIALIZED (SELECT doc_id, lang,
       |    string_split_regex(trim(text), '\\s+') AS w FROM d),
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
       |nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM
       |  (SELECT DISTINCT doc_id FROM fc))""".stripMargin
  }

  /** One language's full replay: label, grid-snapped GD rounds (the
    * q174 chain, suffixed), then the 1e-9 integer weights and the
    * per-doc integer score — exact LONG arithmetic, so the argmax
    * cannot flake across engines. */
  private def langIdModel(l: String, buckets: Int, iters: Int,
      lr: Double): String = {
    val init =
      s"""y_$l AS MATERIALIZED (SELECT t.doc_id,
         |    CASE WHEN t.lang = '$l' THEN 1.0 ELSE 0.0 END AS y
         |  FROM t JOIN tt ON tt.doc_id = t.doc_id),
         |w0_$l AS MATERIALIZED (SELECT unnest(range(-1, $buckets)) AS b, 0.0 AS w)""".stripMargin
    val rounds = (0 until iters).map { i =>
      s"""s${i}_$l AS MATERIALIZED (SELECT f.doc_id, sum(f.x * w.w) AS z
         |  FROM feats f JOIN w${i}_$l w ON w.b = f.bucket GROUP BY 1),
         |r${i}_$l AS MATERIALIZED (SELECT y.doc_id,
         |    1.0 / (1.0 + exp(-(s.z + (SELECT w FROM w${i}_$l WHERE b = -1)))) - y.y AS r
         |  FROM y_$l y JOIN s${i}_$l s USING (doc_id)),
         |g${i}_$l AS MATERIALIZED (SELECT f.bucket AS b, sum(f.x * r.r) AS g
         |  FROM feats f JOIN r${i}_$l r USING (doc_id) GROUP BY 1),
         |w${i + 1}_$l AS MATERIALIZED (SELECT wp.b,
         |    round(wp.w - $lr * (CASE WHEN wp.b = -1
         |        THEN (SELECT sum(r) FROM r${i}_$l)
         |        ELSE coalesce((SELECT g FROM g${i}_$l gg WHERE gg.b = wp.b), 0.0)
         |      END) / (SELECT n FROM nn), 9) AS w
         |  FROM w${i}_$l wp)""".stripMargin
    }
    val score =
      s"""wi_$l AS MATERIALIZED (SELECT b,
         |    CAST(round(w * 1e9) AS BIGINT) AS wi FROM w${iters}_$l),
         |z_$l AS MATERIALIZED (SELECT fc.doc_id,
         |    CAST(sum(fc.cnt * wi.wi) AS BIGINT) AS z
         |  FROM fc JOIN wi_$l wi ON wi.b = fc.bucket GROUP BY 1)""".stripMargin
    (init +: rounds :+ score).mkString(",\n")
  }

  val qs: Seq[NamedQuery] = Seq(

    // Copy-on-write delete: a range takedown on a range-clustered
    // 4-file snapshot rewrites ONLY the intersecting files (≥2 of 4
    // carried by path — file-grain CoW, the claim `cow_carried` pins),
    // a pre-delete pinned reader keeps serving the old snapshot, and
    // the next sidecar ANALYZE scans only the rewritten files. Phase-1
    // pruning bounds are derived from the predicate itself (sound by
    // construction). Counts and sums over the survivors anchor the
    // oracle; the cut is the same integer quarter of max(doc_id).
    NamedQuery("q201_delete_where",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("delwhere") + "/docs"
        Manifest.create(s, table, docs
          .repartitionByRange(4, col("doc_id"))
          .sortWithinPartitions(col("doc_id")))
        Manifest.analyzeFiles(s, table, Seq("doc_id"))
        val cut = docs.agg(F.max("doc_id")).head().getLong(0) / 4
        val beforeFiles = Manifest.read(s, table).inputFiles.toSet
        val pinned = Manifest.read(s, table)
        val doomed = col("doc_id") <= cut
        Manifest.deleteWhere(s, table, doomed) // bounds derived from pred
        val afterFiles = Manifest.read(s, table).inputFiles.toSet
        val rewritten = afterFiles -- beforeFiles
        val scanned = Manifest.analyzeFiles(s, table, Seq("doc_id"))
        val pinnedN = pinned.count()
        val after = Manifest.read(s, table).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("doc_id").cast("long").as("sum_id"),
          (F.count(F.when(col("doc_id") <= cut, 1)) === 0).as("deleted_gone"))
        after.select(
          col("n_rows"), col("sum_id"), col("deleted_gone"),
          F.lit((afterFiles intersect beforeFiles).size >= 2)
            .as("cow_carried"),
          F.lit(pinnedN == Manifest.readVersion(s, table, 1L).count())
            .as("pinned_ok"),
          F.lit(scanned == rewritten.size).as("sidecar_incremental"))
      },
      Some("""SELECT
             |  CAST(count(*) FILTER (WHERE doc_id > max_id // 4) AS BIGINT)
             |    AS n_rows,
             |  CAST(sum(doc_id) FILTER (WHERE doc_id > max_id // 4) AS BIGINT)
             |    AS sum_id,
             |  true AS deleted_gone, true AS cow_carried,
             |  true AS pinned_ok, true AS sidecar_incremental
             |FROM documents, (SELECT max(doc_id) AS max_id FROM documents)
             |""".stripMargin)),

    // Row-level change feed: an append's feed is exactly the appended
    // rows, a compaction's feed is EMPTY (every file rewritten, no row
    // changed — the multiset difference cancels the churn), and a
    // delete's feed is exactly the deleted rows with zero inserts.
    // All counts/sums recomputed by the oracle from the fixture.
    NamedQuery("q202_change_feed",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("cdc") + "/docs"
        Manifest.create(s, table, docs.filter(col("doc_id") % 3 =!= 0))
        Manifest.commitAppend(s, table, docs.filter(col("doc_id") % 3 === 0))
        Manifest.compact(s, table, targetBytes = 1L << 30)
        Manifest.deleteWhere(s, table, col("doc_id") % 7 === 1)
        val app = Manifest.readChanges(s, table, 1L, 2L)
        val cmp = Manifest.readChanges(s, table, 2L, 3L)
        val del = Manifest.readChanges(s, table, 3L, 4L)
        val a = app.agg(
          F.count(F.when(col("_change_type") === "insert", 1)).as("n_insert"),
          F.sum(F.when(col("_change_type") === "insert", col("doc_id")))
            .cast("long").as("sum_insert"),
          (F.count(F.when(col("_change_type") === "delete", 1)) === 0)
            .as("append_no_deletes"))
        val c = cmp.agg((F.count(F.lit(1)) === 0).as("compact_feed_empty"))
        val dd = del.agg(
          F.count(F.when(col("_change_type") === "delete", 1)).as("n_delete"),
          F.sum(F.when(col("_change_type") === "delete", col("doc_id")))
            .cast("long").as("sum_delete"),
          (F.count(F.when(col("_change_type") === "insert", 1)) === 0)
            .as("delete_no_inserts"))
        a.crossJoin(c).crossJoin(dd).select(
          col("n_insert"), col("sum_insert"), col("append_no_deletes"),
          col("compact_feed_empty"),
          col("n_delete"), col("sum_delete"), col("delete_no_inserts"))
      },
      Some("""SELECT
             |  CAST(count(*) FILTER (WHERE doc_id % 3 = 0) AS BIGINT)
             |    AS n_insert,
             |  CAST(sum(doc_id) FILTER (WHERE doc_id % 3 = 0) AS BIGINT)
             |    AS sum_insert,
             |  true AS append_no_deletes, true AS compact_feed_empty,
             |  CAST(count(*) FILTER (WHERE doc_id % 7 = 1) AS BIGINT)
             |    AS n_delete,
             |  CAST(sum(doc_id) FILTER (WHERE doc_id % 7 = 1) AS BIGINT)
             |    AS sum_delete,
             |  true AS delete_no_inserts
             |FROM documents""".stripMargin)),

    // ADDITIVE SCHEMA EVOLUTION: a table created without n_chars gains
    // it through a mergeSchema append — pre-evolution rows serve NULL
    // for the new column (the committed schema is the read truth; no
    // footer merging), the post-compaction change feed crossing the
    // evolution is empty, and every count/sum is recomputed by the
    // oracle from the fixture.
    NamedQuery("q206_schema_evolution",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
        val table = freshQueryDir("evolve") + "/docs"
        Manifest.create(s, table, docs.filter(col("doc_id") % 3 =!= 0)
          .select(col("doc_id"), col("source")))
        Manifest.commitAppend(s, table, docs.filter(col("doc_id") % 3 === 0)
            .select(col("doc_id"), col("source"), col("n_chars")),
          mergeSchema = true)
        Manifest.compact(s, table, targetBytes = 1L << 30)
        val feedEmpty = Manifest.readChanges(s, table, 2L, 3L).isEmpty
        Manifest.read(s, table)
          .groupBy(col("source"))
          .agg(
            F.count(F.lit(1)).as("n_rows"),
            F.count(col("n_chars")).as("n_evolved"),
            F.sum(col("n_chars")).cast("long").as("sum_chars"))
          .select(col("source"), col("n_rows"), col("n_evolved"),
            col("sum_chars"), F.lit(feedEmpty).as("evolution_feed_empty"))
          .orderBy(col("source").asc_nulls_first)
      },
      Some("""SELECT source,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(*) FILTER (WHERE doc_id % 3 = 0) AS BIGINT)
             |    AS n_evolved,
             |  CAST(sum(n_chars) FILTER (WHERE doc_id % 3 = 0) AS BIGINT)
             |    AS sum_chars,
             |  true AS evolution_feed_empty
             |FROM documents GROUP BY 1
             |ORDER BY source ASC NULLS FIRST""".stripMargin)),

    // Incremental materialized-aggregate maintenance — the change
    // feed's first row-level consumer (the Gupta–Mumick counting
    // algorithm): a per-source (count, sum n_chars) aggregate taken at
    // v1 is maintained to the current snapshot purely from
    // readChanges across an append, a compaction, and a CoW delete —
    // cost ∝ changed rows, never a rescan — and must equal the direct
    // recompute row for row. The oracle recomputes the final
    // aggregate; `matches_recompute` pins the identity in-plan.
    NamedQuery("q205_incremental_agg",
      (s, d) => {
        import graft.sources.{Incremental, Manifest}
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("incragg") + "/docs"
        Manifest.create(s, table, docs.filter(col("doc_id") % 3 =!= 0))
        Manifest.commitAppend(s, table, docs.filter(col("doc_id") % 3 === 0))
        Manifest.compact(s, table, targetBytes = 1L << 30)
        Manifest.deleteWhere(s, table, col("doc_id") % 7 === 1)
        val maintained = Incremental.refreshAggregate(
          s, table, 1L, 4L, Seq("source"), Seq("n_chars"))
        val recomputed = Incremental.aggregate(
            Manifest.read(s, table), Seq("source"), Seq("n_chars"))
          .withColumnRenamed("n_rows", "__rn")
          .withColumnRenamed("sum_n_chars", "__rs")
        maintained.join(recomputed, Seq("source"), "full_outer")
          .select(col("source"), col("n_rows"),
            col("sum_n_chars").cast("long").as("sum_chars"),
            (col("n_rows") === col("__rn") &&
              col("sum_n_chars") === col("__rs")).as("matches_recompute"))
          .orderBy(col("source").asc_nulls_first)
      },
      Some("""SELECT source,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS matches_recompute
             |FROM documents WHERE doc_id % 7 <> 1
             |GROUP BY 1 ORDER BY source ASC NULLS FIRST""".stripMargin)),

    // MATERIALIZED-VIEW REFRESH as a durable job: the aggregate lives
    // as its own manifested table with a refresh watermark in its
    // commit metadata; two refreshes bracket an append + compaction +
    // CoW delete, each catching up from the change feed only, and the
    // final view must equal the oracle's direct recompute. The no-op
    // guarantee (refresh-when-current lands no new version) rides as
    // a pinned boolean.
    NamedQuery("q207_mv_refresh",
      (s, d) => {
        import graft.sources.{Incremental, Manifest}
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val base = freshQueryDir("mvrefresh")
        val (src, agg) = (s"$base/src", s"$base/agg")
        Manifest.create(s, src, docs.filter(col("doc_id") % 3 =!= 0))
        Incremental.refreshMaterialized(s, src, agg,
          Seq("source"), Seq("n_chars"))
        Manifest.commitAppend(s, src, docs.filter(col("doc_id") % 3 === 0))
        Manifest.compact(s, src, targetBytes = 1L << 30)
        Manifest.deleteWhere(s, src, col("doc_id") % 7 === 1)
        Incremental.refreshMaterialized(s, src, agg,
          Seq("source"), Seq("n_chars"))
        val vBefore = Manifest.versions(s, agg)
        Incremental.refreshMaterialized(s, src, agg,
          Seq("source"), Seq("n_chars")) // current ⇒ must be a no-op
        val noop = Manifest.versions(s, agg) == vBefore
        Manifest.read(s, agg)
          .select(col("source"), col("n_rows"),
            col("sum_n_chars").cast("long").as("sum_chars"),
            F.lit(noop).as("refresh_idempotent"))
          .orderBy(col("source").asc_nulls_first)
      },
      Some("""SELECT source,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS refresh_idempotent
             |FROM documents WHERE doc_id % 7 <> 1
             |GROUP BY 1 ORDER BY source ASC NULLS FIRST""".stripMargin)),

    // TIME TRAVEL through the parsed front door: the documents cube
    // bound to a manifested table (v1 = full corpus, v2 = after a
    // copy-on-write takedown of doc_id % 7 = 3 — the modulus must not
    // align with the fixture's per-source doc_id blocks, or whole
    // sources vanish from v2 and the join drops them), queried with the
    // `asOf` option — the q196 operators (readVersion/readAsOf) now
    // reachable from a parsed query. asOf 1 counts the full corpus,
    // asOf 2 equals the current read AND the epoch-millis asOfTimestamp
    // resolution; per-source counts anchor the oracle.
    NamedQuery("q204_parsed_asof",
      (s, d) => {
        import graft.parse.QueryParser
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
        val table = freshQueryDir("asof") + "/docs"
        Manifest.create(s, table, docs)
        Manifest.deleteWhere(s, table, col("doc_id") % 7 === 3)
        val cube = graft.cubes.Cubes.documentsCube(s, d)
          .copy(fact = Manifest.read(s, table), manifestTable = Some(table))
        def run(opts: String) = QueryParser.parse(cube,
          s"""{ "cube": "documents",
             |  "args": { "options": { $opts "asc": "source" } },
             |  "fields": [
             |    {"name": "source"},
             |    {"name": "count", "alias": "n_docs"} ] }""".stripMargin)
          .query.toDF
        val t2 = Manifest.readSnapshot(s, table, 2L)
          .meta("committed_at").toLong
        val v1 = run("\"asOf\": 1,")
          .withColumnRenamed("n_docs", "n_v1")
        val v2 = run("\"asOf\": 2,").withColumnRenamed("n_docs", "n_v2")
        val byTs = run(s""""asOfTimestamp": $t2,""")
          .withColumnRenamed("n_docs", "__n_ts")
        val cur = run("").withColumnRenamed("n_docs", "__n_cur")
        v1.join(v2, "source").join(byTs, "source").join(cur, "source")
          .select(col("source"), col("n_v1"), col("n_v2"),
            (col("__n_cur") === col("n_v2")).as("current_is_v2"),
            (col("__n_ts") === col("n_v2")).as("ts_resolves_v2"))
          .orderBy(col("source").asc_nulls_first)
      },
      Some("""SELECT source,
             |  CAST(count(*) AS BIGINT) AS n_v1,
             |  CAST(count(*) FILTER (WHERE doc_id % 7 <> 3) AS BIGINT) AS n_v2,
             |  true AS current_is_v2, true AS ts_resolves_v2
             |FROM documents GROUP BY 1
             |ORDER BY source ASC NULLS FIRST""".stripMargin)),

    // TRAINED language ID: one-vs-rest logreg over hashed n-grams
    // (the fastText recipe on the engine's SQL-replayable trainer),
    // signal planted from the lang label (see langMarkers — the
    // fixture's text is label-blind). The oracle re-trains ALL FIVE
    // models round by round and replays the integer-micro-unit,
    // prior-corrected (bias-free) argmax exactly; per-language counts, accuracy vs the label, and
    // agreement with the stopword heuristic on its confident cases
    // all land as exact numbers.
    NamedQuery("q203_langid_trained",
      (s, d) => {
        import graft.llm.{LangId, TextAnalysis}
        val langs = langMarkers.map(_._1)
        val markerCol = langMarkers.foldRight(F.lit(""): org.apache.spark.sql.Column) {
          case ((l, m), els) =>
            F.when(col("lang") === l, F.lit(m + " ")).otherwise(els)
        }
        val planted = Tables.documents(s, d).withColumn("text2",
          F.concat(col("text"), F.lit(" "),
            F.call_function("repeat", markerCol,
              (col("doc_id") % 3 + 5).cast("int"))))
        val models = LangId.train(planted, col("doc_id"), col("text2"),
          col("lang"), langs, buckets = 256, iters = 10, lr = 2.0)
        val pred = LangId.predict(planted, col("doc_id"), col("text2"), models)
        pred
          .join(planted.select(col("doc_id").as("id"), col("lang"),
            TextAnalysis.langId(col("text2")).as("__h")), "id")
          .groupBy(col("lang_pred"))
          .agg(
            F.count(F.lit(1)).as("n_docs"),
            F.count(F.when(col("lang_pred") === col("lang"), 1)).as("n_correct"),
            F.count(F.when(col("__h") =!= "und", 1)).as("n_heur_confident"),
            F.count(F.when(col("__h") === col("lang_pred"), 1)).as("n_heur_agree"))
          .orderBy(col("lang_pred").asc_nulls_first)
      },
      Some {
        val langs = langMarkers.map(_._1)
        val models = langs.map(langIdModel(_, 256, 10, 2.0)).mkString(",\n")
        val scCols = langs.map(l =>
          s"coalesce(z_$l.z, 0) AS s_$l")
          .mkString(",\n    ")
        val scJoins = langs.map(l =>
          s"LEFT JOIN z_$l ON z_$l.doc_id = tt.doc_id").mkString("\n  ")
        val predCase = langs.init.map(l =>
          s"WHEN scm.s_$l = scm.m THEN '$l'").mkString("\n      ") +
          s"\n      ELSE '${langs.last}'"
        s"""WITH ${langIdCtes(256)},
           |$models,
           |sc AS MATERIALIZED (SELECT tt.doc_id,
           |    $scCols
           |  FROM tt
           |  $scJoins),
           |scm AS MATERIALIZED (SELECT *,
           |    greatest(${langs.map("s_" + _).mkString(", ")}) AS m FROM sc),
           |hcnt AS MATERIALIZED (SELECT doc_id,
           |    len(list_filter(w, x -> lower(x) IN ('the','a','and','of','to','is'))) AS c_en,
           |    len(list_filter(w, x -> lower(x) IN ('el','la','de','que','y','en'))) AS c_es,
           |    len(list_filter(w, x -> lower(x) IN ('der','die','das','und','ist'))) AS c_de,
           |    len(list_filter(w, x -> lower(x) IN ('le','les','et','une','dans'))) AS c_fr
           |  FROM t),
           |h AS MATERIALIZED (SELECT doc_id,
           |    CASE WHEN greatest(c_en, c_es, c_de, c_fr) = 0 THEN 'und'
           |      WHEN c_en = greatest(c_en, c_es, c_de, c_fr) THEN 'en'
           |      WHEN c_es = greatest(c_en, c_es, c_de, c_fr) THEN 'es'
           |      WHEN c_de = greatest(c_en, c_es, c_de, c_fr) THEN 'de'
           |      ELSE 'fr' END AS h
           |  FROM hcnt),
           |p AS (SELECT d.doc_id, d.lang, coalesce(h.h, 'und') AS h,
           |    CASE WHEN scm.doc_id IS NULL THEN '${langs.head}'
           |      $predCase END AS pred
           |  FROM d
           |  LEFT JOIN scm ON scm.doc_id = d.doc_id
           |  LEFT JOIN h ON h.doc_id = d.doc_id)
           |SELECT pred AS lang_pred,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(count(*) FILTER (WHERE pred = lang) AS BIGINT) AS n_correct,
           |  CAST(count(*) FILTER (WHERE h <> 'und') AS BIGINT)
           |    AS n_heur_confident,
           |  CAST(count(*) FILTER (WHERE h = pred) AS BIGINT) AS n_heur_agree
           |FROM p GROUP BY 1
           |ORDER BY lang_pred ASC NULLS FIRST""".stripMargin
      }))
}
