package graft.queries

import graft.cubes.Tables
import org.apache.spark.sql.{functions => F}

/** Round-17 additions: OR/IN-shaped file skipping (predicate-TREE
  * admission — `Manifest.admittedFilesFor`), the DataSourceV2 catalog
  * front door, and grouped metadata serving. Verified the q201 way:
  * the machinery runs for real against a scratch table built from the
  * fixture, every decidable claim rides the output as a pinned
  * boolean, and the exact counts/sums are recomputed independently by
  * the DuckDB oracle from the fixture.
  */
object Round17Queries {
  import org.apache.spark.sql.functions.col

  /** Scratch dir per invocation with age-reaped siblings — the
    * Round13Queries.freshQueryDir discipline. */
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

  val qs: Seq[NamedQuery] = Seq(

    // OR/IN file skipping: a range-clustered 8-file snapshot with
    // BOTH envelope families analyzed; a disjunctive predicate —
    // numeric IN across far-apart points, OR'd with a middle range
    // and a string single-arm range — admits only the UNION of the
    // per-disjunct file sets, decided at the driver before any footer
    // opens. The conjunctive walkers dropped every OR subtree (this
    // exact probe pruned nothing until round 17). Pins: the admitted
    // set is a STRICT subset of the snapshot's files, and a
    // fully-out-of-range IN admits ZERO files while still serving a
    // well-formed empty frame. The aggregate itself is recomputed by
    // the oracle from the fixture (literals derive from max(doc_id)
    // so the probe scales with the fixture).
    NamedQuery("q229_orin_skipping",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
          .withColumn("sid",
            F.lpad(col("doc_id").cast("string"), 8, "0"))
        val table = freshQueryDir("orin") + "/docs"
        Manifest.create(s, table, docs
          .repartitionByRange(8, col("doc_id"))
          .sortWithinPartitions(col("doc_id")))
        Manifest.analyzeFiles(s, table, Seq("doc_id"))
        Manifest.analyzeFilesString(s, table, Seq("sid"))
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        val mid = maxId / 2
        val nAll = Manifest.read(s, table).inputFiles.length
        val pred = col("doc_id").isin(7L, maxId - 5) ||
          col("doc_id").between(mid, mid + 20) ||
          col("sid") >= F.lit("%08d".format(maxId - 3))
        val prunedOpt = Manifest.readPrunedWhereOpt(s, table, pred)
        val pruned = prunedOpt.getOrElse(Manifest.read(s, table))
        val strictSubset = prunedOpt.nonEmpty &&
          pruned.inputFiles.length < nAll
        val emptyAdmit = Manifest
          .readPrunedWhereOpt(s, table, col("doc_id").isin(-5L, -9L))
          .exists(df => df.inputFiles.isEmpty && df.count() == 0)
        pruned.filter(pred)
          .agg(F.count(F.lit(1)).as("n_rows"),
            F.sum("n_chars").cast("long").as("sum_chars"))
          .select(col("n_rows"), col("sum_chars"),
            F.lit(strictSubset).as("pruned_files"),
            F.lit(emptyAdmit).as("empty_admit"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS pruned_files, true AS empty_admit
             |FROM documents
             |WHERE doc_id IN (7, (SELECT max(doc_id) - 5 FROM documents))
             |   OR doc_id BETWEEN (SELECT max(doc_id) // 2 FROM documents)
             |        AND (SELECT max(doc_id) // 2 + 20 FROM documents)
             |   OR lpad(CAST(doc_id AS VARCHAR), 8, '0') >=
             |        lpad(CAST((SELECT max(doc_id) - 3 FROM documents)
             |          AS VARCHAR), 8, '0')""".stripMargin)),

    // The DataSourceV2 SQL front door: the manifested table registers
    // under a TableCatalog and the probe runs as PLAIN spark.sql over
    // `graft_q230.db.docs` — no CubeQuery, no Manifest read call in
    // the query itself. What must ride along: (a) MoR delete vectors
    // mask the even doc_ids the takedown removed; (b) the WHERE's IN
    // probe prunes FILES at the driver (strict-subset pin via the
    // scan's admitted-files report); (c) the aggregate hash-matches
    // the oracle, which recomputes the post-delete state from the
    // fixture. The catalog name is fixed and its root conf re-reads
    // dynamically, so repeated invocations re-point cleanly.
    NamedQuery("q230_sql_catalog",
      (s, d) => {
        import graft.sources.Manifest
        import graft.sources.v2.GraftScanInfo
        val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("sqlcat")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs
          .repartitionByRange(8, col("doc_id"))
          .sortWithinPartitions(col("doc_id")))
        // MoR takedown: every doc_id divisible by 7 vanishes behind a
        // delete vector — no data file rewritten
        Manifest.deleteWhereMoR(s, table, col("doc_id") % 7 === 0)
        Manifest.analyzeFiles(s, table, Seq("doc_id"))
        s.conf.set("spark.sql.catalog.graft_q230",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q230.root", root)
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        val nAll = Manifest.read(s, table).inputFiles.length
        val agg = s.sql(
          s"""SELECT count(*) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM graft_q230.db.docs
             |WHERE doc_id IN (3, 7, ${maxId - 4}, ${maxId - 6})
             |   OR doc_id BETWEEN ${maxId / 2} AND ${maxId / 2 + 30}
             |""".stripMargin)
        val row = agg.head()
        val admitted = GraftScanInfo.lastFiles(table).getOrElse(Nil)
        val pruned = admitted.nonEmpty && admitted.size < nAll
        import s.implicits._
        Seq((row.getLong(0), row.getLong(1), pruned))
          .toDF("n_rows", "sum_chars", "pruned_files")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS pruned_files
             |FROM documents
             |WHERE doc_id % 7 <> 0
             |  AND (doc_id IN (3, 7, (SELECT max(doc_id) - 4 FROM documents),
             |         (SELECT max(doc_id) - 6 FROM documents))
             |   OR doc_id BETWEEN (SELECT max(doc_id) // 2 FROM documents)
             |        AND (SELECT max(doc_id) // 2 + 30 FROM documents))"""
        .stripMargin)),

    // GROUPED metadata serving through the cube front door: a
    // hive-partitioned-by-source snapshot (the canonical file-constant
    // key) with both sidecar families analyzed; `slice(source) +
    // count/sum + statsOnly` folds entirely at the driver — the
    // compiled plan is a LocalRelation with ZERO data files (pinned
    // as `meta_only`), one row per source. The 100 TB shape this
    // buys: "rows per day this quarter" on a day-partitioned table
    // becomes a sidecar read. The oracle recomputes every group from
    // the fixture.
    NamedQuery("q231_grouped_statsonly",
      (s, d) => {
        import graft.sources.Manifest
        import graft.model.{Cube, Dimension, Metric}
        import graft.query.CubeQuery
        import graft.compile.Compiler
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("gstats") + "/docs"
        Manifest.create(s, table, docs, partitionBy = Seq("source"))
        Manifest.analyzeFiles(s, table, Seq("n_chars"))
        Manifest.analyzeFilesString(s, table, Seq("source"))
        val cube = Cube("docs", Manifest.read(s, table),
          dimensions = Map("source" -> Dimension("source", col("source"))),
          metrics = Map(
            "n" -> Metric.countAll("n"),
            "sc" -> Metric.sumOf("sc", col("n_chars"))),
          selectors = Map.empty,
          manifestTable = Some(table))
        val served = Compiler.compile(CubeQuery(cube)
          .slice("source", "source")
          .measure("n_rows", "n").measure("sum_chars", "sc")
          .statsOnly.asc("source"))
        served.select(col("source"), col("n_rows"),
          col("sum_chars").cast("long").as("sum_chars"),
          F.lit(served.inputFiles.isEmpty).as("meta_only"))
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars, true AS meta_only
             |FROM documents GROUP BY source ORDER BY source ASC"""
        .stripMargin)),

    // Composite-key bloom restriction: a round-robin 8-file layout
    // (every file spans the whole id range — envelopes provably
    // impotent) with a (source, doc_id) COMPOSITE bloom sidecar
    // (xxhash64 over the key tuple). A two-tuple multi-column
    // takedown (deleteKeysTuples) then restricts its phase-1 scan to
    // the tuples' candidate files, pinned via the readPointTuples
    // strict-subset; the post-takedown aggregate is recomputed by the
    // oracle. The right-to-be-forgotten shape when the key is
    // (user, day), not a single id.
    NamedQuery("q232_composite_takedown",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("comptake") + "/docs"
        Manifest.create(s, table, docs.repartition(8))
        Manifest.analyzeFilesBloom(s, table,
          Seq(Manifest.compositeName(Seq("source", "doc_id"))),
          expectedItemsPerFile = 100000)
        // two real (source, doc_id) tuples from the fixture
        val keys = docs.orderBy(col("doc_id"))
          .limit(2).collect()
          .map(r => Seq[Any](r.getString(1), r.getLong(0))).toSeq
        val nAll = Manifest.read(s, table).inputFiles.length
        val pt = Manifest.readPointTuples(s, table,
          Seq("source", "doc_id"), keys)
        val pruned = pt.inputFiles.length < nAll
        Manifest.deleteKeysTuples(s, table, Seq("source", "doc_id"), keys)
        Manifest.read(s, table)
          .agg(F.count(F.lit(1)).as("n_rows"),
            F.sum("n_chars").cast("long").as("sum_chars"))
          .select(col("n_rows"), col("sum_chars"),
            F.lit(pruned).as("pruned_files"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS pruned_files
             |FROM documents
             |WHERE doc_id NOT IN (
             |  SELECT doc_id FROM documents ORDER BY doc_id LIMIT 2)"""
        .stripMargin)),

    // INTER-frame video codec: the documents render as keyframe +
    // delta-frame containers (previous-frame XOR, run-length encoded —
    // the temporal-redundancy trade of the H.264 class), and the
    // pipeline decodes the dependency CHAIN sequentially, sampling
    // every 2nd frame into the same frame-features shape as q134's
    // seekable MPNG path. The oracle recomputes every frame's
    // brightness analytically from the text bytes — identical to
    // q134's oracle, so a hash match proves the XOR+RLE chain
    // reconstructs each frame bit-exactly through however many deltas
    // precede it.
    NamedQuery("q233_video_delta_frames",
      (s, d) => graft.llm.Multimodal.frameFeatures(s,
          graft.llm.Multimodal.sampleDeltaFrames(s,
            graft.llm.Multimodal.videoDeltaMediaFromDocuments(
              s, Tables.documents(s, d)), 2))
        .toDF()
        .select(col("media_id"), col("frame_idx"), col("width"),
          col("height"), col("brightness"))
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

    // SQL aggregate pushdown: a plain `SELECT source, count(*),
    // sum(n_chars) … GROUP BY source` over the registered catalog is
    // answered ENTIRELY from the envelope sidecars — the physical plan
    // carries PushedAggregates and the scan reports ZERO files opened
    // (pinned as meta_only). The external-tool dashboard query at
    // 100 TB: no CubeQuery, no statsOnly option, just SQL, and the
    // table is never read. Values recomputed by the oracle.
    NamedQuery("q234_sql_agg_pushdown",
      (s, d) => {
        import graft.sources.Manifest
        import graft.sources.v2.GraftScanInfo
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val root = freshQueryDir("sqlagg")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs, partitionBy = Seq("source"))
        Manifest.analyzeFiles(s, table, Seq("n_chars"))
        Manifest.analyzeFilesString(s, table, Seq("source"))
        s.conf.set("spark.sql.catalog.graft_q234",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q234.root", root)
        val agg = s.sql(
          """SELECT source, count(*) AS n_rows,
            |  sum(n_chars) AS sum_chars
            |FROM graft_q234.db.docs GROUP BY source ORDER BY source"""
            .stripMargin)
        val rows = agg.collect()
        val metaOnly = GraftScanInfo.lastFiles(table).exists(_.isEmpty) &&
          agg.queryExecution.executedPlan.toString
            .contains("PushedAggregates")
        import s.implicits._
        rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2), metaOnly))
          .toSeq.toDF("source", "n_rows", "sum_chars", "meta_only")
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars, true AS meta_only
             |FROM documents GROUP BY source ORDER BY source ASC"""
        .stripMargin)),

    // The release-audit composition: tag version 1 as a named release,
    // keep committing, then answer "how big was corpus-v1" with PLAIN
    // SQL — `VERSION AS OF 'corpus-v1'` resolves the tag, the pinned
    // snapshot serves its aggregate from its RETAINED sidecar (zero
    // data files, pinned as meta_only), and the current snapshot's
    // count confirms the table moved on underneath. Years-later
    // reproducibility as one SQL line.
    NamedQuery("q235_sql_release_audit",
      (s, d) => {
        import graft.sources.Manifest
        import graft.sources.v2.GraftScanInfo
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val root = freshQueryDir("sqlrel")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs.coalesce(4))
        Manifest.analyzeFiles(s, table, Seq("n_chars"))
        Manifest.tag(s, table, "corpus-v1", 1L)
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        Manifest.commitAppend(s, table, docs.limit(100)
          .select((col("doc_id") + maxId + 1).as("doc_id"),
            col("source"), col("n_chars")).coalesce(1))
        s.conf.set("spark.sql.catalog.graft_q235",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q235.root", root)
        val rel = s.sql(
          """SELECT count(*) AS n_docs, sum(n_chars) AS sum_chars
            |FROM graft_q235.db.docs VERSION AS OF 'corpus-v1'"""
            .stripMargin).head()
        val metaOnly = GraftScanInfo.lastFiles(table).exists(_.isEmpty)
        val cur = s.sql(
          "SELECT count(*) FROM graft_q235.db.docs").head().getLong(0)
        import s.implicits._
        Seq((rel.getLong(0), rel.getLong(1), metaOnly,
          cur == rel.getLong(0) + 100))
          .toDF("n_docs", "sum_chars", "meta_only", "moved_on")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS meta_only, true AS moved_on
             |FROM documents""".stripMargin)),

    // Maintenance advisor: drive a table through four unhealthy states
    // — fragmented (20 tiny files), DV pileup (two MoR takedowns),
    // stale sidecar (appends past the last ANALYZE), version pileup —
    // and assert the advisor names EXACTLY the verbs each state needs,
    // then falls silent after compaction folds/compacts/reanalyzes/
    // vacuums. The per-state action sets are deterministic, so the
    // oracle is literal; the row count recomputes from the fixture to
    // anchor the scratch table's content.
    NamedQuery("q236_maintenance_advisor",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
        val table = freshQueryDir("advisor") + "/docs"
        Manifest.create(s, table, docs.repartition(20))
        def actions() = Manifest.adviseMaintenance(s, table)
          .select("action").collect().map(_.getString(0)).sorted
          .mkString(",")
        val fragged = actions()
        Manifest.compact(s, table, targetBytes = 1L << 30)
        val afterCompact = actions()
        Manifest.deleteWhereMoR(s, table, col("doc_id") % 97 === 0)
        Manifest.deleteWhereMoR(s, table, col("doc_id") % 89 === 0)
        val dvPiled = actions()
        Manifest.foldDeletes(s, table)
        val afterFold = actions()
        val nRows = Manifest.read(s, table).count()
        import s.implicits._
        Seq((fragged, afterCompact, dvPiled, afterFold, nRows))
          .toDF("fragged", "after_compact", "dv_piled", "after_fold",
            "n_rows")
      },
      Some("""SELECT 'compact' AS fragged, '' AS after_compact,
             |  'foldDeletes' AS dv_piled, '' AS after_fold,
             |  CAST(count(*) AS BIGINT) AS n_rows
             |FROM documents
             |WHERE doc_id % 97 <> 0 AND doc_id % 89 <> 0"""
        .stripMargin)),

    // SQL writes through the catalog: `INSERT INTO` lands as an
    // ordinary commitAppend (one new manifest version, history-
    // stamped), and the very next SQL read serves old + new rows
    // consistently. The full round trip — create via API, append the
    // top-100 docs via INSERT INTO … SELECT over the same catalog,
    // aggregate via SQL — recomputed by the oracle; the version pin
    // proves the write was one snapshot commit, not a blind file
    // drop.
    NamedQuery("q237_sql_insert",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("sqlins")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs.coalesce(2))
        s.conf.set("spark.sql.catalog.graft_q237",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q237.root", root)
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        s.sql(
          s"""INSERT INTO graft_q237.db.docs
             |SELECT doc_id + $maxId + 1 AS doc_id, n_chars
             |FROM graft_q237.db.docs ORDER BY doc_id LIMIT 100"""
            .stripMargin)
        val oneCommit = Manifest.versions(s, table) == Seq(1L, 2L)
        s.sql(
          """SELECT count(*) AS n_rows,
            |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
            |FROM graft_q237.db.docs""".stripMargin)
          .select(col("n_rows"), col("sum_chars"),
            F.lit(oneCommit).as("one_commit"))
      },
      Some("""WITH ins AS (
             |  SELECT n_chars FROM documents ORDER BY doc_id LIMIT 100)
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) +
             |    (SELECT count(*) FROM ins) AS n_rows,
             |  (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents) +
             |    (SELECT CAST(sum(n_chars) AS BIGINT) FROM ins) AS sum_chars,
             |  true AS one_commit""".stripMargin))
  )
}
