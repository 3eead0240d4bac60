package graft.queries

import graft.cubes.Tables
import org.apache.spark.sql.{functions => F}

/** Round-18 additions: the catalog's native DSv2 batch scan and the
  * SQL faces it unlocks — `DELETE FROM` bridged to the MoR takedown,
  * runtime (DPP-style) file skipping in plain SQL joins, and
  * CBO statistics served from the manifest. Verified the q201 way:
  * the machinery runs for real against a scratch table built from the
  * fixture, every decidable claim rides the output as a pinned
  * boolean, and the exact counts/sums are recomputed independently by
  * the DuckDB oracle from the fixture.
  */
object Round18Queries {
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

    // SQL DELETE FROM: the takedown a 100 TB user actually types.
    // One `DELETE FROM graft_x.db.docs WHERE …` lands EXACTLY ONE
    // merge-on-read commit (version chain 1→2, verb-stamped
    // 'delete', zero data files rewritten — all pinned), the next SQL
    // read serves the survivors, and `VERSION AS OF 1` still serves
    // the pre-delete corpus (the audit trail vacuum will later
    // reclaim). The survivor aggregate AND the pre-delete aggregate
    // are both recomputed by the oracle from the fixture.
    NamedQuery("q238_sql_delete",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("sqldel")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs
          .repartitionByRange(8, col("doc_id"))
          .sortWithinPartitions(col("doc_id")))
        Manifest.analyzeFiles(s, table, Seq("doc_id"))
        s.conf.set("spark.sql.catalog.graft_q238",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q238.root", root)
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        s.sql(
          s"""DELETE FROM graft_q238.db.docs
             |WHERE doc_id BETWEEN ${maxId / 4} AND ${maxId / 4 + 50}
             |   OR doc_id IN (3, ${maxId - 2})""".stripMargin)
        val oneMoRCommit = Manifest.versions(s, table) == Seq(1L, 2L) &&
          Manifest.currentSnapshot(s, table).get.paths ==
            Manifest.readSnapshot(s, table, 1L).paths &&
          Manifest.currentSnapshot(s, table).get
            .meta.get("operation").contains("delete")
        val after = s.sql(
          """SELECT count(*) AS n_rows,
            |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
            |FROM graft_q238.db.docs""".stripMargin).head()
        val before = s.sql(
          "SELECT count(*) FROM graft_q238.db.docs VERSION AS OF 1")
          .head().getLong(0)
        val totalDocs = docs.count()
        import s.implicits._
        Seq((after.getLong(0), after.getLong(1), oneMoRCommit,
          before == totalDocs))
          .toDF("n_rows", "sum_chars", "one_mor_commit", "time_travel_intact")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS one_mor_commit, true AS time_travel_intact
             |FROM documents
             |WHERE NOT (doc_id BETWEEN (SELECT max(doc_id) // 4 FROM documents)
             |             AND (SELECT max(doc_id) // 4 + 50 FROM documents)
             |        OR doc_id IN (3, (SELECT max(doc_id) - 2 FROM documents)))"""
        .stripMargin)),

    // Runtime (DPP-style) file skipping in PLAIN SQL: a star join
    // whose fact side has NO static predicate — every file admitted
    // at planning — and whose dim side selects two suppliers. The
    // runtime IN filter derived from the dim broadcast re-admits the
    // fact's files through the envelope sidecar AFTER planning,
    // pinned as a strict subset of the range-clustered snapshot. At
    // 100 TB this is "scan the day the dimension names, not the
    // table", with no CubeQuery in sight. The join aggregate is
    // recomputed by the oracle.
    NamedQuery("q239_sql_runtime_skip",
      (s, d) => {
        import graft.sources.Manifest
        import graft.sources.v2.GraftScanInfo
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("sqldpp")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs
          .repartitionByRange(8, col("doc_id"))
          .sortWithinPartitions(col("doc_id")))
        Manifest.analyzeFiles(s, table, Seq("doc_id"))
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        // a FILE-backed dim (a LocalRelation would constant-fold its
        // filter away and leave nothing to derive the runtime filter
        // from): keys cluster at the low end, so the runtime IN set
        // admits a prefix of the range-clustered files
        docs.filter(col("doc_id") <= maxId / 8).select(
            col("doc_id").as("k"),
            F.when(col("doc_id") % 3 === 0, "hit").otherwise("miss").as("g"))
          .coalesce(1).write.mode("overwrite").parquet(s"$root/dim")
        s.conf.set("spark.sql.catalog.graft_q239",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q239.root", root)
        s.read.parquet(s"$root/dim").createOrReplaceTempView("q239_dim")
        val nAll = Manifest.read(s, table).inputFiles.length
        val agg = s.sql(
          """SELECT count(*) AS n_rows,
            |  CAST(sum(f.n_chars) AS BIGINT) AS sum_chars
            |FROM graft_q239.db.docs f JOIN q239_dim d ON f.doc_id = d.k
            |WHERE d.g = 'hit'""".stripMargin)
        val row = agg.head()
        val admitted = GraftScanInfo.lastFiles(table).getOrElse(Nil)
        val runtimePruned = admitted.nonEmpty && admitted.size < nAll
        import s.implicits._
        Seq((row.getLong(0), row.getLong(1), runtimePruned))
          .toDF("n_rows", "sum_chars", "runtime_pruned")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS runtime_pruned
             |FROM documents
             |WHERE doc_id <= (SELECT max(doc_id) // 8 FROM documents)
             |  AND doc_id % 3 = 0""".stripMargin)),

    // Manifest-served CBO statistics: the registered table reports
    // exact bytes (snapshot listing) and exact rows (envelope sidecar
    // net of the DV mask) to Spark, so a plain SQL join against an
    // un-broadcastable fact side plans the graft table as the
    // BROADCAST build — pinned from the pre-AQE physical plan — with
    // zero data files opened for the decision. The join aggregate is
    // recomputed by the oracle; the row-count pin is exact.
    NamedQuery("q240_sql_cbo_stats",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val root = freshQueryDir("sqlcbo")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs.coalesce(2))
        Manifest.analyzeFiles(s, table, Seq("doc_id", "n_chars"))
        // a MoR takedown the row-count stat must net out
        Manifest.deleteWhereMoR(s, table, col("doc_id") % 11 === 0)
        s.conf.set("spark.sql.catalog.graft_q240",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q240.root", root)
        val rel = s.sql("SELECT doc_id, n_chars FROM graft_q240.db.docs")
        val stats = rel.queryExecution.optimizedPlan.stats
        val survivors = docs.filter(col("doc_id") % 11 =!= 0).count()
        val exactRowStat = stats.rowCount.contains(BigInt(survivors))
        val exactSizeStat = stats.sizeInBytes > 0 &&
          stats.sizeInBytes < (1L << 30)
        // fact side: wide enough that IT cannot broadcast, so a
        // BroadcastHashJoin in the static plan proves the graft
        // side's reported size was believed
        s.range(0, 2000000L)
          .select((col("id") % 1000 + 1).as("doc_id"))
          .createOrReplaceTempView("q240_big")
        val j = s.sql(
          """SELECT count(*) AS n_rows,
            |  CAST(sum(g.n_chars) AS BIGINT) AS sum_chars
            |FROM q240_big b JOIN graft_q240.db.docs g
            |  ON b.doc_id = g.doc_id""".stripMargin)
        val broadcast = j.queryExecution.sparkPlan.toString
          .contains("BroadcastHashJoin")
        val row = j.head()
        import s.implicits._
        Seq((row.getLong(0), row.getLong(1),
          exactRowStat && exactSizeStat, broadcast))
          .toDF("n_rows", "sum_chars", "exact_stats", "broadcast_join")
      },
      Some("""WITH live AS (
             |  SELECT doc_id, n_chars FROM documents WHERE doc_id % 11 <> 0),
             |big AS (
             |  SELECT (i % 1000) + 1 AS doc_id FROM range(0, 2000000) t(i))
             |SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(live.n_chars) AS BIGINT) AS sum_chars,
             |  true AS exact_stats, true AS broadcast_join
             |FROM big JOIN live ON big.doc_id = live.doc_id"""
        .stripMargin)),

    // Atomic CTAS through the catalog: `CREATE TABLE … AS SELECT`
    // lands as EXACTLY ONE v1 snapshot commit (the staged table's
    // write IS Manifest.create, so a crashed CTAS leaves nothing
    // visible) — pinned via the version chain and the stamped verb —
    // and the result is immediately readable through BOTH faces: the
    // SQL aggregate and the API read must agree, both recomputed by
    // the oracle. This completes the SQL lifecycle the catalog
    // started with INSERT (q237) and DELETE (q238).
    NamedQuery("q241_sql_ctas",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val root = freshQueryDir("sqlctas")
        s.conf.set("spark.sql.catalog.graft_q241",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q241.root", root)
        docs.createOrReplaceTempView("q241_src")
        s.sql(
          """CREATE TABLE graft_q241.db.kept AS
            |SELECT doc_id, n_chars FROM q241_src
            |WHERE doc_id % 4 <> 0""".stripMargin)
        val table = s"$root/db/kept"
        val oneCommit = Manifest.versions(s, table) == Seq(1L) &&
          Manifest.currentSnapshot(s, table).get
            .meta.get("operation").contains("create")
        val sqlRow = s.sql(
          """SELECT count(*) AS n_rows,
            |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
            |FROM graft_q241.db.kept""".stripMargin).head()
        val api = Manifest.read(s, table)
          .agg(F.count(F.lit(1)), F.sum("n_chars").cast("long")).head()
        val facesAgree = sqlRow.getLong(0) == api.getLong(0) &&
          sqlRow.getLong(1) == api.getLong(1)
        import s.implicits._
        Seq((sqlRow.getLong(0), sqlRow.getLong(1), oneCommit, facesAgree))
          .toDF("n_rows", "sum_chars", "one_commit", "faces_agree")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS one_commit, true AS faces_agree
             |FROM documents WHERE doc_id % 4 <> 0""".stripMargin)),

    // Zero-copy streaming spans: the versioned table stream serves
    // the initial snapshot AND every pure-append span directly from
    // the appended parquet files — ZERO bytes staged under the
    // checkpoint (pinned by walking it) — and only a delete-carrying
    // span pays the staging round trip (pinned non-empty after a MoR
    // takedown under ignoreDeletes). At 100 TB this deletes a full
    // write-and-read-back of every streamed byte on the dominant
    // append-only path. Sink content recomputed by the oracle.
    NamedQuery("q242_stream_zero_copy",
      (s, d) => {
        import graft.sources.{Manifest, ManifestStream}
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val dir = freshQueryDir("zcstream")
        val table = s"$dir/docs"
        val out = s"$dir/out"
        val ckpt = s"$dir/ckpt"
        def stagedSpans(): Seq[String] = {
          val w = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
          try {
            import scala.jdk.CollectionConverters._
            w.iterator().asScala
              .filter(_.getFileName.toString.startsWith("span-"))
              .map(_.toString).toList
          } finally w.close()
        }
        Manifest.create(s, table, docs.filter(col("doc_id") % 3 === 0))
        val q = ManifestStream.read(s, table, ignoreDeletes = true)
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt).start()
        var zeroCopyAppends = false
        var deleteSpanStaged = false
        try {
          q.processAllAvailable()
          Manifest.commitAppend(s, table,
            docs.filter(col("doc_id") % 3 === 1))
          q.processAllAvailable()
          zeroCopyAppends = stagedSpans().isEmpty
          Manifest.deleteWhereMoR(s, table, col("doc_id") % 30 === 0)
          q.processAllAvailable()
          deleteSpanStaged = stagedSpans().nonEmpty
        } finally q.stop()
        s.read.parquet(out).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("n_chars").cast("long").as("sum_chars"))
          .select(col("n_rows"), col("sum_chars"),
            F.lit(zeroCopyAppends).as("zero_copy_appends"),
            F.lit(deleteSpanStaged).as("delete_span_staged"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS zero_copy_appends, true AS delete_span_staged
             |FROM documents WHERE doc_id % 3 <= 1""".stripMargin)),

    // SQL UPDATE: group-based copy-on-write through the row-level
    // operation framework. The pushable WHERE prunes the rewrite to
    // the envelope-admitted files — pinned: untouched files of the
    // range-clustered snapshot carry VERBATIM into v2 (file-path
    // intersection non-empty) and fewer files rewrite than exist —
    // and the whole mutation is ONE optimistic commit, verb-stamped,
    // with v1 still serving the pre-update state. Values recomputed
    // by the oracle.
    NamedQuery("q243_sql_update",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("sqlupd")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs
          .repartitionByRange(8, col("doc_id"))
          .sortWithinPartitions(col("doc_id")))
        Manifest.analyzeFiles(s, table, Seq("doc_id"))
        s.conf.set("spark.sql.catalog.graft_q243",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q243.root", root)
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        val v1Files = Manifest.read(s, table).inputFiles.toSet
        s.sql(
          s"""UPDATE graft_q243.db.docs SET n_chars = n_chars + 100000
             |WHERE doc_id BETWEEN 1 AND ${maxId / 8}""".stripMargin)
        val v2Files = Manifest.read(s, table).inputFiles.toSet
        val cowPruned = Manifest.versions(s, table) == Seq(1L, 2L) &&
          Manifest.currentSnapshot(s, table).get
            .meta.get("operation").contains("update") &&
          (v1Files intersect v2Files).nonEmpty &&
          (v1Files -- v2Files).size < v1Files.size
        val after = s.sql(
          """SELECT count(*) AS n_rows,
            |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
            |FROM graft_q243.db.docs""".stripMargin).head()
        val v1Sum = s.sql(
          "SELECT CAST(sum(n_chars) AS BIGINT) " +
            "FROM graft_q243.db.docs VERSION AS OF 1").head().getLong(0)
        import s.implicits._
        Seq((after.getLong(0), after.getLong(1), cowPruned,
          after.getLong(1) - v1Sum ==
            100000L * docs.filter(col("doc_id").between(1, maxId / 8)).count()))
          .toDF("n_rows", "sum_chars", "cow_pruned", "time_travel_delta")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) +
             |    100000 * count(*) FILTER (WHERE doc_id BETWEEN 1 AND
             |      (SELECT max(doc_id) // 8 FROM documents)) AS BIGINT)
             |    AS sum_chars,
             |  true AS cow_pruned, true AS time_travel_delta
             |FROM documents""".stripMargin)),

    // SQL MERGE INTO: the upsert a training-data pipeline types when
    // a curated refresh lands — matched docs take the source's
    // n_chars, unmatched docs insert — as ONE copy-on-write commit
    // (version chain and verb pinned). The post-merge aggregate and
    // the matched/inserted split are recomputed by the oracle.
    NamedQuery("q244_sql_merge",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("sqlmrg")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs.repartitionByRange(4, col("doc_id")))
        s.conf.set("spark.sql.catalog.graft_q244",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q244.root", root)
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        // source: every doc divisible by 5 re-scored to 7, plus two
        // brand-new doc ids
        docs.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id"), F.lit(7L).as("n_chars"))
          .unionByName(s.range(1, 3)
            .select((col("id") + maxId).as("doc_id"),
              F.lit(11L).as("n_chars")))
          .coalesce(1).write.mode("overwrite").parquet(s"$root/src")
        s.read.parquet(s"$root/src").createOrReplaceTempView("q244_src")
        s.sql(
          """MERGE INTO graft_q244.db.docs t USING q244_src s
            |ON t.doc_id = s.doc_id
            |WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars
            |WHEN NOT MATCHED THEN INSERT (doc_id, n_chars)
            |  VALUES (s.doc_id, s.n_chars)""".stripMargin)
        val oneCommit = Manifest.versions(s, table) == Seq(1L, 2L) &&
          Manifest.currentSnapshot(s, table).get
            .meta.get("operation").contains("merge")
        val after = s.sql(
          """SELECT count(*) AS n_rows,
            |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
            |FROM graft_q244.db.docs""".stripMargin).head()
        import s.implicits._
        Seq((after.getLong(0), after.getLong(1), oneCommit))
          .toDF("n_rows", "sum_chars", "one_commit")
      },
      Some("""SELECT CAST((SELECT count(*) FROM documents) + 2 AS BIGINT)
             |    AS n_rows,
             |  CAST((SELECT sum(CASE WHEN doc_id % 5 = 0 THEN 7
             |                        ELSE n_chars END) FROM documents)
             |    + 22 AS BIGINT) AS sum_chars,
             |  true AS one_commit""".stripMargin)),

    // count(*) pushdown on a TAKEDOWN-CARRYING snapshot: after a MoR
    // delete masks rows behind a vector, the bare dashboard count is
    // STILL answered with zero data files — raw sidecar rows minus
    // the masked positions, both driver metadata (pinned via the
    // scan's zero-file report + PushedAggregates in the plan). The
    // GDPR takedown doesn't break the metadata-served dashboard; a
    // sum on the same snapshot honestly declines and scans. Both
    // values recomputed by the oracle.
    NamedQuery("q245_sql_count_dv",
      (s, d) => {
        import graft.sources.Manifest
        import graft.sources.v2.GraftScanInfo
        val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("sqlcntdv")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs.coalesce(4))
        Manifest.analyzeFiles(s, table, Seq("doc_id", "n_chars"))
        Manifest.deleteWhereMoR(s, table, col("doc_id") % 13 === 0)
        s.conf.set("spark.sql.catalog.graft_q245",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q245.root", root)
        val cnt = s.sql("SELECT count(*) AS n FROM graft_q245.db.docs")
        val n = cnt.head().getLong(0)
        val countMetaOnly = GraftScanInfo.lastFiles(table).exists(_.isEmpty) &&
          cnt.queryExecution.executedPlan.toString
            .contains("PushedAggregates")
        val sum = s.sql(
          "SELECT CAST(sum(n_chars) AS BIGINT) AS sc FROM graft_q245.db.docs")
        val sc = sum.head().getLong(0)
        val sumScans = GraftScanInfo.lastFiles(table).exists(_.nonEmpty)
        import s.implicits._
        Seq((n, sc, countMetaOnly, sumScans))
          .toDF("n_rows", "sum_chars", "count_meta_only", "sum_scans")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS count_meta_only, true AS sum_scans
             |FROM documents WHERE doc_id % 13 <> 0""".stripMargin)),

    // SQL ALTER TABLE ADD COLUMN: additive schema evolution as ONE
    // metadata-only commit — zero files touched (paths pinned equal),
    // every pre-evolution row serves NULL for the new column, and the
    // very next INSERT carries it. The full shape a live pipeline
    // needs when a new quality score joins the corpus schema
    // mid-flight. Values recomputed by the oracle.
    NamedQuery("q246_sql_add_column",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("sqlalter")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs.coalesce(2))
        s.conf.set("spark.sql.catalog.graft_q246",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q246.root", root)
        s.sql("ALTER TABLE graft_q246.db.docs ADD COLUMN quality DOUBLE")
        val metadataOnly = Manifest.versions(s, table) == Seq(1L, 2L) &&
          Manifest.currentSnapshot(s, table).get.paths ==
            Manifest.readSnapshot(s, table, 1L).paths &&
          Manifest.currentSnapshot(s, table).get
            .meta.get("operation").contains("evolve")
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        s.sql(s"INSERT INTO graft_q246.db.docs VALUES " +
          s"(${maxId + 1}, 42, 0.75), (${maxId + 2}, 43, 0.25)")
        val agg = s.sql(
          """SELECT count(*) AS n_rows,
            |  count(quality) AS n_scored,
            |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
            |  CAST(sum(quality) AS DOUBLE) AS sum_quality
            |FROM graft_q246.db.docs""".stripMargin).head()
        import s.implicits._
        Seq((agg.getLong(0), agg.getLong(1), agg.getLong(2),
          agg.getDouble(3), metadataOnly))
          .toDF("n_rows", "n_scored", "sum_chars", "sum_quality",
            "metadata_only")
      },
      Some("""SELECT CAST(count(*) + 2 AS BIGINT) AS n_rows,
             |  CAST(2 AS BIGINT) AS n_scored,
             |  CAST(sum(n_chars) + 85 AS BIGINT) AS sum_chars,
             |  CAST(1.0 AS DOUBLE) AS sum_quality,
             |  true AS metadata_only
             |FROM documents""".stripMargin)),

    // The SQL maintenance loop: `CALL graft.system.advise` names
    // exactly the verbs the unhealthy states need (fragmented 20-file
    // layout + two MoR takedowns ⇒ compact + foldDeletes), the CALL
    // verbs run them (fold, compact, analyze, vacuum — each the
    // Manifest verb itself, summary rows pinned), and advise falls
    // SILENT on the maintained table. The post-maintenance aggregate
    // is recomputed by the oracle — proof the whole loop preserved
    // every surviving row. No Scala in the operate path.
    NamedQuery("q247_sql_maintenance",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("sqlmaint")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs.repartition(20))
        Manifest.deleteWhereMoR(s, table, col("doc_id") % 97 === 0)
        Manifest.deleteWhereMoR(s, table, col("doc_id") % 89 === 0)
        s.conf.set("spark.sql.catalog.graft_q247",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q247.root", root)
        def advised() = s.sql(
          "CALL graft_q247.system.advise(table => 'db/docs')")
          .select("action").collect().map(_.getString(0)).sorted
          .mkString(",")
        val flagged = advised()
        s.sql("CALL graft_q247.system.fold_deletes(table => 'db/docs')")
        val compacted = s.sql(
          "CALL graft_q247.system.compact(table => 'db/docs')").head()
        s.sql("CALL graft_q247.system.analyze(table => 'db/docs', " +
          "columns => 'doc_id,n_chars')")
        val vacuumed = s.sql(
          "CALL graft_q247.system.vacuum(table => 'db/docs', keep => 1)")
          .head()
        val silent = advised()
        val agg = s.sql(
          """SELECT count(*) AS n_rows,
            |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
            |FROM graft_q247.db.docs""".stripMargin).head()
        import s.implicits._
        Seq((flagged, silent, agg.getLong(0), agg.getLong(1),
          compacted.getInt(1) < 20 && vacuumed.getInt(1) == 1))
          .toDF("flagged", "after", "n_rows", "sum_chars", "loop_ran")
      },
      Some("""SELECT 'compact,foldDeletes' AS flagged, '' AS after,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS loop_ran
             |FROM documents
             |WHERE doc_id % 97 <> 0 AND doc_id % 89 <> 0"""
        .stripMargin))
  )
}
