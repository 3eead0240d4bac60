package graft.queries

import graft.cubes.Tables
import org.apache.spark.sql.{functions => F}

/** Round-20 additions: the multi-WRITER warehouse story — commit
  * auto-rebase (N concurrent appenders all land, no caller retry
  * loops), column mapping (RENAME/DROP COLUMN as metadata-only
  * commits), wall-clock stream resume (`startingTimestamp`),
  * hive→manifest conversion, writable branches (multi-commit WAP),
  * and the zero-data-file GROUP BY generalized to file-constant DATA
  * columns. Verified the q201 way: real machinery against a scratch
  * table built from the fixture, every decidable claim pinned as a
  * boolean riding the output, exact counts/sums recomputed
  * independently by the DuckDB oracle.
  */
object Round20Queries {
  import org.apache.spark.sql.functions.col

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

    // MULTI-WRITER append: the first thing a concurrent pipeline does
    // — N jobs land batches on ONE table at once. Each appender calls
    // commitAppend ONCE (no retry wrapper); losing the version-slot
    // race auto-rebases onto the winner's snapshot and re-commits the
    // same immutable data dir. Pinned: every appender returned (no
    // starvation), the version chain is gap-free consecutive (true
    // serialization, no lost slot), and the final table serves every
    // batch exactly once — counts and sums recomputed by the oracle
    // from the fixture.
    NamedQuery("q258_multiwriter_rebase",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("mwriter")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs.filter(col("doc_id") % 7 === 0))
        val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
        val start = new java.util.concurrent.CountDownLatch(1)
        val failures =
          new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        (1 to 6).foreach { w =>
          pool.submit(new Runnable {
            override def run(): Unit = {
              org.apache.spark.sql.SparkSession.setActiveSession(s)
              start.await()
              try Manifest.commitAppend(s, table,
                docs.filter(col("doc_id") % 7 === w).coalesce(1))
              catch { case e: Throwable => failures.add(e) }
            }
          })
        }
        start.countDown()
        pool.shutdown()
        val finished = pool.awaitTermination(
          300, java.util.concurrent.TimeUnit.SECONDS)
        val vs = Manifest.versions(s, table)
        val gapFree = vs == (1L to 7L)
        Manifest.read(s, table).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("n_chars").cast("long").as("sum_chars"),
          F.count_distinct(col("doc_id") % 7).cast("long")
            .as("n_batches")).select(
          col("n_rows"), col("sum_chars"), col("n_batches"),
          F.lit(finished && failures.isEmpty).as("all_writers_landed"),
          F.lit(gapFree).as("chain_gap_free"))
      },
      Some("""SELECT
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(count(DISTINCT doc_id % 7) AS BIGINT) AS n_batches,
             |  true AS all_writers_landed, true AS chain_gap_free
             |FROM documents""".stripMargin)),

    // COLUMN MAPPING: RENAME/DROP COLUMN as metadata-only commits —
    // the rename moves ZERO data files (pinned: identical manifest
    // entry list across the commit), reads serve the new name, time
    // travel serves each version's OWN names, a MoR delete and an
    // append keep working under the new name, and the next compact
    // FOLDS the mapping (pinned: mapping meta gone, compacted footer
    // physically carries the logical name). Counts and sums
    // recomputed by the oracle from the fixture.
    NamedQuery("q259_column_mapping",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("colmap")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs.filter(col("doc_id") % 2 === 0)) // v1
        val v1paths = Manifest.currentSnapshot(s, table).get.paths
        Manifest.renameColumn(s, table, "n_chars", "chars")            // v2
        val v2 = Manifest.currentSnapshot(s, table).get
        val zeroFilesMoved = v2.paths == v1paths
        val v1name = Manifest.readVersion(s, table, 1L)
          .columns.contains("n_chars")
        val v2name = Manifest.read(s, table).columns.contains("chars")
        // verbs under the NEW name
        Manifest.deleteWhereMoR(s, table, col("chars") % 10 === 3)     // v3
        Manifest.commitAppend(s, table,
          docs.filter(col("doc_id") % 2 === 1)
            .withColumnRenamed("n_chars", "chars"))                    // v4
        // CDC across the rename alone is EMPTY (metadata-only)
        val renameFeedEmpty = Manifest.readChanges(s, table, 1L, 2L)
          .count() == 0L
        // fold: compaction clears the mapping and files go logical
        Manifest.compact(s, table, targetBytes = 1L << 30)             // v5
        val folded = Manifest.currentSnapshot(s, table).get
        val mappingFolded = !folded.meta.contains("column_mapping")
        val footerLogical = s.read
          .parquet(Manifest.read(s, table).inputFiles.head)
          .columns.contains("chars")
        Manifest.read(s, table).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("chars").cast("long").as("sum_chars")).select(
          col("n_rows"), col("sum_chars"),
          F.lit(zeroFilesMoved).as("zero_files_moved"),
          F.lit(v1name && v2name).as("time_travel_own_names"),
          F.lit(renameFeedEmpty).as("rename_feed_empty"),
          F.lit(mappingFolded && footerLogical).as("mapping_folded"))
      },
      Some("""SELECT
             |  CAST(count(*) FILTER (WHERE doc_id % 2 = 1
             |    OR n_chars % 10 <> 3) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) FILTER (WHERE doc_id % 2 = 1
             |    OR n_chars % 10 <> 3) AS BIGINT) AS sum_chars,
             |  true AS zero_files_moved, true AS time_travel_own_names,
             |  true AS rename_feed_empty, true AS mapping_folded
             |FROM documents""".stripMargin)),

    // WALL-CLOCK stream resume + timestamp-addressed CDC: a consumer
    // who knows "I processed through instant T" resumes with
    // `startingTimestamp=T` (resolved to the first commit at or after
    // T — the exact post-instant net effect, pinned against the
    // oracle), and `table_changes(t, '<ts1>', '<ts2>')` explains a
    // wall-clock window without hand-mapping instants to versions
    // (pinned: the timestamp-addressed feed row-matches the
    // version-addressed one).
    NamedQuery("q260_stream_resume_ts",
      (s, d) => {
        import graft.sources.{Manifest, ManifestStream}
        graft.functions.GraftFunctions.register(s)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("tsresume")
        val table = s"$root/db/docs"
        val out = s"$root/out"
        Manifest.create(s, table, docs.filter(col("doc_id") % 4 === 0)) // v1
        Thread.sleep(15)
        val instant = System.currentTimeMillis()
        Thread.sleep(15)
        Manifest.commitAppend(s, table, docs.filter(col("doc_id") % 4 === 1)) // v2
        Manifest.commitAppend(s, table, docs.filter(col("doc_id") % 4 === 2)) // v3
        val q = ManifestStream.read(s, table,
            startingTimestamp = Some(instant.toString))
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", s"$root/ckpt").start()
        try {
          q.processAllAvailable()
          // the tail keeps flowing through the same stream
          Manifest.commitAppend(s, table,
            docs.filter(col("doc_id") % 4 === 3)) // v4
          q.processAllAvailable()
        } finally q.stop()
        // timestamp-addressed table_changes == version-addressed feed
        s.conf.set("spark.sql.catalog.graft_q260",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q260.root", root)
        val now = System.currentTimeMillis()
        val tsFeed = s.sql(s"SELECT * FROM table_changes(" +
          s"'graft_q260.db.docs', '$instant', '$now')")
          .collect().map(_.toString).sorted
        val vFeed = Manifest.readChanges(s, table, 1L, 4L)
          .collect().map(_.toString).sorted
        val feedParity = tsFeed.sameElements(vFeed)
        s.read.parquet(out).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("n_chars").cast("long").as("sum_chars")).select(
          col("n_rows"), col("sum_chars"),
          F.lit(feedParity).as("ts_feed_matches_version_feed"))
      },
      Some("""SELECT
             |  CAST(count(*) FILTER (WHERE doc_id % 4 >= 1) AS BIGINT)
             |    AS n_rows,
             |  CAST(sum(n_chars) FILTER (WHERE doc_id % 4 >= 1) AS BIGINT)
             |    AS sum_chars,
             |  true AS ts_feed_matches_version_feed
             |FROM documents""".stripMargin)),

    // ZERO-DATA-FILE GROUP BY on a file-constant DATA column — the
    // q256 serve generalized past hive paths: on a shard-clustered
    // (non-hive) layout the envelope sidecar proves each file's key
    // column CONSTANT (min == max, no NULLs), so `GROUP BY shard`
    // serves entirely from driver metadata — zero data files in the
    // plan (pinned via GraftScanInfo through the SQL pushdown, and
    // served_from == 'stats' on the Scala face). A table whose files
    // STRADDLE shard values must NOT serve from stats — pinned: the
    // straddling layout answers by scan (exact, just not
    // metadata-served). Counts/sums recomputed by the oracle.
    NamedQuery("q261_fileconst_group",
      (s, d) => {
        import graft.sources.Manifest
        import graft.sources.v2.GraftScanInfo
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            (col("doc_id") % 4).as("shard"))
        val root = freshQueryDir("fconst")
        val table = s"$root/db/docs"
        // shard-CLUSTERED flat layout: one append per shard value, one
        // file each — no hive directories anywhere
        Manifest.create(s, table, docs.filter(col("shard") === 0).coalesce(1))
        (1 to 3).foreach(k => Manifest.commitAppend(s, table,
          docs.filter(col("shard") === k).coalesce(1)))
        Manifest.analyzeFiles(s, table, Seq("shard", "n_chars"))
        // Scala face: served purely from the sidecar
        val g = Manifest.statsAggregateGrouped(s, table,
          Seq("shard"), Seq("n_chars"))
        val statsServed =
          g.collect().forall(_.getAs[String]("served_from") == "stats")
        // SQL face: complete aggregate pushdown, zero files opened
        s.conf.set("spark.sql.catalog.graft_q261",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q261.root", root)
        val sql = s.sql(
          """SELECT CAST(shard AS BIGINT) AS shard, n_docs, sum_chars
            |FROM (SELECT shard, count(*) AS n_docs,
            |        CAST(sum(n_chars) AS BIGINT) AS sum_chars
            |      FROM graft_q261.db.docs GROUP BY shard)"""
            .stripMargin)
        val rows = sql.collect()
        val zeroFiles = GraftScanInfo.lastFiles(table).exists(_.isEmpty)
        // the STRADDLING layout falls back to the scan — same answer,
        // no false metadata serve
        val t2 = s"$root/db/straddle"
        Manifest.create(s, t2, docs.coalesce(2)) // files span shards
        Manifest.analyzeFiles(s, t2, Seq("shard", "n_chars"))
        val g2 = Manifest.statsAggregateGrouped(s, t2,
          Seq("shard"), Seq("n_chars")).collect()
        val fellBack = g2.forall(_.getAs[String]("served_from") != "stats")
        val sameAnswer = g2.map(r => (r.getAs[Long]("shard"),
            r.getAs[Long]("cnt"))).toMap ==
          rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
        import s.implicits._
        rows.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          statsServed && zeroFiles, fellBack && sameAnswer))
          .toDF("shard", "n_docs", "sum_chars", "zero_file_serve",
            "straddle_falls_back")
          .orderBy(col("shard"))
      },
      Some("""SELECT CAST(doc_id % 4 AS BIGINT) AS shard,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS zero_file_serve, true AS straddle_falls_back
             |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin)),

    // HIVE→MANIFEST conversion: `CALL graft.system.convert` rewrites a
    // hive-partitioned table into the flat manifested layout in ONE
    // atomic commit — the partition column becomes a real data column
    // — and everything the hive layout refused unlocks on the SAME
    // table: additive schema evolution, a MoR delete-vector takedown
    // (no file rewritten — pinned), and the envelope-sidecar stats
    // serve over the old partition key. The original hive directories
    // stay on disk for pinned readers (pinned: the pre-conversion
    // version still time-travels with its hive dirs present) until
    // vacuum reclaims them (pinned: gone after). Counts/sums oracle-
    // recomputed.
    NamedQuery("q262_convert_hive",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            (col("doc_id") % 3).as("shard"))
        val root = freshQueryDir("convert")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs, partitionBy = Seq("shard")) // v1 hive
        // hive refuses evolution — the reason convert exists
        val hiveRefused = try {
          Manifest.evolveSchema(s, table,
            org.apache.spark.sql.types.StructType(
              Manifest.read(s, table).schema.fields :+
                org.apache.spark.sql.types.StructField("lang",
                  org.apache.spark.sql.types.StringType))); false
        } catch { case e: Throwable => e.getMessage.contains("hive") }
        s.conf.set("spark.sql.catalog.graft_q262",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q262.root", root)
        s.sql("CALL graft_q262.system.convert(table => 'db/docs'," +
          " sort_columns => 'shard')").collect() // v2 flat
        // the old hive dirs still serve the pre-conversion snapshot
        val v1 = Manifest.readVersion(s, table, 1L)
        val hiveDirsIntact = v1.inputFiles.nonEmpty &&
          v1.inputFiles.forall(_.contains("shard="))
        // evolution now works (v3)
        Manifest.evolveSchema(s, table,
          org.apache.spark.sql.types.StructType(
            Manifest.read(s, table).schema.fields :+
              org.apache.spark.sql.types.StructField("lang",
                org.apache.spark.sql.types.StringType)))
        // MoR takedown now works: no data file moves (v4)
        val v3paths = Manifest.currentSnapshot(s, table).get.paths
        Manifest.deleteWhereMoR(s, table, col("doc_id") % 11 === 7)
        val v4 = Manifest.currentSnapshot(s, table).get
        val morNoRewrite = v4.paths == v3paths &&
          v4.meta.contains("delete_vectors")
        // sidecar stats over the old partition key (post-fold so the
        // DV doesn't block the serve): compact folds the DV, analyze,
        // then GROUP BY shard serves from metadata
        Manifest.compact(s, table, targetBytes = 1L << 20,
          sortBy = Some(col("shard"))) // v5: ~per-shard files
        Manifest.analyzeFiles(s, table, Seq("shard", "n_chars"))
        val g = Manifest.statsAggregateGrouped(s, table,
          Seq("shard"), Seq("n_chars"))
        val statsServed = g.collect()
          .forall(_.getAs[String]("served_from") != "scan")
        // vacuum reclaims the hive dirs once retention passes
        Manifest.vacuum(s, table, keep = 1, orphanGraceMs = 0L)
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(
          s.sparkContext.hadoopConfiguration)
        val hiveGone = !fs.listStatus(
          new org.apache.hadoop.fs.Path(table)).exists(st =>
          st.isDirectory && fs.listStatus(st.getPath)
            .exists(_.getPath.getName.contains("shard=")))
        Manifest.read(s, table)
          .groupBy(col("shard")).agg(
            F.count(F.lit(1)).as("n_docs"),
            F.sum("n_chars").cast("long").as("sum_chars"))
          .select(col("shard").cast("long").as("shard"),
            col("n_docs"), col("sum_chars"),
            F.lit(hiveRefused).as("hive_refused_evolution"),
            F.lit(hiveDirsIntact).as("hive_dirs_served_pinned"),
            F.lit(morNoRewrite).as("mor_no_rewrite"),
            F.lit(statsServed).as("stats_served"),
            F.lit(hiveGone).as("hive_reclaimed_by_vacuum"))
          .orderBy(col("shard"))
      },
      Some("""SELECT CAST(doc_id % 3 AS BIGINT) AS shard,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS hive_refused_evolution,
             |  true AS hive_dirs_served_pinned,
             |  true AS mor_no_rewrite, true AS stats_served,
             |  true AS hive_reclaimed_by_vacuum
             |FROM documents WHERE doc_id % 11 <> 7
             |GROUP BY 1 ORDER BY shard""".stripMargin)),

    // WRITABLE BRANCHES (the WAP generalization): an audit flow lands
    // THREE commits on a named branch — each invisible to main
    // (pinned: main's count and version chain stand still) — then
    // `CALL graft.system.publish_branch` lands the whole branch state
    // as ONE atomic main commit (pinned: exactly one new main
    // version). A second branch racing a main append refuses the
    // fast-forward loudly (pinned) and its work stays readable. All
    // counts/sums recomputed by the oracle from the slice arithmetic.
    NamedQuery("q263_branch_wap",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("branch")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs.filter(col("doc_id") % 5 === 0)) // v1
        s.conf.set("spark.sql.catalog.graft_q263",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q263.root", root)
        s.sql("CALL graft_q263.system.branch(table => 'db/docs'," +
          " name => 'audit')").collect()
        (1 to 3).foreach(k => Manifest.branchAppend(s, table, "audit",
          docs.filter(col("doc_id") % 5 === k)))
        val mainStill = Manifest.read(s, table).count()
        val mainChain = Manifest.versions(s, table)
        val invisible = mainChain == Seq(1L)
        val branchSees = Manifest.readBranch(s, table, "audit").count()
        s.sql("CALL graft_q263.system.publish_branch(" +
          "table => 'db/docs', name => 'audit')").collect()
        val oneCommit = Manifest.versions(s, table) == Seq(1L, 2L)
        val branchGone = Manifest.branches(s, table).isEmpty
        // divergence refusal: branch, then main moves, publish refuses
        Manifest.branchCreate(s, table, "late")
        Manifest.branchAppend(s, table, "late",
          docs.filter(col("doc_id") % 5 === 4))
        Manifest.commitAppend(s, table,
          docs.filter(col("doc_id") % 5 === 4)) // main moves: v3
        val refused = try {
          Manifest.publishBranch(s, table, "late"); false
        } catch { case e: Throwable => e.getMessage.contains("fork") }
        val lateReadable = Manifest.readBranch(s, table, "late").count()
        Manifest.read(s, table).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("n_chars").cast("long").as("sum_chars")).select(
          col("n_rows"), col("sum_chars"),
          F.lit(invisible &&
            mainStill == docs.filter(col("doc_id") % 5 === 0).count())
            .as("branch_invisible_to_main"),
          F.lit(branchSees).as("n_branch_head"),
          F.lit(oneCommit && branchGone).as("publish_one_atomic_commit"),
          F.lit(refused).as("divergence_refused"),
          F.lit(lateReadable).as("n_late_branch"))
      },
      Some("""SELECT
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS branch_invisible_to_main,
             |  CAST(count(*) FILTER (WHERE doc_id % 5 <= 3) AS BIGINT)
             |    AS n_branch_head,
             |  true AS publish_one_atomic_commit,
             |  true AS divergence_refused,
             |  CAST(count(*) AS BIGINT) AS n_late_branch
             |FROM documents""".stripMargin)),

    // RENAME survives the WHOLE serving stack: a sidecar analyzed
    // BEFORE the rename keeps (a) pruning a range typed under the NEW
    // name on the NATIVE SQL scan (pinned: strict-subset file list),
    // and (b) serving the zero-data-file aggregate pushdown under the
    // new name (pinned: zero files opened). Exact counts/sums
    // recomputed by the oracle under the ORIGINAL fixture names —
    // proving the logical→physical translation changed nothing about
    // the values.
    NamedQuery("q264_rename_serving",
      (s, d) => {
        import graft.sources.Manifest
        import graft.sources.v2.GraftScanInfo
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("renserve")
        val table = s"$root/db/docs"
        // range-clustered over n_chars: 4 files with disjoint envelopes
        Manifest.create(s, table, docs
          .repartitionByRange(4, col("n_chars"))
          .sortWithinPartitions("n_chars"))
        Manifest.analyzeFiles(s, table, Seq("n_chars", "doc_id"))
        Manifest.renameColumn(s, table, "n_chars", "chars")
        s.conf.set("spark.sql.catalog.graft_q264",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q264.root", root)
        // (a) native scan + pre-rename sidecar skipping under new name
        val lo = s.sql("SELECT count(*) AS n, CAST(sum(doc_id) AS BIGINT)" +
          " AS sd FROM graft_q264.db.docs WHERE chars <= 150").head()
        val skipped = GraftScanInfo.lastFiles(table)
          .exists(fl => fl.nonEmpty && fl.size < 4)
        // (b) zero-file aggregate pushdown under the new name
        val agg = s.sql("SELECT count(*) AS n, CAST(sum(chars) AS BIGINT)" +
          " AS sc FROM graft_q264.db.docs").head()
        val zeroFiles = GraftScanInfo.lastFiles(table).exists(_.isEmpty)
        import s.implicits._
        Seq((lo.getLong(0), lo.getLong(1), agg.getLong(0), agg.getLong(1),
          skipped, zeroFiles))
          .toDF("n_low", "sum_id_low", "n_all", "sum_chars",
            "sidecar_skips_after_rename", "zero_file_agg_after_rename")
      },
      Some("""SELECT
             |  CAST(count(*) FILTER (WHERE n_chars <= 150) AS BIGINT)
             |    AS n_low,
             |  CAST(sum(doc_id) FILTER (WHERE n_chars <= 150) AS BIGINT)
             |    AS sum_id_low,
             |  CAST(count(*) AS BIGINT) AS n_all,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS sidecar_skips_after_rename,
             |  true AS zero_file_agg_after_rename
             |FROM documents""".stripMargin))
  )
}
