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
             |FROM documents""".stripMargin))
  )
}
