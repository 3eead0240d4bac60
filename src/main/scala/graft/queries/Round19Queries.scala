package graft.queries

import graft.cubes.Tables
import org.apache.spark.sql.{functions => F}

/** Round-19 additions: the SQL faces that close the operate-a-table
  * story — the row-level CDC feed as a `table_changes(…)` table
  * function, the version ledger as `CALL graft.system.history` /
  * `table_history(…)`, `DROP TABLE` as a tombstone commit with
  * vacuum-lease reclamation, and the z-order maintenance loop driven
  * entirely by `CALL graft.system.compact(sort_columns => …)`.
  * Verified the q201 way: real machinery against a scratch table
  * built from the fixture, every decidable claim pinned as a boolean
  * riding the output, exact counts/sums recomputed independently by
  * the DuckDB oracle.
  */
object Round19Queries {
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

    // SQL CDC: the row-level change feed a downstream consumer of
    // takedown deltas actually types — `table_changes('cat.db.t',
    // v1, v2)` — served by the SAME distributed readChanges plan the
    // Scala face uses (pinned: the delete window's SQL rows hash-match
    // the API's row for row). Same churn as q202: an append's feed is
    // exactly the appended rows, a compaction's feed is EMPTY, a
    // delete's feed is exactly the deleted rows. All counts/sums
    // recomputed by the oracle from the fixture.
    NamedQuery("q248_sql_table_changes",
      (s, d) => {
        import graft.sources.Manifest
        graft.functions.GraftFunctions.register(s)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val root = freshQueryDir("sqlcdc")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs.filter(col("doc_id") % 3 =!= 0))
        Manifest.commitAppend(s, table, docs.filter(col("doc_id") % 3 === 0))
        Manifest.compact(s, table, targetBytes = 1L << 30)
        Manifest.deleteWhere(s, table, col("doc_id") % 7 === 1)
        s.conf.set("spark.sql.catalog.graft_q248",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q248.root", root)
        def feed(v1: Int, v2: Int) = s.sql(
          s"SELECT * FROM table_changes('graft_q248.db.docs', $v1, $v2)")
        val a = feed(1, 2).agg(
          F.count(F.when(col("_change_type") === "insert", 1)).as("n_insert"),
          F.sum(F.when(col("_change_type") === "insert", col("doc_id")))
            .cast("long").as("sum_insert"),
          (F.count(F.when(col("_change_type") === "delete", 1)) === 0)
            .as("append_no_deletes"))
        val c = feed(2, 3).agg(
          (F.count(F.lit(1)) === 0).as("compact_feed_empty"))
        val dd = feed(3, 4).agg(
          F.count(F.when(col("_change_type") === "delete", 1)).as("n_delete"),
          F.sum(F.when(col("_change_type") === "delete", col("doc_id")))
            .cast("long").as("sum_delete"),
          (F.count(F.when(col("_change_type") === "insert", 1)) === 0)
            .as("delete_no_inserts"))
        // the SQL face and the Scala face serve the SAME feed
        val sqlRows = feed(3, 4).collect().map(_.toString).sorted
        val apiRows = Manifest.readChanges(s, table, 3L, 4L)
          .collect().map(_.toString).sorted
        val parity = sqlRows.sameElements(apiRows)
        a.crossJoin(c).crossJoin(dd).select(
          col("n_insert"), col("sum_insert"), col("append_no_deletes"),
          col("compact_feed_empty"),
          col("n_delete"), col("sum_delete"), col("delete_no_inserts"),
          F.lit(parity).as("sql_matches_api"))
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
             |  true AS delete_no_inserts, true AS sql_matches_api
             |FROM documents""".stripMargin)),

    // DESCRIBE HISTORY from SQL: the q223 seven-verb churn ledger
    // served by `CALL graft.system.history` AND the `table_history`
    // TVF — the first question an operator asks, answered without a
    // line of Scala. Pinned: both SQL faces agree row for row, the
    // ledger is metadata-only, and the surviving row count is
    // recomputed by the oracle.
    NamedQuery("q249_sql_history",
      (s, d) => {
        import graft.sources.Manifest
        graft.functions.GraftFunctions.register(s)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val root = freshQueryDir("sqlhist")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs)                               // v1
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        Manifest.commitAppend(s, table,
          docs.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + maxId + 1L).as("doc_id"),
              col("source"), col("n_chars")))                        // v2
        Manifest.deleteWhere(s, table, col("doc_id") % 7 === 3)      // v3
        Manifest.deleteWhereMoR(s, table, col("n_chars") % 10 === 7) // v4
        Manifest.foldDeletes(s, table)                               // v5
        val bytes = Manifest.snapshotBytes(s, table,
          Manifest.currentSnapshot(s, table).get)
        Manifest.compact(s, table, targetBytes = bytes * 2)          // v6
        Manifest.restore(s, table, 5L)                               // v7
        s.conf.set("spark.sql.catalog.graft_q249",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q249.root", root)
        val viaCall = s.sql(
          "CALL graft_q249.system.history(table => 'db/docs')")
        val viaTvf = s.sql(
          "SELECT * FROM table_history('graft_q249.db.docs')")
        val agree =
          viaCall.columns.sameElements(viaTvf.columns) &&
            viaCall.collect().map(_.toString).sorted.sameElements(
              viaTvf.collect().map(_.toString).sorted)
        val metadataOnly = viaTvf.inputFiles.isEmpty
        val finalRows = s.sql(
          "SELECT count(*) FROM graft_q249.db.docs").head().getLong(0)
        viaCall.select(col("version"), col("operation"),
            F.lit(agree).as("faces_agree"),
            F.lit(metadataOnly).as("metadata_only"),
            F.lit(finalRows).as("final_rows"))
          .orderBy(col("version").asc)
      },
      Some("""WITH m AS (SELECT max(doc_id) AS mx FROM documents),
             |v2 AS (
             |  SELECT doc_id, n_chars FROM documents
             |  UNION ALL
             |  SELECT doc_id + (SELECT mx FROM m) + 1, n_chars
             |  FROM documents WHERE doc_id % 5 = 0),
             |fin AS (SELECT count(*) AS n FROM v2
             |  WHERE doc_id % 7 <> 3
             |    AND (n_chars % 10 <> 7 OR n_chars IS NULL))
             |SELECT CAST(t.v AS BIGINT) AS version, t.op AS operation,
             |  true AS faces_agree, true AS metadata_only,
             |  CAST((SELECT n FROM fin) AS BIGINT) AS final_rows
             |FROM (VALUES (1, 'create'), (2, 'append'), (3, 'delete'),
             |  (4, 'delete'), (5, 'fold'), (6, 'compact'),
             |  (7, 'restore')) AS t(v, op)
             |ORDER BY version ASC""".stripMargin)),

    // DROP TABLE lifecycle: one tombstone commit makes the identifier
    // vanish from SHOW TABLES and every load face, a reader pinned on
    // a pre-drop snapshot still serves inside the retention window,
    // re-CREATE refuses while the tombstone awaits reclamation,
    // vacuum's lease discipline then removes the directory, and the
    // freed identifier accepts a new CREATE TABLE. The pre-drop
    // aggregate is recomputed by the oracle from the fixture.
    NamedQuery("q250_sql_drop",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("sqldrop")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs.repartition(4))
        s.conf.set("spark.sql.catalog.graft_q250",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q250.root", root)
        def shown() = s.sql("SHOW TABLES IN graft_q250.db").collect()
          .map(_.getString(1)).toSet
        val preShown = shown().contains("docs")
        val pre = s.sql(
          """SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sc
            |FROM graft_q250.db.docs""".stripMargin).head()
        s.sql("DROP TABLE graft_q250.db.docs")
        val tombstone = Manifest.versions(s, table) == Seq(1L, 2L) &&
          Manifest.currentSnapshot(s, table).get
            .meta.get("operation").contains("drop")
        val hidden = !shown().contains("docs")
        val readRefused =
          try { s.sql("SELECT * FROM graft_q250.db.docs").collect(); false }
          catch { case e: Exception =>
            e.getMessage.toUpperCase.contains("TABLE_OR_VIEW_NOT_FOUND") ||
              e.getMessage.contains("cannot be found") }
        // a pre-drop reader inside the retention window still serves
        val pinnedServes =
          Manifest.readVersion(s, table, 1L).count() == pre.getLong(0)
        val recreateRefused =
          try { s.sql(
            "CREATE TABLE graft_q250.db.docs (doc_id BIGINT)"); false }
          catch { case e: Exception =>
            e.getMessage.contains("awaiting reclamation") }
        // IF EXISTS on a missing table stays a clean no-op
        s.sql("DROP TABLE IF EXISTS graft_q250.db.ghost")
        // the retention window closes: vacuum reclaims the directory
        // and frees the identifier (grace 0 = the test's closed lease)
        Manifest.vacuum(s, table, keep = 1, retainMs = 0L,
          orphanGraceMs = 0L)
        val reclaimed = !new java.io.File(table).exists()
        s.sql("CREATE TABLE graft_q250.db.docs (doc_id BIGINT)")
        val freed = s.sql("SELECT count(*) FROM graft_q250.db.docs")
          .head().getLong(0) == 0L && shown().contains("docs")
        import s.implicits._
        Seq((pre.getLong(0), pre.getLong(1), preShown && hidden,
          tombstone, readRefused, pinnedServes, recreateRefused,
          reclaimed && freed))
          .toDF("n_rows_predrop", "sum_chars_predrop", "show_flips",
            "one_tombstone_commit", "read_refused", "pinned_serves",
            "recreate_refused", "vacuum_frees_identifier")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows_predrop,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars_predrop,
             |  true AS show_flips, true AS one_tombstone_commit,
             |  true AS read_refused, true AS pinned_serves,
             |  true AS recreate_refused, true AS vacuum_frees_identifier
             |FROM documents""".stripMargin)),

    // Z-ORDER FROM SQL: `CALL graft.system.compact(sort_columns =>
    // 'a,b')` threads the Morton-interleaved layout through the
    // manifest compaction — pinned by construction: the rewrite is ONE
    // 'compact' commit, the written files' z-ranges are pairwise
    // DISJOINT (the range exchange the procedure declared), and a
    // (low-orderkey × low-quantity) box prunes to at most what either
    // single axis admits. The box aggregate is recomputed by the
    // oracle.
    NamedQuery("q251_sql_zorder_compact",
      (s, d) => {
        import graft.sources.{Layout, Manifest}
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_quantity").cast("long")
            .as("l_quantity"))
          // an INCOMPRESSIBLE pad (32 DISTINCT md5 blocks — a repeat()
          // of one block snappy-compresses to nothing) forces a
          // multi-file rewrite at any SF, so the pruning pins stay
          // decidable even on sf0.001's 6k rows
          .withColumn("pad", F.concat((1 to 32).map(i =>
            F.md5(F.concat_ws("-", col("l_orderkey"),
              col("l_quantity"), F.lit(i)))): _*))
        val root = freshQueryDir("sqlz")
        val table = s"$root/db/li"
        Manifest.create(s, table, li.repartition(8))
        s.conf.set("spark.sql.catalog.graft_q251",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q251.root", root)
        s.sql("CALL graft_q251.system.compact(table => 'db/li', " +
          "target_mb => 1, sort_columns => 'l_orderkey,l_quantity', " +
          "zorder_bits => 5)")
        val oneCompact = Manifest.versions(s, table) == Seq(1L, 2L) &&
          Manifest.currentSnapshot(s, table).get
            .meta.get("operation").contains("compact")
        // recompute the procedure's own key and check the written
        // files' z-ranges are pairwise disjoint (range-partitioned)
        val cur = Manifest.read(s, table)
        val b = cur.agg(
          F.min(col("l_orderkey").cast("double")),
          F.max(col("l_orderkey").cast("double")),
          F.min(col("l_quantity").cast("double")),
          F.max(col("l_quantity").cast("double"))).head()
        def hi(lo: Double, h: Double) =
          h + math.max((h - lo) * 1e-6, java.lang.Math.ulp(h))
        val z = Layout.zValue(
          Layout.axisBucket(col("l_orderkey"),
            b.getDouble(0), hi(b.getDouble(0), b.getDouble(1)), 5),
          Layout.axisBucket(col("l_quantity"),
            b.getDouble(2), hi(b.getDouble(2), b.getDouble(3)), 5), 5)
        val ranges = cur
          .select(F.input_file_name().as("f"), z.as("z"))
          .groupBy("f").agg(F.min("z").as("lo"), F.max("z").as("hi"))
          .collect().map(r => (r.getLong(1), r.getLong(2)))
          .sortBy(_._1)
        val disjoint = ranges.zip(ranges.drop(1))
          .forall { case ((_, h1), (l2, _)) => h1 <= l2 }
        // both-axis pruning on the clustered layout
        Manifest.analyzeFiles(s, table, Seq("l_orderkey", "l_quantity"))
        val all = cur.inputFiles.length
        val maxKey = Tables.lineitem(s, d)
          .agg(F.max("l_orderkey")).head().getLong(0)
        val cut = (maxKey / 4).toDouble
        val pk = Manifest.readPruned(s, table, "l_orderkey", 0, cut)
          .inputFiles.length
        val pq = Manifest.readPruned(s, table, "l_quantity", 1, 12)
          .inputFiles.length
        val conj = Manifest.readPrunedAll(s, table,
          Seq(("l_orderkey", 0, cut), ("l_quantity", 1, 12)))
        val nConj = conj.inputFiles.length
        conj.filter(col("l_orderkey") <= maxKey / 4 &&
            col("l_quantity").between(1, 12))
          .agg(F.count(F.lit(1)).as("n_rows"),
            F.sum("l_quantity").cast("long").as("sum_qty"))
          .select(col("n_rows"), col("sum_qty"),
            F.lit(oneCompact).as("one_compact_commit"),
            F.lit(all >= 2).as("multi_file_layout"),
            F.lit(disjoint).as("z_ranges_disjoint"),
            // strictness needs room: on a 2–3-file layout (sf0.001)
            // the box can legitimately touch every file; at the
            // driver gate's sf0.01 (10+ files) the subset is strict
            F.lit(nConj <= math.min(pk, pq) && (all < 4 || nConj < all))
              .as("conj_prunes_both_axes"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             |  true AS one_compact_commit, true AS multi_file_layout,
             |  true AS z_ranges_disjoint, true AS conj_prunes_both_axes
             |FROM lineitem
             |WHERE l_orderkey <= (SELECT max(l_orderkey) FROM lineitem) // 4
             |  AND l_quantity BETWEEN 1 AND 12""".stripMargin)),

    // HIVE LAYOUTS ON THE NATIVE SCAN (q239's mirror): a
    // hive-partitioned snapshot plans through the same DSv2 batch
    // scan — static partition predicates prune files at the DRIVER
    // from the paths alone (no sidecar), and a selective file-backed
    // dim joined on the PARTITION column narrows the admitted set at
    // RUNTIME (DPP-style). Both prunings pinned as strict subsets of
    // partition-matching files; both aggregates recomputed by the
    // oracle.
    NamedQuery("q252_hive_native_skip",
      (s, d) => {
        import graft.sources.Manifest
        import graft.sources.v2.GraftScanInfo
        import s.implicits._
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            (col("doc_id") % 8).as("shard"))
        val root = freshQueryDir("hivedpp")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs, partitionBy = Seq("shard"))
        s.conf.set("spark.sql.catalog.graft_q252",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q252.root", root)
        val nAll = Manifest.read(s, table).inputFiles.length
        // static: a partition predicate prunes from the path alone
        val stat = s.sql(
          """SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sc
            |FROM graft_q252.db.docs WHERE shard IN (2, 5)"""
            .stripMargin).head()
        val aStatic = GraftScanInfo.lastFiles(table).getOrElse(Nil)
        val staticPruned = aStatic.nonEmpty && aStatic.size < nAll &&
          aStatic.forall(f => f.contains("shard=2") || f.contains("shard=5"))
        // runtime: a file-backed selective dim on the partition key —
        // typed INT to match hive inference (a widening cast on the
        // join key would break runtime-filter attribution)
        (0 to 7).map(x => (x, if (x == 3) "hit" else "miss"))
          .toDF("k", "g").coalesce(1)
          .write.mode("overwrite").parquet(s"$root/dim")
        s.read.parquet(s"$root/dim").createOrReplaceTempView("q252_dim")
        val j = s.sql(
          """SELECT count(*) AS n, CAST(sum(f.n_chars) AS BIGINT) AS sc
            |FROM graft_q252.db.docs f JOIN q252_dim d ON f.shard = d.k
            |WHERE d.g = 'hit'""".stripMargin).head()
        val aRt = GraftScanInfo.lastFiles(table).getOrElse(Nil)
        val runtimePruned = aRt.nonEmpty && aRt.size < nAll &&
          aRt.forall(_.contains("shard=3"))
        Seq((stat.getLong(0), stat.getLong(1), j.getLong(0), j.getLong(1),
          staticPruned, runtimePruned))
          .toDF("n_static", "sum_static", "n_runtime", "sum_runtime",
            "static_pruned", "runtime_pruned")
      },
      Some("""SELECT
             |  CAST(count(*) FILTER (WHERE doc_id % 8 IN (2, 5)) AS BIGINT)
             |    AS n_static,
             |  CAST(sum(n_chars) FILTER (WHERE doc_id % 8 IN (2, 5))
             |    AS BIGINT) AS sum_static,
             |  CAST(count(*) FILTER (WHERE doc_id % 8 = 3) AS BIGINT)
             |    AS n_runtime,
             |  CAST(sum(n_chars) FILTER (WHERE doc_id % 8 = 3) AS BIGINT)
             |    AS sum_runtime,
             |  true AS static_pruned, true AS runtime_pruned
             |FROM documents""".stripMargin)),

    // HIVE CBO STATISTICS (q240's mirror): the native scan reports
    // exact bytes from the snapshot listing for a hive layout too, so
    // the optimizer broadcasts the small graft side of a join against
    // an un-broadcastable fact — pinned from the static physical
    // plan; the join aggregate recomputed by the oracle.
    NamedQuery("q253_hive_cbo_stats",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            (col("doc_id") % 4).as("shard"))
        val root = freshQueryDir("hivecbo")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs, partitionBy = Seq("shard"))
        s.conf.set("spark.sql.catalog.graft_q253",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q253.root", root)
        val stats = s.sql(
          "SELECT doc_id, n_chars FROM graft_q253.db.docs")
          .queryExecution.optimizedPlan.stats
        val sizeReported = stats.sizeInBytes > 0 &&
          stats.sizeInBytes < (1L << 30)
        s.range(0, 2000000L)
          .select((col("id") % 1000 + 1).as("doc_id"))
          .createOrReplaceTempView("q253_big")
        val j = s.sql(
          """SELECT count(*) AS n_rows,
            |  CAST(sum(g.n_chars) AS BIGINT) AS sum_chars
            |FROM q253_big b JOIN graft_q253.db.docs g
            |  ON b.doc_id = g.doc_id""".stripMargin)
        val broadcast = j.queryExecution.sparkPlan.toString
          .contains("BroadcastHashJoin")
        val row = j.head()
        import s.implicits._
        Seq((row.getLong(0), row.getLong(1), sizeReported, broadcast))
          .toDF("n_rows", "sum_chars", "size_reported", "broadcast_join")
      },
      Some("""WITH big AS (
             |  SELECT (i % 1000) + 1 AS doc_id FROM range(0, 2000000) t(i))
             |SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(documents.n_chars) AS BIGINT) AS sum_chars,
             |  true AS size_reported, true AS broadcast_join
             |FROM big JOIN documents ON big.doc_id = documents.doc_id"""
        .stripMargin)),

    // SQL RENAME TABLE: one atomic directory move — the new
    // identifier serves the post-takedown corpus, the FULL identity
    // transfers (version history with its verbs, a release tag, the
    // skipping sidecar — file pruning still admits a strict subset at
    // the new path), and the old identifier is gone. The aggregates
    // and the takedown arithmetic are recomputed by the oracle.
    NamedQuery("q254_sql_rename",
      (s, d) => {
        import graft.sources.Manifest
        import graft.sources.v2.GraftScanInfo
        val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("sqlren")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs
          .repartitionByRange(8, col("doc_id"))
          .sortWithinPartitions(col("doc_id")))                      // v1
        Manifest.analyzeFiles(s, table, Seq("doc_id"))
        Manifest.deleteWhereMoR(s, table, col("doc_id") % 9 === 0)   // v2
        Manifest.tag(s, table, "pre-rename")
        s.conf.set("spark.sql.catalog.graft_q254",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q254.root", root)
        s.sql(
          "ALTER TABLE graft_q254.db.docs RENAME TO graft_q254.db.corpus")
        val moved = s"$root/db/corpus"
        val agg = s.sql(
          """SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sc
            |FROM graft_q254.db.corpus""".stripMargin).head()
        val historyIntact = Manifest.versions(s, moved) == Seq(1L, 2L) &&
          Manifest.currentSnapshot(s, moved).get
            .meta.get("operation").contains("delete")
        val total = docs.count()
        val timeTravel = s.sql(
          "SELECT count(*) FROM graft_q254.db.corpus VERSION AS OF 1")
          .head().getLong(0) == total
        val tagServes = s.sql(
          "SELECT count(*) FROM graft_q254.db.corpus " +
            "VERSION AS OF 'pre-rename'").head().getLong(0) == agg.getLong(0)
        val oldGone =
          try { s.sql("SELECT * FROM graft_q254.db.docs").collect(); false }
          catch { case _: Exception => true }
        // the skipping sidecar moved with the table: a point probe at
        // the new path admits a strict subset of files
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        val nAll = Manifest.read(s, moved).inputFiles.length
        s.sql("SELECT count(*) FROM graft_q254.db.corpus " +
          s"WHERE doc_id IN (5, ${maxId - 2})").head()
        val admitted = GraftScanInfo.lastFiles(moved).getOrElse(Nil)
        val skipSurvives = admitted.nonEmpty && admitted.size < nAll
        import s.implicits._
        Seq((agg.getLong(0), agg.getLong(1), historyIntact, timeTravel,
          tagServes, oldGone, skipSurvives))
          .toDF("n_rows", "sum_chars", "history_intact", "time_travel",
            "tag_serves", "old_gone", "skip_survives")
      },
      Some("""SELECT
             |  CAST(count(*) FILTER (WHERE doc_id % 9 <> 0) AS BIGINT)
             |    AS n_rows,
             |  CAST(sum(n_chars) FILTER (WHERE doc_id % 9 <> 0) AS BIGINT)
             |    AS sum_chars,
             |  true AS history_intact, true AS time_travel,
             |  true AS tag_serves, true AS old_gone, true AS skip_survives
             |FROM documents""".stripMargin)),

    // THE RELEASE LOOP FROM SQL: adopt a plain parquet corpus into the
    // manifest, publish it as a named release (CALL tag), take down
    // rows (SQL DELETE), serve the frozen release through
    // `VERSION AS OF 'name'` while the live table serves survivors,
    // then roll back (CALL restore) — the verb ledger pinned via CALL
    // history. Every aggregate recomputed by the oracle.
    NamedQuery("q255_sql_release",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("sqlrel")
        docs.coalesce(4).write.parquet(s"$root/db/corpus")
        s.conf.set("spark.sql.catalog.graft_q255",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q255.root", root)
        s.sql("CALL graft_q255.system.adopt(table => 'db/corpus')") // v1
        s.sql("CALL graft_q255.system.tag(table => 'db/corpus', " +
          "name => 'release-1')")
        s.sql("DELETE FROM graft_q255.db.corpus WHERE doc_id % 6 = 2") // v2
        val live = s.sql(
          """SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sc
            |FROM graft_q255.db.corpus""".stripMargin).head()
        val release = s.sql(
          "SELECT count(*) FROM graft_q255.db.corpus " +
            "VERSION AS OF 'release-1'").head().getLong(0)
        s.sql("CALL graft_q255.system.restore(table => 'db/corpus', " +
          "version => 1)") // v3
        val restored = s.sql(
          "SELECT count(*) FROM graft_q255.db.corpus").head().getLong(0)
        val ops = s.sql(
          "CALL graft_q255.system.history(table => 'db/corpus')")
          .orderBy(col("version")).select("operation")
          .collect().map(_.getString(0)).mkString(",")
        import s.implicits._
        Seq((live.getLong(0), live.getLong(1), release,
          restored == release, ops))
          .toDF("n_live", "sum_live", "n_release", "restore_rolls_back",
            "ops")
      },
      Some("""SELECT
             |  CAST(count(*) FILTER (WHERE doc_id % 6 <> 2) AS BIGINT)
             |    AS n_live,
             |  CAST(sum(n_chars) FILTER (WHERE doc_id % 6 <> 2) AS BIGINT)
             |    AS sum_live,
             |  CAST(count(*) AS BIGINT) AS n_release,
             |  true AS restore_rolls_back,
             |  'adopt,delete,restore' AS ops
             |FROM documents""".stripMargin)),

    // GROUP BY A HIVE PARTITION COLUMN FROM METADATA: the dashboard
    // shape ("rows and volume per shard/day") serves with ZERO data
    // files — the partition key comes from the directory PATHS, the
    // measures from the stats sidecar, and a count(*)-only table that
    // was never analyzed serves from parquet FOOTERS. Pinned: the
    // relation's output IS the served aggregate (agg_* columns) and
    // the scan recorded zero files. Every value recomputed by the
    // oracle.
    NamedQuery("q256_hive_partition_agg",
      (s, d) => {
        import graft.sources.Manifest
        import graft.sources.v2.GraftScanInfo
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            (col("doc_id") % 5).as("shard"))
        val root = freshQueryDir("hivepagg")
        val table = s"$root/db/docs"
        Manifest.create(s, table, docs, partitionBy = Seq("shard"))
        Manifest.analyzeFiles(s, table, Seq("n_chars"))
        s.conf.set("spark.sql.catalog.graft_q256",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q256.root", root)
        // shard is inferred INT from the directory paths; the output
        // casts AFTER the pushed aggregate (the group key itself must
        // stay a bare column for the pushdown to be offered)
        val sql = s.sql(
          """SELECT CAST(shard AS BIGINT) AS shard, n_docs, sum_chars
            |FROM (SELECT shard, count(*) AS n_docs,
            |        CAST(sum(n_chars) AS BIGINT) AS sum_chars
            |      FROM graft_q256.db.docs GROUP BY shard)"""
            .stripMargin)
        val plan = sql.queryExecution.optimizedPlan.toString
        val pushed = plan.contains("agg_0") && plan.contains("RelationV2")
        val rows = sql.collect()
        val zeroFiles = GraftScanInfo.lastFiles(table).exists(_.isEmpty)
        // count(*)-only on a NEVER-analyzed hive table: footers serve
        val t2 = s"$root/db/plain"
        Manifest.create(s, t2, docs.select(col("doc_id"),
          (col("doc_id") % 2).as("half")), partitionBy = Seq("half"))
        val g2 = Manifest.statsAggregateGrouped(s, t2, Seq("half"), Nil)
        val footerServed =
          g2.collect().forall(_.getAs[String]("served_from") == "stats")
        import s.implicits._
        rows.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          pushed && zeroFiles, footerServed))
          .toDF("shard", "n_docs", "sum_chars", "zero_file_serve",
            "footer_serve")
          .orderBy(col("shard"))
      },
      Some("""SELECT CAST(doc_id % 5 AS BIGINT) AS shard,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS zero_file_serve, true AS footer_serve
             |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin)),

    // STREAM RESUME FROM A VERSION: `readStream.table(...)` with
    // `startingVersion => N` through the catalog serves exactly the
    // net effect of commits N..now — the "I have processed through
    // N-1" shape a downstream CDC/incremental consumer types — and
    // the tail keeps flowing after. Both row sets recomputed by the
    // oracle from the commit arithmetic.
    NamedQuery("q257_stream_resume",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
        val root = freshQueryDir("sresume")
        val table = s"$root/db/docs"
        val out = s"$root/out"
        Manifest.create(s, table, docs.filter(col("doc_id") % 4 === 0)) // v1
        Manifest.commitAppend(s, table, docs.filter(col("doc_id") % 4 === 1)) // v2
        Manifest.commitAppend(s, table, docs.filter(col("doc_id") % 4 === 2)) // v3
        s.conf.set("spark.sql.catalog.graft_q257",
          "graft.sources.v2.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_q257.root", root)
        val q = s.readStream.option("startingVersion", "3")
          .table("graft_q257.db.docs")
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", s"$root/ckpt").start()
        val firstSpan = try {
          q.processAllAvailable()
          val n = s.read.parquet(out).count()
          // the tail: one more commit flows through the SAME stream
          Manifest.commitAppend(s, table,
            docs.filter(col("doc_id") % 4 === 3)) // v4
          q.processAllAvailable()
          n
        } finally q.stop()
        s.read.parquet(out).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("n_chars").cast("long").as("sum_chars"))
          .select(col("n_rows"), col("sum_chars"),
            F.lit(firstSpan).as("n_first_span"))
      },
      Some("""SELECT
             |  CAST(count(*) FILTER (WHERE doc_id % 4 >= 2) AS BIGINT)
             |    AS n_rows,
             |  CAST(sum(n_chars) FILTER (WHERE doc_id % 4 >= 2) AS BIGINT)
             |    AS sum_chars,
             |  CAST(count(*) FILTER (WHERE doc_id % 4 = 2) AS BIGINT)
             |    AS n_first_span
             |FROM documents""".stripMargin))
  )
}
