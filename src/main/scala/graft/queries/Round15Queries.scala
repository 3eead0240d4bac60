package graft.queries

import graft.cubes.Tables
import org.apache.spark.sql.{functions => F}

/** Round-15 additions: copy-on-write MERGE (upsert) on manifested
  * tables — the remaining lakehouse CRUD verb after round 14's delete
  * and change feed. Verified the q201 way: the manifest machinery runs
  * for real against a scratch table built from the fixture, every
  * decidable claim lands in the output, and the exact counts/sums are
  * recomputed independently by the DuckDB oracle from the fixture.
  */
object Round15Queries {
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

    // Copy-on-write MERGE: updates confined to the first quarter of a
    // range-clustered 4-file snapshot rewrite ≤2 of 4 files (≥2 carry
    // by path — the `cow_carried` claim), inserts key above max(doc_id)
    // land appended, a pre-merge pinned reader keeps serving the old
    // snapshot, and the merge's change feed is exactly the upsert
    // (inserts = updated + new rows, deletes = the replaced originals).
    // Phase 1 runs bloom-restricted (analyzeFilesBloom on doc_id).
    // Final-state counts and sums are recomputed by the oracle.
    NamedQuery("q208_merge_upsert",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("merge") + "/docs"
        Manifest.create(s, table, docs
          .repartitionByRange(4, col("doc_id"))
          .sortWithinPartitions(col("doc_id")))
        Manifest.analyzeFilesBloom(s, table, Seq("doc_id"))
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        val cut = maxId / 4
        val beforeFiles = Manifest.read(s, table).inputFiles.toSet
        val pinned = Manifest.read(s, table)
        val updates = docs.filter(col("doc_id") <= cut)
          .select(col("doc_id"), F.lit("upd").as("source"),
            (col("n_chars") + 1000L).as("n_chars"))
        val inserts = docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + maxId + 1L).as("doc_id"),
            F.lit("new").as("source"), col("n_chars"))
        Manifest.merge(s, table, updates.unionByName(inserts), Seq("doc_id"))
        val afterFiles = Manifest.read(s, table).inputFiles.toSet
        val pinnedN = pinned.count()
        val ch = graft.sources.Manifest.readChanges(s, table, 1L, 2L)
        val feed = ch.agg(
          F.count(F.when(col("_change_type") === "insert", 1))
            .as("feed_inserts"),
          F.count(F.when(col("_change_type") === "delete", 1))
            .as("feed_deletes"))
        val after = Manifest.read(s, table).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("n_chars").cast("long").as("sum_chars"),
          F.count(F.when(col("source") === "upd", 1)).as("n_upd"),
          F.count(F.when(col("source") === "new", 1)).as("n_new"),
          F.sum(F.when(col("source") === "new", col("doc_id")))
            .cast("long").as("sum_new_ids"))
        after.crossJoin(feed).select(
          col("n_rows"), col("sum_chars"), col("n_upd"), col("n_new"),
          col("sum_new_ids"), col("feed_inserts"), col("feed_deletes"),
          F.lit((afterFiles intersect beforeFiles).size >= 2)
            .as("cow_carried"),
          F.lit(pinnedN == Manifest.readVersion(s, table, 1L).count())
            .as("pinned_ok"))
      },
      Some("""WITH m AS (SELECT max(doc_id) AS max_id FROM documents),
             |upd AS (SELECT doc_id, n_chars + 1000 AS n_chars
             |  FROM documents, m WHERE doc_id <= max_id // 4),
             |ins AS (SELECT doc_id + max_id + 1 AS doc_id, n_chars
             |  FROM documents, m WHERE doc_id % 7 = 0),
             |kept AS (SELECT doc_id, n_chars FROM documents, m
             |  WHERE doc_id > max_id // 4),
             |fin AS (
             |  SELECT doc_id, n_chars, 'upd' AS src FROM upd
             |  UNION ALL SELECT doc_id, n_chars, 'new' FROM ins
             |  UNION ALL SELECT doc_id, n_chars, 'kept' FROM kept)
             |SELECT
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(count(*) FILTER (WHERE src = 'upd') AS BIGINT) AS n_upd,
             |  CAST(count(*) FILTER (WHERE src = 'new') AS BIGINT) AS n_new,
             |  CAST(sum(doc_id) FILTER (WHERE src = 'new') AS BIGINT)
             |    AS sum_new_ids,
             |  CAST((SELECT count(*) FROM upd) + (SELECT count(*) FROM ins)
             |    AS BIGINT) AS feed_inserts,
             |  CAST((SELECT count(*) FROM upd) AS BIGINT) AS feed_deletes,
             |  true AS cow_carried, true AS pinned_ok
             |FROM fin""".stripMargin)),

    // MERGE-ON-READ delete vectors: a range takedown on a 4-file
    // snapshot moves ZERO data files (`files_still` pins the identical
    // path set), reads serve the masked survivors, the change feed of
    // the pure-mask commit is exactly the deleted rows, and folding
    // the vectors rewrites only the masked files while preserving
    // every row. All counts/sums recomputed by the oracle.
    NamedQuery("q209_delete_vectors",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("dv") + "/docs"
        Manifest.create(s, table, docs
          .repartitionByRange(4, col("doc_id"))
          .sortWithinPartitions(col("doc_id")))
        Manifest.analyzeFiles(s, table, Seq("doc_id"))
        val cut = docs.agg(F.max("doc_id")).head().getLong(0) / 4
        val v1Paths = Manifest.currentSnapshot(s, table).get.paths.toSet
        val pinned = Manifest.read(s, table)
        val s2 = Manifest.deleteWhereMoR(s, table, col("doc_id") <= cut)
        val filesStill = s2.paths.toSet == v1Paths
        val pinnedN = pinned.count()
        val ch = Manifest.readChanges(s, table, 1L, 2L)
        val feed = ch.agg(
          (F.count(F.when(col("_change_type") === "insert", 1)) === 0)
            .as("feed_no_inserts"),
          F.count(F.when(col("_change_type") === "delete", 1))
            .as("feed_deletes"),
          F.sum(F.when(col("_change_type") === "delete", col("doc_id")))
            .cast("long").as("feed_del_sum"))
        val s3 = Manifest.foldDeletes(s, table)
        val folded = Manifest.read(s, table).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("doc_id").cast("long").as("sum_id"),
          (F.count(F.when(col("doc_id") <= cut, 1)) === 0)
            .as("deleted_gone"))
        folded.crossJoin(feed).select(
          col("n_rows"), col("sum_id"), col("deleted_gone"),
          col("feed_no_inserts"), col("feed_deletes"), col("feed_del_sum"),
          F.lit(filesStill).as("files_still"),
          F.lit(pinnedN == Manifest.readVersion(s, table, 1L).count())
            .as("pinned_ok"),
          F.lit(!s3.meta.contains("delete_vectors")).as("mask_cleared"),
          F.lit(Manifest.readChanges(s, table, 2L, 3L).count() == 0)
            .as("fold_feed_empty"))
      },
      Some("""SELECT
             |  CAST(count(*) FILTER (WHERE doc_id > max_id // 4) AS BIGINT)
             |    AS n_rows,
             |  CAST(sum(doc_id) FILTER (WHERE doc_id > max_id // 4) AS BIGINT)
             |    AS sum_id,
             |  true AS deleted_gone, true AS feed_no_inserts,
             |  CAST(count(*) FILTER (WHERE doc_id <= max_id // 4) AS BIGINT)
             |    AS feed_deletes,
             |  CAST(sum(doc_id) FILTER (WHERE doc_id <= max_id // 4) AS BIGINT)
             |    AS feed_del_sum,
             |  true AS files_still, true AS pinned_ok,
             |  true AS mask_cleared, true AS fold_feed_empty
             |FROM documents, (SELECT max(doc_id) AS max_id FROM documents)
             |""".stripMargin)),

    // WRITE-AUDIT-PUBLISH: two staged batches stay invisible to every
    // reader; the audit (a source-tag gate on the staged bytes)
    // rejects one, the other publishes as ONE atomic commit adopting
    // the staged files in place (`adopted_in_place` pins it — no
    // second write), re-publish refuses. Final counts/sums recomputed
    // by the oracle from the fixture.
    NamedQuery("q210_wap_publish",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("wap") + "/docs"
        Manifest.create(s, table, docs)
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        val good = Manifest.stageAppend(s, table,
          docs.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + maxId + 1L).as("doc_id"),
              F.lit("wap").as("source"), col("n_chars")))
        val bad = Manifest.stageAppend(s, table,
          docs.filter(col("doc_id") % 5 === 1)
            .select((col("doc_id") + 2L * maxId + 2L).as("doc_id"),
              F.lit("junk").as("source"), col("n_chars")))
        val invisible = Manifest.read(s, table).count() == docs.count() &&
          Manifest.versions(s, table) == Seq(1L)
        // the audit: a staged batch carrying any junk-tagged row drops
        val verdicts = Seq(good, bad).map { id =>
          id -> (Manifest.readStage(s, table, id)
            .filter(col("source") === "junk").count() == 0)
        }
        verdicts.foreach { case (id, ok) =>
          if (ok) Manifest.publishStage(s, table, id)
          else Manifest.dropStage(s, table, id)
        }
        val adopted = Manifest.read(s, table).inputFiles
          .exists(_.contains(s"/_staged/$good/"))
        val rePublishRefused =
          try { Manifest.publishStage(s, table, good); false }
          catch { case _: IllegalArgumentException => true }
        Manifest.read(s, table).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("n_chars").cast("long").as("sum_chars"),
          F.count(F.when(col("source") === "wap", 1)).as("n_wap"),
          (F.count(F.when(col("source") === "junk", 1)) === 0)
            .as("junk_gone"))
          .select(col("n_rows"), col("sum_chars"), col("n_wap"),
            col("junk_gone"),
            F.lit(invisible).as("staged_invisible"),
            F.lit(adopted).as("adopted_in_place"),
            F.lit(rePublishRefused).as("republish_refused"))
      },
      Some("""SELECT
             |  CAST((SELECT count(*) FROM documents) +
             |    count(*) FILTER (WHERE doc_id % 5 = 0) AS BIGINT) AS n_rows,
             |  CAST((SELECT sum(n_chars) FROM documents) +
             |    sum(n_chars) FILTER (WHERE doc_id % 5 = 0) AS BIGINT)
             |    AS sum_chars,
             |  CAST(count(*) FILTER (WHERE doc_id % 5 = 0) AS BIGINT) AS n_wap,
             |  true AS junk_gone, true AS staged_invisible,
             |  true AS adopted_in_place, true AS republish_refused
             |FROM documents""".stripMargin)),

    // INCREMENTAL JOIN-VIEW MAINTENANCE (delta-join, Blakeley 1986):
    // fact table A churns (append + CoW delete), dim table B churns
    // (merge update), and the netted feed between the two version
    // pairs carries exactly the multiset difference of the join view —
    // the oracle recomputes both views in SQL and diffs them with
    // EXCEPT ALL, aggregating the same counts/sums.
    NamedQuery("q211_join_feed",
      (s, d) => {
        import graft.sources.{Incremental, Manifest}
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val dir = freshQueryDir("jfeed")
        val (ta, tb) = (s"$dir/a", s"$dir/b")
        Manifest.create(s, ta, docs.filter(col("doc_id") % 2 === 0))
        Manifest.commitAppend(s, ta, docs.filter(col("doc_id") % 2 === 1))
        Manifest.deleteWhere(s, ta, col("doc_id") % 7 === 0)  // A v3
        val dim = docs.select(col("source")).distinct()
          .select(col("source"),
            F.length(col("source")).cast("long").as("src_rank"))
        Manifest.create(s, tb, dim)
        val minSrc = dim.agg(F.min("source")).head().getString(0)
        Manifest.merge(s, tb, dim.filter(col("source") === minSrc)
          .select(col("source"), (col("src_rank") + 100L).as("src_rank")),
          Seq("source"))                                      // B v2
        val feed = Incremental.joinChanges(s, ta, tb, 1L, 3L, 1L, 2L,
          Seq("source"))
        feed.agg(
          F.count(F.when(col("_change_type") === "insert", 1))
            .as("n_insert"),
          F.count(F.when(col("_change_type") === "delete", 1))
            .as("n_delete"),
          F.sum(F.when(col("_change_type") === "insert", col("doc_id")))
            .cast("long").as("ins_id_sum"),
          F.sum(F.when(col("_change_type") === "insert", col("src_rank")))
            .cast("long").as("ins_rank_sum"),
          F.sum(F.when(col("_change_type") === "delete", col("doc_id")))
            .cast("long").as("del_id_sum"))
      },
      Some("""WITH dim AS (SELECT source, length(source) AS src_rank
             |  FROM (SELECT DISTINCT source FROM documents)),
             |mn AS (SELECT min(source) AS m FROM dim),
             |b1 AS (SELECT * FROM dim),
             |b2 AS (SELECT source,
             |    CASE WHEN source = (SELECT m FROM mn)
             |      THEN src_rank + 100 ELSE src_rank END AS src_rank
             |  FROM dim),
             |a1 AS (SELECT doc_id, source, n_chars FROM documents
             |  WHERE doc_id % 2 = 0),
             |a3 AS (SELECT doc_id, source, n_chars FROM documents
             |  WHERE doc_id % 7 <> 0),
             |v11 AS (SELECT a1.source, a1.doc_id, a1.n_chars, b1.src_rank
             |  FROM a1 JOIN b1 USING (source)),
             |v32 AS (SELECT a3.source, a3.doc_id, a3.n_chars, b2.src_rank
             |  FROM a3 JOIN b2 USING (source)),
             |ins AS (SELECT * FROM v32 EXCEPT ALL SELECT * FROM v11),
             |del AS (SELECT * FROM v11 EXCEPT ALL SELECT * FROM v32)
             |SELECT
             |  CAST((SELECT count(*) FROM ins) AS BIGINT) AS n_insert,
             |  CAST((SELECT count(*) FROM del) AS BIGINT) AS n_delete,
             |  CAST((SELECT sum(doc_id) FROM ins) AS BIGINT) AS ins_id_sum,
             |  CAST((SELECT sum(src_rank) FROM ins) AS BIGINT)
             |    AS ins_rank_sum,
             |  CAST((SELECT sum(doc_id) FROM del) AS BIGINT) AS del_id_sum
             |""".stripMargin)),

    // MERGE-ON-READ upsert: same upsert as q208 but through mergeMoR —
    // matched rows masked by ONE delta-sized vector, the source
    // appended, both in one atomic commit with every base data file
    // carried (`files_carried`); foldDeletes then repays the mask and
    // the folded table still matches the oracle's recomputed state.
    NamedQuery("q212_merge_mor",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("mmor") + "/docs"
        Manifest.create(s, table, docs
          .repartitionByRange(4, col("doc_id"))
          .sortWithinPartitions(col("doc_id")))
        Manifest.analyzeFilesBloom(s, table, Seq("doc_id"))
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        val cut = maxId / 4
        val v1Paths = Manifest.currentSnapshot(s, table).get.paths.toSet
        val updates = docs.filter(col("doc_id") <= cut)
          .select(col("doc_id"), F.lit("upd").as("source"),
            (col("n_chars") + 1000L).as("n_chars"))
        val inserts = docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + maxId + 1L).as("doc_id"),
            F.lit("new").as("source"), col("n_chars"))
        val s2 = Manifest.mergeMoR(s, table,
          updates.unionByName(inserts), Seq("doc_id"))
        val oneCommit = s2.version == 2L &&
          v1Paths.subsetOf(s2.paths.toSet) &&
          s2.paths.size == v1Paths.size + 1 &&
          s2.meta.contains("delete_vectors")
        val s3 = Manifest.foldDeletes(s, table)
        Manifest.read(s, table).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("n_chars").cast("long").as("sum_chars"),
          F.count(F.when(col("source") === "upd", 1)).as("n_upd"),
          F.count(F.when(col("source") === "new", 1)).as("n_new"))
          .select(col("n_rows"), col("sum_chars"), col("n_upd"),
            col("n_new"),
            F.lit(oneCommit).as("files_carried"),
            F.lit(!s3.meta.contains("delete_vectors")).as("mask_folded"))
      },
      Some("""WITH m AS (SELECT max(doc_id) AS max_id FROM documents),
             |fin AS (
             |  SELECT n_chars + 1000 AS n_chars, 'upd' AS src
             |    FROM documents, m WHERE doc_id <= max_id // 4
             |  UNION ALL SELECT n_chars, 'new' FROM documents
             |    WHERE doc_id % 7 = 0
             |  UNION ALL SELECT n_chars, 'kept' FROM documents, m
             |    WHERE doc_id > max_id // 4)
             |SELECT
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(count(*) FILTER (WHERE src = 'upd') AS BIGINT) AS n_upd,
             |  CAST(count(*) FILTER (WHERE src = 'new') AS BIGINT) AS n_new,
             |  true AS files_carried, true AS mask_folded
             |FROM fin""".stripMargin)),

    // DURABLE incremental join-view maintenance: materialize
    // documents ⋈ source-dim, churn both sides (append + CoW delete on
    // the fact, merge on the dim), catch up through the watermarked
    // refresh — the delta lands as ONE append + ONE vector on the view
    // (`delta_applied`), a re-run no-ops (`idempotent`), and the
    // refreshed view's aggregates equal the oracle's recomputed join.
    NamedQuery("q213_mv_join_refresh",
      (s, d) => {
        import graft.sources.{Incremental, Manifest}
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val dir = freshQueryDir("rmj")
        val (ta, tb, tv) = (s"$dir/a", s"$dir/b", s"$dir/v")
        Manifest.create(s, ta, docs.filter(col("doc_id") % 2 === 0))
        val dim = docs.select(col("source")).distinct()
          .select(col("source"),
            F.length(col("source")).cast("long").as("src_rank"))
        Manifest.create(s, tb, dim)
        Incremental.refreshMaterializedJoin(s, ta, tb, tv,
          Seq("source"), Seq("doc_id"))
        Manifest.commitAppend(s, ta, docs.filter(col("doc_id") % 2 === 1))
        Manifest.deleteWhere(s, ta, col("doc_id") % 7 === 0)
        val minSrc = dim.agg(F.min("source")).head().getString(0)
        Manifest.merge(s, tb, dim.filter(col("source") === minSrc)
          .select(col("source"), (col("src_rank") + 100L).as("src_rank")),
          Seq("source"))
        val before = Manifest.currentSnapshot(s, tv).get
        val marks = Incremental.refreshMaterializedJoin(s, ta, tb, tv,
          Seq("source"), Seq("doc_id"))
        val after = Manifest.currentSnapshot(s, tv).get
        val deltaApplied = marks == (3L, 2L) &&
          before.paths.toSet.subsetOf(after.paths.toSet) &&
          after.paths.size == before.paths.size + 1 &&
          after.meta.contains("delete_vectors")
        val again = Incremental.refreshMaterializedJoin(s, ta, tb, tv,
          Seq("source"), Seq("doc_id"))
        val idempotent = again == marks &&
          Manifest.currentSnapshot(s, tv).get.version == after.version
        Manifest.read(s, tv).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("doc_id").cast("long").as("sum_id"),
          F.sum("src_rank").cast("long").as("sum_rank"),
          F.sum("n_chars").cast("long").as("sum_chars"))
          .select(col("n_rows"), col("sum_id"), col("sum_rank"),
            col("sum_chars"),
            F.lit(deltaApplied).as("delta_applied"),
            F.lit(idempotent).as("idempotent"))
      },
      Some("""WITH dim AS (SELECT source, length(source) AS src_rank
             |  FROM (SELECT DISTINCT source FROM documents)),
             |mn AS (SELECT min(source) AS m FROM dim),
             |b2 AS (SELECT source,
             |    CASE WHEN source = (SELECT m FROM mn)
             |      THEN src_rank + 100 ELSE src_rank END AS src_rank
             |  FROM dim),
             |a3 AS (SELECT doc_id, source, n_chars FROM documents
             |  WHERE doc_id % 7 <> 0),
             |v AS (SELECT a3.doc_id, b2.src_rank, a3.n_chars
             |  FROM a3 JOIN b2 USING (source))
             |SELECT
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
             |  CAST(sum(src_rank) AS BIGINT) AS sum_rank,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS delta_applied, true AS idempotent
             |FROM v""".stripMargin)),

    // RESTORE (rollback as a forward commit): take down a third of the
    // table, append foreign rows, then restore v1 — the content comes
    // back EXACTLY (oracle = the untouched fixture), history keeps all
    // four versions inspectable, and the restore's own change feed is
    // precisely the take-down rows returning and the appended rows
    // leaving.
    NamedQuery("q214_restore",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("restore") + "/docs"
        Manifest.create(s, table, docs)
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        Manifest.deleteWhere(s, table, col("doc_id") % 3 === 0)   // v2
        Manifest.commitAppend(s, table,
          docs.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + maxId + 1L).as("doc_id"),
              F.lit("alien").as("source"), col("n_chars")))       // v3
        val s4 = Manifest.restore(s, table, 1L)
        val ch = Manifest.readChanges(s, table, 3L, 4L)
        val feed = ch.agg(
          F.count(F.when(col("_change_type") === "insert", 1))
            .as("back_rows"),
          F.sum(F.when(col("_change_type") === "insert", col("doc_id")))
            .cast("long").as("back_sum"),
          F.count(F.when(col("_change_type") === "delete", 1))
            .as("gone_rows"))
        val history = s4.version == 4L &&
          Manifest.versions(s, table) == Seq(1L, 2L, 3L, 4L) &&
          Manifest.readVersion(s, table, 2L)
            .filter(col("doc_id") % 3 === 0).count() == 0
        Manifest.read(s, table).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("doc_id").cast("long").as("sum_id"),
          F.sum("n_chars").cast("long").as("sum_chars"),
          (F.count(F.when(col("source") === "alien", 1)) === 0)
            .as("aliens_gone"))
          .crossJoin(feed)
          .select(col("n_rows"), col("sum_id"), col("sum_chars"),
            col("aliens_gone"), col("back_rows"), col("back_sum"),
            col("gone_rows"), F.lit(history).as("history_intact"))
      },
      Some("""SELECT
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS aliens_gone,
             |  CAST(count(*) FILTER (WHERE doc_id % 3 = 0) AS BIGINT)
             |    AS back_rows,
             |  CAST(sum(doc_id) FILTER (WHERE doc_id % 3 = 0) AS BIGINT)
             |    AS back_sum,
             |  CAST(count(*) FILTER (WHERE doc_id % 5 = 0) AS BIGINT)
             |    AS gone_rows,
             |  true AS history_intact
             |FROM documents""".stripMargin)),

    // EXACTLY-ONCE STREAMING UPSERT (the foreachBatch MERGE shape,
    // driven at the batch handler for determinism): batch 0 creates,
    // batch 1 upserts (updates masked + inserts appended in ONE
    // commit, every base file carried), an identical replay of batch 1
    // SKIPS (version chain unchanged), and the final table matches the
    // oracle's recomputed upsert state.
    NamedQuery("q215_stream_upsert",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("musink") + "/docs"
        graft.streaming.Streaming.upsertBatchExactlyOnce(
          table, docs, 0L, Seq("doc_id"), None)
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        val v1Paths = Manifest.currentSnapshot(s, table).get.paths.toSet
        val b1 = docs.filter(col("doc_id") % 4 === 1)
          .select(col("doc_id"), F.lit("upd").as("source"),
            (col("n_chars") + 500L).as("n_chars"))
          .unionByName(docs.filter(col("doc_id") % 9 === 0)
            .select((col("doc_id") + maxId + 1L).as("doc_id"),
              F.lit("new").as("source"), col("n_chars")))
        graft.streaming.Streaming.upsertBatchExactlyOnce(
          table, b1, 1L, Seq("doc_id"), None)
        val s2 = Manifest.currentSnapshot(s, table).get
        val oneCommit = s2.version == 2L &&
          v1Paths.subsetOf(s2.paths.toSet) &&
          s2.meta.contains("delete_vectors")
        // identical replay: the exactly-once skip
        graft.streaming.Streaming.upsertBatchExactlyOnce(
          table, b1, 1L, Seq("doc_id"), None)
        val replaySkipped =
          Manifest.currentSnapshot(s, table).get.version == 2L
        Manifest.read(s, table).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("n_chars").cast("long").as("sum_chars"),
          F.count(F.when(col("source") === "upd", 1)).as("n_upd"),
          F.count(F.when(col("source") === "new", 1)).as("n_new"))
          .select(col("n_rows"), col("sum_chars"), col("n_upd"),
            col("n_new"), F.lit(oneCommit).as("one_commit"),
            F.lit(replaySkipped).as("replay_skipped"))
      },
      Some("""WITH fin AS (
             |  SELECT n_chars + 500 AS n_chars, 'upd' AS src
             |    FROM documents WHERE doc_id % 4 = 1
             |  UNION ALL SELECT n_chars, 'new' FROM documents
             |    WHERE doc_id % 9 = 0
             |  UNION ALL SELECT n_chars, 'kept' FROM documents
             |    WHERE doc_id % 4 <> 1)
             |SELECT
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(count(*) FILTER (WHERE src = 'upd') AS BIGINT) AS n_upd,
             |  CAST(count(*) FILTER (WHERE src = 'new') AS BIGINT) AS n_new,
             |  true AS one_commit, true AS replay_skipped
             |FROM fin""".stripMargin)),

    // CHECK CONSTRAINTS: a contract the fixture satisfies lands after
    // a full-scan validation; one the fixture breaks refuses with the
    // oracle-recomputed violation count in the error; a violating
    // append refuses with NOTHING committed (version chain pinned); a
    // conforming append lands; finals recomputed by the oracle.
    NamedQuery("q216_check_constraints",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("check") + "/docs"
        Manifest.create(s, table, docs)
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        Manifest.addCheck(s, table, "chars_nonneg", "n_chars >= 0")
        // a contract the data breaks: doc_id % 2 = 0 rows violate
        val refusedMsg =
          try { Manifest.addCheck(s, table, "odd_only", "doc_id % 2 = 1"); "" }
          catch { case e: Throwable => e.getMessage }
        val evens = docs.filter(col("doc_id") % 2 === 0).count()
        val addRefused = refusedMsg.contains(s"$evens row(s)")
        val badAppendRefused =
          try {
            Manifest.commitAppend(s, table,
              docs.limit(1).select((col("doc_id") + maxId + 1L).as("doc_id"),
                col("source"), F.lit(-5L).as("n_chars")))
            false
          } catch { case e: Throwable =>
            e.getMessage.contains("CHECK chars_nonneg") &&
              Manifest.versions(s, table) == Seq(1L, 2L)
          }
        Manifest.commitAppend(s, table,
          docs.filter(col("doc_id") % 6 === 0)
            .select((col("doc_id") + maxId + 1L).as("doc_id"),
              F.lit("ok").as("source"), col("n_chars")))
        Manifest.read(s, table).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("n_chars").cast("long").as("sum_chars"),
          F.count(F.when(col("source") === "ok", 1)).as("n_ok"))
          .select(col("n_rows"), col("sum_chars"), col("n_ok"),
            F.lit(addRefused).as("add_refused"),
            F.lit(badAppendRefused).as("bad_append_refused"))
      },
      Some("""SELECT
             |  CAST((SELECT count(*) FROM documents) +
             |    count(*) FILTER (WHERE doc_id % 6 = 0) AS BIGINT) AS n_rows,
             |  CAST((SELECT sum(n_chars) FROM documents) +
             |    sum(n_chars) FILTER (WHERE doc_id % 6 = 0) AS BIGINT)
             |    AS sum_chars,
             |  CAST(count(*) FILTER (WHERE doc_id % 6 = 0) AS BIGINT) AS n_ok,
             |  true AS add_refused, true AS bad_append_refused
             |FROM documents""".stripMargin)),

    // VERSIONED TABLE STREAM (append tail): a manifested table tailed
    // as a Structured Streaming source — initial snapshot, then two
    // appended commits, one landing while the stream is DOWN and
    // picked up on restart from the checkpointed version offset. The
    // parquet sink's content proves exactly-once end to end:
    // n_ids == n_rows (no replay), totals recomputed by the oracle,
    // and the pre-restart sink count pins that the restart served
    // EXACTLY the missed commit.
    NamedQuery("q217_table_stream",
      (s, d) => {
        import graft.sources.{Manifest, ManifestStream}
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val dir = freshQueryDir("tstream")
        val table = s"$dir/docs"
        val out = s"$dir/out"
        val ckpt = s"$dir/ckpt"
        Manifest.create(s, table, docs.filter(col("doc_id") % 3 === 0))
        def start() = ManifestStream.read(s, table).writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt).start()
        val q1 = start()
        try {
          q1.processAllAvailable()
          Manifest.commitAppend(s, table, docs.filter(col("doc_id") % 3 === 1))
          q1.processAllAvailable()
        } finally q1.stop()
        val nBeforeRestart = s.read.parquet(out).count()
        Manifest.commitAppend(s, table, docs.filter(col("doc_id") % 3 === 2))
        val q2 = start()
        try q2.processAllAvailable() finally q2.stop()
        s.read.parquet(out).agg(
          F.count(F.lit(1)).as("n_rows"),
          F.sum("n_chars").cast("long").as("sum_chars"),
          F.count_distinct(col("doc_id")).as("n_ids"))
          .select(col("n_rows"), col("sum_chars"), col("n_ids"),
            F.lit(nBeforeRestart).as("n_before_restart"))
      },
      Some("""SELECT
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids,
             |  CAST(count(*) FILTER (WHERE doc_id % 3 <= 1) AS BIGINT)
             |    AS n_before_restart
             |FROM documents""".stripMargin)),

    // VERSIONED TABLE STREAM (change feed): the same source in
    // changeFeed mode serves the full row-level feed — the initial
    // snapshot as inserts, a CoW delete's rows as deletes, an append's
    // rows as inserts, each attributed to its commit version — and the
    // collected feed REPLAYS the table exactly (inserts minus deletes
    // reproduces the final snapshot as a multiset).
    NamedQuery("q218_stream_feed",
      (s, d) => {
        import graft.sources.{Manifest, ManifestStream}
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val dir = freshQueryDir("cdcstream")
        val table = s"$dir/docs"
        val out = s"$dir/out"
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        Manifest.create(s, table, docs)
        val q = ManifestStream.read(s, table, changeFeed = true).writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", s"$dir/ckpt").start()
        try {
          q.processAllAvailable()
          Manifest.deleteWhere(s, table, col("doc_id") % 7 === 0)     // v2
          Manifest.commitAppend(s, table,                             // v3
            docs.filter(col("doc_id") % 9 === 0)
              .select((col("doc_id") + maxId + 1L).as("doc_id"),
                F.lit("new").as("source"), col("n_chars")))
          q.processAllAvailable()
        } finally q.stop()
        val feed = s.read.parquet(out)
        val dataCols = Seq("doc_id", "source", "n_chars").map(col)
        val ins = feed.filter(col("_change_type") === "insert").select(dataCols: _*)
        val del = feed.filter(col("_change_type") === "delete").select(dataCols: _*)
        val fin = Manifest.read(s, table).select(dataCols: _*)
        val net = ins.exceptAll(del)
        val replays = net.exceptAll(fin).isEmpty && fin.exceptAll(net).isEmpty
        feed.agg(
          F.count(F.when(col("_change_type") === "insert", 1)).as("n_insert"),
          F.count(F.when(col("_change_type") === "delete", 1)).as("n_delete"),
          F.count_distinct(col("_commit_version")).as("n_commits"))
          .select(col("n_insert"), col("n_delete"), col("n_commits"),
            F.lit(replays).as("feed_replays"))
      },
      Some("""SELECT
             |  CAST(count(*) + count(*) FILTER (WHERE doc_id % 9 = 0)
             |    AS BIGINT) AS n_insert,
             |  CAST(count(*) FILTER (WHERE doc_id % 7 = 0) AS BIGINT)
             |    AS n_delete,
             |  CAST(3 AS BIGINT) AS n_commits,
             |  true AS feed_replays
             |FROM documents""".stripMargin)),

    // TAGGED RELEASE: "corpus-v1.0" pins snapshot 1 by NAME; two CoW
    // takedowns later, a keep-1 vacuum reclaims the untagged middle
    // version but the tagged one survives with all its data — and is
    // queryable through the parsed front door's asOfTag option. A
    // duplicate tag refuses (tags are immutable); after deleteTag the
    // next vacuum reclaims the release. Per-source counts at the tag
    // and at current are recomputed by the oracle.
    NamedQuery("q219_tagged_release",
      (s, d) => {
        import graft.parse.QueryParser
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
        val table = freshQueryDir("tag") + "/docs"
        Manifest.create(s, table, docs)                               // v1
        Manifest.tag(s, table, "corpus-v1.0",
          note = Some("frozen training release"))
        Manifest.deleteWhere(s, table, col("doc_id") % 7 === 3)       // v2
        Manifest.deleteWhere(s, table, col("doc_id") % 11 === 5)      // v3
        Manifest.vacuum(s, table, keep = 1)
        val tagRetained = Manifest.versions(s, table) == Seq(1L, 3L)
        val cube = graft.cubes.Cubes.documentsCube(s, d)
          .copy(fact = Manifest.read(s, table), manifestTable = Some(table))
        def run(opts: String) = QueryParser.parse(cube,
          s"""{ "cube": "documents",
             |  "args": { "options": { $opts "asc": "source" } },
             |  "fields": [
             |    {"name": "source"},
             |    {"name": "count", "alias": "n_docs"} ] }""".stripMargin)
          .query.toDF
        val atTag = run("\"asOfTag\": \"corpus-v1.0\",")
          .withColumnRenamed("n_docs", "n_tag")
        val cur = run("").withColumnRenamed("n_docs", "n_cur")
        val dupRefused =
          try { Manifest.tag(s, table, "corpus-v1.0"); false }
          catch { case e: Throwable => e.getMessage.contains("immutable") }
        val joined = atTag.join(cur, "source")
        // force the tagged read BEFORE untagging (the frames are lazy)
        val snap = joined.collect()
        Manifest.deleteTag(s, table, "corpus-v1.0")
        Manifest.vacuum(s, table, keep = 1)
        val reclaimed = Manifest.versions(s, table) == Seq(3L)
        import s.implicits._
        s.createDataFrame(
          s.sparkContext.parallelize(snap.toSeq, 1), joined.schema)
          .select(col("source"), col("n_tag"), col("n_cur"),
            F.lit(tagRetained).as("tag_retained"),
            F.lit(dupRefused).as("dup_refused"),
            F.lit(reclaimed).as("reclaimed_after_untag"))
          .orderBy(col("source").asc_nulls_first)
      },
      Some("""SELECT source,
             |  CAST(count(*) AS BIGINT) AS n_tag,
             |  CAST(count(*) FILTER (WHERE doc_id % 7 <> 3
             |    AND doc_id % 11 <> 5) AS BIGINT) AS n_cur,
             |  true AS tag_retained, true AS dup_refused,
             |  true AS reclaimed_after_untag
             |FROM documents GROUP BY 1
             |ORDER BY source ASC NULLS FIRST""".stripMargin)),

    // METADATA-SERVED AGGREGATES: count/min/max/sum answered from the
    // analyzeFiles sidecar at the DRIVER (zero data-file opens — at
    // 100 TB a count(*) becomes one #files-row sidecar read). The
    // serving-mode ladder is pinned in the output: fully-covered ⇒
    // 'stats' with files_scanned=0; an un-analyzed append ⇒
    // 'stats_delta' scanning EXACTLY the one appended file; the
    // incremental re-analyze also scans exactly that file; a MoR
    // delete vector forces the honest 'scan' fallback (raw-file stats
    // count masked rows); fold + re-analyze restores 'stats'. Every
    // served value is recomputed independently by the oracle.
    NamedQuery("q220_stats_agg",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
        val table = freshQueryDir("statsagg") + "/docs"
        Manifest.create(s, table, docs.repartition(4))              // v1
        Manifest.analyzeFiles(s, table, Seq("n_chars"))
        def probe() = Manifest.statsAggregate(s, table, Seq("n_chars")).head()
        def lng(r: org.apache.spark.sql.Row, n: String) =
          math.round(r.getAs[Double](n))
        val s1 = probe()
        val maxId = docs.agg(F.max("doc_id")).head().getLong(0)
        Manifest.commitAppend(s, table,
          docs.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + maxId + 1L).as("doc_id"),
              col("n_chars")).coalesce(1))                          // v2
        val s2 = probe()
        val analyzeScanned = Manifest.analyzeFiles(s, table, Seq("n_chars"))
        val s3 = probe()
        Manifest.deleteWhereMoR(s, table, col("n_chars") % 10 === 7) // v3
        val s4 = probe()
        Manifest.foldDeletes(s, table)                               // v4
        Manifest.analyzeFiles(s, table, Seq("n_chars"))
        val s5 = probe()
        import s.implicits._
        Seq((s1.getAs[Long]("cnt"), s1.getAs[Long]("n_chars_nn"),
            lng(s1, "n_chars_min"), lng(s1, "n_chars_max"),
            lng(s1, "n_chars_sum"),
            s1.getAs[String]("served_from"), s1.getAs[Long]("files_scanned"),
            s2.getAs[Long]("cnt"), lng(s2, "n_chars_sum"),
            s2.getAs[String]("served_from"), s2.getAs[Long]("files_scanned"),
            s3.getAs[String]("served_from"), analyzeScanned == 1,
            s3.getAs[Long]("cnt") == s2.getAs[Long]("cnt"),
            s4.getAs[Long]("cnt"), s4.getAs[String]("served_from"),
            s5.getAs[Long]("cnt"), lng(s5, "n_chars_sum"),
            s5.getAs[String]("served_from"), s5.getAs[Long]("files_scanned")))
          .toDF("cnt1", "nn1", "min1", "max1", "sum1", "from1", "scanned1",
            "cnt2", "sum2", "from2", "scanned2",
            "from3", "analyze_incr", "cnt3_eq",
            "cnt4", "from4", "cnt5", "sum5", "from5", "scanned5")
      },
      Some("""WITH app AS (SELECT n_chars FROM documents WHERE doc_id % 5 = 0)
             |SELECT
             |  CAST((SELECT count(*) FROM documents) AS BIGINT) AS cnt1,
             |  CAST((SELECT count(n_chars) FROM documents) AS BIGINT) AS nn1,
             |  CAST((SELECT min(n_chars) FROM documents) AS BIGINT) AS min1,
             |  CAST((SELECT max(n_chars) FROM documents) AS BIGINT) AS max1,
             |  CAST((SELECT sum(n_chars) FROM documents) AS BIGINT) AS sum1,
             |  'stats' AS from1, CAST(0 AS BIGINT) AS scanned1,
             |  CAST((SELECT count(*) FROM documents)
             |    + (SELECT count(*) FROM app) AS BIGINT) AS cnt2,
             |  CAST((SELECT sum(n_chars) FROM documents)
             |    + (SELECT sum(n_chars) FROM app) AS BIGINT) AS sum2,
             |  'stats_delta' AS from2, CAST(1 AS BIGINT) AS scanned2,
             |  'stats' AS from3, true AS analyze_incr, true AS cnt3_eq,
             |  CAST((SELECT count(*) FROM documents
             |      WHERE n_chars % 10 <> 7 OR n_chars IS NULL)
             |    + (SELECT count(*) FROM app
             |      WHERE n_chars % 10 <> 7 OR n_chars IS NULL) AS BIGINT)
             |    AS cnt4,
             |  'scan' AS from4,
             |  CAST((SELECT count(*) FROM documents
             |      WHERE n_chars % 10 <> 7 OR n_chars IS NULL)
             |    + (SELECT count(*) FROM app
             |      WHERE n_chars % 10 <> 7 OR n_chars IS NULL) AS BIGINT)
             |    AS cnt5,
             |  CAST((SELECT sum(n_chars) FROM documents
             |      WHERE n_chars % 10 <> 7)
             |    + (SELECT sum(n_chars) FROM app
             |      WHERE n_chars % 10 <> 7) AS BIGINT) AS sum5,
             |  'stats' AS from5, CAST(0 AS BIGINT) AS scanned5""".stripMargin)),

    // STATS-ONLY THROUGH THE PARSED FRONT DOOR: "options":
    // {"statsOnly": true} routes an eligible measure-only cube query to
    // the metadata-served aggregate — the plan is a LocalRelation, so
    // inputFiles is EMPTY (zero data-file opens; pinned). Unservable
    // shapes refuse loudly, V4-style: dimensions, an expression-valued
    // metric (sumTokens aggregates tokenCount(text), not a bare
    // column). COMPOSES with asOf: after a CoW takedown, the pinned
    // epoch's count still serves from metadata (files are immutable,
    // so any retained sidecar filtered to the pinned snapshot's file
    // list is exact). Values recomputed by the oracle.
    NamedQuery("q221_stats_only",
      (s, d) => {
        import graft.parse.QueryParser
        import graft.sources.Manifest
        import graft.model.Metric
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("statsonly") + "/docs"
        Manifest.create(s, table, docs.repartition(4))
        Manifest.analyzeFiles(s, table, Seq("n_chars"))
        val cube0 = graft.cubes.Cubes.documentsCube(s, d)
        val cube = cube0.copy(
          fact = Manifest.read(s, table), manifestTable = Some(table),
          metrics = cube0.metrics ++ Map(
            "sumChars" -> Metric.sumOf("sumChars", col("n_chars")),
            "minChars" -> Metric.minOf("minChars", col("n_chars")),
            "maxChars" -> Metric.maxOf("maxChars", col("n_chars"))))
        def parse(fields: String, opts: String) = QueryParser.parse(cube,
          s"""{ "cube": "documents",
             |  "args": { "options": { $opts } },
             |  "fields": [ $fields ] }""".stripMargin).query.toDF
        val out = parse(
          """{"name": "count", "alias": "n_docs"},
            |{"name": "sumChars", "alias": "sum_chars"},
            |{"name": "minChars", "alias": "min_chars"},
            |{"name": "maxChars", "alias": "max_chars"}""".stripMargin,
          "\"statsOnly\": true")
        val servedLocal = out.inputFiles.isEmpty
        def refused(fields: String, opts: String, needle: String) =
          try { parse(fields, opts); false }
          catch { case e: Throwable => e.getMessage.contains(needle) }
        // bare-column slices now SERVE from metadata (q231's grouped
        // statsOnly); the refusal pin moved to the shape that stays
        // unservable — an expression-valued dimension
        val dimRefused = refused(
          """{"name": "lang"}, {"name": "count", "alias": "n"}""",
          "\"statsOnly\": true", "expression-valued")
        val exoticRefused = refused(
          """{"name": "sumTokens", "alias": "t"}""",
          "\"statsOnly\": true", "not a servable")
        // CoW takedown churn, then both epochs from metadata
        Manifest.deleteWhere(s, table, col("doc_id") % 3 === 0)     // v2
        Manifest.analyzeFiles(s, table, Seq("n_chars"))
        val cur = parse("""{"name": "count", "alias": "n"}""",
          "\"statsOnly\": true")
        val old = parse("""{"name": "count", "alias": "n"}""",
          "\"statsOnly\": true, \"asOf\": 1")
        out.select(col("n_docs"), col("sum_chars"),
          col("min_chars"), col("max_chars"),
          F.lit(servedLocal).as("served_local"),
          F.lit(dimRefused).as("dim_refused"),
          F.lit(exoticRefused).as("exotic_refused"),
          F.lit(cur.head().getLong(0)).as("cur_docs"),
          F.lit(old.head().getLong(0)).as("asof_docs"),
          F.lit(cur.inputFiles.isEmpty && old.inputFiles.isEmpty)
            .as("epochs_served_local"))
      },
      Some("""SELECT
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(min(n_chars) AS BIGINT) AS min_chars,
             |  CAST(max(n_chars) AS BIGINT) AS max_chars,
             |  true AS served_local, true AS dim_refused,
             |  true AS exotic_refused,
             |  CAST(count(*) FILTER (WHERE doc_id % 3 <> 0) AS BIGINT)
             |    AS cur_docs,
             |  CAST(count(*) AS BIGINT) AS asof_docs,
             |  true AS epochs_served_local
             |FROM documents""".stripMargin)),

    // STRING-ENVELOPE FILE SKIPPING: lexicographic per-file min/max
    // (the analyzeFiles type-split for strings, its own strstats
    // sidecar) prune a URL-prefix probe on a string-range-clustered
    // layout to a STRICT subset of files — the LIKE-'prefix%'
    // accelerator numeric envelopes can't express. Values recomputed
    // by the oracle over the same synthesized urls; pruning is an
    // accelerator, so the explicit prefix filter on top keeps the
    // served rows exact whatever the envelopes admitted.
    NamedQuery("q222_string_skipping",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"),
            F.concat(F.lit("https://"), col("source"), F.lit("/doc-"),
              F.format_string("%06d", col("doc_id"))).as("url"),
            col("n_chars"))
        val table = freshQueryDir("strskip") + "/docs"
        Manifest.create(s, table,
          docs.repartitionByRange(4, col("url")).sortWithinPartitions("url"))
        Manifest.analyzeFilesString(s, table, Seq("url"))
        val all = Manifest.read(s, table).inputFiles.length
        val minSrc = Tables.documents(s, d)
          .agg(F.min("source")).head().getString(0)
        val prefix = s"https://$minSrc/"
        val pruned = Manifest.readPrefix(s, table, "url", prefix)
        val prunedFiles = pruned.inputFiles.length
        // a range probe too: doc-id urls for the min source between
        // two fixed suffixes, inclusive — the BETWEEN shape
        val ranged = Manifest.readPrunedString(s, table, "url",
          Some(prefix + "doc-"), Some(prefix + "doc-999999"))
        val rangedFiles = ranged.inputFiles.length
        pruned.filter(col("url").startsWith(prefix))
          .agg(F.count(F.lit(1)).as("n_docs"),
            F.sum("n_chars").cast("long").as("sum_chars"),
            F.min("url").as("min_url"))
          .select(col("n_docs"), col("sum_chars"), col("min_url"),
            F.lit(all >= 4).as("multi_file_layout"),
            F.lit(prunedFiles < all).as("prefix_pruned_strict"),
            F.lit(rangedFiles < all).as("range_pruned_strict"),
            F.lit(ranged.filter(col("url").startsWith(prefix)).count())
              .as("n_ranged"))
      },
      Some("""WITH u AS (SELECT
             |    'https://' || source || '/doc-' || printf('%06d', doc_id)
             |      AS url, n_chars
             |  FROM documents),
             |p AS (SELECT 'https://' ||
             |    (SELECT min(source) FROM documents) || '/' AS pre)
             |SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  min(url) AS min_url,
             |  true AS multi_file_layout, true AS prefix_pruned_strict,
             |  true AS range_pruned_strict,
             |  CAST(count(*) AS BIGINT) AS n_ranged
             |FROM u, p WHERE starts_with(url, pre)""".stripMargin)),

    // DESCRIBE HISTORY: every write verb stamps its name into commit
    // metadata, so the table's whole lifecycle reads back as one
    // driver-side frame — version, verb, monotone commit stamps, zero
    // data-file IO. A seven-verb churn (create → append → CoW delete →
    // MoR delete → fold → compact → restore) pins the exact ledger;
    // the surviving row count is recomputed independently by the
    // oracle (restore(5) must equal the post-fold state).
    NamedQuery("q223_history",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("history") + "/docs"
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
        val h = Manifest.history(s, table)
        val times = h.orderBy(col("version"))
          .select("committed_at").collect().map(_.getLong(0))
        val monotone = times.zip(times.tail).forall { case (a, b) => a <= b }
        val finalRows = Manifest.read(s, table).count()
        h.select(col("version"), col("operation"),
            F.lit(monotone).as("ts_monotone"),
            F.lit(h.inputFiles.isEmpty).as("metadata_only"),
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
             |  true AS ts_monotone, true AS metadata_only,
             |  CAST((SELECT n FROM fin) AS BIGINT) AS final_rows
             |FROM (VALUES (1, 'create'), (2, 'append'), (3, 'delete'),
             |  (4, 'delete'), (5, 'fold'), (6, 'compact'),
             |  (7, 'restore')) AS t(v, op)
             |ORDER BY version ASC""".stripMargin)),

    // MIXED-FAMILY PRUNING: one conjunctive decision across BOTH
    // envelope families — a string range (source equality as
    // [src, src]) against the strstats sidecar AND a numeric range
    // against the stats sidecar. On a (source, n_chars)-clustered
    // layout the conjunction admits at most what either family admits
    // alone and strictly less than the full file list; the explicit
    // filter on top keeps the served rows exact, recomputed by the
    // oracle.
    NamedQuery("q224_mixed_pruning",
      (s, d) => {
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("mixskip") + "/docs"
        Manifest.create(s, table,
          docs.repartitionByRange(4, col("source"), col("n_chars"))
            .sortWithinPartitions("source", "n_chars"))
        Manifest.analyzeFiles(s, table, Seq("n_chars"))
        Manifest.analyzeFilesString(s, table, Seq("source"))
        val all = Manifest.read(s, table).inputFiles.length
        val minSrc = Tables.documents(s, d)
          .agg(F.min("source")).head().getString(0)
        val nStr = Manifest.readPrunedString(s, table, "source",
          Some(minSrc), Some(minSrc)).inputFiles.length
        val nNum = Manifest.readPruned(s, table, "n_chars", 100.0, 300.0)
          .inputFiles.length
        val conj = Manifest.readPrunedMixed(s, table,
          Seq(("n_chars", 100.0, 300.0)),
          Seq(("source", Some(minSrc), Some(minSrc))))
        val nConj = conj.inputFiles.length
        conj.filter(col("source") === minSrc &&
            col("n_chars").between(100, 300))
          .agg(F.count(F.lit(1)).as("n_docs"),
            F.sum("n_chars").cast("long").as("sum_chars"))
          .select(col("n_docs"), col("sum_chars"),
            F.lit(all >= 4).as("multi_file_layout"),
            F.lit(nConj <= nStr && nConj <= nNum).as("conj_tightest"),
            F.lit(nConj < all).as("conj_strict_subset"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS multi_file_layout, true AS conj_tightest,
             |  true AS conj_strict_subset
             |FROM documents
             |WHERE source = (SELECT min(source) FROM documents)
             |  AND n_chars BETWEEN 100 AND 300""".stripMargin)),

    // FRONT-DOOR FILE SKIPPING: a parsed cube query's plain `when`
    // range on a manifested fact prunes the scan's FILES at the driver
    // — no query change, no option, just ANALYZE once and every
    // eligible front-door filter stops opening files its envelopes
    // exclude. Pinned by comparing the compiled plan's inputFiles
    // against the table's file count; values recomputed by the oracle
    // (the WHERE still applies in full — pruning is invisible except
    // in files opened).
    NamedQuery("q225_frontdoor_skipping",
      (s, d) => {
        import graft.parse.QueryParser
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
        val table = freshQueryDir("fdskip") + "/docs"
        Manifest.create(s, table,
          docs.repartitionByRange(4, col("n_chars"))
            .sortWithinPartitions("n_chars"))
        Manifest.analyzeFiles(s, table, Seq("n_chars"))
        val all = Manifest.read(s, table).inputFiles.length
        val cube = graft.cubes.Cubes.documentsCube(s, d)
          .copy(fact = Manifest.read(s, table), manifestTable = Some(table))
        val out = QueryParser.parse(cube,
          """{ "cube": "documents",
            |  "args": {
            |    "nChars": { "between": [100, 300] },
            |    "options": { "asc": "source" } },
            |  "fields": [
            |    {"name": "source"},
            |    {"name": "count", "alias": "n_docs"} ] }""".stripMargin)
          .query.toDF
        val pruned = out.inputFiles.length
        out.select(col("source"), col("n_docs"),
          F.lit(all >= 4).as("multi_file_layout"),
          F.lit(pruned < all).as("scan_pruned_strict"))
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  true AS multi_file_layout, true AS scan_pruned_strict
             |FROM documents WHERE n_chars BETWEEN 100 AND 300
             |GROUP BY source ORDER BY source ASC NULLS FIRST""".stripMargin)),

    // FILTERED METADATA AGGREGATES through the parsed front door:
    // statsOnly + a complete BETWEEN filter — fully-covered files of
    // the range-clustered layout serve count/sum straight from their
    // stored per-file scalars, only the range's boundary files scan,
    // and the result is STILL a LocalRelation (zero input files in the
    // plan; pinned). A strict `gt` filter refuses — an exact serve
    // must never relax strictness the way pruning may. Values
    // recomputed by the oracle.
    NamedQuery("q226_stats_where",
      (s, d) => {
        import graft.parse.QueryParser
        import graft.sources.Manifest
        import graft.model.Metric
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("statswhere") + "/docs"
        Manifest.create(s, table,
          docs.repartitionByRange(4, col("n_chars"))
            .sortWithinPartitions("n_chars"))
        Manifest.analyzeFiles(s, table, Seq("n_chars"))
        val cube0 = graft.cubes.Cubes.documentsCube(s, d)
        val cube = cube0.copy(
          fact = Manifest.read(s, table), manifestTable = Some(table),
          metrics = cube0.metrics +
            ("sumChars" -> Metric.sumOf("sumChars", col("n_chars"))))
        def parse(args: String) = QueryParser.parse(cube,
          s"""{ "cube": "documents",
             |  "args": { $args "options": { "statsOnly": true } },
             |  "fields": [
             |    {"name": "count", "alias": "n_docs"},
             |    {"name": "sumChars", "alias": "sum_chars"} ] }""".stripMargin)
          .query.toDF
        val out = parse("\"nChars\": { \"between\": [100, 300] },")
        val servedLocal = out.inputFiles.isEmpty
        val strictRefused =
          try { parse("\"nChars\": { \"gt\": 100 },"); false }
          catch { case e: Throwable => e.getMessage.contains("conjunction") }
        out.select(col("n_docs"), col("sum_chars"),
          F.lit(servedLocal).as("served_local"),
          F.lit(strictRefused).as("strict_refused"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  true AS served_local, true AS strict_refused
             |FROM documents WHERE n_chars BETWEEN 100 AND 300""".stripMargin)),

    // THE FULL COMPOSITION: filtered + statsOnly + asOf through the
    // parsed front door. After a CoW takedown churns the table, the
    // SAME filtered metadata query serves both epochs — the pinned one
    // from its retained sidecar, the current one from the re-analyze —
    // and both results stay LocalRelations. Values recomputed by the
    // oracle on each epoch's content.
    NamedQuery("q227_stats_where_asof",
      (s, d) => {
        import graft.parse.QueryParser
        import graft.sources.Manifest
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val table = freshQueryDir("statswasof") + "/docs"
        Manifest.create(s, table,
          docs.repartitionByRange(4, col("n_chars"))
            .sortWithinPartitions("n_chars"))                        // v1
        Manifest.analyzeFiles(s, table, Seq("n_chars"))
        val cube = graft.cubes.Cubes.documentsCube(s, d)
          .copy(fact = Manifest.read(s, table), manifestTable = Some(table))
        Manifest.deleteWhere(s, table, col("doc_id") % 3 === 0)      // v2
        Manifest.analyzeFiles(s, table, Seq("n_chars"))
        def parse(opts: String) = QueryParser.parse(cube,
          s"""{ "cube": "documents",
             |  "args": {
             |    "nChars": { "between": [100, 300] },
             |    "options": { "statsOnly": true$opts } },
             |  "fields": [ {"name": "count", "alias": "n_docs"} ] }"""
            .stripMargin).query.toDF
        val cur = parse("")
        val old = parse(", \"asOf\": 1")
        cur.select(col("n_docs").as("cur_docs"),
          F.lit(old.head().getLong(0)).as("asof_docs"),
          F.lit(cur.inputFiles.isEmpty && old.inputFiles.isEmpty)
            .as("served_local"))
      },
      Some("""SELECT
             |  CAST(count(*) FILTER (WHERE doc_id % 3 <> 0) AS BIGINT)
             |    AS cur_docs,
             |  CAST(count(*) AS BIGINT) AS asof_docs,
             |  true AS served_local
             |FROM documents WHERE n_chars BETWEEN 100 AND 300""".stripMargin)),

    // Z-ORDER CLUSTERED COMPACTION + CONJUNCTIVE PRUNING, end to end
    // on the manifest: a Morton-interleaved sort key clusters BOTH
    // axes, so after one compaction a (orderkey-quarter × low-quantity)
    // box prunes to a strict subset of files that is also at most what
    // EITHER single axis admits — the multi-dimensional payoff a
    // single-column sort cannot give. The explicit filter on top keeps
    // the served rows exact, recomputed by the oracle.
    NamedQuery("q228_zorder_pruning",
      (s, d) => {
        import graft.sources.{Layout, Manifest}
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_quantity").cast("long")
            .as("l_quantity"))
        val table = freshQueryDir("zorder") + "/li"
        Manifest.create(s, table, li.repartition(8))
        val maxKey = li.agg(F.max("l_orderkey")).head().getLong(0)
        val z = Layout.zValue(
          Layout.axisBucket(col("l_orderkey"), 0, maxKey.toDouble + 1, 5),
          Layout.axisBucket(col("l_quantity"), 0, 51, 5), 5)
        val bytes = Manifest.snapshotBytes(s, table,
          Manifest.currentSnapshot(s, table).get)
        Manifest.compact(s, table, targetBytes = math.max(1L, bytes / 16),
          sortBy = Some(z))
        Manifest.analyzeFiles(s, table, Seq("l_orderkey", "l_quantity"))
        val all = Manifest.read(s, table).inputFiles.length
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
            F.lit(all >= 8).as("multi_file_layout"),
            F.lit(nConj < all).as("conj_strict_subset"),
            F.lit(nConj <= math.min(pk, pq)).as("conj_tightest"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             |  true AS multi_file_layout, true AS conj_strict_subset,
             |  true AS conj_tightest
             |FROM lineitem
             |WHERE l_orderkey <= (SELECT max(l_orderkey) FROM lineitem) // 4
             |  AND l_quantity BETWEEN 1 AND 12""".stripMargin))
  )
}
