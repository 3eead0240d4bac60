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

  val qs: Seq[NamedQuery] = Seq(

    // Copy-on-write delete: a range takedown on a range-clustered
    // 4-file snapshot rewrites ONLY the intersecting files (≥2 of 4
    // carried by path — file-grain CoW, the claim `cow_carried` pins),
    // a pre-delete pinned reader keeps serving the old snapshot, and
    // the next sidecar ANALYZE scans only the rewritten files. Counts
    // and sums over the survivors anchor the oracle; the cut is the
    // same integer quarter of max(doc_id) on both sides.
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
        Manifest.deleteWhere(s, table, doomed,
          pruneRanges = Seq(("doc_id", 0.0, cut.toDouble)))
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
             |FROM documents""".stripMargin)))
}
