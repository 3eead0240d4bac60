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
             |          AS VARCHAR), 8, '0')""".stripMargin))
  )
}
