package graft.llm

import graft.functions.{CosineSim, PqAdcCosine, PqEncode}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>).
  *
  * Two paths, per the build brief:
  *   - [[bruteForceTopK]] — exact baseline: broadcast the (small) query
  *     set against the corpus; scoring is a single codegen'd
  *     [[CosineSim]] per row; a per-query window keeps top-k. Cost
  *     O(|Q|·N) scans but only the top-k rows survive the window, so at
  *     100 TB it's bounded by corpus scan bandwidth, not memory.
  *   - [[lshTopK]] — scale path: random-hyperplane LSH. Each vector gets
  *     a `nBits` sign signature from fixed-seed hyperplanes (row-local,
  *     reproducible); candidates = bucket join on the signature prefix
  *     (optionally multi-probe by emitting several prefixes); exact
  *     cosine re-ranks within buckets. Shuffle is by bucket key —
  *     corpus-linear, never all-pairs.
  */
object Similarity {

  /** Sign-bit signature of `emb` against fixed-seed gaussian
    * hyperplanes, packed into a long (nBits ≤ 64). A codegen'd
    * [[graft.functions.HyperplaneSig]] expression: the earlier
    * zip_with + aggregate formulation paid an interpreted lambda
    * dispatch per element per plane — with tables × bits planes per row
    * that constant dominated every LSH path once the adaptive widths
    * grew (measured on the q58/q59 scaling ladder). Signatures are
    * bit-identical to the HOF version (LlmSpec pins it). */
  def signature(emb: Column, dim: Int, nBits: Int = 16, seed: Long = 7L): Column = {
    require(nBits <= 64)
    graft.functions.HyperplaneSig(emb, dim, nBits, seed)
  }

  /** Exact top-k cosine neighbors for each query vector.
    * `queries`/`corpus`: (id, embedding). Output: (query_id, neighbor_id,
    * cosine, rnk), excluding self-matches, deterministic tie-break by
    * neighbor_id. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(F.col("id").as("query_id"), F.col("embedding").as("q_emb"))
    val c = corpus.select(F.col("id").as("neighbor_id"), F.col("embedding").as("c_emb"))
    val scored = c.crossJoin(F.broadcast(q))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .withColumn("cosine", CosineSim(F.col("q_emb"), F.col("c_emb")))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("cosine").desc_nulls_last, F.col("neighbor_id").asc)
    scored.withColumn("rnk", F.row_number().over(w))
      .filter(F.col("rnk") <= k)
      .select("query_id", "neighbor_id", "cosine", "rnk")
  }

  /** LSH-bucketed ANN: multi-table random-hyperplane LSH (the standard
    * recall lever — L independent signature tables OR'd together), plus
    * Hamming-1 multi-probe on the query side within each table. Exact
    * cosine re-ranks the candidate union. Shuffle is by (table, bucket)
    * key — corpus×L rows, never all-pairs. Recall < 1 by construction;
    * measured against [[bruteForceTopK]] in LlmSpec.
    *
    * `nBits = 0` (the default) sizes the signature by [[adaptiveBits]]
    * so bucket occupancy — and with it the per-probe candidate count —
    * stays ~`targetBucket` at ANY corpus size: probe cost is then
    * O(|Q|·tables·probes·targetBucket) after the linear signature scan,
    * instead of growing ∝ n/2^fixedBits the way a fixed width does (an
    * indexed ANN lookup must not scan a constant fraction of the
    * corpus). Explicit widths remain for reproducing a historical
    * bucketing. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int, nBits: Int = 0, tables: Int = 8, probeBits: Int = 6,
      seed: Long = 7L, targetBucket: Int = 32): DataFrame = {
    val bits = if (nBits > 0) nBits else adaptiveBits(corpus.count(), targetBucket)
    def sigs(col: Column) = F.array((0 until tables).map(t =>
      signature(col, dim, bits, seed + t)): _*)
    val c = corpus.select(F.col("id").as("neighbor_id"),
        F.col("embedding").as("c_emb"),
        F.posexplode(sigs(F.col("embedding"))))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    // per table, the query probes its own bucket plus the Hamming-1
    // neighbors on the low min(probeBits, bits) positions — cheap
    // recall boost, corpus side unchanged
    val probeMasks = F.array((F.lit(0L) +: (0 until math.min(probeBits, bits)).map(i =>
      F.lit(1L << i))): _*)
    val q = queries.select(F.col("id").as("query_id"),
        F.col("embedding").as("q_emb"),
        F.posexplode(sigs(F.col("embedding"))))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "q_sig")
      .withColumn("bucket", F.explode(F.transform(probeMasks,
        m => F.col("q_sig").bitwiseXOR(m))))
      .drop("q_sig")
    val scored = c.join(F.broadcast(q), Seq("tbl", "bucket"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", CosineSim(F.col("q_emb"), F.col("c_emb")))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("cosine").desc_nulls_last, F.col("neighbor_id").asc)
    scored.withColumn("rnk", F.row_number().over(w))
      .filter(F.col("rnk") <= k)
      .select("query_id", "neighbor_id", "cosine", "rnk")
  }

  /** IVF-style ANN: a coarse k-means quantizer (spark-mllib, fixed seed)
    * partitions the corpus into `nLists` cells; each query probes its
    * `nProbe` nearest centroids and exact cosine re-ranks within them.
    * The classic inverted-file trade-off: recall grows with nProbe while
    * scanned fraction ≈ nProbe/nLists. Centroids are tiny → broadcast;
    * the corpus is shuffled once by cell id (at scale: write bucketed by
    * cell and probing becomes partition pruning).
    */
  def ivfTopK(
      spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, corpus: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4, seed: Long = 7L): DataFrame = {
    val centroids = trainCentroids(corpus, nLists, seed)
    val c = corpus.select(F.col("id").as("neighbor_id"),
      F.col("embedding").as("c_emb"), bestCell(centroids)(F.col("embedding")).as("cell"))
    probeAndRerank(c, queries, centroids, k, nProbe)
  }

  /** Materialize an IVF index: the corpus written PARTITIONED BY cell id
    * (hive-style directories) with the centroids alongside. This is the
    * promised 100 TB shape of [[ivfTopK]]: the one-off build pays the
    * k-means + cell shuffle; after that every probe is PARTITION PRUNING
    * — the scan reads ~nProbe/nLists of the files (dynamic partition
    * pruning from the broadcast probe side), instead of re-assigning
    * cells over the full corpus per query batch.
    *
    * The corpus is a [[graft.sources.Manifest]]-committed table:
    * serving reads pin a snapshot, and compaction swaps snapshots with
    * one atomic manifest commit — safe on object stores, where the
    * previous directory-rename swap was not. */
  def ivfBuildIndex(
      spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame, path: String,
      nLists: Int = 16, seed: Long = 7L): Unit = {
    val centroids = trainCentroids(corpus, nLists, seed)
    val (fence, superseded) = rebuildDeltaFence(spark, path)
    commitCorpusSnapshot(spark, s"$path/corpus",
      assignCells(corpus, centroids), meta = fence)
    dropSupersededDeltas(spark, path, superseded)
    val rows = centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
    spark.createDataFrame(rows).toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** A full (re)build SUPERSEDES every live delta: the retrain corpus
    * is the caller's current truth, and old deltas were cell-assigned
    * under the OLD centroids — kept live they would serve duplicate or
    * wrongly-celled rows. The fence rides the rebuild's own commit
    * (high-water + fingerprints, exactly like a compaction fold), so
    * the crash window between commit and deletion serves clean and the
    * next compaction can verify the leftovers.
    *
    * ALWAYS stamps both fence keys — with no live deltas it stamps the
    * reset values (-1, empty) rather than returning an empty map:
    * [[commitCorpusSnapshot]]'s rewrite path merges `snap.meta ++ meta`,
    * so an empty map would let a PREVIOUS fold's fence survive the
    * rebuild and refuse the fresh lineage's batches 0..fence-1 after a
    * compact-all-then-rebuild sequence (StreamingSpec pins this). */
  private def rebuildDeltaFence(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): (Map[String, String], Seq[String]) = {
    val dirs = deltaBatchDirs(spark, indexPath)
    if (dirs.isEmpty)
      return (Map("folded_through_batch" -> "-1", "folded_fps" -> ""), Nil)
    val fps = dirs.map { case (id, p) =>
      s"batch=$id:" + graft.streaming.Streaming.contentFingerprint(
        spark.read.parquet(p))._1
    }
    (Map("folded_through_batch" -> dirs.map(_._1).max.toString,
      "folded_fps" -> fps.mkString(",")), dirs.map(_._2))
  }

  private def dropSupersededDeltas(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, dirs: Seq[String]): Unit = {
    val fs = fsFor(spark, indexPath)
    dirs.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
    val delta = new org.apache.hadoop.fs.Path(s"$indexPath/delta")
    if (fs.exists(delta) && deltaBatchDirs(spark, indexPath).isEmpty)
      fs.delete(delta, true)
    ()
  }

  /** Land a (re)built corpus snapshot: first build = CREATE, periodic
    * retrain over an existing index = the next REWRITE commit (pinned
    * readers keep serving the old snapshot), a pre-manifest plain
    * directory = create beside the legacy files then drop them once
    * the commit has succeeded — the documented retrain path works in
    * all three states instead of refusing a second build. */
  private def commitCorpusSnapshot(
      spark: org.apache.spark.sql.SparkSession,
      corpusTable: String, df: DataFrame,
      meta: Map[String, String] = Map.empty): Unit = {
    import graft.sources.Manifest
    val fs = fsFor(spark, corpusTable)
    val root = new org.apache.hadoop.fs.Path(corpusTable)
    if (Manifest.isManifested(spark, corpusTable)) {
      Manifest.commitRewrite(spark, corpusTable, df, Seq("cell"), meta)
      ()
    } else if (fs.exists(root)) {
      val legacy = fs.listStatus(root)
        .map(_.getPath).filterNot(_.getName.startsWith("_"))
      Manifest.create(spark, corpusTable, df, partitionBy = Seq("cell"),
        meta = meta)
      legacy.foreach(fs.delete(_, true))
    } else {
      Manifest.create(spark, corpusTable, df, partitionBy = Seq("cell"),
        meta = meta)
      ()
    }
  }

  /** (id, embedding, cell) under FIXED centroids — the row-local
    * assignment shared by the one-off build and the live ingestion path
    * ([[graft.streaming.Streaming.maintainIvfIndex]]), so an arriving
    * vector lands in exactly the cell a rebuild would give it. */
  def assignCells(df: DataFrame, centroids: Array[Array[Float]]): DataFrame =
    df.select(F.col("id"), F.col("embedding"),
      bestCell(centroids)(F.col("embedding")).as("cell"))

  /** The index's stored quantizer, cell-ordered. */
  def readCentroids(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Array[Array[Float]] =
    spark.read.parquet(s"$indexPath/centroids")
      .orderBy("cell").collect().map(_.getSeq[Float](1).toArray)

  /** The index corpus = the batch-built base plus any live-appended
    * delta batches (`delta/batch=<id>/cell=<c>/`). Both sides carry
    * `cell` as a partition column, so probe-side pruning keeps skipping
    * unprobed cells in EVERY delta batch too. The base reads through
    * its manifest (pinned snapshot — a compaction landing mid-query
    * cannot move the files under the scan); pre-manifest indexes fall
    * back to the plain directory read. */
  private def indexCorpus(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): DataFrame = {
    val corpusTable = s"$indexPath/corpus"
    val manifested = graft.sources.Manifest.isManifested(spark, corpusTable)
    val base =
      if (manifested) graft.sources.Manifest.read(spark, corpusTable)
      else spark.read.parquet(corpusTable)
    // delta batches at or below the snapshot's folded high-water are
    // ALREADY in the base (a compaction that crashed between its commit
    // and its delta deletion leaves them on disk) — excluding them here
    // is what makes that crash window serve without duplicates. A
    // RECYCLED id from a wiped-checkpoint lineage cannot normally land
    // here (the maintenance stream refuses it at write time); if one
    // does, the next compaction's fingerprint check fails loudly.
    val (foldedThrough, _) = foldedState(spark, corpusTable)
    val live = deltaBatchDirs(spark, indexPath)
      .filter { case (id, _) => id > foldedThrough }
    if (live.isEmpty) base
    else base.unionByName(
      spark.read.option("basePath", s"$indexPath/delta")
        .parquet(live.map(_._2): _*).drop("batch"))
  }

  /** The compaction fence: the highest delta batch id already folded
    * into the base snapshot, plus the folded dirs' content
    * fingerprints — both recorded as commit metadata at fold time.
    * (-1, empty) for unfenced / pre-manifest indexes. */
  private[graft] def foldedState(spark: org.apache.spark.sql.SparkSession,
      corpusTable: String): (Long, Map[String, String]) = {
    import graft.sources.Manifest
    if (!Manifest.isManifested(spark, corpusTable)) return (-1L, Map.empty)
    val meta = Manifest.currentSnapshot(spark, corpusTable)
      .map(_.meta).getOrElse(Map.empty)
    val f = meta.get("folded_through_batch").map(_.toLong).getOrElse(-1L)
    val fps = meta.get("folded_fps").map(_.split(',').toSeq
      .filter(_.nonEmpty).map { e =>
        val i = e.indexOf(':')
        e.substring(0, i) -> e.substring(i + 1)
      }.toMap).getOrElse(Map.empty)
    (f, fps)
  }

  /** The live delta batch directories as (batch id, path), ascending. */
  private def deltaBatchDirs(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Seq[(Long, String)] = {
    val fs = fsFor(spark, indexPath)
    val delta = new org.apache.hadoop.fs.Path(s"$indexPath/delta")
    if (!fs.exists(delta)) return Nil
    fs.listStatus(delta).toSeq.filter(_.isDirectory).map(_.getPath)
      .flatMap { p =>
        p.getName.split("=", 2) match {
          case Array("batch", id) => Some(id.toLong -> p.toString)
          case _ => None
        }
      }.sortBy(_._1)
  }

  /** ANN over a materialized [[ivfBuildIndex]] index (including any live
    * deltas). The centroid read is driver-side model metadata (nLists
    * rows); the corpus scan is pruned to the probed cells via the
    * partition column. */
  def ivfTopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, indexPath: String, k: Int,
      nProbe: Int = 4): DataFrame = {
    val centroids = readCentroids(spark, indexPath)
    val c = indexCorpus(spark, indexPath)
      .select(F.col("id").as("neighbor_id"), F.col("embedding").as("c_emb"),
        F.col("cell"))
    probeAndRerank(c, queries, centroids, k, nProbe)
  }

  /** Fold the live delta batches into the base corpus: read base+delta
    * (the base through its pinned snapshot), write the folded corpus as
    * the NEXT snapshot, and publish it with one atomic
    * [[graft.sources.Manifest]] commit — then drop the deltas (they are
    * inside the committed snapshot) and vacuum all but the previous
    * snapshot (retained for readers that pinned before the commit).
    * Run while the maintenance stream is STOPPED (the natural cadence:
    * compact when deltas approach base size, i.e. O(log) compactions
    * over the index's life). Centroids are untouched — cell assignment
    * never changes at compaction, so a served query reads the same rows
    * before and after (the spec asserts it).
    *
    * Crash at any point leaves a consistent index: before the commit,
    * the old snapshot + deltas still serve (the half-written version
    * directory is invisible and reclaimed next run); after it, the new
    * snapshot serves and the delta/vacuum deletions re-run
    * idempotently. No step renames a visible directory, so the
    * protocol holds on S3-class stores where directory rename is not
    * atomic. Pre-manifest indexes (built before this protocol) are
    * adopted on first compaction via the legacy plain-directory read. */
  def ivfCompactIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Unit = {
    import graft.sources.Manifest
    val fs = fsFor(spark, indexPath)
    val corpusTable = s"$indexPath/corpus"
    // leftovers at or below the fence (a crash between the previous
    // run's commit and its deletions) go first — but ONLY after their
    // content matches the fingerprint recorded at fold time. Batch ids
    // are lineage-local, so an id alone cannot distinguish crash
    // residue (rows already in the base — safe to delete) from a
    // wiped-checkpoint lineage recycling low ids (NEW data — deleting
    // it would be silent loss); the fingerprint can.
    val (foldedThrough, foldedFps) = foldedState(spark, corpusTable)
    deltaBatchDirs(spark, indexPath)
      .filter { case (id, _) => id <= foldedThrough }
      .foreach { case (id, p) =>
        val (fp, _) = graft.streaming.Streaming.contentFingerprint(
          spark.read.parquet(p))
        if (foldedFps.get(s"batch=$id").contains(fp))
          fs.delete(new org.apache.hadoop.fs.Path(p), true)
        else sys.error(
          s"ivfCompactIndex: $p sits at or below the folded high-water " +
            s"($foldedThrough) but its content does not match the folded " +
            "fingerprint — a maintenance stream with a wiped checkpoint " +
            "has recycled batch ids into this index. Rebuild the index " +
            "(or remove the directory manually if it is known residue) " +
            "before compacting.")
      }
    def dropEmptyDelta(): Unit = {
      // "empty" = no batch= children left; writer markers (_SUCCESS)
      // may remain and must not keep the dir alive
      val delta = new org.apache.hadoop.fs.Path(s"$indexPath/delta")
      if (fs.exists(delta) && deltaBatchDirs(spark, indexPath).isEmpty)
        fs.delete(delta, true)
      ()
    }
    val live = deltaBatchDirs(spark, indexPath)
    if (live.isEmpty) { dropEmptyDelta(); return }
    // fold exactly the listed batches; record their high-water AND
    // per-dir fingerprints in the COMMIT metadata, so a crash between
    // this commit and the deletions below still serves without
    // duplicates and the next run can verify its leftovers
    val fps = live.map { case (id, p) =>
      s"batch=$id:" + graft.streaming.Streaming.contentFingerprint(
        spark.read.parquet(p))._1
    }
    val folded = indexCorpus(spark, indexPath)
    commitCorpusSnapshot(spark, corpusTable, folded,
      meta = Map("folded_through_batch" -> live.map(_._1).max.toString,
        "folded_fps" -> fps.mkString(",")))
    live.foreach { case (_, p) =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true) }
    dropEmptyDelta()
    Manifest.vacuum(spark, corpusTable, keep = 2)
  }

  // ---- IVFADC: IVF cell pruning × PQ compressed scan ----------------

  /** Build an IVFADC index (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011 — the inverted-file +
    * asymmetric-distance layout that serves 1e9+ vector corpora): the
    * corpus is coarse-quantized into `nLists` cells AND product-
    * quantized to `m` small codes per vector, stored as ONE manifested
    * table partitioned by cell with columns (id, embedding, codes).
    *
    * Parquet's columnar layout is what makes one table suffice: the
    * ADC probe projects only (id, codes) — the scan reads m ints per
    * row and the raw embedding bytes never leave disk (the 16–32×
    * bandwidth lever), while the rerank projects (id, embedding) for
    * only the probed cells. Codes are RAW-vector PQ (the [[pqTopK]]
    * codebooks, not per-cell residuals): cosine ADC composes directly,
    * and an exhaustive probe is then IDENTICAL to [[pqTopK]] under the
    * same codebooks — the spec's equivalence gate; residual encoding
    * would buy precision at the cost of that oracle-able identity.
    * Centroids and codebooks land beside the corpus as model metadata
    * (nLists + m·ksub rows — driver-side reads at probe time). */
  def ivfadcBuildIndex(
      spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame, path: String,
      nLists: Int = 16, m: Int = 8, ksub: Int = 16, seed: Long = 7L): Unit = {
    val centroids = trainCentroids(corpus, nLists, seed)
    val cbs = pqTrain(corpus, m, ksub, seed)
    val (fence, superseded) = rebuildDeltaFence(spark, path)
    commitCorpusSnapshot(spark, s"$path/corpus",
      assignCells(corpus, centroids)
        .withColumn("codes", PqEncode(F.col("embedding"), cbs)),
      meta = fence)
    dropSupersededDeltas(spark, path, superseded)
    val rows = centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
    spark.createDataFrame(rows).toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val cbRows = for {
      (book, s) <- cbs.zipWithIndex.toSeq
      (cent, c) <- book.zipWithIndex
    } yield (s, c, cent.toSeq)
    spark.createDataFrame(cbRows).toDF("sub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** The index's stored PQ codebooks, [sub][code][subDim]. */
  def readCodebooks(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Array[Array[Array[Float]]] =
    spark.read.parquet(s"$indexPath/codebooks")
      .orderBy("sub", "code").collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getSeq[Float](2).toArray).toArray
      }.toArray

  /** ANN over an [[ivfadcBuildIndex]] index — the three-stage probe
    * that actually serves at 1e9+ vectors:
    *   1. cells: each query ranks the broadcast centroids and probes
    *      its `nProbe` best — PARTITION PRUNING on the corpus scan
    *      (dynamic, from the broadcast probe side);
    *   2. ADC: within probed cells, asymmetric-distance cosine against
    *      the (id, codes) projection — COLUMN PRUNING keeps the scan
    *      at m ints/row, the embedding bytes stay on disk;
    *   3. rerank: the top `rerank` ADC candidates per query re-scored
    *      by EXACT cosine — the embedding scan is again cell-pruned
    *      (the shortlist carries its cell), and only |Q|·rerank full
    *      vectors are ever touched.
    * `rerank = 0` returns the raw ADC ranking. With `nProbe = nLists`
    * the result is row-identical to [[pqTopK]] under the stored
    * codebooks (LlmSpec pins it). */
  def ivfadcTopK(
      spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, indexPath: String, k: Int,
      nProbe: Int = 4, rerank: Int = 32): DataFrame = {
    val centroids = readCentroids(spark, indexPath)
    val cbs = readCodebooks(spark, indexPath)
    val idx = indexCorpus(spark, indexPath)
    val codesSide = idx.select(F.col("cell"),
      F.col("id").as("neighbor_id"), F.col("codes"))
    val q = queries.select(F.col("id").as("query_id"),
      F.col("embedding").as("q_emb"),
      F.explode(probeCells(centroids, nProbe)(F.col("embedding"))).as("cell"))
    val scored = codesSide.join(F.broadcast(q), Seq("cell"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .withColumn("pq_cosine", PqAdcCosine(F.col("q_emb"), F.col("codes"), cbs))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("pq_cosine").desc_nulls_last, F.col("neighbor_id").asc)
    val ranked = scored.withColumn("rnk", F.row_number().over(w))
    if (rerank <= 0)
      ranked.filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "pq_cosine", "rnk")
    else {
      val shortlist = ranked.filter(F.col("rnk") <= math.max(k, rerank))
        .select("query_id", "q_emb", "neighbor_id", "cell")
      val exact = idx.select(F.col("cell"), F.col("id").as("neighbor_id"),
          F.col("embedding").as("c_emb"))
        .join(F.broadcast(shortlist), Seq("cell", "neighbor_id"))
        .withColumn("cosine", CosineSim(F.col("q_emb"), F.col("c_emb")))
      val w2 = Window.partitionBy("query_id")
        .orderBy(F.col("cosine").desc_nulls_last, F.col("neighbor_id").asc)
      exact.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    }
  }

  /** Filesystem OF the index path (not the default FS) — an index on
    * s3a:// or abfs:// must have exists/rename/delete evaluated there. */
  private def fsFor(spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Coarse quantizer: spark-mllib k-means, fixed seed ⇒ reproducible.
    * The training frame is cached for the iterations — k-means rescans
    * its input once per iteration, and re-deriving it from the corpus
    * scan each time dominated the build (the one-off index cost all IVF
    * paths and SemDeDup share).
    *
    * Past `trainPerCell` (50) corpus points per cell, training runs on a
    * deterministic Bernoulli SUBSAMPLE of ~50·L points — the faiss
    * convention (a quantizer needs tens of points per cell, not the
    * corpus), and what keeps training cost O(L²·iters) ∝ n when
    * L = √n instead of O(n·L·iters) ∝ n^1.5. Below that size the full
    * corpus trains, so every verify-scale output (q118's pinned 16
    * cells on 500 vectors, the LlmSpec clone corpus) is bit-unchanged. */
  private val trainPerCell = 50L

  private def trainCentroids(
      corpus: DataFrame, nLists: Int, seed: Long,
      knownCount: Long = -1L): Array[Array[Float]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    if (nLists == 1) {
      // the k=1 k-means optimum IS the mean vector (mllib rejects k<2).
      // One cell ⇒ SemDeDup's exact mode: every item compared, no
      // cross-cell recall loss (q131's oracle-able configuration).
      val dim = corpus.select(F.size(F.col("embedding"))).first().getInt(0)
      val mean = corpus.agg(
        F.array((0 until dim).map(i =>
          F.avg(F.col("embedding").getItem(i))): _*).as("m"))
        .first().getSeq[Double](0)
      return Array(mean.map(_.toFloat).toArray)
    }
    val target = trainPerCell * nLists
    val n = if (knownCount >= 0) knownCount else corpus.count()
    val sampled =
      if (n > target) corpus.sample(target.toDouble / n, seed) else corpus
    val train = sampled.select(array_to_vector(F.col("embedding")).as("features"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try new KMeans().setK(nLists).setSeed(seed).setFeaturesCol("features")
      .fit(train).clusterCenters.map(_.toArray.map(_.toFloat))
    finally train.unpersist()
  }

  // Cell assignment / probe list as Column exprs over the broadcast
  // centroid literals — no mllib transform on the hot path. Assignment
  // (argmax only) is the fused [[graft.functions.NearestCell]]
  // expression: one loop, embedding norm computed once, centroid norms
  // precomputed — vs the flat array of per-centroid [[CosineSim]]
  // columns, which recomputed the embedding norm per centroid and
  // materialized an L-wide array per row just to argmax it. The probe
  // list genuinely needs the full per-cell ranking, so it keeps the
  // flat scores array (still codegen-safe: flat array children split
  // into codegen sub-methods, unlike an nLists-deep `when`-chain).
  private def scoresArr(centroids: Array[Array[Float]])(emb: Column): Column =
    F.array(centroids.toSeq.map(c => CosineSim(emb, F.typedlit(c.toSeq))): _*)

  /** argmax (ties → lowest cell id) + its score, one fused loop;
    * bit-identical to the flat-array formulation (LlmSpec pins it). */
  private def nearest(centroids: Array[Array[Float]])(emb: Column): Column =
    graft.functions.NearestCell(emb, centroids)

  private def bestCell(centroids: Array[Array[Float]])(emb: Column): Column =
    nearest(centroids)(emb).getField("cell")

  /** Cluster the (already tiny, driver-resident) centroid array into
    * `s` super-cells: seeded k-means++ then Lloyd iterations over the
    * UNIT-NORMALIZED centroids, so Euclidean assignment ≡ cosine
    * assignment — the same metric [[graft.functions.RoutedNearestCell]]
    * scores rows with. Plain deterministic Scala on the driver: L is at
    * most ~10⁵ (it is √n of the corpus), so L·s·iters flops is
    * microscopic next to one corpus scan, and keeping it off the
    * cluster avoids a second mllib job per index build. Returns
    * (superCentroids, member cell ids per super-cell); empty super-cells
    * keep empty member lists (the routing expression skips them). */
  private[graft] def clusterCentroids(
      centroids: Array[Array[Float]], s: Int, seed: Long,
      iters: Int = 15): (Array[Array[Float]], Array[Array[Int]]) = {
    val l = centroids.length
    val k = math.max(1, math.min(s, l))
    val dim = centroids.headOption.map(_.length).getOrElse(0)
    def normalize(v: Array[Float]): Array[Float] = {
      val n = graft.functions.RoutedNearestCell.norm(v)
      if (n == 0.0) v.clone() else v.map(x => (x / n).toFloat)
    }
    val unit = centroids.map(normalize)
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var j = 0
      val m = math.min(a.length, b.length)
      while (j < m) { val d = a(j).toDouble - b(j).toDouble; acc += d * d; j += 1 }
      acc
    }
    // k-means++ seeding, deterministic via the query seed
    val rnd = new scala.util.Random(seed)
    val seeds = scala.collection.mutable.ArrayBuffer(unit(rnd.nextInt(l)))
    while (seeds.length < k) {
      val dists = unit.map(u => seeds.map(d2(u, _)).min)
      val total = dists.sum
      if (total == 0.0) seeds += unit(rnd.nextInt(l))
      else {
        var pick = rnd.nextDouble() * total
        var i = 0
        while (i < l - 1 && pick > dists(i)) { pick -= dists(i); i += 1 }
        seeds += unit(i)
      }
    }
    var centers = seeds.toArray.map(_.clone())
    var assign = new Array[Int](l)
    for (_ <- 0 until iters) {
      var i = 0
      while (i < l) {
        var best = Double.MaxValue; var bi = 0; var c = 0
        while (c < k) {
          val d = d2(unit(i), centers(c))
          if (d < best) { best = d; bi = c }
          c += 1
        }
        assign(i) = bi
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      i = 0
      while (i < l) {
        val c = assign(i); counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += unit(i)(j); j += 1 }
        i += 1
      }
      centers = Array.tabulate(k) { c =>
        if (counts(c) == 0) centers(c) // empty cluster keeps its center
        else sums(c).map(x => (x / counts(c)).toFloat)
      }
    }
    val members = Array.fill(k)(scala.collection.mutable.ArrayBuffer.empty[Int])
    assign.zipWithIndex.foreach { case (c, i) => members(c) += i }
    (centers, members.map(_.toArray))
  }

  /** Routed assignment column over a trained centroid set — the
    * hierarchical mode of [[nearest]]: `superCells` coarse cells
    * (√L by default), `superProbe` of them scanned per row. */
  private def routedNearest(
      centroids: Array[Array[Float]], superCells: Int, superProbe: Int,
      seed: Long)(emb: Column): Column = {
    val s = if (superCells > 0) superCells
      else math.max(1, math.round(math.sqrt(centroids.length.toDouble)).toInt)
    val (supers, members) = clusterCentroids(centroids, s, seed)
    graft.functions.RoutedNearestCell(emb, centroids, supers, members, superProbe)
  }

  /** nProbe cells per query: rank centroids by score, keep the top ids. */
  private def probeCells(centroids: Array[Array[Float]], nProbe: Int)(
      emb: Column): Column = {
    val ranked = F.zip_with(
      scoresArr(centroids)(emb), F.sequence(F.lit(0), F.lit(centroids.length - 1)),
      (s, i) => F.struct((-s).as("neg"), i.as("cell")))
    F.slice(F.transform(F.array_sort(ranked), x => x.getField("cell")), 1, nProbe)
  }

  /** Shared probe tail: broadcast the exploded probe side, exact cosine
    * within probed cells, per-query top-k window. */
  private def probeAndRerank(
      cellCorpus: DataFrame, queries: DataFrame,
      centroids: Array[Array[Float]], k: Int, nProbe: Int): DataFrame = {
    val q = queries.select(F.col("id").as("query_id"),
        F.col("embedding").as("q_emb"),
        F.explode(probeCells(centroids, nProbe)(F.col("embedding"))).as("cell"))
    val scored = cellCorpus.join(F.broadcast(q), Seq("cell"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .withColumn("cosine", CosineSim(F.col("q_emb"), F.col("c_emb")))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("cosine").desc_nulls_last, F.col("neighbor_id").asc)
    scored.withColumn("rnk", F.row_number().over(w))
      .filter(F.col("rnk") <= k)
      .select("query_id", "neighbor_id", "cosine", "rnk")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering then within-cluster cosine. The scale
    * answer to "near-dup over 100 TB of embeddings": k-means partitions
    * the corpus into `nLists` cells, and ONLY cluster-mates are ever
    * compared — pair work is Σ|cell|², bounded by the max cell size,
    * never corpus². Within a cell, items are ranked ascending by
    * similarity-to-centroid (the paper keeps the LOW-centroid-similarity
    * representative, retaining diversity) with id as tie-break; an item
    * is DROPPED iff any better-ranked cluster-mate has cosine ≥
    * `threshold` with it (one-pass deterministic form of the paper's
    * keep-one-per-group rule — a dup of a dropped dup still drops).
    * Cross-cluster duplicates are the accepted recall loss, exactly as
    * in the paper.
    *
    * `nLists = 0` (the default) picks √n cells from one cheap corpus
    * `count()` — the optimum of the single-level IVF cost trade
    * (assignment ∝ n·L vs pair work ∝ n²/L meet at L = √n), giving
    * Θ(n^1.5) total. Any FIXED cell count leaves pair work ∝ n²/L —
    * the scaling gate measured the old fixed-16 default at e = 2.24
    * (3 s → 101 s over 2k → 16k vectors), the textbook quadratic this
    * operator exists to avoid. Explicit `nLists` remains for
    * oracle-deterministic replays (q118's invariant gate, q131's
    * nLists=1 exact mode).
    *
    * `superProbe > 0` switches assignment to HIERARCHICAL cell routing
    * ([[graft.functions.RoutedNearestCell]]): the L centroids are
    * clustered into √L super-cells on the driver and each row scores
    * only the members of its `superProbe` best super-cells — ~√L +
    * probe·√L cosines per row instead of L, taking assignment from
    * Θ(n^1.5) to Θ(n^1.25). This is the sub-n^1.5 swap point for
    * ≥10⁸-vector corpora; it is APPROXIMATE (a row whose true cell
    * lives in an unprobed super-cell lands in a neighboring cell —
    * the same recall trade as faiss's coarse quantizer), so it stays
    * opt-in. `superProbe` ≥ the super-cell count degenerates to the
    * exhaustive scan, bit-equal to the default (LlmSpec pins it).
    *
    * Output: (id, cell, centroid_sim, dropped) — one row per corpus
    * item. Plan: one shuffle by cell (window + self-join share it),
    * centroids broadcast as literals.
    */
  def semanticDedup(
      corpus: DataFrame, threshold: Double,
      nLists: Int = 0, seed: Long = 7L, superProbe: Int = 0): DataFrame = {
    val n = if (nLists > 0) -1L else corpus.count()
    val lists =
      if (nLists > 0) nLists
      else math.max(1, math.round(math.sqrt(n.toDouble)).toInt)
    val centroids = trainCentroids(corpus, lists, seed, knownCount = n)
    val nc =
      if (superProbe > 0) routedNearest(centroids, 0, superProbe, seed)(F.col("embedding"))
      else nearest(centroids)(F.col("embedding"))
    val cells = corpus.select(F.col("id"), F.col("embedding"),
      nc.getField("cell").as("cell"),
      F.round(nc.getField("sim"), 6).as("centroid_sim"))
    val w = Window.partitionBy("cell")
      .orderBy(F.col("centroid_sim").asc, F.col("id").asc)
    val ranked = cells.withColumn("rnk", F.row_number().over(w))
    val a = ranked.select(F.col("cell"), F.col("embedding").as("a_emb"),
      F.col("rnk").as("a_rnk"))
    val b = ranked.select(F.col("cell"), F.col("id").as("b_id"),
      F.col("embedding").as("b_emb"), F.col("rnk").as("b_rnk"))
    val drops = a.join(b, "cell")
      .filter(F.col("a_rnk") < F.col("b_rnk"))
      .filter(CosineSim(F.col("a_emb"), F.col("b_emb")) >= threshold)
      .select(F.col("b_id").as("id")).distinct()
    ranked.join(drops.withColumn("__d", F.lit(true)), Seq("id"), "left")
      .select(F.col("id"), F.col("cell"), F.col("centroid_sim"),
        F.coalesce(F.col("__d"), F.lit(false)).as("dropped"))
  }

  /** [[semanticDedup]] as a PLAN-BACKED cube metric
    * ([[graft.model.Metric]] `planBuild` contract): per slice group, the
    * count of corpus items SURVIVING semantic deduplication. The dedup
    * itself is global — k-means cells and within-cell drops are computed
    * over the whole (pred-filtered) corpus, exactly as the library call
    * — and survivors are then attributed back to their group, so sliced
    * survivor counts sum to the flat one. Same group contract as
    * [[graft.operators.Funnel.sequenceTotalPlan]]: one row for EVERY
    * group present in `df`; a group whose items all drop (or that pred
    * removes entirely) gets 0, never null.
    *
    * Note the centroid training runs AT PLAN BUILD (k-means is
    * iterative): this metric materializes an index the way the IVF path
    * does, a deliberate cost paid once per query shape. */
  def semanticSurvivorsPlan(
      df: DataFrame,
      groupCols: Seq[(String, Column)],
      id: Column, emb: Column,
      threshold: Double, nLists: Int, seed: Long,
      pred: Option[Column],
      outKey: String = "__pb_value"): DataFrame = {
    graft.operators.PlanBacked.groupContract(df, groupCols, pred, outKey) { (vals, keyed) =>
      val corpus = vals.select(id.as("id"), emb.as("embedding"))
      // a pred matching nothing must still honor the group contract (all
      // groups, 0 survivors) — and centroid training needs >= 1 vector
      val survivors =
        if (corpus.isEmpty) corpus.select("id").limit(0)
        else semanticDedup(corpus, threshold, nLists, seed)
          .filter(!F.col("dropped")).select("id")
      vals.select((keyed.map { case (n, c) => c.as(n) } :+ id.as("id")): _*)
        .join(survivors, "id")
        .groupBy(keyed.map { case (n, _) => F.col(n) }: _*)
        .agg(F.count(F.lit(1)).as(outKey))
    }(_ => F.lit(0L))
  }

  /** Exact embedding near-duplicate pairs: full pairwise cosine ≥
    * threshold. The verifier / small-corpus path; [[cosineNearDupPairs]]
    * is the LSH-bucketed scale path.
    *
    * Why all-pairs is DELIBERATE here: the only exact pruning for dense
    * vectors is the projection bound |â·u − b̂·u| ≤ √(2(1−τ)) — at
    * τ = 0.45 the window is ±1.05 while unit-vector projections on
    * 64 dims have σ ≈ 1/√64 = 0.125, so the bound excludes nothing
    * (it only bites above τ ≈ 0.99). There is no exact sub-quadratic
    * plan at this threshold; anything cheaper trades recall, which is
    * exactly what the LSH path does — with its recall proven against
    * THIS operator (q77 subset invariant, LlmSpec). */
  def cosineNearDupPairsExact(df: DataFrame, threshold: Double): DataFrame = {
    val a = df.select(F.col("id").as("a_id"), F.col("embedding").as("a_emb"))
    val b = df.select(F.col("id").as("b_id"), F.col("embedding").as("b_emb"))
    a.join(b, F.col("a_id") < F.col("b_id"))
      .withColumn("cosine", CosineSim(F.col("a_emb"), F.col("b_emb")))
      .filter(F.col("cosine") >= threshold)
      .select("a_id", "b_id", "cosine")
  }

  /** Occupancy-adaptive signature width: enough bits that the expected
    * bucket holds ~`targetBucket` vectors, so within-bucket candidate
    * work stays ~n·targetBucket·nTables/2 — LINEAR in corpus size. Any
    * FIXED width has a fixed bucket count, and within-bucket all-pairs
    * then grows ∝ n²/2^bits: measurably super-linear in the scaling
    * gate (q59 fitted e=1.42 over 632→2000 rows at the old fixed 4
    * bits) and fatal at real corpus sizes. Clamped to [4, 40]: ≥4 keeps
    * the sf-fixture outputs identical to the historical fixed width at
    * n ≤ ~750 (the verify corpora), ≤40 fits the packed long with
    * headroom for any conceivable corpus. */
  private[graft] def adaptiveBits(n: Long, targetBucket: Int): Int = {
    require(n > 0 && targetBucket > 0)
    val ideal = math.round(
      math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt
    math.max(4, math.min(40, ideal))
  }

  /** Embedding near-duplicate pairs: all pairs sharing ANY of `nTables`
    * LSH buckets, exact-cosine verified against the threshold. The dedup
    * counterpart of [[lshTopK]], multi-table like it: a single wide
    * signature has per-pair recall (1−θ/π)^nBits — ~3% for borderline
    * pairs at threshold 0.45 — so one table is corpus-luck, not an
    * operator guarantee. Every candidate is exact-verified, so precision
    * is 1 regardless of tuning. Shuffle ∝ corpus × nTables, never n².
    *
    * `nBits = 0` (the default) sizes the signature by [[adaptiveBits]]
    * from one cheap `count()` of the corpus (parquet footer metadata at
    * scan time) — the scale-safe mode; pass an explicit width only for
    * reproducing a fixed historical bucketing. Recall falls as the
    * width grows — at the 0.9-cosine near-dup design point p = 1−θ/π ≈
    * 0.856, so 8 tables miss a pair with (1−p^bits)^8: ~2% at 6 bits,
    * ~7% at 8, ~15% at 10. Holding recall at larger corpora means
    * growing `nTables` ∝ (1/p)^Δbits ≈ 1.17^Δbits — the classic
    * n^(1+ρ) LSH trade, still far below n² and caller-tunable here. */
  def cosineNearDupPairs(
      df: DataFrame, threshold: Double,
      dim: Int, nBits: Int = 0, nTables: Int = 8, seed: Long = 7L,
      targetBucket: Int = 32): DataFrame = {
    val bits = if (nBits > 0) nBits else adaptiveBits(df.count(), targetBucket)
    val tableKeys = (0 until nTables).map { t =>
      F.struct(F.lit(t).as("t"),
        signature(F.col("embedding"), dim, bits, seed + t * 7919L).as("sig"))
    }
    val withSig = df.select(F.col("id"), F.col("embedding"),
      F.explode(F.array(tableKeys: _*)).as("bucket"))
    val a = withSig.select(F.col("id").as("a_id"), F.col("bucket"))
    val b = withSig.select(F.col("id").as("b_id"), F.col("bucket"))
    a.join(b, Seq("bucket")).filter(F.col("a_id") < F.col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
      .join(df.select(F.col("id").as("a_id"), F.col("embedding").as("a_emb")), "a_id")
      .join(df.select(F.col("id").as("b_id"), F.col("embedding").as("b_emb")), "b_id")
      .withColumn("cosine", CosineSim(F.col("a_emb"), F.col("b_emb")))
      .filter(F.col("cosine") >= threshold)
      .select("a_id", "b_id", "cosine")
  }

  /** Plain L2 Lloyd's k-means on driver-resident points (PQ sub-vector
    * codebook training — unlike [[clusterCentroids]] this must NOT
    * unit-normalize: PQ reconstructs raw sub-vectors, so the codebook
    * lives in the raw space). Deterministic: seeded k-means++ then
    * fixed iterations; empty clusters keep their center. */
  private def lloydL2(points: Array[Array[Float]], k: Int, seed: Long,
      iters: Int = 15): Array[Array[Float]] = {
    val l = points.length
    val kk = math.max(1, math.min(k, l))
    val dim = points(0).length
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var j = 0
      while (j < dim) { val x = a(j).toDouble - b(j).toDouble; s += x * x; j += 1 }
      s
    }
    val rnd = new scala.util.Random(seed)
    val seeds = scala.collection.mutable.ArrayBuffer(points(rnd.nextInt(l)))
    while (seeds.length < kk) {
      val dists = points.map(p => seeds.map(c => d2(p, c)).min)
      val total = dists.sum
      if (total == 0.0) seeds += points(rnd.nextInt(l))
      else {
        var pick = rnd.nextDouble() * total
        var i = 0
        while (i < l - 1 && pick > dists(i)) { pick -= dists(i); i += 1 }
        seeds += points(i)
      }
    }
    var centers = seeds.toArray.map(_.clone())
    val assign = new Array[Int](l)
    for (_ <- 0 until iters) {
      var i = 0
      while (i < l) {
        var best = Double.MaxValue; var bi = 0; var c = 0
        while (c < kk) {
          val d = d2(points(i), centers(c))
          if (d < best) { best = d; bi = c }
          c += 1
        }
        assign(i) = bi
        i += 1
      }
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      i = 0
      while (i < l) {
        val c = assign(i); counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += points(i)(j); j += 1 }
        i += 1
      }
      centers = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centers(c)
        else sums(c).map(x => (x / counts(c)).toFloat)
      }
    }
    centers
  }

  /** Train product-quantization codebooks on a driver-side sample:
    * split each sampled vector into `m` sub-vectors of dim/m, run a
    * small L2 k-means per subspace. Returns codebooks[m][ksub][subDim].
    * The sample (default ≤ 50·ksub vectors) is the same driver-resident
    * training discipline as [[trainCentroids]]; at any corpus size the
    * collect is bounded by `sampleN`, never the corpus. */
  def pqTrain(corpus: DataFrame, m: Int, ksub: Int = 16,
      seed: Long = 7L, sampleN: Int = 0): Array[Array[Array[Float]]] = {
    val target = if (sampleN > 0) sampleN.toLong else 50L * ksub
    val n = corpus.count()
    val sampled =
      if (n > target) corpus.sample(target.toDouble / n, seed) else corpus
    val vecs = sampled.select(F.col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    require(vecs.nonEmpty, "pqTrain: empty corpus")
    val dim = vecs(0).length
    require(dim % m == 0, s"pqTrain: dim $dim not divisible by m=$m")
    val subDim = dim / m
    Array.tabulate(m) { s =>
      val sub = vecs.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      lloydL2(sub, ksub, seed + s)
    }
  }

  /** Product-quantized ANN: corpus compressed to M small ints per
    * vector ([[graft.functions.PqEncode]] — dim·4 bytes → M bytes, the
    * 16–32× scan-bandwidth/memory lever that lets a 100 TB embedding
    * corpus serve from a few TB of codes), queries scored against the
    * codes by asymmetric-distance cosine
    * ([[graft.functions.PqAdcCosine]]), then — the standard PQ
    * short-list discipline — the top `rerank` ADC candidates re-ranked
    * by EXACT cosine against the full vectors. `rerank = 0` returns the
    * raw ADC ranking (pure compressed-domain search).
    *
    * Plan shape mirrors [[bruteForceTopK]]: broadcast query side over a
    * map-only corpus scan (of the CODES, not the vectors), per-query
    * window top-k; the rerank join touches only |Q|·rerank full
    * vectors. Composable with IVF (encode within cells) when the scan
    * itself must shrink, not just its bandwidth. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 16, rerank: Int = 0, seed: Long = 7L,
      codebooks: Array[Array[Array[Float]]] = null): DataFrame = {
    val cbs = if (codebooks != null) codebooks else pqTrain(corpus, m, ksub, seed)
    val enc = corpus.select(F.col("id").as("neighbor_id"),
      PqEncode(F.col("embedding"), cbs).as("codes"))
    val q = queries.select(F.col("id").as("query_id"),
      F.col("embedding").as("q_emb"))
    val scored = enc.crossJoin(F.broadcast(q))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .withColumn("pq_cosine", PqAdcCosine(F.col("q_emb"), F.col("codes"), cbs))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("pq_cosine").desc_nulls_last, F.col("neighbor_id").asc)
    val ranked = scored.withColumn("rnk", F.row_number().over(w))
    if (rerank <= 0)
      ranked.filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "pq_cosine", "rnk")
    else {
      val shortlist = ranked.filter(F.col("rnk") <= math.max(k, rerank))
        .select("query_id", "q_emb", "neighbor_id")
      val exact = corpus.select(F.col("id").as("neighbor_id"),
          F.col("embedding").as("c_emb"))
        .join(F.broadcast(shortlist), "neighbor_id")
        .withColumn("cosine", CosineSim(F.col("q_emb"), F.col("c_emb")))
      val w2 = Window.partitionBy("query_id")
        .orderBy(F.col("cosine").desc_nulls_last, F.col("neighbor_id").asc)
      exact.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    }
  }
}
