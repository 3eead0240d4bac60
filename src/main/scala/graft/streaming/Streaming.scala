package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Structured-Streaming operators over the events table (SURVEY §2.4
  * Streaming: absent in the reference; added per the north star).
  *
  * Every transform below is **mode-agnostic**: the same function compiles
  * against a batch DataFrame (DuckDB-verified via EventQueries) and a
  * `readStream` DataFrame (exercised with watermarks + memory sink in
  * StreamingSpec). That is the Spark-native way to keep batch backfill
  * and live streams on one code path.
  *
  * Timestamps are emitted as epoch millis: the fixture's ns-precision
  * timestamps truncate to µs in Spark but stay ns in DuckDB — millis is
  * the common grain both agree on.
  */
object Streaming {

  /** Streaming read of the events fixture (schema pinned from the batch
    * read — required for file streams). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // FileStreamSource takes a directory; glob-filter to the events table
    graft.cubes.Tables.normalizeEventTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** The documents table as a stream — ingestion-time screening (dedup /
    * decontamination on arriving docs) runs the same operators as batch. */
  def documentsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
  }

  /** The embeddings table as a stream — live ANN-index maintenance
    * ([[maintainIvfIndex]]) ingests from here. */
  def embeddingsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
  }

  /** Live rollup maintenance — the AggregatingMergeTree pattern as a
    * Structured Streaming job: arriving events aggregate into the daily
    * sketch cells ([[graft.cubes.Cubes.dailySketchCells]]) in UPDATE
    * mode, and each micro-batch upserts its CHANGED cells into a parquet
    * cell table partitioned by (day, event_type) — dynamic partition
    * overwrite rewrites exactly the touched cells, so the serving table
    * stays queryable throughout and refreshes are partition-local, never
    * a full-table rebuild. Serve it through optimal-source selection via
    * `Cubes.eventsCubeWithSketchRollup(s, cat, Some(read))`.
    * `lateness` bounds the aggregation state: when set, a watermark of
    * that horizon is applied on `ts` INSIDE the operator, so (day,
    * event_type) state older than the horizon is evicted — the
    * production configuration for a continuous stream. `None` (tests /
    * bounded replays) keeps every day's state: tiny cells, but unbounded
    * days, so don't run `None` on an unbounded source.
    */
  def maintainSketchRollup(events: DataFrame, outDir: String,
      checkpoint: String,
      lateness: Option[String] = Some("1 day"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.cubes.Cubes.dailySketchCells(
        lateness.fold(events)(l => events.withWatermark("ts", l)))
      .writeStream.outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // writer-scoped dynamic overwrite: overrides the session conf for
        // THIS write only — no session-global mutation for concurrent
        // queries to observe, nothing to leak on a crash mid-batch
        batch.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("day", "event_type").parquet(outDir)
      }
      .start()

  private def ms(c: Column): Column = F.unix_millis(c)

  /** Tumbling 1-hour windows per event type. */
  def tumblingCounts(events: DataFrame, window: String = "1 hour"): DataFrame =
    events
      .groupBy(F.window(F.col("ts"), window).as("win"), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("cnt"), F.round(F.sum("value"), 2).as("sum_value"))
      .select(ms(F.col("win.start")).as("win_start"), ms(F.col("win.end")).as("win_end"),
        F.col("event_type"), F.col("cnt"), F.col("sum_value"))

  /** Sliding windows (length / slide) per event type. */
  def slidingCounts(events: DataFrame, window: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(F.window(F.col("ts"), window, slide).as("win"), F.col("event_type"))
      .agg(F.count(F.lit(1)).as("cnt"))
      .select(ms(F.col("win.start")).as("win_start"), ms(F.col("win.end")).as("win_end"),
        F.col("event_type"), F.col("cnt"))

  /** Session windows per user: gap-based (session extends while the next
    * event arrives within `gap` of the previous one; end = last + gap). */
  def sessionAggs(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(F.session_window(F.col("ts"), gap).as("win"), F.col("user_id"))
      .agg(F.count(F.lit(1)).as("n_events"), F.round(F.sum("value"), 2).as("sum_value"))
      .select(F.col("user_id"), ms(F.col("win.start")).as("session_start"),
        ms(F.col("win.end")).as("session_end"), F.col("n_events"), F.col("sum_value"))

  /** JSON payload extraction + filter + windowed agg — the "parse the
    * props column" pipeline stage. */
  def propsExtract(events: DataFrame): DataFrame =
    events
      .withColumn("k", F.get_json_object(F.col("props"), "$.k").cast("long"))
      .filter(F.col("k") > 50)
      .groupBy(F.col("event_type"))
      .agg(F.count(F.lit(1)).as("cnt"), F.sum("k").as("sum_k"),
        F.round(F.avg("k"), 4).as("avg_k"))

  /** Streaming exactly-once dedup by event_id within the watermark. On a
    * batch frame dropDuplicates is plain distinct-by-key — same semantics,
    * bounded state in the stream case. */
  def dedupedEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Watermarked tumbling aggregation — the canonical streaming shape
    * (append mode emits a window once the watermark passes its end). */
  def watermarkedTumbling(events: DataFrame, watermark: String = "10 minutes",
      window: String = "1 hour"): DataFrame =
    tumblingCounts(events.withWatermark("ts", watermark), window)

  /** Stream-stream interval join: each purchase joined to signups of the
    * same user within the preceding hour. Watermarks on BOTH sides bound
    * the join state (Spark drops buffered rows once the watermark passes
    * the interval). The same function joins two batch frames identically.
    */
  def purchasesWithRecentSignup(events: DataFrame): DataFrame = {
    val isStream = events.isStreaming
    def side(t: String, prefix: String): DataFrame = {
      val f = events.filter(F.col("event_type") === t).select(
        F.col("user_id").as(s"${prefix}_user"), F.col("ts").as(s"${prefix}_ts"),
        F.col("event_id").as(s"${prefix}_id"))
      if (isStream) f.withWatermark(s"${prefix}_ts", "30 minutes") else f
    }
    side("purchase", "p").join(side("signup", "s"),
      F.col("p_user") === F.col("s_user") &&
        F.col("s_ts") <= F.col("p_ts") &&
        F.col("s_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
      .select(F.col("p_user").as("user_id"), F.col("p_id").as("purchase_id"),
        F.col("s_id").as("signup_id"),
        F.unix_millis(F.col("p_ts")).as("purchase_ms"),
        F.unix_millis(F.col("s_ts")).as("signup_ms"))
  }

  // ---- sinks (beyond the test-only memory sink) --------------------

  /** Append-mode parquet sink. Exactly-once comes from the checkpoint +
    * the file sink's `_spark_metadata` transaction log: a restarted
    * query resumes from the checkpoint and readers only see committed
    * files. The 100 TB default for landing a stream in the lakehouse. */
  def toParquetSink(df: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** Idempotent per-micro-batch JDBC writer: stamps the batch id and
    * DELETE-then-INSERTs, so a replayed batch (restart after a partial
    * failure) overwrites its own rows instead of duplicating — the
    * standard exactly-once `foreachBatch` pattern over a transactional
    * warehouse (the reference's pushes into ClickHouse are the same
    * shape). Exposed separately from [[toJdbcSink]] so idempotency is
    * directly testable. */
  def jdbcBatchWriter(url: String, table: String,
      options: Map[String, String] = Map.empty): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      options.get("driver").foreach(Class.forName)
      // the DELETE connection must authenticate exactly like the Spark
      // append: user/password (and any driver flags) arrive via options
      val conn = java.sql.DriverManager.getConnection(
        url, connectionProperties(options))
      try {
        val rs = conn.getMetaData.getTables(null, null, null, null)
        var exists = false
        while (rs.next() && !exists)
          exists = rs.getString("TABLE_NAME").equalsIgnoreCase(table)
        if (exists) {
          val st = conn.createStatement()
          try st.executeUpdate(deleteStatement(url, table, batchId))
          finally st.close()
        }
      } finally conn.close()
      val writer = batch.withColumn("__batch_id", F.lit(batchId))
        .write.mode("append").format("jdbc")
        .option("url", url).option("dbtable", table)
      options.foldLeft(writer) { case (w, (k, v)) => w.option(k, v) }.save()
  }

  /** Connection properties for the idempotency DELETE, mirroring Spark's
    * own JDBC option handling: every option that isn't a Spark-side knob
    * is a driver property (user, password, ssl flags, ...). */
  private[graft] def connectionProperties(
      options: Map[String, String]): java.util.Properties = {
    val sparkSide = Set("url", "dbtable", "driver", "numpartitions",
      "batchsize", "isolationlevel", "truncate", "createtableoptions",
      "createtablecolumntypes", "query", "partitioncolumn",
      "lowerbound", "upperbound", "fetchsize")
    val p = new java.util.Properties()
    options.foreach { case (k, v) =>
      if (!sparkSide.contains(k.toLowerCase(java.util.Locale.ROOT))) p.setProperty(k, v)
    }
    p
  }

  /** The per-batch idempotency DELETE, with the batch-id column quoted by
    * the warehouse's own JDBC dialect (ANSI double quotes are a syntax
    * error on default-mode MySQL; backticks are one on Derby/Postgres). */
  private[graft] def deleteStatement(url: String, table: String,
      batchId: Long): String = {
    val col = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
      .quoteIdentifier("__batch_id")
    s"DELETE FROM $table WHERE $col = $batchId"
  }

  /** Stream → JDBC warehouse via the idempotent batch writer. */
  def toJdbcSink(df: DataFrame, url: String, table: String, checkpoint: String,
      options: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch(jdbcBatchWriter(url, table, options))
      .start()

  /** LIVE IVF-index maintenance: arriving (id, embedding) rows are
    * assigned to their nearest cell under the index's STORED centroids
    * (row-local [[graft.functions.NearestCell]], no shuffle) and each
    * micro-batch lands as `delta/batch=<id>/` partitioned by cell — an
    * idempotent per-batch overwrite, so a replayed batch after a crash
    * rewrites its own delta instead of duplicating rows.
    * [[graft.llm.Similarity.ivfTopKIndexed]] serves base+deltas with
    * cell pruning intact; [[graft.llm.Similarity.ivfCompactIndex]] folds
    * deltas into the base offline. Centroids stay fixed between
    * retrains (the faiss operating model): quantizer drift under a
    * shifting embedding distribution degrades recall gradually, not
    * correctness — the periodic batch rebuild is the retrain path. */
  def maintainIvfIndex(arrivals: DataFrame, indexPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    maintainIndexDeltas(arrivals, indexPath, checkpoint, pqEncode = false)

  /** The shared delta-maintenance stream behind [[maintainIvfIndex]]
    * and [[maintainIvfAdcIndex]]: cell-assign under the stored
    * centroids, optionally PQ-encode under the stored codebooks, land
    * each micro-batch as an idempotent `delta/batch=<id>/` overwrite
    * partitioned by cell — ONE place owns the delta layout the serve
    * and compaction paths depend on. */
  private def maintainIndexDeltas(arrivals: DataFrame, indexPath: String,
      checkpoint: String, pqEncode: Boolean)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = arrivals.sparkSession
    val centroids = graft.llm.Similarity.readCentroids(spark, indexPath)
    val assigned = graft.llm.Similarity.assignCells(arrivals, centroids)
    val encoded =
      if (pqEncode) assigned.withColumn("codes", graft.functions.PqEncode(
        F.col("embedding"), graft.llm.Similarity.readCodebooks(spark, indexPath)))
      else assigned
    encoded.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // lineage guard: batch ids are only meaningful within one
        // checkpoint lineage. An id BELOW the compaction fence can only
        // come from a wiped checkpoint recycling ids — landing it would
        // leave the rows invisible (the serve path excludes folded ids)
        // and the next compaction would refuse; fail here, at the
        // source. An id EQUAL to the fence is the legitimate
        // crash-replay of the last folded batch — its idempotent
        // overwrite recreates a leftover the next compaction
        // fingerprint-verifies and reclaims.
        val (fence, _) = graft.llm.Similarity.foldedState(
          batch.sparkSession, s"$indexPath/corpus")
        if (batchId < fence) sys.error(
          s"index maintenance: batch id $batchId is below the index's " +
            s"folded high-water $fence — this stream's checkpoint was " +
            "wiped (or a second stream is feeding the index). Resume the " +
            "original checkpoint, or rebuild the index before attaching " +
            "a new stream.")
        batch.write.mode("overwrite").partitionBy("cell")
          .parquet(s"$indexPath/delta/batch=$batchId")
      }
      .start()
  }

  /** Ingestion-time near-dup screening of a documents STREAM against a
    * precomputed corpus band index — the arrival gate of a training-data
    * pipeline: every arriving doc is checked for a ≥ `threshold` Jaccard
    * match in the historical corpus before it is admitted. Runs
    * [[graft.llm.Dedup.nearDupScreen]] on each micro-batch INSIDE
    * `foreachBatch`, so the per-doc argmax is a plain batch aggregation
    * that lives and dies with its micro-batch — the job holds ZERO
    * streaming state (as a streaming `groupBy` the argmax would retain
    * per-doc_id state forever without a watermark, growing with every
    * doc ever screened). A doc's verdict depends only on the doc and the
    * static corpus, never on other arrivals, so the union of per-batch
    * verdicts EQUALS the one-shot batch screen (StreamingSpec asserts
    * it). Verdict rows land as `outDir/batch=<id>/` parquet — an
    * idempotent per-batch overwrite, safe under micro-batch replay.
    * `index`/`corpusSh` are [[graft.llm.Dedup.bandIndex]] / `(id, sh)`
    * frames, in production read from their materialized parquet. */
  def screenArrivals(docs: DataFrame, index: DataFrame, corpusSh: DataFrame,
      outDir: String, checkpoint: String, threshold: Double = 0.8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llm.Dedup.nearDupScreen(batch, F.col("doc_id"), F.col("text"),
            index, corpusSh, threshold = threshold)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()

  /** LIVE IVFADC-index maintenance — [[maintainIvfIndex]] for the
    * compressed index: arriving (id, embedding) rows are cell-assigned
    * under the STORED centroids AND PQ-encoded under the STORED
    * codebooks (both row-local — an arrival gets exactly the cell and
    * codes a full rebuild would give it), landing as idempotent
    * `delta/batch=<id>/` overwrites partitioned by cell.
    * [[graft.llm.Similarity.ivfadcTopK]] serves base+deltas with cell
    * pruning and the compressed scan intact (deltas carry their codes);
    * [[graft.llm.Similarity.ivfCompactIndex]] folds deltas into the
    * next manifest snapshot unchanged — the folded frame simply keeps
    * its codes column. Codebook drift under a shifting distribution is
    * the same gradual-recall story as centroid drift: the periodic
    * batch rebuild is the retrain path. */
  def maintainIvfAdcIndex(arrivals: DataFrame, indexPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    maintainIndexDeltas(arrivals, indexPath, checkpoint, pqEncode = true)

  /** [[screenArrivals]] WITH live index maintenance — the gate's
    * feedback loop closed: each micro-batch screens against the base
    * band index PLUS every previously-admitted arrival's bands
    * ([[graft.llm.Dedup.readBandIndexStore]]), and the batch's ADMITTED
    * (novel) docs append their own bands and shingles as delta batches
    * — the [[maintainIvfIndex]] delta discipline applied to the
    * near-dup screen, so a duplicate of an admitted arrival is caught
    * from the next micro-batch on. Verdicts land as
    * `outDir/batch=<id>`; fold deltas into the base offline by
    * rebuilding the store over the grown corpus (the spec proves the
    * grown store serves identically to a rebuild).
    *
    * IDEMPOTENT under replay: a batch reads the store EXCLUDING its
    * own batch id (a crashed attempt's half-written delta must not
    * make the retry screen docs against themselves) and overwrites its
    * own verdict and delta dirs. Intra-batch duplicates are screened
    * against the store as of batch start, not against each other —
    * the standard bounded staleness of an ingestion gate; both copies
    * admit, and any LATER copy is caught. */
  def screenAndMaintain(docs: DataFrame, indexPath: String, outDir: String,
      checkpoint: String, shingleK: Int = 3, numHashes: Int = 32,
      bands: Int = 16, threshold: Double = 0.8, seed: Long = 1234L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (bandsDf, shDf) = graft.llm.Dedup.readBandIndexStore(
          spark, indexPath, excludeBatch = Some(batchId))
        val verdicts = graft.llm.Dedup.nearDupScreen(
          batch, F.col("doc_id"), F.col("text"),
          bandsDf, shDf, shingleK, numHashes, bands, threshold, seed)
          .persist()
        try {
          verdicts.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          val admitted = batch.join(
            verdicts.select("doc_id"), Seq("doc_id"), "left_anti")
          graft.llm.Dedup.bandIndex(admitted, F.col("doc_id"), F.col("text"),
              shingleK, numHashes, bands, seed)
            .write.mode("overwrite")
            .parquet(s"$indexPath/bands_delta/batch=$batchId")
          graft.llm.Dedup.shingleDocs(admitted, F.col("doc_id"), F.col("text"),
              shingleK)
            .write.mode("overwrite")
            .parquet(s"$indexPath/shingles_delta/batch=$batchId")
        } finally verdicts.unpersist()
      }
      .start()
  }

  /** LIVE benchmark decontamination — the second ingestion gate beside
    * [[screenArrivals]]: arriving docs sharing ≥ `minHits` word n-grams
    * with the (static, broadcast) benchmark set are dropped; survivors
    * land as `outDir/batch=<id>/` parquet, an idempotent per-batch
    * overwrite. Runs [[graft.llm.Decontaminate.decontaminated]] on each
    * micro-batch inside `foreachBatch`: a doc's contamination verdict
    * depends only on the doc and the benchmark — never on other
    * training docs — so the union of per-batch keep-lists EQUALS the
    * one-shot batch keep-list over the same corpus (the spec asserts
    * it), and the training side still never shuffles. */
  def decontaminateArrivals(docs: DataFrame, bench: DataFrame,
      outDir: String, checkpoint: String,
      n: Int = 4, minHits: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llm.Decontaminate.decontaminated(
            batch, F.col("doc_id"), F.col("text"),
            bench, F.col("doc_id"), F.col("text"), n, minHits)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()

  /** LIVE exact-dup screening — arrivals tested against the HISTORICAL
    * corpus without ever joining it: the static side is its Bloom
    * filter + fingerprint table ([[graft.llm.Dedup.historyBloom]]),
    * both materialized once and appended per landed batch in
    * production. Verdicts are per-doc (batch-local argmax-free), so
    * per-batch outputs trivially union to the one-shot screen; no
    * streaming state, no watermark. */
  def screenExactArrivals(docs: DataFrame, bloom: DataFrame,
      historyFps: DataFrame, outDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llm.Dedup.bloomExactScreen(batch,
            F.col("doc_id"), F.col("text"), bloom, historyFps)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()

  /** LIVE PII scrubbing — the third ingestion gate: every arriving doc
    * is redacted ([[graft.llm.Pii.scrub]]) before it lands, so raw PII
    * never reaches the training store. A doc's scrub depends only on
    * the doc itself (row-local regexps — zero streaming state, no
    * watermark, no join), so the per-batch union trivially EQUALS the
    * one-shot batch scrub (the spec asserts it); idempotent per-batch
    * overwrite like the other gates. */
  def scrubArrivals(docs: DataFrame, outDir: String, checkpoint: String,
      widened: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // widened = the full round-13 pattern set (intl phone/SSN/IBAN
        // beside the v1 trio) — same zero-state row-local contract
        (if (widened) graft.llm.Pii.scrubAll(batch, F.col("doc_id"), F.col("text"))
         else graft.llm.Pii.scrub(batch, F.col("doc_id"), F.col("text")))
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()

  /** LIVE perplexity gate — the CCNet-style quality filter at ingest:
    * every arriving doc is scored under a STORED trigram model
    * ([[graft.llm.LangModel.readTrigramModel]] — trained offline on the
    * curated corpus, the production split of q189's train-and-bucket).
    * Interpolated Kneser-Ney by default, stupid backoff when
    * `kneserNey = false`. The model tables are plain DataFrames read
    * once outside the stream and re-joined per batch (count tables ∝
    * distinct grams — broadcast-or-shuffle is Catalyst's call per
    * batch); a doc's score depends only on the doc and the FROZEN
    * model, so there is zero streaming state and the per-batch union
    * trivially equals the one-shot batch scoring (the spec asserts
    * it). Retraining under drift is the same periodic-rebuild story as
    * the index gates. Idempotent per-batch overwrite. */
  def scoreArrivals(docs: DataFrame, model: graft.llm.LangModel.TrigramModel,
      outDir: String, checkpoint: String, kneserNey: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        (if (kneserNey)
          graft.llm.LangModel.kneserNeyScoreAgainst(
            model, batch, F.col("doc_id"), F.col("text"))
        else
          graft.llm.LangModel.trigramScoreAgainst(
            model, batch, F.col("doc_id"), F.col("text")))
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()

  /** EXACTLY-ONCE streaming ingest into a manifested lakehouse table —
    * the piece that connects the live gates to the snapshot protocol:
    * each micro-batch lands as one [[graft.sources.Manifest]] APPEND
    * commit carrying its batch id AND a content fingerprint as commit
    * metadata (`#stream_batch=N` / `#stream_batch_fp=…`). Structured
    * Streaming's checkpoint replays a batch with the same id and
    * content after a crash; the sink compares the current snapshot's
    * recorded (id, fingerprint) and SKIPS only an IDENTICAL replay —
    * so a crash between commit and checkpoint ack (the classic
    * at-least-once window of plain `parquet` sinks) appends nothing
    * twice, a crash before commit leaves only an uncommitted
    * version-scoped data dir the next writer reclaims, and a colliding
    * batch id from a DIFFERENT lineage (fresh checkpoint over a
    * changed source, a second writer) fails loudly instead of
    * silently dropping data ([[landBatchExactlyOnce]]).
    * Readers pin snapshots throughout; a concurrent compaction is just
    * another committer in the optimistic-concurrency protocol — and
    * because commit metadata INHERITS across appends, rewrites, and
    * compactions, the batch high-water mark survives any interleaving
    * and any vacuum: the CURRENT snapshot always carries it, so the
    * replay check needs no retention window at all. */
  def sinkToManifest(docs: DataFrame, table: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landBatchExactlyOnce(table, batch, batchId)
      }
      .start()

  /** Exactly-once streaming UPSERT into a manifested table — the
    * foreachBatch MERGE pattern: each micro-batch lands through
    * [[graft.sources.Manifest.applyDeltaMoR]] (matched keys masked by
    * one delta-sized vector, the batch appended, ONE atomic commit),
    * under the SAME lineage protection as [[sinkToManifest]] (batch
    * high-water + content fingerprint in the same commit's metadata —
    * identical replays skip, divergent lineages fail loudly). The CDC
    * consumer shape: a stream of keyed upserts maintains a hot
    * dimension table with no rewrite amplification; schedule
    * [[graft.sources.Manifest.foldDeletes]] as maintenance.
    *
    * A batch carrying several versions of one key is AMBIGUOUS unless
    * `orderCol` names a column whose per-key maximum picks the winner
    * (ties refuse — silently keeping either row is the bug); without
    * `orderCol`, duplicate keys refuse outright. */
  def upsertToManifest(docs: DataFrame, table: String, checkpoint: String,
      keys: Seq[String], orderCol: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertBatchExactlyOnce(table, batch, batchId, keys, orderCol)
      }
      .start()

  /** The exactly-once upsert landing behind [[upsertToManifest]] —
    * [[landBatchExactlyOnce]]'s discipline with applyDeltaMoR as the
    * commit. The fingerprint is taken over the PRE-dedup batch (the
    * bytes the source replays), so an identical replay skips even
    * when dedup would also have made the merge idempotent. */
  private[graft] def upsertBatchExactlyOnce(table: String,
      batch0: DataFrame, batchId: Long, keys: Seq[String],
      orderCol: Option[String]): Unit = {
    import graft.sources.Manifest
    val s = batch0.sparkSession
    val batch = batch0.persist()
    try {
      // which aggregation this batch needs is decidable from DRIVER
      // METADATA before any data moves: only the real-upsert branch
      // (no orderCol, table already manifested, batch id above the
      // high-water) consumes the NULL/duplicate-key hygiene flag, and
      // there ONE two-level job computes fingerprint + empty check +
      // hygiene together (it pays the same keyed exchange the old
      // separate groupBy probe paid, one pass instead of two). Every
      // other path — create, replay skip, low-water refusal, orderCol
      // (whose hygiene must probe the DEDUPED frame) — keeps the plain
      // global-aggregate fingerprint, which shuffles one row per
      // partition: fusing unconditionally would have added an O(batch)
      // keyed exchange to the replay/create paths that never needed
      // the flag.
      val cur = Manifest.currentSnapshot(s, table)
      val highWater = cur.flatMap(_.meta.get("stream_batch")).map(_.toLong)
      val needDup = orderCol.isEmpty &&
        Manifest.isManifested(s, table) &&
        !highWater.exists(batchId <= _)
      val (fp, nRows, dupRaw) =
        if (needDup) {
          val (f, n, d) = fingerprintAndKeyCheck(batch, keys)
          (f, n, Some(d))
        } else {
          val (f, n) = contentFingerprint(batch)
          (f, n, None)
        }
      if (nRows == 0L) return
      highWater match {
        case Some(n) if batchId < n => sys.error(
          s"manifest upsert sink: batch id $batchId is below $table's " +
            s"recorded high-water $n — a different stream lineage is " +
            "feeding this table; refusing to guess. Resume the original " +
            "checkpoint or start a new table.")
        case Some(n) if batchId == n =>
          val recorded = cur.flatMap(_.meta.get("stream_batch_fp"))
          if (!recorded.contains(fp)) sys.error(
            s"manifest upsert sink: batch $batchId replayed with " +
              s"DIFFERENT content than the landed one (recorded " +
              s"${recorded.getOrElse("?")}, got $fp) — refusing the " +
              "silent skip.")
        // identical replay: the exactly-once skip
        case _ =>
          val deduped = orderCol match {
            case None => batch
            case Some(oc) =>
              // per-key winner by max(orderCol); an exact tie between
              // DIFFERENT rows refuses — picking one silently is the bug
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(keys.map(F.col): _*)
                .orderBy(F.col(oc).desc)
              val ranked = batch.withColumn("__rk", F.rank().over(w))
              val ties = ranked.filter(F.col("__rk") === 1)
                .groupBy(keys.map(F.col): _*)
                .agg(F.countDistinct(F.struct(
                  batch.columns.map(F.col).toIndexedSeq: _*)).as("__n"))
                .filter(F.col("__n") > 1).limit(1).count()
              if (ties > 0) sys.error(
                s"manifest upsert sink: batch $batchId carries tied " +
                  s"$oc versions of one key with different rows — " +
                  "no deterministic winner; refuse rather than guess")
              ranked.filter(F.col("__rk") === 1).drop("__rk").distinct()
          }
          val meta = Map("stream_batch" -> batchId.toString,
            "stream_batch_fp" -> fp)
          if (!Manifest.isManifested(s, table))
            Manifest.create(s, table, deduped, meta = meta)
          else {
            // post-dedup ambiguity (no orderCol, duplicate keys) still
            // refuses — applyDeltaMoR itself doesn't check. Without an
            // orderCol the flag already rode the fingerprint job;
            // with one, deduped ≠ batch, so probe the deduped frame.
            val dup = dupRaw.map(d => if (d) 1L else 0L).getOrElse {
              deduped.groupBy(keys.map(F.col): _*)
                .agg(F.count(F.lit(1)).as("__n"))
                .filter(F.col("__n") > 1 ||
                  keys.map(k => F.col(k).isNull).reduce(_ || _))
                .limit(1).count()
            }
            if (dup > 0) sys.error(
              s"manifest upsert sink: batch $batchId carries NULL or " +
                "duplicate keys — pass orderCol to pick per-key " +
                "winners, or dedupe upstream")
            Manifest.applyDeltaMoR(s, table,
              deduped.select(keys.map(F.col): _*), deduped, keys,
              meta = meta)
          }
          ()
      }
    } finally { batch.unpersist(); () }
  }

  /** The exactly-once landing shared by [[sinkToManifest]] and
    * [[curateArrivals]]. Batch ids are only meaningful WITHIN one
    * checkpoint lineage, so id ordering alone cannot distinguish "the
    * crash replay of the batch I already landed" from "a fresh
    * checkpoint replaying a GROWN source under the same id" — the
    * latter silently dropped data under a pure high-water check. Every
    * landing therefore also records an order-independent content
    * fingerprint (exact decimal sum of row hashes + count, one cheap
    * aggregation), and the skip path DEMANDS it match: an identical
    * replay of the landed batch skips (exactly-once); the same id with
    * different content, or an id below the recorded high-water, fails
    * loudly and tells the operator to resume the original checkpoint
    * or start a new table. Metadata inheritance keeps both keys on the
    * CURRENT snapshot across compactions and vacuum, so one manifest
    * read decides. */
  private[graft] def landBatchExactlyOnce(table: String, batch0: DataFrame,
      batchId: Long): Unit = {
    import graft.sources.Manifest
    val s = batch0.sparkSession
    // the batch is computed twice (fingerprint agg + commit write) —
    // persist so a heavy upstream pipeline (curateArrivals' four
    // gates) runs once, and so both consumers see the SAME rows even
    // if the pipeline has any nondeterminism
    val batch = batch0.persist()
    try {
    val (fp, _) = contentFingerprint(batch)
    val cur = Manifest.currentSnapshot(s, table)
    cur.flatMap(_.meta.get("stream_batch")).map(_.toLong) match {
      case Some(n) if batchId < n => sys.error(
        s"manifest sink: batch id $batchId is below $table's recorded " +
          s"high-water $n — a different stream lineage (fresh checkpoint " +
          "over a changed source, or a second writer) is feeding this " +
          "table; refusing to guess. Resume the original checkpoint or " +
          "start a new table.")
      case Some(n) if batchId == n =>
        val recorded = cur.flatMap(_.meta.get("stream_batch_fp"))
        if (!recorded.contains(fp)) sys.error(
          s"manifest sink: batch $batchId replayed with DIFFERENT content " +
            s"than the landed one (recorded ${recorded.getOrElse("?")}, " +
            s"got $fp) — batch ids are only stable within one checkpoint " +
            "lineage; refusing the silent skip.")
      // identical replay of the landed batch: the exactly-once skip
      case _ =>
        val meta = Map("stream_batch" -> batchId.toString,
          "stream_batch_fp" -> fp)
        if (Manifest.isManifested(s, table))
          // maxRebase = 0: this sink's exactly-once rides the
          // high-water re-check ABOVE the commit — an auto-rebase
          // would silently skip that re-check and let a zombie
          // replica double-land a batch a twin already committed;
          // losing the slot loudly re-enters this method, which then
          // sees the landed batch and takes the skip path
          Manifest.commitAppend(s, table, batch, meta = meta, maxRebase = 0)
        else Manifest.create(s, table, batch, meta = meta)
    }
    } finally batch.unpersist()
    ()
  }

  /** Order-independent content fingerprint of a frame: the EXACT
    * decimal sum of per-row hashes plus the row count, returned as
    * (formatted "sum:count" string, count) so callers read the
    * emptiness STRUCTURALLY instead of sniffing the string format. A
    * decimal(38,0) sum neither overflows (ANSI would throw on a long
    * sum of 64-bit hashes) nor cancels — bit_xor would erase
    * duplicate-row PAIRS, letting {A,B,B} collide with {A,C,C},
    * exactly the different-content case the sink's guard exists to
    * catch. */
  private[graft] def contentFingerprint(df: DataFrame): (String, Long) = {
    val r = df.agg(
      F.coalesce(F.sum(F.expr("xxhash64(struct(" +
        df.columns.map(c => s"`$c`").mkString(",") + "))")
        .cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)")).as("__s"),
      F.count(F.lit(1)).as("__n")).first()
    (s"${r.getDecimal(0).toBigInteger.toString}:${r.getLong(1)}", r.getLong(1))
  }

  /** [[contentFingerprint]] FUSED with the upsert sink's NULL/duplicate
    * key hygiene probe — one two-level aggregation job (per-key partial
    * hashes and counts, then the global roll-up) instead of a
    * fingerprint pass plus a separate groupBy-keys probe job over the
    * same batch. The decimal per-key sums re-sum to the identical
    * global fingerprint (decimal addition is exact and associative
    * here), and the dup flag is true iff any key group has > 1 rows or
    * a NULL key component. */
  private[graft] def fingerprintAndKeyCheck(df: DataFrame,
      keys: Seq[String]): (String, Long, Boolean) = {
    val perKey = df.groupBy(keys.map(F.col): _*).agg(
      F.coalesce(F.sum(F.expr("xxhash64(struct(" +
        df.columns.map(c => s"`$c`").mkString(",") + "))")
        .cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)")).as("__s"),
      F.count(F.lit(1)).as("__n"))
    val r = perKey.agg(
      F.coalesce(F.sum("__s"), F.lit(0).cast("decimal(38,0)")).as("__s"),
      F.coalesce(F.sum("__n"), F.lit(0L)).as("__n"),
      F.coalesce(F.max(F.col("__n") > 1 ||
        keys.map(k => F.col(k).isNull).reduce(_ || _)), F.lit(false))
        .as("__dup")).first()
    (s"${r.getDecimal(0).toBigInteger.toString}:${r.getLong(1)}",
      r.getLong(1), r.getBoolean(2))
  }

  /** THE live curation pipeline — the q195 batch capstone at ingest,
    * one operator: every arriving micro-batch runs the Gopher quality
    * gate, the widened PII scrub, the near-dup screen against a STORED
    * band index, and the perplexity gate under a STORED Kneser-Ney
    * model, and the survivors land in a manifested table as ONE
    * exactly-once append commit. All reference state is frozen
    * offline artifacts (band-index store over the curated corpus'
    * REDACTED text, LM store trained on the same) — zero streaming
    * state, so per-batch results trivially union to the batch
    * pipeline over the same arrivals (the spec asserts it), and a
    * replayed batch re-screens against the same frozen stores and is
    * then skipped at the commit. A doc with fewer than three tokens
    * after redaction carries no trigram evidence and fails the LM
    * gate (no score row — semi-join drops it), the conservative
    * default for a quality filter. */
  def curateArrivals(docs: DataFrame, bandStorePath: String,
      lmStorePath: String, table: String, checkpoint: String,
      minWords: Int = 50, minStopHits: Int = 2,
      dupThreshold: Double = 0.8,
      logprobMin: Double = Double.NegativeInfinity)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.llm.{Dedup, LangModel, Pii, TextAnalysis}
    val spark = docs.sparkSession
    val (bands, shingles) = Dedup.readBandIndexStore(spark, bandStorePath)
    val lm = LangModel.readTrigramModel(spark, lmStorePath)
    docs.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val keep = TextAnalysis.gopherRules(batch, F.col("doc_id"),
            F.col("text"), minWords = minWords, minStopHits = minStopHits)
          .filter(F.col("kept")).select("doc_id")
        val gated = batch.join(keep, Seq("doc_id"), "left_semi")
        val redacted = gated.drop("text").join(
          Pii.scrubAll(gated, F.col("doc_id"), F.col("text"))
            .select(F.col("doc_id"), F.col("text_redacted").as("text")),
          "doc_id")
        // the screen returns a row per FLAGGED arrival; admitted = the rest
        val admitted = redacted.join(
          Dedup.nearDupScreen(redacted, F.col("doc_id"), F.col("text"),
            bands, shingles, threshold = dupThreshold).select("doc_id"),
          Seq("doc_id"), "left_anti")
        val passIds = LangModel.kneserNeyScoreAgainst(lm, admitted,
            F.col("doc_id"), F.col("text"))
          .filter(F.col("logprob") >= logprobMin).select("doc_id")
        landBatchExactlyOnce(table,
          admitted.join(passIds, Seq("doc_id"), "left_semi"), batchId)
      }
      .start()
  }

  // ---- custom state (mapGroupsWithState) ---------------------------

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserState(n: Long, sum: Double)
  final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** Custom stateful operator: per-user running totals via
    * `mapGroupsWithState` — the escape hatch when built-in windows can't
    * express the state machine. State is one (count, sum) pair per user,
    * bounded; update-mode emits the running total each micro-batch. */
  def runningUserTotals(spark: SparkSession, events: DataFrame)
      : org.apache.spark.sql.Dataset[UserTotal] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.selectExpr("user_id", "value").as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserTotal](GroupStateTimeout.NoTimeout) {
        (uid, it, state) =>
          var n = state.getOption.map(_.n).getOrElse(0L)
          var sum = state.getOption.map(_.sum).getOrElse(0.0)
          it.foreach { e => n += 1; sum += e.value }
          state.update(UserState(n, sum))
          UserTotal(uid, n, math.rint(sum * 100) / 100)
      }
  }

  // ---- live funnel (flatMapGroupsWithState + event-time timeout) ---

  final case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp, step: Int)
  /** Per-user buffered (ts-µs, step) events, (ts, step)-sorted. */
  final case class FunnelBuf(ts: Array[Long], step: Array[Int])
  final case class FunnelResult(user_id: Long, stage: Int)

  /** First-touch window funnel served from a LIVE stream — the past-
    * plain-aggregation stateful operator: per-user event buffers in
    * `flatMapGroupsWithState` state, finalized by EVENT-TIME TIMEOUT.
    *
    * Semantics are exactly [[graft.operators.Funnel.funnelStages]]
    * (first-touch mode): the chain anchors at the user's FIRST
    * `steps(0)` event and each later step must land within
    * `windowMicros` of the anchor. The chain scan IS the batch one —
    * [[graft.functions.FunnelStage.compute]] over the buffered array —
    * so live and batch cannot drift.
    *
    * Finality: under a watermark, an ANCHORED user's stage is provably
    * final once the watermark passes `anchor + window` — no event that
    * could join the chain can still arrive, and no EARLIER anchor can
    * appear (it would be behind the watermark). Such users emit exactly
    * once, then their state is removed. Users with no anchor yet are
    * IDLE-EVICTED at `lastSeen + window`, emitting the stage-0 row
    * batch would give them; if such a user anchors after eviction they
    * re-enter as a fresh group and may emit a second, refined row —
    * append-mode consumers should read the funnel stream as
    * latest-per-user. (Provable finality for never-anchoring users
    * doesn't exist on an unbounded stream; unbounded idle state is the
    * worse trade.)
    *
    * State bounds (the 100 TB discipline): the buffer keeps only events
    * `<= anchor + window` (later ones cannot join a first-touch chain)
    * and hard-caps at `maxEventsPerUser` EARLIEST (ts, step) events —
    * [[graft.functions.EarliestN]]'s deterministic whale guard, so one
    * bot account cannot grow a partition-killing state row. Event-time
    * timeout + removal means total state ∝ users active within the last
    * `window + lateness`, not users ever seen.
    *
    * anyAnchor intentionally has NO live variant: its "furthest chain
    * from ANY anchor" is never final on an unbounded stream (every
    * future anchor can still improve it) — serve it from batch or a
    * bounded analysis window instead.
    */
  def funnelStagesLive(spark: SparkSession, events: DataFrame,
      steps: Seq[String], windowMicros: Long,
      lateness: String = "10 minutes",
      maxEventsPerUser: Int = 4096)
      : org.apache.spark.sql.Dataset[FunnelResult] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got ${steps.mkString(",")}")
    val stepIdx = steps.zipWithIndex.tail.foldLeft(
      F.when(F.col("event_type") === steps.head, 0)) {
        case (acc, (s, i)) => acc.when(F.col("event_type") === s, i) }
    val nSteps = steps.size

    def micros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def scanStage(buf: FunnelBuf): Int = {
      val rows = Array.tabulate[Any](buf.ts.length)(i =>
        org.apache.spark.sql.catalyst.InternalRow(buf.ts(i), buf.step(i)))
      graft.functions.FunnelStage.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(rows),
        windowMicros, nSteps)
    }

    events.filter(F.col("event_type").isin(steps: _*))
      .withWatermark("ts", lateness)
      .select(F.col("user_id").cast("long").as("user_id"), F.col("ts"),
        stepIdx.as("step"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, FunnelResult](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, it, state) =>
          if (state.hasTimedOut) {
            val stage = scanStage(state.get)
            state.remove()
            Iterator.single(FunnelResult(uid, stage))
          } else {
            val prev = state.getOption
              .getOrElse(FunnelBuf(Array.emptyLongArray, Array.emptyIntArray))
            val incoming = it.map(e => (micros(e.ts), e.step)).toArray
            val merged = (prev.ts.zip(prev.step) ++ incoming).sorted
            // first-touch prune: beyond anchor+window nothing can join the
            // chain; then the EarliestN whale cap
            val anchorTs = merged.collectFirst { case (t, 0) => t }
            val kept = anchorTs
              .fold(merged)(a => merged.filter(_._1 <= a + windowMicros))
              .take(maxEventsPerUser)
            state.update(FunnelBuf(kept.map(_._1), kept.map(_._2)))
            val horizonMs =
              (anchorTs.getOrElse(kept.last._1) + windowMicros) / 1000L + 1L
            // a late anchor can pull the horizon behind the watermark —
            // clamp forward so the timeout fires on the next no-data batch
            state.setTimeoutTimestamp(
              math.max(horizonMs, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }
}
