package graft

import graft.cubes.Tables
import graft.streaming.Streaming
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The streaming contract: every Streaming.* transform must produce the
  * SAME result running as a live stream (memory sink, processAllAvailable)
  * as it does in batch — one code path for backfill and live.
  */
class StreamingSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def runStream(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "complete"): Array[String] = {
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft_ckpt_$name").toString
    val q = df.writeStream.outputMode(mode).format("memory")
      .option("checkpointLocation", ckpt).queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).collect().map(_.toString).sorted
  }

  private def batchRows(df: org.apache.spark.sql.DataFrame): Array[String] =
    df.collect().map(_.toString).sorted

  test("tumbling window: stream == batch") {
    val stream = runStream(
      Streaming.tumblingCounts(Streaming.eventsStream(spark, sf)), "tumb")
    val batch = batchRows(Streaming.tumblingCounts(Tables.events(spark, sf)))
    assert(stream.nonEmpty && stream.sameElements(batch))
  }

  test("sliding window: stream == batch") {
    val stream = runStream(
      Streaming.slidingCounts(Streaming.eventsStream(spark, sf)), "slide")
    val batch = batchRows(Streaming.slidingCounts(Tables.events(spark, sf)))
    assert(stream.nonEmpty && stream.sameElements(batch))
  }

  test("session window with watermark: stream == batch") {
    val stream = runStream(
      Streaming.sessionAggs(
        Streaming.eventsStream(spark, sf).withWatermark("ts", "10 minutes")),
      "sess")
    val batch = batchRows(Streaming.sessionAggs(Tables.events(spark, sf)))
    assert(stream.nonEmpty && stream.sameElements(batch))
  }

  test("watermarked tumbling in append mode emits closed windows") {
    // append mode only emits windows the watermark has passed; with a
    // 10-minute watermark over a finite file stream, all but the last
    // window(s) must be emitted
    val rows = runStream(
      Streaming.watermarkedTumbling(Streaming.eventsStream(spark, sf)),
      "wm_append", mode = "append")
    val batch = batchRows(Streaming.tumblingCounts(Tables.events(spark, sf)))
    assert(rows.nonEmpty)
    assert(rows.toSet.subsetOf(batch.toSet), "append emitted a window batch doesn't have")
    assert(rows.length >= batch.length - 10, "append mode withheld too many windows")
  }

  test("streaming dedup drops duplicate event_ids") {
    val deduped = Streaming.dedupedEvents(Streaming.eventsStream(spark, sf))
      .groupBy("event_type").count()
    val stream = runStream(deduped, "dedup")
    val batch = batchRows(Tables.events(spark, sf).groupBy("event_type").count())
    assert(stream.sameElements(batch)) // fixture ids unique -> no-op dedup
  }
}
