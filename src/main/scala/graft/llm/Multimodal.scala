package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed in partition-local batches.
  *
  * The decode step is a STUB (this container has no image/audio codecs):
  * `decodeStub` derives deterministic fake features from the bytes. What
  * is real — and what the tests cover — is the Spark plumbing a 100 TB
  * media pipeline needs: a stable `binary` schema, typed Dataset
  * batching via mapPartitions (one decoder init per partition, not per
  * row), and columnar metadata that survives parquet round-trips.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, mime: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      byte_len: Int,
      sha256: String,
      width: Int,
      height: Int,
      brightness: Double)

  /** Fixture adapter: wrap a documents table as fake media blobs
    * (payload = utf8 bytes of the text). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      F.col("doc_id").as("media_id"),
      F.lit("image/fake").as("mime"),
      F.col("text").cast("binary").as("payload"))

  /** STUB decoder — stands in for an image library. Deterministic pure
    * function of the payload bytes so results are reproducible; replace
    * the body with a real codec (keeping the signature) in production.
    * One invocation per partition: a real decoder would init its native
    * context here once and stream the batch through it. */
  def decodeStub(batch: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
    // per-partition init would go here (native codec handle, model, …)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    batch.map { rec =>
      val bytes = rec.payload
      md.reset()
      val sha = md.digest(bytes).map("%02x".format(_)).mkString
      // fake "decode": dimensions + brightness derived from content
      val w = 1 + math.floorMod(if (bytes.nonEmpty) bytes(0).toInt else 0, 64)
      val h = 1 + math.floorMod(bytes.length, 64)
      val brightness =
        if (bytes.isEmpty) 0.0
        else math.rint(bytes.map(b => (b & 0xFF).toDouble).sum / bytes.length * 1e6) / 1e6
      MediaFeatures(rec.media_id, bytes.length, sha, w, h, brightness)
    }
  }

  /** The real pipeline shape: typed batch map over partitions. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(decodeStub)
  }

  /** Column-only metadata (no decode): byte length + content digest —
    * fully codegen'd, pushdown-friendly. */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(
      F.col("media_id"),
      F.length(F.col("payload")).as("byte_len"),
      F.sha2(F.col("payload"), 256).as("sha_hex"))

  /** STUB resize: in production a codec re-encodes to `maxBytes`; the stub
    * truncates deterministically. The SHAPE is what matters: binary →
    * binary, expressible as a plain column op (codegen'd substring). */
  def resizeStub(payload: org.apache.spark.sql.Column, maxBytes: Int): org.apache.spark.sql.Column =
    F.substring(payload, 1, maxBytes)

  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame sampling: in production a video codec extracts `n` key
    * frames; the stub slices the payload into n equal chunks. Real
    * plumbing: one decoder per partition, one output row per frame
    * (media_id, frame_idx, frame bytes) — the explode-shaped schema a
    * frame-level training pipeline consumes. */
  def sampleFramesStub(spark: SparkSession, media: DataFrame, n: Int): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      // per-partition decoder init would go here
      batch.flatMap { rec =>
        val len = rec.payload.length
        if (len == 0) Iterator.empty
        else (0 until n).iterator.map { i =>
          val start = (len.toLong * i / n).toInt
          val end = (len.toLong * (i + 1) / n).toInt
          Frame(rec.media_id, i, java.util.Arrays.copyOfRange(rec.payload, start, end))
        }
      }
    }
  }
}
