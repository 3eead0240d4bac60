package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Deterministic dataset splitting for training pipelines.
  *
  * The core property a train/val/test split needs at 100 TB is
  * REPRODUCIBILITY INDEPENDENT OF EXECUTION: `sample()`/`rand()` assign
  * rows by partition-local RNG streams, so a repartition, a retry, or a
  * different executor count silently moves documents between splits —
  * test-set contamination you cannot detect afterwards. A content hash
  * of a stable key gives every row a split that any engine (Spark,
  * DuckDB, Trino, a Python loader) recomputes identically, forever.
  * Row-local codegen'd expressions, no shuffle, no state.
  */
object Splits {

  /** Engine-independent bucket in [0, buckets): the first 8 hex chars of
    * md5(key's string form) parsed as an integer, mod buckets. md5 and
    * hex are universal, so the same document lands in the same bucket in
    * every engine and on every run, regardless of partitioning.
    *
    * Use an integral or string id as the key: fractional types render
    * differently across engines ("1.0" vs "1") and would silently break
    * the cross-engine reproducibility this exists for. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    F.pmod(
      F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      F.lit(buckets.toLong))

  /** Split-label column from cumulative weights, e.g.
    * `assignSplit($"doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))`.
    * Weights must sum to 1; they are scaled to `buckets` cut points, so
    * the realized fractions are exact multiples of 1/buckets. */
  def assignSplit(key: Column, weights: Seq[(String, Double)],
      buckets: Int = 100): Column = {
    require(weights.nonEmpty, "need at least one split")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9, "split weights must sum to 1")
    val cuts = weights.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(w => math.round(w * buckets))
    require(cuts.distinct.size == cuts.size,
      s"weights too small for $buckets buckets: a split would be empty")
    val b = hashBucket(key, buckets)
    val first = F.when(b < cuts.head, F.lit(weights.head._1))
    weights.tail.zip(cuts.tail).dropRight(1).foldLeft(first) {
      case (acc, ((name, _), hi)) => acc.when(b < hi, F.lit(name))
    }.otherwise(F.lit(weights.last._1))
  }
}
