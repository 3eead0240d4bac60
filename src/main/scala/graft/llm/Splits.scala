package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Engine-independent uniform in (0, 1) from the same md5 hash as
    * [[hashBucket]]: (h₃₂ + 0.5) / 2³², so it is never exactly 0 or 1. */
  def hashUniform(key: Column): Column =
    (F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / F.lit(4294967296.0)

  /** DETERMINISTIC weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): each row gets key = ln(u)/w with u = [[hashUniform]]
    * and w its weight; the k LARGEST keys are exactly a weighted sample
    * without replacement. rand()-based `sampleBy` gives a different
    * sample every run and engine; the hash-derived uniform makes the
    * sample a pure function of row identity — reproducible across
    * engines, runs, and partitionings (the same discipline as
    * [[hashBucket]] splits), and replayable in SQL (q151's oracle).
    *
    * Stratified (`strata` non-empty): top-k per stratum via one
    * window — shuffle by strata, the limit_by shape. Global: TakeOrdered
    * (distributed partial top-k), never a single-partition window.
    * Rows with weight ≤ 0 or null cannot be sampled and are dropped.
    * Returns the input columns plus `es_key` (the sort key, for rank
    * auditing). */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
      strata: Seq[Column] = Nil): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val keyed = df.filter(weight.isNotNull && weight > 0)
      .withColumn("es_key", F.log(hashUniform(key)) / weight.cast("double"))
    if (strata.isEmpty)
      keyed.orderBy(F.col("es_key").desc, key.asc).limit(k)
    else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(strata: _*)
        .orderBy(F.col("es_key").desc, key.asc)
      keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k).drop("__rn")
    }
  }
}
