package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Single-pass approximate top-K frequent elements (SpaceSaving /
  * Metwally et al., "Efficient computation of frequent and top-k elements
  * in data streams", ICDT 2005) as a typed Spark `Aggregator`.
  *
  * The two-phase [[graft.operators.TopK]] is exact and usually the right
  * choice; this sketch wins when the *group count* is huge and a second
  * shuffle per group is unaffordable, or over streams. With `capacity` ≥
  * distinct-values-per-group the result is exact (verified in spec).
  *
  * Buffer is a bounded (value → count) map: hit → +1; miss with room →
  * insert 1; miss full → evict the (count, value)-minimum and inherit its
  * count + 1 (the SpaceSaving overestimate). Deterministic tie-breaks so
  * results are reproducible across partitionings at sufficient capacity.
  *
  * Input is boxed and nulls are skipped, so a conditional (FILTER-style)
  * tuple metric composes as `topkFreq(when(pred, col))`.
  */
class TopKFreq(k: Int, capacity: Int = 4096)
    extends Aggregator[java.lang.Long, mutable.Map[Long, Long], Seq[TopKFreq.Entry]] {
  require(k <= capacity, "k must be <= capacity")

  override def zero: mutable.Map[Long, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[Long, Long], boxed: java.lang.Long): mutable.Map[Long, Long] = {
    if (boxed == null) return buf // FILTER semantics: predicate-false rows
    val v = boxed.longValue()
    buf.get(v) match {
      case Some(c) => buf.update(v, c + 1)
      case None if buf.size < capacity => buf.update(v, 1L)
      case None =>
        val (minV, minC) = buf.minBy { case (value, c) => (c, value) }
        buf.remove(minV)
        buf.update(v, minC + 1)
    }
    buf
  }

  /** Mergeable-summaries merge (Agarwal et al., PODS 2012): a full
    * sketch's estimate for an absent key is its minimum count, so absent
    * keys inherit `min(side)` when that side is full — this preserves the
    * SpaceSaving invariant `estimate ≥ true count` under merge. Then
    * truncate to capacity keeping the largest counts (every dropped key's
    * estimate ≤ every kept count, so the bound survives truncation).
    * When neither side ever filled (capacity ≥ distinct) both mins are 0
    * and the merge — like reduce — stays exact.
    */
  override def merge(a: mutable.Map[Long, Long], b: mutable.Map[Long, Long]): mutable.Map[Long, Long] = {
    val minA = if (a.size >= capacity) a.values.min else 0L
    val minB = if (b.size >= capacity) b.values.min else 0L
    val out = mutable.Map.empty[Long, Long]
    (a.keySet ++ b.keySet).foreach { v =>
      out.update(v, a.getOrElse(v, minA) + b.getOrElse(v, minB))
    }
    if (out.size > capacity) {
      val keep = out.toSeq.sortBy { case (v, c) => (-c, v) }.take(capacity)
      out.clear()
      keep.foreach { case (v, c) => out.update(v, c) }
    }
    out
  }

  override def finish(buf: mutable.Map[Long, Long]): Seq[TopKFreq.Entry] =
    buf.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)
      .map { case (v, c) => TopKFreq.Entry(v, c) }

  override def bufferEncoder: Encoder[mutable.Map[Long, Long]] =
    Encoders.kryo[mutable.Map[Long, Long]]
  override def outputEncoder: Encoder[Seq[TopKFreq.Entry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKFreq.Entry]]()
}

object TopKFreq {
  final case class Entry(value: Long, cnt: Long)
  /** Weighted input row: boxed so FILTER-nulled rows skip cleanly. */
  final case class WIn(v: java.lang.Long, w: java.lang.Long)

  /** Untyped column form for DataFrame groupBy: `agg(topkFreq(3)(col))`. */
  def apply(k: Int, capacity: Int = 4096): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKFreq(k, capacity), Encoders.LONG)
}

/** Weighted SpaceSaving (ClickHouse `topKWeighted`): each occurrence
  * adds its WEIGHT instead of 1 — "top keys by total volume/revenue",
  * not by row count. Same bounded-map construction and merge bound as
  * [[TopKFreq]] (SpaceSaving admits arbitrary positive increments: on
  * eviction the newcomer inherits min + w, preserving estimate ≥ true
  * weight); exact while distinct-per-group ≤ capacity. Null values OR
  * null weights skip the row (FILTER composition).
  */
class TopKWeighted(k: Int, capacity: Int = 4096)
    extends Aggregator[TopKFreq.WIn, mutable.Map[Long, Long], Seq[TopKFreq.Entry]] {
  require(k <= capacity, "k must be <= capacity")

  override def zero: mutable.Map[Long, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[Long, Long], in: TopKFreq.WIn): mutable.Map[Long, Long] = {
    if (in == null || in.v == null || in.w == null) return buf
    val v = in.v.longValue()
    val w = in.w.longValue()
    if (w <= 0) return buf
    buf.get(v) match {
      case Some(c) => buf.update(v, c + w)
      case None if buf.size < capacity => buf.update(v, w)
      case None =>
        val (minV, minC) = buf.minBy { case (value, c) => (c, value) }
        buf.remove(minV)
        buf.update(v, minC + w)
    }
    buf
  }

  override def merge(a: mutable.Map[Long, Long], b: mutable.Map[Long, Long]): mutable.Map[Long, Long] = {
    val minA = if (a.size >= capacity) a.values.min else 0L
    val minB = if (b.size >= capacity) b.values.min else 0L
    val out = mutable.Map.empty[Long, Long]
    (a.keySet ++ b.keySet).foreach { v =>
      out.update(v, a.getOrElse(v, minA) + b.getOrElse(v, minB))
    }
    if (out.size > capacity) {
      val keep = out.toSeq.sortBy { case (v, c) => (-c, v) }.take(capacity)
      out.clear()
      keep.foreach { case (v, c) => out.update(v, c) }
    }
    out
  }

  override def finish(buf: mutable.Map[Long, Long]): Seq[TopKFreq.Entry] =
    buf.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)
      .map { case (v, c) => TopKFreq.Entry(v, c) }

  override def bufferEncoder: Encoder[mutable.Map[Long, Long]] =
    Encoders.kryo[mutable.Map[Long, Long]]
  override def outputEncoder: Encoder[Seq[TopKFreq.Entry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKFreq.Entry]]()
}

object TopKWeighted {
  /** Two-column call: `agg(TopKWeighted(3)(valueCol, weightCol))` —
    * the WIn encoder declares two top-level fields, NOT one struct. */
  def apply(k: Int, capacity: Int = 4096): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKWeighted(k, capacity),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[TopKFreq.WIn]())
}
