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
  */
class TopKFreq(k: Int, capacity: Int = 4096)
    extends Aggregator[Long, mutable.Map[Long, Long], Seq[TopKFreq.Entry]] {
  require(k <= capacity, "k must be <= capacity")

  override def zero: mutable.Map[Long, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[Long, Long], v: Long): mutable.Map[Long, Long] = {
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

  override def merge(a: mutable.Map[Long, Long], b: mutable.Map[Long, Long]): mutable.Map[Long, Long] = {
    b.foreach { case (v, c) => a.update(v, a.getOrElse(v, 0L) + c) }
    if (a.size > capacity) {
      val keep = a.toSeq.sortBy { case (v, c) => (-c, v) }.take(capacity)
      a.clear()
      keep.foreach { case (v, c) => a.update(v, c) }
    }
    a
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

  /** Untyped column form for DataFrame groupBy: `agg(topkFreq(3)(col))`. */
  def apply(k: Int, capacity: Int = 4096): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKFreq(k, capacity), Encoders.scalaLong)
}
