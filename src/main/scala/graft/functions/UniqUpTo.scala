package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** ClickHouse `uniqUpTo(N)`: the exact distinct count while it is ≤ N,
  * and N+1 once it exceeds N — "are there more than N distinct values?"
  * with aggregation STATE bounded at N+1 values per group instead of a
  * full distinct set (the point at 100 TB: a compliance check like
  * "more than 100 distinct users?" must not materialize millions of
  * user ids per group).
  *
  * Correctness of the bound: values are only discarded once the buffer
  * holds N+1 — so any buffer of size ≤ N is the EXACT distinct set, and
  * a buffer of size N+1 is a saturation witness. Under merge, if either
  * side is saturated the union is too; if both are exact the union is
  * exact and re-capped. Either way the result is exactly
  * min(true_distinct, N+1), deterministically, for any partitioning.
  * Nulls skip (FILTER composition), like every other metric here.
  */
class UniqUpTo(n: Int)
    extends Aggregator[java.lang.Long, mutable.Set[Long], Int] {
  require(n >= 1, "uniqUpTo needs n >= 1")

  override def zero: mutable.Set[Long] = mutable.Set.empty

  override def reduce(buf: mutable.Set[Long], boxed: java.lang.Long): mutable.Set[Long] = {
    if (boxed != null && buf.size <= n) buf += boxed.longValue()
    buf
  }

  override def merge(a: mutable.Set[Long], b: mutable.Set[Long]): mutable.Set[Long] = {
    // adding until a saturates suffices: if b was saturated (n+1
    // values), a necessarily saturates before or upon consuming it
    val it = b.iterator
    while (a.size <= n && it.hasNext) a += it.next()
    a
  }

  override def finish(buf: mutable.Set[Long]): Int = math.min(buf.size, n + 1)

  override def bufferEncoder: Encoder[mutable.Set[Long]] =
    Encoders.kryo[mutable.Set[Long]]
  override def outputEncoder: Encoder[Int] = Encoders.scalaInt
}

object UniqUpTo {
  /** `agg(uniqUpTo(100)(col))` — untyped column form. */
  def apply(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new UniqUpTo(n), Encoders.LONG)
}
