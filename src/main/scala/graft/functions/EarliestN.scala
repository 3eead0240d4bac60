package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** The N earliest (ts, step) events of a group, as a BOUNDED-state
  * aggregate — the whale-user guard for the per-user sequence operators
  * ([[graft.operators.Funnel]]): at 100 TB one bot/ETL user with 10⁸
  * step events would otherwise materialize one giant `collect_list` row
  * on a single reducer. With a cap, per-group aggregation state never
  * exceeds 2N entries ANYWHERE — map-side partials included — and the
  * output is the deterministic earliest-N prefix of the user's
  * (ts, step)-sorted events, i.e. exactly what the uncapped path feeds
  * the chain scan, truncated.
  *
  * Bound mechanics: appends run until the buffer reaches 2N, then it
  * compacts to the N lexicographically-smallest pairs (sort + truncate
  * — amortized O(log N) per element); merge concatenates and compacts.
  * Because elements are only ever DISCARDED when ≥ N smaller-or-equal
  * elements are present, the surviving N are the true earliest-N of the
  * union regardless of partitioning — determinism under any merge
  * order. Output comes back sorted ascending, the contract of
  * [[FunnelStage]] / [[SeqCount]]'s array input.
  *
  * Null ts/step skip the row (FILTER composition, like every aggregate
  * here).
  */
class EarliestN(n: Int)
    extends Aggregator[EarliestN.In, mutable.ArrayBuffer[(Long, Int)], Seq[EarliestN.Ev]] {
  require(n >= 1, "earliestN needs n >= 1")

  override def zero: mutable.ArrayBuffer[(Long, Int)] = mutable.ArrayBuffer.empty

  private def compact(buf: mutable.ArrayBuffer[(Long, Int)]): mutable.ArrayBuffer[(Long, Int)] = {
    buf.sortInPlace()
    buf.takeInPlace(n)
    buf
  }

  override def reduce(
      buf: mutable.ArrayBuffer[(Long, Int)], in: EarliestN.In): mutable.ArrayBuffer[(Long, Int)] = {
    if (in == null || in.ts == null || in.step == null) return buf
    buf += ((in.ts.longValue(), in.step.intValue()))
    if (buf.size >= 2 * n) compact(buf) else buf
  }

  override def merge(
      a: mutable.ArrayBuffer[(Long, Int)],
      b: mutable.ArrayBuffer[(Long, Int)]): mutable.ArrayBuffer[(Long, Int)] = {
    a ++= b
    if (a.size > n) compact(a) else a
  }

  override def finish(buf: mutable.ArrayBuffer[(Long, Int)]): Seq[EarliestN.Ev] =
    buf.sorted.iterator.take(n).map { case (ts, st) => EarliestN.Ev(ts, st) }.toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[(Long, Int)]] =
    Encoders.kryo[mutable.ArrayBuffer[(Long, Int)]]
  override def outputEncoder: Encoder[Seq[EarliestN.Ev]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[EarliestN.Ev]]()
}

object EarliestN {
  /** Input row: boxed so FILTER-nulled rows skip cleanly. */
  final case class In(ts: java.lang.Long, step: java.lang.Integer)
  /** Output element — array<struct<long,int>>, the [[FunnelStage]] /
    * [[SeqCount]] input shape. */
  final case class Ev(ts: Long, step: Int)

  /** Two-column call: `agg(EarliestN(cap)(tsCol, stepCol))`. */
  def apply(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new EarliestN(n),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[In]())
}
