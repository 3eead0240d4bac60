package graft.functions

import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile-sketch aggregates — the non-additive rollup path
  * for PERCENTILES, completing the sketch-cell story (HLL for distinct
  * counts, q101/q102; SpaceSaving for heavy hitters, q63): a rollup
  * table stores one serialized sketch per cell, and an arbitrary slice
  * of cells is answered by sketch UNION with the same rank-error
  * guarantee ε as a one-shot sketch — Greenwald-Khanna summaries merge
  * without losing their bound, which is exactly how Spark distributes
  * `percentile_approx` across partitions. State is Catalyst's own
  * [[QuantileSummaries]]; cells serialize with plain Java serialization
  * (the class is a small Serializable value object).
  */
object QuantileSketch {

  private def ser(s: QuantileSummaries): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    try oos.writeObject(s.compress()) finally oos.close()
    bos.toByteArray
  }
  private def deser(b: Array[Byte]): QuantileSummaries = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(b))
    try ois.readObject().asInstanceOf[QuantileSummaries] finally ois.close()
  }
  private def empty(eps: Double) =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps)

  /** Build one sketch CELL from raw doubles (store in the rollup). */
  final class CellAgg(eps: Double)
      extends Aggregator[Double, QuantileSummaries, Array[Byte]] {
    override def zero: QuantileSummaries = empty(eps)
    override def reduce(b: QuantileSummaries, v: Double): QuantileSummaries = b.insert(v)
    override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      a.compress().merge(b.compress())
    override def finish(b: QuantileSummaries): Array[Byte] = ser(b)
    override def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.kryo[QuantileSummaries]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union stored cells and read one quantile (rank `q`). NaN on empty. */
  final class UnionAgg(q: Double, eps: Double)
      extends Aggregator[Array[Byte], QuantileSummaries, Double] {
    require(q >= 0 && q <= 1, s"quantile rank must be in [0,1], got $q")
    override def zero: QuantileSummaries = empty(eps)
    override def reduce(b: QuantileSummaries, cell: Array[Byte]): QuantileSummaries =
      if (cell == null) b else b.compress().merge(deser(cell)) // FILTER-nulled cells skip
    override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      a.compress().merge(b.compress())
    override def finish(b: QuantileSummaries): Double =
      b.compress().query(q).getOrElse(Double.NaN)
    override def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.kryo[QuantileSummaries]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column forms: `agg(quantileCell(0.01)(col))` to build cells,
    * `agg(quantileUnion(0.5, 0.01)(cellCol))` to answer from them. */
  def quantileCell(eps: Double = 0.01): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new CellAgg(eps), Encoders.scalaDouble)
  def quantileUnion(q: Double, eps: Double = 0.01)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new UnionAgg(q, eps), Encoders.BINARY)
}
