package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{functions => F}

import scala.collection.mutable

/** KMV ("k minimum values") distinct sketch with theta-sketch set
  * algebra — the mergeable sketch family that, unlike HLL, supports a
  * DIRECT intersection estimate (Beyer et al., SIGMOD'07; the
  * DataSketches theta sketch is the production descendant). HLL can
  * only reach |A∩B| by inclusion–exclusion over three sketches
  * ([[graft.operators.Overlap]]), whose error scales with |A∪B|; KMV
  * intersects the retained SAMPLES, so small-overlap estimates degrade
  * gracefully and three-way and filtered set expressions stay one
  * sketch-combine away.
  *
  * State is the set of the k smallest (unsigned) 64-bit hashes seen —
  * a uniform sample of the distinct-value space. Dedup is intrinsic
  * (set semantics), so the sketch is a pure function of the VALUE SET:
  * any partitioning, any merge order, any duplication produces the
  * bit-identical sketch (PropertySpec asserts it). Merging unions the
  * sets and re-caps at k — associative, commutative, idempotent: safe
  * as a rollup-cell payload under arbitrary re-aggregation, exactly
  * like the HLL/GK cells ([[QuantileSketch]]) this engine already
  * stores.
  *
  * The aggregator emits the sketch as an unsigned-ascending
  * `array<bigint>` COLUMN, and every estimator below is plain Column
  * arithmetic over that array (codegen'd, no UDF):
  *   - distinct:  exact |S| while |S| < k, else (k−1)/u(x₍ₖ₎)
  *   - θ (inclusion threshold): 1.0 unsaturated, else u(x₍ₖ₎)
  *   - |A∩B|: |{x ∈ A∩B : u(x) < θ}| / θ with θ = min(θ_A, θ_B)
  * where u maps a hash to (0,1) by its unsigned position. Feed it
  * `xxhash64(value)` so the hash, and therefore every estimate, is
  * engine- and partitioning-independent.
  *
  * Scale shape: per-group state is k longs (k=1024 ⇒ 8 KiB), map-side
  * combined; the relative error is ~1/√(k−2) ≈ 3% at k=1024. At
  * 100 TB the sketch column rides the same daily-rollup cells as the
  * HLL and quantile sketches and serves any date range by lossless
  * union.
  */
class KmvSketch(k: Int)
    extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  require(k >= 2, s"kmv needs k >= 2, got $k")

  // Buffer = the retained hashes, ALWAYS unsigned-ascending and
  // duplicate-free — a flat primitive array (native encoder, no Kryo),
  // O(1) rejection of anything at/above the current kth minimum (the
  // hot path once warm: acceptance probability decays as k/seen).
  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], boxed: java.lang.Long): Array[Long] =
    if (boxed == null) buf else KmvSketch.insert(buf, boxed.longValue(), k)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    KmvSketch.union(a, b, k)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Second-level KMV aggregation: unions already-built sketch COLUMNS
  * (the rollup-serve face — daily cells in, one range sketch out).
  * Because a KMV sketch is a pure function of the value SET, cell
  * union is not merely "lossless within error": the unioned sketch is
  * BIT-IDENTICAL to sketching the raw rows (q170 and PropertySpec
  * assert equality, not a bound) — so a rollup can serve any date
  * range with zero estimate drift vs the fact table. */
class KmvUnion(k: Int)
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  require(k >= 2, s"kmv needs k >= 2, got $k")
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], sk: Seq[Long]): Array[Long] =
    if (sk == null) buf
    else { var acc = buf; sk.foreach(v => acc = KmvSketch.insert(acc, v, k)); acc }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    KmvSketch.union(a, b, k)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvSketch {
  /** Bounded sorted-insert shared by both aggregators: keeps `buf`
    * unsigned-ascending, duplicate-free, capped at k. */
  private[functions] def insert(buf: Array[Long], v: Long, k: Int): Array[Long] = {
    val key = v ^ Long.MinValue
    val n = buf.length
    if (n == k && key >= (buf(n - 1) ^ Long.MinValue)) return buf
    var lo = 0; var hi = n
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if ((buf(m) ^ Long.MinValue) < key) lo = m + 1 else hi = m
    }
    if (lo < n && buf(lo) == v) return buf // duplicate
    val outLen = math.min(n + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, lo)
    out(lo) = v
    System.arraycopy(buf, lo, out, lo + 1, outLen - lo - 1)
    out
  }

  private[functions] def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    var acc = a; var i = 0
    while (i < b.length) { acc = insert(acc, b(i), k); i += 1 }
    acc
  }

  /** `agg(kmv(1024)(xxhash64(col)))` — untyped column form. */
  def apply(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    F.udaf(new KmvSketch(k), Encoders.LONG)

  /** `agg(kmvUnion(1024)(sketchCol))` — rollup-cell union form. */
  def unionAgg(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    F.udaf(new KmvUnion(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())

  private val Two64 = 1.8446744073709552e19 // 2^64 as double

  /** Unsigned position of a hash in (0,1): unsigned(x)/2^64, computed
    * by flipping the sign bit (unsigned order ≡ signed order of
    * x ⊕ 2^63) and re-centering: (signed(x ⊕ 2^63) + 2^63 + 0.5)/2^64.
    * The +0.5 keeps u strictly positive (division-safe) and unbiased. */
  def u(x: Column): Column =
    (x.bitwiseXOR(F.lit(Long.MinValue)).cast("double") / Two64) + 0.5 +
      (0.5 / Two64)

  /** Inclusion threshold θ: everything the sketch retains BELOW θ is a
    * uniform sample of the value set at rate θ. 1.0 while unsaturated
    * (the sketch is the exact set), else u of the kth minimum. */
  def theta(sk: Column, k: Int): Column =
    F.when(F.size(sk) < k, F.lit(1.0)).otherwise(u(F.element_at(sk, k)))

  /** Distinct-count estimate: exact below saturation, (k−1)/u(x₍ₖ₎)
    * at it. */
  def estimateDistinct(sk: Column, k: Int): Column =
    F.when(F.size(sk) < k, F.size(sk).cast("double"))
      .otherwise(F.lit(k - 1).cast("double") / u(F.element_at(sk, k)))

  /** |A∩B| estimate by theta-sketch combine: count the common hashes
    * under the joint threshold, divide by it. Pure Column arithmetic
    * over the two array columns. */
  def estimateIntersection(a: Column, b: Column, k: Int): Column = {
    val th = F.least(theta(a, k), theta(b, k))
    F.size(F.filter(F.array_intersect(a, b), x => u(x) < th))
      .cast("double") / th
  }

  /** |A∪B| estimate under the same joint-threshold rule (provided for
    * set-expression completeness; a merged sketch gives the same). */
  def estimateUnion(a: Column, b: Column, k: Int): Column = {
    val th = F.least(theta(a, k), theta(b, k))
    F.size(F.filter(F.array_union(a, b), x => u(x) < th))
      .cast("double") / th
  }

  /** |A\B| estimate — the set op HLL cannot express at all. Sound
    * because membership of a sub-θ sample hash is decidable from B's
    * RETAINED set alone: u(x) < θ ≤ θ_B means x ∈ B ⟺ x ∈ B's sample. */
  def estimateDifference(a: Column, b: Column, k: Int): Column = {
    val th = F.least(theta(a, k), theta(b, k))
    F.size(F.filter(F.array_except(a, b), x => u(x) < th))
      .cast("double") / th
  }

  /** |A∩B∩C| — the joint threshold extends to any arity; every
    * retained hash under min-θ is a uniform sample of all three sets'
    * union space, so the count scales by 1/θ exactly as pairwise. */
  def estimateIntersection3(a: Column, b: Column, c: Column, k: Int): Column = {
    val th = F.least(theta(a, k), theta(b, k), theta(c, k))
    F.size(F.filter(F.array_intersect(F.array_intersect(a, b), c),
      x => u(x) < th)).cast("double") / th
  }
}
