package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the LLM-pipeline operators — native
  * `Expression`s (preference order per the build brief: compose built-ins >
  * custom Expression > full plan node > mapPartitions). Both are
  * single-pass over their input arrays and participate in whole-stage
  * codegen via `doGenCode`, so they stay inside the generated loop instead
  * of falling back to interpreted eval.
  */

/** 64-bit SimHash over a pre-tokenized array<string>: each token is
  * xxhash64'd; per bit position the +1/−1 votes are tallied; the sign
  * becomes the output bit. One pass per row, no shuffle — near-dup
  * detection then bands the 64 bits into 16-bit chunks (see
  * [[graft.llm.Dedup.simHashPairs]]).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    SimHash64.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def apply(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))
}

/** Random-hyperplane LSH signature of an array<float> embedding: the
  * sign bits of `nBits` fixed-seed gaussian hyperplane dots, packed into
  * a long. One fused loop per row in codegen — the HOF formulation
  * (per-plane zip_with + aggregate) dispatched an interpreted lambda per
  * element per plane, and with tables × bits planes per row that
  * constant dominated every LSH path (the NgramStats lesson applied to
  * embeddings). Bit-compatible with the HOF version: products in FLOAT
  * precision, accumulated left-to-right in double, bit i set iff
  * dot ≥ 0 (LlmSpec pins the equivalence).
  */
case class HyperplaneSig(child: Expression, dim: Int, nBits: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sig needs array<float>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    HyperplaneSig.compute(v.asInstanceOf[ArrayData], dim, nBits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HyperplaneSig.compute($a, $dim, $nBits, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_sig"
}

object HyperplaneSig {
  // planes are deterministic in (dim, nBits, seed) and tiny (nBits×dim
  // floats); memoized per JVM so codegen's static call never re-draws
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Array[Float]]]()

  private def planes(dim: Int, nBits: Int, seed: Long): Array[Array[Float]] =
    cache.computeIfAbsent((dim, nBits, seed), { key =>
      val (d, b, s) = key
      // EXACTLY Similarity.hyperplanes' draw order (Random(seed), row-major)
      val rnd = new scala.util.Random(s)
      Array.fill(b)(Array.fill(d)(rnd.nextGaussian().toFloat))
    })

  def compute(a: ArrayData, dim: Int, nBits: Int, seed: Long): Long = {
    val ps = planes(dim, nBits, seed)
    val n = math.min(a.numElements(), dim)
    var sig = 0L
    var i = 0
    while (i < nBits) {
      val p = ps(i)
      var dot = 0.0
      var j = 0
      while (j < n) {
        // float multiply then double accumulate — the HOF formula's
        // precision, kept for bit-identical signatures
        dot += (a.getFloat(j) * p(j)).toDouble
        j += 1
      }
      if (dot >= 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  def apply(emb: Column, dim: Int, nBits: Int, seed: Long): Column =
    GraftBridge.column(HyperplaneSig(GraftBridge.expression(emb), dim, nBits, seed))
}

/** Nearest centroid of an array<float> embedding by cosine, returning
  * struct(cell int, sim double) in ONE fused loop: the embedding's norm
  * is computed once and every centroid norm is precomputed, where the
  * previous formulation — a flat array of per-centroid [[CosineSim]]
  * columns — recomputed the embedding norm per centroid (3× the flops)
  * and materialized an L-wide array per row just to argmax it.
  * Bit-compatible with that formulation: identical double arithmetic
  * per score (same summation order as CosineSim.compute), ties broken
  * by the FIRST maximal cell (array_position semantics); LlmSpec pins
  * the equivalence. Centroids ride the codegen references array
  * (`addReferenceObj`) — they are literals of the compiled plan, same
  * index-snapshot semantics as before.
  */
case class NearestCell(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cell needs array<float>, got $other")
    }

  @transient private lazy val norms: Array[Double] =
    centroids.map { c =>
      var s = 0.0; var j = 0
      while (j < c.length) { val x = c(j).toDouble; s += x * x; j += 1 }
      math.sqrt(s)
    }

  override def nullSafeEval(v: Any): Any =
    NearestCell.compute(v.asInstanceOf[ArrayData], centroids, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val nRef = ctx.addReferenceObj("cnorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NearestCell.compute($a, $cRef, $nRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
  override def prettyName: String = "nearest_cell"
}

object NearestCell {
  def compute(a: ArrayData, cs: Array[Array[Float]],
      norms: Array[Double]): InternalRow = {
    val n = a.numElements()
    var na = 0.0
    var j = 0
    while (j < n) { val x = a.getFloat(j).toDouble; na += x * x; j += 1 }
    val aNorm = math.sqrt(na)
    var best = Double.NegativeInfinity
    var cell = 0
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      val m = math.min(n, c.length)
      var dot = 0.0
      j = 0
      while (j < m) { dot += a.getFloat(j).toDouble * c(j).toDouble; j += 1 }
      val denom = aNorm * norms(i)
      val score = if (denom == 0.0) 0.0 else dot / denom
      if (score > best) { best = score; cell = i }
      i += 1
    }
    new GenericInternalRow(Array[Any](cell, best))
  }

  def apply(emb: Column, centroids: Array[Array[Float]]): Column =
    GraftBridge.column(NearestCell(GraftBridge.expression(emb), centroids))
}

/** Two-level (routed) nearest-centroid assignment: score the S coarse
  * super-centroids, then scan only the member centroids of the
  * `superProbe` best super-cells — ~S + probe·L/S cosines per row
  * instead of L. At L = √n cells with S = √L this takes assignment from
  * O(n·√n) to O(n·n^0.25): the hierarchical swap point the single-level
  * IVF scaladocs document for ≥10⁸-vector corpora. APPROXIMATE by
  * construction (the true argmax may live in an unprobed super-cell —
  * same recall trade as faiss's coarse quantizer); `superProbe >=
  * superCentroids.length` degenerates to an exhaustive scan and is
  * bit-equal to [[NearestCell]] (ties break to the LOWEST cell id here
  * regardless of probe order, matching NearestCell's first-maximal
  * scan; LlmSpec pins the equivalence). Output struct(cell, sim); all
  * level arrays ride the codegen references (plan literals).
  */
case class RoutedNearestCell(
    child: Expression, centroids: Array[Array[Float]],
    superCentroids: Array[Array[Float]], members: Array[Array[Int]],
    superProbe: Int) extends UnaryExpression {
  require(superCentroids.length == members.length, "one member list per super-cell")
  require(superProbe >= 1)
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"routed_nearest_cell needs array<float>, got $other")
    }

  @transient private lazy val norms: Array[Double] =
    centroids.map(RoutedNearestCell.norm)
  @transient private lazy val superNorms: Array[Double] =
    superCentroids.map(RoutedNearestCell.norm)

  override def nullSafeEval(v: Any): Any =
    RoutedNearestCell.compute(v.asInstanceOf[ArrayData], centroids, norms,
      superCentroids, superNorms, members, superProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val nRef = ctx.addReferenceObj("cnorms", norms, "double[]")
    val sRef = ctx.addReferenceObj("supers", superCentroids, "float[][]")
    val snRef = ctx.addReferenceObj("snorms", superNorms, "double[]")
    val mRef = ctx.addReferenceObj("members", members, "int[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RoutedNearestCell.compute(" +
        s"$a, $cRef, $nRef, $sRef, $snRef, $mRef, $superProbe);")
  }

  override protected def withNewChildInternal(newChild: Expression): RoutedNearestCell =
    copy(child = newChild)
  override def prettyName: String = "routed_nearest_cell"
}

object RoutedNearestCell {
  private[graft] def norm(c: Array[Float]): Double = {
    var s = 0.0; var j = 0
    while (j < c.length) { val x = c(j).toDouble; s += x * x; j += 1 }
    math.sqrt(s)
  }

  def compute(
      a: ArrayData, cs: Array[Array[Float]], norms: Array[Double],
      supers: Array[Array[Float]], superNorms: Array[Double],
      members: Array[Array[Int]], superProbe: Int): InternalRow = {
    val n = a.numElements()
    var na = 0.0
    var j = 0
    while (j < n) { val x = a.getFloat(j).toDouble; na += x * x; j += 1 }
    val aNorm = math.sqrt(na)
    def score(c: Array[Float], cNorm: Double): Double = {
      val m = math.min(n, c.length)
      var dot = 0.0
      var i = 0
      while (i < m) { dot += a.getFloat(i).toDouble * c(i).toDouble; i += 1 }
      val denom = aNorm * cNorm
      if (denom == 0.0) 0.0 else dot / denom
    }
    // top-`probe` super-cells by insertion into a tiny sorted buffer
    // (probe is 2-4; S is at most a few hundred — no heap needed).
    // Ties rank the lower super-cell id first, for determinism.
    val s = supers.length
    val probe = math.min(superProbe, s)
    val topIdx = new Array[Int](probe)
    val topScore = new Array[Double](probe)
    java.util.Arrays.fill(topScore, Double.NegativeInfinity)
    var si = 0
    while (si < s) {
      val sc = score(supers(si), superNorms(si))
      var p = probe - 1
      if (sc > topScore(p)) {
        while (p > 0 && sc > topScore(p - 1)) {
          topScore(p) = topScore(p - 1); topIdx(p) = topIdx(p - 1); p -= 1
        }
        topScore(p) = sc; topIdx(p) = si
      }
      si += 1
    }
    var best = Double.NegativeInfinity
    var cell = Int.MaxValue
    var pi = 0
    while (pi < probe) {
      if (topScore(pi) > Double.NegativeInfinity) {
        val mem = members(topIdx(pi))
        var mi = 0
        while (mi < mem.length) {
          val id = mem(mi)
          val sc = score(cs(id), norms(id))
          // lowest-id tie-break independent of probe order — matches
          // NearestCell's first-maximal semantics exactly
          if (sc > best || (sc == best && id < cell)) { best = sc; cell = id }
          mi += 1
        }
      }
      pi += 1
    }
    if (cell == Int.MaxValue) cell = 0 // empty probe set: degenerate input
    new GenericInternalRow(Array[Any](cell, best))
  }

  def apply(emb: Column, centroids: Array[Array[Float]],
      superCentroids: Array[Array[Float]], members: Array[Array[Int]],
      superProbe: Int): Column =
    GraftBridge.column(RoutedNearestCell(GraftBridge.expression(emb),
      centroids, superCentroids, members, superProbe))
}

/** Cosine similarity between two array<float> embeddings, computed in
  * double precision in a single fused loop. The codegen path keeps the
  * whole ANN scoring stage inside one generated function — no boxing, no
  * per-element lambda dispatch (vs composing zip_with + aggregate).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim needs (array<float>, array<float>), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    CosineSim.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSim.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  def apply(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Karp–Rabin-style 64-bit polynomial rolling hash of a string — the
  * document-fingerprint primitive (content-defined, order-sensitive,
  * unlike the bag-of-words md5 normal form). base 1000003, native
  * wrap-around arithmetic.
  */
case class PolyHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"polyhash64 needs string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    PolyHash64.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
  override def prettyName: String = "polyhash64"
}

object PolyHash64 {
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + bytes(i)
      i += 1
    }
    h
  }

  def apply(c: Column): Column =
    GraftBridge.column(PolyHash64(GraftBridge.expression(c)))
}

/** Distinct word k-shingles of a token array, in first-occurrence order —
  * single pass, one output allocation. Replaces the composed
  * `transform(sequence, slice, concat_ws) + array_distinct` form, whose
  * higher-order functions evaluate interpreted and re-allocate per
  * position (≈10× slower at bench scale).
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles needs array<string>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    WordShingles.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](2 * k - 1)
      var j = 0
      while (j < k) {
        parts(2 * j) = toks.getUTF8String(i + j)
        if (j < k - 1) parts(2 * j + 1) = Space
        j += 1
      }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def apply(c: Column, k: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(c), k))
}

/** Point-frequency estimate from a serialized Spark `CountMinSketch`
  * (the binary `F.count_min_sketch` emits). The sketch is the mergeable
  * frequency summary for 100 TB streams — partial sketches combine
  * map-side and across batches; this expression reads estimates back at
  * the result edge. Eval-only (`CodegenFallback`): it runs over a
  * handful of post-aggregation rows, never inside the scan loop, and
  * deserialization is memoized per-partition below.
  *
  * Items must be estimated the same way the aggregate added them:
  * integral types via the long path, strings via their UTF-8 bytes.
  */
case class CmsEstimate(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType | LongType | ShortType | ByteType | StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_estimate needs (binary sketch, integral or string item), got $other")
    }

  // single-entry last-sketch memo, not a map: rows of one frame usually
  // carry a handful of distinct sketches CONSECUTIVELY (one per group),
  // so a last-seen memo gets the same hit rate at O(1) memory — an
  // unbounded map would grow with distinct sketch count for the life of
  // a cached plan. One volatile reference: a racing re-read only costs
  // a redundant deserialize, never a torn pair.
  @transient @volatile private var memo:
    (Array[Byte], org.apache.spark.util.sketch.CountMinSketch) = _

  override def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    val m = memo
    val cms =
      if (m != null && java.util.Arrays.equals(m._1, bytes)) m._2
      else {
        val c = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(bytes))
        memo = (bytes, c)
        c
      }
    item match {
      case s: UTF8String => cms.estimateCount(s.getBytes)
      case i: Integer => cms.estimateCount(java.lang.Long.valueOf(i.longValue))
      case other => cms.estimateCount(other)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "cms_estimate"
}

object CmsEstimate {
  def apply(sketch: Column, item: Column): Column =
    GraftBridge.column(CmsEstimate(GraftBridge.expression(sketch), GraftBridge.expression(item)))
}

/** Furthest funnel stage reached from a per-user, ts-sorted
  * array<struct<ts:long, step:int>>: anchor at the FIRST step-0 event
  * (first-touch attribution), then greedily take the earliest event of
  * each next step with ts strictly increasing and within `windowMicros`
  * of the anchor. Returns 0..nSteps. Greedy-earliest is optimal for a
  * fixed anchor: taking the earliest valid event can only leave more
  * room for later steps. One pass per user, codegen'd — the funnel
  * aggregation is ONE shuffle (the per-user collect), matching the
  * mergeable-state design ClickHouse's windowFunnel uses, instead of a
  * join per funnel step.
  */
case class FunnelStage(child: Expression, windowMicros: Long, nSteps: Int,
    anyAnchor: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == 2 &&
          s(0).dataType == LongType && s(1).dataType == IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"funnel_stage needs array<struct<long,int>> (ts, step), got $other")
    }

  override def nullSafeEval(v: Any): Any =
    if (anyAnchor) FunnelStage.computeAny(v.asInstanceOf[ArrayData], windowMicros, nSteps)
    else FunnelStage.compute(v.asInstanceOf[ArrayData], windowMicros, nSteps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (anyAnchor) "computeAny" else "compute"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FunnelStage.$fn($c, ${windowMicros}L, $nSteps);")
  }

  override protected def withNewChildInternal(newChild: Expression): FunnelStage =
    copy(child = newChild)
  override def prettyName: String = "funnel_stage"
}

object FunnelStage {
  def compute(ev: ArrayData, windowMicros: Long, nSteps: Int): Int = {
    val n = ev.numElements()
    var stage = 0
    var anchor = 0L
    var prev = 0L
    var i = 0
    while (i < n && stage < nSteps) {
      val row = ev.getStruct(i, 2)
      val ts = row.getLong(0)
      val st = row.getInt(1)
      if (stage == 0) {
        if (st == 0) { anchor = ts; prev = ts; stage = 1 }
      } else if (st == stage && ts > prev && ts <= anchor + windowMicros) {
        prev = ts; stage += 1
      }
      i += 1
    }
    stage
  }

  /** ANY-anchor variant (ClickHouse windowFunnel semantics): the chain
    * may start at ANY step-0 event, not just the first — returns the
    * longest strictly-ordered chain completable within `windowMicros`
    * of its own start. Standard DP over the ts-sorted events:
    * `best(k)` = the LATEST start time of any chain reaching k steps
    * (a later start maximizes remaining window headroom, so it
    * dominates). Updates at one timestamp are committed only when ts
    * advances, preserving the strict `>` between chain steps under
    * ties. Single pass, O(events × steps) worst case.
    */
  def computeAny(ev: ArrayData, windowMicros: Long, nSteps: Int): Int = {
    val n = ev.numElements()
    val NoneTs = Long.MinValue
    val best = Array.fill(nSteps + 1)(NoneTs) // best(k): latest chain start reaching k steps
    val pend = Array.fill(nSteps + 1)(NoneTs) // per-level updates buffered within one ts
    def commit(): Unit = {
      var k = 1
      while (k <= nSteps) {
        if (pend(k) > best(k)) best(k) = pend(k)
        pend(k) = NoneTs
        k += 1
      }
    }
    var lastTs = NoneTs
    var i = 0
    while (i < n) {
      val row = ev.getStruct(i, 2)
      val ts = row.getLong(0)
      val st = row.getInt(1)
      if (ts != lastTs) { commit(); lastTs = ts }
      if (st == 0) {
        if (ts > pend(1)) pend(1) = ts
      } else if (st <= nSteps - 1 && best(st) != NoneTs &&
          ts <= best(st) + windowMicros) {
        if (best(st) > pend(st + 1)) pend(st + 1) = best(st)
      }
      i += 1
    }
    commit()
    var k = nSteps
    while (k > 0 && best(k) == NoneTs) k -= 1
    k
  }

  def apply(c: Column, windowMicros: Long, nSteps: Int, anyAnchor: Boolean): Column =
    GraftBridge.column(FunnelStage(GraftBridge.expression(c), windowMicros, nSteps, anyAnchor))
}

/** Greedy non-overlapping pattern-occurrence count over a (ts, step)-
  * sorted event array — ClickHouse `sequenceCount('(?1).*(?2).*…')`
  * (and `sequenceMatch` = count > 0). The automaton advances one stage
  * per matching element in sorted order and restarts after each complete
  * chain; greedy-leftmost completion is optimal for disjoint subsequence
  * counting, so the result is the true maximum. Event order is the
  * deterministic lexicographic (ts, step) sort — ClickHouse leaves
  * same-timestamp order undefined; we pin it. Same input shape and
  * single-aggregation plan as [[FunnelStage]] (ref: the ClickHouse
  * backend's sequence aggregates behind activecube metrics).
  */
case class SeqCount(child: Expression, nSteps: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == 2 &&
          s(0).dataType == LongType && s(1).dataType == IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"seq_count needs array<struct<long,int>> (ts, step), got $other")
    }

  override def nullSafeEval(v: Any): Any =
    SeqCount.compute(v.asInstanceOf[ArrayData], nSteps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SeqCount.compute($c, $nSteps);")

  override protected def withNewChildInternal(newChild: Expression): SeqCount =
    copy(child = newChild)
  override def prettyName: String = "seq_count"
}

object SeqCount {
  def compute(ev: ArrayData, nSteps: Int): Int = {
    val n = ev.numElements()
    var stage = 0
    var cnt = 0
    var i = 0
    while (i < n) {
      if (ev.getStruct(i, 2).getInt(1) == stage) {
        stage += 1
        if (stage == nSteps) { cnt += 1; stage = 0 }
      }
      i += 1
    }
    cnt
  }

  def apply(c: Column, nSteps: Int): Column =
    GraftBridge.column(SeqCount(GraftBridge.expression(c), nSteps))
}

/** Next-fit bin count over an (id, n_tokens)-sorted doc array —
  * sequence packing's per-group aggregate face. Walks docs in id order
  * keeping ONE open bin: a doc that fits the remaining capacity joins
  * it, otherwise the bin closes and a new one opens; docs at or above
  * the cap take a bin of their own and close the current bin. The fold
  * is deterministic in the sorted input, so the result is mirrorable by
  * any engine replaying the same walk (unlike
  * [[graft.llm.Packing.packSequences]]' first-fit over partition-local
  * open-bin windows, whose bin ids depend on partitioning — that
  * remains the unbounded streaming path; this is the cube-metric form,
  * per-group state bounded by the group's own docs like [[SeqCount]]).
  * Ref: the reference delegates such custom aggregation to its backend
  * (parse_tree.rb:88 measure dispatch); training-data packing itself is
  * from the LLM-pipeline brief, not the reference surface.
  */
case class NextFitBins(child: Expression, maxTokens: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == 2 &&
          s(0).dataType == LongType && s(1).dataType == IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"next_fit_bins needs array<struct<long,int>> (id, n_tokens), got $other")
    }

  override def nullSafeEval(v: Any): Any =
    NextFitBins.compute(v.asInstanceOf[ArrayData], maxTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NextFitBins.compute($c, $maxTokens);")

  override protected def withNewChildInternal(newChild: Expression): NextFitBins =
    copy(child = newChild)
  override def prettyName: String = "next_fit_bins"
}

object NextFitBins {
  def compute(ev: ArrayData, cap: Int): Int = {
    val n = ev.numElements()
    var bins = 0
    var rem = 0
    var i = 0
    while (i < n) {
      val raw = ev.getStruct(i, 2).getInt(1)
      val t = if (raw < 0) 0 else raw
      if (t >= cap) { bins += 1; rem = 0 } // oversize: own bin, closes current
      else if (bins > 0 && rem >= t) rem -= t
      else { bins += 1; rem = cap - t }
      i += 1
    }
    bins
  }

  def apply(c: Column, maxTokens: Int): Column =
    GraftBridge.column(NextFitBins(GraftBridge.expression(c), maxTokens))
}

/** One-pass word n-gram statistics over raw text:
  * struct(total, distinct, top) where `top` is the modal n-gram's
  * occurrence count. The repetition-quality signals (Gopher duplicate-
  * ngram fraction, modal coverage) are ratios of these three ints.
  *
  * Exists for the same reason as [[MinHashSig]]: the declarative form
  * (transform/slice to build grams, then array_distinct + a filter per
  * distinct gram) is interpreted per-row and quadratic — 410 s for the
  * 5 000-doc sf0.1 profile. This expression tokenizes once (identical
  * semantics to `split(trim(text), "\\s+")`), streams the grams through
  * one hash map, and codegens to a static call: linear per row, whole-
  * stage friendly. 0.41 s for the same profile.
  */
case class NgramStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "ngram_stats needs n >= 1")
  override def dataType: DataType = NgramStats.schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_stats needs a string column, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    NgramStats.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramStats.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramStats =
    copy(child = newChild)
  override def prettyName: String = "ngram_stats"
}

object NgramStats {
  val schema: StructType = StructType(Seq(
    StructField("total", IntegerType, nullable = false),
    StructField("distinct", IntegerType, nullable = false),
    StructField("top", IntegerType, nullable = false)))

  /** Same tokenization as `F.split(F.trim(text), "\\s+")`: UTF8String
    * .trim strips ASCII SPACES ONLY (Java String.trim would also strip
    * tabs/newlines and silently drop the leading empty token Spark's
    * form produces); then Java regex split with limit -1, matching
    * Spark's StringSplit. */
  def compute(text: UTF8String, n: Int): InternalRow = {
    val toks = text.trim.toString.split("\\s+", -1)
    val total = toks.length - (n - 1)
    if (total <= 0) return new GenericInternalRow(Array[Any](0, 0, 0))
    val counts = new java.util.HashMap[String, Int](total * 2)
    val sb = new java.lang.StringBuilder()
    var top = 0
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1, Integer.sum)
      if (c > top) top = c
      i += 1
    }
    new GenericInternalRow(Array[Any](total, counts.size(), top))
  }

  def apply(c: Column, n: Int): Column =
    GraftBridge.column(NgramStats(GraftBridge.expression(c), n))
}

/** Row-local MinHash signature over array<string> shingles: each element
  * is xxhash64'd ONCE (seed 42, identical to `F.xxhash64`), folded to
  * [0, 2^32) and run through k fixed-seed affine permutations mod the
  * Mersenne prime 2^61-1 — bit-identical to the explode → xxhash64 →
  * affine → min-aggregate pipeline it replaces, but with NO exchange:
  * the signature never leaves the row, so the only shuffle left in
  * MinHash dedup is the band join itself. a < 2^30 keeps a*x + b inside
  * a signed long (x < 2^32) even under ANSI overflow checking.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<string> or array<long>, got $other")
    }

  private def isString: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == StringType

  override def nullSafeEval(v: Any): Any =
    MinHashSig.compute(v.asInstanceOf[ArrayData], numHashes, seed, isString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $numHashes, ${seed}L, $isString);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  private val MersennePrime = (1L << 61) - 1

  /** Same draw order as the original pipeline's coefficient seeding, so
    * signatures are reproducible across engine versions. */
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()
  private def coeffs(numHashes: Int, seed: Long): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent((numHashes, seed), { case (k, s) =>
      val rnd = new scala.util.Random(s)
      val as = new Array[Long](k)
      val bs = new Array[Long](k)
      var i = 0
      while (i < k) {
        as(i) = 1L + rnd.nextLong((1L << 30) - 1)
        bs(i) = rnd.nextLong(MersennePrime)
        i += 1
      }
      (as, bs)
    })

  def compute(arr: ArrayData, numHashes: Int, seed: Long, isString: Boolean): ArrayData = {
    val (as, bs) = coeffs(numHashes, seed)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // same element hash as F.xxhash64 (seed 42): bytes for strings,
        // XXH64.hashLong for longs — signatures match the SQL pipeline
        val h =
          if (isString) {
            val s = arr.getUTF8String(i)
            XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
          } else XXH64.hashLong(arr.getLong(i), 42L)
        val x = h & 0xFFFFFFFFL // == pmod(h, 2^32)
        var j = 0
        while (j < numHashes) {
          val v = (x * as(j) + bs(j)) % MersennePrime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  def apply(c: Column, numHashes: Int, seed: Long): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), numHashes, seed))
}

/** Greedy longest-match subword tokenization against a fixed vocabulary
  * — the tokenizer-APPLY operator (WordPiece-style greedy segmentation;
  * the inference-time half of BPE: a trained merge table flattened to
  * its vocab segments the same way under longest-match). Per
  * whitespace word, repeatedly emit the longest vocabulary entry
  * prefixing the remaining characters; a character matched by no entry
  * is emitted as itself (its non-membership in the vocab marks it
  * unknown — the guaranteed-progress fallback). Deterministic: two
  * distinct vocab entries of equal length cannot both match the same
  * position, so the longest match is unique.
  *
  * Row-local and codegen'd: the vocab rides the plan as a codegen
  * reference (hash set + max entry length, built once per instance),
  * each row costs O(chars × maxEntryLen) substring probes, and NOTHING
  * shuffles — real token counts for packing/mixture/chunking budgets
  * come from `size()` over this array, replacing the whitespace
  * approximation without changing any downstream operator (they all
  * take the count as a Column). For production-size vocabs (~50k
  * entries) the reference object serializes once per executor with the
  * plan, not per row. Word boundaries follow `split(trim(text),
  * "\s+")` — identical to every other text op here.
  */
case class SubwordEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"subword_encode needs string, got $other")
    }

  @transient private lazy val table: SubwordEncode.Table =
    SubwordEncode.buildTable(vocab)

  override def nullSafeEval(v: Any): Any =
    SubwordEncode.compute(v.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("subwordVocab", table,
      classOf[SubwordEncode.Table].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SubwordEncode.compute($c, $tRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordEncode =
    copy(child = newChild)
  override def prettyName: String = "subword_encode"
}

object SubwordEncode {
  final class Table(val set: java.util.HashSet[String], val maxLen: Int)
    extends Serializable

  def buildTable(vocab: Seq[String]): Table = {
    val set = new java.util.HashSet[String](math.max(16, vocab.size * 2))
    var maxLen = 1
    vocab.foreach { v =>
      require(v.nonEmpty, "vocab entries must be non-empty")
      set.add(v)
      if (v.length > maxLen) maxLen = v.length
    }
    new Table(set, maxLen)
  }

  def compute(text: UTF8String, table: Table): ArrayData = {
    val out = new java.util.ArrayList[Any]()
    // same word boundaries as split(trim(text), "\s+")
    val words = text.toString.trim.split("\\s+")
    var w = 0
    while (w < words.length) {
      val word = words(w)
      val n = word.length
      var pos = 0
      while (pos < n) {
        var l = math.min(table.maxLen, n - pos)
        var hit = 1 // fallback: single unknown char
        var found = false
        while (!found && l >= 1) {
          if (table.set.contains(word.substring(pos, pos + l))) {
            hit = l; found = true
          }
          l -= 1
        }
        out.add(UTF8String.fromString(word.substring(pos, pos + hit)))
        pos += hit
      }
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  def apply(c: Column, vocab: Seq[String]): Column =
    GraftBridge.column(SubwordEncode(GraftBridge.expression(c), vocab))
}

/** Product-quantization encoder: split an array<float> embedding into
  * M subspaces of dim/M and emit, per subspace, the index of the
  * nearest (L2) codebook centroid — array<int> of length M, the
  * compressed form of the vector (M small ints vs dim floats: the
  * 100 TB ANN memory/IO lever — see [[graft.llm.Similarity.pqTopK]]).
  * Row-local, one fused loop, codebooks ride the codegen references
  * array as plan literals. Ties break to the LOWEST code, so encoding
  * is deterministic. A vector shorter than M·subDim treats missing
  * components as 0 (mirrors [[NearestCell]]'s min-guard).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode needs array<float>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    PqEncode.compute(v.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PqEncode.compute($a, $cbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

object PqEncode {
  def compute(a: ArrayData, cbs: Array[Array[Array[Float]]]): ArrayData = {
    val m = cbs.length
    val codes = new Array[Any](m)
    val n = a.numElements()
    var base = 0
    var s = 0
    while (s < m) {
      val book = cbs(s)
      val subDim = if (book.length > 0) book(0).length else 0
      var best = Double.MaxValue
      var bi = 0
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val x = (if (base + j < n) a.getFloat(base + j).toDouble else 0.0) -
            cent(j).toDouble
          d += x * x
          j += 1
        }
        if (d < best) { best = d; bi = c }
        c += 1
      }
      codes(s) = bi
      base += subDim
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  def apply(emb: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(emb), codebooks))
}

/** Asymmetric-distance (ADC) cosine between a FULL query vector and a
  * PQ-encoded corpus vector: the corpus side is reconstructed
  * centroid-by-centroid from its codes, so the score equals
  * cos(q, recon(codes)) exactly — approximate only in that recon ≈
  * the original vector. Per-centroid squared norms are precomputed, so
  * the reconstruction norm is M table lookups; the dot costs the same
  * flops as an exact scan but reads M ints per corpus row instead of
  * dim floats — the scan-bandwidth win PQ exists for.
  */
case class PqAdcCosine(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Float]]]) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_cosine needs (array<float>, array<int>), got $other")
    }

  @transient private lazy val normsSq: Array[Array[Double]] =
    codebooks.map(_.map { c =>
      var s = 0.0; var j = 0
      while (j < c.length) { val x = c(j).toDouble; s += x * x; j += 1 }
      s
    })

  override def nullSafeEval(q: Any, codes: Any): Any =
    PqAdcCosine.compute(q.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], codebooks, normsSq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    val nRef = ctx.addReferenceObj("normsSq", normsSq, "double[][]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.functions.PqAdcCosine.compute($q, $c, $cbRef, $nRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcCosine =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc_cosine"
}

object PqAdcCosine {
  def compute(q: ArrayData, codes: ArrayData, cbs: Array[Array[Array[Float]]],
      normsSq: Array[Array[Double]]): Double = {
    val n = q.numElements()
    var qs = 0.0
    var j = 0
    while (j < n) { val x = q.getFloat(j).toDouble; qs += x * x; j += 1 }
    val qNorm = math.sqrt(qs)
    val m = math.min(cbs.length, codes.numElements())
    var dot = 0.0
    var reconSq = 0.0
    var base = 0
    var s = 0
    while (s < m) {
      val book = cbs(s)
      val subDim = if (book.length > 0) book(0).length else 0
      val code = codes.getInt(s)
      if (code >= 0 && code < book.length) {
        val cent = book(code)
        var jj = 0
        while (jj < subDim) {
          if (base + jj < n) dot += q.getFloat(base + jj).toDouble * cent(jj).toDouble
          jj += 1
        }
        reconSq += normsSq(s)(code)
      }
      base += subDim
      s += 1
    }
    val denom = qNorm * math.sqrt(reconSq)
    if (denom == 0.0) 0.0 else dot / denom
  }

  def apply(qEmb: Column, codes: Column,
      codebooks: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(PqAdcCosine(GraftBridge.expression(qEmb),
      GraftBridge.expression(codes), codebooks))
}
