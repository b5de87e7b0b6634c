package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native vector math over `array<float>` embedding columns.
  *
  * These are the hot path of similarity search / embedding dedup: at 100 TB
  * a UDF would deserialize every array into boxed `Seq[Float]`; these
  * expressions read the columnar `ArrayData` floats directly inside
  * whole-stage codegen (one static call, no boxing, no serialization).
  * Accumulation is sequential left-to-right in double precision, which
  * makes results deterministic (independent of partitioning).
  */
object VectorOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** [[cosine]] with a `array<double>` right side — centroids produced by
    * [[graft.operators.Clustering]] are double-valued (means), while the
    * corpus vectors stay `array<float>`. Same sequential left-to-right
    * double accumulation, so results are partition-independent and match
    * the SQL oracle's list arithmetic bit-for-bit.
    */
  def cosineFD(a: ArrayData, c: ArrayData): Double = {
    val n = math.min(a.numElements(), c.numElements())
    var dot = 0.0
    var na = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      dot += x * c.getDouble(i)
      na += x * x
      i += 1
    }
    var nc = 0.0
    var j = 0
    val m = c.numElements()
    while (j < m) { val y = c.getDouble(j); nc += y * y; j += 1 }
    if (na == 0.0 || nc == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nc))
  }

  /** Int8 symmetric quantization in one pass: scale = max|x|/127, codes =
    * round-half-up(x/scale). Rounding goes through BigDecimal HALF_UP —
    * bit-identical to Spark's `round(col, 0)` (and DuckDB's `round`), so
    * the result carries a hash-matched oracle. One native call replaces
    * three interpreted lambda transforms whose trees Catalyst duplicates
    * into filters and generate pre-conditions (measurable planning cost).
    */
  def quantizeInt8(a: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = a.numElements()
    var mx = 0.0f
    var i = 0
    while (i < n) { val v = math.abs(a.getFloat(i)); if (v > mx) mx = v; i += 1 }
    val scale = mx.toDouble / 127.0
    val q = new Array[Int](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        q(i) = java.math.BigDecimal.valueOf(a.getFloat(i).toDouble / scale)
          .setScale(0, java.math.RoundingMode.HALF_UP).intValue()
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, new org.apache.spark.sql.catalyst.util.GenericArrayData(q)))
  }

  /** Product-quantization encode: per subspace, the L2-argmin code against
    * that subspace's codebook (ties toward the lowest code). Tight loops —
    * this is [[graft.operators.Pq]]'s per-row hot path; the codebook rides
    * into generated code as a reference object.
    */
  def pqEncode(a: ArrayData, cents: Array[Array[Array[Double]]]): ArrayData = {
    val m = cents.length
    val dsub = cents(0)(0).length
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = cents(s)
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < book.length) {
        val cv = book(j)
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = a.getFloat(s * dsub + t).toDouble - cv(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  /** Unit-normalize an `array<double>` into an `array<float>` in one
    * native pass, or null when the norm is zero (a zero vector has no
    * direction — the hashEmbed no-row contract). Bit-compatible with the
    * column formulation it replaces: the norm is the same sequential
    * left-to-right `Σx²` fold and `(x / norm).toFloat` is exactly
    * Spark's double→float cast. Exists because the column form cannot
    * be made safe: CollapseProject inlines a single-reference norm
    * alias back into the per-element lambda, silently restoring an
    * O(dim²)-per-row plan (measured — the r8 regression); a native
    * expression computes the norm exactly once and skips the
    * interpreted HOF entirely.
    */
  def normalizeD(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    val norm = math.sqrt(s)
    if (norm == 0.0) null
    else {
      val out = new Array[Float](n)
      i = 0
      while (i < n) { out(i) = (a.getDouble(i) / norm).toFloat; i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** Morton (Z-order) interleave of two `bits`-wide non-negative ints:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. The code
    * is the sort key for multi-column data clustering ([[graft.operators.ZOrder]]).
    */
  def interleaveBits(a: Long, b: Long, bits: Int): Long = {
    var code = 0L
    var i = 0
    while (i < bits) {
      code |= ((a >>> i) & 1L) << (2 * i)
      code |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    code
  }

  /** ADC lookup-sum: `Σ_s lut(s·ksub + codes(s))` — m array reads per
    * scored pair, no float vector math (see [[graft.operators.Pq.topK]]).
    */
  def adcScore(codes: ArrayData, lut: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var sc = 0.0
    var s = 0
    while (s < m) { sc += lut.getDouble(s * ksub + codes.getInt(s)); s += 1 }
    sc
  }

  /** Sign-random-projection (SimHash-for-vectors) signature: bit i of the
    * result is the sign of the dot product with a deterministic pseudo-random
    * hyperplane derived from (seed, i, dim). Used for LSH bucketing in ANN
    * search — vectors with small angle collide with high probability.
    */
  def srpSignature(a: ArrayData, bits: Int, seed: Long): Long = {
    var sig = 0L
    val n = a.numElements()
    var b = 0
    while (b < bits) {
      var s = 0.0
      var i = 0
      while (i < n) {
        // splitmix64-style mix of (seed, bit, dim) -> gaussian-ish weight in [-1,1)
        var z = seed + (b.toLong << 32) + i.toLong
        z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
        z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
        z = z ^ (z >>> 33)
        val w = (z >> 11).toDouble / (1L << 52).toDouble // [-1, 1)
        s += w * a.getFloat(i).toDouble
        i += 1
      }
      if (s >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  // hyperplane weights of the PORTABLE scheme, computed once per
  // (seed, bits, dim) — they do not depend on the row
  private val portableWeights =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Double]]()

  private def weightsFor(seed: Long, bits: Int, dim: Int): Array[Double] =
    portableWeights.computeIfAbsent((seed, bits, dim), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val w = new Array[Double](bits * dim)
      var b = 0
      while (b < bits) {
        var i = 0
        while (i < dim) {
          md.reset()
          val d = md.digest(s"w:$seed:$b:$i".getBytes("US-ASCII"))
          val h24 = ((d(0) & 0xFFL) << 16) | ((d(1) & 0xFFL) << 8) | (d(2) & 0xFFL)
          w(b * dim + i) = (h24 - 8388608L).toDouble / 8388608.0 // [-1, 1)
          i += 1
        }
        b += 1
      }
      w
    })

  /** PORTABLE [[srpSignature]]: weight(b, i) = (int24(md5("w:seed:b:i"))
    * − 2^23) / 2^23 — reproducible from ANSI SQL's md5(), so SRP-bucketed
    * operators can carry full oracles. Sign decisions are only
    * order-sensitive within one double ulp of zero (vanishing measure);
    * weights are cached per (seed, bits, dim).
    */
  def srpSignaturePortable(a: ArrayData, bits: Int, seed: Long): Long = {
    val n = a.numElements()
    val w = weightsFor(seed, bits, n)
    var sig = 0L
    var b = 0
    while (b < bits) {
      var s = 0.0
      var i = 0
      while (i < n) { s += w(b * n + i) * a.getFloat(i).toDouble; i += 1 }
      if (s >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
  /** Multi-probe SRP: the signature plus `flips` single-bit variants, one
    * per hyperplane, flipped in order of |margin| (the dot product's
    * distance from the sign boundary) — the bits most likely to differ
    * for a true near neighbor. Query-side only: probing 1+flips buckets
    * per table raises recall without growing the corpus index (the
    * standard multi-probe LSH trade). Ties on |margin| break toward the
    * lower bit — fully deterministic.
    */
  def srpProbes(a: ArrayData, bits: Int, seed: Long, flips: Int,
                portable: Boolean): ArrayData = {
    val n = a.numElements()
    val margins = new Array[Double](bits)
    if (portable) {
      val w = weightsFor(seed, bits, n)
      var b = 0
      while (b < bits) {
        var s = 0.0
        var i = 0
        while (i < n) { s += w(b * n + i) * a.getFloat(i).toDouble; i += 1 }
        margins(b) = s
        b += 1
      }
    } else {
      var b = 0
      while (b < bits) {
        var s = 0.0
        var i = 0
        while (i < n) {
          var z = seed + (b.toLong << 32) + i.toLong
          z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
          z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
          z = z ^ (z >>> 33)
          val w = (z >> 11).toDouble / (1L << 52).toDouble
          s += w * a.getFloat(i).toDouble
          i += 1
        }
        margins(b) = s
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (margins(b) >= 0) sig |= (1L << b); b += 1 }
    val order = Array.range(0, bits)
      .sortBy(i => (math.abs(margins(i)), i))
    val k = math.min(flips, bits)
    val out = new Array[Long](k + 1)
    out(0) = sig
    var j = 0
    while (j < k) { out(j + 1) = sig ^ (1L << order(j)); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Cosine between a float-array column and a double-array (centroid)
  * column — see [[VectorOps.cosineFD]].
  */
case class CosineSimilarityFD(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosineFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosineFD($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarityFD =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class VectorNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    VectorOps.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.norm($a)")
  override protected def withNewChildInternal(c: Expression): VectorNorm = copy(child = c)
}

/** One-pass int8 quantization — see [[VectorOps.quantizeInt8]]. */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("scale", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("qvec",
      ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    VectorOps.quantizeInt8(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.quantizeInt8($a)")
  override protected def withNewChildInternal(c: Expression): QuantizeInt8 = copy(child = c)
}

/** PQ encode — see [[VectorOps.pqEncode]]. The trained codebooks are a
  * bounded plan constant; codegen embeds them as a reference object, so
  * the per-row argmin loops run inside whole-stage codegen with no
  * interpreted lambda overhead.
  */
case class PqEncode(child: Expression, cents: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    VectorOps.pqEncode(a.asInstanceOf[ArrayData], cents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCents", cents, "double[][][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.pqEncode($a, $cbRef)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
}

/** One-pass unit normalization — see [[VectorOps.normalizeD]]. Returns
  * NULL for a zero-norm input (on top of the usual null-in → null-out),
  * so the codegen checks the result instead of assuming non-null.
  */
case class NormalizeUnitF(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    VectorOps.normalizeD(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VectorOps.normalizeD($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildInternal(c: Expression): NormalizeUnitF = copy(child = c)
}

/** Morton bit-interleave — see [[VectorOps.interleaveBits]]. */
case class InterleaveBits(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.interleaveBits(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.interleaveBits($a, $b, $bits)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): InterleaveBits =
    copy(left = l, right = r)
}

/** ADC lookup-sum score — see [[VectorOps.adcScore]]. */
case class AdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    VectorOps.adcScore(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], ksub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.functions.VectorOps.adcScore($c, $l, $ksub)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcScore =
    copy(left = l, right = r)
}

/** Multi-probe SRP signature list — see [[VectorOps.srpProbes]]. */
case class SrpProbes(child: Expression, bits: Int, seed: Long, flips: Int,
                     portable: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    VectorOps.srpProbes(a.asInstanceOf[ArrayData], bits, seed, flips, portable)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorOps.srpProbes($a, $bits, ${seed}L, $flips, $portable)")
  override protected def withNewChildInternal(c: Expression): SrpProbes = copy(child = c)
}

case class SrpSignature(child: Expression, bits: Int, seed: Long,
                        portable: Boolean = false)
    extends UnaryExpression {
  private val method = if (portable) "srpSignaturePortable" else "srpSignature"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    if (portable) VectorOps.srpSignaturePortable(a.asInstanceOf[ArrayData], bits, seed)
    else VectorOps.srpSignature(a.asInstanceOf[ArrayData], bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.$method($a, $bits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): SrpSignature = copy(child = c)
}
