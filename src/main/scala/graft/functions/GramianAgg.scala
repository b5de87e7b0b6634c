package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Upper-triangle Gramian of a vector column as ONE imperative aggregate:
  * each input row adds its d·(d+1)/2 pairwise products into a flat
  * 128-bit fixed-point buffer — the partition-local accumulator that
  * replaces materializing N·d² joined rows through the (flat ⋈ flat)
  * covariance self-join in [[graft.operators.Pca]]. The exchange stays
  * model-sized (ONE buffer per partition ≈ the d²-row partial-aggregate
  * output the join path shuffles) but the per-row cost drops from d²
  * InternalRow join outputs to d²/2 primitive adds — the constant that
  * matters at production embedding widths (d = 768–1536).
  *
  * Bit-compatibility contract (what makes the fast path substitutable
  * under the SQL-replayed oracle): every per-term value is EXACTLY the
  * long Spark's `floor(least(greatest(x·y, −clamp), clamp) · quantum)`
  * produces (same IEEE product, same NaN-is-greatest clamp ordering,
  * same floor→long), terms accumulate in exact 128-bit integer arithmetic
  * (the same abelian-group sum as the join path's DECIMAL(38,0) funnel —
  * order-free by construction), and the final value converts through
  * `java.math.BigDecimal.doubleValue` — the identical correctly-rounded
  * conversion `Decimal(38,0).cast(double)` performs. PcaSpec pins
  * equality of the two paths.
  *
  * Buffer: `buf(2k)`/`buf(2k+1)` = high/low 64 bits of cell k's signed
  * 128-bit sum, cells in row-major upper-triangle order (i ≤ j,
  * 0-based). Overflow headroom: |term| ≤ clamp·quantum = 1e18, so 128
  * bits absorb ~1.7e20 rows per cell — unreachable by construction.
  */
case class GramianAgg(child: Expression, dim: Int,
                      quantum: Double, clamp: Double,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val cells = dim * (dim + 1) / 2

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("sxx", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells * 2)

  // add signed 64-bit q into the 128-bit cell at k (two's complement;
  // lo is the unsigned low word, carry via the classic bit identity)
  @inline private def add128(buf: Array[Long], k: Int, q: Long): Unit = {
    val lo = buf(2 * k + 1)
    val nl = lo + q
    val carry = ((lo & q) | ((lo | q) & ~nl)) >>> 63
    buf(2 * k) += (q >> 63) + carry
    buf(2 * k + 1) = nl
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"gramian: vector length ${arr.numElements()} != dim $dim")
      val x = arr.toDoubleArray()
      var k = 0
      var i = 0
      while (i < dim) {
        val xi = x(i)
        var j = i
        while (j < dim) {
          val t = xi * x(j)
          // least(greatest(t, -clamp), clamp) under Spark's ordering
          // (NaN greatest): greatest(NaN, -c) = NaN, least(NaN, c) = c
          val g = if (t != t) t else math.max(t, -clamp)
          val c = if (g != g) clamp else math.min(g, clamp)
          add128(buf, k, math.floor(c * quantum).toLong)
          k += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < cells) {
      // 128-bit a += b, cell-wise
      val lo = a(2 * k + 1)
      val q = b(2 * k + 1)
      val nl = lo + q
      val carry = ((lo & q) | ((lo | q) & ~nl)) >>> 63
      a(2 * k) += b(2 * k) + carry
      a(2 * k + 1) = nl
      k += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](cells)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val big = java.math.BigInteger.valueOf(buf(2 * k)).shiftLeft(64)
          .add(new java.math.BigInteger(
            java.lang.Long.toUnsignedString(buf(2 * k + 1))))
        // BigDecimal.doubleValue = the correctly-rounded conversion
        // Decimal(38,0).cast(double) performs; ÷quantum is the same
        // trailing double division as the join path's qsum
        val sxx = new java.math.BigDecimal(big).doubleValue() / quantum
        out(k) = new GenericInternalRow(
          Array[Any]((i + 1).toLong, (j + 1).toLong, sxx))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(cells * 2)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): GramianAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramianAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): GramianAgg =
    copy(child = c.head)
}

object GramianAgg {
  /** Column entry: array<struct<i,j,sxx>> of the 1-based upper-triangle
    * fixed-point sums Σ floor(clamped(xᵢ·xⱼ)·quantum) ÷ quantum.
    */
  def gramian_upper(c: Column, dim: Int, quantum: Double, clamp: Double): Column =
    ColumnBridge.column(
      GramianAgg(ColumnBridge.expression(c), dim, quantum, clamp)
        .toAggregateExpression())
}
