package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a single imperative aggregate: one pass over the
  * shingle stream maintains all `numHashes` minima in a primitive long
  * buffer.
  *
  * Compared to `numHashes` separate `min(xxhash64(i, shingle))` aggregate
  * columns, this hashes each shingle once (per seed family via xxHash64
  * re-seeding, no per-column expression trees), keeps one buffer object per
  * group, and serializes to a packed long array between partial and final —
  * the map-side-combine shape that matters when the shingle stream is
  * billions of rows.
  */
case class MinHashAgg(child: Expression, numHashes: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // accept either a pre-hashed 64-bit shingle key (scale path) or raw
      // text (hashed once here); the `numHashes` families derive from one
      // base hash via independent splitmix64 streams — no re-hashing of
      // the payload per family
      val base = v match {
        case l: java.lang.Long => l.longValue()
        case s: UTF8String =>
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
        case other => other.hashCode().toLong
      }
      var i = 0
      while (i < numHashes) {
        var z = base + 0x9e3779b97f4a7c15L * (i + 1)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        if (z < buf(i)) buf(i) = z
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numHashes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashAgg =
    copy(child = c.head)
}

object MinHashAgg {
  /** Column-level entry: array<long> of `numHashes` minima per group. */
  def minhash_signature(c: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(c), numHashes).toAggregateExpression())
}
