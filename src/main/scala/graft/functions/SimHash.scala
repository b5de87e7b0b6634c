package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over an `array<string>` token column, as one native pass:
  * each token contributes +1/-1 votes to all 64 bit positions from its
  * 64-bit hash; the signature's bit j is set iff the vote sum is >= 0.
  *
  * Token hashing uses a splitmix64 finalizer over the UTF-8 bytes (a
  * public-domain mixing constant set), so signatures are deterministic and
  * independent of JVM hashCode. One expression call replaces 64
  * per-bit aggregate lambdas — O(tokens * 64) tight-loop work inside
  * whole-stage codegen.
  */
object SimHashOps {
  def hashToken(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ bytes(i)) * 0x100000001b3L
      i += 1
    }
    // splitmix64 finalizer
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hashToken(tokens.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    SimHashOps.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashOps.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}
