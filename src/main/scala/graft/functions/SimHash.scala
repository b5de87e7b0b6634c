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

  // MessageDigest is stateful; one instance per task thread, reset per call
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** PORTABLE token hash: first 8 bytes of md5, big-endian — bit j of the
    * long (LSB-indexed) is bit (3 − m%4) of hex digit m/4 of the md5 hex
    * string at m = 63 − j, so the same 64 bits are reachable from ANSI
    * SQL's md5() for the DuckDB oracle.
    */
  def hashTokenMd5(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  private def simhashWith(tokens: ArrayData, hash: UTF8String => Long): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash(tokens.getUTF8String(i))
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

  def simhash(tokens: ArrayData): Long = simhashWith(tokens, hashToken)

  /** [[simhash]] over the portable md5 token hash (oracle-reproducible). */
  def simhashMd5(tokens: ArrayData): Long = simhashWith(tokens, hashTokenMd5)
}

case class SimHash64(child: Expression, portable: Boolean = false) extends UnaryExpression {
  private val method = if (portable) "simhashMd5" else "simhash"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    if (portable) SimHashOps.simhashMd5(v.asInstanceOf[ArrayData])
    else SimHashOps.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashOps.$method($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}
