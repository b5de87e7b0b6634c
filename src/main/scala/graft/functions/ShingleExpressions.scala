package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-token shingle hashes in ONE native pass, on the PORTABLE
  * scheme (24-bit md5 token hash, rolling polynomial mod 1e9+7 — exactly
  * `Dedup.shingleHashesPortable`'s column formulation and the DuckDB
  * oracle's arithmetic):
  *
  *   tokens  = split(lower(trim(text)), " ")          // empties kept
  *   t_j     = int24(md5(token_j)[0..2])
  *   shingle = fold(acc = (acc*31 + t_j) mod p) over a k-window
  *   output  = distinct shingles (whole stream if fewer than k tokens)
  *
  * The column-function formulation pays md5-as-hex-string, substring,
  * base-16 conv and per-window lambda allocation for every token; this
  * expression digests raw UTF-8 bytes and folds primitive longs inside
  * whole-stage codegen — same results, a fraction of the cost.
  */
object ShingleOps {
  private val P = 1000000007L

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def tokenHashes(text: UTF8String): Array[Long] = {
    val md = md5Local.get()
    // toString after trim+lower: tokens are tiny; the split must match
    // Spark's split(str, " ") = limit -1 (interior AND trailing empties)
    val toks = text.trim().toLowerCase().toString.split(" ", -1)
    val n = toks.length
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(toks(i).getBytes("UTF-8"))
      th(i) = ((d(0) & 0xFFL) << 16) | ((d(1) & 0xFFL) << 8) | (d(2) & 0xFFL)
      i += 1
    }
    th
  }

  private def fold(th: Array[Long], from: Int, until: Int): Long = {
    var acc = 0L
    var j = from
    while (j < until) { acc = (acc * 31 + th(j)) % P; j += 1 }
    acc
  }

  def shingles(text: UTF8String, k: Int): ArrayData = {
    val th = tokenHashes(text)
    val n = th.length
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (n < k) seen.add(fold(th, 0, n))
    else {
      var st = 0
      while (st + k <= n) { seen.add(fold(th, st, st + k)); st += 1 }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** POSITIONAL variant for span-grain dedup: the full non-distinct
    * window stream in position order — element `i` is the portable hash
    * of tokens [i, i+k). Documents shorter than k tokens return an EMPTY
    * array (they have no k-token span; doc-grain dedup owns them), unlike
    * [[shingles]]' whole-stream fallback, whose set semantics have no
    * position to report.
    */
  def shinglesPos(text: UTF8String, k: Int): ArrayData = {
    val th = tokenHashes(text)
    val n = th.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    var st = 0
    while (st + k <= n) { out(st) = fold(th, st, st + k); st += 1 }
    new GenericArrayData(out)
  }
}

case class PortableShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ShingleOps.shingles(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.shingles($c, $k)")
  override protected def withNewChildInternal(c: Expression): PortableShingles = copy(child = c)
}

/** [[ShingleOps.shinglesPos]] as a codegen expression: the in-order,
  * non-distinct k-window hash stream (posexplode gives span positions).
  */
case class PortableShinglesPos(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ShingleOps.shinglesPos(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.shinglesPos($c, $k)")
  override protected def withNewChildInternal(c: Expression): PortableShinglesPos = copy(child = c)
}
