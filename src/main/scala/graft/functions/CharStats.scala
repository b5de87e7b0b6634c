package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document character-distribution statistics — the native
  * replacement for the O(|alphabet| · len) higher-order-function
  * formulation (for every distinct character, re-scan the whole
  * character array): one code-point walk builds a char → count map, then
  * the Simpson / entropy / top-fraction folds run over the counts in
  * ASCENDING CODE POINT order.
  *
  * Bit-compatibility contract (the DuckDB oracle and the previous column
  * formulation both pin it): UTF-8 byte order — which is what
  * `array_sort` on single-character strings sorts by — equals numeric
  * code-point order, so iterating a TreeMap keyed by code point folds the
  * per-character terms in exactly the order the old
  * `aggregate(sorted_counts, …)` did; each term is computed with the same
  * IEEE operations (`p = c / n` once — division is deterministic, so the
  * old tree's two identical `c / n` evaluations produce the same double);
  * the final `1.0 − Σ` / `0.0 − Σ` subtractions happen here too. Rounding
  * (`round(x, 6)`) and the empty-document guard stay in the column layer,
  * untouched.
  *
  * Scale shape: map-only, whole-stage codegen (one static call per row),
  * O(len + |alphabet| log |alphabet|) per row instead of
  * O(|alphabet| · len) interpreted-lambda evaluations — at 100 TB this is
  * the difference between the cheapest screen in the pipeline and a
  * CPU-bound stage 100× over budget.
  */
object CharDistOps {
  /** struct<n_chars:long, n_distinct:long, top_frac:double,
    * simpson:double, entropy:double> — raw (unrounded) values; empty
    * input reports zeros (the column layer's `when` guard also fires).
    */
  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      i += Character.charCount(cp)
      n += 1L
    }
    if (n == 0L) return new GenericInternalRow(Array[Any](0L, 0L, 0.0, 0.0, 0.0))
    val nd = n.toDouble
    var maxC = 0L
    var simpsonSum = 0.0
    var entropySum = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > maxC) maxC = c
      val p = c.toDouble / nd
      simpsonSum += p * p
      entropySum += p * math.log(p)
    }
    new GenericInternalRow(Array[Any](
      n, counts.size().toLong, maxC.toDouble / nd,
      1.0 - simpsonSum, 0.0 - entropySum))
  }
}

/** Native character-distribution stats — see [[CharDistOps.stats]]. */
case class CharDistStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_frac", DoubleType, nullable = false),
    StructField("simpson", DoubleType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    CharDistOps.stats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharDistOps.stats($c)")
  override protected def withNewChildInternal(c: Expression): CharDistStats = copy(child = c)
}
