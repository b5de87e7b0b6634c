package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact Python `str.capitalize` / `str.title` semantics as native Catalyst
  * expressions (whole-stage-codegen'd via a static call, no UDF boxing).
  *
  * The reference normalizes names with `strip().lower().capitalize()` and
  * cities with `strip().lower().title()` (reference scr/etl_basic.py:20,22;
  * scr/etl_batch.py:56-57). Spark's `initcap` differs from both: Python
  * `capitalize` lowercases everything after the first char, and Python
  * `title` treats ANY non-letter as a word boundary ("o'hara" -> "O'Hara")
  * while `initcap` splits on whitespace only. These expressions reproduce
  * the Python behavior exactly (SURVEY.md F3/F4, §7.3).
  */
object PyText {
  /** First char titlecased, all the rest lower — Python str.capitalize
    * (titlecase for the head char per Python 3.8+; identical to uppercase
    * outside the ~30 Unicode digraph titlecase letters). Code-point
    * iteration so astral-plane characters survive.
    */
  def capitalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.isEmpty) s
    else {
      val sb = new java.lang.StringBuilder(str.length)
      val head = str.codePointAt(0)
      sb.appendCodePoint(Character.toTitleCase(head))
      var i = Character.charCount(head)
      while (i < str.length) {
        val cp = str.codePointAt(i)
        sb.appendCodePoint(Character.toLowerCase(cp))
        i += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
  }

  /** Uppercase every letter that follows a non-letter — Python str.title. */
  def title(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var prevCased = false
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val cased = Character.isLetter(cp)
      if (cased && !prevCased) sb.appendCodePoint(Character.toTitleCase(cp))
      else if (cased) sb.appendCodePoint(Character.toLowerCase(cp))
      else sb.appendCodePoint(cp)
      prevCased = cased
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

abstract class PyStringExpression extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  protected def staticCall: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PyText.$staticCall($c)")
}

case class PyCapitalize(child: Expression) extends PyStringExpression {
  override protected def nullSafeEval(v: Any): Any =
    PyText.capitalize(v.asInstanceOf[UTF8String])
  override protected def staticCall: String = "capitalize"
  override protected def withNewChildInternal(c: Expression): PyCapitalize = copy(child = c)
}

case class PyTitle(child: Expression) extends PyStringExpression {
  override protected def nullSafeEval(v: Any): Any =
    PyText.title(v.asInstanceOf[UTF8String])
  override protected def staticCall: String = "title"
  override protected def withNewChildInternal(c: Expression): PyTitle = copy(child = c)
}
