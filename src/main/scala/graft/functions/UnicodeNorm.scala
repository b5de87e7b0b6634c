package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC / NFKC) as native codegen expressions —
  * the canonicalization pass a text pipeline runs BEFORE any
  * hash-keyed operator: the same visible text can arrive composed
  * ("é" U+00E9) or decomposed ("e"+U+0301), full-width or compatibility-
  * form ("ﬁ" vs "fi"), and every byte-level primitive downstream —
  * content-hash dedup, shingles, minhash, fingerprints, exact joins —
  * silently treats those as DIFFERENT documents unless the bytes are
  * canonicalized first. NFC is the safe identity-preserving default;
  * NFKC additionally folds compatibility characters (ligatures,
  * full-width forms) — the usual choice before tokenization.
  *
  * Spark has no normalization builtin; a Scala UDF would pay
  * serialization boxing per row. These are UnaryExpressions with
  * `doGenCode` emitting a static call, so they stay inside whole-stage
  * codegen like the rest of graft's text primitives (the PyText
  * pattern). Fast path: `Normalizer.isNormalized` is a cheap scan that
  * avoids the rebuild allocation for already-normal text — which at
  * corpus scale is ALMOST ALL text (ASCII is always NFC), so the
  * common-row cost is one pass over the chars, zero allocation.
  *
  * Oracle-portability: java.text.Normalizer and DuckDB's
  * `nfc_normalize` both implement the Unicode normalization algorithm
  * (UAX #15) — a conformance-level contract, pinned cross-engine by the
  * `text_nfc` query and in UnicodeNormSpec on composed/decomposed/
  * ligature/full-width cases.
  */
object UnicodeNorm {

  private def norm(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  def nfc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFC)
  def nfkc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFKC)
}

abstract class UnicodeNormExpression extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  protected def staticCall: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.$staticCall($c)")
}

case class NfcNormalize(child: Expression) extends UnicodeNormExpression {
  override protected def nullSafeEval(v: Any): Any =
    UnicodeNorm.nfc(v.asInstanceOf[UTF8String])
  override protected def staticCall: String = "nfc"
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

case class NfkcNormalize(child: Expression) extends UnicodeNormExpression {
  override protected def nullSafeEval(v: Any): Any =
    UnicodeNorm.nfkc(v.asInstanceOf[UTF8String])
  override protected def staticCall: String = "nfkc"
  override protected def withNewChildInternal(c: Expression): NfkcNormalize =
    copy(child = c)
}
