package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a codegen
  * scalar expression — Spark ships no normalization builtin, and the
  * text-canonicalization pass every web-corpus pipeline runs before
  * content-hash dedup needs one: the SAME text arrives composed
  * (U+00E9 'é') from one crawler and decomposed (U+0065 U+0301) from
  * another, and without NFC their md5s differ and exact dedup silently
  * misses the pair.
  *
  * Delegates to `java.text.Normalizer` (ICU-equivalent canonical
  * composition per the Unicode standard — the same algorithm DuckDB's
  * `nfc_normalize` implements, which is what makes the cross-engine
  * oracle exact). The common case is a fast no-op: `Normalizer.isNormalized`
  * is a single scan that avoids the rebuild allocation for the
  * overwhelmingly-ASCII corpus majority.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static entry point shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point (see [[org.apache.spark.sql.GraftColumnBridge]]). */
  def nfc_normalize(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NfcNormalize(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
