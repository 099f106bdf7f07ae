package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** `size(regexp_extract_all(s, '[a-z]+|[0-9]+|[^a-z0-9 ]'))` — the
  * BPE-ish token count — as one codegen byte-pass scalar.
  *
  * Semantically identical to the regex (and to the DuckDB oracle's
  * `len(regexp_extract_all(...))`): a maximal run of lowercase letters
  * counts one token, a maximal run of digits counts one, and every other
  * non-space CODE POINT counts one on its own (single-char class matches
  * never merge, and both java.util.regex and RE2 match char classes per
  * code point, so multibyte text counts leading bytes only). A run is
  * broken by any class change, space, or other-class char.
  *
  * Why an expression: the alternation regex backtracks per character
  * across three branches — measured 8.5 s warm at the 500 k-doc fixture
  * with the regex vs 0.64 s with this loop, in an otherwise identical
  * narrow projection. Same species as [[WinnowMin]]/[[SimhashChunks]]:
  * fold the per-document scan into one call over the UTF-8 bytes.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    BpeTokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeTokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {

  /** Static entry point shared by interpreted eval and generated code. */
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    var n = 0
    var state = 0 // 0 = boundary, 1 = in [a-z] run, 2 = in [0-9] run
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b >= 'a' && b <= 'z') {
        if (state != 1) { n += 1; state = 1 }
        i += 1
      } else if (b >= '0' && b <= '9') {
        if (state != 2) { n += 1; state = 2 }
        i += 1
      } else if (b == ' ') {
        state = 0
        i += 1
      } else {
        // one token per non-space other code point; skip its
        // continuation bytes in one step
        n += 1
        state = 0
        i += UTF8String.numBytesForFirstByte(bytes(i))
      }
    }
    n
  }

  /** Column-API entry point (see [[org.apache.spark.sql.GraftColumnBridge]]). */
  def bpe_token_count(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BpeTokenCount(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
