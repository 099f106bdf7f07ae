package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** `length(bin(v))` as one allocation-free bit instruction (round-16
  * optimization, residual item 3): the HLL register pass computed
  * rho(w) through `bin(w)` — a fresh minimal-width binary STRING (up
  * to 48 chars at the 48-bit register words, 64 for negatives) built
  * and measured per input row of the sketched corpus. The length of
  * that string is pure bit arithmetic:
  *
  *  - v = 0: `bin(0)` is `"0"` — length 1;
  *  - v > 0: minimal-width binary — length = bitlength(v) =
  *    64 − numberOfLeadingZeros(v);
  *  - v < 0: two's-complement 64-char form — length 64 =
  *    64 − numberOfLeadingZeros(v) (the sign bit is set), so the
  *    formula needs no sign branch.
  *
  * Value-identical to `length(bin(v))` for EVERY long (spec-pinned on
  * the edges and random values), so the DuckDB oracles keep the
  * `length(bin(w))` form and hashes are untouched.
  */
case class LongBinLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"long_bin_length requires BIGINT, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    LongBinLength.binLength(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LongBinLength.binLength($c)")

  override def prettyName: String = "long_bin_length"

  override protected def withNewChildInternal(newChild: Expression): LongBinLength =
    copy(child = newChild)
}

object LongBinLength {

  /** Static entry point shared by interpreted eval and generated code. */
  def binLength(v: Long): Int =
    if (v == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** Column-API entry point: value-identical to `length(bin(c))` for a
    * LongType `c`. */
  def long_bin_length(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      LongBinLength(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
