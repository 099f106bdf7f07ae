package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two `ARRAY<FLOAT>` columns as a native codegen
  * expression: one fused loop accumulating in double, left-to-right.
  *
  * Numerically IDENTICAL to the HOF formulation
  * `aggregate(zip_with(a,b,(x,y)->double(x)*double(y)), 0d, +)` — same
  * products (float×float in double is exact), same accumulation order —
  * but without zip_with's intermediate array allocation and per-element
  * lambda dispatch. This is the hot inner loop of every similarity
  * operator, which is exactly where SURVEY.md §7.3 budgets a custom
  * `Expression` ("UDF fallback only if HOF perf disappoints at bench").
  *
  * Assumes non-null elements (the embeddings fixture guarantees it);
  * null ARRAYS propagate null via BinaryExpression's null handling.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

object FloatDotProduct {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def float_dot(a: Column, b: Column): Column =
    column(FloatDotProduct(expression(a), expression(b)))
}
