package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, DoubleType, FloatType}

/** Exact decimal dot product of two `ARRAY<FLOAT>` (or `ARRAY<DOUBLE>`)
  * columns as a native codegen expression — value-identical to the HOF
  * formulation
  *
  * {{{
  * aggregate(zip_with(a, b, (x,y) -> CAST(double(x)*double(y) AS DECIMAL(20,12))),
  *           CAST(0 AS DECIMAL(20,12)), (acc,v) -> CAST(acc+v AS DECIMAL(20,12)))
  * }}}
  *
  * per term: the float×float product in double is exact, the cast to
  * scale-12 decimal rounds HALF_UP through the same `Decimal(double)`
  * path `Cast` uses (NaN/Infinity → null, precision overflow → null);
  * the accumulation is exact at the SAME scale — the cast back never
  * rounds — so the sum is order-independent and oracle-stable, exactly
  * like the HOF. The precision is (38,12) — 26 integer digits of
  * headroom — NOT the HOF's (20,12): (20,12) tops out below 1e8, so an
  * integer-valued descriptor (mm_dedup_near's raw token counts) with a
  * single bin ≥ 10 000 would overflow a norm term to NULL and silently
  * drop the pair, while every DuckDB oracle already sums DECIMAL(38,12)
  * terms. At scale 12 the values are identical wherever (20,12) didn't
  * overflow, so the HOF-parity claim (and every existing hash) holds.
  *
  * Why it exists: Catalyst evaluates higher-order-function lambdas
  * INTERPRETED, per element — and any Filter/Join condition containing
  * one falls out of whole-stage codegen, taking its whole operator with
  * it. Measured on the 100× embeddings corpus, the decimal HOF riding
  * the dedup self-join was the difference between a ~10 s and a ~120 s
  * pass over the same 10.3 M candidate pairs. As a native expression the
  * decimal rescore stays inside WSCG wherever it appears.
  *
  * Assumes non-null ELEMENTS (the embeddings fixture guarantees it);
  * null arrays propagate null via BinaryExpression's null handling.
  *
  * `ARRAY<DOUBLE>` inputs (per side) read `getDouble` instead — the
  * per-term double product is then the HOF's own rounded double product,
  * so porting a double-array HOF call site to this expression stays
  * bit-identical too (mm_embed's feature vectors are doubles).
  */
case class DecimalDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DecimalType(38, 12)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"decimal_dot requires two ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  @transient private lazy val leftIsDouble: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  @transient private lazy val rightIsDouble: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = Decimal(0L, 38, 12)
    var i = 0
    while (i < n) {
      val xv = if (leftIsDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rightIsDouble) y.getDouble(i) else y.getFloat(i).toDouble
      val p = xv * yv
      if (p.isNaN || p.isInfinite) return null
      val v = Decimal(p)
      if (!v.changePrecision(38, 12)) return null
      acc = acc + v
      if (!acc.changePrecision(38, 12)) return null
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dec = classOf[Decimal].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      val v = ctx.freshName("v")
      val getX =
        if (leftIsDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      val getY =
        if (rightIsDouble) s"$b.getDouble($i)" else s"(double) $b.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |$dec $acc = $dec.apply(0L, 38, 12);
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  double $p = $getX * $getY;
         |  if (Double.isNaN($p) || Double.isInfinite($p)) { ${ev.isNull} = true; break; }
         |  $dec $v = $dec.apply($p);
         |  if (!$v.changePrecision(38, 12)) { ${ev.isNull} = true; break; }
         |  $acc = $acc.$$plus($v);
         |  if (!$acc.changePrecision(38, 12)) { ${ev.isNull} = true; break; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalDotProduct =
    copy(left = newLeft, right = newRight)
}

object DecimalDotProduct {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def decimal_dot(a: Column, b: Column): Column =
    column(DecimalDotProduct(expression(a), expression(b)))
}
