package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Random-hyperplane LSH bucketing of an `ARRAY<FLOAT>` embedding as a
  * native codegen expression: one fused pass computes the sign-pattern
  * bucket of every band — `ARRAY<INT>` with element b = band b's bucket.
  *
  * Numerically IDENTICAL to the HOF formulation
  * `aggregate(sequence(0,bits-1), 0, (acc,j) -> acc*2 + CASE WHEN
  * aggregate(zip_with(planes[band*bits+j], embedding, (c,x) -> c*double(x)),
  * 0d, +) >= 0 THEN 1 ELSE 0 END)`: the same md5-derived coefficients
  * (a pure function of the plane index — see [[HyperplaneBuckets.planes]],
  * which mirrors the SQL oracle's
  * `('0x'||substr(md5(p||'_'||i),1,6))::INT / 8388608.0 - 1.0`), the same
  * left-to-right double accumulation per plane, the same MSB-first bit
  * packing — but without per-element lambda dispatch or intermediate
  * array allocation (interpreted HOFs were the measured hot spot of the
  * bucketing stage). Assumes non-null elements; a null array propagates
  * null via UnaryExpression's null handling. An EMPTY array also yields
  * null: every plane would project to exactly 0.0 and produce an
  * all-ones bucket row, while the SQL oracle's unnest-based projection
  * CTE emits no row at all for an empty array — returning null (the
  * downstream posexplode then drops the vector) keeps both engines
  * dropping empty vectors identically.
  */
case class HyperplaneBuckets(child: Expression, nBands: Int, bitsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // empty arrays map to null

  @transient private lazy val planes: Array[Array[Double]] =
    HyperplaneBuckets.planes(nBands * bitsPerBand)

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() == 0) return null
    val buckets = new Array[Int](nBands)
    var b = 0
    while (b < nBands) {
      var bucket = 0
      var j = 0
      while (j < bitsPerBand) {
        val plane = planes(b * bitsPerBand + j)
        val n = math.min(plane.length, x.numElements())
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += plane(i) * x.getFloat(i).toDouble
          i += 1
        }
        bucket = bucket * 2 + (if (acc >= 0.0) 1 else 0)
        j += 1
      }
      buckets(b) = bucket
      b += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val pls = ctx.addReferenceObj("planes", planes, "double[][]")
      val bkts = ctx.freshName("buckets")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val pl = ctx.freshName("plane")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val bucket = ctx.freshName("bucket")
      s"""
         |if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $bkts = new int[$nBands];
         |  for (int $b = 0; $b < $nBands; $b++) {
         |    int $bucket = 0;
         |    for (int $j = 0; $j < $bitsPerBand; $j++) {
         |      double[] $pl = $pls[$b * $bitsPerBand + $j];
         |      int $n = java.lang.Math.min($pl.length, $c.numElements());
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        $acc += $pl[$i] * (double) $c.getFloat($i);
         |      }
         |      $bucket = $bucket * 2 + ($acc >= 0.0 ? 1 : 0);
         |    }
         |    $bkts[$b] = $bucket;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bkts);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Embedding dimensionality the coefficient table covers (the fixture's
    * and the SQL oracle's `generate_series(0, 63)`). */
  val Dims = 64

  /** Deterministic engine-reproducible plane coefficients: plane p, dim i
    * → `int(md5(p + "_" + i)[0:6 hex]) / 2^23 - 1.0` in [-1, 1) — the
    * exact arithmetic the DuckDB oracle performs, so both engines see
    * bit-identical doubles. */
  def planes(nPlanes: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(Dims) { i =>
        md.reset()
        val digest = md.digest(s"${p}_$i".getBytes("UTF-8"))
        val hex6 = digest.take(3).map(b => f"$b%02x").mkString
        Integer.parseInt(hex6, 16).toDouble / 8388608.0 - 1.0
      }
    }
  }

  /** Bucket per band for an `ARRAY<FLOAT>` embedding column. */
  def buckets(emb: Column, nBands: Int, bitsPerBand: Int): Column =
    column(HyperplaneBuckets(expression(emb), nBands, bitsPerBand))
}
