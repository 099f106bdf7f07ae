package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Margin-gated per-subspace PQ code assignment as ONE codegen
  * expression over a REFERENCED sub-codebook — [[NearestCentroid]]'s
  * recipe transposed to the L2 argmin of `SimilarityCore.pqEncode`,
  * which folded 2·Ksub literal structs (each holding THREE dot-product
  * subtrees against a subdim-wide literal) per subspace into the plan:
  * fine at the fixtures' Ksub = 16, linear plan/codegen growth on the
  * road to a production Ksub = 256. The expression reads the subvector
  * directly from the full embedding at offset m·subDim (no slice()
  * allocation) and is O(1) plan size at any Ksub.
  *
  * Value identity with the folded form, by construction:
  *  - fast phase: d2 = (dot(sv,sv) − 2·dot(sv,c)) + dot(c,c), each dot
  *    the FloatDotProduct double loop — same products, same
  *    accumulation and combination order; winner = lexicographic min
  *    over (d2, code) = `array_sort(struct(d2, code))[1]`;
  *  - margin gate: gap = second-smallest d2 − smallest (duplicates
  *    included); gap ≤ eps with ≥ 2 codes routes to the decimal phase;
  *  - decimal phase: d2 = ((dd(sv,sv) − dd(sv,c)) − dd(sv,c)) + dd(c,c)
  *    with dd = DecimalDotProduct-semantics dot narrowed to scale-12
  *    (value-exact on sub-vector magnitudes; an overflow — unreachable
  *    on contract inputs — drops the candidate exactly as the folded
  *    form's null-d2 struct lost the sort), winner again the
  *    (d2, code) lexicographic min in exact decimal.
  */
case class PqNearestCode(child: Expression, subStart: Int, subDim: Int,
    codes: Array[Int], csubs: Array[Array[Float]], eps: Double)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  // Content-based equality (round-16 advice on AdcLookupTable, same
  // array-field hole here): reference-based equals/hashCode defeat
  // Catalyst semanticEquals/subexpression elimination and make
  // canonicalized plan hashes JVM-run-dependent.
  override def equals(other: Any): Boolean = other match {
    case o: PqNearestCode =>
      child == o.child && subStart == o.subStart && subDim == o.subDim &&
        eps == o.eps && java.util.Arrays.equals(codes, o.codes) &&
        csubs.length == o.csubs.length &&
        csubs.indices.forall(i => java.util.Arrays.equals(csubs(i), o.csubs(i)))
    case _ => false
  }
  // cached: the model arrays can hold nlist*dim floats and planning
  // hashes expressions repeatedly
  @transient private lazy val cachedHash: Int =
    java.util.Objects.hash(child, Int.box(subStart), Int.box(subDim),
      Double.box(eps), Int.box(java.util.Arrays.hashCode(codes)),
      Int.box(csubs.map(java.util.Arrays.hashCode).toSeq.hashCode))
  override def hashCode(): Int = cachedHash

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_nearest_code requires ARRAY<FLOAT>, got ${t.simpleString}")
  }

  /** dot over the subvector window [subStart, subStart+subDim) of `x`
    * against `c` — bounds-clamped like slice(): positions past the
    * embedding's end contribute nothing (slice truncates there, and
    * FloatDotProduct loops to min(n) — identical truncation). */
  private def dotSub(x: ArrayData, c: Array[Float]): Double = {
    val n = math.min(subDim, math.min(c.length, x.numElements() - subStart))
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(subStart + i).toDouble * c(i).toDouble
      i += 1
    }
    acc
  }

  private def dotSelf(x: ArrayData): Double = {
    val n = math.min(subDim, x.numElements() - subStart)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(subStart + i).toDouble
      acc += v * v
      i += 1
    }
    acc
  }

  /** DecimalDotProduct semantics over the subvector window (per-term
    * HALF_UP rounding to scale 12, exact accumulation), narrowed to
    * (20,12) like the folded form's dd() cast; None on overflow. */
  private def decDotSub(x: ArrayData, c: Array[Float], self: Int): Option[java.math.BigDecimal] = {
    // self = 0: sv·c; 1: sv·sv; 2: c·c — one loop body, three windows
    val n =
      if (self == 2) c.length
      else math.min(subDim, math.min(
        if (self == 1) Int.MaxValue else c.length, x.numElements() - subStart))
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      val a = if (self == 2) c(i).toDouble else x.getFloat(subStart + i).toDouble
      val b = if (self == 1) a else c(i).toDouble
      val p = a * b
      if (p.isNaN || p.isInfinite) return None
      val v = new java.math.BigDecimal(java.lang.Double.toString(p))
        .setScale(12, java.math.RoundingMode.HALF_UP)
      acc = acc.add(v)
      i += 1
    }
    // the folded form narrowed each DOT to DECIMAL(20,12): 8 integer
    // digits — overflow → null there, candidate dropped here
    if (acc.precision - acc.scale > 8) None else Some(acc)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    // fast phase
    var best = Double.PositiveInfinity
    var second = Double.PositiveInfinity
    var bestIdx = -1
    val svv = dotSelf(x)
    var k = 0
    while (k < codes.length) {
      val c = csubs(k)
      val d2 = (svv - 2.0 * dotSub(x, c)) + cDotC(k)
      if (d2 < best) { second = best; best = d2; bestIdx = k }
      else if (d2 < second) second = d2
      k += 1
    }
    if (bestIdx < 0) return null
    if (codes.length < 2 || second - best > eps) return codes(bestIdx)
    // decimal re-decide
    decDotSub(x, csubs(0), 1) match {
      case None => null
      case Some(dsvv) =>
        var bestD: java.math.BigDecimal = null
        var bestCode = -1
        var j = 0
        while (j < codes.length) {
          val c = csubs(j)
          (decDotSub(x, c, 0), decDotSub(x, c, 2)) match {
            case (Some(dsc), Some(dcc)) =>
              val d2 = dsvv.subtract(dsc).subtract(dsc).add(dcc)
              if (bestD == null || d2.compareTo(bestD) < 0) {
                bestD = d2; bestCode = codes(j)
              }
            case _ => () // overflow: candidate dropped (unreachable)
          }
          j += 1
        }
        if (bestCode < 0) null else bestCode
    }
  }

  /** c·c per code in double, precomputed once (iteration-invariant). */
  @transient private lazy val cDotC: Array[Double] = csubs.map { c =>
    var acc = 0.0
    var i = 0
    while (i < c.length) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqNearestCode", this,
      classOf[PqNearestCode].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("pqRes")
      s"""
         |Object $r = $self.codeOrNull($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Integer) $r).intValue(); }
       """.stripMargin
    })
  }

  def codeOrNull(a: Object): Object = {
    val r = nullSafeEval(a)
    if (r == null) null else java.lang.Integer.valueOf(r.asInstanceOf[Int])
  }

  override def prettyName: String = "pq_nearest_code"

  override protected def withNewChildInternal(newChild: Expression): PqNearestCode =
    copy(child = newChild)
}

object PqNearestCode {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** `cands`: this subspace's (code, c_sub) entries in ascending code
    * order (distinct codes — ties break toward the earlier = smaller). */
  def pq_nearest_code(emb: Column, subStart: Int, subDim: Int,
      cands: Array[(Int, Seq[Float])], eps: Double): Column =
    column(PqNearestCode(expression(emb), subStart, subDim,
      cands.map(_._1), cands.map(_._2.toArray), eps))
}
