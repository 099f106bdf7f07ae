package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** One subspace's dense ADC lookup array (×10¹² fixed-point squared-L2
  * to every code slot) as ONE codegen expression over a REFERENCED
  * sub-codebook — the [[PqNearestCode]]/[[NearestCentroid]] recipe
  * applied to `SimilarityCore.adcLookupArrays` (round-16, residual
  * item 2), which folded (maxCode+1) literal subtrees per subspace
  * into the plan, each carrying THREE DecimalDotProduct children
  * against a subdim-wide literal: M·(maxCode+1) expression trees —
  * fine at the fixtures' Ksub = 16, the pqEncode plan-size disease on
  * the road to a production Ksub = 256. The expression reads the
  * subvector window in place (no slice() allocation) and is O(1) plan
  * size at any Ksub.
  *
  * Value identity with the folded form
  * `array(0..maxCode: code present ? d2Fp(d2Dec(subVec(e, m), c))
  *                                 : lit(Long.MaxValue))`,
  * by construction (AdcLookupTableSpec pins it against the verbatim
  * algebra on the real corpus + trained codebook and on planted
  * gap/overflow codebooks):
  *  - each dot dd = DecimalDotProduct semantics (per-term HALF_UP
  *    rounding to scale 12, exact accumulation) narrowed to
  *    DECIMAL(20,12) — more than 8 integer digits → null, which nulls
  *    the slot exactly as the folded cast did;
  *  - d2 = ((dd(sv,sv) − dd(sv,c)) − dd(sv,c)) + dd(c,c), exact at
  *    scale 12 (the (23,12) combination type cannot overflow on
  *    (20,12)-bounded inputs);
  *  - fixed-point = d2 × 10¹² as a LONG — the folded
  *    `cast(d2 as decimal(24,12)) * 10¹²::decimal(13,0) → cast(long)`
  *    chain: a (24,12) overflow or a long-range overflow yields null
  *    (unreachable on contract inputs, mirrored anyway);
  *  - absent code slots are the same non-null Long.MaxValue fill;
  *  - a NULL embedding yields the same NON-null array the literal
  *    `array(...)` constructor produced (absent slots MaxValue,
  *    present slots null) — the expression is deliberately not
  *    null-intolerant and never returns a null array.
  */
case class AdcLookupTable(child: Expression, subStart: Int, subDim: Int,
    codes: Array[Int], csubs: Array[Array[Float]], maxCode: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  // Array fields make the synthesized case-class equals/hashCode
  // reference-based, so semantically identical instances never compare
  // equal — defeating Catalyst semanticEquals/subexpression elimination
  // and giving JVM-run-dependent hashCodes for canonicalized plans
  // (round-16 advice). Compare contents instead.
  override def equals(other: Any): Boolean = other match {
    case o: AdcLookupTable =>
      child == o.child && subStart == o.subStart && subDim == o.subDim &&
        maxCode == o.maxCode && java.util.Arrays.equals(codes, o.codes) &&
        csubs.length == o.csubs.length &&
        csubs.indices.forall(i => java.util.Arrays.equals(csubs(i), o.csubs(i)))
    case _ => false
  }
  // cached: the model arrays can hold nlist*dim floats and planning
  // hashes expressions repeatedly
  @transient private lazy val cachedHash: Int =
    java.util.Objects.hash(child, Int.box(subStart), Int.box(subDim),
      Int.box(maxCode), Int.box(java.util.Arrays.hashCode(codes)),
      Int.box(csubs.map(java.util.Arrays.hashCode).toSeq.hashCode))
  override def hashCode(): Int = cachedHash

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"adc_lookup_table requires ARRAY<FLOAT>, got ${t.simpleString}")
  }

  /** csubs re-indexed by code slot (null = absent code). */
  @transient private lazy val slotSub: Array[Array[Float]] = {
    val arr = new Array[Array[Float]](maxCode + 1)
    var i = 0
    while (i < codes.length) { arr(codes(i)) = csubs(i); i += 1 }
    arr
  }

  /** dd(c,c) per code slot, iteration-invariant (None = overflow ⇒
    * null slot; null entry = absent code). */
  @transient private lazy val slotCdotC: Array[Option[java.math.BigDecimal]] = {
    val arr = new Array[Option[java.math.BigDecimal]](maxCode + 1)
    var code = 0
    while (code <= maxCode) {
      val c = slotSub(code)
      if (c != null) arr(code) = decDot(null, c, self = 2)
      code += 1
    }
    arr
  }

  /** The null-embedding row's table (see the scaladoc) — row-invariant. */
  @transient private lazy val nullTable: ArrayData = {
    val out = new Array[Any](maxCode + 1)
    var code = 0
    while (code <= maxCode) {
      out(code) = if (slotSub(code) == null) java.lang.Long.valueOf(Long.MaxValue)
                  else null
      code += 1
    }
    new GenericArrayData(out)
  }

  /** DecimalDotProduct semantics over the subvector window, narrowed
    * to (20,12) — [[PqNearestCode]]'s decDotSub, one loop body for the
    * three windows (self = 0: sv·c; 1: sv·sv; 2: c·c). */
  private def decDot(x: ArrayData, c: Array[Float], self: Int): Option[java.math.BigDecimal] = {
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
      // mirror DecimalDotProduct's per-term and per-accumulation
      // changePrecision(38, 12) nulls (round-16 advice: intermediate
      // terms past 26 integer digits that CANCEL later returned
      // Some(0) here while the folded form nulls the slot — unreachable
      // on contract embeddings, mirrored for unconditional identity)
      if (v.precision - v.scale > 26) return None
      acc = acc.add(v)
      if (acc.precision - acc.scale > 26) return None
      i += 1
    }
    if (acc.precision - acc.scale > 8) None else Some(acc)
  }

  /** d2 × 10¹² as a boxed Long, replicating the folded
    * decimal(24,12) → ×10¹²(13,0) → cast(long) chain's overflow-nulls. */
  private def toFp(d2: java.math.BigDecimal): java.lang.Long = {
    if (d2.precision - d2.scale > 12) return null // the (24,12) cast
    val fp = d2.movePointRight(12) // exact ×10¹², integral at scale 0
    val bi = fp.toBigInteger
    if (bi.bitLength > 63) null else java.lang.Long.valueOf(bi.longValueExact)
  }

  /** The full lookup array for one row; `input` null ⇒ [[nullTable]];
    * a subspace with NO codes (empty cands) is all-MaxValue fill,
    * which [[nullTable]] also is in that case. */
  def tableOf(input: Any): ArrayData = {
    if (input == null || codes.isEmpty) return nullTable
    val x = input.asInstanceOf[ArrayData]
    val out = new Array[Any](maxCode + 1)
    val svv = decDot(x, null, self = 1) // c is unread when self = 1
    var code = 0
    while (code <= maxCode) {
      val c = slotSub(code)
      if (c == null) out(code) = java.lang.Long.valueOf(Long.MaxValue)
      else out(code) = (svv, decDot(x, c, self = 0), slotCdotC(code)) match {
        case (Some(dss), Some(dsc), Some(dcc)) =>
          toFp(dss.subtract(dsc).subtract(dsc).add(dcc))
        case _ => null // an overflowed/NaN dot nulled the folded slot
      }
      code += 1
    }
    new GenericArrayData(out)
  }

  // eval deliberately bypasses UnaryExpression's null-safe path: a null
  // child maps to the non-null fill table (see scaladoc), so the default
  // nullSafeEval route would never run — overriding eval directly is the
  // single evaluation path (round-16 advice: the dead nullSafeEval
  // override invited confusion about which path handles nulls).
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    tableOf(child.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodeBlock, FalseLiteral}
    val self = ctx.addReferenceObj("adcLookupTable", this,
      classOf[AdcLookupTable].getName)
    val childGen = child.genCode(ctx)
    // the result is NEVER null (a null child maps to the null-fill
    // table, like the folded array(...) constructor) — isNull is a
    // compile-time false and the child's null flag routes the input
    val in =
      if (child.nullable) s"(${childGen.isNull} ? null : (Object) ${childGen.value})"
      else s"(Object) ${childGen.value}"
    val body = CodeBlock(
      Seq(s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  $self.tableOf($in);
       """.stripMargin),
      Seq.empty)
    ev.copy(code = childGen.code + body, isNull = FalseLiteral)
  }

  override def prettyName: String = "adc_lookup_table"

  override protected def withNewChildInternal(newChild: Expression): AdcLookupTable =
    copy(child = newChild)
}

object AdcLookupTable {

  /** Column-API entry point: `cands` = one subspace's (code, c_sub)
    * entries; `maxCode` = the WHOLE codebook's max code (the folded
    * form sized every subspace's array by the global max). */
  def adc_lookup_table(emb: Column, subStart: Int, subDim: Int,
      cands: Array[(Int, Seq[Float])], maxCode: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      AdcLookupTable(org.apache.spark.sql.GraftColumnBridge.expression(emb),
        subStart, subDim, cands.map(_._1), cands.map(_._2.toArray), maxCode))
}
