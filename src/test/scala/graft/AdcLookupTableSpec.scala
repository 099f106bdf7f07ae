package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Value-identity gate for the round-16 ADC-table rewrite (residual
  * item 2): the [[graft.functions.AdcLookupTable]] expression must
  * produce the SAME dense lookup arrays as the literal-folded
  * `array(0..maxCode: d2Fp(d2Dec(subVec(e, m), c)) | Long.MaxValue)`
  * it replaced (reconstructed verbatim here — the pre-rewrite
  * `SimilarityCore.adcLookupArrays` Column algebra): same ×10¹²
  * fixed-point decimal distances, same MaxValue fill on absent codes
  * (including gaps in the middle of the code range), same null slots
  * on null/short embeddings, same non-null array on a NULL embedding.
  */
class AdcLookupTableSpec extends GraftSuite {

  private val SubDim = 16
  private val M = 4
  private val Fp = 1000000000000L

  private def dotDec(a: Column, b: Column): Column =
    graft.functions.DecimalDotProduct.decimal_dot(a, b)

  private def subVec(e: Column, m: Int): Column =
    slice(e, m * SubDim + 1, SubDim)

  private def d2Dec(sv: Column, c: Seq[Float]): Column = {
    val cl = typedLit(c)
    def dd(a: Column, b: Column): Column = dotDec(a, b).cast("decimal(20,12)")
    dd(sv, sv) - dd(sv, cl) - dd(sv, cl) + dd(cl, cl)
  }

  private def d2Fp(d2: Column): Column =
    (d2.cast("decimal(24,12)") * lit(Fp).cast("decimal(13,0)")).cast("long")

  /** The pre-rewrite folded builder, verbatim. */
  private def foldedTabs(df: DataFrame,
      cb: Array[(Int, Int, Seq[Float])]): DataFrame = {
    val maxCode = cb.map(_._2).max
    (0 until M).foldLeft(df) { (acc, m) =>
      val cands = cb.filter(_._1 == m)
      acc.withColumn(s"a_$m", array((0 to maxCode).map { code =>
        cands.find(_._2 == code) match {
          case Some((_, _, c)) => d2Fp(d2Dec(subVec(col("embedding"), m), c))
          case None            => lit(Long.MaxValue)
        }
      }: _*))
    }.drop("embedding")
  }

  private def exprTabs(df: DataFrame,
      cb: Array[(Int, Int, Seq[Float])]): DataFrame = {
    val maxCode = cb.map(_._2).max
    (0 until M).foldLeft(df) { (acc, m) =>
      val cands = cb.filter(_._1 == m).map { case (_, code, c) => (code, c) }
      acc.withColumn(s"a_$m",
        graft.functions.AdcLookupTable.adc_lookup_table(
          col("embedding"), m * SubDim, SubDim, cands, maxCode))
    }.drop("embedding")
  }

  private def collectTabs(df: DataFrame): Map[Long, Seq[Seq[Option[Long]]]] =
    df.select(col("vec_id") +: (0 until M).map(m => col(s"a_$m")): _*)
      .collect()
      .map { r =>
        r.getLong(0) -> (1 until M + 1).map { i =>
          r.getSeq[Any](i).map(v => Option(v).map(_.asInstanceOf[Long]))
        }
      }.toMap

  test("expression == folded form on the real corpus with a gappy codebook") {
    val base = Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull && size(col("embedding")) >= M * SubDim)
      .select(col("vec_id"), col("embedding"))
    // deterministic synthetic codebook with HOLES: per subspace only
    // codes {0, 2, m+3} exist (1 and the rest of 0..maxCode are absent
    // ⇒ MaxValue fill in the middle of the range, different per m)
    val cb: Array[(Int, Int, Seq[Float])] = (0 until M).flatMap { m =>
      Seq(0, 2, m + 3).map(code => (m, code,
        Seq.tabulate(SubDim)(i => math.sin(m * 100 + code * 10 + i).toFloat)))
    }.toArray
    val a = collectTabs(foldedTabs(base, cb))
    val b = collectTabs(exprTabs(base, cb))
    assert(a.keySet == b.keySet && a.keySet.nonEmpty)
    val diffs = a.keys.filter(k => a(k) != b(k))
    assert(diffs.isEmpty, s"tables diverged on vec_ids ${diffs.take(5).toSeq.sorted}")
    // sanity: the gap slots really are MaxValue fill
    assert(a.values.head.forall(_(1).contains(Long.MaxValue)))
  }

  test("expression == folded form on null and short embeddings") {
    import spark.implicits._
    // row 1: null embedding (folded: non-null array — MaxValue on
    // absent slots, null on present ones); row 2: SHORT embedding
    // (only 5 floats — every subvector window past it is empty/partial,
    // pinning the slice()-truncation clamp); row 3: normal length
    val rows = Seq(
      (1L, null.asInstanceOf[Seq[Float]]),
      (2L, Seq.tabulate(5)(i => 0.25f * (i - 2))),
      (3L, Seq.tabulate(M * SubDim)(i => math.cos(i).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val cb: Array[(Int, Int, Seq[Float])] = (0 until M).flatMap { m =>
      Seq(0, 3).map(code => (m, code,
        Seq.tabulate(SubDim)(i => math.sin(m * 7 + code + i).toFloat)))
    }.toArray
    val a = collectTabs(foldedTabs(df, cb))
    val b = collectTabs(exprTabs(df, cb))
    assert(a == b)
    // the null row's arrays are non-null with null PRESENT slots (0, 3)
    // and MaxValue ABSENT slots (1, 2) — the folded array() shape
    assert(a(1L).forall(t => t(0).isEmpty && t(1).contains(Long.MaxValue) &&
      t(2).contains(Long.MaxValue) && t(3).isEmpty))
  }

  test("expression == folded form under the REAL trained codebook") {
    // the production path: the flat-PQ codebook this fixture trains
    // (exported for the oracle), over the real query frame
    SparkEntry.queries("ann_ivf_pq")(spark, sf).collect()
    val cb = spark.read.parquet(
        graft.queries.Similarity.pqOracleCodebookPath(sf))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
      .sortBy(t => (t._1, t._2))
    val base = Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull && size(col("embedding")) >= M * SubDim)
      .select(col("vec_id"), col("embedding"))
    val a = collectTabs(foldedTabs(base, cb))
    val b = collectTabs(exprTabs(base, cb))
    assert(a == b && a.nonEmpty)
  }
}
