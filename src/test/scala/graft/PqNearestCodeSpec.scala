package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Value-identity gate for the round-16 PQ-encoder rewrite: the
  * [[graft.functions.PqNearestCode]] expression must pick the SAME
  * code as the literal-folded `array_sort(array(struct(d2, code)))`
  * margin-gated argmin it replaced (reconstructed verbatim here —
  * the pre-round-16 `SimilarityCore.pqEncode` Column algebra),
  * per subspace, over the real embeddings corpus with a synthetic
  * deterministic codebook INCLUDING planted exact duplicates (decimal
  * tie-break by code) and sub-epsilon-gap entries (forces the decimal
  * phase). */
class PqNearestCodeSpec extends GraftSuite {

  private val Eps = 1e-9
  private val SubDim = 16
  private val M = 4

  private def dotDbl(a: Column, b: Column): Column =
    graft.functions.FloatDotProduct.float_dot(a, b)
  private def dotDec(a: Column, b: Column): Column =
    graft.functions.DecimalDotProduct.decimal_dot(a, b)

  private def subVec(e: Column, m: Int): Column =
    slice(e, m * SubDim + 1, SubDim)

  private def d2Dbl(sv: Column, c: Seq[Float]): Column = {
    val cl = typedLit(c)
    dotDbl(sv, sv) - lit(2.0) * dotDbl(sv, cl) + dotDbl(cl, cl)
  }

  private def d2Dec(sv: Column, c: Seq[Float]): Column = {
    val cl = typedLit(c)
    def dd(a: Column, b: Column): Column = dotDec(a, b).cast("decimal(20,12)")
    dd(sv, sv) - dd(sv, cl) - dd(sv, cl) + dd(cl, cl)
  }

  /** The pre-round-16 folded encoder, verbatim. */
  private def foldedEncode(df: DataFrame,
      cb: Array[(Int, Int, Seq[Float])]): DataFrame =
    (0 until M).foldLeft(df) { (acc, m) =>
      val cands = cb.filter(_._1 == m)
      val sv = subVec(col("embedding"), m)
      val fastArr = array(cands.map { case (_, code, c) =>
        struct(d2Dbl(sv, c).as("d2"), lit(code).as("code")) }: _*)
      val decArr = array(cands.map { case (_, code, c) =>
        struct(d2Dec(sv, c).as("d2"), lit(code).as("code")) }: _*)
      acc.withColumn("sf", array_sort(fastArr))
        .withColumn("gap",
          when(lit(cands.length >= 2),
            element_at(col("sf"), 2).getField("d2") -
              element_at(col("sf"), 1).getField("d2")))
        .withColumn("ambig", coalesce(col("gap") <= Eps, lit(false)))
        .withColumn(s"code_$m",
          when(col("ambig"), element_at(array_sort(decArr), 1).getField("code"))
            .otherwise(element_at(col("sf"), 1).getField("code")))
        .drop("sf", "gap", "ambig")
    }

  private def exprEncode(df: DataFrame,
      cb: Array[(Int, Int, Seq[Float])]): DataFrame =
    (0 until M).foldLeft(df) { (acc, m) =>
      val cands = cb.filter(_._1 == m).map { case (_, code, c) => (code, c) }
      acc.withColumn(s"code_$m",
        graft.functions.PqNearestCode.pq_nearest_code(
          col("embedding"), m * SubDim, SubDim, cands, Eps))
    }

  test("expression == folded form on the real corpus, incl. planted ties") {
    val base = Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull && size(col("embedding")) >= M * SubDim)
      .select(col("vec_id"), col("embedding"))
    // deterministic synthetic codebook: per subspace, codes 0/1 are
    // EXACT duplicates (every row's fast gap is 0 → decimal phase,
    // code tie-break), code 2 a sub-eps perturbation, codes 3..7
    // spread — exercises both phases and the lexicographic min
    val cb: Array[(Int, Int, Seq[Float])] = (0 until M).flatMap { m =>
      val dup = Seq.tabulate(SubDim)(i => ((i + m) % 5 - 2) * 0.25f)
      val near = dup.updated(0, dup.head + 1e-13f)
      Seq((m, 0, dup), (m, 1, dup), (m, 2, near)) ++
        (3 to 7).map(code => (m, code,
          Seq.tabulate(SubDim)(i => math.sin(m * 100 + code * 10 + i).toFloat)))
    }.toArray
    val cols = col("vec_id") +: (0 until M).map(m => col(s"code_$m"))
    val a = foldedEncode(base, cb).select(cols: _*).collect()
      .map(r => r.getLong(0) -> (1 until M + 1).map(r.getInt)).toMap
    val b = exprEncode(base, cb).select(cols: _*).collect()
      .map(r => r.getLong(0) -> (1 until M + 1).map(r.getInt)).toMap
    assert(a.keySet == b.keySet && a.keySet.nonEmpty)
    val diffs = a.keys.filter(k => a(k) != b(k))
    assert(diffs.isEmpty, s"codes diverged on vec_ids ${diffs.take(5).toSeq.sorted}")
  }

  test("expression == folded form under the REAL trained codebook") {
    // the production path: whatever codebook the residual trainer
    // produced for this fixture (exported for the oracle), both
    // encoders must agree on the residual-coded corpus
    SparkEntry.queries("ann_ivfpq_residual")(spark, sf).collect()
    val cb = spark.read.parquet(graft.queries.Similarity
        .pqResOracleCodebookPath(sf, 2, graft.queries.Similarity.nlistFor(
          Tables.embeddings(spark, sf).filter(col("embedding").isNotNull &&
            size(col("embedding")) > 0 &&
            graft.functions.FloatDotProduct.float_dot(
              col("embedding"), col("embedding")) > lit(0d)).count())))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
      .sortBy(t => (t._1, t._2))
    val base = Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull && size(col("embedding")) >= M * SubDim)
      .select(col("vec_id"), col("embedding"))
    val cols = col("vec_id") +: (0 until M).map(m => col(s"code_$m"))
    val a = foldedEncode(base, cb).select(cols: _*).collect()
      .map(r => r.getLong(0) -> (1 until M + 1).map(r.getInt)).toMap
    val b = exprEncode(base, cb).select(cols: _*).collect()
      .map(r => r.getLong(0) -> (1 until M + 1).map(r.getInt)).toMap
    assert(a == b)
  }
}
