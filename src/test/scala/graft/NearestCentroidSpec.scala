package graft

import graft.functions.NearestCentroid
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Value-identity gate for the round-16 optimization that replaced
  * SimilarityCore.assignCentroid's literal-folded
  * `array_sort(array(struct(...2·nlist structs...)))` margin-gated
  * argmax with the O(1)-plan-size [[NearestCentroid]] codegen
  * expression: on every input the two formulations must pick the SAME
  * centroid. The folded form is reconstructed here verbatim (same
  * try_divide / array_sort / gap-gate Column algebra the query code
  * used through round 15) and compared row-for-row against the
  * expression over:
  *  - the real sf0.001 embeddings corpus with its trained quantizer
  *    (the production path every IVF consumer runs), and
  *  - an adversarial synthetic set with EXACT ties (duplicated
  *    centroids under different ids) and sub-epsilon gaps, which force
  *    the decimal phase and the (ns, c_id) lexicographic tie-break.
  */
class NearestCentroidSpec extends GraftSuite {

  private val Eps = 1e-9

  /** The pre-round-16 literal-folded assignment, verbatim. */
  private def foldedAssign(df: org.apache.spark.sql.DataFrame,
      centArr: Array[(Long, Seq[Float], Double)]): org.apache.spark.sql.DataFrame = {
    def dotDbl(a: Column, b: Column): Column =
      graft.functions.FloatDotProduct.float_dot(a, b)
    def dotDec(a: Column, b: Column): Column =
      graft.functions.DecimalDotProduct.decimal_dot(a, b)
    def negFast(ce: Seq[Float], cn2: Double): Column =
      -call_function("try_divide", dotDbl(col("embedding"), typedLit(ce)),
        sqrt(col("n2").cast("double") * lit(cn2)))
    def negDec(ce: Seq[Float], cn2: Double): Column =
      -call_function("try_divide",
        dotDec(col("embedding"), typedLit(ce)).cast("double"),
        sqrt(col("n2").cast("double") * lit(cn2)))
    val fastArr = array(centArr.map { case (cid, ce, cn2) =>
      struct(negFast(ce, cn2).as("ns"), lit(cid).as("c_id")) }: _*)
    val decArr = array(centArr.map { case (cid, ce, cn2) =>
      struct(negDec(ce, cn2).as("ns"), lit(cid).as("c_id")) }: _*)
    df.withColumn("sf", array_sort(fastArr))
      .withColumn("gap",
        when(lit(centArr.length >= 2),
          element_at(col("sf"), 2).getField("ns") -
            element_at(col("sf"), 1).getField("ns")))
      .withColumn("ambig", coalesce(col("gap") <= Eps, lit(false)))
      .withColumn("c_id",
        when(col("ambig"), element_at(array_sort(decArr), 1).getField("c_id"))
          .otherwise(element_at(col("sf"), 1).getField("c_id")))
      .drop("sf", "gap", "ambig")
  }

  private def exprAssign(df: org.apache.spark.sql.DataFrame,
      centArr: Array[(Long, Seq[Float], Double)]): org.apache.spark.sql.DataFrame =
    df.withColumn("c_id", NearestCentroid.nearest_centroid(
      col("embedding"), col("n2").cast("double"), centArr, Eps))

  private def compare(df: org.apache.spark.sql.DataFrame,
      centArr: Array[(Long, Seq[Float], Double)]): Unit = {
    val a = foldedAssign(df, centArr).select(col("vec_id"), col("c_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = exprAssign(df, centArr).select(col("vec_id"), col("c_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.keySet == b.keySet)
    val diffs = a.keys.filter(k => a(k) != b(k))
    assert(diffs.isEmpty,
      s"assignment diverged on vec_ids ${diffs.take(5).toSeq.sorted}")
  }

  test("expression == folded form on the real corpus + trained quantizer") {
    val base = Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0 &&
        graft.functions.FloatDotProduct.float_dot(
          col("embedding"), col("embedding")) > lit(0d))
      .select(col("vec_id"), col("embedding"),
        graft.functions.DecimalDotProduct.decimal_dot(
          col("embedding"), col("embedding")).as("n2"))
    // the served quantizer: run the query once so the content-addressed
    // centroid export exists, then read it the way the oracle does
    SparkEntry.queries("ann_ivf")(spark, sf).collect()
    val nlist = graft.queries.Similarity.nlistFor(base.count())
    val cent = spark.read.parquet(
      graft.queries.Similarity.ivfOracleCentroidsPath(sf, 2, nlist))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1),
        r.getDecimal(2).doubleValue()))
      .sortBy(_._1)
    assert(cent.length >= 10)
    compare(base, cent)
  }

  test("expression == folded form under exact ties and sub-eps gaps") {
    import spark.implicits._
    // centroids: c0/c1 identical (every row ties → decimal phase with
    // id tie-break), c2 a sub-eps perturbation of them, c3 far away
    val e0 = Seq.fill(8)(0.5f)
    val e2 = e0.updated(0, (0.5 + 1e-13).toFloat) // sub-eps fast gap
    val e3 = Seq.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    def n2of(v: Seq[Float]): Double =
      v.map(x => BigDecimal(x.toDouble * x.toDouble)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val cent = Array(
      (10L, e0, n2of(e0)), (11L, e0, n2of(e0)),
      (12L, e2, n2of(e2)), (13L, e3, n2of(e3)))
    val rows = (0 until 64).map { i =>
      val v = Seq.tabulate(8)(j => (math.sin(i * 8 + j) * 2).toFloat)
      (i.toLong, v)
    } ++ Seq((100L, e0), (101L, e2), (102L, e3)) // rows AT the centroids
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("n2", graft.functions.DecimalDotProduct.decimal_dot(
        col("embedding"), col("embedding")))
      .filter(graft.functions.FloatDotProduct.float_dot(
        col("embedding"), col("embedding")) > lit(0d))
    compare(df, cent)
    // single-centroid degenerate case: no gap, fast winner
    compare(df, cent.take(1))
  }
}
