package graft

import graft.operators.SkewTools
import org.apache.spark.sql.functions._

/** Scale-technique specs: bucketed co-located joins, salted skew joins,
  * approximate aggregates — the 100 TB levers, exercised for correctness
  * and for the physical-plan property that makes them worth using. */
class ScaleSpec extends GraftSuite {

  test("bucketed tables join without a shuffle (co-located sort-merge)") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // skew: 90% of left rows share one key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val right = (1L to 2000L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k"))
      .select("k", "payload", "name").collect().map(_.mkString("|")).sorted
    val salted = SkewTools.saltedJoin(left, right, Seq("k"), col("payload"), 8)
      .select("k", "payload", "name").collect().map(_.mkString("|")).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("approximate aggregates land within tolerance of the exact twins") {
    val approx = q("agg_approx").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = q("agg_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val median = q("agg_percentile").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    for ((flag, (aParts, aMed)) <- approx) {
      assert(math.abs(aParts - exact(flag)).toDouble / exact(flag) < 0.05,
        s"$flag approx distinct $aParts vs ${exact(flag)}")
      assert(math.abs(aMed - median(flag)) <= 1.0,
        s"$flag approx median $aMed vs ${median(flag)}")
    }
  }

  test("wordcount over a directory of text files matches the parquet path (O1/O2 parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-txt")
    Tables.documents(spark, sf).select("doc_id", "text").collect().foreach { r =>
      java.nio.file.Files.writeString(dir.resolve(s"doc_${r.getLong(0)}.txt"), r.getString(1))
    }
    val fromText = _root_.graft.queries.WordCount.wordcountFromTextDir(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val fromParquet = q("wordcount").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(fromText.toSeq == fromParquet.toSeq)
  }

  test("fnv32a is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT fnv32a('abc') AS h, fnv32a('') AS h0")
      .collect().head
    assert(got.getLong(0) == 0x1a47e90bL)
    assert(got.getLong(1) == 2166136261L)
  }
}
