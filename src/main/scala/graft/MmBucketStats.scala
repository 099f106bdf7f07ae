package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic for mm_dedup_near's centered-descriptor blocking:
  * bucket histogram + pre-distinct pair volume + float-prefilter
  * survivor count at a given bits (args: sfDir bits [tauPrefilter]).
  * Attributes the self-join's wall-clock (pair enumeration vs decimal
  * rescore volume) before turning the bucket-target lever.
  *
  * The descriptor pipeline is [[graft.queries.Multimodal.nearDescriptors]]
  * — the SAME code the query runs (round-9 review: a copy-pasted
  * pipeline here would silently drift from the one being tuned). */
object MmBucketStats {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = args(0); val bits = args(1).toInt
    val pre = if (args.length > 2) args(2).toDouble else 0.945
    val bucketed = graft.queries.Multimodal.nearDescriptors(s, d)
      .withColumn("bkts",
        functions.HyperplaneBuckets.buckets(col("fc"), 4, bits))
      .select(col("doc_id"), col("f"), posexplode(col("bkts")).as(Seq("band", "bucket")))
      .cache()
    val hist = bucketed.groupBy("band", "bucket").count().cache()
    println("top blocks: " + hist.orderBy(col("count").desc).limit(10).collect()
      .map(r => s"(b=${r.get(0)},k=${r.get(1)}):${r.getLong(2)}").mkString(" "))
    println("pre-distinct pairs at bits=" + bits + ": " +
      hist.agg(sum(col("count") * (col("count") - 1) / 2)).head.get(0))
    def fdot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      functions.FloatDotProduct.float_dot(a, b)
    val surv = bucketed.as("a").join(bucketed.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .withColumn("cos_fast", fdot(col("a.f"), col("b.f")) /
        sqrt(fdot(col("a.f"), col("a.f")) * fdot(col("b.f"), col("b.f"))))
      .filter(col("cos_fast") >= pre)
      .count()
    println(s"float-prefilter survivors (>= $pre): $surv")
    s.stop()
  }
}
