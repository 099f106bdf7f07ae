package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic for the LSH-blocked ops (dedup_embedding / ann_lsh):
  * prints the hottest (label, band, bucket) blocks and the total
  * pre-distinct candidate-pair volume at a given bits-per-band, i.e.
  * the exact work driver of the self-join. Args: sfDir bits [bands].
  * Use it to attribute wall-clock (block skew vs pair volume) before
  * turning the bitsPerBand lever — see docs/SCALING.md "Embeddings at
  * 100×". */
object BucketStats {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder.master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val bits = args(1).toInt
    val bands = if (args.length > 2) args(2).toInt else 4
    val e = Tables.embeddings(s, args(0))
      .withColumn("buckets",
        functions.HyperplaneBuckets.buckets(col("embedding"), bands, bits))
      .select(col("label"), posexplode(col("buckets")).as(Seq("band", "bucket")))
      .groupBy("label", "band", "bucket").count()
    val top = e.orderBy(col("count").desc).limit(10).collect()
    println("top blocks: " + top.map(r =>
      s"(l=${r.get(0)},b=${r.get(1)},k=${r.get(2)}):${r.getLong(3)}").mkString(" "))
    val pairs = e.agg(sum(col("count") * (col("count") - 1) / 2)).head.get(0)
    println(s"total candidate pairs (pre-distinct) at bits=$bits: $pairs")
    s.stop()
  }
}
