package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev helper: synthesize an N× corpus from an existing fixture dir to
  * measure how the dedup/ANN family scales one order of magnitude up
  * (docs/SCALING.md records the curve; the round-2 verdict asked for a
  * real 10× datapoint behind the plan-shape argument).
  *
  * Design: each replica k is an ISOMORPHIC SHARD of the source, not a
  * copy —
  *  - documents: ids offset by k·10⁶ and text mapped through a
  *    per-replica alphabet rotation. A character bijection preserves
  *    every length, every char-4-gram Jaccard, and every word-shingle
  *    Jaccard WITHIN the shard (the planted near-dup structure scales
  *    linearly, as organic growth would), while shards share essentially
  *    no grams with each other (letters dominate real text), so
  *    cross-shard near-dup pairs stay as rare as in a real corpus.
  *    Naive duplication would instead add 10 exact copies of every doc —
  *    quadratic pair inflation inside every duplicate cluster, which is
  *    NOT what a bigger corpus looks like.
  *  - embeddings: ids offset and the float array rotated by k·7 mod 64
  *    positions. A fixed permutation preserves norms and within-shard
  *    pairwise cosines exactly; across shards, permuted random vectors
  *    decorrelate (cosine ~ N(0, 1/64)), so no spurious cross-shard
  *    near-dups or ANN ties appear.
  *
  *  - events: ids offset, everything else kept — "N× traffic over the
  *    same horizon" (fixed window count, linear rows per window).
  *  - lineitem/orders: orderkeys offset per replica (join keys must not
  *    collide), dimension keys kept — N× fact volume per dim member.
  *  - small dims copied verbatim.
  *
  * Usage: ScaleData <srcSfDir> <outDir> [factor=10] — writes a COMPLETE
  * fixture dir (documents, embeddings, events, lineitem, orders +
  * copied dims) so any driver query or streaming job can run against it.
  */
object ScaleData {

  private val Alpha = "abcdefghijklmnopqrstuvwxyz"

  def replicateDocuments(src: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { k =>
      val r = k % Alpha.length
      val rotated = Alpha.drop(r) + Alpha.take(r)
      val rotatedUpper = rotated.toUpperCase
      src.select(
        (col("doc_id") + lit(k.toLong * 1000000L)).as("doc_id"),
        translate(col("text"), Alpha + Alpha.toUpperCase, rotated + rotatedUpper).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)

  def replicateEmbeddings(src: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { k =>
      val r = (k * 7) % HyperDims
      src.select(
        (col("vec_id") + lit(k.toLong * 1000000L)).as("vec_id"),
        (if (r == 0) col("embedding")
         else expr(s"concat(slice(embedding, ${r + 1}, ${HyperDims - r}), slice(embedding, 1, $r))"))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)

  /** events: replica k offsets event_id only — user_id, ts, type, value,
    * props are kept, so the result is "N× traffic over the same time
    * horizon": window COUNT stays fixed while rows per window grow
    * linearly (map-side partial agg absorbs that), sessions get
    * proportionally denser per user, and streaming state size (keyed by
    * window/session) is unchanged while throughput grows — the organic
    * growth model for an event stream. */
  def replicateEvents(src: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { k =>
      src.withColumn("event_id", col("event_id") + lit(k.toLong * 1000000L))
    }.reduce(_ unionByName _)

  /** facts keyed by a join key (lineitem/orders on orderkey): the key is
    * offset per replica so shards never collide on it, while dimension
    * keys (part/supp/cust) are kept — N× fact volume per dimension
    * member, which is how a fact table actually grows. */
  def replicateKeyed(src: DataFrame, keyCols: Seq[String], factor: Int): DataFrame =
    (0 until factor).map { k =>
      keyCols.foldLeft(src)((df, c) =>
        df.withColumn(c, col(c) + lit(k.toLong * 1000000L)))
    }.reduce(_ unionByName _)

  private val HyperDims = graft.functions.HyperplaneBuckets.Dims

  /** Write as ONE parquet FILE (not a directory): the streaming file
    * source ([[graft.streaming.Streaming.eventsStream]]) stages
    * `<dir>/events.parquet` with a plain file copy, matching the
    * driver-fixture layout. */
  private def writeSingleFile(df: DataFrame, out: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = out + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(p =>
        p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    Files.move(part, Paths.get(out), StandardCopyOption.REPLACE_EXISTING)
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => Files.deleteIfExists(f))
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    // the alphabet rotation is only a DISTINCT bijection per replica for
    // k < 26 — beyond that k % 26 cycles and plants exact cross-shard
    // text duplicates, breaking the isomorphic-shard property (factor
    // ≤ 26 also keeps k·7 mod 64 embedding rotations distinct: 7 is
    // coprime with 64, cycling only at k = 64)
    require(factor >= 1 && factor <= Alpha.length,
      s"factor must be in [1, ${Alpha.length}]: alphabet rotations repeat beyond that")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // replica ids are offset by k·10⁶ — source ids must stay below that
    // or shards collide on id
    val maxIds = Seq(
      Tables.documents(spark, srcDir).agg(max("doc_id")).head.getLong(0),
      Tables.embeddings(spark, srcDir).agg(max("vec_id")).head.getLong(0),
      Tables.events(spark, srcDir).agg(max("event_id")).head.getLong(0),
      Tables.orders(spark, srcDir).agg(max("o_orderkey")).head.getLong(0)).max
    require(maxIds < 1000000L,
      s"source ids reach $maxIds >= 1e6 — replica id offsets (k*1e6) would collide")
    replicateDocuments(Tables.documents(spark, srcDir), factor)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    replicateEmbeddings(Tables.embeddings(spark, srcDir), factor)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // events as one FILE (streaming staging copies it; ts normalized to
    // micros by Tables.events — consumers accept either encoding)
    writeSingleFile(replicateEvents(Tables.events(spark, srcDir), factor),
      s"$outDir/events.parquet")
    replicateKeyed(Tables.lineitem(spark, srcDir), Seq("l_orderkey"), factor)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    replicateKeyed(Tables.orders(spark, srcDir), Seq("o_orderkey"), factor)
      .repartition(8).write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    // small dims copied verbatim so the out dir is a COMPLETE fixture
    // any driver query can run against
    for (t <- Seq("region", "nation", "customer", "supplier", "part")) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(srcDir, s"$t.parquet"),
        java.nio.file.Paths.get(outDir, s"$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    println(s"wrote ${factor}x of $srcDir to $outDir")
    spark.stop()
  }
}
