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
  * Usage: ScaleData <srcSfDir> <outDir> [factor=10] [tables] — writes a
  * COMPLETE fixture dir (documents, embeddings, events, lineitem, orders
  * + copied dims) so any driver query or streaming job can run against
  * it. The optional comma-separated `tables` arg restricts generation
  * (e.g. "documents,events" for a 100× run that only feeds the dedup and
  * streaming heavies).
  */
object ScaleData {

  private val Alpha = "abcdefghijklmnopqrstuvwxyz"

  /** Per-replica alphabet bijection: rotation for k < 26 (the original
    * 10× scheme, kept so 10× fixtures stay byte-identical across rounds),
    * a seeded Fisher-Yates permutation beyond (rotations cycle at 26 and
    * would plant exact cross-shard text duplicates at factor 100). ANY
    * bijection preserves within-shard lengths and gram/shingle Jaccard
    * exactly; distinct permutations keep cross-shard gram overlap as low
    * as distinct rotations do. */
  private[graft] def alphaMap(k: Int): String =
    if (k < Alpha.length) Alpha.drop(k) + Alpha.take(k)
    else {
      val arr = Alpha.toCharArray
      val rnd = new scala.util.Random(0xC0FFEEL + k)
      var i = arr.length - 1
      while (i > 0) {
        val j = rnd.nextInt(i + 1)
        val t = arr(i); arr(i) = arr(j); arr(j) = t
        i -= 1
      }
      new String(arr)
    }

  def replicateDocuments(src: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { k =>
      val mapped = alphaMap(k)
      val mappedUpper = mapped.toUpperCase
      src.select(
        (col("doc_id") + lit(k.toLong * 1000000L)).as("doc_id"),
        translate(col("text"), Alpha + Alpha.toUpperCase, mapped + mappedUpper).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)

  /** Per-replica sign-flip pattern for k ≥ [[HyperDims]] (seeded, so
    * reruns agree); at least one dimension always flips so the pattern
    * never equals the implicit all-positive pattern of the k <
    * HyperDims rotation-only shards. */
  private[graft] def signPattern(k: Int): Array[Boolean] = {
    val rnd = new scala.util.Random(0x51611AB5L + k)
    val flips = Array.fill(HyperDims)(rnd.nextBoolean())
    if (!flips.contains(true)) flips(0) = true
    flips
  }

  /** SQL for replica k's embedding transform: rotation by k·7 mod 64
    * (distinct while 7 is coprime with 64, i.e. k < 64 — the original
    * 10× scheme, unchanged so existing fixtures stay byte-identical)
    * composed, for k ≥ 64, with a per-replica sign-flip pattern. Both
    * are isometries of the dot product — a coordinate permutation only
    * reorders the summed products, and flipping dimension j negates
    * BOTH factors of its product — so norms and every within-shard
    * pairwise cosine are preserved EXACTLY (float-bit-exactly:
    * negation and reordering don't round), while distinct transforms
    * decorrelate shards just as distinct rotations do. */
  private[graft] def embeddingSql(k: Int): String = {
    val r = (k * 7) % HyperDims
    val rotated =
      if (r == 0) "embedding"
      else s"concat(slice(embedding, ${r + 1}, ${HyperDims - r}), slice(embedding, 1, $r))"
    if (k < HyperDims) rotated
    else {
      // ±1 int literals: x * (-1) is an exact float negation
      val signs = signPattern(k).map(f => if (f) "-1" else "1").mkString(",")
      s"zip_with($rotated, array($signs), (x, s) -> CAST(x * s AS FLOAT))"
    }
  }

  def replicateEmbeddings(src: DataFrame, factor: Int): DataFrame = {
    // distinct (rotation, signs) per replica or shards would carry exact
    // duplicate vectors and corrupt dedup/ANN structure; seeded 64-bit
    // patterns collide with negligible probability, but verify anyway
    val transforms = (0 until factor).map(embeddingSql)
    require(transforms.toSet.size == factor,
      s"replica transforms collide at factor $factor")
    (0 until factor).map { k =>
      src.select(
        (col("vec_id") + lit(k.toLong * 1000000L)).as("vec_id"),
        expr(transforms(k)).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
  }

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
  /** Recursively delete `p` if it exists (streams closed via try/finally). */
  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  private[graft] def writeSingleFile(df: DataFrame, out: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = out + ".tmpdir"
    // Parquet splits at ROW-GROUP granularity: one coalesced writer with
    // the default 128 MB block size gave the 10M-row events file just 2
    // row groups, capping every batch scan of it at 2 working tasks no
    // matter how many byte-range splits Spark makes (measured: the
    // single-task JSON-parse scan dominated events_enriched at 16.6 s;
    // 8 MB row groups → 2.1 s). 8 MB keeps ≥20 row groups
    // for any fixture ≥ 160 MB while staying irrelevant at 100 TB where
    // files and row groups are abundant.
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", (8L * 1024 * 1024).toString)
      .parquet(tmp)
    val list = Files.list(Paths.get(tmp))
    val part =
      try list.filter(p =>
          p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(".parquet"))
        .findFirst().orElseThrow()
      finally list.close()
    // the destination may exist as a DIRECTORY from an older
    // directory-writing layout — Files.move(REPLACE_EXISTING) can only
    // replace a file or an empty dir, so clear it first
    deleteRecursively(Paths.get(out))
    Files.move(part, Paths.get(out), StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(Paths.get(tmp))
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    // optional 4th arg: comma-separated table subset (default all) — a
    // 100× run usually needs only the tables its target queries read
    val wanted: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet
      else Set("documents", "embeddings", "events", "lineitem", "orders")
    // documents: any factor (seeded permutations beyond 26 rotations).
    // embeddings: rotations for k < 64, rotation + seeded sign-flips
    // beyond (see embeddingSql) — replicateEmbeddings verifies the
    // transforms are pairwise distinct.
    require(factor >= 1, "factor must be >= 1")
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
    if (wanted.contains("documents"))
      replicateDocuments(Tables.documents(spark, srcDir), factor)
        .repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    if (wanted.contains("embeddings"))
      replicateEmbeddings(Tables.embeddings(spark, srcDir), factor)
        .repartition(32).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // events as one FILE (streaming staging copies it; ts normalized to
    // micros by Tables.events — consumers accept either encoding)
    if (wanted.contains("events"))
      writeSingleFile(replicateEvents(Tables.events(spark, srcDir), factor),
        s"$outDir/events.parquet")
    if (wanted.contains("lineitem"))
      replicateKeyed(Tables.lineitem(spark, srcDir), Seq("l_orderkey"), factor)
        .repartition(32).write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    if (wanted.contains("orders"))
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
