package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage and layout techniques: the reference only
  * knows text directories (O1/O2/O11); a usable engine round-trips the
  * standard columnar/row formats and exploits partitioned layout. */
class SourcesSpec extends GraftSuite {

  private lazy val sample = Tables.lineitem(spark, sf)
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  private def roundtrip(fmt: String, opts: Map[String, String] = Map.empty): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$fmt").toString + "/t"
    sample.write.options(opts).format(fmt).save(dir)
    val back = spark.read.options(opts).format(fmt)
      .schema(sample.schema) // csv/json would otherwise re-infer types
      .load(dir)
    assert(back.count() == sample.count(), s"$fmt row count")
    val a = sample.collect().map(_.mkString("|")).sorted
    val b = back.collect().map(_.mkString("|")).sorted
    assert(a.toSeq == b.toSeq, s"$fmt contents")
  }

  test("csv round-trip preserves data")  { roundtrip("csv", Map("header" -> "true")) }
  test("json round-trip preserves data") { roundtrip("json") }
  test("orc round-trip preserves data")  { roundtrip("orc") }

  test("gzip jsonl round-trip: data intact, but gz files are non-splittable (1 task/file)") {
    // the web-scrape delivery format (docs.jsonl.gz). Correctness is the
    // round-trip; the SCALE note is the partition shape: a gzip stream
    // has no sync points, so one .gz file = one task no matter its size
    // — a 100 TB ingest wants many medium .gz files (or zstd/parquet),
    // never a few huge ones, and the partition count pins that here.
    roundtrip("json", Map("compression" -> "gzip"))
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-gz").toString + "/t"
    sample.write.option("compression", "gzip").json(dir)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".json.gz"))
    assert(files >= 1)
    val parts = spark.read.schema(sample.schema).json(dir).rdd.getNumPartitions
    assert(parts == files, s"expected 1 task per gz file, got $parts for $files files")
  }

  test("compaction rewrites a small-file mess into size-targeted files, data intact") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val inDir = base + "/in"
    val outDir = base + "/out"
    // simulate a streaming-ingest mess: 64 tiny files
    sample.repartition(64).write.parquet(inDir)
    val smallFiles = new java.io.File(inDir).listFiles
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(smallFiles == 64)
    val totalBytes = org.apache.commons.io.FileUtils.sizeOfDirectory(new java.io.File(inDir))
    val target = totalBytes / 4 // aim for ~4-5 output files
    val n = graft.operators.Compaction.compact(spark, inDir, outDir, target)
    val outFiles = new java.io.File(outDir).listFiles
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(outFiles == n && n >= 4 && n <= 6, s"n=$n outFiles=$outFiles")
    // contents identical
    val a = sample.collect().map(_.mkString("|")).sorted
    val b = spark.read.parquet(outDir).collect().map(_.mkString("|")).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("corrupt-record ingest: PERMISSIVE quarantines bad lines, FAILFAST raises") {
    // the production ingest contract for semi-structured drops: a crawl
    // batch with malformed lines must not kill the job (PERMISSIVE +
    // _corrupt_record = the quarantine column downstream routes to a
    // dead-letter sink) and must be able to kill it on demand (FAILFAST
    // for pipelines where a bad line means an upstream bug)
    val dir = java.nio.file.Files.createTempDirectory("graft-corrupt")
    java.nio.file.Files.writeString(dir.resolve("batch.jsonl"),
      """{"id": 1, "text": "good row"}
        |{"id": 2, "text": "also good"}
        |{"id": 3, "text": "unterminated
        |not json at all
        |{"id": 4, "text": "good again"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id LONG, text STRING, _corrupt_record STRING")
    val read = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
    // caching first is the documented requirement for referencing the
    // corrupt column (Spark refuses a query that selects ONLY internal
    // corrupt-record columns from an un-cached scan)
    read.cache()
    val good = read.filter(col("_corrupt_record").isNull)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val bad = read.filter(col("_corrupt_record").isNotNull).count()
    assert(good == Seq(1L, 2L, 4L))
    assert(bad == 2)
    read.unpersist()
    val e = intercept[Exception] {
      spark.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL("id LONG, text STRING"))
        .option("mode", "FAILFAST").json(dir.toString).collect()
    }
    assert(e.getMessage != null)
  }

  test("reference-style text sink: 'key value' lines (O11)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-txtout").toString + "/out"
    q("wordcount")
      .select(concat_ws(" ", col("word"), col("cnt")))
      .write.text(dir)
    val lines = spark.read.text(dir).collect().map(_.getString(0)).sorted
    assert(lines.nonEmpty)
    assert(lines.forall(_.matches("[a-zA-Z]+ \\d+")))
    val expected = q("wordcount").collect().map(r => s"${r.getString(0)} ${r.getLong(1)}").sorted
    assert(lines.toSeq == expected.toSeq)
  }

  test("dynamic partition pruning: dim filter prunes the fact scan at runtime") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString + "/docs"
    Tables.documents(spark, sf).write.partitionBy("lang").parquet(dir)
    val fact = spark.read.parquet(dir)
    // DPP requires a selective FILTER over a real relation on the dim
    // side (a literal LocalRelation doesn't qualify as a pruning filter)
    val dimPath = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString + "/dim"
    Seq(("en", "keep"), ("de", "drop"), ("fr", "drop"), ("es", "drop"), ("zh", "drop"))
      .toDF("lang", "tag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tag") === "keep")
    val joined = fact.join(dim, Seq("lang")).select("doc_id", "tag")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no DPP subquery in fact scan:\n$plan")
    val expected = Tables.documents(spark, sf).filter(col("lang") === "en").count()
    assert(joined.count() == expected)
  }

  test("hive-partitioned write enables partition pruning at read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/docs"
    Tables.documents(spark, sf).write.partitionBy("lang").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("lang") === "en")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), s"no partition filter:\n$plan")
    val expected = Tables.documents(spark, sf).filter(col("lang") === "en").count()
    assert(pruned.count() == expected)
  }
}
