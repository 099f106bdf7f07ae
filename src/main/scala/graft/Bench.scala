package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line
  * {"metric":"total","value":sec,...,"queries":{name:sec,...}}.
  *
  * Each query materializes through the noop sink — unlike count(), which
  * lets Catalyst prune computed columns — so timings reflect the full
  * operator work.
  *
  * Measurement discipline (round-2 verdict findings):
  *  - Single-JVM timings are noisy (JIT/GC drift of ±0.3–1.7 s per query
  *    was observed round-over-round with zero code change), so each query
  *    runs SPARK_GRAFT_BENCH_REPS times (default 3): "queries" reports
  *    the per-query MEDIAN, "queries_first" the first (cold) run, so a
  *    regression can be told apart from one slow sample.
  *  - Shared [[Staging]] parquet builds used to be billed to whichever
  *    query touched the stage first (alphabetical accident); now each
  *    query's cold run drains the staging ledger, the build seconds are
  *    reported under "staging" as their own line, and the cold time is
  *    net of them — so per-query numbers + staging sum to "value".
  */
object Bench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one untimed warmup query so one-time JVM/codegen/parquet-reader
    // initialization isn't billed to whichever query runs first
    // (measured ~5s on the alphabetically-first query otherwise)
    try SparkEntry.queries("filter_project")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    spark.catalog.clearCache()
    Staging.drainBuildTimes() // zero the ledger before timed runs

    val stagingTotals = scala.collection.mutable.Map.empty[String, Double]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // isolate queries from each other: drop cached relations/broadcasts
      // from the previous query so its GC debt isn't billed to this one
      spark.catalog.clearCache()
      System.gc()
      val times = (1 to reps).flatMap { i =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name rep$i failed: ${e.getMessage}"); false
          }
        val raw = (System.nanoTime() - t0) / 1e9
        // stage builds triggered by this rep (only ever the first toucher)
        // are attributed to the shared "staging" line, not this query
        val staged = Staging.drainBuildTimes()
        staged.foreach { case (st, secs) =>
          stagingTotals.update(st, stagingTotals.getOrElse(st, 0.0) + secs)
        }
        if (ok) Some(raw - staged.values.sum) else None
      }
      if (times.length == reps) name -> (times.head, median(times))
      else name -> (-1.0, -1.0) // any failed rep marks the query failed
    }

    val qs = results.map { case (k, (_, med)) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val qsFirst = results.map { case (k, (first, _)) => "\"" + k + "\":" + first }
      .mkString("{", ",", "}")
    val stg = stagingTotals.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val stagingTotal = stagingTotals.values.sum
    // -1 sentinels mark failures; only successful timings enter the total
    val total = results.collect { case (_, (_, med)) if med >= 0 => med }.sum + stagingTotal
    val nFailed = results.count(_._2._2 < 0)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$nFailed,"reps":$reps,""" +
        s""""staging_total":$stagingTotal,"staging":$stg,"queries":$qs,""" +
        s""""queries_first":$qsFirst,"sf":"$sfDir"}"""
    println(json)
    // belt-and-braces for parsers scraping a logger-decorated stdout: the
    // bare JSON line is also written to a known file (path derived from
    // the checkout, overridable — a hardcoded /root/repo threw elsewhere)
    try {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        sys.props.getOrElse("user.dir", ".") + "/bench_out.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(out), (json + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write bench_out.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
