package graft
import org.apache.spark.sql.SparkSession
/** Dev helper: time one named query (args: name sfDir [reps]).
  *
  * SPARK_GRAFT_CONF takes comma-separated k=v runtime confs — the
  * measurement-protocol knobs (e.g.
  * `spark.graft.ann.bitsPerBand=8,spark.sql.files.maxPartitionBytes=4m`
  * for corpus-sized ANN buckets / un-bin-packed fixture scans). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // size-aware wide initial — derivation and evidence in [[Tuning]]
      // (SPARK_GRAFT_CONF below can still override it for protocols)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Tuning.initialShufflePartitions(sfDir, cpus.toInt).toString)
      .config("spark.sql.files.openCostInBytes",
        Tuning.scanOpenCostInBytes(sfDir, cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tuning.applyEnvConf(spark)
    // optional 4th arg: an untimed warmup query, so fresh-JVM single-rep
    // protocols (the only sound ones at ≥10M-row scale — same-JVM reps
    // inherit loaded state stores / heap residue) don't bill ~10 s of
    // one-time JVM/codegen/parquet-reader init to the measured query
    if (args.length > 3) {
      try SparkEntry.queries(args(3))(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[benchone] warmup ${args(3)} failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(s"rep$i: ${(System.nanoTime() - t0) / 1e9}")
      // attribute one-time staging builds separately (same ledger
      // contract as Bench): printed on the rep that built them
      Staging.drainBuildTimes().foreach { case (n, s) =>
        println(f"  stage $n: $s%.2f")
      }
    }
    spark.stop()
  }
}
