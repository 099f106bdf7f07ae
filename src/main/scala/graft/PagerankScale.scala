package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: pagerank iteration-count scaling evidence (round-13
  * verdict item 6 "done" criterion — 20 iterations at 100× with FLAT
  * per-iteration wall time). Runs [[graft.queries.Graph.pagerankRanks]]
  * at each requested iteration count against one fixture and prints
  * total + marginal per-iteration seconds: with the checkpointed
  * fixpoint, t(2k) − t(k) ≈ t(k) − t(0) (each iteration pays the same
  * one-step join-agg cost), where foldLeft unrolling grew the plan —
  * and the analysis/codegen bill — linearly in k.
  *
  * Usage: PagerankScale <sfDir> [iters,iters,...] (default 5,10,20) */
object PagerankScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iterCounts =
      if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(5, 10, 20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Tuning.initialShufflePartitions(sfDir, cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // untimed warmup builds the staged edges/degrees once (their cost
    // is one-time and reported separately, the BenchOne discipline)
    val t0 = System.nanoTime()
    graft.queries.Graph.pagerankRanks(spark, sfDir, 1).queryExecution.toRdd.count()
    println(f"warmup(1 iter + staging): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    Staging.drainBuildTimes().foreach { case (n, s) => println(f"  stage $n: $s%.2f s") }
    var prev = 0.0
    var prevIters = 0
    iterCounts.foreach { k =>
      val t = System.nanoTime()
      val n = graft.queries.Graph.pagerankRanks(spark, sfDir, k)
        .queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t) / 1e9
      val marginal =
        if (prevIters > 0) f" marginal ${(secs - prev) / (k - prevIters)}%.2f s/iter"
        else ""
      println(f"iters=$k%-3d total ${secs}%.1f s (${secs / k}%.2f s/iter, $n nodes)$marginal")
      prev = secs
      prevIters = k
    }
    spark.stop()
  }
}
