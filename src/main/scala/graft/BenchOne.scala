package graft
import org.apache.spark.sql.SparkSession
/** Dev helper: time one named query (args: name sfDir [reps]). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(s"rep$i: ${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
