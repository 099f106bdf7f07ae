package graft
import org.apache.spark.sql.SparkSession
/** Dev helper: print one named query's formatted physical plan against a
  * given fixture (args: name sfDir). Unlike [[ExplainDump]] (which writes
  * the whole surface to docs/PLANS.md at sf0.01), this targets plan audits
  * at scale fixtures, where AQE/broadcast decisions can differ.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // pre-execution plan: AQE-materialized subtrees elide after collect
    println(SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
