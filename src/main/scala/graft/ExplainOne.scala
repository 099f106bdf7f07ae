package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: print one query's FINAL (AQE-executed) physical plan —
  * `tools/run.sh graft.ExplainOne <name> <sfDir> [condensed]`. With the
  * third arg, prints only the structural lines (exchanges, aggregates,
  * windows, joins, scans) — the shuffle audit one actually reads. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val condensed = args.length > 2
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // materialize so AQE finalizes the plan
    val p = df.queryExecution.executedPlan.toString
    val fin = p.split("== Initial Plan ==")(0)
    if (condensed)
      println(fin.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Aggregate") ||
          l.contains("Window") || l.contains("Scan parquet") ||
          l.contains("Join") || l.contains("Generate")).mkString("\n"))
    else println(fin)
    spark.stop()
  }
}
