package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Judge artifact for optimization rounds: write `explain("formatted")`
  * for a comma-separated query list to `<outDir>/<query>_<suffix>.txt`.
  * `tools/run.sh graft.PlanFiles <q1,q2,...> <sfDir> <outDir> <suffix>` */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "plans/r16"
    val suffix = if (args.length > 3) args(3) else "before"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"),
        s"== $name @ $sfDir (${java.time.Instant.now()}) ==\n$plan")
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
