package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM under Test/fork). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  val sf: String = SparkTestBase.sf
  def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Run EVERY query against a fixture dir once, returning
    * ("name: message" per query that threw, row count per query that
    * ran) — the shared loop of the robustness-gate suites
    * (EmptyFixtureSpec, NullFixtureSpec). */
  def runAllQueries(dir: String): (Seq[String], Map[String, Long]) = {
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    val counts = scala.collection.mutable.Map.empty[String, Long]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // toRdd.count(), NOT count(): count() lets Catalyst PRUNE the
      // entire projection, so a per-row evaluation error in an output
      // column (e.g. an ANSI element_at on an empty array) never runs
      // and the robustness gates silently pass — text_langid's
      // null-text crash hid behind exactly this for two rounds. toRdd
      // materializes every output column of the optimized plan.
      val t0 = System.nanoTime()
      try counts(name) = fn(spark, dir).queryExecution.toRdd.count()
      catch { case e: Throwable =>
        failures += s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(100)}"
      }
      // gate-cost diagnostics: full materialization (above) made the
      // fixture gates honest but also slower — keep the hot spots visible
      val secs = (System.nanoTime() - t0) / 1e9
      if (secs > 5.0) System.err.println(f"[gate $dir] $name%-32s ${secs}%.1fs")
    }
    (failures.toSeq, counts.toMap)
  }
}
