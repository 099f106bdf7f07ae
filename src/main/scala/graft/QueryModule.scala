package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Contract (see SparkEntry): every key in `queries` SHOULD have a matching
  * DuckDB-runnable ANSI SQL in `oracles` (same column names, deterministic
  * ORDER BY); keys without an oracle get a weaker rows-only check.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}
