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

  /** Query keys that run the MICRO-BATCH STREAMING HARNESS — the bench
    * warm-series split class (streaming gates are a ±40% per-run band
    * even idle, batch ±8%; docs/SCALING.md back-to-back study).
    * Declared by each module NEXT TO the queries it registers
    * (round-15 advice: Bench previously classified by the
    * `streaming_` name prefix plus a hardcoded exception, so a future
    * harness gate under another name would silently land in
    * batch_total and re-widen the regression signal the split
    * protects). WordCountSpec pins tag/registry consistency. */
  def microBatchGates: Set[String] = Set.empty
}
