package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table loaders for the driver-generated fixture tables
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * All readers are plain parquet scans so Catalyst's predicate pushdown /
  * column pruning reach the file scan (verify with
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`). At 100 TB the
  * same entry points would read a partitioned table root; nothing here
  * assumes single-file layout.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** Fixture contract for `documents.lang` (round-11 advice): the
    * strings 'UNKNOWN' and 'ALL' are RESERVED values —
    *  - 'UNKNOWN': the per-lang scope queries (text_freq_merge,
    *    text_langid's eval join, agg_quantile_merge) fold a NULL lang
    *    to this sentinel on both engines, so a corpus that legitimately
    *    shipped lang='UNKNOWN' would silently merge that population
    *    with the NULL-lang scope;
    *  - 'ALL': the sketch-rollup queries (text_freq_merge,
    *    agg_quantile_merge, agg_sketch_merge) label their global rollup
    *    row with this scope, so a corpus shipping lang='ALL' would
    *    collide two populations under one scope key (and their oracles'
    *    UNION + GROUP BY would merge them differently than the engines'
    *    two distinct rows — a hash hazard, round-12 review finding).
    * A deployment whose lang domain can contain either literal must
    * remap it at ingest (or change the sentinels consistently at
    * TextAnalysis.scala / Relational.scala / the oracle SQL — the fold
    * and rollup sites reference this contract). */
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` has shipped in three parquet flavors across fixture
    * generations; normalize all of them to microsecond TimestampType so
    * every consumer (windows, as-of joins, streaming watermarks) sees one
    * schema:
    *
    *  - TIMESTAMP(NANOS): unreadable as a Catalyst timestamp, so read raw
    *    nanos via the legacy flag and truncate. `DIV` (integer division) is
    *    load-bearing: nanos since epoch (~1.7e18) exceed 2^53, so `/`
    *    (double division) would silently lose microseconds.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): inferred as
    *    TIMESTAMP_NTZ, which `unix_micros`/watermarks reject. Cast to
    *    TimestampType — with the session timezone pinned to UTC (all graft
    *    entry points do this) the cast is wall-clock-preserving, which is
    *    exactly how DuckDB (the oracle) renders the same naive values.
    *  - TIMESTAMP(MICROS, adjusted): already TimestampType; pass through.
    *
    * Fixture contract (round-7 advice): event timestamps are POST-EPOCH.
    * The nanos `DIV 1000` here and the week bucketing in events_retention
    * truncate toward zero in Spark while the DuckDB oracle's `//` floors —
    * identical on non-negative operands only. Pre-1970 event data would
    * need floor semantics on both sides before trusting either. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType.typeName match {
      case "long"          => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case "timestamp_ntz" => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _               => raw
    }
  }
}
