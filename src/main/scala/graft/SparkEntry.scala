package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's query + DuckDB oracle from the
  * per-area modules under [[graft.queries]].
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    _root_.graft.queries.WordCount,
    _root_.graft.queries.Relational,
    _root_.graft.queries.Scalars,
    _root_.graft.queries.Windows,
    _root_.graft.queries.TextAnalysis,
    _root_.graft.queries.Temporal,
    _root_.graft.queries.Subqueries,
    _root_.graft.queries.Dedup,
    _root_.graft.queries.Similarity,
    _root_.graft.queries.Multimodal,
    _root_.graft.queries.Graph,
    _root_.graft.queries.Bpe
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("wordcount")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 / §7.2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap

  /** Micro-batch-harness gates aggregated from the modules — the
    * bench's batch/streaming warm-split membership (see
    * [[QueryModule.microBatchGates]]). */
  def microBatchGates: Set[String] =
    modules.flatMap(_.microBatchGates).toSet
}
