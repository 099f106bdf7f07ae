package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (`embedding:
  * Array[Float]`, 64-dim) — builder prompt's ANN requirement.
  *
  *  - `ann_brute`: exact cosine top-k for a query set, via broadcast of
  *    the (small, bounded) query vectors against the full corpus — the
  *    correct baseline at any scale when |queries| is small: one narrow
  *    pass over the corpus, a per-partition top-k, no corpus self-join.
  *  - `ann_lsh`: random-hyperplane LSH variant — the 100 TB path when
  *    the query side is also huge: bucket by sign-pattern, search only
  *    same-bucket candidates. Hyperplanes are md5-derived so both engines
  *    (and reruns) see identical planes. Oracle-checked for exactness of
  *    the bucketing + scoring; recall vs `ann_brute` is asserted in
  *    ScalaTest (approximate ops have no exact SQL ground truth).
  *  - `emb_knn_class`: k-NN label vote for the query set (classification
  *    shape on top of top-k).
  *
  * Cross-engine float discipline: float×float promoted to double is
  * EXACT (24-bit mantissas); the sum of those products is the only
  * order-sensitive step, so both sides accumulate in DECIMAL(20,12)
  * (associative) and convert once to double at the end. Every comparison
  * and rank therefore sees bit-identical doubles in both engines.
  */
object Similarity extends QueryModule
    with SimilarityServing with SimilarityStats with SimilarityLifecycle {

  val queries: Map[String, Q] =
    servingQueries ++ statsQueries ++ lifecycleQueries

  def oracles: Map[String, String] =
    servingOracles ++ statsOracles ++ lifecycleOracles

  /** The two lifecycle gates run the micro-batch harness —
    * ann_index_lifecycle (gate 16) carries no `streaming_` prefix,
    * which is exactly why membership is a registry tag and not a name
    * rule (see [[graft.QueryModule.microBatchGates]]). */
  override def microBatchGates: Set[String] =
    Set("streaming_index_maintain", "ann_index_lifecycle")
}
