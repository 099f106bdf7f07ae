package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionColumnNode

/** Expression ↔ Column bridge for the graft library.
  *
  * Spark 4 moved `Column` to a plan-agnostic ColumnNode representation
  * and made the classic converters `private[sql]`
  * (`classic.ExpressionColumnNode`, `classic.ExpressionUtils`), so
  * libraries that define native Catalyst expressions need an in-package
  * bridge — the established pattern for Spark-extension libraries.
  */
object GraftColumnBridge {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = new Column(ExpressionColumnNode(e))

  /** Resolve a Column back to its Catalyst expression via the active
    * classic session's converter. */
  def expression(c: Column): Expression =
    classic.SparkSession.active.expression(c)

  /** Register a function builder on an EXISTING session's registry —
    * the runtime analog of SparkSessionExtensions.injectFunction for
    * sessions the library did not construct. */
  def registerFunction(
      session: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    session.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Release the storage blocks behind a `localCheckpoint`ed frame.
    *
    * `Dataset.localCheckpoint` persists the INTERNAL row RDD (wrapped
    * in a LogicalRDD) — `Dataset.unpersist` only talks to the
    * CacheManager and never touches it, so an iterative operator that
    * checkpoints every step would otherwise accumulate one node-sized
    * storage RDD per iteration until the ContextCleaner happens to GC
    * them. No-op for frames that are not checkpoint scans. */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed match {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _                        => ()
    }

  /** True iff the frame's analyzed plan is a bare checkpoint scan —
    * the plan-shape pin for checkpointed iteration (iteration N's plan
    * must not contain iteration N−1's join subtree). */
  def isCheckpointScan(df: Dataset[_]): Boolean =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
      .isInstanceOf[execution.LogicalRDD]
}
