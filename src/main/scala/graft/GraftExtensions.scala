package graft

import graft.functions.Fnv32a
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so
  * `SparkSession.builder.withExtensions(new GraftExtensions)` (or
  * `--conf spark.sql.extensions=graft.GraftExtensions`) exposes them to
  * pure-SQL users:
  *
  * {{{ SELECT fnv32a(word) % 4 AS bucket FROM words }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("fnv32a"),
      new ExpressionInfo(classOf[Fnv32a].getName, "fnv32a"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Fnv32a(exprs.head)))
  }
}

object GraftExtensions {
  /** Runtime registration for an existing session (builder-time
    * `withExtensions` is not available once a session exists). */
  def register(session: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftColumnBridge.registerFunction(
      session, "fnv32a", exprs => Fnv32a(exprs.head))
}
