package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 32-bit hash as a native Catalyst expression with codegen —
  * bit-exact with the reference's partitioner hash
  * (`/root/reference/src/worker/worker.go:235-239`, Go `hash/fnv`
  * New32a), which Spark's murmur3 `hash()` cannot reproduce. This is the
  * SURVEY.md §7.3 "perf-grade option" for O5 parity: a codegen'd scalar
  * that stays inside WholeStageCodegen instead of a boxed Scala UDF.
  *
  * Returns the unsigned 32-bit hash widened to LongType (Spark has no
  * unsigned int).
  */
case class Fnv32a(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Fnv32a.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv32a.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv32a =
    copy(child = newChild)
}

object Fnv32a {
  private final val OffsetBasis = 2166136261L
  private final val Prime = 16777619L

  /** Static entry point shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h = ((h ^ (bytes(i) & 0xffL)) * Prime) & 0xffffffffL
      i += 1
    }
    h
  }

  /** Column-API entry point (see [[org.apache.spark.sql.GraftColumnBridge]]). */
  def fnv32a(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Fnv32a(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** Reference bucket assignment: `int(h & 0x7fffffff) % n`
    * (worker.go:231). With h < 2^32 the mask only clears bit 31. */
  def fnvBucket(c: Column, n: Int): Column =
    (fnv32a(c).bitwiseAND(0x7fffffffL) % n).cast("int")
}
