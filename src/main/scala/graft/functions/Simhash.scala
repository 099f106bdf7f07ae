package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over space-delimited tokens as ONE codegen scalar —
  * returns the four 16-bit chunks `[c0, c1, c2, c3]` used for
  * chunk-blocked near-dup candidate generation (Charikar's rounding:
  * bit b of the hash is set iff Σ_tokens ±1 over md5(token) bit b is
  * positive).
  *
  * Semantically identical to the explode → md5 → 64× SUM(CASE) →
  * chunk-pack aggregate formulation (and its SQL-oracle twin):
  *  - tokens are `split(text, " ")` with Spark's limit=-1 semantics —
  *    empty tokens KEPT (adjacent/leading/trailing spaces), and the
  *    empty string yields one empty token; byte-level splitting on 0x20
  *    is exact because a space byte never occurs inside a multibyte
  *    UTF-8 sequence;
  *  - term-frequency weighting falls out of per-occurrence ±1 sums
  *    (Σ_distinct cnt·±1 ≡ Σ_occurrences ±1);
  *  - bit b of md5 = bit (3 - b%4) of hex digit b/4 = bit (7 - b%8) of
  *    digest byte b/8, so the counters read the raw digest directly.
  *
  * Why an expression and not the aggregate shape: either aggregate
  * formulation pushes ~tokens (or ~distinct (doc, word) pairs) per
  * document through the hash-aggregate machinery with 64 accumulators a
  * group. Measured at 10× fixture scale both go super-linear (GC/spill:
  * pre-counted 4.4 s, per-occurrence 60 s+); this loop folds the whole
  * hash inside one function call per document — a pure narrow
  * projection that scales with input bytes (same physics as
  * [[WinnowMin]], which is flat across 10×).
  */
case class SimhashChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimhashChunks.simhashChunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimhashChunks.simhashChunks($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashChunks =
    copy(child = newChild)
}

object SimhashChunks {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def simhashChunks(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val md = digest.get()
    val dig = new Array[Byte](16)
    val cnt = new Array[Int](64)
    var start = 0
    var i = 0
    // one trailing iteration (i == bytes.length) flushes the last token:
    // split-with-keep-empties yields (#spaces + 1) tokens, ≥ 1 always
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        md.reset()
        md.update(bytes, start, i - start)
        md.digest(dig, 0, 16)
        var b = 0
        while (b < 64) {
          if (((dig(b >> 3) >> (7 - (b & 7))) & 1) == 1) cnt(b) += 1
          else cnt(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Any](4)
    var c = 0
    while (c < 4) {
      var v = 0L
      var k = 0
      while (k < 16) {
        if (cnt(16 * c + k) > 0) v |= 1L << (15 - k)
        k += 1
      }
      out(c) = v
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point (see [[org.apache.spark.sql.GraftColumnBridge]]). */
  def simhash_chunks(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SimhashChunks(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
