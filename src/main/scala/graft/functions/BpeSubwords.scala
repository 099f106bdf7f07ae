package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy merges-table BPE subword count — tokenizer-fidelity token
  * counting (round-13 verdict item 4: the whole token-budget family
  * counted regex tokens; training pipelines budget in SUBWORD tokens,
  * which diverge 1.3–1.7× on web text).
  *
  * Pre-tokenization is the [[BpeTokenCount]] class split (the same
  * classes the oracle's regexes use): maximal `[a-z]+` runs are the
  * BPE units; a maximal digit run counts 1; every other non-space code
  * point counts 1. Each letter word starts as single characters and
  * the learned merges apply IN RANK ORDER, each exhaustively
  * left-to-right — provably equivalent to the classic min-rank-pair
  * loop (Sennrich et al. 2016 §3.2), because a merge's output symbol
  * can only appear in LATER merges' inputs (training creates the
  * symbol before any rule can consume it), so applying rule r can
  * never create an occurrence of a rule < r; BpeSpec pins the
  * equivalence on adversarial repeats. The sequential form is what
  * makes the DuckDB oracle possible: over an RS‹tok›US-delimited
  * sequence, each rule is ONE `replace(seq, RS l US RS r US, RS lr US)`
  * (single-pass left-to-right non-overlapping — the same semantics as
  * the in-engine merge loop; the delimiters force whole-token
  * alignment), so the whole encoder unrolls into nested replace()
  * calls the oracle replays from the exported merges artifact.
  *
  * The merges table is a MODEL artifact (the PQ-codebook recipe):
  * trained once per fixture (see [[graft.queries.Bpe]]), serialized
  * WITH the expression to every task, exported for the oracle. The
  * per-word encode memoizes in a bounded per-JVM cache — natural-
  * language word frequency is Zipfian, so the hot vocabulary saturates
  * the cache and the amortized cost per token approaches a hash probe.
  */
case class BpeSubwordCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  @transient private lazy val coder = new BpeCoder(merges)

  override protected def nullSafeEval(input: Any): Any =
    coder.countText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the coder rides the codegen references array (serialized with the
    // task, shared by all rows of a partition) — the standard pattern
    // for model-carrying expressions
    val ref = ctx.addReferenceObj("bpeCoder", coder, classOf[BpeCoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countText($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSubwordCount =
    copy(child = newChild)
}

/** The encoder: merges in rank order + bounded word-count memo.
  * Serializable (ships with the expression); the memo is rebuilt empty
  * on each executor — it is a cache, not state. */
final class BpeCoder(merges: Seq[(String, String)]) extends Serializable {

  private val rules: Array[(String, String)] = merges.toArray

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val MemoCap = 1 << 16

  /** BPE token count of one `[a-z]+` word. */
  def countWord(w: String): Int = {
    val cached = memo.get(w)
    if (cached != null) return cached.intValue()
    var toks = new Array[String](w.length)
    var i = 0
    while (i < w.length) { toks(i) = String.valueOf(w.charAt(i)); i += 1 }
    var r = 0
    while (r < rules.length && toks.length > 1) {
      val (l, rt) = rules(r)
      // one exhaustive left-to-right non-overlapping pass (== one
      // string replace() over the separator-joined form)
      var found = false
      var j = 0
      while (!found && j < toks.length - 1) {
        found = toks(j) == l && toks(j + 1) == rt
        j += 1
      }
      if (found) {
        val out = Array.newBuilder[String]
        var k = 0
        while (k < toks.length) {
          if (k + 1 < toks.length && toks(k) == l && toks(k + 1) == rt) {
            out += l + rt
            k += 2
          } else {
            out += toks(k)
            k += 1
          }
        }
        toks = out.result()
      }
      r += 1
    }
    val n = toks.length
    if (memo.size < MemoCap) memo.put(w, Integer.valueOf(n))
    n
  }

  /** Subword count of a whole text: letter runs BPE-encoded, digit
    * runs 1 each, other non-space code points 1 each — byte-for-byte
    * the [[BpeTokenCount.count]] class walk with the letter branch
    * routed through [[countWord]]. */
  def countText(s: UTF8String): Int = {
    val bytes = s.getBytes
    var n = 0
    var i = 0
    var inDigit = false
    val word = new java.lang.StringBuilder(24)
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b >= 'a' && b <= 'z') {
        word.append(b.toChar)
        inDigit = false
        i += 1
      } else {
        if (word.length > 0) { n += countWord(word.toString); word.setLength(0) }
        if (b >= '0' && b <= '9') {
          if (!inDigit) { n += 1; inDigit = true }
          i += 1
        } else if (b == ' ') {
          inDigit = false
          i += 1
        } else {
          n += 1
          inDigit = false
          i += UTF8String.numBytesForFirstByte(bytes(i))
        }
      }
    }
    if (word.length > 0) n += countWord(word.toString)
    n
  }
}

object BpeSubwordCount {

  /** Column-API entry point (see [[org.apache.spark.sql.GraftColumnBridge]]). */
  def bpe_subword_count(c: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BpeSubwordCount(org.apache.spark.sql.GraftColumnBridge.expression(c), merges))
}
