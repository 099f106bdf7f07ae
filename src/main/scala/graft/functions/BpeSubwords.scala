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
  * Pre-tokenization (round-15: byte/punctuation-COMPLETE — the round-14
  * cut encoded `[a-z]+` runs only and counted digits/punctuation 1
  * each): the text splits into maximal single-class runs
  * `[a-z]+ | [0-9]+ | [^a-z0-9 ]+` — letter words, digit runs, and
  * punctuation/other runs — and EVERY pre-token is BPE-encoded from
  * single code-point symbols through the learned merges, the way a
  * production byte/char-level tokenizer treats its whole alphabet
  * (class boundaries and the space separator never merge across, the
  * standard pre-tokenization contract). The merges apply IN RANK ORDER,
  * each exhaustively left-to-right — provably equivalent to the classic
  * min-rank-pair loop (Sennrich et al. 2016 §3.2), because a merge's
  * output symbol can only appear in LATER merges' inputs (training
  * creates the symbol before any rule can consume it), so applying rule
  * r can never create an occurrence of a rule < r; BpeSpec pins the
  * equivalence on adversarial repeats. The sequential form is what
  * makes the DuckDB oracle possible: over an RS‹tok›US-delimited
  * sequence, each rule is ONE `replace(seq, RS l US RS r US, RS lr US)`
  * (single-pass left-to-right non-overlapping — the same semantics as
  * the in-engine merge loop; the delimiters force whole-token
  * alignment), so the encoder replays either as nested replace() calls
  * (the pinned small-merge regime) or as a list_reduce fold over the
  * exported merges artifact (the production regime — constant-size SQL
  * whatever the merge count).
  *
  * The merges table is a MODEL artifact (the PQ-codebook recipe):
  * trained once per (fixture, regime) (see [[graft.queries.Bpe]]),
  * serialized WITH the expression to every task, exported for the
  * oracle. The per-pre-token encode memoizes in a bounded per-JVM
  * cache — natural-language token frequency is Zipfian, so the hot
  * vocabulary saturates the cache and the amortized cost per token
  * approaches a hash probe.
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

/** The encoder: merges in rank order + bounded pre-token memo.
  * Serializable (ships with the expression); the memo is rebuilt empty
  * on each executor — it is a cache, not state. */
final class BpeCoder(merges: Seq[(String, String)]) extends Serializable {

  private val rules: Array[(String, String)] = merges.toArray

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val MemoCap = 1 << 16

  /** BPE token count of one pre-token (a maximal single-class run).
    * Initial symbols are CODE POINTS (surrogate pairs stay whole), the
    * same units the oracle's per-code-point `regexp_replace(w, '(.)')`
    * split produces. */
  def countWord(w: String): Int = {
    val cached = memo.get(w)
    if (cached != null) return cached.intValue()
    var toks = BpeCoder.symbols(w)
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

  /** Subword count of a whole text: every maximal single-class run —
    * letters, digits, punctuation/other — routed through [[countWord]];
    * runs break on class change or space (the [[BpeUnitCount]] class
    * walk with each unit encoded instead of counted). */
  def countText(s: UTF8String): Int = {
    val str = s.toString
    var n = 0
    var i = 0
    var cls = -1 // -1 = boundary, 0 = [a-z], 1 = [0-9], 2 = other
    val run = new java.lang.StringBuilder(24)
    while (i < str.length) {
      val c = str.charAt(i)
      val k =
        if (c >= 'a' && c <= 'z') 0
        else if (c >= '0' && c <= '9') 1
        else if (c == ' ') -1
        else 2
      if (k != cls && run.length > 0) {
        n += countWord(run.toString)
        run.setLength(0)
      }
      cls = k
      if (k >= 0) run.append(c)
      i += 1
    }
    if (run.length > 0) n += countWord(run.toString)
    n
  }
}

object BpeCoder {

  /** Split a pre-token into its initial code-point symbols — shared by
    * the encoder and the trainer so the symbol alphabet can never
    * drift between them. */
  private[graft] def symbols(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var j = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out(j) = w.substring(i, i + n)
      i += n
      j += 1
    }
    out
  }
}

object BpeSubwordCount {

  /** Column-API entry point (see [[org.apache.spark.sql.GraftColumnBridge]]). */
  def bpe_subword_count(c: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BpeSubwordCount(org.apache.spark.sql.GraftColumnBridge.expression(c), merges))
}

/** `size(regexp_extract_all(s, '[a-z]+|[0-9]+|[^a-z0-9 ]+'))` — the
  * BPE PRE-TOKEN count (maximal single-class runs, the units
  * [[BpeSubwordCount]] encodes) — as one codegen byte-pass scalar.
  * Distinct from [[BpeTokenCount]], which counts each non-space
  * "other" code point as its own token (the round-12 token-budget
  * class split several TextAnalysis oracles pin); HERE punctuation
  * RUNS are single pre-tokens, the alphabet-complete pre-tokenization
  * a byte-level BPE trains over. */
case class BpeUnitCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    BpeUnitCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeUnitCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeUnitCount =
    copy(child = newChild)
}

object BpeUnitCount {

  /** Static entry point shared by interpreted eval and generated code.
    * Byte walk: a run continues while bytes stay in one class; any
    * non-ASCII code point is "other" class (its continuation bytes are
    * skipped whole, so one multibyte char never splits a run). */
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    var n = 0
    var state = 0 // 0 = boundary, 1 = [a-z], 2 = [0-9], 3 = other
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b >= 'a' && b <= 'z') {
        if (state != 1) { n += 1; state = 1 }
        i += 1
      } else if (b >= '0' && b <= '9') {
        if (state != 2) { n += 1; state = 2 }
        i += 1
      } else if (b == ' ') {
        state = 0
        i += 1
      } else {
        if (state != 3) { n += 1; state = 3 }
        i += UTF8String.numBytesForFirstByte(bytes(i))
      }
    }
    n
  }

  /** Column-API entry point (see [[org.apache.spark.sql.GraftColumnBridge]]). */
  def bpe_unit_count(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BpeUnitCount(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
