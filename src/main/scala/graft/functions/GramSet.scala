package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character-n-gram set primitives as codegen scalar
  * expressions — the per-pair alternative to the explode-grams → equi-join
  * → count formulation of n-gram Jaccard.
  *
  * Semantics mirror `substr`/`generate_series` exactly: gram start
  * positions count CODEPOINTS (`i ∈ [1, max(numChars-width+1, 1)]`), a
  * short string yields its single (whole) gram, and "distinct" means
  * distinct gram STRINGS (exact, not hashed — a 64-bit gram hash could
  * collide and silently break oracle parity).
  *
  * Why: with a bounded candidate pair set, shuffling two ~n_chars-byte
  * text bodies per PAIR is far cheaper than shuffling ~n_chars exploded
  * gram rows per DOCUMENT and joining them — both locally (measured on
  * dedup_ngram) and at 100 TB, where the gram join's exchange volume is
  * corpus bytes × gram width. The set fold happens inside one function
  * call per row; the query stays a candidate-sized equi-join of narrow
  * columns plus a codegen projection.
  */
object GramSet {

  /** Distinct grams of `s` as an array column value — the SET-BUILDING
    * twin of [[distinctGramCount]] for staging pipelines: per-doc dedup
    * happens inside this one codegen call, so `explode(distinct_grams)`
    * replaces explode-all-positions → corpus-wide `.distinct()`, whose
    * exchange shuffles ~n_chars gram rows per document. First-occurrence
    * order (LinkedHashSet) keeps the output deterministic. */
  def distinctGrams(s: UTF8String, width: Int): ArrayData = toArray(grams(s, width))

  /** Distinct n-word shingles of `s`, tokenized by the single-space
    * regex exactly like `split(text, " ")` (empty tokens KEPT — Spark's
    * split has no trailing-strip) and joined like `concat_ws(" ",
    * slice(t, i, n))`; a doc with < n words yields its whole token list
    * as one shingle, mirroring `sequence(1, greatest(size - n + 1, 1))`. */
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val positions = math.max(toks.length - n + 1, 1)
    val set = new java.util.LinkedHashSet[String](positions * 2)
    var i = 0
    while (i < positions) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      set.add(sb.toString)
      i += 1
    }
    toArray(set)
  }

  private def toArray(set: java.util.LinkedHashSet[String]): ArrayData = {
    val out = new Array[Any](set.size)
    var i = 0
    val it = set.iterator()
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct grams of `s` (codepoint positions, like SQL substr). */
  private[functions] def grams(s: UTF8String, width: Int): java.util.LinkedHashSet[String] = {
    val str = s.toString
    // codepoint start offsets in UTF-16 units (mirrors substr semantics
    // on supplementary characters)
    val len = str.length
    var n = 0
    var off = 0
    val offsets = new Array[Int](len + 1)
    while (off < len) {
      offsets(n) = off
      off += Character.charCount(str.codePointAt(off))
      n += 1
    }
    offsets(n) = len
    val positions = math.max(n - width + 1, 1)
    val set = new java.util.LinkedHashSet[String](positions * 2)
    var i = 0
    while (i < positions) {
      set.add(str.substring(offsets(i), offsets(math.min(i + width, n))))
      i += 1
    }
    set
  }

  def distinctGramCount(s: UTF8String, width: Int): Int = grams(s, width).size

  def gramIntersectCount(a: UTF8String, b: UTF8String, width: Int): Int = {
    val sa = grams(a, width)
    val sb = grams(b, width)
    val (small, big) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var c = 0
    val it = small.iterator()
    while (it.hasNext) if (big.contains(it.next())) c += 1
    c
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def distinct_gram_count(c: Column, width: Int): Column =
    column(DistinctGramCount(expression(c), width))

  def gram_intersect_count(a: Column, b: Column, width: Int): Column =
    column(GramIntersectCount(expression(a), expression(b), width))

  def distinct_grams(c: Column, width: Int): Column =
    column(DistinctGrams(expression(c), width))

  def word_shingles(c: Column, n: Int): Column =
    column(WordShingles(expression(c), n))
}

case class DistinctGramCount(child: Expression, width: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    GramSet.distinctGramCount(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramSet.distinctGramCount($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): DistinctGramCount =
    copy(child = newChild)
}

case class DistinctGrams(child: Expression, width: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    GramSet.distinctGrams(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramSet.distinctGrams($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): DistinctGrams =
    copy(child = newChild)
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    GramSet.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramSet.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

case class GramIntersectCount(left: Expression, right: Expression, width: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GramSet.gramIntersectCount(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GramSet.gramIntersectCount($a, $b, $width)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramIntersectCount =
    copy(left = newLeft, right = newRight)
}
