package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
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

  /** Distinct grams of `s` (codepoint positions, like SQL substr). */
  private[functions] def grams(s: UTF8String, width: Int): java.util.HashSet[String] = {
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
    val set = new java.util.HashSet[String](positions * 2)
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
