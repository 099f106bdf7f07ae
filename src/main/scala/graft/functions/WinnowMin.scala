package graft.functions


import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint minimum — `min(md5(substr(s, i, width)))` over
  * every gram start position `i ∈ [1, max(numChars-width+1, 1)]` — as one
  * codegen scalar expression.
  *
  * Semantically identical to the explode-positions → md5 → MIN-aggregate
  * formulation (and to the SQL oracle's
  * `list_min(list_transform(generate_series(...), i -> md5(substr(s,i,w))))`):
  * substring positions count CODEPOINTS (UTF8String.substringSQL, matching
  * both engines' substr on multibyte text), md5 is over the gram's UTF-8
  * bytes, and min over lowercase-hex strings equals min over the unsigned
  * digest bytes (hex encoding is order-preserving), so the digest is
  * compared raw and hex-encoded once at the end.
  *
  * Why an expression and not the explode shape: the explode materializes
  * ~numChars rows per document through the aggregate machinery just to
  * fold them back to one row. At 10× fixture scale that measured
  * super-linear (3.4 s → 41 s+, GC/spill onset); this loop keeps the fold
  * inside one function call per document — no generated rows, no
  * aggregate, a pure narrow projection that scales with input bytes.
  */
case class WinnowMin(child: Expression, width: Int) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WinnowMin.winnowMin(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowMin.winnowMin($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMin =
    copy(child = newChild)
}

object WinnowMin {

  /** True iff digest `a` sorts before `b` under unsigned byte order —
    * equivalent to comparing the lowercase-hex encodings. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Static entry point shared by interpreted eval and generated code.
    * Operates on the UTF-8 bytes with a precomputed codepoint-offset
    * table — one pass, no per-gram substring allocation, digests written
    * into two reused 16-byte buffers (repeated `substringSQL(i, w)` would
    * rescan from byte 0 per position: quadratic on multibyte text). */
  def winnowMin(s: UTF8String, width: Int): UTF8String = {
    val bytes = s.getBytes
    // offsets(k) = byte offset where codepoint k starts; offsets(n) = end
    var n = 0
    var off = 0
    val offsets = new Array[Int](bytes.length + 1)
    while (off < bytes.length) {
      offsets(n) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      n += 1
    }
    offsets(n) = bytes.length
    val positions = math.max(n - width + 1, 1)
    val md = Md5Hex.md
    var best = new Array[Byte](16)
    var cur = new Array[Byte](16)
    var haveBest = false
    var i = 0
    while (i < positions) {
      val from = offsets(i)
      val until = offsets(math.min(i + width, n))
      md.reset()
      md.update(bytes, from, until - from)
      md.digest(cur, 0, 16)
      if (!haveBest || less(cur, best)) {
        val t = best; best = cur; cur = t
        haveBest = true
      }
      i += 1
    }
    UTF8String.fromString(Md5Hex.hex32(best))
  }

  /** Column-API entry point (see [[org.apache.spark.sql.GraftColumnBridge]]). */
  def winnow_min(c: Column, width: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      WinnowMin(org.apache.spark.sql.GraftColumnBridge.expression(c), width))
}
