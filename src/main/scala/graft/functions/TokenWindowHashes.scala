package graft.functions


import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** md5 hex of every k-token window of a whitespace-tokenized string —
  * `transform(sequence(1, n-k+1), i -> md5(array_join(slice(split(s,' '),
  * i, k), ' ')))` as ONE codegen scalar expression (the posting builder
  * of dedup_substring / pipeline_span_dedup).
  *
  * VALUE-IDENTICAL to the HOF formulation (and to the SQL oracle's
  * `md5(array_to_string(list_slice(toks, i, i+k-1), ' '))`) by a byte
  * argument: `split(s, ' ')` splits on every single 0x20 byte, so
  * rejoining any token run with single spaces reproduces EXACTLY the
  * original byte range from the first token's start to the last
  * token's end — consecutive spaces yield empty tokens whose rejoin
  * re-emits the same consecutive spaces, and UTF-8 multibyte sequences
  * never contain 0x20. The expression therefore md5s the RAW byte
  * ranges directly: one boundary scan, zero token-array or
  * window-string allocations, no interpreted lambda (the HOF ran the
  * lambda per window per document in the interpreter). Measured at the
  * 100× fixture, adjacent same-machine runs: the staged span_postings
  * build dropped 8.6 → 6.2 s end-to-end — the floor is the ~50 M-row
  * parquet write both variants pay, so the hash compute itself shrank
  * far more than the 1.4× end-to-end number.
  */
case class TokenWindowHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"window width must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TokenWindowHashes.hashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenWindowHashes.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashes =
    copy(child = newChild)
}

object TokenWindowHashes {

  /** Static entry point shared by interpreted eval and generated code. */
  def hashes(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    // token start offsets: 0, and the byte after every 0x20
    var nTok = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) nTok += 1
      i += 1
    }
    if (nTok < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTok)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val nWin = nTok - k + 1
    val out = new Array[Any](nWin)
    val md = Md5Hex.md
    val dig = new Array[Byte](16)
    var w = 0
    while (w < nWin) {
      val from = starts(w)
      // window ends at the byte before the (w+k)-th token's separator,
      // or at the end of the string for the final window span
      val until = if (w + k < nTok) starts(w + k) - 1 else bytes.length
      md.reset()
      md.update(bytes, from, until - from)
      md.digest(dig, 0, 16)
      out(w) = UTF8String.fromString(Md5Hex.hex32(dig))
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point (see [[org.apache.spark.sql.GraftColumnBridge]]). */
  def token_window_hashes(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      TokenWindowHashes(org.apache.spark.sql.GraftColumnBridge.expression(c), k))
}
