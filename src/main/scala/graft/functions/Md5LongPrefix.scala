package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The first `hexChars` nibbles of md5(s) as a LongType value — a
  * codegen drop-in for the suite-wide derived-hash idiom
  * `conv(substring(md5(s), 1, n), 16, 10).cast("long")` (round-16
  * optimization). The SQL form materializes a 32-char lowercase-hex
  * string per row, substrings it, and re-parses the prefix base-16
  * through `conv` (which itself round-trips a string); this expression
  * digests the UTF-8 bytes once (thread-local MessageDigest via
  * [[Md5Hex]] — the WinnowMin/TokenWindowHashes plumbing) and
  * accumulates the leading nibbles into the SAME unsigned value, so
  * every consumer's bucket/sample/sketch arithmetic — and every DuckDB
  * oracle, which keeps computing the hex-string form — is bit-for-bit
  * untouched. `hexChars` ≤ 15 keeps the value under 2⁶⁰ (non-negative
  * long), exactly the sites' 6- and 15-nibble regimes.
  */
case class Md5LongPrefix(child: Expression, hexChars: Int) extends UnaryExpression {
  require(hexChars >= 1 && hexChars <= 15,
    s"md5_prefix supports 1..15 hex chars (got $hexChars)")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Md5LongPrefix.prefixOf(input.asInstanceOf[UTF8String], hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5LongPrefix.prefixOf($c, $hexChars)")

  override def prettyName: String = "md5_prefix"

  override protected def withNewChildInternal(newChild: Expression): Md5LongPrefix =
    copy(child = newChild)
}

object Md5LongPrefix {

  /** Static entry point shared by interpreted eval and generated code:
    * top `nHex` nibbles of the digest, most significant first — the
    * value `conv(substr(hex, 1, nHex), 16, 10)` denotes. */
  def prefixOf(s: UTF8String, nHex: Int): Long = {
    val md = Md5Hex.md
    md.reset()
    val dig = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < nHex) {
      val b = dig(i >> 1)
      val nib = if ((i & 1) == 0) (b >> 4) & 0xf else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** Column-API entry point: value-identical to
    * `conv(substring(md5(c), 1, n), 16, 10).cast("long")` for a
    * StringType `c`. */
  def md5_prefix(c: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Md5LongPrefix(org.apache.spark.sql.GraftColumnBridge.expression(c), n))
}
