package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash LSH band signatures for one document as ONE codegen scalar —
  * returns 4 band signatures, each the concatenation of that band's 4
  * minhash lanes (8 lowercase-hex chars per lane: `min` over shingles of
  * `substring(md5(band || '|' || shingle), 8·lane + 1, 8)`).
  *
  * Semantically identical to the staged-rows formulation (explode word
  * shingles × bands → md5 → groupBy(doc, band) agg of 4 lane minima) and
  * its SQL-oracle twin:
  *  - shingles are the same n=3 word windows [[GramSet.wordShingles]]
  *    builds (split on the space byte, empties kept, < n words ⇒ one
  *    whole-list shingle); MIN is idempotent so folding per OCCURRENCE
  *    equals folding over the distinct shingle set;
  *  - min over lowercase-hex strings equals min over the digest's
  *    unsigned bytes (hex is order-preserving), so lanes compare the raw
  *    4-byte chunks and hex-encode once at the end.
  *
  * Why: the aggregate formulation shuffles ~shingles × bands rows per
  * document into a 4-lane min aggregate; this loop folds the whole
  * signature inside one call per document (reused digest, no generated
  * rows) — the band-signature stage becomes a narrow projection whose
  * cost scales with input bytes, like [[WinnowMin]]/[[SimhashChunks]].
  */
case class MinhashBandSigs(child: Expression, shingleWidth: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinhashBandSigs.bandSigs(input.asInstanceOf[UTF8String], shingleWidth)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashBandSigs.bandSigs($c, $shingleWidth)")

  override protected def withNewChildInternal(newChild: Expression): MinhashBandSigs =
    copy(child = newChild)
}

object MinhashBandSigs {

  private val Bands = 4
  private val Lanes = 4

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** unsigned-byte compare of 4-byte lane chunks at offsets `ao`/`bo` */
  private def laneLess(a: Array[Byte], ao: Int, b: Array[Byte], bo: Int): Boolean = {
    var i = 0
    while (i < 4) {
      val x = a(ao + i) & 0xff
      val y = b(bo + i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def bandSigs(s: UTF8String, shingleWidth: Int): ArrayData = {
    val str = s.toString
    val toks = str.split(" ", -1)
    val positions = math.max(toks.length - shingleWidth + 1, 1)
    val md = digest.get()
    val dig = new Array[Byte](16)
    // best(band) holds 4 lanes × 4 bytes of the current minima
    val best = Array.fill(Bands)(new Array[Byte](16))
    var have = false
    var i = 0
    while (i < positions) {
      val end = math.min(i + shingleWidth, toks.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val shingleBytes = sb.toString.getBytes("UTF-8")
      var b = 0
      while (b < Bands) {
        md.reset()
        md.update(('0' + b).toByte) // bands 0..3: one ASCII digit
        md.update('|'.toByte)
        md.update(shingleBytes)
        md.digest(dig, 0, 16)
        var l = 0
        while (l < Lanes) {
          if (!have || laneLess(dig, 4 * l, best(b), 4 * l))
            System.arraycopy(dig, 4 * l, best(b), 4 * l, 4)
          l += 1
        }
        b += 1
      }
      have = true
      i += 1
    }
    val out = new Array[Any](Bands)
    var b = 0
    while (b < Bands) {
      val hex = new Array[Char](32)
      var k = 0
      while (k < 16) {
        hex(k * 2) = HexChars((best(b)(k) >> 4) & 0xf)
        hex(k * 2 + 1) = HexChars(best(b)(k) & 0xf)
        k += 1
      }
      out(b) = UTF8String.fromString(new String(hex))
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point (see [[org.apache.spark.sql.GraftColumnBridge]]). */
  def minhash_band_sigs(c: Column, shingleWidth: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MinhashBandSigs(org.apache.spark.sql.GraftColumnBridge.expression(c), shingleWidth))
}
