package graft.functions

import java.security.MessageDigest

/** Shared MD5 + lowercase-hex plumbing for the codegen hash expressions
  * ([[WinnowMin]], [[TokenWindowHashes]]): one ThreadLocal digest per
  * thread (MessageDigest is stateful and not thread-safe; allocation
  * per row would dominate the tight loops these expressions exist to
  * remove) and the 32-char lowercase-hex encoding Spark's `md5()`
  * builtin and DuckDB's `md5()` both emit — the cross-engine contract
  * every oracle depends on. */
private[functions] object Md5Hex {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** This thread's reusable digest (callers must `reset()` before use). */
  def md: MessageDigest = digest.get()

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase-hex encoding of a 16-byte MD5 digest. */
  def hex32(dig: Array[Byte]): String = {
    val hex = new Array[Char](32)
    var j = 0
    while (j < 16) {
      hex(j * 2) = HexChars((dig(j) >> 4) & 0xf)
      hex(j * 2 + 1) = HexChars(dig(j) & 0xf)
      j += 1
    }
    new String(hex)
  }
}
