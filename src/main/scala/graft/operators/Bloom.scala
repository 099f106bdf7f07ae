package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** MERGEABLE Bloom filter — the set-MEMBERSHIP member of the sketch
  * family (count-distinct = `agg_sketch_merge`, quantiles =
  * `agg_quantile_merge`, heavy hitters = `text_freq_merge`, overlap =
  * `pipeline_overlap_est`). Bit-OR is commutative, associative, and
  * idempotent, so unlike the other sketches the built VALUE is
  * independent of Spark's partial-merge order: the same key set always
  * produces the same bit array, bit for bit (partition-invariance is
  * spec-pinned). That determinism plus the one-sided error (NO false
  * negatives, only false positives) is what lets a consumer stay fully
  * ORACLED: a bloom PREFILTER followed by an exact verify join provably
  * returns the exact answer — the bloom can only let extra candidates
  * through to the verify, never drop a true member.
  *
  * Keys are 32-hex md5 strings (the repo's portable-hash convention);
  * the `k = 4` bit positions are the four non-overlapping 8-hex chunks
  * of the key taken mod `mBits` — the md5-chunks-as-independent-hashes
  * device `MinhashBandSigs` already relies on. The SAME positions are
  * computed twice, by construction identically: JVM-side in the build
  * aggregator ([[positions]]) and as codegen-friendly builtin columns
  * in the membership test ([[member]]: conv/substring/shiftright —
  * parity is spec-pinned, no UDF in the probe hot path).
  *
  * Sizing: [[bitsFor]] gives the smallest power of two ≥ 16·n bits
  * (load factor m/n = 16, k = 4 ⇒ FPR ≈ (1−e^−¼)⁴ ≈ 0.24 %), floored
  * at 2^16 and CAPPED at 2^32 — each position hash is a 32-bit md5
  * chunk, so a wider array would leave bits past 2^32 unreachable
  * (round-10 advice). 100 TB shape: one filter holds the designed
  * 0.24 % regime to ~2.7e8 keys (2^32/16); past that the hash SPACE
  * is sharded (a bloom per md5 prefix, probes routed by the same
  * prefix — 4 prefix shards carry a 10⁹-key base) so each shard's
  * 512 MiB array stays executor-resident and in-regime. The build
  * itself is a distributed
  * aggregate: partial blooms per partition, OR-merged — the exchange
  * carries O(partitions × m/8) bytes, never the key set.
  */
object Bloom {

  val KHashes = 4
  val MinBits: Long = 1L << 16

  /** Smallest power of two ≥ 16·n bits, floored at 2^16 (fail-safe
    * wide for n = 0 — an unreadable/empty base yields the floor, which
    * can only over-admit candidates to the exact verify, never corrupt
    * the result: the Tuning.initialShufflePartitions discipline). */
  def bitsFor(n: Long): Long = {
    var m = MinBits
    // cap: 2^32 bits = 512 MiB. Each position hash is a 32-bit md5
    // chunk, so bits past 2^32 would be UNREACHABLE — a bigger array
    // silently halves the effective load factor instead of improving
    // FPR (round-10 advice). Past ~2.7e8 keys per filter (16·n > 2^32)
    // FPR degrades gracefully (never false-negative, results stay
    // exact); the 100 TB shape shards by key prefix at that point so
    // each shard's filter stays in the designed 0.24 % regime.
    while (m < 16L * n && m < (1L << 32)) m <<= 1
    m
  }

  /** The k bit positions of a 32-hex md5 key: four non-overlapping
    * 8-hex (32-bit) chunks mod mBits. mBits is a power of two but mod
    * is kept (not mask) so the column twin in [[member]] reads the
    * same. */
  def positions(md5hex: String, mBits: Long): Array[Long] = {
    val out = new Array[Long](KHashes)
    var i = 0
    while (i < KHashes) {
      out(i) = java.lang.Long.parseLong(md5hex.substring(i * 8, i * 8 + 8), 16) % mBits
      i += 1
    }
    out
  }

  /** Build-side typed aggregator over md5-hex keys → bit array as
    * Array[Long] (little-endian words: bit p lives in word p/64, bit
    * p%64). Buffers are mutated in place (Aggregator contract allows
    * it); merge ORs word-wise. */
  def agg(mBits: Long): Aggregator[String, Array[Long], Array[Long]] =
    new Aggregator[String, Array[Long], Array[Long]] {
      private val nWords = (mBits / 64).toInt
      override def zero: Array[Long] = new Array[Long](nWords)
      override def reduce(buf: Array[Long], h: String): Array[Long] = {
        val ps = positions(h, mBits)
        var i = 0
        while (i < ps.length) {
          buf((ps(i) / 64).toInt) |= (1L << (ps(i) % 64).toInt)
          i += 1
        }
        buf
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      }
      override def finish(r: Array[Long]): Array[Long] = r
      override def bufferEncoder: Encoder[Array[Long]] =
        ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Array[Long]] =
        ExpressionEncoder[Array[Long]]()
    }

  /** Probe-side membership test as pure builtin columns (whole-stage
    * codegen keeps the probe narrow): all k bits set ⇒ maybe-member.
    * `h` is the 32-hex md5 column, `bloom` the Array[Long] column
    * (typically a broadcast one-row cross join). Bit parity with
    * [[positions]]/[[agg]] is pinned in BloomSpec. */
  def member(h: Column, bloom: Column, mBits: Long): Column =
    (0 until KHashes).map { i =>
      val pos = conv(substring(h, 1 + 8 * i, 8), 16, 10).cast("long") % mBits
      // shiftright(pos, 6) = pos / 64 in exact integer arithmetic
      // (Column./ is double division)
      val word = element_at(bloom,
        call_function("shiftright", pos, lit(6)).cast("int") + 1)
      call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}
