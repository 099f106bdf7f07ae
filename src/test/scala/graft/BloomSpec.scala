package graft

import graft.operators.Bloom
import org.apache.spark.sql.functions._

class BloomSpec extends GraftSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("bitsFor: floor, 16x growth, power of two, cap") {
    assert(Bloom.bitsFor(0) == (1L << 16))
    assert(Bloom.bitsFor(4096) == (1L << 16)) // 16*4096 = 2^16 exactly
    assert(Bloom.bitsFor(4097) == (1L << 17))
    // capped at 2^32: each position hash is a 32-bit md5 chunk, so a
    // bigger array would leave bits above 2^32 unreachable (round-10
    // advice) — past ~2.7e8 keys the prefix-sharding shape takes over
    assert(Bloom.bitsFor(Long.MaxValue / 32) == (1L << 32))
    (0 to 20).foreach { i =>
      val m = Bloom.bitsFor(1L << i)
      assert(java.lang.Long.bitCount(m) == 1 && m >= (1L << 16))
    }
  }

  test("no false negatives + JVM/column bit parity; FPR at design load") {
    // n = 4096 keys at m = 2^16 is EXACTLY the design load factor
    // m/n = 16 (k = 4 ⇒ theoretical FPR ≈ 0.24 %)
    val mBits = Bloom.bitsFor(4096)
    assert(mBits == (1L << 16))
    val agg = Bloom.agg(mBits)
    val members = (0 until 4096).map(i => md5hex(s"member-$i"))
    val filter = members.foldLeft(agg.zero)(agg.reduce)
    import spark.implicits._
    val bloomDf = Seq(Tuple1(filter)).toDF("bloom")
    // every inserted key passes the COLUMN probe — this pins both the
    // no-false-negative property and bit parity between the JVM build
    // (positions/agg) and the builtin-column probe (member)
    val memHits = members.toDF("h").crossJoin(bloomDf)
      .filter(Bloom.member(col("h"), col("bloom"), mBits)).count()
    assert(memHits == 4096L)
    // false-positive rate on 20k non-members: theoretical ~0.24 %,
    // gate at 1 % (4x margin over sampling noise)
    val nonMembers = (0 until 20000).map(i => md5hex(s"other-$i"))
    val fpHits = nonMembers.toDF("h").crossJoin(bloomDf)
      .filter(Bloom.member(col("h"), col("bloom"), mBits)).count()
    assert(fpHits < 200L, s"FPR ${fpHits / 20000.0} above the 1% gate")
  }

  test("distributed build is partition-order invariant (OR commutes)") {
    import spark.implicits._
    val mBits = 1L << 16
    val keys = (0 until 2000).map(i => md5hex(s"k$i"))
    def build(parts: Int): Array[Long] =
      keys.toDS().repartition(parts)
        .select(Bloom.agg(mBits).toColumn.name("bloom"))
        .head()
    assert(java.util.Arrays.equals(build(2), build(7)))
    // and equals the sequential JVM fold
    val local = keys.foldLeft(Bloom.agg(mBits).zero)(Bloom.agg(mBits).reduce)
    assert(java.util.Arrays.equals(build(3), local))
  }

  test("dedup_bloom_prefilter output is prefilter-transparent") {
    // the bloom can only ADD candidates before the exact verify join,
    // so the query must equal the plain exact formulation
    val got = q("dedup_bloom_prefilter").collect().map(_.toSeq).toSeq
    val docs = Tables.documents(spark, sf)
    val p = graft.queries.Dedup.tokenSpanPostings(docs, 8)
      .select(col("doc_id"), col("h"))
    val baseH = p.filter(col("doc_id") % 10 =!= 0).select(col("h")).distinct()
    val deltaH = p.filter(col("doc_id") % 10 === 0).distinct()
    val totals = deltaH.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
    val dups = deltaH.join(baseH, Seq("h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_spans"))
    val want = totals.join(dups, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        round(coalesce(col("n_dup_spans"), lit(0L)) * lit(1.0) / col("n_spans"), 6)
          .as("dup_frac"))
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want)
    // both contaminated and CLEAN delta docs are reported
    assert(want.exists(r => r(2).asInstanceOf[Long] > 0L))
    assert(want.exists(r => r(2).asInstanceOf[Long] == 0L))
  }
}
