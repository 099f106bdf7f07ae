package graft

import graft.functions.BpeCoder
import org.apache.spark.sql.functions._

/** Pins for the BPE family: hand-derived training, a hand-tokenized
  * sentence, the sequential-apply ≡ min-rank-loop equivalence the
  * oracle's nested-replace form relies on, and the end-to-end budget
  * invariants. */
class BpeSpec extends GraftSuite {

  test("train: hand-derived merges on a tiny word-frequency table") {
    // pairs: (a,b) 2·10+5 = 25, (b,a) 10 → merge (a,b);
    // then (ab,ab) 10 → merge; then nothing — early exhaustion
    val got = graft.queries.Bpe.train(
      Seq(("abab", 10L), ("ab", 5L), ("b", 2L)), numMerges = 5)
    assert(got == Seq(("a", "b"), ("ab", "ab")))
    // tie on count breaks lexicographically on (left, right)
    val tie = graft.queries.Bpe.train(Seq(("ba", 1L), ("cb", 1L)), numMerges = 1)
    assert(tie == Seq(("b", "a")))
  }

  test("countText: hand-tokenized sentence against a hand-derived merges table") {
    val coder = new BpeCoder(Seq(("a", "b"), ("ab", "ab")))
    // "abab"→[abab]=1, "ab"→[ab]=1, "7"→1 digit run, "!"→1 other,
    // "ba"→[b,a]=2 (no rule matches)
    assert(coder.countText(
      org.apache.spark.unsafe.types.UTF8String.fromString("abab ab7 ba!")) == 6)
    // class walk edge cases: digit runs broken by letters, multi-space
    assert(coder.countText(
      org.apache.spark.unsafe.types.UTF8String.fromString("12ab34  ab")) == 4)
    assert(coder.countText(
      org.apache.spark.unsafe.types.UTF8String.fromString("")) == 0)
    // memo hit returns the same value
    assert(coder.countWord("abab") == 1 && coder.countWord("abab") == 1)
  }

  /** Reference encoder: the classic min-rank-pair loop (Sennrich §3.2). */
  private def minRankCount(w: String, merges: Seq[(String, String)]): Int = {
    val rank = merges.zipWithIndex.toMap
    var toks = w.map(String.valueOf(_)).toVector
    var done = toks.length <= 1
    while (!done) {
      val cand = (0 until toks.length - 1)
        .flatMap(i => rank.get((toks(i), toks(i + 1))))
      if (cand.isEmpty) done = true
      else {
        val (l, r) = merges(cand.min)
        val out = Vector.newBuilder[String]
        var k = 0
        while (k < toks.length) {
          if (k + 1 < toks.length && toks(k) == l && toks(k + 1) == r) {
            out += l + r; k += 2
          } else { out += toks(k); k += 1 }
        }
        toks = out.result()
        done = toks.length <= 1
      }
    }
    toks.length
  }

  test("sequential rank-order application equals the min-rank greedy loop") {
    // adversarial repeat-heavy corpus: overlapping pairs, l==r rules,
    // rules whose output is a later rule's constituent
    val corpus = Seq(("aaaa", 9L), ("aaab", 7L), ("abab", 6L), ("bbaa", 5L),
      ("baaa", 4L), ("abba", 3L), ("bbbb", 2L))
    val merges = graft.queries.Bpe.train(corpus, numMerges = 8)
    assert(merges.nonEmpty)
    val coder = new BpeCoder(merges)
    val words = Seq("aaaa", "aaab", "abab", "bbaa", "baaa", "abba", "bbbb",
      "aaaaaaa", "ababab", "aabbaabb", "baba", "a", "b", "ab", "ba",
      "aabaabaa", "bbaabbaa")
    words.foreach { w =>
      assert(coder.countWord(w) == minRankCount(w, merges),
        s"sequential vs min-rank diverge on '$w' with merges $merges")
    }
  }

  test("text_bpe_tokens: engine counts equal a recount from the EXPORTED artifact") {
    val out = q("text_bpe_tokens").collect()
    assert(out.nonEmpty)
    // the exported merges are the model contract — rebuild the coder
    // from the artifact file and recount a sample
    val ms = spark.read.parquet(
        graft.queries.Bpe.mergesOracleArtifactPath(sf))
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(ms.size == graft.queries.Bpe.NumMerges,
      s"fixture vocabulary should support all ${graft.queries.Bpe.NumMerges} merges")
    val coder = new BpeCoder(ms)
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.take(50).foreach { r =>
      val (id, n) = (r.getLong(0), r.getInt(1))
      assert(n == coder.countText(
        org.apache.spark.unsafe.types.UTF8String.fromString(texts(id))),
        s"doc $id count differs from artifact recount")
    }
    // BPE refines pre-tokens INTO subwords: every letter word is ≥ 1
    // subword where it was exactly 1 pre-token, so subwords ≥ pretokens
    out.foreach(r => assert(r.getInt(1) >= r.getInt(2),
      s"doc ${r.getLong(0)}: subwords ${r.getInt(1)} < pretokens ${r.getInt(2)}"))
  }

  test("pipeline_bpe_budget: bin-granular fill under the subword budget") {
    val rows = q("pipeline_bpe_budget").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getInt(3)))
    assert(rows.nonEmpty)
    val budget = rows.map(_._2).sum / 4
    val keptMass = rows.filter(_._4 == 1).map(_._2).sum
    assert(keptMass <= budget, s"kept $keptMass exceeds budget $budget")
    // bin-granular: a bin is kept entirely or not at all, and kept
    // bins are exactly the ascending prefix
    val byBin = rows.filter(_._3.isDefined).groupBy(_._3.get)
    byBin.foreach { case (b, ds) =>
      assert(ds.map(_._4).distinct.size == 1, s"bin $b split by the fill line")
    }
    val keptBins = byBin.collect { case (b, ds) if ds.head._4 == 1 => b }
    val dropBins = byBin.collect { case (b, ds) if ds.head._4 == 0 => b }
    if (keptBins.nonEmpty && dropBins.nonEmpty)
      assert(keptBins.max < dropBins.min, "kept bins must be the best prefix")
    // adding the next bin would burst the budget (the fill is maximal)
    if (dropBins.nonEmpty) {
      val nextMass = byBin(dropBins.min).map(_._2).sum
      assert(keptMass + nextMass > budget, "fill line stopped early")
    }
    // null-bin docs (empty text) are never kept
    rows.filter(_._3.isEmpty).foreach(r => assert(r._4 == 0))
  }
}
