package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** MERGEABLE quantile sketch — the rank/percentile analog of the HLL
  * rollup in `agg_sketch_merge` (round-9 verdict item 4): per-shard
  * sketches that an upper aggregation level merges into a global one,
  * the only shape a 100 TB pipeline-health rollup can take (an exact
  * percentile needs a global sort; Spark's `percentile_approx` is
  * mergeable internally but never EXPOSES its state, so per-shard
  * sketches cannot be stored, shipped, or re-merged later — which is
  * the entire point of a sketch rollup).
  *
  * The structure is a compactor stack (Manku–Rajagopalan–Lindsay'98 /
  * the KLL family, uniform level capacity): level `i` holds values of
  * weight 2^i; when a level exceeds `k` values it is sorted and every
  * other element is promoted to level `i+1` (weight doubles, count
  * halves). An ODD-sized buffer leaves one element behind, so TOTAL
  * WEIGHT IS CONSERVED EXACTLY — `n` is exact, only ranks are
  * approximate. The kept-parity "coin" alternates deterministically per
  * compaction (unbiased pairwise over compactions; no RNG, so a given
  * reduce/merge order reproduces bit-identically).
  *
  * Memory: ≤ ~k·log₂(n/k) doubles. Rank error: each compaction
  * displaces a query rank by ≤ 2^i, giving the standard ε·n bound with
  * ε = O(log(n/k)/k); at k=256 the ScalaTest gate asserts ≤ 2.5 %
  * observed rank error through 10⁵ values and 16-way merges.
  *
  * Like every sketch here, the sketch VALUE depends on arrival/merge
  * order (Spark's partial-merge order is nondeterministic), so the
  * query is rows-only gated with accuracy asserted in ScalaTest — the
  * same contract as `agg_approx`/`agg_sketch_merge` (SURVEY §7.4).
  */
object QuantileSketch {

  val DefaultK = 256

  /** Sketch state: `coins` counts compactions (its low bit is the next
    * kept-parity), `levels(i)` holds the weight-2^i values, unsorted
    * between compactions. */
  case class QBuf(coins: Long, levels: List[List[Double]]) {

    def n: Long =
      levels.iterator.zipWithIndex.map { case (l, i) => l.size.toLong << i }.sum

    /** Smallest stored value whose cumulative weight reaches rank
      * ceil(q·n) (nearest-rank definition on the weighted sample). */
    def quantile(q: Double): Double = {
      val all = levels.iterator.zipWithIndex
        .flatMap { case (l, i) => l.iterator.map(v => (v, 1L << i)) }
        .toArray.sortBy(_._1)
      require(all.nonEmpty, "quantile of an empty sketch")
      val target = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L
      var j = 0
      while (j < all.length) {
        cum += all(j)._2
        if (cum >= target) return all(j)._1
        j += 1
      }
      all.last._1
    }
  }

  val emptyQBuf: QBuf = QBuf(0L, Nil)

  private def levelAt(levels: List[List[Double]], i: Int): List[Double] =
    if (i < levels.length) levels(i) else Nil

  private def updated(levels: List[List[Double]], i: Int, v: List[Double]): List[List[Double]] = {
    val padded = if (i < levels.length) levels else levels ++ List.fill(i + 1 - levels.length)(Nil)
    padded.updated(i, v)
  }

  /** Compact every over-capacity level bottom-up. One pass suffices per
    * insertion/merge batch: a compaction promotes ≤ ceil(k/2) values,
    * so a just-compacted level can only re-fill after ~k more arrivals. */
  private def compactAll(k: Int, qb: QBuf): QBuf = {
    var coins = qb.coins
    var levels = qb.levels
    var i = 0
    while (i < levels.length) {
      if (levels(i).size > k) {
        val sorted = levels(i).sorted
        val keepParity = (coins & 1L).toInt // alternates per compaction
        coins += 1
        val (promoted, kept) = {
          val p = List.newBuilder[Double]
          val kp = List.newBuilder[Double]
          var idx = 0
          var it = sorted
          // odd size: the last element has no pair partner — it stays
          // at this level so total weight is conserved exactly
          val pairs = sorted.size & ~1
          while (idx < pairs) {
            if ((idx & 1) == keepParity) p += it.head
            idx += 1
            it = it.tail
          }
          if (it.nonEmpty) kp += it.head
          (p.result(), kp.result())
        }
        levels = updated(levels, i, kept)
        levels = updated(levels, i + 1, promoted ::: levelAt(levels, i + 1))
      }
      i += 1
    }
    QBuf(coins, levels)
  }

  private def insert(k: Int, qb: QBuf, v: Double): QBuf = {
    val l0 = v :: levelAt(qb.levels, 0)
    val next = QBuf(qb.coins, updated(qb.levels, 0, l0))
    if (l0.size > k) compactAll(k, next) else next
  }

  private def mergeBufs(k: Int, a: QBuf, b: QBuf): QBuf = {
    val depth = math.max(a.levels.length, b.levels.length)
    val levels = (0 until depth).map(i =>
      levelAt(a.levels, i) ::: levelAt(b.levels, i)).toList
    compactAll(k, QBuf(a.coins + b.coins, levels))
  }

  /** Build a sketch from raw values — the PER-SHARD (partial) level. */
  def sketch(k: Int): Aggregator[Double, QBuf, QBuf] =
    new Aggregator[Double, QBuf, QBuf] {
      override def zero: QBuf = emptyQBuf
      override def reduce(buf: QBuf, v: Double): QBuf = insert(k, buf, v)
      override def merge(a: QBuf, b: QBuf): QBuf = mergeBufs(k, a, b)
      override def finish(r: QBuf): QBuf = r
      override def bufferEncoder: Encoder[QBuf] = ExpressionEncoder[QBuf]()
      override def outputEncoder: Encoder[QBuf] = ExpressionEncoder[QBuf]()
    }

  /** Merge already-built sketches — the ROLLUP level (hll_union's
    * analog): reads per-shard sketch values, never the raw data. */
  def union(k: Int): Aggregator[QBuf, QBuf, QBuf] =
    new Aggregator[QBuf, QBuf, QBuf] {
      override def zero: QBuf = emptyQBuf
      override def reduce(buf: QBuf, s: QBuf): QBuf = mergeBufs(k, buf, s)
      override def merge(a: QBuf, b: QBuf): QBuf = mergeBufs(k, a, b)
      override def finish(r: QBuf): QBuf = r
      override def bufferEncoder: Encoder[QBuf] = ExpressionEncoder[QBuf]()
      override def outputEncoder: Encoder[QBuf] = ExpressionEncoder[QBuf]()
    }
}
