package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** MERGEABLE heavy-hitters (frequent items) sketch — Misra–Gries, the
  * third member of the mergeable-sketch family (HLL distinct counts in
  * `agg_sketch_merge`, KLL-style quantiles in `agg_quantile_merge`):
  * per-shard token-frequency summaries an upper level merges into a
  * global one, the shape a 100 TB "what dominates this corpus slice"
  * health check must take (the exact answer needs a vocab-sized global
  * aggregation per slice; the sketch is m counters).
  *
  * Classic MG maintains m counters: a present item increments; a new
  * item occupies a free counter; with all m occupied, EVERY counter
  * decrements (amortized via the (m+1)-th-largest subtraction below).
  * The merge (Agarwal et al., "Mergeable Summaries", PODS'12) sums
  * counters pointwise and, if over m, subtracts the (m+1)-th largest
  * count from all and drops the non-positive — THE result that made MG
  * the standard distributed frequent-items summary. Guarantee at every
  * level: true_count − n/(m+1) ≤ count̂ ≤ true_count, deterministic,
  * no RNG.
  *
  * Exactness regime: while a scope's distinct-item count stays ≤ m, no
  * subtraction ever fires and counts are EXACT — the fixtures' 31-token
  * vocabulary sits inside m = 64, so the driver oracle hash-checks the
  * query end-to-end (the capped regime, where only the ε-bound holds,
  * is exercised in ScalaTest with a vocabulary ≫ m — the same
  * pinned-knob discipline as text_unigram_logprob's vocab cap).
  */
object FreqSketch {

  val DefaultM = 64

  /** counts: item → lower-bound count (≤ true count; within n/(m+1)). */
  case class MGBuf(counts: Map[String, Long]) {
    /** Top-k by (count desc, item asc) — total order, both engines. */
    def top(k: Int): Seq[(String, Long)] =
      counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(k)
  }

  val emptyMGBuf: MGBuf = MGBuf(Map.empty)

  private def shrink(m: Int, counts: Map[String, Long]): Map[String, Long] =
    if (counts.size <= m) counts
    else {
      // subtract the (m+1)-th largest count from everything, drop ≤ 0 —
      // the amortized form of "decrement all m counters" and the exact
      // merge rule from the mergeable-summaries result
      val d = counts.valuesIterator.toArray.sortBy(-_).apply(m)
      counts.collect { case (w, c) if c > d => w -> (c - d) }
    }

  private def insert(m: Int, buf: MGBuf, w: String): MGBuf =
    MGBuf(shrink(m, buf.counts.updated(w, buf.counts.getOrElse(w, 0L) + 1L)))

  private def mergeBufs(m: Int, a: MGBuf, b: MGBuf): MGBuf = {
    val sum = b.counts.foldLeft(a.counts) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    MGBuf(shrink(m, sum))
  }

  /** Build a summary from raw items — the PER-SHARD (partial) level. */
  def sketch(m: Int): Aggregator[String, MGBuf, MGBuf] =
    new Aggregator[String, MGBuf, MGBuf] {
      override def zero: MGBuf = emptyMGBuf
      override def reduce(buf: MGBuf, w: String): MGBuf = insert(m, buf, w)
      override def merge(a: MGBuf, b: MGBuf): MGBuf = mergeBufs(m, a, b)
      override def finish(r: MGBuf): MGBuf = r
      override def bufferEncoder: Encoder[MGBuf] = ExpressionEncoder[MGBuf]()
      override def outputEncoder: Encoder[MGBuf] = ExpressionEncoder[MGBuf]()
    }

  /** Merge already-built summaries — the ROLLUP level. */
  def union(m: Int): Aggregator[MGBuf, MGBuf, MGBuf] =
    new Aggregator[MGBuf, MGBuf, MGBuf] {
      override def zero: MGBuf = emptyMGBuf
      override def reduce(buf: MGBuf, s: MGBuf): MGBuf = mergeBufs(m, buf, s)
      override def merge(a: MGBuf, b: MGBuf): MGBuf = mergeBufs(m, a, b)
      override def finish(r: MGBuf): MGBuf = r
      override def bufferEncoder: Encoder[MGBuf] = ExpressionEncoder[MGBuf]()
      override def outputEncoder: Encoder[MGBuf] = ExpressionEncoder[MGBuf]()
    }
}
