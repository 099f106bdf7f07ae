package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass bounded top-k per group as a typed `Aggregator` —
  * SURVEY.md §7.3's perf-grade alternative to the window formulation.
  *
  * The window version (`row_number().over(partitionBy(g).orderBy(v)) <=
  * k`) must shuffle and SORT every row of every group; this aggregator
  * keeps a k-bounded buffer, so Spark plans it as partial aggregation —
  * each map task reduces its rows to ≤k per group BEFORE the shuffle,
  * and the exchange carries O(groups × k) instead of O(rows). At 100 TB
  * with small k that is the difference between shuffling the table and
  * shuffling a summary.
  *
  * Ordering: descending by `value`, ties broken by ascending `id`
  * (deterministic, matches the oracle's ORDER BY value DESC, id).
  */
object TopK {

  type Entry = (Double, Long) // (value, id)

  /** True iff `p` sorts strictly before `q` (descending value, ties by
    * ascending id). */
  private def before(p: Entry, q: Entry): Boolean =
    p._1 > q._1 || (p._1 == q._1 && p._2 < q._2)

  /** Merge two descending-sorted bounded lists, keep k — a single O(k)
    * merge pass. The previous `(a ++ b).sorted.take(k)` re-sorted and
    * re-allocated per input row, which is needless garbage when this
    * runs once per row of a 100 TB scan. */
  private def mergeBounded(k: Int, a: List[Entry], b: List[Entry]): List[Entry] = {
    val out = List.newBuilder[Entry]
    var x = a
    var y = b
    var n = 0
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      // stable: on full ties the left (accumulated) side wins, matching
      // the old stable-sort-of-(a ++ b) behavior
      if (y.isEmpty || (x.nonEmpty && !before(y.head, x.head))) {
        out += x.head; x = x.tail
      } else {
        out += y.head; y = y.tail
      }
      n += 1
    }
    out.result()
  }

  def topK(k: Int): Aggregator[Entry, List[Entry], Seq[Entry]] =
    new Aggregator[Entry, List[Entry], Seq[Entry]] {
      override def zero: List[Entry] = Nil
      override def reduce(buf: List[Entry], e: Entry): List[Entry] =
        // common case at scale: the buffer is full and the row doesn't
        // qualify — return the buffer untouched, zero allocation
        if (buf.lengthCompare(k) >= 0 && !before(e, buf.last)) buf
        else mergeBounded(k, buf, e :: Nil)
      override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
        mergeBounded(k, a, b)
      override def finish(r: List[Entry]): Seq[Entry] = r
      override def bufferEncoder: Encoder[List[Entry]] = ExpressionEncoder[List[Entry]]()
      override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
    }
}
