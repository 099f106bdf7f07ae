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

  /** Merge two descending-sorted bounded lists, keep k. */
  private def mergeBounded(k: Int, a: List[Entry], b: List[Entry]): List[Entry] = {
    val ord = Ordering.by[Entry, (Double, Long)] { case (v, id) => (-v, id) }
    (a ++ b).sorted(ord).take(k)
  }

  def topK(k: Int): Aggregator[Entry, List[Entry], Seq[Entry]] =
    new Aggregator[Entry, List[Entry], Seq[Entry]] {
      override def zero: List[Entry] = Nil
      override def reduce(buf: List[Entry], e: Entry): List[Entry] =
        mergeBounded(k, buf, List(e))
      override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
        mergeBounded(k, a, b)
      override def finish(r: List[Entry]): Seq[Entry] = r
      override def bufferEncoder: Encoder[List[Entry]] = ExpressionEncoder[List[Entry]]()
      override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
    }
}
