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

  type LongEntry = (Long, Long) // (value, id)

  private def beforeL(p: LongEntry, q: LongEntry): Boolean =
    p._1 > q._1 || (p._1 == q._1 && p._2 < q._2)

  private def mergeBoundedL(k: Int, a: List[LongEntry], b: List[LongEntry]): List[LongEntry] = {
    val out = List.newBuilder[LongEntry]
    var x = a
    var y = b
    var n = 0
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && !beforeL(y.head, x.head))) {
        out += x.head; x = x.tail
      } else {
        out += y.head; y = y.tail
      }
      n += 1
    }
    out.result()
  }

  /** [[topK]] over EXACT integer scores — for rankings whose score is an
    * integer-arithmetic quantity (e.g. the BM25 fixed-point score): a
    * Double-scored buffer would round scores above 2^53 and could rank
    * differently from an exact-integer SQL oracle. Same bounded-buffer
    * partial-aggregation shape, same (value desc, id asc) total order.
    *
    * Round-16 optimization: the buffer is a MUTABLE sorted primitive
    * array (layout: [size, v₀, id₀, v₁, id₁, …], capacity fixed at k)
    * instead of an immutable List — at the k = 1024 consumer
    * (agg_approx's bottom-k sample) every qualifying row rebuilt an
    * O(k) cons-list (one node allocation per element, ×k·ln(n/k)
    * expected insertions ×tasks; jstack sampling showed mergeBoundedL
    * dominating the executor). Insertion is now one binary search +
    * one in-place System.arraycopy shift, zero per-entry allocation;
    * the kept multiset and the finish order are IDENTICAL (the sorted
    * array is exactly the sorted list). Typed Aggregators may mutate
    * and return their buffer; Array[Long] rides the primitive-array
    * encoder. */
  def topKLong(k: Int): Aggregator[LongEntry, Array[Long], Seq[LongEntry]] =
    new Aggregator[LongEntry, Array[Long], Seq[LongEntry]] {
      // entry i occupies (1 + 2i, 2 + 2i); slot 0 is the live count
      override def zero: Array[Long] = new Array[Long](1 + 2 * k)
      // true iff (v, id) sorts strictly before entry i (value desc, id asc)
      private def beforeEntry(buf: Array[Long], i: Int, v: Long, id: Long): Boolean = {
        val ev = buf(1 + 2 * i)
        v > ev || (v == ev && id < buf(2 + 2 * i))
      }
      override def reduce(buf: Array[Long], e: LongEntry): Array[Long] = {
        val n = buf(0).toInt
        val (v, id) = e
        if (n >= k && !beforeEntry(buf, n - 1, v, id)) return buf
        // binary search: first index whose entry sorts after (v, id) —
        // equal entries keep the earlier-arrived copy first, matching
        // the old stable merge (equal entries are indistinguishable)
        var lo = 0
        var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (beforeEntry(buf, mid, v, id)) hi = mid else lo = mid + 1
        }
        val keep = math.min(n + 1, k)
        // shift entries [lo, keep-1) right by one slot (drops the last
        // entry when the buffer is full)
        System.arraycopy(buf, 1 + 2 * lo, buf, 3 + 2 * lo, 2 * (keep - 1 - lo))
        buf(1 + 2 * lo) = v
        buf(2 + 2 * lo) = id
        buf(0) = keep.toLong
        buf
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        val (na, nb) = (a(0).toInt, b(0).toInt)
        if (nb == 0) return a
        if (na == 0) return b
        val out = new Array[Long](1 + 2 * k)
        var (i, j, n) = (0, 0, 0)
        while (n < k && (i < na || j < nb)) {
          // stable: the left (accumulated) side wins full ties
          val takeA = j >= nb ||
            (i < na && !beforeEntry(a, i, b(1 + 2 * j), b(2 + 2 * j)))
          if (takeA) {
            out(1 + 2 * n) = a(1 + 2 * i); out(2 + 2 * n) = a(2 + 2 * i); i += 1
          } else {
            out(1 + 2 * n) = b(1 + 2 * j); out(2 + 2 * n) = b(2 + 2 * j); j += 1
          }
          n += 1
        }
        out(0) = n.toLong
        out
      }
      override def finish(r: Array[Long]): Seq[LongEntry] =
        (0 until r(0).toInt).map(i => (r(1 + 2 * i), r(2 + 2 * i)))
      override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Seq[LongEntry]] = ExpressionEncoder[Seq[LongEntry]]()
    }

  /** Bounded k smallest DISTINCT longs — the KMV (k-minimum-values)
    * sketch buffer: duplicates collapse (KMV summarizes the distinct
    * SET of hash values; a multiset k-min would double-count repeated
    * content), the buffer is ascending-sorted and ≤ k, and merging two
    * buffers is the k-min of their set union — associative and
    * deterministic, so the sketch value (not just its guarantee) is
    * identical under any partial-aggregation order.
    *
    * Round-16 optimization (the [[topKLong]] buffer treatment,
    * residual item 4): the buffer is a MUTABLE sorted primitive array
    * (layout: [size, v₀, v₁, …], capacity fixed at k) instead of an
    * immutable List — at the k = 1024/256 sketch consumers every
    * qualifying hash rebuilt an O(k) cons-list on the map side of the
    * corpus scan. Insertion is one binary search (which also detects
    * duplicates, O(log k) instead of the merge walk) + one in-place
    * System.arraycopy shift; the kept SET and the finish order are
    * IDENTICAL (the sorted array is exactly the sorted list). */
  def kMinDistinct(k: Int): Aggregator[Long, Array[Long], Seq[Long]] = {
    // k = 0 would make reduce's arraycopy length negative on inputs that
    // dodge the fast path (round-16 advice) — fail loudly at build time
    require(k >= 1, s"kMinDistinct needs k >= 1 (got $k)")
    new Aggregator[Long, Array[Long], Seq[Long]] {
      // entry i occupies slot 1 + i, ascending and distinct; slot 0 is
      // the live count
      override def zero: Array[Long] = new Array[Long](1 + k)
      override def reduce(buf: Array[Long], v: Long): Array[Long] = {
        val n = buf(0).toInt
        // fast path: full buffer and v can't enter (or equals the max)
        if (n >= k && v >= buf(n)) return buf
        // binary search: first index whose entry is ≥ v
        var lo = 0
        var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (buf(1 + mid) < v) lo = mid + 1 else hi = mid
        }
        if (lo < n && buf(1 + lo) == v) return buf // duplicate collapses
        val keep = math.min(n + 1, k)
        // shift entries [lo, keep-1) right by one slot (drops the
        // largest when the buffer is full)
        System.arraycopy(buf, 1 + lo, buf, 2 + lo, keep - 1 - lo)
        buf(1 + lo) = v
        buf(0) = keep.toLong
        buf
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        val (na, nb) = (a(0).toInt, b(0).toInt)
        if (nb == 0) return a
        if (na == 0) return b
        // ascending merge of two sorted distinct arrays, keep the k
        // smallest, collapse cross-buffer duplicates (within-buffer
        // entries are distinct by construction)
        val out = new Array[Long](1 + k)
        var (i, j, n) = (0, 0, 0)
        while (n < k && (i < na || j < nb)) {
          val takeA = j >= nb || (i < na && a(1 + i) <= b(1 + j))
          val v = if (takeA) {
            i += 1
            val va = a(i)
            if (j < nb && b(1 + j) == va) j += 1 // collapse duplicate
            va
          } else {
            j += 1
            b(j)
          }
          out(1 + n) = v
          n += 1
        }
        out(0) = n.toLong
        out
      }
      override def finish(r: Array[Long]): Seq[Long] =
        (0 until r(0).toInt).map(i => r(1 + i))
      override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    }
  }

  /** A scored candidate with the payload the rescore phase needs, so the
    * exact phase never re-scans the corpus to fetch it back (a second
    * 100 TB read). `emb` is a primitive Array (round-16 optimization):
    * the Seq[Float] encoder boxed every element on both sides of the
    * typed boundary — corpus-pair volume × dim boxed floats per pass —
    * while the Array[Float] encoder moves one primitive array. */
  case class Cand(score: Double, id: Long, label: Int, emb: Array[Float])

  /** True iff `p` sorts strictly before `q` (descending score, ties by
    * ascending id — the same total order the window formulation used). */
  private def candBefore(p: Cand, q: Cand): Boolean =
    p.score > q.score || (p.score == q.score && p.id < q.id)

  /** Keep the top-k prefix of a descending-sorted list PLUS every entry
    * whose score is within `eps` of the k-th score. The eps tail is what
    * makes the cut safe under an approximate phase-1 score: phase-1 may
    * misorder pairs whose true scores differ by less than its numeric
    * drift, so an exact-k cut could evict a true top-k member — the eps
    * band (chosen ≫ the drift) cannot. The retention rule composes under
    * partial aggregation: any sub-buffer's k-th score is ≤ the final
    * k-th score (a subset's k-th best never beats the full set's), so an
    * entry inside the final eps band is inside every intermediate band
    * it passes through — no partial cut can drop a final survivor. */
  private def cutTies(k: Int, eps: Double, sorted: List[Cand]): List[Cand] =
    if (sorted.lengthCompare(k) <= 0) sorted
    else {
      val (head, tail) = sorted.splitAt(k)
      val kth = head.last.score
      head ::: tail.takeWhile(_.score >= kth - eps)
    }

  /** O(|a|+|b|) merge of two descending-sorted lists (stable: left wins
    * full ties, as in [[mergeBounded]]). */
  private def mergeCands(a: List[Cand], b: List[Cand]): List[Cand] = {
    val out = List.newBuilder[Cand]
    var x = a
    var y = b
    while (x.nonEmpty || y.nonEmpty) {
      if (y.isEmpty || (x.nonEmpty && !candBefore(y.head, x.head))) {
        out += x.head; x = x.tail
      } else {
        out += y.head; y = y.tail
      }
    }
    out.result()
  }

  /** Tie-aware bounded top-k with payload — the hierarchical phase-1 of
    * the two-phase exact top-k (see `queries/Similarity.topkPairs`).
    * Plans as ObjectHashAggregate with partial merge, so each map task
    * reduces its rows to ≤k(+ties) per group BEFORE the shuffle: the
    * exchange carries O(tasks × groups) bounded buffers instead of
    * hash-partitioning a corpus-sized candidate set into |groups|
    * window partitions (with 8 query groups that shape is 8 single-task
    * corpus sorts — the round-6 scale-killer this replaces). */
  def topKTies(k: Int, eps: Double): Aggregator[Cand, List[Cand], Seq[Cand]] =
    new Aggregator[Cand, List[Cand], Seq[Cand]] {
      override def zero: List[Cand] = Nil
      override def reduce(buf: List[Cand], e: Cand): List[Cand] = {
        // fast path: buffer is cut and the row can't enter the k-prefix
        // or its eps band — untouched, zero allocation
        if (buf.lengthCompare(k) >= 0) {
          val kth = buf(k - 1).score
          if (e.score < kth - eps) return buf
        }
        cutTies(k, eps, mergeCands(buf, e :: Nil))
      }
      override def merge(a: List[Cand], b: List[Cand]): List[Cand] =
        cutTies(k, eps, mergeCands(a, b))
      override def finish(r: List[Cand]): Seq[Cand] = r
      override def bufferEncoder: Encoder[List[Cand]] = ExpressionEncoder[List[Cand]]()
      override def outputEncoder: Encoder[Seq[Cand]] = ExpressionEncoder[Seq[Cand]]()
    }
}
