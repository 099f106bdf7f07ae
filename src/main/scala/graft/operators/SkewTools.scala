package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: explicit key salting (SURVEY.md §7.4 "document
  * skew strategy").
  *
  * AQE's skew-join split handles sort-merge skew at runtime, but salting
  * is still the right tool when one build-side key is so hot that even a
  * split partition floods a task (the classic 100 TB "null key / top
  * domain" problem): the skewed (probe) side scatters each row to one of
  * `buckets` sub-keys, the compact (build) side replicates each row to
  * ALL sub-keys, and the join key becomes (key, salt) — per-key work
  * fans out `buckets`-ways at the cost of `buckets`× replication of the
  * small side.
  */
object SkewTools {

  /** Inner equi-join of a skewed `left` against a compact `right`,
    * salted `buckets` ways. Result equals `left.join(right, keys)`. The
    * salt is derived from a hash of the left row's `saltBy` column (not
    * rand()) so the plan stays deterministic and retry-safe — a failed
    * task recomputes identical rows, which nondeterministic salting does
    * not guarantee under speculative execution. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltBy: Column,
      buckets: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(hash(saltBy), lit(buckets)))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
