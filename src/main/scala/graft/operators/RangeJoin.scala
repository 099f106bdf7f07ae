package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed interval-containment (range) join — the second operator
  * of the brief's custom-op pair (as-of join, range join) that Spark's
  * DataFrame API lacks natively (the reference lacks joins entirely;
  * DuckDB's plain non-equi join provides the oracle).
  *
  * Semantics: attach to each probe row every interval row whose
  * half-open band contains it: `lo <= v < hi`. The classic instances
  * are IP→geo lookup, price tiering, and timestamp→calendar-period
  * assignment.
  *
  * Why not just `probe.join(intervals, v >= lo && v < hi)`: a non-equi
  * condition gives Catalyst no equi-key, so it plans
  * BroadcastNestedLoopJoin (probe × every interval — fine only while
  * the interval table is tiny) or, without a broadcastable side, a
  * CartesianProduct — the O(n·m) shape that dies at scale. The
  * scale-correct recipe is BUCKETIZE-TO-EQUI-JOIN: pick a granularity
  * `g`, explode each interval into the integer buckets of width `g` it
  * overlaps (interval-side blow-up = width/g, bounded and dim-sized),
  * compute each probe row's single bucket `floor(v/g)` in a narrow
  * projection, equi-join on the bucket (a real shuffle/broadcast hash
  * join with partition pruning, AQE, the works), and apply the exact
  * `lo <= v < hi` residual to the candidates. Bucketing only GENERATES
  * candidates — correctness rests on the residual alone, so the
  * granularity is a pure performance knob (≈ median interval width;
  * too coarse → more candidates per bucket, too fine → more interval
  * replicas).
  *
  * The probe side is never replicated and shuffles once on its bucket
  * (or not at all when the exploded interval side broadcasts — the
  * common case, since interval tables are dims); candidate volume is
  * `|probe| × (overlapping intervals per bucket)`, output-scale for
  * non-pathological band layouts.
  */
object RangeJoin {

  /** @param probe       rows to classify; `valueCol` evaluates on them
    * @param valueCol    numeric probe expression (double-compatible)
    * @param intervals   interval table with `loCol`/`hiCol` columns
    *                    (half-open [lo, hi)); exploded by width/g —
    *                    broadcast when `broadcastIntervals` (the dim
    *                    common case), shuffle-equi-joined otherwise
    * @param loCol       inclusive lower-bound column name
    * @param hiCol       exclusive upper-bound column name
    * @param granularity bucket width g (performance knob only)
    * @param maxReplication PER-INTERVAL explosion cap (width/g + 1);
    *                    an interval exceeding it fails the job with a
    *                    clear error instead of silently exploding
    *                    (round-8 advice: a too-fine g or one huge
    *                    interval turned the "pure performance knob"
    *                    into a driver OOM). The guard is a per-row
    *                    codegen predicate — no extra job, no collect.
    *                    NOTE it bounds each row, NOT the total: the
    *                    broadcast materializes Σ(width_i/g + 1) rows,
    *                    so a MANY-row interval table can still exceed
    *                    the driver even with every row under the cap —
    *                    that case is what `broadcastIntervals = false`
    *                    exists for (an interval table big enough to
    *                    matter is not a dim and should shuffle).
    * @param broadcastIntervals false → plain shuffle hash/sort-merge
    *                    equi-join on the bucket, for interval tables
    *                    too large (or too exploded) to broadcast
    */
  def joinByRange(
      probe: DataFrame,
      valueCol: Column,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      granularity: Double,
      maxReplication: Long = 100000L,
      broadcastIntervals: Boolean = true): DataFrame = {
    require(granularity > 0, "granularity must be positive")
    require(maxReplication > 0, "maxReplication must be positive")
    // covering buckets floor(lo/g)..floor(hi/g): the hi bucket is kept
    // even when hi is an exact multiple of g — an extra candidate
    // bucket is harmless (the residual drops it), a missing one is not
    val loB = floor(col(loCol) / granularity).cast("long")
    val hiB = floor(col(hiCol) / granularity).cast("long")
    val exploded = intervals
      .filter(when(hiB - loB + 1 > maxReplication,
          raise_error(concat(
            lit(s"RANGE JOIN: interval explodes into more than $maxReplication buckets "),
            lit("at granularity "), lit(granularity).cast("string"),
            lit(": ["), col(loCol).cast("string"),
            lit(", "), col(hiCol).cast("string"),
            lit(") — coarsen g, shrink the interval, or raise maxReplication"))))
        .otherwise(lit(true)))
      .withColumn("__bucket", explode(sequence(loB, hiB)))
    val joined = probe
      .withColumn("__v", valueCol)
      .withColumn("__bucket", floor(col("__v") / granularity).cast("long"))
      .join(if (broadcastIntervals) broadcast(exploded) else exploded,
        Seq("__bucket"))
    joined
      .filter(col("__v") >= col(loCol) && col("__v") < col(hiCol))
      .drop("__bucket", "__v")
  }
}
