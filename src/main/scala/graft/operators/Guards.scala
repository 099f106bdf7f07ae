package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed data-quality guards shared by the keyed operators
  * ([[Merge]], [[Diff]]) — one implementation, so a fix (null-key
  * handling, the temp-column name) can never land in one copy and miss
  * the other (round-9 review). */
object Guards {

  /** Fail the job with `errPrefix + key` if any key value occurs more
    * than once: a count window co-partitioned with whatever key shuffle
    * follows (no extra exchange, no driver-side collect), with the
    * `raise_error` evaluated per row BEFORE the offending rows can fan
    * out through a downstream join. NOT free at table scale —
    * WindowExec buffers and copies every row (measured: two 15 M-row
    * guards took delta_diff 7.6 s → 24.2 s at the 100× fixture) — so
    * callers with upstream-guaranteed uniqueness should be able to opt
    * out (see Diff's `checkUnique`).
    *
    * NULL keys: `Window.partitionBy` groups all NULLs into one
    * partition, so ≥2 NULL-keyed rows fire the guard — deliberately
    * kept, even though NULL keys cannot fan out through the downstream
    * null-UNsafe equi-joins (they match nothing): duplicate NULL keys
    * in a keyed table are a data-quality defect the caller wants
    * surfaced, not silently dropped rows. The key is coalesced into
    * the message (round-9 advice: `concat` with a NULL key made the
    * whole message NULL and raise_error threw an opaque null). */
  def keyUnique(df: DataFrame, key: String, errPrefix: String): DataFrame = {
    val wKey = Window.partitionBy(col(key))
    df.withColumn("_n_dup", count(lit(1)).over(wKey))
      .filter(when(col("_n_dup") > 1,
          raise_error(concat(lit(errPrefix),
            coalesce(col(key).cast("string"), lit("NULL")))))
        .otherwise(lit(true)))
      .drop("_n_dup")
  }
}
