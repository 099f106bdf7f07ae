package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL MERGE (upsert + delete) as a reusable dataframe operator — the
  * daily-ingest primitive: apply a delta to a snapshot, delta wins.
  *
  * Semantics mirror ANSI/Delta MERGE:
  *  - delta op 'U' or 'I' matched on the key → the delta row replaces
  *    the snapshot row (`action = "update"`);
  *  - delta row with no snapshot match → inserted (`action = "insert"`);
  *  - delta op 'D' → the snapshot row is REMOVED from the output (a
  *    delete of an absent key is a no-op, as in SQL MERGE);
  *  - snapshot rows the delta never touches pass through
  *    (`action = "keep"`).
  *  - A key matched by MORE THAN ONE delta row is an ERROR (SQL MERGE
  *    raises on multi-match rather than picking one arbitrarily — a
  *    silent full-outer join would nondeterministically duplicate the
  *    target row). Enforced distributively: a count over the delta
  *    keyed by the merge key feeds a per-row `raise_error` guard, so
  *    the check costs one delta-sized window co-partitioned with the
  *    join shuffle it precedes — no driver-side collect.
  *
  * The join itself is the 100 TB shape: a FULL OUTER sort-merge on the
  * key — necessarily a shuffle join (broadcast hash join cannot produce
  * the unmatched-build side of a full outer), co-partitioned with the
  * table's bucketing in a real deployment — followed by delta-preferring
  * COALESCE projection and the delete filter (which cannot push below
  * the join: a 'D' row must MEET its snapshot row to remove it).
  *
  * `delta` must carry `base`'s columns plus `opCol` ∈ {'U','I','D'}.
  */
object Merge {

  def merge(base: DataFrame, delta: DataFrame, key: String,
            opCol: String = "op"): DataFrame = {
    val payload = base.columns.filterNot(_ == key).toSeq
    // multi-match guard ([[Guards.keyUnique]], shared with Diff): ANY
    // duplicate key in the delta fails the job with a MERGE-style error
    // instead of silently merging twice. Cheap here by design — the
    // guard rides the CHANGE-SIZED delta, never the base table.
    val guarded = Guards
      .keyUnique(delta, key, "MERGE: delta key matched by multiple rows: ")
      .withColumn("_dl", lit(true))
    val merged = base.withColumn("_s", lit(true)).as("s")
      .join(guarded.as("dl"), Seq(key), "full_outer")
      .filter(col(s"dl.$opCol").isNull || col(s"dl.$opCol") =!= "D")
    merged.select(
      col(key) +:
        payload.map(c => coalesce(col(s"dl.$c"), col(s"s.$c")).as(c)) :+
        when(col("s._s").isNull, "insert")
          .when(col("dl._dl").isNotNull, "update")
          .otherwise("keep").as("action"): _*)
  }
}
