package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot DIFF — the audit/ops complement of [[Merge]]: given two
  * versions of a keyed table, emit the row-level change set ('added' /
  * 'removed' / 'changed' with old and new payloads side by side).
  * This is what table-format time travel diffs, ingest reconciliation
  * ("what did yesterday's batch actually change?"), and replication
  * verification run at scale.
  *
  * Shape: ONE full-outer sort-merge join on the key — the same
  * necessarily-shuffled plan as Merge (broadcast cannot produce the
  * unmatched-build side of a full outer), co-partitioned with the
  * table's bucketing in a real deployment. Change detection is a
  * null-safe (`<=>`) column-wise comparison in the post-join
  * projection; unchanged rows are dropped there, so the OUTPUT is
  * change-set-sized even though the join is table-sized (at 100 TB
  * with partition-level version metadata you'd prune untouched
  * partitions before ever joining — orthogonal to this operator).
  *
  * `newV` must carry the same columns as `oldV`, and the key must be
  * UNIQUE within each snapshot — enforced by default with the same
  * count-window `raise_error` guard Merge uses (round-8 advice: a
  * repeated key would otherwise silently multiply rows through the
  * full-outer join and emit spurious 'changed'/duplicate change rows).
  * Each guard is a snapshot-sized window co-partitioned with the join
  * shuffle it precedes — no extra exchange, no driver-side collect —
  * but NOT free: WindowExec buffers and copies every row, and unlike
  * Merge (which guards only the change-sized delta) Diff's guards run
  * over BOTH table-sized snapshots (measured on the 100× fixture:
  * 2 × 15 M-row guards took delta_diff 7.6 s → 24.2 s). Callers whose
  * key uniqueness is guaranteed upstream — a primary key, a bucketed
  * layout, a MERGE output — pass `checkUnique = false` to skip them,
  * the same assertion real MERGE/CDC engines let you make.
  */
object Diff {

  def diff(oldV: DataFrame, newV: DataFrame, key: String,
           checkUnique: Boolean = true): DataFrame = {
    require(oldV.columns.sorted.sameElements(newV.columns.sorted),
      s"diff requires identical schemas: ${oldV.columns.toSeq} vs ${newV.columns.toSeq}")
    val payload = oldV.columns.filterNot(_ == key).toSeq
    def guarded(df: DataFrame, side: String): DataFrame =
      if (checkUnique)
        Guards.keyUnique(df, key, s"DIFF: duplicate key in $side snapshot: ")
      else df
    val o = guarded(oldV, "old").withColumn("_o", lit(true)).as("o")
    val n = guarded(newV, "new").withColumn("_n", lit(true)).as("n")
    val changed = payload.map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    o.join(n, Seq(key), "full_outer")
      .withColumn("op",
        when(col("o._o").isNull, "added")
          .when(col("n._n").isNull, "removed")
          .when(changed, "changed"))
      .filter(col("op").isNotNull)
      .select(col(key) +: col("op") +:
        payload.flatMap(c => Seq(
          col(s"o.$c").as(s"old_$c"), col(s"n.$c").as(s"new_$c"))): _*)
  }
}
