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
  * `newV` must carry the same columns as `oldV`.
  */
object Diff {

  def diff(oldV: DataFrame, newV: DataFrame, key: String): DataFrame = {
    require(oldV.columns.sorted.sameElements(newV.columns.sorted),
      s"diff requires identical schemas: ${oldV.columns.toSeq} vs ${newV.columns.toSeq}")
    val payload = oldV.columns.filterNot(_ == key).toSeq
    val o = oldV.withColumn("_o", lit(true)).as("o")
    val n = newV.withColumn("_n", lit(true)).as("n")
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
