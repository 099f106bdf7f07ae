package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (backward) join — an operator Spark's DataFrame API
  * lacks natively (the reference lacks joins entirely; this is part of
  * the §7.2 capability-breadth extension, and DuckDB's native ASOF JOIN
  * provides the oracle).
  *
  * Semantics: for each left row, attach the single most recent right row
  * of the same key with `right.ts <= left.ts` (inner: left rows with no
  * prior right row are dropped).
  *
  * Implementation is the scale-correct union-and-scan formulation, per
  * SURVEY.md §7.3's preference order ("compose existing ops" before
  * custom plans): tag both inputs, union, and run one window scan per
  * key ordered by (ts, side) carrying the last-seen right payload
  * forward. Exactly ONE shuffle on the key (the window partition), no
  * range-condition row explosion, no per-key materialization beyond the
  * window sort — at 100 TB this behaves like any keyed window, and skewed
  * keys fall to AQE. The equal-timestamp case matches ASOF `>=`: the
  * right side sorts before the left at the same ts.
  */
object AsofJoin {

  /** @param left       rows to enrich; must contain `key` and `ts`
    * @param right      lookup rows; must contain `key`, `ts`, and `payload`
    * @param key        equi-join column name
    * @param ts         event-time column name (same name both sides)
    * @param payload    right-side columns to carry (renamed as-is onto the left)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String]): DataFrame =
    scan(left, right, key, ts, payload, forward = false)

  /** Forward (look-ahead) as-of: for each left row, attach the single
    * EARLIEST right row of the same key with `right.ts >= left.ts`
    * ("time to next action" / forward attribution). Same union-and-scan
    * shape, scanned in DESCENDING ts order — the carried "last seen
    * right" is then the minimum qualifying ts; equal-ts ties break to
    * the smallest payload (the scan orders payload descending so the
    * minimum is seen last), mirroring backward's max-payload tie rule. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String]): DataFrame =
    scan(left, right, key, ts, payload, forward = true)

  private def scan(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      forward: Boolean): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right.withColumn("__side", lit(0))
    // align schemas: left lacks payload; right lacks the left extras
    val leftOnly = left.columns.filterNot(c => c == key || c == ts)
    val rightAligned = r
      .select((Seq(col(key), col(ts), col("__side")) ++
        payload.map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val leftAligned = l
      .select((Seq(col(key), col(ts), col("__side")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftOnly.map(col)): _*)
    // ordering: ts (ascending for backward, descending for forward),
    // then side (right before left at equal ts = ASOF >=/<=), then the
    // payload columns — with a unique payload column (e.g. an event id)
    // this makes the carried row deterministic even when two right rows
    // share an exact timestamp (without it, `last` would pick whichever
    // duplicate the shuffle sorted last; note a SQL ASOF JOIN is
    // equally unspecified on such ties). Backward carries the MAX
    // payload among equal-ts rights (payload asc ⇒ max seen last);
    // forward the MIN (payload desc ⇒ min seen last).
    val w = Window.partitionBy(col(key))
      .orderBy(
        (if (forward) col(ts).desc else col(ts).asc) +:
          col("__side") +:
          payload.map(c => if (forward) col(c).desc else col(c).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(rightAligned.unionByName(leftAligned)) {
      case (df, c) =>
        df.withColumn(c, last(when(col("__side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    // keep the right-side ts too: carry it like a payload column
    val withRts = carried.withColumn("__rts",
      last(when(col("__side") === 0, col(ts)), ignoreNulls = true).over(w))
    withRts
      .filter(col("__side") === 1 && col("__rts").isNotNull)
      .drop("__side")
      .withColumnRenamed("__rts", s"${ts}_right")
  }
}
