package graft.queries

import graft.{QueryModule, Tables}
import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

/** Temporal join operators over the events stream table.
  *
  * `asof_purchase_click`: for every purchase event, the most recent click
  * by the same user at or before the purchase — the canonical as-of
  * (backward) join, executed with [[graft.operators.AsofJoin]]'s
  * single-shuffle union-and-scan plan. Oracle: DuckDB's native
  * `ASOF JOIN` (`>=` semantics), which makes this one of the few operator
  * families where the oracle engine has a dedicated physical operator to
  * compare against.
  */
object Temporal extends QueryModule {

  val queries: Map[String, Q] = Map(

    "asof_purchase_click" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      AsofJoin.backward(purchases, clicks, key = "user_id", ts = "ts",
        payload = Seq("click_id"))
        .select(
          col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("click_id"),
          unix_micros(col("ts_right")).as("click_ts_us"),
          (unix_micros(col("ts")) - unix_micros(col("ts_right"))).as("gap_us"))
        .orderBy(col("event_id"))
    },

    // As-of join with a TOLERANCE bound (the time-series-engine variant:
    // "most recent click, but only if within 15 minutes") — the match is
    // still the single as-of predecessor; the bound then filters the
    // matched pair, it does NOT fall back to an older click. Same
    // single-shuffle plan as asof_purchase_click plus one cheap residual
    // filter on the (already output-sized) match set.
    "asof_tolerance" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      AsofJoin.backward(purchases, clicks, key = "user_id", ts = "ts",
        payload = Seq("click_id"))
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(col("ts_right")))
        .filter(col("gap_us") <= 900000000L) // 15 min
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("click_id"), col("gap_us"))
        .orderBy(col("event_id"))
    }
  )

  val oracles: Map[String, String] = Map(

    "asof_purchase_click" ->
      """SELECT p.event_id, p.user_id,
        |       CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
        |       c.event_id AS click_id,
        |       CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us,
        |       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "asof_tolerance" ->
      """SELECT event_id, user_id, ts_us, click_id, gap_us
        |FROM (SELECT p.event_id, p.user_id,
        |             CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
        |             c.event_id AS click_id,
        |             CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
        |      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |      ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |        ON p.user_id = c.user_id AND p.ts >= c.ts)
        |WHERE gap_us <= 900000000
        |ORDER BY event_id""".stripMargin
  )
}
