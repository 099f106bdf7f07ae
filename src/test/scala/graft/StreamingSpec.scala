package graft

import graft.streaming.Streaming
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming jobs must equal their batch twins when driven to completion
  * over the same (finite) file source — the unified-model contract. */
class StreamingSpec extends GraftSuite {

  private def normalize(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("streaming tumbling counts equal the batch events_tumbling result") {
    val stream = Streaming.eventsStream(spark, sf)
    val got = Streaming.runToCompletion(
      Streaming.tumblingCounts(stream), "tumbling_out", OutputMode.Complete())
      .select("window_start", "event_type", "n", "total_value")
    val want = q("events_tumbling")
    assert(normalize(got) == normalize(want))
  }

  test("streaming session windows equal the batch events_session result") {
    val stream = Streaming.eventsStream(spark, sf)
    val got = Streaming.runToCompletion(
      Streaming.sessionCounts(stream), "session_out", OutputMode.Complete())
      .select("user_id", "session_start_us", "n_events", "session_value")
    val want = q("events_session")
    assert(normalize(got) == normalize(want))
  }

  test("stream-stream interval join equals the batch join") {
    val got = Streaming.runToCompletion(
      Streaming.purchaseClickJoin(Streaming.eventsStream(spark, sf)),
      "ssjoin_out", OutputMode.Append())
    val want = Streaming.purchaseClickJoin(Tables.events(spark, sf))
    assert(normalize(got) == normalize(want))
    assert(want.count() > 0)
  }

  test("flatMapGroupsWithState sessionization equals session_window") {
    import spark.implicits._
    val tsEvents = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[Streaming.TsEvent]
    val custom = Streaming.sessionize(tsEvents).collect()
      .map(s => (s.user_id, s.session_start_us, s.n_events)).toSet
    val builtin = q("events_session").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(custom == builtin)
  }

  test("mapGroupsWithState running totals match a batch groupBy") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .as[Streaming.Event]
    // batch-mode mapGroupsWithState: single group pass == groupBy agg
    val got = Streaming.userRunningTotals(events)
      .collect().map(u => u.user_id -> u.n_events).toMap
    val want = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
