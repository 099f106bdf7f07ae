package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming jobs over the events table (SURVEY.md §7.2 step 5).
  *
  * The reference has no streaming at all; this is the capability-parity
  * extension for stream processing. Each job's aggregation expression is
  * IDENTICAL to its batch twin in [[graft.queries.Windows]] — that is the
  * point of Structured Streaming's unified model: the same logical plan
  * runs incrementally with watermark-bounded state. The batch twins carry
  * the DuckDB oracle; the streaming paths are verified in ScalaTest by
  * running them on a file source to completion (memory sink) and
  * comparing to the batch result.
  *
  * Scale notes: state is keyed by (window/session, group key) and pruned
  * by the watermark, so state size is bounded by (#keys × windows inside
  * the watermark horizon), not by stream length. `maxFilesPerTrigger`
  * governs micro-batch size under backfill.
  */
object Streaming {

  /** A cloned session whose shuffle-partition count sizes STREAMING
    * STATE parallelism: each stateful operator keeps one state store per
    * shuffle partition, checkpointed every micro-batch, so partitions ≫
    * (state volume / partition budget) is pure per-batch overhead —
    * measured ~40% of wall-clock on the fixture streams at 32 stores.
    * The lever cuts BOTH ways and is deliberately explicit: a 100 TB
    * ingest raises it (state must fit per-executor memory), a fixture
    * stream lowers it. Batch queries in the parent session are
    * untouched (newSession shares the SparkContext, not the conf). */
  /** Target bytes of stream input per state partition — the derive-from-
    * data rule (Tuning.initialShufflePartitions' recipe applied to
    * streaming state): every state store pays a fixed per-micro-batch
    * commit/snapshot cost, so a small stream wants FEW stores (measured
    * on the sf0.1 gates: 8 → 2 partitions cut the stream-stream join
    * gate ~14%), while a 100 TB ingest wants many small stores (smaller
    * per-store maps, round-6's 10M-key heap-store bimodality). 8 MiB of
    * source parquet per store: the 2 MB sf0.1 events land on the floor
    * of 2, the ~200 MB 100× replica derives ~26, a real ingest hits the
    * core cap. */
  private val TargetBytesPerStatePartition = 8L * 1024 * 1024

  def stateSizedSession(spark: SparkSession, dir: String): SparkSession = {
    val parts = spark.conf.getOption("spark.graft.streaming.statePartitions")
      .map(_.toInt).getOrElse {
        val bytes = graft.Tuning.dirBytes(
          java.nio.file.Paths.get(dir, "events.parquet").toString)
        val cores = spark.sparkContext.defaultParallelism
        val bySize = math.ceil(bytes.toDouble / TargetBytesPerStatePartition).toLong
        math.max(2L, math.min(cores.toLong, bySize)).toInt
      }
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", parts)
    // State store provider: RocksDB is the 100 TB production answer (state
    // off heap → no GC cliff as keys grow; changelog checkpoints) and is
    // exposed as the opt-in spark.graft.streaming.stateStore=rocksdb.
    // The crossover is MEASURED (docs/SCALING.md round-6 table,
    // streaming_dedup, fresh-JVM reps): at 1M keys the heap-backed
    // default wins (~10 s vs RocksDB's per-batch fixed costs); at 10M
    // keys the heap store turns bimodal (~40 s or ~137 s depending on
    // whether full-map snapshot + GC land inside the window) while
    // RocksDB holds a stable 41-49 s. Default stays heap-backed because
    // the fixture streams sit far below the crossover; production
    // ingest state sits far above it. Changelog checkpointing is
    // enabled for the opt-in path, as production would.
    if (spark.conf.getOption("spark.graft.streaming.stateStore").contains("rocksdb")) {
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      ss.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    }
    ss
  }

  /** Filesystem-safe staging key for a fixture path: the sanitized path
    * itself — an Int hash could silently collide across fixture dirs and
    * cross-contaminate stream sources — plus the JVM pid, so two
    * concurrent sessions over the SAME fixture never share (and race on)
    * one staging dir. Within a JVM the key is stable, so repeated gates
    * over a fixture reuse their staging. */
  private def stagingKey(dir: String): String = {
    val sane = dir.replaceAll("[^A-Za-z0-9._-]", "-").replaceAll("-+", "-")
    val tail = if (sane.length > 60) sane.substring(sane.length - 60) else sane
    s"${ProcessHandle.current().pid()}-$tail"
  }

  /** File-source stream over the same parquet fixture (schema must be
    * supplied for streaming reads). ts arrives as nanos (see
    * Tables.events) and is normalized identically. `copies` stages the
    * events file N times (N micro-batches at maxFilesPerTrigger=1), so
    * every event arrives N times — the at-least-once-delivery shape
    * streaming dedup exists for; 1 for the ordinary stream. */
  /** Staged stream-source dirs built once per (kind, fixture, copies)
    * per JVM — round-9 verdict item 5: every gate invocation (5 gates ×
    * bench reps) re-ran its source staging (a max-timestamp job plus
    * one or two single-file Spark writes for the sentinel recipes),
    * billing harness setup to the engine. The staged content is a pure
    * function of the key — fixture dirs are immutable for the life of
    * the JVM (the [[graft.Staging]] contract) and the dir name embeds
    * this JVM's pid — so the memo is sound; only the first gate pays. */
  /** Per-key lazy cell: `computeIfAbsent` only allocates the cell (fast,
    * inside the CHM bin lock), and the multi-second Spark staging job
    * runs under the CELL's own lazy-val latch — two gates staging
    * DIFFERENT sources whose keys share a CHM bin never serialize on
    * each other's Spark jobs (CHM's contract wants short mapping
    * functions; [[graft.Staging]] uses the same discipline). */
  private final class SourceCell(thunk0: () => java.nio.file.Path) {
    // the thunk (and its captured DataFrame/session closure scope) is
    // released once the path resolves — the cell lives for the JVM
    private var thunk: () => java.nio.file.Path = thunk0
    lazy val path: java.nio.file.Path = {
      val p = thunk()
      thunk = null
      p
    }
  }

  private val stagedSources =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), SourceCell]()

  /** Resolve a memoized staged-source dir: build once per key, REFRESH
    * the dir's mtime on every access (so a live session's sources never
    * age past another JVM's 6 h stale sweep — review finding: the
    * mtime was only set at build, leaving a long-lived session's
    * sources sweepable by a CONCURRENT session even after the
    * own-dirs exclusion), and REBUILD if the dir vanished anyway (the
    * memoized path would otherwise dangle for the JVM's life). */
  private def memoSource(key: (String, String, Int))(
      build: () => java.nio.file.Path): java.nio.file.Path = {
    def resolve() =
      stagedSources.computeIfAbsent(key, _ => new SourceCell(build)).path
    var p = resolve()
    if (!java.nio.file.Files.isDirectory(p)) {
      stagedSources.remove(key)
      p = resolve()
    }
    try java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: Exception => () }
    p
  }

  /** Max event-time µs of a frame, or `default` when the frame is empty
    * (the agg row's max is NULL) — shared by the sentinel/chunk stagers;
    * for a sentinel, any epoch works on an empty stream (no state to
    * flush). */
  private def maxUsOr(df: DataFrame, default: Long): Long = {
    val r = df.agg(max(unix_micros(col("ts")))).head
    if (r.isNullAt(0)) default else r.getLong(0)
  }

  def eventsStream(spark: SparkSession, dir: String, copies: Int = 1): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = Tables.table(spark, dir, "events").schema
    // FileStreamSource requires a directory source (it pins basePath to
    // the source path itself); the fixture dir mixes all tables, so stage
    // the events file alone into a per-fixture stream dir.
    val streamDir = memoSource(("copies", dir, copies))(() => {
        val p = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"),
          s"graft-stream-${copies}x-" + stagingKey(dir))
        java.nio.file.Files.createDirectories(p)
        registerGateCleanup(p) // exit-time cleanup; lives for the JVM
        (0 until copies).foreach { i =>
          java.nio.file.Files.copy(
            java.nio.file.Paths.get(dir, "events.parquet"),
            p.resolve(s"events_$i.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        p
      })
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir.toString)
    schema("ts").dataType.typeName match {
      case "long"          => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case "timestamp_ntz" => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _               => raw
    }
  }

  /** Tumbling 1-hour windowed aggregation with a 1-hour watermark —
    * streaming twin of the `events_tumbling` batch query. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** APPEND-mode tumbling aggregate over the sentinel-flushed source —
    * the emission path the Complete-mode gates don't exercise: Append
    * holds every window back until the WATERMARK passes its end, then
    * emits it exactly once (the production "stream → table, each window
    * written when closed" shape; Complete re-emits full state every
    * batch, which no 100 TB sink can absorb). The flush sentinel's
    * far-future timestamp advances the watermark past every real
    * window's end, so all of them emit and the batch oracle applies.
    * The sentinel rows need NO filter (and must not get one upstream:
    * a `user_id >= 0` predicate gets pushed below the watermark
    * operator, dropping the sentinels before they can advance event
    * time — measured as the last hour's windows never emitting): their
    * own far-future window can never close (the watermark sits delay
    * behind the sentinel, and nothing later arrives), so Append mode
    * never emits it — it parks in state for the life of the finite
    * gate, exactly like the sessionize sentinel's open session. */
  def tumblingCountsAppend(events: DataFrame): DataFrame =
    // the SAME aggregation as the Complete-mode twin — Append semantics
    // come entirely from the gate's OutputMode; delegating keeps the
    // "streaming_tumbling's oracle applies verbatim" contract impossible
    // to break by editing one copy
    tumblingCounts(events)

  /** Sliding 1-hour windows every 30 minutes — streaming twin of
    * `events_sliding`: each event lands in two windows; the window
    * assignment is the same Expand projection as in batch, and state is
    * per (window), pruned by the watermark. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("n"), col("total_value"))

  /** Stream-STATIC enrichment join + windowed aggregate — the streaming
    * twin of `events_enriched`, and the one join shape the stream-stream
    * gates don't cover: the dimension side is a bounded batch table, so
    * the join is STATELESS (each micro-batch hash-joins against the
    * static side; nothing is buffered across batches, no watermark is
    * needed to bound join state) — the standard production shape for
    * enriching an ingest with reference data. `broadcast` pins the dim
    * to the map side: at 100 TB the stream's micro-batches are large and
    * the dimension is small, exactly the asymmetry broadcast exists for
    * (a shuffled join would re-partition every micro-batch). The
    * aggregate's state is (6-hour window × segment) — bounded by key
    * cardinality, not stream length. */
  def enrichedSegmentCounts(events: DataFrame, cust: DataFrame): DataFrame =
    events
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("int"))
      .join(broadcast(cust.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "6 hours"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        sum(col("k_val")).as("k_sum"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("c_mktsegment"), col("n"), col("total_value"), col("k_sum"))

  /** Session windows (10-minute gap) per user — streaming twin of
    * `events_session`. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("session_value"))

  final case class Event(event_id: Long, user_id: Long, event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom stateful accumulation via mapGroupsWithState: per-user
    * running totals (the arbitrary-state API the built-in windows can't
    * express — SURVEY.md §7.3 ladder, step before custom operators). */
  def userRunningTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val (n, v) = batch.foldLeft((prev.n_events, prev.total_value)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value)
          }
          val next = UserRunning(uid, n, v)
          state.update(next)
          next
      }
  }

  final case class UserRunningCents(user_id: Long, n_events: Long, total_cents: Long)

  /** Oracle-parity variant of [[userRunningTotals]]: the state
    * accumulates value in integer CENTS (event values are 2-decimal by
    * contract), so the running total is exact and order-independent —
    * the same discipline the batch oracles apply by summing through
    * DECIMAL. [[userRunningTotals]] keeps the plain-double fold as the
    * API example; this one is what the driver gate runs, because a
    * float fold's result depends on arrival order and can never
    * hash-match a SQL oracle. */
  def userRunningTotalsExact(events: Dataset[Event]): Dataset[UserRunningCents] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunningCents, UserRunningCents](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserRunningCents]) =>
          val prev = state.getOption.getOrElse(UserRunningCents(uid, 0L, 0L))
          val (n, c) = batch.foldLeft((prev.n_events, prev.total_cents)) {
            case ((cn, cc), e) => (cn + 1, cc + math.round(e.value * 100))
          }
          val next = UserRunningCents(uid, n, c)
          state.update(next)
          next
      }
  }

  /** Stream-stream interval join: each purchase matched to the same
    * user's clicks from the preceding 30 minutes. Watermarks on both
    * sides bound the join state (clicks older than watermark + interval
    * are evicted) — without them a stream-stream join buffers forever. */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("click_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"))
  }

  /** Streaming exact deduplication — the streaming twin of dedup_exact's
    * "first copy wins". dropDuplicatesWithinWatermark keys state by
    * event_id and prunes entries once the watermark passes them, so
    * state is bounded by (arrival rate × watermark horizon) instead of
    * stream length — the only formulation that survives an unbounded
    * 100 TB ingest. Contract: duplicates arriving within the watermark
    * delay of the first copy are dropped; a duplicate arriving later
    * than that is either dropped as late input or re-emitted (state for
    * its key was already pruned) — the standard at-least-once-unique
    * guarantee of watermarked dedup. `delay` is therefore the RETRY
    * HORIZON the pipeline tolerates: size it to the source's maximum
    * redelivery lag (a whole-file replay needs the file's time span). */
  def dedupEvents(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))

  /** Stream-stream LEFT-OUTER interval join: every purchase emits — with
    * its same-user clicks from the preceding 30 minutes, or one row with
    * null click columns if none arrived ("purchases with no prior
    * click"). Outer semantics on streams are watermark-driven: a purchase
    * can only be declared unmatched once the watermark proves no further
    * click could still join it, so null rows are emitted late (on state
    * eviction), and purchases still inside the watermark horizon when the
    * stream ends are withheld — the same contract as every watermarked
    * outer operator. */
  def purchaseClickLeftJoin(events: DataFrame): DataFrame =
    purchaseClickOuterJoin(events, "left_outer")

  /** RIGHT-OUTER twin: every click emits — joined to the same user's
    * purchases within 30 minutes after it, or as one null-purchase row
    * ("clicks that never converted"). Null rows for unmatched CLICKS
    * need the PURCHASE-side watermark to prove no purchase can still
    * arrive, which the two-sided sentinel advances — same recipe,
    * mirrored. */
  def purchaseClickRightJoin(events: DataFrame): DataFrame =
    purchaseClickOuterJoin(events, "right_outer")

  /** FULL-OUTER twin: unmatched rows of BOTH sides survive with nulls —
    * the complete "every purchase and every click, attributed where
    * possible" ledger. State eviction on either side may emit a null
    * row, so both watermarks gate emission; the two-sided sentinel
    * closes both books. */
  def purchaseClickFullJoin(events: DataFrame): DataFrame =
    purchaseClickOuterJoin(events, "full_outer")

  private def purchaseClickOuterJoin(events: DataFrame, joinType: String): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"),
      joinType)
      .select(col("purchase_id"), col("click_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"))
  }

  final case class TsEvent(user_id: Long, ts_us: Long, value: Double)
  final case class Session(user_id: Long, session_start_us: Long, n_events: Long)

  /** Custom sessionization through flatMapGroupsWithState — the
    * arbitrary-state formulation of what `session_window` does natively
    * (events_session / sessionCounts). Shown as the escape hatch for
    * session semantics the built-in gap-window can't express (dynamic
    * gaps, max-length caps, per-session early emission). Gap fixed at
    * 10 minutes to stay comparable to the built-in twin.
    *
    * BATCH-MODE formulation: each key's full history arrives in one
    * invocation (Spark calls the function once per group on batch
    * Datasets), so sessions close correctly and the trailing session is
    * emitted immediately. On a multi-micro-batch STREAM this function
    * would need to carry the open tail session in GroupState with an
    * event-time timeout flush — use the built-in `sessionCounts`
    * (session_window) for the streaming path, which maintains that state
    * natively. */
  def sessionize(events: Dataset[TsEvent], gapUs: Long = 600000000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[TsEvent], _: GroupState[Long]) =>
          val ts = batch.map(_.ts_us).toArray.sorted
          if (ts.isEmpty) Iterator.empty
          else {
            val sessions = scala.collection.mutable.ArrayBuffer.empty[Session]
            var start = ts(0); var prev = ts(0); var n = 1L
            for (t <- ts.iterator.drop(1)) {
              if (t - prev >= gapUs) {
                sessions += Session(uid, start, n); start = t; n = 0L
              }
              prev = t; n += 1
            }
            sessions += Session(uid, start, n)
            sessions.iterator
          }
      }
  }

  final case class StampedEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class OpenSession(start_us: Long, last_us: Long, n: Long)

  /** STREAMING-mode sessionization with cross-micro-batch state: the
    * open tail session is carried in GroupState and flushed by
    * event-time timeout once the watermark passes its gap. This is the
    * correct multi-batch form of [[sessionize]] (which is batch-scoped):
    * events for one user split across micro-batches merge into one
    * session instead of two.
    *
    * Emission contract (inherent to watermark-driven state): a session
    * is emitted once the watermark passes `last event + gap`; sessions
    * still open when the stream ends may never flush. Callers that need
    * a final flush drain the source and advance the watermark (or use
    * the built-in session_window, which has the same contract).
    */
  def sessionizeStreaming(
      events: Dataset[StampedEvent],
      gapUs: Long = 600000000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapUs / 1000L
    // EventTimeTimeout requires a watermark on the input (batch mode
    // ignores it)
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[StampedEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val open = state.get
            state.remove()
            Iterator.single(Session(uid, open.start_us, open.n))
          } else {
            val ts = batch.map(e => e.ts.getTime * 1000L +
              (e.ts.getNanos / 1000L) % 1000L).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var open = state.getOption.orNull
            for (t <- ts) {
              open match {
                case null => open = OpenSession(t, t, 1L)
                case o if t - o.last_us >= gapUs =>
                  closed += Session(uid, o.start_us, o.n)
                  open = OpenSession(t, t, 1L)
                case o => open = OpenSession(o.start_us, t, o.n + 1L)
              }
            }
            if (open != null) {
              state.update(open)
              state.setTimeoutTimestamp(open.last_us / 1000L + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** (user_id, ts) stream over the events fixture whose FINAL micro-batch
    * is one far-future SENTINEL event: once that batch commits, the
    * watermark passes every real session's event-time timeout, so all
    * open [[sessionizeStreaming]] state flushes deterministically — the
    * "drain the source and advance the watermark" recipe from its
    * emission contract, packaged so a driver-gated run equals the batch
    * gaps-and-islands oracle. This is exactly how a production ingest
    * closes its books: the source emits a high-watermark control record
    * (or the job advances processing-time) past the horizon. The
    * sentinel itself (user_id = -1) is the one session the watermark
    * never passes — it stays in state, withheld; callers filter
    * `user_id >= 0` for belt and braces.
    *
    * Staged as two Spark-written single-file parquets with strictly
    * increasing mtimes (FileStreamSource orders discovered files by
    * modification time, the same property StreamingSpec pins), read in
    * ONE combined trigger — the flush only needs the sentinel's
    * watermark committed at batch end, not a batch of its own. */
  def stampedEventsWithFlushSentinel(
      spark: SparkSession, dir: String): Dataset[StampedEvent] = {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val ev = Tables.events(spark, dir).select(col("user_id"), col("ts"))
    val streamDir = memoSource(("flush", dir, 1))(() => {
        val maxUs = maxUsOr(ev, 0L)
        // past watermark delay (1 h) + session gap (10 min), with 1 h slack
        val sentinelUs = maxUs + (3600L + 600L + 3600L) * 1000000L
        val p = Paths.get(System.getProperty("java.io.tmpdir"),
          "graft-stream-flush-" + stagingKey(dir))
        Files.createDirectories(p)
        registerGateCleanup(p) // exit-time cleanup; lives for the JVM
        val now = System.currentTimeMillis()
        stageSingleFile(p, ev, "events_00.parquet", now)
        stageSingleFile(p,
          Seq((-1L, new java.sql.Timestamp(sentinelUs / 1000L)))
            .toDF("user_id", "ts"), "sentinel_01.parquet", now + 60000L)
        p
      })
    // combined trigger, same reasoning as [[eventsWithFlushSentinel]]:
    // open sessions land in state during the batch, the sentinel's
    // watermark commits at batch END, and the event-time timeouts fire
    // in the following no-data batch — the middle sentinel-only batch
    // bought nothing but its fixed cost
    spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(streamDir.toString)
      .as[StampedEvent]
  }

  /** Write `df` as ONE parquet file at `streamDir/name` with the given
    * mtime — FileStreamSource orders discovered files by modification
    * time, so the mtimes DEFINE the micro-batch sequence (the property
    * StreamingSpec pins). */
  private def stageSingleFile(streamDir: java.nio.file.Path, df: DataFrame,
      name: String, mtimeMs: Long): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val tmp = streamDir.resolve(name + ".tmpdir")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val list = Files.list(tmp)
    val part =
      try list.filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().orElseThrow()
      finally list.close()
    Files.move(part, streamDir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
    deleteTree(tmp)
    Files.setLastModifiedTime(streamDir.resolve(name),
      java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
  }

  /** Full-column events stream carrying two far-future SENTINEL events —
    * one purchase, one click — so BOTH sides of a two-sided stateful
    * operator see their watermark advance past every real row's join
    * horizon once the (single, combined) data batch commits. This extends the flush-sentinel recipe
    * ([[stampedEventsWithFlushSentinel]]) to stream-stream OUTER joins:
    * null rows for unmatched purchases emit on watermark-driven state
    * eviction, so with the sentinel committed, every real purchase's
    * fate (matched rows or one null row) is decided deterministically
    * and the batch left-interval-join oracle applies. Production shape:
    * the ingest emits a high-watermark control record on each side to
    * close the books. Sentinels carry negative ids (user_id = -1);
    * callers filter `purchase_id >= 0`. */
  def eventsWithFlushSentinel(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        col("value"))
    val streamDir = memoSource(("joinflush", dir, 1))(() => {
        val maxUs = maxUsOr(ev, 0L)
        // past watermark delay (1 h) + join interval (30 min), with 1 h slack
        val sentinelUs = maxUs + (3600L + 1800L + 3600L) * 1000000L
        val p = Paths.get(System.getProperty("java.io.tmpdir"),
          "graft-stream-joinflush-" + stagingKey(dir))
        Files.createDirectories(p)
        registerGateCleanup(p) // exit-time cleanup; lives for the JVM
        val now = System.currentTimeMillis()
        stageSingleFile(p, ev, "events_00.parquet", now)
        stageSingleFile(p,
          Seq((-1L, -1L, "purchase", new java.sql.Timestamp(sentinelUs / 1000L), 0.0),
              (-2L, -1L, "click", new java.sql.Timestamp(sentinelUs / 1000L), 0.0))
            .toDF("event_id", "user_id", "event_type", "ts", "value"),
          "sentinel_01.parquet", now + 60000L)
        p
      })
    // BOTH files in one trigger: the flush recipe needs the sentinel's
    // watermark COMMITTED after the real rows are in state, which batch
    // semantics give for free (state is added during the batch, the
    // watermark advances at batch END, eviction emits in the following
    // no-data batch) — it does NOT need the sentinel in a separate
    // batch. One combined batch + the no-data flush replaces the
    // 3-batch sequence, saving a full per-batch fixed cost (planning,
    // 4 store commits, sink commit) per gate — measured on the three
    // outer-join gates (round-11 streaming diet).
    spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(streamDir.toString)
  }

  /** Documents replayed as BASE then DELTA micro-batches — the arrival
    * order of the daily-ingest shape (`doc_id % 10 == 0` is the delta,
    * the fixture split convention dedup_incremental pins): the existing
    * corpus is in the index before today's crawl probes it. Two
    * single-file parquets with increasing mtimes at
    * maxFilesPerTrigger = 1, like [[eventsStreamChunked]]. */
  def documentsStreamBaseDelta(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val streamDir = memoSource(("docs-basedelta", dir, 1))(() => {
        val p = Paths.get(System.getProperty("java.io.tmpdir"),
          "graft-stream-docs-" + stagingKey(dir))
        Files.createDirectories(p)
        registerGateCleanup(p) // exit-time cleanup; lives for the JVM
        val now = System.currentTimeMillis()
        stageSingleFile(p, docs.filter(col("doc_id") % 10 =!= 0),
          "base_00.parquet", now)
        stageSingleFile(p, docs.filter(col("doc_id") % 10 === 0),
          "delta_01.parquet", now + 60000L)
        p
      })
    spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir.toString)
  }

  /** Streaming NEAR-duplicate candidate generation — the band-signature
    * index as KEYED STREAMING STATE (round-11 verdict item 4, gate 14):
    * every arriving document is folded to its 4 LSH band signatures by
    * the same codegen MinhashBandSigs projection the batch index uses
    * (narrow — no stateful aggregation needed to build signatures), and
    * state is keyed by (band, sig): each bucket holds the BASE doc_ids
    * seen so far, and a delta document arriving in a bucket emits one
    * candidate pair per resident — exactly the newSigs ⋈ baseSigs
    * bucket join of the batch twin (`dedup_incremental`), incrementally.
    * Delta docs are probes, not residents (delta-delta pairs are out of
    * the incremental contract), so buckets grow only with the base.
    *
    * Scale notes: state volume is the base corpus's signature index —
    * 4 rows × ~40 bytes per document, sharded by (band, sig) across
    * state-store partitions; a production ingest bounds it with an
    * event-time-timeout retention horizon (dedupe against the last N
    * days), exactly like dropDuplicatesWithinWatermark's contract.
    * Emission is immediate (Append + NoTimeout — nothing watermark-
    * held); the expensive exact verify runs OUTSIDE the stream on the
    * candidate-sized output, the standard flag-then-verify split. */
  def nearDupCandidates(docs: DataFrame): Dataset[(Long, Long)] = {
    import docs.sparkSession.implicits._
    docs
      // a NULL text has no content to index — the ingest boundary drops
      // it (the mediaTable/withNorm contract)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), (col("doc_id") % 10 === 0).as("is_delta"),
        posexplode(
          graft.functions.MinhashBandSigs.minhash_band_sigs(col("text"), 3))
          .as(Seq("band", "sig")))
      .as[(Long, Boolean, Int, String)]
      .groupByKey(t => (t._3, t._4))
      .flatMapGroupsWithState[List[Long], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, String), batch: Iterator[(Long, Boolean, Int, String)],
            state: GroupState[List[Long]]) =>
          val rows = batch.toList
          // base rows of THIS batch enter the bucket before any delta
          // row probes it, so results are independent of intra-batch
          // row order (matters if base and delta ever share a batch)
          val newBase = rows.collect { case (id, false, _, _) => id }
          val bucket =
            if (newBase.isEmpty) state.getOption.getOrElse(Nil)
            else {
              val b = (state.getOption.getOrElse(Nil) ++ newBase).distinct.sorted
              state.update(b)
              b
            }
          for {
            (newId, true, _, _) <- rows.iterator
            baseId <- bucket.iterator
          } yield (newId, baseId)
      }
  }

  /** Embeddings replayed as `chunks` micro-batches (split by
    * vec_id % chunks — any deterministic split works: the consumer's
    * per-row encode is independent of batch boundaries), single-file
    * parquets with increasing mtimes at maxFilesPerTrigger = 1 — the
    * arrival pattern of a continuous embedding ingest. */
  def embeddingsStreamChunked(spark: SparkSession, dir: String, chunks: Int): DataFrame = {
    import java.nio.file.{Files, Paths}
    val emb = Tables.embeddings(spark, dir)
    val streamDir = memoSource(("embchunks", dir, chunks))(() => {
        val p = Paths.get(System.getProperty("java.io.tmpdir"),
          s"graft-stream-emb$chunks-" + stagingKey(dir))
        Files.createDirectories(p)
        registerGateCleanup(p) // exit-time cleanup; lives for the JVM
        val now = System.currentTimeMillis()
        (0 until chunks).foreach { i =>
          stageSingleFile(p, emb.filter(pmod(col("vec_id"), lit(chunks)) === i),
            f"emb_$i%02d.parquet", now + i * 60000L)
        }
        p
      })
    spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir.toString)
  }

  /** Events replayed as `chunks` TIME-ORDERED micro-batches: the fixture
    * split into single-file parquets by equal-width ts range (computed
    * from min/max — two scalar aggregates, no global sort or window),
    * mtimes increasing so FileStreamSource delivers them in time order
    * at maxFilesPerTrigger=1 — the arrival pattern of a real ingest
    * backfill. Range-disjoint chunks preserve per-user event order
    * across batches (ties share a chunk: the rule is a half-open
    * interval on ts). */
  def eventsStreamChunked(spark: SparkSession, dir: String, chunks: Int): DataFrame = {
    import java.nio.file.{Files, Paths}
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        col("value"))
    val streamDir = memoSource(("chunks", dir, chunks))(() => {
        val mm = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head
        // empty source → both NULL (same rule as maxUsOr); a degenerate
        // [0, 0] range still stages `chunks` (empty) files, so the
        // stream runs and drains
        val (lo, hi) =
          if (mm.isNullAt(0)) (0L, 0L) else (mm.getLong(0), mm.getLong(1))
        val span = math.max(hi - lo + 1, 1L)
        val p = Paths.get(System.getProperty("java.io.tmpdir"),
          s"graft-stream-chunks$chunks-" + stagingKey(dir))
        Files.createDirectories(p)
        registerGateCleanup(p) // exit-time cleanup; lives for the JVM
        val now = System.currentTimeMillis()
        val tagged = ev.withColumn("_c",
          least(lit(chunks - 1),
            ((unix_micros(col("ts")) - lo) * chunks / span).cast("int")))
        (0 until chunks).foreach { i =>
          stageSingleFile(p, tagged.filter(col("_c") === i).drop("_c"),
            f"events_$i%02d.parquet", now + i * 60000L)
        }
        p
      })
    spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir.toString)
  }

  /** CDC-style streaming UPSERT sink: maintain a materialized
    * latest-event-per-user table across micro-batches via foreachBatch
    * + the batch [[graft.operators.Merge]] operator — the "MERGE INTO
    * from a stream" pattern every ingest that serves current state
    * runs, here with plain versioned parquet + a pointer swap instead
    * of a lakehouse table format (same recipe, no extra dependency).
    * Per batch: reduce the batch to one candidate row per user (max of
    * the (ts_us, event_id) struct — unique, so deterministic), keep
    * only candidates that BEAT the current table's row (conditional
    * upsert: correct under ANY arrival order, not just the time-ordered
    * replay the chunked source provides — real CDC feeds deliver late
    * data), MERGE, write version v<batchId>, swap the pointer. State
    * lives in the TABLE, not in streaming state stores — this is the
    * unbounded-key regime (every user ever seen) where watermarked
    * store state would grow forever; the table is the state, and each
    * batch touches it through one key-partitioned merge join. */
  def upsertLatestPerUser(spark: SparkSession, dir: String,
      chunks: Int = 4): DataFrame =
    maintainThroughGate(eventsStreamChunked(spark, dir, chunks),
      "graft-gate-upsert-", initial = None,
      step = upsertStep,
      // no data batch ever fired (empty source): the latest-state
      // table is the empty frame with the upsert schema
      emptyResult = upsertStep(None, Tables.events(spark, dir).limit(0)))

  /** Drive a finite stream through foreachBatch, MAINTAINING a versioned
    * materialized table across micro-batches: each batch applies `step`
    * (current snapshot, batch) → next snapshot, writes version
    * v<batchId>, and swaps the pointer — the "MERGE INTO from a stream"
    * pattern every ingest that serves current state runs, here with
    * plain versioned parquet + a pointer swap instead of a lakehouse
    * table format (same recipe, no extra dependency). `initial`
    * bootstraps the table BEFORE the stream starts (the pre-existing
    * index/snapshot a maintenance feed applies to); None starts empty
    * (first batch bootstraps). State lives in the TABLE, not in
    * streaming state stores — the unbounded-key regime where
    * watermarked store state would grow forever; the table is the
    * state, and each batch touches it through one key-partitioned
    * merge join. Checkpoints ride /dev/shm via the shared gate
    * lifecycle (round-11 diet); the versioned table stays in the disk
    * gate dir, it IS the output. ONE copy of the pointer-swap plumbing,
    * shared by [[upsertLatestPerUser]] (CDC upsert) and the IVFADC
    * tombstone-delete gate (round-13: gate 16). */
  def maintainThroughGate(src: DataFrame, gatePrefix: String,
      initial: Option[DataFrame],
      step: (Option[DataFrame], DataFrame) => DataFrame,
      emptyResult: => DataFrame): DataFrame = {
    val (gate, chkRoot) = newGateDirs(
      gatePrefix + java.util.UUID.randomUUID().toString.take(8))
    // the pointer holds DataFrames: the initial snapshot is served
    // AS-IS to batch 0 (review finding: writing it to a v_init table
    // first duplicated an already-durable staged artifact, a
    // corpus-sized write per run at 100×); every post-batch version IS
    // written and re-read, so a later batch never re-executes the
    // previous merge's plan chain
    @volatile var current: Option[DataFrame] = initial
    val q = src.writeStream
      .option("checkpointLocation", chkRoot.resolve("chk").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        if (!batch.isEmpty) {
          val merged = step(current, batch.toDF())
          val out = gate.resolve(s"v$id").toString
          merged.write.mode("overwrite").parquet(out)
          current = Some(batch.sparkSession.read.parquet(out))
        }
      }
      .start()
    q.processAllAvailable()
    q.stop()
    // current is None iff initial was None and no data batch ever fired
    current.getOrElse(emptyResult)
  }

  /** A small id/key frame replayed as `chunks` micro-batches split by
    * `vec_id % chunks` — the arrival pattern of an external feed whose
    * per-row effect is batch-boundary independent (e.g. a takedown/
    * tombstone list applied to an index: deletes of distinct keys
    * commute). `tag` keys the staged source dir per semantic content
    * (the stager memo cannot see through the `ids` thunk). */
  def idsStreamChunked(spark: SparkSession, dir: String, tag: String,
      ids: => DataFrame, chunks: Int): DataFrame = {
    import java.nio.file.{Files, Paths}
    val frame = ids
    val streamDir = memoSource((s"ids-$tag", dir, chunks))(() => {
        val p = Paths.get(System.getProperty("java.io.tmpdir"),
          s"graft-stream-ids-$tag$chunks-" + stagingKey(dir))
        Files.createDirectories(p)
        registerGateCleanup(p) // exit-time cleanup; lives for the JVM
        val now = System.currentTimeMillis()
        (0 until chunks).foreach { i =>
          stageSingleFile(p, frame.filter(pmod(col("vec_id"), lit(chunks)) === i),
            f"ids_$i%02d.parquet", now + i * 60000L)
        }
        p
      })
    spark.readStream.schema(frame.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir.toString)
  }

  /** Drive a finite stream through foreachBatch, TRANSFORMING each
    * micro-batch and APPENDING the result to a gate-dir parquet table;
    * returns the final table. The append-only sibling of
    * [[upsertLatestPerUser]]'s plumbing (same /dev/shm checkpoint diet,
    * same gate-dir lifecycle): the production shape of any ingest job
    * whose per-row output is independent of batch boundaries — e.g.
    * encoding arriving vectors into a serving index with FROZEN model
    * artifacts. `emptyResult` supplies the typed empty frame when the
    * source never delivers a row. */
  def appendThroughGate(src: DataFrame, transform: DataFrame => DataFrame,
      emptyResult: => DataFrame): DataFrame = {
    val spark = src.sparkSession
    val (gate, chkRoot) = newGateDirs(
      "graft-gate-append-" + java.util.UUID.randomUUID().toString.take(8))
    val out = gate.resolve("data").toString
    @volatile var wrote = false
    val q = src.writeStream
      .option("checkpointLocation", chkRoot.resolve("chk").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        if (!batch.isEmpty) {
          transform(batch.toDF()).write.mode("append").parquet(out)
          wrote = true
        }
      }
      .start()
    q.processAllAvailable()
    q.stop()
    if (wrote) spark.read.parquet(out) else emptyResult
  }

  /** One upsert step of [[upsertLatestPerUser]], split out so the spec
    * can pin the OUT-OF-ORDER case directly: reduce a raw micro-batch
    * to one candidate per user (max (ts_us, event_id) struct — unique,
    * deterministic), keep only candidates that beat the current table's
    * row, MERGE. `base = None` bootstraps the table from the first
    * batch. A candidate TIED with the base row (same ts_us + event_id —
    * an exact redelivery) is correctly NOT an update. */
  private[graft] def upsertStep(
      base: Option[DataFrame], batch: DataFrame): DataFrame = {
    val delta = batch
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("ts_us"), col("event_id"),
          col("event_type"), col("value")).as("m"))
      .groupBy("user_id").agg(max(col("m")).as("m"))
      .select(col("user_id"), col("m.ts_us").as("ts_us"),
        col("m.event_id").as("event_id"),
        col("m.event_type").as("event_type"), col("m.value").as("value"))
    base match {
      case None => delta
      case Some(b) =>
        val newer = delta.as("d")
          .join(b.select(col("user_id"),
            struct(col("ts_us"), col("event_id")).as("bk")).as("b"),
            Seq("user_id"), "left")
          .filter(col("bk").isNull ||
            struct(col("d.ts_us").as("ts_us"),
              col("d.event_id").as("event_id")) > col("bk"))
          .select(col("user_id"), col("d.ts_us").as("ts_us"),
            col("d.event_id").as("event_id"),
            col("d.event_type").as("event_type"),
            col("d.value").as("value"))
        graft.operators.Merge
          .merge(b, newer.withColumn("op", lit("U")), "user_id")
          .drop("action")
    }
  }

  /** Recursive delete, children before parents; no-op if absent. */
  private def deleteTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }

  /** Allocate a run's gate dir and checkpoint root (on /dev/shm when
    * available — the round-9/11 checkpoint diet: a finite verification
    * run doesn't need checkpoint durability), clean and track both for
    * the shutdown hook, and sweep crashed-JVM leftovers. ONE copy of
    * the lifecycle shared by runToCompletion / upsertLatestPerUser /
    * appendThroughGate (review finding: three drifting copies, two of
    * which skipped the stale sweep). */
  private def newGateDirs(name: String): (java.nio.file.Path, java.nio.file.Path) = {
    val gate = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"), name)
    deleteTree(gate)
    java.nio.file.Files.createDirectories(gate)
    sweepStaleGateDirs()
    registerGateCleanup(gate)
    val shm = java.nio.file.Paths.get("/dev/shm")
    val chkRoot =
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) {
        val c = shm.resolve(name)
        deleteTree(c)
        registerGateCleanup(c)
        c
      } else gate
    (gate, chkRoot)
  }

  /** Gate dirs this JVM owns, deleted in one shutdown hook at exit. */
  private val gateDirsToClean =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  private lazy val gateCleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      gateDirsToClean.forEach(d => try deleteTree(d) catch { case _: Exception => () })))
  private def registerGateCleanup(dir: java.nio.file.Path): Unit = {
    gateCleanupHook
    gateDirsToClean.add(dir)
  }

  /** Delete graft-gate-* AND graft-stream-* dirs a crashed JVM left
    * behind (the staged stream-source copies are corpus-sized at 100×
    * and were otherwise never deleted — review finding). Two guards:
    * paths THIS JVM owns (`gateDirsToClean` — every gate dir, checkpoint
    * root, and memoized stream-source dir registers there) are never
    * swept regardless of age, because the stream-source memo caches the
    * path for the JVM's lifetime and its mtime is only set at build — a
    * session outliving the cutoff would otherwise sweep its own live
    * source (round-13 advice fix); everything else is age-gated (6 h
    * since last touch). A CONCURRENT session's dirs survive because it
    * keeps them fresh: memoSource refreshes the source dir's mtime on
    * EVERY access and rebuilds if the dir vanished anyway, and gate
    * dirs are per-run short-lived — so the sweep can only collect dirs
    * whose owner has been idle past the cutoff, and even that owner
    * self-heals on its next access. */
  private[graft] def sweepStaleGateDirs(): Unit = {
    val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
    val roots = Seq(
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")),
      java.nio.file.Paths.get("/dev/shm")) // checkpoint roots live here too
    for (root <- roots if java.nio.file.Files.isDirectory(root)) {
      val list = java.nio.file.Files.list(root)
      try list.filter { p =>
          val n = p.getFileName.toString
          (n.startsWith("graft-gate-") || n.startsWith("graft-stream-")) &&
            !gateDirsToClean.contains(p)
        }
        .filter(p =>
          try java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff
          catch { case _: Exception => false })
        .forEach(p => try deleteTree(p) catch { case _: Exception => () })
      finally list.close()
    }
  }

  /** Drive a streaming DataFrame to completion against the (finite) file
    * source and return the final result via a named memory sink.
    *
    * `awaitWatermarkOutput = false` skips the no-data-batch drain: pass
    * it for operators whose EMISSION is not watermark-driven (stateful
    * dedup, inner joins, Update-mode state emission) — they emit in the
    * arriving micro-batch and only use the watermark to BOUND state, so
    * the table is final once processAllAvailable returns. Operators that
    * hold rows back behind the watermark (append-mode windowed aggs,
    * outer-join nulls, event-time timeouts) must keep the default. */
  def runToCompletion(df: DataFrame, name: String, mode: OutputMode,
      awaitWatermarkOutput: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    // Sink choice is a SCALE decision, not a convenience one. Append-mode
    // streams (dedup-on-ingest, sessionize, stream-stream join) emit
    // row volume proportional to the INPUT — a memory sink would
    // accumulate all of it on the driver heap (measured: the 100×
    // dedup stream emits 10M rows; driver-side accumulation + GC was a
    // large share of its wall-clock, docs/SCALING.md round-6 table).
    // So Append goes through the file sink + read-back: the exact shape
    // a production ingest runs (stream → table → downstream readers),
    // with nothing driver-resident. Complete/Update modes stay on the
    // memory sink: the file sink doesn't support them, and the gated
    // Complete/Update queries emit state-sized (small) tables — window
    // aggregates, per-user totals — where driver residency is bounded
    // by key cardinality, not stream length.
    val fileSink = mode == OutputMode.Append()
    // Checkpoint I/O is per-micro-batch fsync-heavy (offsets, commits,
    // and the state store's delta/snapshot files) — on RAM-backed
    // /dev/shm when available (round-9 verdict item 5: the five
    // stateful gates spent a measured chunk of their wall-clock in
    // checkpoint durability the GATE does not need: a finite
    // verification run re-runs from scratch on any failure; production
    // points checkpointLocation at durable storage precisely because it
    // wants the recovery the gate doesn't). RAM residency is bounded by
    // STATE size (watermark horizon × key width — the 100× gate's join
    // state checkpoints are a few hundred MB against /dev/shm's
    // half-of-RAM default), never by sink volume: the data sink stays
    // on disk. Falls back to the disk gate dir when /dev/shm is absent.
    // A stale gate dir would make the sink's metadata log + checkpoint
    // treat this run's batches as already committed (and emit nothing),
    // so the gate always starts from scratch. Gate names are UUID-
    // suffixed per run, so this run's dirs are also swept: by shutdown
    // hook at JVM exit (the read-back DataFrame below is only valid
    // within this JVM) plus a stale-dir sweep for dirs a crashed JVM
    // left behind — without both, every Append gate leaks its full
    // output (input-sized at 100×) into tmpdir across bench reps/rounds.
    // Both behaviors live in the shared newGateDirs lifecycle; the
    // memory-sink modes need no dirs (no checkpointLocation is set).
    val (outDir, chkRoot) =
      if (fileSink) newGateDirs(s"graft-gate-$name")
      else {
        val p = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), s"graft-gate-$name")
        (p, p)
      }
    // phase timings on stderr under SPARK_GRAFT_STREAM_DEBUG — the gate
    // profiling knob (start / drain / watermark-wait / stop attribution)
    val dbg = sys.env.contains("SPARK_GRAFT_STREAM_DEBUG")
    var tMark = System.nanoTime()
    def mark(phase: String): Unit = if (dbg) {
      val now = System.nanoTime()
      System.err.println(f"[gate $name] $phase ${(now - tMark) / 1e9}%.2fs")
      tMark = now
    }
    val q = (if (fileSink)
      df.writeStream
        .outputMode(mode)
        .format("parquet")
        .option("path", outDir.resolve("data").toString)
        .option("checkpointLocation", chkRoot.resolve("chk").toString)
    else
      df.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)).start()
    mark("start")
    q.processAllAvailable()
    mark("drain")
    // watermark-driven emissions (outer-join nulls, event-time timeouts)
    // fire in the NO-DATA micro-batch scheduled after the last data batch
    // commits its watermark — and processAllAvailable only waits for
    // data. "Watermark stable across N polls" alone is NOT evidence that
    // batch ran (lastProgress keeps reporting the pre-advance watermark
    // while it is still pending), so the primary exit is direct evidence
    // in recentProgress: a completed batch with numInputRows == 0, a
    // batchId beyond the last data batch, and the final watermark. When
    // the last data batch didn't advance the watermark Spark schedules
    // no such batch (and nothing is newly due), so a stability exit
    // remains as fallback — gated behind a minimum grace period so a
    // loaded machine can't blow through it in ~1 s of quick polls.
    // Queries with no watermark never report one and exit after two
    // quick polls. Complete mode skips the wait entirely: it re-emits
    // FULL state every batch, so nothing is held back behind the
    // watermark and the table is final once processAllAvailable returns.
    if (mode != OutputMode.Complete() && awaitWatermarkOutput) {
      import org.apache.spark.sql.streaming.StreamingQueryProgress
      def wmOf(p: StreamingQueryProgress): String =
        Option(p.eventTime.get("watermark")).getOrElse("")
      val t0 = System.nanoTime()
      val deadline = t0 + 20L * 1000 * 1000 * 1000
      val graceNs = 2L * 1000 * 1000 * 1000
      var last = ""
      var stable = 0
      var done = false
      var polls = 0
      while (!done && System.nanoTime() < deadline) {
        // adaptive cadence: the no-data batch usually commits within
        // tens of ms of the last data batch, so poll fast first and
        // back off to 250 ms only if it hasn't shown up
        Thread.sleep(if (polls < 4) 50 else 250)
        polls += 1
        q.processAllAvailable()
        val ps = q.recentProgress.toSeq
        if (!ps.exists(p => wmOf(p).nonEmpty)) {
          // unwatermarked query: nothing can be held back
          stable += 1
          done = stable >= 2
        } else {
          val lastDataBatch =
            ps.filter(_.numInputRows > 0).map(_.batchId).foldLeft(-1L)(_ max _)
          val curWm = ps.maxByOption(_.batchId).map(wmOf).getOrElse("")
          val noDataBatchRan = curWm.nonEmpty && ps.exists(p =>
            p.numInputRows == 0 && p.batchId > lastDataBatch && wmOf(p) == curWm)
          if (curWm == last) stable += 1 else { stable = 0; last = curWm }
          done = noDataBatchRan ||
            (stable >= 4 && System.nanoTime() - t0 >= graceNs)
        }
      }
    }
    mark("wm-wait")
    q.stop()
    mark("stop")
    if (fileSink)
      spark.read.schema(df.schema).parquet(outDir.resolve("data").toString)
    else spark.table(name)
  }
}
