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

  test("streaming upsert: chunked replay MERGEs to the per-user latest table") {
    val got = Streaming.upsertLatestPerUser(spark, sf, chunks = 4)
    import org.apache.spark.sql.expressions.Window
    val want = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").desc, col("event_id").desc)))
      .filter(col("rn") === 1).drop("rn")
    assert(normalize(got) == normalize(want))
    assert(want.count() > 0)
  }

  test("upsertStep: out-of-order and redelivered rows never overwrite newer state") {
    import spark.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000L)
    val base = Streaming.upsertStep(None,
      Seq((10L, 1L, "purchase", ts(5000000L), 1.0),
          (11L, 2L, "click", ts(9000000L), 2.0))
        .toDF("event_id", "user_id", "event_type", "ts", "value"))
    // late batch: user 1 OLDER event (must not win), user 1 exact
    // redelivery of the base row (tie — not an update), user 2 newer
    // (must win), user 3 unseen (insert)
    val late = Seq(
      (9L, 1L, "view", ts(1000000L), 9.0),
      (10L, 1L, "purchase", ts(5000000L), 1.0),
      (12L, 2L, "purchase", ts(9500000L), 3.0),
      (13L, 3L, "click", ts(2000000L), 4.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Streaming.upsertStep(Some(base), late)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("event_id"), r.getAs[Double]("value"))).toMap
    assert(out(1L) == (10L, 1.0), s"user 1 must keep the base row: $out")
    assert(out(2L) == (12L, 3.0), s"user 2 must take the newer row: $out")
    assert(out(3L) == (13L, 4.0), s"user 3 must insert: $out")
  }

  test("APPEND-mode tumbling windows: sentinel closes every real window, equals batch") {
    val got = Streaming.runToCompletion(
      Streaming.tumblingCountsAppend(
        Streaming.eventsWithFlushSentinel(spark, sf)),
      "tumbling_append_out", OutputMode.Append())
      .select("window_start", "event_type", "n", "total_value")
    // the sentinels' own far-future window must never emit (it can't
    // close), so the appended set equals the batch aggregate exactly
    val want = q("events_tumbling")
    assert(normalize(got) == normalize(want))
    assert(want.count() > 0)
  }

  test("stream-static enrichment equals the batch events_enriched; join is stateless broadcast") {
    val got = Streaming.runToCompletion(
      Streaming.enrichedSegmentCounts(
        Streaming.eventsStream(spark, sf), Tables.customer(spark, sf)),
      "enrich_out", OutputMode.Complete())
      .select("window_start", "c_mktsegment", "n", "total_value", "k_sum")
    val want = q("events_enriched")
    assert(normalize(got) == normalize(want))
    assert(want.count() > 0)
    // the dim side must join BROADCAST inside the micro-batch (stateless
    // — no stream-stream join state machine for reference-data joins)
    val plan = Streaming.enrichedSegmentCounts(
      Tables.events(spark, sf), Tables.customer(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("StreamingSymmetricHashJoin"))
  }

  test("stream-stream interval join equals the batch join") {
    val got = Streaming.runToCompletion(
      Streaming.purchaseClickJoin(Streaming.eventsStream(spark, sf)),
      "ssjoin_out", OutputMode.Append())
    val want = Streaming.purchaseClickJoin(Tables.events(spark, sf))
    assert(normalize(got) == normalize(want))
    assert(want.count() > 0)
  }

  test("stream-stream LEFT-OUTER interval join: watermark-driven null emission") {
    val got = Streaming.runToCompletion(
      Streaming.purchaseClickLeftJoin(Streaming.eventsStream(spark, sf)),
      "ssleft_out", OutputMode.Append()).collect()
    // batch twin (watermarks are no-ops in batch): full ground truth
    val batch = Streaming.purchaseClickLeftJoin(Tables.events(spark, sf)).collect()
    val batchMatched = batch.filterNot(_.isNullAt(1)).map(_.mkString("|")).toSet
    val batchUnmatched = batch.filter(_.isNullAt(1))
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // purchase_id -> p_us
    val gotMatched = got.filterNot(_.isNullAt(1)).map(_.mkString("|")).toSet
    val gotNullIds = got.filter(_.isNullAt(1)).map(_.getLong(0)).toSet

    // matched pairs are watermark-independent: streaming == batch exactly
    assert(gotMatched == batchMatched)
    // a null row may only appear for a genuinely unmatched purchase
    assert(gotNullIds.subsetOf(batchUnmatched.keySet),
      s"false unmatched: ${(gotNullIds -- batchUnmatched.keySet).take(5)}")
    // null emission happens once the watermark proves no click can still
    // match. The global watermark is min over BOTH sides' per-column
    // watermarks (max purchase ts, max click ts, each minus the 1h
    // delay), so bound from that minimum, minus the 30m join interval
    // and 10m slack: purchases below it MUST have been declared
    // unmatched...
    val ev = Tables.events(spark, sf)
    val maxSideUs = math.min(
      ev.filter(col("event_type") === "purchase")
        .agg(max(unix_micros(col("ts")))).head().getLong(0),
      ev.filter(col("event_type") === "click")
        .agg(max(unix_micros(col("ts")))).head().getLong(0))
    val safeUs = maxSideUs - (3600L + 1800L + 600L) * 1000000L
    val mustEmit = batchUnmatched.collect { case (pid, pus) if pus < safeUs => pid }.toSet
    assert(mustEmit.subsetOf(gotNullIds),
      s"unmatched purchases below watermark not emitted: ${(mustEmit -- gotNullIds).take(5)}")
    // ...and ones the watermark never cleared must be withheld, so the
    // streaming nulls sit between the two bounds
    assert(mustEmit.nonEmpty && gotNullIds.nonEmpty)
  }

  test("LEFT-OUTER join with flush sentinel equals the batch left join EXACTLY") {
    // the sentinel batch (one far-future purchase + one far-future click)
    // advances both sides' watermarks past every real purchase's click
    // horizon, so no state is withheld: unlike the plain-source test
    // above, the streamed result must equal the batch twin row-for-row
    val got = Streaming.runToCompletion(
      Streaming.purchaseClickLeftJoin(Streaming.eventsWithFlushSentinel(spark, sf)),
      "ssleft_flush_out", OutputMode.Append())
      .filter(col("purchase_id") >= 0)
    val want = Streaming.purchaseClickLeftJoin(Tables.events(spark, sf))
    assert(normalize(got) == normalize(want))
    // and the batch twin genuinely exercises both shapes
    assert(want.filter(col("click_id").isNull).count() > 0)
    assert(want.filter(col("click_id").isNotNull).count() > 0)
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

  test("sessionizeStreaming merges sessions across micro-batches (no splits)") {
    import spark.implicits._
    // stage events into 4 time-quartile files → 4 micro-batches
    val ev = Tables.events(spark, sf).select(col("user_id"), col("ts"))
    val bounds = ev.select(unix_micros(min(col("ts"))), unix_micros(max(col("ts"))))
      .collect().head
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val dir = java.nio.file.Files.createTempDirectory("graft-mb")
    for (i <- 0 until 4) {
      val (a, b) = (lo + (hi - lo + 1) * i / 4, lo + (hi - lo + 1) * (i + 1) / 4)
      val tmp = dir.resolve(s"stage$i")
      ev.filter(unix_micros(col("ts")) >= a && unix_micros(col("ts")) < b)
        .coalesce(1).write.parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      java.nio.file.Files.move(java.nio.file.Paths.get(part), dir.resolve(f"batch$i%02d.parquet"))
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
      .as[Streaming.StampedEvent]
    val got = Streaming.runToCompletion(
      Streaming.sessionizeStreaming(stream).toDF(), "mb_sessions", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // expected sessions computed directly from the data
    val gap = 600000000L
    val byUser = ev.select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val expected = byUser.flatMap { case (uid, rows) =>
      val ts = rows.map(_._2).sorted
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var (start, prev, n) = (ts.head, ts.head, 1L)
      for (t <- ts.tail) {
        if (t - prev >= gap) { sessions += ((uid, start, n)); start = t; n = 0L }
        prev = t; n += 1
      }
      sessions += ((uid, start, n))
      sessions
    }.toSet
    val finalSessions = byUser.map { case (uid, rows) =>
      val ts = rows.map(_._2).sorted
      // the trailing session's start: walk the same split
      var (start, prev) = (ts.head, ts.head)
      for (t <- ts.tail) { if (t - prev >= gap) start = t; prev = t }
      (uid, start)
    }.toSet

    assert(got.nonEmpty)
    // no split/corrupt sessions: everything emitted is a true session
    assert(got.subsetOf(expected),
      s"emitted non-sessions: ${(got -- expected).take(5)}")
    // every session closed by later data must have been emitted; only a
    // user's final session may be withheld (watermark/timeout contract)
    val nonFinal = expected.filterNot { case (u, s, _) => finalSessions.contains((u, s)) }
    assert(nonFinal.subsetOf(got),
      s"missing closed sessions: ${(nonFinal -- got).take(5)}")
  }

  test("sentinel-flushed sessionizeStreaming emits EVERY session (equals batch)") {
    import spark.implicits._
    // the sentinel's final micro-batch advances the watermark past every
    // real session's timeout → trailing sessions flush too, so streaming
    // equals the full batch sessionization (the driver-gate contract)
    val got = Streaming.runToCompletion(
      Streaming.sessionizeStreaming(
        Streaming.stampedEventsWithFlushSentinel(spark, sf)).toDF(),
      "flush_sessions", OutputMode.Append())
      .filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val tsEvents = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[Streaming.TsEvent]
    val want = Streaming.sessionize(tsEvents).collect()
      .map(s => (s.user_id, s.session_start_us, s.n_events)).toSet
    assert(got == want,
      s"missing: ${(want -- got).take(5)}; extra: ${(got -- want).take(5)}")
  }

  test("streaming dedup drops cross-micro-batch duplicates (one copy per event)") {
    // stage the SAME events file twice → micro-batch 2 redelivers every
    // event; dropDuplicatesWithinWatermark must emit each exactly once
    val dir = java.nio.file.Files.createTempDirectory("graft-dd")
    val src = java.nio.file.Paths.get(sf, "events.parquet")
    java.nio.file.Files.copy(src, dir.resolve("a.parquet"))
    java.nio.file.Files.copy(src, dir.resolve("b.parquet"))
    java.nio.file.Files.setLastModifiedTime(dir.resolve("b.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 2000))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = Tables.table(spark, sf, "events").schema
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val stream = schema("ts").dataType.typeName match {
      case "long"          => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case "timestamp_ntz" => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _               => raw
    }
    val got = Streaming.runToCompletion(
      Streaming.dedupEvents(stream), "dedup_out", OutputMode.Append())
    val want = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    assert(got.count() == want.count(), "each event must be emitted exactly once")
    assert(normalize(got) == normalize(want))
  }

  test("RocksDB state store opt-in runs the dedup stream end to end") {
    // the 100 TB provider (state off-heap, changelog checkpoints) is an
    // opt-in, not the default — see stateSizedSession: below the measured
    // crossover (~1M keys) per-batch snapshot overhead dominates; above
    // it the heap store's GC bimodality does (docs/SCALING.md round-6
    // table). This pins that the opt-in path actually works.
    spark.conf.set("spark.graft.streaming.stateStore", "rocksdb")
    try {
      val ss = Streaming.stateSizedSession(spark, sf)
      assert(ss.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDB"))
      val got = Streaming.runToCompletion(
        Streaming.dedupEvents(Streaming.eventsStream(ss, sf, copies = 2), "35 days"),
        "rocksdb_dedup", OutputMode.Append(), awaitWatermarkOutput = false)
      assert(got.count() == Tables.events(spark, sf).count())
    } finally spark.conf.unset("spark.graft.streaming.stateStore")
  }

  test("file-sink gate is rerunnable: same query name twice, full output twice") {
    // Append-mode gates write parquet under a name-derived tmp dir; a
    // STALE dir (sink metadata log + checkpoint from a previous run)
    // would mark this run's batches already-committed and emit NOTHING.
    // runToCompletion must start each run from scratch.
    val want = Tables.events(spark, sf).count()
    (1 to 2).foreach { i =>
      val got = Streaming.runToCompletion(
        Streaming.dedupEvents(Streaming.eventsStream(spark, sf, copies = 2), "35 days"),
        "gate_rerun", OutputMode.Append(), awaitWatermarkOutput = false)
      assert(got.count() == want, s"run $i must emit the full deduped set")
    }
  }

  test("foreachBatch sink: streamed rows land in parquet, count matches source") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fb").toString + "/out"
    val stream = Streaming.eventsStream(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").parquet(dir)
      }
      .start()
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(dir).count() == Tables.events(spark, sf).count())
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

  test("streaming near-dup ingest equals the batch incremental dedup") {
    // gate 14: the (band, sig)-keyed state store accumulates the base
    // batch's signatures, the delta batch probes them, and the verified
    // output must equal dedup_incremental row for row — candidate
    // generation moved into streaming state changes WHEN pairs surface,
    // never WHICH pairs
    def rows(name: String) = q(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val streaming = rows("streaming_dedup_near")
    val batch = rows("dedup_incremental")
    assert(streaming == batch,
      s"streaming=${streaming.size} rows, batch=${batch.size} rows, " +
        s"diff=${(streaming diff batch) ++ (batch diff streaming)}")
    assert(streaming.nonEmpty, "fixture should contain near-dup delta docs")
  }

  test("streaming index maintenance equals the batch assignment (gate 15)") {
    // per-row encoding under frozen artifacts is batch-boundary
    // independent: every indexable vector appears exactly once, codes
    // are within the sub-codebook range, and the bucket id equals the
    // batch k-means assignment (emb_kmeans runs the same margin-gated
    // argmax over the same exported centroids)
    val idx = q("streaming_index_maintain").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Seq(r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))))
    assert(idx.nonEmpty)
    assert(idx.map(_._1).distinct.length == idx.length, "duplicate vec in the index")
    assert(idx.forall(_._3.forall(c => c >= 0 && c < 16)), "code outside sub-codebook range")
    val km = q("emb_kmeans").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idx.length == km.size, "index row count differs from the batch assignment")
    idx.foreach { case (v, c, _) =>
      // .get, not apply: a key-set divergence must fail with THIS
      // message, not an opaque NoSuchElementException
      assert(km.get(v).contains(c),
        s"stream-built bucket for vec $v differs from the batch assignment (${km.get(v)} vs $c)")
    }
  }

  test("index lifecycle: stream-deleted live set and retrain rules (gate 16)") {
    // the tombstone stream MERGE-deletes must leave exactly the batch
    // anti-join alive, and both retrain rules must replay from the
    // emitted integers (the oracle replays the same arithmetic)
    val rows = q("ann_index_lifecycle").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (c, nt, nl, nd, _, _, _) =>
      assert(nd == nt - nl && nl >= 0 && nl <= nt, s"bucket $c counts inconsistent")
    }
    // per-bucket training census == the batch assignment's census
    val km = q("emb_kmeans").collect().map(r => r.getLong(0) -> r.getLong(1))
    val wantTrain = km.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r._1 -> r._2).toMap == wantTrain,
      "per-bucket n_train differs from the batch assignment census")
    // per-bucket deletions == the tombstone list intersected with the
    // assignment (label = 1 OR vec_id % 13 == 5, the takedown feed)
    val tombed = Tables.embeddings(spark, sf)
      .filter(col("label") === 1 || col("vec_id") % 13 === 5)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val wantDel = km.filter(t => tombed(t._1))
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (c, _, _, nd, _, _, _) =>
      assert(nd == wantDel.getOrElse(c, 0L),
        s"bucket $c deleted $nd, tombstone list says ${wantDel.getOrElse(c, 0L)}")
    }
    assert(rows.map(_._4).sum > 0, "fixture should tombstone at least one vector")
    // both retrain rules recomputed exactly from the emitted integers
    rows.foreach { case (c, nt, nl, nd, st, sl, retrain) =>
      val del = 6L * nd >= nt
      val drift = BigInt(50) * (BigInt(sl) * nt - BigInt(st) * nl).abs >
        BigInt(st) * nl
      assert(retrain == (del || drift),
        s"bucket $c verdict $retrain, rules say del=$del drift=$drift")
    }
  }

  test("stale sweep never deletes this JVM's live staged source dirs (age-immune)") {
    // The round-13 hazard class: sweepStaleGateDirs age-gates
    // graft-stream-* dirs at 6 h, and the memoized staged source dirs
    // live for the JVM's lifetime — a >6 h session must NOT sweep its
    // own sources. Build a source, back-date it PAST the cutoff, sweep,
    // and prove (a) the owned dir survives on ownership alone, (b) a
    // foreign stale dir IS collected, (c) a foreign fresh dir is not,
    // (d) the source still serves a gate end-to-end afterwards.
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    Streaming.eventsStream(spark, sf) // builds + registers the staged dir
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    val pid = ProcessHandle.current().pid()
    // reconstruct THIS fixture's staged-source dir name (the
    // stagingKey recipe: pid + sanitized fixture path, tail-60)
    val sane = sf.replaceAll("[^A-Za-z0-9._-]", "-").replaceAll("-+", "-")
    val tail = if (sane.length > 60) sane.substring(sane.length - 60) else sane
    val owned = tmp.resolve(s"graft-stream-1x-$pid-$tail")
    assert(Files.isDirectory(owned), s"expected staged source dir at $owned")
    val staleAge = FileTime.fromMillis(System.currentTimeMillis() - 7L * 3600 * 1000)
    Files.setLastModifiedTime(owned, staleAge)
    val foreignStale = tmp.resolve("graft-stream-spec-foreign-stale")
    val foreignFresh = tmp.resolve("graft-stream-spec-foreign-fresh")
    Files.createDirectories(foreignStale)
    Files.createDirectories(foreignFresh)
    Files.setLastModifiedTime(foreignStale, staleAge)
    try {
      Streaming.sweepStaleGateDirs()
      assert(Files.isDirectory(owned),
        "sweep deleted this JVM's own live staged source dir")
      assert(!Files.exists(foreignStale), "stale foreign dir must be collected")
      assert(Files.isDirectory(foreignFresh), "fresh foreign dir must survive")
      // the back-dated source still serves a full gate: memoSource
      // refreshes mtime on access, so the dir is re-aged below cutoff
      val got = Streaming.runToCompletion(
        Streaming.tumblingCounts(Streaming.eventsStream(spark, sf)),
        "sweep_survival", OutputMode.Complete())
      assert(got.count() > 0)
      assert(Files.getLastModifiedTime(owned).toMillis > staleAge.toMillis,
        "memo hit must refresh the source dir mtime")
    } finally {
      Files.deleteIfExists(foreignStale)
      Files.deleteIfExists(foreignFresh)
    }
  }
}
