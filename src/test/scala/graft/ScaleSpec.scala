package graft

import graft.operators.SkewTools
import org.apache.spark.sql.functions._

/** Scale-technique specs: bucketed co-located joins, salted skew joins,
  * approximate aggregates — the 100 TB levers, exercised for correctness
  * and for the physical-plan property that makes them worth using. */
class ScaleSpec extends GraftSuite {

  test("bucketed tables join without a shuffle (co-located sort-merge)") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // skew: 90% of left rows share one key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val right = (1L to 2000L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k"))
      .select("k", "payload", "name").collect().map(_.mkString("|")).sorted
    val salted = SkewTools.saltedJoin(left, right, Seq("k"), col("payload"), 8)
      .select("k", "payload", "name").collect().map(_.mkString("|")).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("join_salted_skew (driver surface) equals the plain-join aggregate") {
    val saltedDf = q("join_salted_skew")
    val salted = saltedDf.collect().map(_.mkString("|"))
    // the query scopes autoBroadcastJoinThreshold=-1 to its cloned
    // session so the salted SORT-MERGE path actually executes at fixture
    // scale (otherwise the 8×-replicated dim broadcasts and the salt
    // machinery is dead code in the gated plan)
    val plan = saltedDf.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"salt path not exercised:\n$plan")
    assert(plan.contains("__salt"), s"join keys not salted:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"dim side still broadcast:\n$plan")
    val plain = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy(col("c_mktsegment"), col("event_type"))
      .collect().map(_.mkString("|"))
    assert(salted.nonEmpty)
    assert(salted.toSeq == plain.toSeq)
  }

  test("AQE skew-join splits the hot partition at runtime (zero-code salting)") {
    // the 100 TB default: let AQE detect the oversized shuffle partition
    // from runtime stats and split it, replicating the matching build-side
    // rows — no __salt column, no code. Thresholds lowered so the
    // detector fires at fixture scale (production keeps the defaults:
    // 256 MB threshold, 5× median factor).
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", 4)
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    // AQE coalescing would merge the small partitions and skew the
    // median; keep it on (production shape) — the hot key dwarfs it
    import ss.implicits._
    val hot = "x" * 64
    val left = (1 to 100000)
      .map(i => (if (i % 20 == 0) i.toLong % 1000 else 7L, hot + i))
      .toDF("k", "payload")
    val right = (0L until 1000L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val joined = left.join(right, Seq("k"))
    // execute THIS DataFrame (count() would plan a separate aggregate and
    // leave joined's own AQE plan unfinalized), then read the final plan
    val n = joined.collect().length
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skewed"), // AQEShuffleRead marks the split reader
      s"AQE skew split did not fire:\n$plan")
    assert(n == 100000) // every left row matches exactly one dim row
  }

  test("dynamic partition pruning: a dim filter prunes the fact scan at runtime") {
    // THE 100 TB scan-cost lever: the fact is laid out by a partition
    // key; a selective filter on the joined dim becomes a runtime
    // IN-subquery on the fact's PARTITION column, so pruned partitions
    // are never read — visible as `dynamicpruning` in PartitionFilters.
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString + "/fact"
    Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(dir)
    import spark.implicits._
    val years = Tables.orders(spark, sf)
      .select(year(col("o_orderdate")).as("y")).distinct()
      .collect().map(_.getInt(0)).sorted
    // the dim must be a REAL scan: an in-memory Seq collapses to a
    // LocalRelation whose filter constant-folds away before the pruning
    // rule looks for a selective predicate on the join's build side
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString + "/dim"
    years.map(y => (y, if (y % 2 == 0) "even" else "odd")).toSeq
      .toDF("y", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val fact = spark.read.parquet(dir)
    val joined = fact.join(dim.filter(col("tag") === "odd"), col("o_year") === col("y"))
    val n = joined.collect().length
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan not dynamically pruned:\n$plan")
    val want = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) % 2 === 1).count()
    assert(n == want && n > 0)
  }

  test("agg_sketch_merge: union EQUALS the single-pass sketch, ±2% of exact, deterministic") {
    val est = q("agg_sketch_merge").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // merge fidelity — now EXACT equality, not the former <1%
    // closeness: register max is associative, so the union of slice
    // register tables IS the one-pass whole-fact register table bit
    // for bit (the DataSketches sparse→dense promotion drift is gone
    // with the engine-replayable HllSketch)
    val onePass = graft.operators.HllSketch.estimates(
      graft.operators.HllSketch.registers(
        Tables.lineitem(spark, sf), lit("ALL"), col("l_orderkey")))
      .head().getDouble(1)
    assert(est("ALL") == onePass,
      s"union rollup ${est("ALL")} != one-pass sketch $onePass")
    // determinism: same data, same estimates, every run (md5-derived
    // hashes, no rand salt; exact-decimal harmonic sum)
    val rerun = q("agg_sketch_merge").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rerun == est)
    // accuracy: every slice and the rollup within 2% of exact distinct
    // (σ ≈ 1.6% at 4096 registers; the fixture sits in the
    // linear-counting regime where the estimator is far tighter)
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = Tables.lineitem(spark, sf)
      .select(col("l_orderkey")).distinct().count()
    for ((scope, e) <- est) {
      val truth = if (scope == "ALL") exactAll else exact(scope)
      assert(math.abs(e - truth) / truth < 0.02,
        s"$scope sketch estimate $e vs exact $truth")
    }
  }

  test("pipeline_length_filter: bounds are real corpus lengths covering ~90% per lang") {
    val rows = q("pipeline_length_filter").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val langCounts = Tables.documents(spark, sf).groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, p05, p95, kept, dropped) <- rows) {
      assert(p05 <= p95)
      assert(kept + dropped == langCounts(lang))
      // discrete quantiles: at least 90% of docs sit inside [p05, p95]
      // (ceil semantics can only widen the band, never narrow it)
      assert(kept.toDouble / langCounts(lang) >= 0.9,
        s"$lang kept only $kept of ${langCounts(lang)}")
      // bounds are actual observed lengths
      val lens = Tables.documents(spark, sf).filter(col("lang") === lang)
        .select(col("n_chars")).collect().map(_.getLong(0)).toSet
      assert(lens.contains(p05) && lens.contains(p95))
    }
  }

  test("events_anomaly: 3-sigma flags are rare and flagged values are true outliers") {
    val rows = q("events_anomaly").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, mean, std, nAnom) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(std > 0 && mean > 0)
      // Chebyshev: at most 1/9 beyond 3 sigma; real data is far tighter
      assert(nAnom <= n / 9, s"${r.getString(0)}: $nAnom anomalies of $n")
      if (!r.isNullAt(5))
        assert(math.abs(r.getDouble(5) - mean) > 3 * std - 1e-6)
    }
  }

  test("events_incident_overlap equals a sequential brute-force reference") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hourUs = 3600000000L
    // incidents: 4·n·nh > 5·total on hour-truncated counts
    val byHour = evs.groupBy(e => e._2 / hourUs * hourUs).view.mapValues(_.length)
    val (total, nh) = (evs.length.toLong, byHour.size.toLong)
    val incidents = byHour.filter { case (_, n) => n * nh * 4 > total * 5 }.keySet
    // sessions: 10-minute-gap islands per user
    val want = evs.groupBy(_._1).flatMap { case (u, es) =>
      val ts = es.map(_._2).sorted
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var s0 = ts.head; var prev = ts.head
      for (t <- ts.tail) {
        if (t - prev >= 600000000L) { sessions += ((s0, prev)); s0 = t }
        prev = t
      }
      sessions += ((s0, prev))
      sessions.flatMap { case (s0v, e0) =>
        val ovs = incidents.toSeq.map { h =>
          math.min(e0, h + hourUs) - math.max(s0v, h)
        }.filter(_ > 0)
        if (ovs.isEmpty) None else Some((u, s0v) -> (ovs.size.toLong, ovs.sum))
      }
    }
    val got = q("events_incident_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"got ${got.size} rows, want ${want.size}")
    assert(got.nonEmpty)
  }

  test("events_resample: gap-free hourly grid, event-count conservation, true ffill") {
    val rows = q("events_resample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    // grid completeness: per user, hours are consecutive (step 3600 s)
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val hs = rs.map(_._2).sorted
      assert(hs.zip(hs.tail).forall { case (a, b) => b - a == 3600 },
        s"user $u grid has gaps")
    }
    // conservation: resampled n_events sums to the raw event count
    assert(rows.map(_._3).sum == Tables.events(spark, sf).count())
    // gap rows exist (irregular stream) and carry n_events = 0, null
    // total, but a filled_value once any hour was observed before
    val gaps = rows.filter(r => r._3 == 0)
    assert(gaps.nonEmpty && gaps.forall(_._4.isEmpty))
    // ffill: filled_value equals the most recent non-null total_value
    rows.groupBy(_._1).foreach { case (u, rs) =>
      var lastSeen: Option[Double] = None
      rs.sortBy(_._2).foreach { r =>
        if (r._4.isDefined) lastSeen = r._4
        assert(r._5 == lastSeen, s"user $u hour ${r._2}: ffill ${r._5} != $lastSeen")
      }
    }
  }

  test("text_unigram_logprob: scores are negative and the micro-average is consistent") {
    val rows = q("text_unigram_logprob").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nTok, lp, avgMicro) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(nTok > 0 && lp < 0 && avgMicro < 0)
      // truncation toward zero: |avg_micro| <= |lp*1e6/n| < |avg_micro|+1
      val exact = math.abs(lp * 1e6 / nTok)
      assert(math.abs(avgMicro) <= exact + 1e-3 && exact < math.abs(avgMicro) + 1 + 1e-3,
        s"doc ${r.getLong(0)}: avg_micro $avgMicro vs $exact")
    }
  }

  test("approximate aggregates land within tolerance of the exact twins") {
    val approx = q("agg_approx").collect()
      .map(r => r.getString(0) -> (math.round(r.getDouble(1)), r.getDouble(2))).toMap
    val exact = q("agg_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val median = q("agg_percentile").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    for ((flag, (aParts, aMed)) <- approx) {
      assert(math.abs(aParts - exact(flag)).toDouble / exact(flag) < 0.05,
        s"$flag approx distinct $aParts vs ${exact(flag)}")
      assert(math.abs(aMed - median(flag)) <= 1.0,
        s"$flag approx median $aMed vs ${median(flag)}")
    }
  }

  test("wordcount over a directory of text files matches the parquet path (O1/O2 parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-txt")
    Tables.documents(spark, sf).select("doc_id", "text").collect().foreach { r =>
      java.nio.file.Files.writeString(dir.resolve(s"doc_${r.getLong(0)}.txt"), r.getString(1))
    }
    val fromText = _root_.graft.queries.WordCount.wordcountFromTextDir(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val fromParquet = q("wordcount").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(fromText.toSeq == fromParquet.toSeq)
  }

  test("stratified sampling by lang holds fractions with a fixed seed") {
    val docs = Tables.documents(spark, sf)
    val fractions = Map("en" -> 0.5, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.2, "zh" -> 0.2)
    val sampled = docs.stat.sampleBy("lang", fractions, seed = 42L)
    // deterministic across runs with the same seed
    val again = docs.stat.sampleBy("lang", fractions, seed = 42L)
    assert(sampled.collect().map(_.getLong(0)).toSeq ==
      again.collect().map(_.getLong(0)).toSeq)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, frac) <- fractions) {
      val got = byLang.getOrElse(lang, 0L).toDouble / total(lang)
      assert(math.abs(got - frac) < 0.15, s"$lang sampled $got vs $frac")
    }
  }

  test("data_sample_stratified is deterministic and additive (membership never flips)") {
    val a = q("data_sample_stratified").collect().map(_.getLong(0)).toSeq
    val b = q("data_sample_stratified").collect().map(_.getLong(0)).toSeq
    assert(a == b)
    assert(a.nonEmpty)
    // rates land in the right ballpark per stratum (hash buckets of 1000)
    val byLang = q("data_sample_stratified").collect()
      .map(_.getString(1)).groupBy(identity).view.mapValues(_.length).toMap
    val total = Tables.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, n) <- byLang) {
      val want = if (lang == "en") 0.5 else 0.2
      val got = n.toDouble / total(lang)
      assert(math.abs(got - want) < 0.2, s"$lang sampled $got vs $want")
    }
  }

  test("data_split is stable: assignments don't move when the corpus grows") {
    val full = q("data_split").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // recompute the split on a subset: every doc keeps its assignment,
    // so subset counts can never exceed full-corpus counts
    val half = Tables.documents(spark, sf).filter(col("doc_id") % 2 === 0)
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
      .cast("long") % 10
    val halfCounts = half.withColumn("split",
        when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test"))
      .groupBy("split", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(halfCounts.forall { case (k, n) => n <= full.getOrElse(k, 0L) })
    assert(halfCounts.nonEmpty)
  }

  test("ScaleData.alphaMap is a distinct alphabet bijection for every replica index") {
    // regression: the seeded Fisher-Yates branch (k >= 26) once looped
    // forever (missing decrement); pin termination + bijectivity + the
    // cross-shard-distinctness the isomorphic-shard property rests on
    val maps = (0 until 128).map(ScaleData.alphaMap)
    maps.foreach(m => assert(m.sorted == "abcdefghijklmnopqrstuvwxyz"))
    assert(maps.distinct.length == maps.length, "replica alphabets collide")
  }

  test("ScaleData embedding replicas past 64 preserve within-shard decimal dots exactly") {
    // the k >= 64 branch composes the rotation with sign flips; both are
    // dot-product isometries over the SAME multiset of per-term products,
    // so under the repo's decimal accumulation discipline (per-term
    // rounding to 12 dp, order-independent sum — the one every scored
    // query ranks with) each replica's pairwise dots must be BIT-identical
    // to the source's. The in-order DOUBLE dot is allowed to drift by
    // ulps under reordering — that drift is precisely what RescoreEps
    // guards in the two-phase queries, so it is not asserted here.
    val dotDec = "CAST(aggregate(zip_with(a.embedding, b.embedding, " +
      "(x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(20,12))), " +
      "CAST(0 AS DECIMAL(20,12)), " +
      "(acc, v) -> CAST(acc + v AS DECIMAL(20,12))) AS STRING)"
    def dots(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), String] =
      df.as("a").join(df.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id"), expr(dotDec))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val src = Tables.embeddings(spark, sf).limit(20)
      .select(col("vec_id"), col("embedding"))
    val want = dots(src)
    for (k <- Seq(64, 99)) {
      val shard = Tables.embeddings(spark, sf).limit(20)
        .select(col("vec_id"), expr(ScaleData.embeddingSql(k)).as("embedding"))
      val got = dots(shard)
      assert(got == want, s"replica $k broke pairwise decimal dot products")
    }
    // and the transforms themselves stay pairwise distinct to 100+
    val sqls = (0 until 128).map(ScaleData.embeddingSql)
    assert(sqls.distinct.length == sqls.length, "replica transforms collide")
  }

  test("parquet mergeSchema reads files written with evolving schemas") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/v=1")
    Seq((2L, "b", 3.5)).toDF("id", "name", "score").write.parquet(s"$dir/v=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score", "v"))
    assert(merged.count() == 2)
    assert(merged.filter(col("score").isNull).count() == 1)
  }

  test("fnv32a is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT fnv32a('abc') AS h, fnv32a('') AS h0")
      .collect().head
    assert(got.getLong(0) == 0x1a47e90bL)
    assert(got.getLong(1) == 2166136261L)
  }

  test("every graft native function is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT winnow_min('abcdefg', 5) AS wm,
        |       distinct_gram_count('abcabc', 4) AS dgc,
        |       gram_intersect_count('abcd', 'abcd', 4) AS gic,
        |       size(distinct_grams('abcabc', 4)) AS dg,
        |       size(word_shingles('a b c d', 3)) AS ws,
        |       size(simhash_chunks('hello world')) AS sc,
        |       size(minhash_band_sigs('a b c d', 3)) AS mbs,
        |       float_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |                 CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS fd,
        |       decimal_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |                   CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS dd,
        |       size(hyperplane_buckets(
        |         CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>), 4, 4)) AS hb,
        |       size(token_window_hashes('a b c d', 3)) AS twh,
        |       nfc_normalize('café') AS nfc""".stripMargin)
      .collect().head
    assert(r.getString(0).matches("[0-9a-f]{32}"))
    assert(r.getInt(1) == 3) // abca, bcab, cabc
    assert(r.getInt(2) == 1)
    assert(r.getInt(3) == 3)
    assert(r.getInt(4) == 2) // "a b c", "b c d"
    assert(r.getInt(5) == 4)
    assert(r.getInt(6) == 4)
    assert(r.getDouble(7) == 11.0)
    assert(r.getDecimal(8) == new java.math.BigDecimal("11.000000000000"))
    assert(r.getInt(9) == 4)
    assert(r.getInt(10) == 2) // "a b c", "b c d"
    assert(r.getString(11) == "café") // composed
  }

  test("ScaleData single-file fixtures split: row groups capped, not one monolith") {
    // Parquet splits at row-group granularity: a single coalesced writer
    // at the default 128 MB block size once gave the 10M-row events file
    // 2 row groups, capping every batch scan of it at 2 working tasks
    // (events_enriched spent 16.6 s JSON-parsing 8M rows in one task).
    // Guard the 8 MB cap by writing ~25 MB and counting row groups.
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-rgtest")
      .resolve("one.parquet").toString
    // ~25 MB uncompressed of incompressible-ish data (seeded md5 chains)
    ScaleData.writeSingleFile(
      spark.range(0, 200000).select(
        $"id",
        md5(concat_ws("-", $"id", lit("a"))).as("a"),
        md5(concat_ws("-", $"id", lit("b"))).as("b"),
        md5(concat_ws("-", $"id", lit("c"))).as("c")), out)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(out),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val (groups, rows) =
      try (reader.getFooter.getBlocks.size, reader.getRecordCount)
      finally reader.close()
    assert(rows == 200000L)
    assert(groups >= 2,
      s"single-file fixture wrote $groups row group(s) — scans of it cannot parallelize")
  }

  test("LSH bitsPerBand derives from corpus size (scale-safe by default)") {
    // round-7 verdict: the fixed default of 4 bits silently went
    // quadratic at 100× (~570 M candidate pairs). The derived rule must
    // reproduce the measured hand-tuned settings: fixtures → 4,
    // 10× (20 000 vectors) → 7, 100× (200 000) → 10 (docs/SCALING.md
    // "Embeddings at 100×"), and keep growing for the corpora the
    // docstring reasons about (1B → 23 bits under the 200-row target).
    import graft.queries.Similarity.bitsFor
    assert(bitsFor(500L) == 4)      // sf0.001 / sf0.01
    assert(bitsFor(2000L) == 4)     // sf0.1 — oracle-pinned fixture value
    assert(bitsFor(20000L) == 7)    // 10×
    assert(bitsFor(200000L) == 10)  // 100× — the documented-correct lever
    assert(bitsFor(1000000000L) == 23)
    // monotone, never below the 4-bit floor
    assert((1L to 20L).forall(k => bitsFor(k * 100) >= 4))
    assert(bitsFor(400000L) >= bitsFor(200000L))
  }

  test("serving shard count derives from corpus size (bounded per-shard rows)") {
    // round-8 verdict item 2: pipeline_pack / data_shuffle_global
    // hard-coded 32 shards, so per-shard window size grew linearly with
    // the corpus (at 100 TB: ~3 TB through each single-task sort). The
    // derived rule must keep the fixtures at the oracle-pinned 32, grow
    // at 100×, and bound per-shard rows at every scale.
    import graft.queries.TextAnalysis.{shardsFor, TargetDocsPerShard}
    assert(shardsFor(500L) == 32)     // sf0.01 — floor
    assert(shardsFor(5000L) == 32)    // sf0.1 — floor, oracle-pinned
    assert(shardsFor(50000L) == 32)   // 10× — still under 8k/shard at 32
    assert(shardsFor(500000L) == 64)  // 100× — the derivation kicks in
    assert(shardsFor(100000000000L) == (1 << 24)) // 10^11 docs
    // per-shard rows bounded by the target at every scale ≥ the floor
    val scales = Seq(500L, 5000L, 50000L, 500000L, 5000000L, 1000000000L, 100000000000L)
    scales.foreach { n =>
      val s = shardsFor(n)
      assert(s >= 32 && (s.toLong * TargetDocsPerShard >= n),
        s"n=$n shards=$s leaves ${n / s} rows/shard > $TargetDocsPerShard")
    }
    // monotone and always a power of two (the oracle's min(1<<b) twin
    // relies on monotonicity of the predicate in b)
    assert(scales.map(shardsFor).sliding(2).forall(p => p(0) <= p(1)))
    assert(scales.map(shardsFor).forall(s => Integer.bitCount(s) == 1))
  }

  test("QuantileSketch: exact n, bounded memory, <=2.5% rank error, 16-way merge fidelity") {
    import graft.operators.QuantileSketch
    import graft.operators.QuantileSketch.{QBuf, emptyQBuf}
    val k = QuantileSketch.DefaultK
    val sk = QuantileSketch.sketch(k)
    val un = QuantileSketch.union(k)
    // deterministic skewed stream: a Zipf-ish mix (long tail matters —
    // uniform data hides rank drift around the high percentiles)
    val n = 100000
    val values: IndexedSeq[Double] = (0 until n).map { i =>
      val u = ((i * 2654435761L) % 1000003L).toDouble / 1000003.0
      math.floor(math.pow(u, 4) * 10000) + (i % 7)
    }
    def trueRank(v: Double): Long = values.count(_ <= v).toLong
    def rankErr(qb: QBuf, q: Double): Double = {
      val est = qb.quantile(q)
      math.abs(trueRank(est).toDouble / n - q)
    }
    // single-stream sketch
    val single = values.foldLeft(emptyQBuf)((b, v) => sk.reduce(b, v))
    assert(single.n == n, s"weight not conserved: ${single.n} != $n")
    // memory bound: ~k per level, <= log2(n/k)+2 levels
    val stored = single.levels.map(_.size).sum
    val maxLevels = (math.log(n.toDouble / k) / math.log(2)).toInt + 3
    assert(single.levels.length <= maxLevels,
      s"${single.levels.length} levels > $maxLevels")
    assert(stored <= (k + 1) * maxLevels, s"$stored stored values")
    for (q <- Seq(0.5, 0.95, 0.99))
      assert(rankErr(single, q) <= 0.025,
        s"single-stream rank error at q=$q: ${rankErr(single, q)}")
    // 16-way sharded build + rollup merge (the agg_quantile_merge shape):
    // same exactness of n, same rank bound after merging
    val shards = values.grouped(n / 16 + 1).map(
      _.foldLeft(emptyQBuf)((b, v) => sk.reduce(b, v))).toList
    val merged = shards.foldLeft(emptyQBuf)((a, b) => un.reduce(a, b))
    assert(merged.n == n, s"merged weight not conserved: ${merged.n}")
    for (q <- Seq(0.5, 0.95, 0.99))
      assert(rankErr(merged, q) <= 0.025,
        s"merged rank error at q=$q: ${rankErr(merged, q)}")
    // edges: a single-value sketch answers that value at every q; union
    // with the empty sketch is the identity (same n, same quantiles)
    val one = sk.reduce(emptyQBuf, 42.0)
    assert(one.n == 1 && one.quantile(0.01) == 42.0 && one.quantile(0.99) == 42.0)
    val viaEmpty = un.merge(un.merge(emptyQBuf, single), emptyQBuf)
    assert(viaEmpty.n == single.n)
    for (q <- Seq(0.5, 0.95, 0.99))
      assert(viaEmpty.quantile(q) == single.quantile(q))
  }

  test("FreqSketch (Misra-Gries): exact under m, eps-bounded and merge-safe over it") {
    import graft.operators.FreqSketch
    import graft.operators.FreqSketch.emptyMGBuf
    val m = 64
    val sk = FreqSketch.sketch(m)
    val un = FreqSketch.union(m)
    // capped regime: vocabulary >> m — 8 planted heavy hitters over a
    // long unique-token tail
    val heavy = (0 until 8).map(i => s"hh$i")
    val stream: Seq[String] =
      heavy.flatMap(h => Seq.fill(3000)(h)) ++ (0 until 50000).map(i => s"t$i")
    val n = stream.length
    val eps = n.toDouble / (m + 1)
    // deterministic interleave so heavies aren't a prefix
    val shuffled = stream.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000003L }.map(_._1)
    val single = shuffled.foldLeft(emptyMGBuf)((b, w) => sk.reduce(b, w))
    assert(single.counts.size <= m)
    heavy.foreach { h =>
      val c = single.counts.getOrElse(h, 0L)
      assert(c >= 3000 - eps && c <= 3000,
        s"$h count $c outside [${3000 - eps}, 3000]") // 3000 > 2*eps≈1700
    }
    // 16-way sharded build + union keeps the same guarantee
    val merged = shuffled.grouped(n / 16 + 1)
      .map(_.foldLeft(emptyMGBuf)((b, w) => sk.reduce(b, w)))
      .foldLeft(emptyMGBuf)((a, b) => un.reduce(a, b))
    assert(merged.counts.size <= m)
    heavy.foreach { h =>
      val c = merged.counts.getOrElse(h, 0L)
      assert(c >= 3000 - eps && c <= 3000, s"merged $h count $c")
    }
    // exact regime: vocab <= m => counts exact and merge lossless
    val small = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ Seq.fill(3)("c")
    val exact = small.foldLeft(emptyMGBuf)((b, w) => sk.reduce(b, w))
    assert(exact.counts == Map("a" -> 100L, "b" -> 60L, "c" -> 3L))
    assert(exact.top(2) == Seq("a" -> 100L, "b" -> 60L))
  }

  test("text_freq_merge: ALL row equals the exact global top-10 on the fixture") {
    val rows = q("text_freq_merge").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val all = rows.filter(_._1 == "ALL")
    assert(all.nonEmpty && all.map(_._2).sorted.toSeq == (1 to all.length))
    // ALL counts must equal the exact corpus-wide token counts (m=64
    // exceeds the fixture vocabulary, so the sketch is in its exact
    // regime — the same claim the DuckDB oracle hash-checks at sf0.01)
    import org.apache.spark.sql.functions._
    val exact = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    all.foreach { case (_, _, tok, cnt) =>
      assert(exact(tok) == cnt, s"ALL count for '$tok': $cnt != exact ${exact(tok)}")
    }
  }

  test("agg_quantile_merge: ALL row present, exact counts, monotone percentiles") {
    val rows = q("agg_quantile_merge").collect()
    val byScope = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(byScope.contains("ALL"))
    // ALL row's n is the exact doc count = sum of the per-lang exact ns
    val perLang = byScope.view.filterKeys(_ != "ALL").values.map(_._1).sum
    assert(byScope("ALL")._1 == perLang)
    assert(byScope("ALL")._1 == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (p50, p95, p99) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p50 <= p95 && p95 <= p99, s"non-monotone percentiles in $r")
    }
  }

  test("AQE initial fan-out: sized from the fixture, fails SAFE (wide) when unreadable") {
    // round-9 advice: an unreadable fixture dir (bytes==0) must not fall
    // back to the narrow floor — that's the configuration whose 100×
    // sort spill the helper exists to prevent. Unknown size → wide
    // 8×cores (AQE coalesces the excess; the reverse has no safety net).
    assert(Tuning.initialShufflePartitions("/no/such/fixture/dir", 4) == 32)
    // real fixtures stay within [cores, 8·cores], sized by bytes/16 MiB
    val small = Tuning.initialShufflePartitions(sf, 4)
    assert(small == 4, s"tiny fixture should sit at the floor, got $small")
    val bytes = Tuning.dirBytes("/root/testdata/sf0.1")
    val expect = math.max(4L, math.min(32L,
      math.ceil(bytes.toDouble / Tuning.TargetBytesPerPartition).toLong)).toInt
    assert(Tuning.initialShufflePartitions("/root/testdata/sf0.1", 4) == expect)
  }
}
