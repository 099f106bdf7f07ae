package graft

import graft.functions.Fnv32a
import graft.operators.AsofJoin
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class OperatorsSpec extends GraftSuite {

  test("Fnv32a matches the published FNV-1a 32-bit test vectors") {
    // vectors from the FNV reference (Fowler/Noll/Vo); Go hash/fnv
    // New32a (worker.go:236) implements the same function
    assert(Fnv32a.hash(UTF8String.fromString("")) == 2166136261L)
    assert(Fnv32a.hash(UTF8String.fromString("a")) == 0xe40c292cL)
    assert(Fnv32a.hash(UTF8String.fromString("abc")) == 0x1a47e90bL)
    assert(Fnv32a.hash(UTF8String.fromString("foobar")) == 0xbf9cf968L)
  }

  test("Fnv32a codegen path agrees with interpreted eval") {
    import spark.implicits._
    val words = Seq("spark", "graft", "the", "x", "").toDF("w")
    val viaExpr = words.select(Fnv32a.fnv32a(col("w")).as("h")).collect().map(_.getLong(0))
    val expected = Seq("spark", "graft", "the", "x", "")
      .map(s => Fnv32a.hash(UTF8String.fromString(s)))
    assert(viaExpr.toSeq == expected)
  }

  test("LongBinLength equals length(bin(v)) on edges, random longs, both eval paths") {
    import spark.implicits._
    // edges: 0 (bin gives "0"), 1, powers of two ± 1 around every byte
    // boundary, the 48-bit HLL word bound, Long extremes, negatives
    // (bin renders 64-char two's complement)
    val edges = Seq(0L, 1L, 2L, 3L, 255L, 256L, (1L << 48) - 1, 1L << 48,
      Long.MaxValue, Long.MinValue, -1L, -255L)
    val rnd = new scala.util.Random(48)
    val vals = edges ++ Seq.fill(500)(rnd.nextLong()) ++
      Seq.fill(200)(rnd.nextLong() >>> 16) // the HLL 48-bit word regime
    // interpreted path
    vals.foreach { v =>
      val expect = java.lang.Long.toBinaryString(v).length
      assert(graft.functions.LongBinLength.binLength(v) == expect, s"v=$v")
    }
    // codegen path vs the SQL form it replaces, through a real plan
    val df = vals.toDF("v")
    val got = df.select(
        graft.functions.LongBinLength.long_bin_length(col("v")).as("a"),
        length(expr("bin(v)")).as("b"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("partition_fnv buckets are the reference's nReduce=4 range") {
    val rows = q("partition_fnv").collect()
    assert(rows.forall(r => r.getInt(2) >= 0 && r.getInt(2) < 4))
    // all 4 buckets used on the 31-word vocabulary
    assert(rows.map(_.getInt(2)).distinct.length == 4)
  }

  test("FloatDotProduct equals the HOF double dot product bit-for-bit") {
    import graft.functions.FloatDotProduct.float_dot
    val emb = Tables.embeddings(spark, sf).limit(50)
    val pairs = emb.select(col("vec_id").as("i"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("j"), col("embedding").as("b")))
      .filter(col("i") < col("j"))
    val viaExpr = pairs.select(float_dot(col("a"), col("b")).as("d")).collect().map(_.getDouble(0))
    val viaHof = pairs.select(
      aggregate(
        zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d")).collect().map(_.getDouble(0))
    assert(viaExpr.length == viaHof.length && viaExpr.nonEmpty)
    assert(viaExpr.zip(viaHof).forall { case (a, b) => a == b }, "bit-exact equality")
  }

  test("BpeTokenCount equals the regex token count on corpus + adversarial text") {
    import graft.functions.BpeTokenCount.bpe_token_count
    import spark.implicits._
    // the real corpus (covers zh multibyte docs) ...
    val docs = Tables.documents(spark, sf).select(col("text"))
    // ... plus hand-picked boundary cases: class transitions without
    // spaces, uppercase (falls in the single-char other class), digits
    // splitting letter runs, multibyte (2- and 3-byte) code points,
    // leading/trailing/double spaces, empty string
    val tricky = Seq("", " ", "abc", "abc123", "a1b2", "ab,cd", "A",
      "ABc", "héllo", "你好 world42", "  x  ", "a.b.c", "42", "é1é",
      "ab  cd", ",,,").toDF("text")
    for (df <- Seq(docs, tricky)) {
      val rows = df.select(
        bpe_token_count(col("text")).as("native"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("regex"),
        col("text")).collect()
      for (r <- rows)
        assert(r.getInt(0) == r.getInt(1),
          s"native=${r.getInt(0)} regex=${r.getInt(1)} for: ${r.getString(2).take(80)}")
    }
  }

  test("DecimalDotProduct equals the HOF decimal dot product bit-for-bit") {
    import graft.functions.DecimalDotProduct.decimal_dot
    val emb = Tables.embeddings(spark, sf).limit(50)
    val pairs = emb.select(col("vec_id").as("i"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("j"), col("embedding").as("b")))
      .filter(col("i") <= col("j")) // includes self-pairs: the norm case
    val viaExpr = pairs.select(decimal_dot(col("a"), col("b")).cast("string").as("d"))
      .collect().map(_.getString(0))
    // the HOF formulation this expression replaced (and which the DuckDB
    // oracle mirrors): per-term HALF_UP cast to (20,12), exact same-scale
    // accumulation — compared as strings so scale/precision match too
    val viaHof = pairs.select(
      aggregate(
        zip_with(col("a"), col("b"),
          (x, y) => (x.cast("double") * y.cast("double")).cast("decimal(20,12)")),
        lit(0).cast("decimal(20,12)"),
        (acc, v) => (acc + v).cast("decimal(20,12)")).cast("string").as("d"))
      .collect().map(_.getString(0))
    assert(viaExpr.length == viaHof.length && viaExpr.nonEmpty)
    assert(viaExpr.zip(viaHof).forall { case (a, b) => a == b }, "bit-exact equality")
  }

  test("HyperplaneBuckets equals the HOF bucketing bit-for-bit") {
    import graft.functions.HyperplaneBuckets
    val (nBands, bits) = (4, 4)
    val emb = Tables.embeddings(spark, sf).limit(100)
    val viaExpr = emb
      .select(col("vec_id"),
        HyperplaneBuckets.buckets(col("embedding"), nBands, bits).as("bk"))
      .select(col("vec_id"), posexplode(col("bk")).as(Seq("band", "bucket")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // the SQL-HOF formulation this expression replaced (and which the
    // DuckDB oracle mirrors): same planes, same fold order, same packing
    val planeCoef = expr(
      s"""transform(sequence(0, ${nBands * bits - 1}), p ->
         |  transform(sequence(0, 63), i ->
         |    CAST(conv(substr(md5(concat(CAST(p AS STRING), '_', CAST(i AS STRING))), 1, 6), 16, 10) AS DOUBLE)
         |      / 8388608.0 - 1.0))""".stripMargin)
    val viaHof = emb
      .withColumn("planes", planeCoef)
      .withColumn("band", explode(sequence(lit(0), lit(nBands - 1))))
      .withColumn("bucket", expr(
        s"""aggregate(sequence(0, ${bits - 1}), 0, (acc, j) ->
           |  acc * 2 + CASE WHEN aggregate(zip_with(planes[band * $bits + j], embedding, (c, x) -> c * CAST(x AS DOUBLE)),
           |                                CAST(0 AS DOUBLE), (a, v) -> a + v) >= 0 THEN 1 ELSE 0 END)""".stripMargin))
      .select(col("vec_id"), col("band"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(viaExpr.nonEmpty && viaExpr == viaHof)
  }

  test("asof join: every matched click is the latest at-or-before the purchase") {
    val rows = q("asof_purchase_click").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(5) >= 0)) // gap_us >= 0
    // spot-verify one row against a direct computation
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id")).collect()
    val r = rows.head
    val (uid, tsUs) = (r.getLong(1), r.getLong(2))
    val bestClick = ev.filter(e => e.getLong(0) == uid && e.getString(1) == "click"
      && e.getLong(2) <= tsUs).maxBy(_.getLong(2))
    assert(r.getLong(3) == bestClick.getLong(3), "click_id mismatch")
  }

  test("asof join plans a single shuffle (window exchange only)") {
    val df = q("asof_purchase_click")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    // one hash exchange for the window partition; the final orderBy adds
    // a range exchange but no additional hash shuffles
    assert(shuffles <= 2, s"too many shuffles ($shuffles):\n$p")
  }

  test("asof_tolerance equals the unbounded as-of filtered to the bound") {
    val bounded = q("asof_tolerance").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    val filtered = q("asof_purchase_click").collect()
      .filter(_.getLong(5) <= 900000000L)
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(5))).toSet
    assert(bounded == filtered)
    assert(bounded.forall(_._3 >= 0))
  }

  test("partition_recover: filename-derived buckets partition all tokens") {
    val rows = q("partition_recover").collect()
    // every recovered bucket is in the reference's nReduce=4 range and
    // the pair counts partition the corpus token count exactly
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 4))
    val totalPairs = rows.map(_.getLong(1)).sum
    val totalTokens = q("wordcount").agg(sum("cnt")).collect().head.getLong(0)
    assert(totalPairs == totalTokens)
    // cross-check against the O5 parity query: per-bucket distinct-word
    // counts derived from fnv buckets must agree with the recovered ones
    val viaFnv = q("partition_fnv").collect()
      .groupBy(_.getInt(2)).view.mapValues(_.length.toLong).toMap
    val viaRecover = rows.map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(viaRecover == viaFnv)
  }

  test("agg_grouping_sets: the four-set lattice is internally consistent") {
    val rows = q("agg_grouping_sets").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val total = Tables.lineitem(spark, sf).count()
    val grand = rows.filter(r => r._1 == "ALL" && r._2 == "ALL")
    assert(grand.length == 1 && grand.head._4 == total)
    val fine = rows.filter(r => r._1 != "ALL" && r._2 != "ALL")
    assert(fine.map(_._4).sum == total)
    // each one-dim margin re-aggregates the fine cells
    val byFlag = fine.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    rows.filter(r => r._1 != "ALL" && r._2 == "ALL").foreach { r =>
      assert(byFlag(r._1) == r._4, s"margin mismatch for rflag=${r._1}")
    }
  }

  test("window_distribution: quartiles and distributions are well-formed") {
    val rows = q("window_distribution").collect()
    assert(rows.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 4))
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    assert(rows.forall(r => r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))
  }

  test("ConnectedComponents labels synthetic graphs correctly") {
    import spark.implicits._
    def labelsOf(edges: Seq[(Long, Long)], key: String): Map[Long, Long] =
      operators.ConnectedComponents
        .label(spark, edges.toDF("src", "dst"), key, s"cc-spec-$key")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chain 1-2-3-4-5: worst diameter shape — all collapse to 1
    assert(labelsOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), "chain") ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    // star centered on the HIGH id: min must still win
    assert(labelsOf(Seq((9L, 2L), (9L, 4L), (9L, 6L)), "star") ==
      Map(9L -> 2L, 2L -> 2L, 4L -> 2L, 6L -> 2L))
    // two disjoint components + edge listed in both orientations
    assert(labelsOf(Seq((7L, 3L), (3L, 7L), (10L, 11L)), "twocomp") ==
      Map(7L -> 3L, 3L -> 3L, 10L -> 10L, 11L -> 10L))
    // empty graph → empty labelling (loop converges immediately)
    assert(labelsOf(Seq.empty, "empty").isEmpty)
    // adversarial 60-node path: plain neighbor-min needs 59 rounds (the
    // default bound of 50 would abort); pointer jumping must converge
    // in O(log n) — everything collapses to node 1
    val chain60 = (1L until 60L).map(i => (i, i + 1))
    val lab60 = labelsOf(chain60, "chain60")
    assert(lab60.size == 60 && lab60.values.forall(_ == 1L), lab60.take(5))
  }

  test("Merge applies update/insert/delete/keep with SQL-MERGE semantics") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    val delta = Seq(
      (2L, "b2", 22.0, "U"), // matched update
      (5L, "e", 50.0, "I"),  // unmatched insert
      (3L, "c", 30.0, "D"),  // matched delete → row removed
      (9L, "z", 0.0, "D"))   // delete of absent key → no-op
      .toDF("k", "name", "v", "op")
    val out = graft.operators.Merge.merge(base, delta, "k")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, "a", 10.0, "keep"),
      (2L, "b2", 22.0, "update"),
      (4L, "d", 40.0, "keep"),
      (5L, "e", 50.0, "insert")))
  }

  test("Merge errors on a delta key matched by multiple rows (SQL MERGE multi-match)") {
    import spark.implicits._
    val base = Seq((1L, 1.0)).toDF("k", "v")
    val dup = Seq((1L, 2.0, "U"), (1L, 3.0, "U")).toDF("k", "v", "op")
    val e = intercept[Exception] {
      graft.operators.Merge.merge(base, dup, "k").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("multiple rows")),
      s"expected the MERGE multi-match error, got: ${e.getMessage}")
  }

  test("AsofJoin.forward mirrors backward: direction, bounds, and tie rules") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000)
    val left = Seq((1L, ts(10), 100L), (1L, ts(20), 101L), (2L, ts(5), 102L))
      .toDF("k", "t", "lid").withColumnRenamed("t", "ts").withColumnRenamed("k", "key")
    // two rights share ts(15) for key 1 — the tie case; key 2's only
    // right sits BEFORE its left row, so forward drops it and backward
    // matches it — both directions' inner semantics in one fixture
    val right = Seq((1L, ts(15), 7L), (1L, ts(15), 3L), (1L, ts(30), 9L),
        (2L, ts(1), 4L))
      .toDF("k", "t", "rid").withColumnRenamed("t", "ts").withColumnRenamed("k", "key")
    val fwd = graft.operators.AsofJoin.forward(left, right, "key", "ts", Seq("rid"))
      .select(col("lid"), col("rid")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // lid 100 (ts10): earliest right >= 10 is ts15; tie 7 vs 3 → MIN id 3
    // lid 101 (ts20): earliest right >= 20 is ts30 → 9
    // lid 102 (key 2, ts5): no right at-or-after → dropped (inner)
    assert(fwd == Map(100L -> 3L, 101L -> 9L))
    val bwd = graft.operators.AsofJoin.backward(left, right, "key", "ts", Seq("rid"))
      .select(col("lid"), col("rid")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // lid 100 (ts10): latest right <= 10 — none for key1? ts15 > 10 → wait,
    // key1 rights are ts15, ts15, ts30 — none <= 10 → dropped;
    // lid 101 (ts20): latest <= 20 is ts15; tie → MAX id 7
    // lid 102 (ts5, key2): latest <= 5 is ts1 → 4
    assert(bwd == Map(101L -> 7L, 102L -> 4L))
  }

  test("Diff recovers exactly a Merge's change set (diff ∘ merge = delta)") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "name", "v")
    val delta = Seq((2L, "b2", 22.0, "U"), (3L, "c", 30.0, "D"),
      (5L, "e", 50.0, "I")).toDF("k", "name", "v", "op")
    val merged = graft.operators.Merge.merge(base, delta, "k").drop("action")
    val d = graft.operators.Diff.diff(base, merged, "k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // the diff IS the delta: U → changed, D → removed, I → added;
    // untouched keys (1, 4) never appear
    assert(d == Map(2L -> "changed", 3L -> "removed", 5L -> "added"))
    // old/new payloads sit side by side on the changed row
    val row = graft.operators.Diff.diff(base, merged, "k")
      .filter(col("k") === 2L).head()
    assert(row.getAs[String]("old_name") == "b" && row.getAs[String]("new_name") == "b2")
    assert(row.getAs[Double]("old_v") == 20.0 && row.getAs[Double]("new_v") == 22.0)
    // identical versions diff to nothing
    assert(graft.operators.Diff.diff(base, base, "k").count() == 0)
  }

  test("RangeJoin equals the naive non-equi join on every boundary case") {
    import spark.implicits._
    // values sit ON band edges (lo inclusive, hi exclusive), inside
    // bands, outside all bands, and exactly on bucket multiples
    val probe = Seq(0.0, 0.99, 1.0, 4.999, 5.0, 10.0, 19.99, 20.0,
        99.999, 100.0, 999.99, 1000.0, 1500.0, -3.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val bands = Seq((0.0, 1.0, "a"), (1.0, 5.0, "b"), (5.0, 20.0, "c"),
      (20.0, 100.0, "d"), (100.0, 1000.0, "e")).toDF("lo", "hi", "tier")
    // granularity deliberately NOT dividing the band edges (g=7)
    for (g <- Seq(0.5, 5.0, 7.0, 1000.0)) {
      val got = graft.operators.RangeJoin
        .joinByRange(probe, col("v"), bands, "lo", "hi", g)
        .select(col("id"), col("tier")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val want = probe.join(bands, col("v") >= col("lo") && col("v") < col("hi"))
        .select(col("id"), col("tier")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got == want, s"granularity $g: $got != $want")
    }
    // overlapping intervals: a probe row matches BOTH containing bands
    val overlap = Seq((0.0, 10.0, "x"), (5.0, 15.0, "y")).toDF("lo", "hi", "tier")
    val both = graft.operators.RangeJoin
      .joinByRange(Seq((1L, 7.0)).toDF("id", "v"), col("v"), overlap, "lo", "hi", 3.0)
      .collect().map(_.getAs[String]("tier")).sorted.toSeq
    assert(both == Seq("x", "y"))
  }

  test("RangeJoin guards the explosion bound and supports the shuffle path") {
    import spark.implicits._
    val probe = Seq((1L, 50.0)).toDF("id", "v")
    val bands = Seq((0.0, 100.0, "wide")).toDF("lo", "hi", "tier")
    // width/g = 1000 replicas > cap 10 → distributed raise_error, not a
    // silent driver-side broadcast explosion (round-8 advice)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val boom = intercept[Exception] {
      graft.operators.RangeJoin
        .joinByRange(probe, col("v"), bands, "lo", "hi", 0.1, maxReplication = 10L)
        .collect()
    }
    assert(messages(boom).exists(_.contains("RANGE JOIN")),
      s"expected the RANGE JOIN explosion guard, got: ${boom.getMessage}")
    // broadcastIntervals = false: same answers through a shuffle equi-join
    val got = graft.operators.RangeJoin
      .joinByRange(probe, col("v"), bands, "lo", "hi", 10.0,
        broadcastIntervals = false)
      .collect().map(_.getAs[String]("tier")).toSeq
    assert(got == Seq("wide"))
  }

  test("Diff errors on duplicate keys instead of multiplying rows") {
    import spark.implicits._
    val clean = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val dup = Seq((1L, "a"), (1L, "a2"), (2L, "b")).toDF("k", "v")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val boom = intercept[Exception] {
      graft.operators.Diff.diff(dup, clean, "k").collect()
    }
    assert(messages(boom).exists(_.contains("duplicate key")),
      s"expected the DIFF duplicate-key guard, got: ${boom.getMessage}")
    val boom2 = intercept[Exception] {
      graft.operators.Diff.diff(clean, dup, "k").collect()
    }
    assert(messages(boom2).exists(_.contains("duplicate key")),
      s"expected the DIFF duplicate-key guard on the new side, got: ${boom2.getMessage}")
  }

  test("duplicate-key guard names NULL keys instead of raising a null message") {
    // round-9 advice: concat with a NULL key made the whole raise_error
    // message NULL — the guard fired but reported nothing. NULL keys
    // can't fan out through the null-unsafe joins, but duplicate NULLs
    // in a keyed table are still a surfaced data-quality defect.
    import spark.implicits._
    val clean = Seq((Some(1L), "a")).toDF("k", "v")
    val dupNull = Seq((Option.empty[Long], "a"), (None, "b"), (Some(1L), "c"))
      .toDF("k", "v")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val boom = intercept[Exception] {
      graft.operators.Diff.diff(dupNull, clean, "k").collect()
    }
    assert(messages(boom).exists(m =>
        m.contains("duplicate key") && m.contains("NULL")),
      s"expected a NULL-naming duplicate-key message, got: ${messages(boom)}")
  }

  test("topKLong: bounded aggregator equals the window ranking, exact above 2^53") {
    import spark.implicits._
    // scores above 2^53 are NOT exactly representable as Double — the
    // whole reason the Long variant exists (a Double buffer would round
    // s and s+1 together and rank by the id tie-break instead)
    val big = (1L << 53)
    val rows: Seq[(Long, Long, Long)] = (0L until 400L).map { i =>
      val g = i % 4
      // deterministic pseudo-random-ish scores with planted adjacent
      // pairs around 2^53 that double rounding would merge
      val score = if (i % 7 == 0) big + i else (i * 2654435761L) % 100000L
      (g, score, i)
    }
    val k = 5
    val got = rows.toDF("g", "v", "id")
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.operators.TopK.topKLong(k).toColumn.name("top"))
      .collect()
      .map { case (g, top) => g -> top.toList }.toMap
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sortBy(p => (-p._1, p._2)).take(k).toList
    }
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("topKLong: array buffer equals reference sort under duplicates and any merge split") {
    // round-16 pin for the mutable-array buffer rewrite (the List
    // buffer's O(k) per-insert rebuild dominated agg_approx's k = 1024
    // sample): randomized inputs with planted exact (v, id) duplicates,
    // driven through reduce/merge directly, must equal the reference
    // (v desc, id asc) sort at every buffer state
    import graft.operators.TopK
    val rnd = new scala.util.Random(16)
    for (k <- Seq(1, 3, 64); trial <- 1 to 20) {
      val agg = TopK.topKLong(k)
      val n = rnd.nextInt(300)
      val rows = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(25).toLong))
      val expect = rows.sortBy(p => (-p._1, p._2)).take(k)
      val whole = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
      assert(whole == expect, s"k=$k reduce-only: $whole vs $expect")
      val cut = if (n == 0) 0 else rnd.nextInt(n)
      val (l, r) = rows.splitAt(cut)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      assert(merged == expect, s"k=$k merge at $cut: $merged vs $expect")
    }
  }

  test("kMinDistinct: duplicates collapse, merges are set k-mins, order-independent") {
    import graft.operators.TopK
    val agg = TopK.kMinDistinct(8)
    def build(vs: Seq[Long]) = vs.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    val vs = Seq(5L, 3L, 5L, 9L, 1L, 3L, 14L, 2L, 2L, 11L, 7L, 20L, 6L, 8L, 10L)
    val expect = vs.distinct.sorted.take(8)
    assert(agg.finish(build(vs)) == expect)
    assert(agg.finish(build(vs.reverse)) == expect) // insertion order irrelevant
    // merge = k smallest of the set union, regardless of the split
    val (l, r) = vs.splitAt(6)
    assert(agg.finish(agg.merge(build(l), build(r))) == expect)
    assert(agg.finish(agg.merge(build(r), build(l))) == expect)
    // cross-buffer duplicates collapse
    assert(agg.finish(agg.merge(build(Seq(1L, 2L, 3L)), build(Seq(2L, 3L, 4L)))) ==
      List(1L, 2L, 3L, 4L))
  }

  test("kMinDistinct: array buffer equals reference distinct-sort under any merge split") {
    // round-16 pin for the mutable-array buffer rewrite (residual item
    // 4 — the topKLong treatment applied to the KMV buffer): randomized
    // inputs dense in duplicates, driven through reduce/merge directly,
    // must equal the reference distinct-sorted k-min at every state
    import graft.operators.TopK
    val rnd = new scala.util.Random(164)
    for (k <- Seq(1, 3, 64); trial <- 1 to 20) {
      val agg = TopK.kMinDistinct(k)
      val n = rnd.nextInt(300)
      val rows = Seq.fill(n)(rnd.nextInt(60).toLong)
      val expect = rows.distinct.sorted.take(k)
      val whole = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
      assert(whole == expect, s"k=$k reduce-only: $whole vs $expect")
      val cut = if (n == 0) 0 else rnd.nextInt(n)
      val (l, r) = rows.splitAt(cut)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      assert(merged == expect, s"k=$k merge at $cut: $merged vs $expect")
    }
  }

  test("KMV overlap estimator: planted-overlap accuracy within sampling error") {
    // the estimator logic of pipeline_overlap_est, driven directly on
    // synthetic sets with KNOWN overlap: md5-style 60-bit hashes of two
    // 20k-element sets sharing an exact 25% Jaccard
    import graft.operators.TopK
    import java.security.MessageDigest
    val k = 256
    val agg = TopK.kMinDistinct(k)
    def h60(s: String): Long = {
      val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xff)) >>> 4 // 60 bits
    }
    val shared = (0 until 8000).map(i => h60(s"shared$i"))
    val onlyA = (0 until 12000).map(i => h60(s"a$i"))
    val onlyB = (0 until 12000).map(i => h60(s"b$i"))
    // true: |A|=|B|=20000, |A∩B|=8000, |A∪B|=32000, j=0.25
    val sa = onlyA.concat(shared).foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    val sb = onlyB.concat(shared).foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    val u = agg.finish(agg.merge(sa, sb))
    val saSet = agg.finish(sa).toSet
    val sbSet = agg.finish(sb).toSet
    assert(u.length == k)
    val nBoth = u.count(h => saSet.contains(h) && sbSet.contains(h))
    val jHat = nBoth.toDouble / k
    val unionHat = (k - 1).toDouble * math.pow(2, 60) / u.last.toDouble
    val sigmaJ = math.sqrt(0.25 * 0.75 / k) // ≈ 0.027
    assert(math.abs(jHat - 0.25) <= 4 * sigmaJ, s"jHat=$jHat")
    assert(math.abs(unionHat - 32000) / 32000 <= 4.0 / math.sqrt(k),
      s"unionHat=$unionHat")
    val interHat = jHat * unionHat
    assert(math.abs(interHat - 8000) / 8000 <= 0.35, s"interHat=$interHat")
  }

  test("Funnel: k-step ordering, null chaining, repeated step types") {
    import spark.implicits._
    // user 1: full a→b→a path; user 2: b before any a (step 2 must NOT
    // match it — ordering, not presence); user 3: never reaches step 1
    // (excluded entirely); user 4: step 1 only.
    val ev = Seq(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "a", 30L),
      (2L, "b", 5L), (2L, "a", 10L),
      (3L, "c", 1L),
      (4L, "a", 7L)
    ).toDF("user_id", "et", "ts")
    val out = graft.operators.Funnel.funnel(ev, col("user_id"), col("ts"),
      Seq("t1" -> (col("et") === "a"),
          "t2" -> (col("et") === "b"),
          "t3" -> (col("et") === "a"))) // repeated type: must be ≥ t2
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4))).toMap
    assert(out(1L) == ((Some(10L), Some(20L), Some(30L), 3)))
    // user 2's b at 5 precedes its first a at 10 → step 2 unmatched,
    // and the null chains: step 3 (an 'a' ≥ t2) must stay null even
    // though an 'a' exists
    assert(out(2L) == ((Some(10L), None, None, 1)))
    assert(!out.contains(3L))
    assert(out(4L) == ((Some(7L), None, None, 1)))
    // single-step funnel degenerates to first-match-per-key
    val one = graft.operators.Funnel.funnel(ev, col("user_id"), col("ts"),
      Seq("t1" -> (col("et") === "b"))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 20L, 2L -> 5L))
  }

  test("graph_pagerank: planted star ranks the hub first; mass bounded; exact integers") {
    import spark.implicits._
    // orders {1,2} and {1,3}: edges 1↔2, 1↔3 — node 1 is the hub
    val dir = java.nio.file.Files.createTempDirectory("graft-pr").toString
    Seq((100L, 1L), (100L, 2L), (200L, 1L), (200L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("graph_pagerank")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // hub strictly first; the two leaves tie by symmetry
    assert(out(1L) > out(2L) && out(2L) == out(3L), s"ranks: $out")
    // integral mass never grows (base + damped floors can only leak);
    // constants read from the engine (review finding: no stale copies)
    assert(out.values.sum <= graft.queries.Graph.Scale)
    assert(out.values.forall(_ >= graft.queries.Graph.teleportBase(3L)))
    // fixture-scale invariants on the real corpus
    val full = q("graph_pagerank").collect().map(_.getLong(1))
    assert(full.nonEmpty && full.sum <= graft.queries.Graph.Scale && full.forall(_ > 0))
  }

  test("events_scd2: versions partition each user's timeline, SCD2 invariants hold") {
    val rows = q("events_scd2").collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.values.foreach { vs =>
      val sorted = vs.sortBy(_._2)
      // versions are dense from 1
      assert(sorted.map(_._2).toSeq == (1L to sorted.length))
      // exactly one open (current) version per user — the last
      assert(vs.count(_._7) == 1 && sorted.last._7)
      // each closed version's valid_to is EXACTLY the next valid_from
      // (the timeline partitions with no gaps or overlaps)
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        val (a, b) = (pair(0), pair(1))
        assert(a._5.contains(b._4), s"gap/overlap: $a -> $b")
        // consecutive versions must differ in the tracked attribute
        // (SCD2 collapses runs)
        assert(a._3 != b._3, s"uncollapsed run: $a -> $b")
      }
    }
    // version event counts conserve the user's event total
    val evCounts = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byUser.foreach { case (u, vs) =>
      assert(vs.map(_._6).sum == evCounts(u), s"user $u event count not conserved")
    }
  }

  test("Eigen.jacobi: known spectrum, orthonormality, residual, canonical form") {
    import graft.operators.Eigen
    // hand-checkable 2×2: [[2,1],[1,2]] has eigenvalues 3 (v ∝ (1,1))
    // and 1 (v ∝ (1,-1))
    val (v2, e2) = Eigen.jacobi(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(v2(0) - 3.0) < 1e-12 && math.abs(v2(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    assert(e2(0).zip(Array(s, s)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // canonical sign: largest-|coord| positive (lowest index on ties)
    assert(e2(1)(0) > 0)
    // a larger random-but-fixed symmetric matrix: spectral invariants
    val n = 16
    val rng = new scala.util.Random(42)
    val half = Array.fill(n, n)(rng.nextDouble() - 0.5)
    val a = Array.tabulate(n, n)((i, j) => half(i)(j) + half(j)(i))
    val (vals, vecs) = Eigen.jacobi(a)
    // descending order
    assert(vals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // sum of eigenvalues = trace
    val trace = (0 until n).map(i => a(i)(i)).sum
    assert(math.abs(vals.sum - trace) < 1e-9)
    // orthonormality
    for (p <- 0 until n; q <- p until n) {
      val dot = (0 until n).map(i => vecs(p)(i) * vecs(q)(i)).sum
      assert(math.abs(dot - (if (p == q) 1.0 else 0.0)) < 1e-9, s"v$p.v$q=$dot")
    }
    // eigen residual ‖Av − λv‖ ≤ 1e-9 per component
    for (p <- 0 until n) {
      val av = (0 until n).map(i => (0 until n).map(j => a(i)(j) * vecs(p)(j)).sum)
      val res = math.sqrt((0 until n).map(i => {
        val r = av(i) - vals(p) * vecs(p)(i); r * r
      }).sum)
      assert(res < 1e-9, s"component $p residual $res")
    }
    // determinism: a second run is bit-identical
    val (vals2, vecs2) = Eigen.jacobi(a)
    assert(vals.toSeq == vals2.toSeq && vecs.map(_.toSeq).toSeq == vecs2.map(_.toSeq).toSeq)
    // infinite-theta corner (round-14 advice): a denormal off-diagonal
    // over a huge diagonal gap overflows theta itself to Inf; the
    // large-theta limit is now computed without that intermediate —
    // the sweep must stay finite and keep the spectrum
    val tiny = 1e-310
    val (vc, ec) = Eigen.jacobi(Array(Array(0.0, tiny), Array(tiny, 1e10)))
    assert(!vc.exists(_.isNaN) && !ec.flatten.exists(_.isNaN))
    assert(math.abs(vc(0) - 1e10) < 1e-3 && math.abs(vc(1)) < 1e-9)
  }

  test("agg_theta_sketch: under-full estimates ARE the exact set algebra") {
    // the sf0.001 fixture's per-year customer sets sit far under
    // k = 1024, so every estimate must degenerate to the exact distinct
    // count / intersection / difference (the query's under-full regime)
    val row = q("agg_theta_sketch").collect().head
    val out = row.schema.fieldNames.zip(row.toSeq).toMap
    val ord = Tables.orders(spark, sf)
    def custs(y: Int) = ord
      .filter(year(col("o_orderdate")) === y && col("o_custkey").isNotNull)
      .select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val c95 = custs(1995)
    val c96 = custs(1996)
    assert(c95.size < 1024 && c96.size < 1024, "fixture must be under-full")
    assert(out("est_1995") == c95.size.toDouble)
    assert(out("est_1996") == c96.size.toDouble)
    assert(out("union_est") == (c95 union c96).size.toDouble)
    assert(out("retained_est") == (c95 intersect c96).size.toDouble)
    assert(out("churned_est") == (c95 diff c96).size.toDouble)
  }

  test("KMV theta estimator: within 3 sigma past the under-full regime") {
    import graft.operators.TopK
    // same estimator arithmetic the query uses, driven past k so the
    // (k−1)·2⁶⁰/x_k branch is the one under test; hashes mirror the
    // query's md5-derived 60-bit recipe
    val k = 1024
    val n = 30000
    val agg = TopK.kMinDistinct(k)
    def h(key: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val kmin = agg.finish((1 to n).foldLeft(agg.zero)((b, i) => agg.reduce(b, h(i.toLong))))
    assert(kmin.length == k)
    val est = (k - 1).toDouble * math.pow(2.0, 60.0) / kmin.max.toDouble
    val sigma = 1.0 / math.sqrt(k - 2.0) // KMV standard error
    assert(math.abs(est / n - 1.0) <= 3 * sigma, s"est=$est n=$n")
  }
}
