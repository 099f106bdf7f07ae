package graft

import org.apache.spark.sql.functions._

class DedupSpec extends GraftSuite {

  test("dedup_exact partitions the corpus: n_copies sums to table size") {
    val total = q("dedup_exact").agg(sum("n_copies")).collect().head.getLong(0)
    assert(total == Tables.documents(spark, sf).count())
  }

  test("dedup_minhash finds the planted near-duplicate pairs") {
    val pairs = q("dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // highest-Jaccard planted pairs in sf0.001 (verified against exact
    // all-pairs Jaccard): must be recovered by 4x4 LSH banding
    for (p <- Seq((474L, 498L), (110L, 467L), (260L, 391L), (144L, 161L)))
      assert(pairs.contains(p), s"missing planted pair $p")
  }

  test("dedup_minhash jaccard values are valid and ordered pairs unique") {
    val rows = q("dedup_minhash").collect()
    assert(rows.forall(r => r.getDouble(2) >= 0.6 && r.getDouble(2) <= 1.0))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    val ids = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(ids.distinct.length == ids.length)
  }

  test("dedup_simhash pairs are a subset of near-dups by construction") {
    val rows = q("dedup_simhash").collect()
    assert(rows.forall(r => r.getInt(2) <= 3 && r.getInt(2) >= 0))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("dedup_lev_blocked verifies LSH candidates by edit distance") {
    val rows = q("dedup_lev_blocked").collect()
    assert(rows.nonEmpty, "planted near-dups should survive lev verification")
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(3) >= 0.8 && r.getDouble(3) <= 1.0))
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length)
    assert(rows.forall(r => r.getInt(2) >= 0))
  }

  test("dedup_ngram_blocked recovers planted pairs from LSH candidates") {
    val rows = q("dedup_ngram_blocked").collect()
    assert(rows.nonEmpty, "planted near-dups should survive gram verification")
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= 0.6 && r.getDouble(2) <= 1.0))
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length)
    // the same planted pairs the minhash pass finds must verify by
    // char-4-gram Jaccard too (word-shingle J≈0.9 implies high char-gram J)
    val pairSet = pairs.toSet
    for (p <- Seq((474L, 498L), (110L, 467L), (260L, 391L), (144L, 161L)))
      assert(pairSet.contains(p), s"missing planted pair $p")
  }

  test("GramSet expressions match independently computed distinct grams / intersections") {
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")).as("norm"))
      .withColumn("n", graft.functions.GramSet.distinct_gram_count(col("norm"), 4))
      .collect()
    def gset(s: String): Set[String] = if (s.length <= 4) Set(s) else s.sliding(4).toSet
    rows.foreach { r =>
      assert(r.getInt(2) == gset(r.getString(1)).size, s"doc ${r.getLong(0)}")
    }
    import spark.implicits._
    val (a, b) = (rows(0).getString(1), rows(1).getString(1))
    val inter = Seq((a, b)).toDF("a", "b")
      .select(graft.functions.GramSet.gram_intersect_count(col("a"), col("b"), 4).as("x"))
      .collect().head.getInt(0)
    assert(inter == (gset(a) & gset(b)).size)
  }

  test("DistinctGrams / WordShingles arrays equal the explode+distinct formulation") {
    val docs = Tables.documents(spark, sf)
    // char 4-grams: codegen array vs explode-positions + distinct
    val viaExpr = docs
      .select(col("doc_id"),
        explode(graft.functions.GramSet.distinct_grams(lower(col("text")), 4)).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaExplode = docs
      .withColumn("norm", lower(col("text")))
      .select(col("doc_id"), col("norm"),
        explode(sequence(lit(1), greatest(length(col("norm")) - 3, lit(1)))).as("i"))
      .select(col("doc_id"), col("norm").substr(col("i"), lit(4)).as("g"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaExpr == viaExplode)
    // word 3-shingles: codegen array vs slice/concat_ws + distinct
    val shExpr = docs
      .select(col("doc_id"),
        explode(graft.functions.GramSet.word_shingles(col("text"), 3)).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val shExplode = docs
      .withColumn("t", split(col("text"), " "))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), greatest(size(col("t")) - 2, lit(1)))).as("i"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("t"), col("i"), lit(3))).as("s"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(shExpr == shExplode)
  }

  test("MinhashBandSigs equals the explode+min-aggregate band signatures") {
    val docs = Tables.documents(spark, sf)
    val viaExpr = docs
      .select(col("doc_id"),
        posexplode(graft.functions.MinhashBandSigs.minhash_band_sigs(col("text"), 3))
          .as(Seq("band", "sig")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val viaAgg = docs
      .select(col("doc_id"),
        explode(graft.functions.GramSet.word_shingles(col("text"), 3)).as("s"))
      .select(col("doc_id"), col("s"), explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("h", md5(concat(col("band").cast("string"), lit("|"), col("s"))))
      .groupBy(col("doc_id"), col("band"))
      .agg(concat(
        min(substring(col("h"), 1, 8)), min(substring(col("h"), 9, 8)),
        min(substring(col("h"), 17, 8)), min(substring(col("h"), 25, 8))).as("sig"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(viaExpr.nonEmpty)
    assert(viaExpr == viaAgg)
  }

  test("dedup_ngram jaccard of a doc with itself-like neighbor bounded") {
    val rows = q("dedup_ngram").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("dedup_cluster is a consistent connected-components labelling of the pair graph") {
    val pairs = q("dedup_minhash").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must plant near-dup pairs")
    val lab = q("dedup_cluster").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // exactly the nodes that appear in some pair are labelled, once each
    assert(lab.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // edge consistency: both endpoints of every pair share a cluster
    for ((a, b) <- pairs)
      assert(lab(a)._1 == lab(b)._1, s"pair ($a,$b) split across clusters")
    // cluster_id is the min member id; cluster_size counts its members
    for ((cid, members) <- lab.groupBy(_._2._1)) {
      assert(members.keys.min == cid, s"cluster $cid not labelled by its min member")
      assert(members.values.forall(_._2 == members.size),
        s"cluster $cid sizes ${members.values.map(_._2).toSet} != ${members.size}")
    }
  }

  test("dedup_incremental agrees with the symmetric minhash pair set") {
    val inc = q("dedup_incremental").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // sides are what the delta/base split promises
    assert(inc.forall { case (n, b, j, m) =>
      n % 10 == 0 && b % 10 != 0 && j >= 0.6 && j <= 1.0 && m >= 1 })
    assert(inc.map(_._1).distinct.length == inc.length) // one verdict per new doc
    // compositional ground truth: dedup_minhash emits EVERY verified
    // pair (d1<d2, jaccard>=0.6) from the same blocker, so the
    // incremental answer must be exactly its delta-vs-base slice,
    // arg-maxed per new doc (max jaccard, min base_id tiebreak)
    val sym = q("dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cross = sym.flatMap { case (d1, d2, j) =>
      if (d1 % 10 == 0 && d2 % 10 != 0) Some((d1, d2, j))
      else if (d2 % 10 == 0 && d1 % 10 != 0) Some((d2, d1, j))
      else None
    }
    val expected = cross.groupBy(_._1).map { case (n, ms) =>
      val best = ms.minBy(p => (-p._3, p._2))
      (n, best._2, best._3, ms.length.toLong)
    }.toSet
    assert(inc.toSet == expected,
      s"incremental ${inc.toSet} != minhash slice $expected")
  }

  test("text_phrase_search retrieves planted occurrences through the postings index") {
    // the fixture corpus has no repeated 8-token phrase, so retrieval
    // there is self-matches only — the planted corpus exercises a real
    // hit at a non-1 position, a 7/8-token near-miss (must NOT match),
    // and a query doc shorter than one window (contributes no query)
    import spark.implicits._
    val phrase = (1 to 8).map(i => s"p$i")
    val docs = Seq(
      (0L, (phrase ++ Seq("tail1", "tail2")).mkString(" ")), // query doc
      (7L, "too short"), // < SpanK tokens: drops out of the query set
      (30L, ((1 to 4).map(i => s"u$i") ++ phrase ++ Seq("z")).mkString(" ")),
      (31L, (phrase.take(7) ++ Seq("different", "suffix", "w", "v")).mkString(" "))
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-phrase").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_phrase_search")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 0L, 1L), (0L, 30L, 5L)), s"got ${got.mkString(",")}")
  }

  test("dedup_substring: maximal cross-doc spans, islands merged, within-doc repeats ignored") {
    import spark.implicits._
    import graft.queries.Dedup.{substringSpans, tokenSpanPostings}
    def words(prefix: String, n: Int): Seq[String] =
      (1 to n).map(i => s"$prefix$i")
    val shared = words("s", 10) // a 10-token span shared by docs 1 and 2
    val docs = Seq(
      // doc 1: 5 unique tokens, the shared span, 5 unique tokens
      (1L, (words("a", 5) ++ shared ++ words("b", 5)).mkString(" ")),
      // doc 2: shared span at the very start, then unique tail
      (2L, (shared ++ words("c", 7)).mkString(" ")),
      // doc 3: an 8-token run repeated TWICE within the SAME doc only —
      //        cross-doc filter (count distinct docs >= 2) must drop it
      (3L, (words("r", 8) ++ words("x", 3) ++ words("r", 8)).mkString(" ")),
      // doc 4: shorter than one window — generates no postings at all
      (4L, words("t", 4).mkString(" "))
    ).toDF("doc_id", "text")
    val k = 4
    val out = substringSpans(tokenSpanPostings(docs, k), k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: span starts after the 5-token prefix (pos 6), exactly the
    // 10 shared tokens; doc 2: same span at pos 1. Island math: 10-token
    // span at k=4 → 7 consecutive duplicated positions → 7 + (4-1) = 10.
    assert(out.toSet == Set((1L, 6L, 10L, 2L), (2L, 1L, 10L, 2L)),
      s"got ${out.toSet}")
  }

  test("TokenWindowHashes equals the transform/slice HOF bit-for-bit (incl. edge shapes)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // crafted edges: consecutive spaces (empty tokens), leading/trailing
    // space, multibyte UTF-8, exactly-k tokens, under-k tokens, empty
    val docs = (Seq(
      "a b c d e",
      "a  b   c d e f",       // empty tokens: rejoin must re-emit the runs
      " a b c d",             // leading space = leading empty token
      "a b c d ",             // trailing space = trailing empty token
      "héllo wörld ünïcode déjà vu",
      "x y z",                // exactly k tokens at k=3
      "p q",                  // under k
      ""                      // empty doc
    ) ++ Tables.documents(spark, sf).select("text").limit(40)
      .collect().map(_.getString(0))).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (k <- Seq(3, 8)) {
      val native = docs.select(col("doc_id"),
        graft.functions.TokenWindowHashes.token_window_hashes(col("text"), k).as("hs"))
      val hof = docs
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), expr(
          s"""CASE WHEN size(toks) >= $k
             |THEN transform(sequence(1, size(toks) - ${k - 1}),
             |               i -> md5(array_join(slice(toks, i, $k), ' ')))
             |ELSE array() END""".stripMargin).as("hs"))
      val n = native.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val h = hof.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(n == h, s"k=$k mismatch: ${n.keySet.filter(id => n(id) != h(id))}")
    }
  }

  test("char-stepping codegen expressions: code-point semantics on multibyte/astral text") {
    import spark.implicits._
    import graft.functions.{GramSet, WinnowMin}
    // 2-, 3-, and 4-byte UTF-8 (é, 中, 𝄞): grams/windows must step CODE
    // POINTS (the substr semantics Spark and DuckDB share), not bytes or
    // UTF-16 units — 𝄞 is two JVM chars, the classic off-by-one source
    val samples = Seq(
      "héllo wörld", "中文 分词 测试", "a𝄞b𝄞c𝄞d𝄞e", "é", "𝄞𝄞𝄞𝄞𝄞",
      "mixed 中é𝄞 text", "", "    ", "ascii only here")
    def cps(s: String): Vector[String] =
      s.codePoints.toArray.toVector.map(cp => new String(Character.toChars(cp)))
    def gramRef(s: String, k: Int): Set[String] = {
      val c = cps(s)
      if (c.length <= k) Set(c.mkString) else c.sliding(k).map(_.mkString).toSet
    }
    def winnowRef(s: String, w: Int): String = {
      val c = cps(s)
      val wins =
        if (c.length <= w) Seq(c.mkString)
        else c.sliding(w).map(_.mkString).toSeq
      wins.map { x =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }.min
    }
    val rows = samples.toDF("t").select(col("t"),
      GramSet.distinct_gram_count(col("t"), 4).as("n"),
      GramSet.distinct_grams(col("t"), 4).as("g"),
      WinnowMin.winnow_min(col("t"), 5).as("wm"),
      GramSet.word_shingles(col("t"), 2).as("ws")).collect()
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getInt(1) == gramRef(t, 4).size, s"count on '$t'")
      assert(r.getSeq[String](2).toSet == gramRef(t, 4), s"grams on '$t'")
      assert(r.getString(3) == winnowRef(t, 5), s"winnow on '$t'")
      val toks = t.split(" ", -1)
      val shRef =
        (if (toks.length <= 2) Seq(toks.mkString(" "))
         else toks.sliding(2).map(_.mkString(" ")).toSeq).distinct.toSet
      assert(r.getSeq[String](4).toSet == shRef, s"shingles on '$t'")
    }
  }

  test("TokenWindowHashes property: equals split/rejoin-md5 reference on random strings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // alphabet stresses the byte-scan edges: spaces (incl. runs),
    // multibyte UTF-8, and ASCII; plus whole-string edge shapes
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar, 3 -> Gen.const(' '),
      1 -> Gen.oneOf('é', 'ü', '中', 'ß'))
    val strGen = Gen.frequency(
      9 -> Gen.listOf(charGen).map(_.mkString),
      1 -> Gen.const(""))
    def reference(s: String, k: Int): Seq[String] = {
      val toks = s.split(" ", -1) // Spark's split keeps trailing empties
      if (toks.length < k) Seq.empty
      else toks.sliding(k).map { w =>
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest(w.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }.toSeq
    }
    for (i <- 1 to 60; k <- Seq(1, 2, 3, 5)) {
      val s = strGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val got = graft.functions.TokenWindowHashes
        .hashes(org.apache.spark.unsafe.types.UTF8String.fromString(s), k)
        .toArray[AnyRef](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      assert(got == reference(s, k), s"k=$k on ${s.take(60).mkString}")
    }
  }

  test("pipeline_span_dedup: min-doc keeper keeps, removals consistent with the span report") {
    val spans = q("dedup_substring").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val rem = q("pipeline_span_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rem.nonEmpty, "fixture's planted near-dups must produce removals")
    rem.foreach { case (doc, nTok, nRem, pct) =>
      assert(nRem >= 8 && nRem <= nTok, s"doc $doc: removed $nRem of $nTok")
      assert(math.abs(pct - nRem.toDouble / nTok) < 1e-6)
    }
    // every doc with a removal also appears in the span report (it holds
    // a duplicated shingle), and its removal never exceeds its total
    // reported span coverage for that doc
    val spanDocs = spans.map(_._1).toSet
    assert(rem.map(_._1).toSet.subsetOf(spanDocs))
    val spanCover = spans.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    rem.foreach { case (doc, _, nRem, _) =>
      assert(nRem <= spanCover(doc),
        s"doc $doc removes $nRem > reported span coverage ${spanCover(doc)}")
    }
    // the GLOBALLY-minimal doc of the span graph is a keeper for every
    // hash it holds — it must never appear in the removal list
    val minSpanDoc = spanDocs.min
    assert(!rem.exists(_._1 == minSpanDoc),
      s"global min doc $minSpanDoc should keep all its spans")
  }

  test("dedup_substring_incremental: delta spans nest inside the full span report") {
    val inc = q("dedup_substring_incremental").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(inc.nonEmpty, "fixture should have delta docs sharing base spans")
    // delta docs only, per the split rule
    assert(inc.forall(_._1 % 10 == 0))
    assert(inc.forall(_._4 >= 1))
    // a span covered by a BASE doc is duplicated across >= 2 distinct
    // docs, so it must sit inside some span dedup_substring reports for
    // the same doc (the full report also includes delta-delta overlaps,
    // hence containment, not equality)
    val full = q("dedup_substring").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    inc.foreach { case (doc, start, len, _) =>
      val spans = full.getOrElse(doc, Array.empty)
      assert(spans.exists(s => s._2 <= start && start + len <= s._2 + s._3),
        s"inc span (doc=$doc, start=$start, len=$len) not inside any full span " +
          s"${spans.mkString(",")}")
    }
  }

  test("pipeline_overlap_est: empty split(s) still yield the one estimate row") {
    import spark.implicits._
    import java.security.MessageDigest
    // same bucket rule as the query: first 6 md5 hex chars of the doc_id
    // string, parsed base-16, mod 10
    def bucket(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(3).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 10
    }
    // (a) test split (bucket 9) empty, train nonempty; (b) BOTH empty
    val onlyTrain = (0L to 500L).filter(bucket(_) < 8).take(20)
    val neither = (0L to 5000L).filter(bucket(_) == 8).take(20)
    assert(onlyTrain.nonEmpty && neither.nonEmpty)
    for ((ids, name) <- Seq((onlyTrain, "test-empty"), (neither, "both-empty"))) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-ovl-$name").toString
      ids.map(i => (i, s"alpha beta gamma delta epsilon zeta tok$i eta theta"))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = SparkEntry.queries("pipeline_overlap_est")(spark, dir).collect()
      assert(out.length == 1,
        s"$name: expected the one estimate row (like the oracle's " +
          s"aggregate CTE), got ${out.length}")
      val r = out.head
      assert(r.getAs[Int]("n_both") == 0, s"$name: n_both")
      assert(r.getAs[Double]("jaccard_est") == 0.0, s"$name: jaccard")
      assert(r.getAs[Double]("inter_est") == 0.0, s"$name: inter")
      if (name == "both-empty")
        assert(r.getAs[Int]("n_u") == 0, s"$name: n_u")
    }
  }

  test("data_split_leakage_safe: no verified near-dup pair straddles splits") {
    import org.apache.spark.sql.functions._
    val split = q("data_split_leakage_safe")
      .select(col("doc_id"), col("split"), col("cluster_id"))
    val pairs = q("dedup_minhash").select(col("d1"), col("d2"))
    // non-vacuous: the fixture has planted near-dup pairs and at least
    // one multi-member cluster
    assert(pairs.count() > 0)
    assert(split.groupBy(col("cluster_id")).count()
      .filter(col("count") >= 2).count() > 0)
    val crossSplit = pairs
      .join(split.select(col("doc_id").as("d1"), col("split").as("s1")), Seq("d1"))
      .join(split.select(col("doc_id").as("d2"), col("split").as("s2")), Seq("d2"))
      .filter(col("s1") =!= col("s2"))
      .count()
    assert(crossSplit == 0L, s"$crossSplit near-dup pairs leak across splits")
    // and the raw-doc_id split (data_split's rule) is NOT leakage-safe
    // on the same corpus — the property is earned by cluster keying,
    // not by luck of the fixture
    val rawB = conv(substring(md5(concat(lit("split|"),
      col("doc_id").cast("string"))), 1, 6), 16, 10).cast("long") % 10
    val raw = q("data_split_leakage_safe").select(col("doc_id"),
      when(rawB < 8, "train").when(rawB === 8, "val").otherwise("test").as("split"))
    val rawCross = pairs
      .join(raw.select(col("doc_id").as("d1"), col("split").as("s1")), Seq("d1"))
      .join(raw.select(col("doc_id").as("d2"), col("split").as("s2")), Seq("d2"))
      .filter(col("s1") =!= col("s2"))
      .count()
    assert(rawCross > 0L, "fixture cannot demonstrate the leakage difference")
  }
}
