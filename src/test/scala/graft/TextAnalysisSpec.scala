package graft

import org.apache.spark.sql.functions._

class TextAnalysisSpec extends GraftSuite {

  test("WinnowMin expression equals the explode+min-aggregate formulation") {
    val docs = Tables.documents(spark, sf)
      .withColumn("norm", regexp_replace(lower(col("text")), "\\s+", " "))
    val viaExpr = docs.select(col("doc_id"),
        graft.functions.WinnowMin.winnow_min(col("norm"), 5).as("wm"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaExplode = docs
      .select(col("doc_id"), col("norm"),
        explode(sequence(lit(1), greatest(length(col("norm")) - 4, lit(1)))).as("i"))
      .withColumn("g", md5(col("norm").substr(col("i"), lit(5))))
      .groupBy(col("doc_id")).agg(min(col("g")).as("wm"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaExpr.nonEmpty)
    assert(viaExpr == viaExplode)
  }

  test("SimhashChunks expression equals the explode+64-sum aggregate formulation") {
    val docs = Tables.documents(spark, sf)
    val viaExpr = q("text_simhash").collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // the pre-round-4 formulation: explode words, md5 hex digits,
    // 64 tf-weighted SUM(CASE) bit counters, chunk-pack
    val digits = (0 to 15).map(i =>
      conv(col("h").substr(i + 1, 1), 16, 10).cast("int").as(s"d$i"))
    val bitSums = (0 to 63).map { b =>
      val bitSet = shiftright(col(s"d${b / 4}"), 3 - b % 4) % 2 === 1
      sum(when(bitSet, col("cnt")).otherwise(-col("cnt"))).as(s"t$b")
    }
    val chunks = (0 to 3).map { c =>
      (16 * c until 16 * (c + 1)).map(b =>
        when(col(s"t$b") > 0, lit(1L << (15 - (b - 16 * c))))
          .otherwise(lit(0L)))
        .reduce(_ + _).as(s"c$c")
    }
    val viaAgg = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", md5(col("w")))
      .select(Seq(col("doc_id"), col("cnt")) ++ digits: _*)
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id") +: chunks: _*)
      .collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(viaExpr.nonEmpty)
    assert(viaExpr == viaAgg)
  }

  test("text_simhash: near-duplicate docs land within hamming 3") {
    val sig = q("text_simhash").collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    def hamming(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    // planted near-dup pair (jaccard ~0.99)
    assert(hamming(sig(474L), sig(498L)) <= 3)
    // chunks stay within 16 bits
    assert(sig.values.forall(_.forall(c => c >= 0 && c <= 0xFFFF)))
  }

  test("text_quality ratios are consistent") {
    val rows = q("text_quality").collect()
    assert(rows.forall(r => r.getDouble(3) >= 0 && r.getDouble(3) <= 1)) // stopword_ratio
    assert(rows.forall(r => r.getDouble(4) > 0 && r.getDouble(4) <= 1))  // distinct_ratio
  }

  test("text_fingerprint: content hash is 32 hex chars, winnow stable prefix") {
    val rows = q("text_fingerprint").collect()
    assert(rows.forall(_.getString(1).matches("[0-9a-f]{32}")))
    assert(rows.forall(_.getString(2).matches("[0-9a-f]{12}")))
  }

  test("text_langid picks the max-score language deterministically") {
    val rows = q("text_langid").collect()
    assert(rows.forall(r => Set("en", "de", "es", "fr", "zh").contains(r.getString(2))))
    assert(rows.forall(_.getInt(3) >= 0))
  }

  test("text_ngram_freq: top bigrams are well-formed and rank-ordered") {
    val rows = q("text_ngram_freq").collect()
    assert(rows.length == 30)
    assert(rows.forall(_.getString(0).matches("[a-z]+ [a-z]+")))
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("text_pii_scrub: scrub is complete (zero residual PII matches) and counted") {
    import graft.queries.TextAnalysis._
    // completeness: after the three passes, no pattern matches anything
    val residual = Tables.documents(spark, sf).select(
        regexp_count(piiScrubbed, lit(PiiEmailPat)).as("e"),
        regexp_count(piiScrubbed, lit(PiiPhonePat)).as("p"),
        regexp_count(piiScrubbed, lit(PiiIpPat)).as("i"))
      .agg(sum(col("e")), sum(col("p")), sum(col("i"))).head()
    assert((0 to 2).forall(residual.getLong(_) == 0L), s"residual PII: $residual")
    // every doc's synthetic suffix fired every detector at least once,
    // and redaction strictly shrinks the text
    val rows = q("text_pii_scrub").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(2) >= 1 && r.getInt(3) >= 1 && r.getInt(4) >= 1))
    assert(rows.forall(_.getInt(5) > 0))
  }

  test("data_shuffle_global: per-shard positions are a contiguous 1..n permutation") {
    val rows = q("data_shuffle_global").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.map(_._1).distinct.length == rows.length) // every doc once
    for ((shard, members) <- rows.groupBy(_._2)) {
      val ps = members.map(_._3).sorted
      assert(ps.sameElements(1 to members.length),
        s"shard $shard positions not contiguous: ${ps.take(5).mkString(",")}...")
    }
    // determinism: a re-run reproduces the identical permutation
    assert(q("data_shuffle_global").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sameElements(rows))
    // shard is a pure function of doc_id: membership never moves when
    // the corpus changes (recompute over a half-corpus subset)
    val half = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"),
        (conv(substring(md5(concat(lit("shuffle|"), col("doc_id").cast("string"))), 1, 6), 16, 10)
          .cast("long") % 32).as("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = rows.map(r => r._1 -> r._2).toMap
    assert(half.forall { case (id, sh) => full(id) == sh })
  }

  test("pipeline_mix: kept counts respect the weighted targets and are deterministic") {
    val rows = q("pipeline_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // weights follow the documented derivation and kept ⊆ docs
    assert(rows.forall { case (src, w, n, k, _) =>
      w == src.drop(3).toInt % 4 + 1 && k >= 0 && k <= n })
    // overall mix lands near the 30% target (Bernoulli noise bounded
    // loosely — the draw is deterministic md5, not rand, so this is a
    // fixed property of the fixture, not a flaky statistical test)
    val frac = rows.map(_._4).sum.toDouble / rows.map(_._3).sum
    assert(frac > 0.1 && frac < 0.5, s"mix fraction $frac")
    assert(q("pipeline_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sameElements(rows))
  }

  test("pipeline_ppl_sample: monotone terciles, head-keep/tail-drop/middle-sample semantics") {
    val rows = q("pipeline_ppl_sample").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
    val n = rows.length
    assert(n == q("text_unigram_logprob").count())
    val byBand = rows.groupBy(_._3)
    assert(byBand.keySet == Set("head", "middle", "tail"))
    // bands are monotone in the score: every tail score < every middle
    // score < every head score (bin-granular banding: bands partition
    // disjoint bin ranges, and the signed truncation bin is monotone)
    assert(byBand("tail").map(_._2).max < byBand("middle").map(_._2).min)
    assert(byBand("middle").map(_._2).max < byBand("head").map(_._2).min)
    // tercile masses within bin-boundary slack (the largest single bin)
    byBand.values.foreach(b =>
      assert(b.size > n / 6 && b.size < n / 2, s"band size ${b.size} of $n"))
    // keep policy: head all, tail none, middle ≈ half (md5-stable)
    assert(byBand("head").forall(_._4 == 1))
    assert(byBand("tail").forall(_._4 == 0))
    val midKeep = byBand("middle").count(_._4 == 1).toDouble / byBand("middle").size
    assert(midKeep > 0.35 && midKeep < 0.65, s"middle keep rate $midKeep")
  }

  test("NfcNormalize: composed == decomposed, idempotent, ASCII fast path") {
    import spark.implicits._
    import graft.functions.NfcNormalize.nfc_normalize
    // decomposed (e + U+0301, I + U+0308) vs precomposed forms
    val rows = Seq(
      ("resume\u0301 nai\u0308ve", "resum\u00e9 na\u00efve"),
      ("plain ascii text 123", "plain ascii text 123"),
      ("", "")
    ).toDF("a", "b")
      .select(nfc_normalize(col("a")).as("na"), nfc_normalize(col("b")).as("nb"),
        (nfc_normalize(nfc_normalize(col("a"))) === nfc_normalize(col("a")))
          .as("idem"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"NFC(${r.getString(0)}) != NFC(${r.getString(1)})")
      assert(r.getBoolean(2), "not idempotent")
    }
  }

  test("text_normalize makes exact dedup catch composed/decomposed twins") {
    import spark.implicits._
    import graft.functions.NfcNormalize.nfc_normalize
    // the motivating failure: same text, two crawler encodings
    val docs = Seq(
      (1L, "un cafe\u0301 pour moi"),
      (2L, "un caf\u00e9 pour moi")
    ).toDF("doc_id", "text")
    val rawHashes = docs.select(md5(col("text"))).distinct().count()
    val normHashes = docs.select(md5(lower(trim(regexp_replace(
      nfc_normalize(col("text")), "[\\x00-\\x20]+", " "))))).distinct().count()
    assert(rawHashes == 2, "without NFC the twins hash apart")
    assert(normHashes == 1, "with NFC the twins collapse to one content hash")
  }

  test("text_html_extract drops non-content, decodes entities, keeps text") {
    val r = q("text_html_extract").limit(5).collect()
    assert(r.length == 5)
    r.foreach { row =>
      // title recovered (raw, pre-decode — both engines emit the same)
      assert(row.getAs[String]("title") ==
        s"Doc ${row.getLong(0)} &amp; friends", row.toString)
      // extraction strictly shrinks the page
      assert(row.getAs[Int]("n_text") < row.getAs[Int]("n_html"))
    }
    // semantics pinned on one crafted doc end-to-end: build the same
    // frame the query builds, over a known text, and check the bytes
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-html").toString
    Seq((900L, "hello world", "en", "src0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val one = SparkEntry.queries("text_html_extract")(spark, dir).collect().head
    val expected = "Doc 900 & friends Heading hello world " +
      "tail <kept> \"quoted\" 'q'"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(one.getAs[String]("text_hash") == md,
      s"extracted bytes differ from the expected reconstruction: $one")
  }

  test("pipeline_token_budget: budget respected, fill line monotone") {
    val rows = q("pipeline_token_budget").collect()
    val kept = rows.filter(_.getAs[Int]("kept") == 1)
    val dropped = rows.filter(_.getAs[Int]("kept") == 0)
    assert(kept.nonEmpty && dropped.nonEmpty)
    val budget = rows.map(_.getAs[Long]("n_tokens")).sum / 4
    val keptTokens = kept.map(_.getAs[Long]("n_tokens")).sum
    assert(keptTokens <= budget,
      s"budget $budget exceeded: kept $keptTokens tokens")
    // bin-granular fill: every kept score strictly above every dropped
    // one at bin granularity (no interleaving across the line)
    assert(kept.map(_.getAs[Long]("bin")).min >
      dropped.map(_.getAs[Long]("bin")).max,
      "kept and dropped bins interleave")
  }

  test("text_classify_nb learns a planted vocabulary signal perfectly") {
    import spark.implicits._
    // disjoint vocabularies per class — the NB log-odds must separate
    // them with certainty (the fixture corpus is shared-vocab word
    // soup, so this is where the LEARNING itself gets pinned; the
    // oracle pins the arithmetic)
    val dir = java.nio.file.Files.createTempDirectory("graft-nb").toString
    val docs = (0 until 40).map { i =>
      val en = i % 2 == 0
      val text = if (en) "alpha beta gamma alpha" else "delta epsilon zeta zeta"
      (i.toLong, text, if (en) "en" else "fr", s"src${i % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_classify_nb")(spark, dir).collect()
    assert(out.length == 40)
    out.foreach { r =>
      val (lang, score, pred) =
        (r.getString(1), r.getLong(3), r.getString(4))
      assert(pred == (if (lang == "en") "en" else "other"),
        s"misclassified planted doc: $r")
      // scores must carry real margin, not sit at the sign boundary
      assert(math.abs(score) > 1000000L, s"no margin: $r")
    }
    // and the eval query reports the perfect confusion matrix
    val ev = SparkEntry.queries("text_classify_eval")(spark, dir).collect()
    assert(ev.length == 2)
    ev.foreach { r =>
      assert(r.getAs[Long]("tp") == 20L &&
        r.getAs[Double]("precision") == 1.0 &&
        r.getAs[Double]("recall") == 1.0 &&
        r.getAs[Double]("f1") == 1.0, s"imperfect eval on planted corpus: $r")
    }
  }

  test("pipeline_filter_cascade: each rule fires alone on a doc crafted to violate it") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // base passes every rule: 25 distinct short tokens, 'the'-heavy so
    // en-langid agrees with the label
    val good = ((1 to 24).map(i => s"w$i") :+ "the").mkString(" ")
    val docs = Seq(
      (0L, good, "en"),                                   // mask 0
      (1L, "the a fast slow", "en"),                      // short → 1
      (2L, Seq.fill(21)("the").mkString(" "), "en"), // 1/21 distinct → 2
      (3L, ((1 to 24).map(i => "x" * 20 + i) :+ "the").mkString(" "), "en"), // long tokens → 4
      (4L, good, "fr"),                                   // langid says en → 8
      (5L, "der die das und " + (1 to 21).map(i => s"w$i").mkString(" "), "fr"), // de beats fr → 8
      (6L, null.asInstanceOf[String], "en")               // null text → 1+2+4+8
    ).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-cascade").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // text_langid on the same corpus: null-text doc DROPPED (ingest
    // contract), not crashed — the regression this fixture caught
    val lid = SparkEntry.queries("text_langid")(spark, dir).collect()
    assert(lid.length == 6 && !lid.exists(_.getLong(0) == 6L),
      s"null-text doc should drop from langid: ${lid.mkString(";")}")
    val got = SparkEntry.queries("pipeline_filter_cascade")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(got(0L) == (0, true), s"good doc: ${got(0L)}")
    assert(got(1L) == (1, false))
    assert(got(2L) == (2, false), s"got ${got(2L)}")
    assert(got(3L) == (4, false))
    assert(got(4L) == (8, false))
    assert(got(5L) == (8, false))
    assert(got(6L) == (15, false), s"null text: ${got(6L)}")
  }

  test("text_segment: hand-built page's chunk boundaries are sentence-snapped") {
    import spark.implicits._
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // sentences: "a b." (2 toks) | "c d e f." (4) | "g." (1) |
    // "h i j k l m n." (7); cumulative-before = 0, 2, 6, 7; budget 5 ⇒
    // chunk 0 = sentences 1–2 (6 tokens), chunk 1 = sentences 3–4 (8)
    val pages = Seq((1L, "a b. c d e f. g. h i j k l m n."))
      .toDF("doc_id", "page")
    val got = graft.queries.TextAnalysis.segmentChunks(pages, budget = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (0L, 2L, 6L, md5Hex("a b. c d e f.")),
      (1L, 2L, 8L, md5Hex("g. h i j k l m n."))),
      s"hand-built boundaries: ${got.mkString(";")}")
    // fixture-level invariants: chunks partition each document's token
    // stream (no token lost to a cut) and chunk ids are contiguous
    val segs = q("text_segment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val tokCounts = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = segs.groupBy(_._1)
    assert(byDoc.keySet == tokCounts.keySet)
    byDoc.foreach { case (doc, rows) =>
      assert(rows.map(_._3).sum == tokCounts(doc),
        s"doc $doc: chunk tokens ${rows.map(_._3).sum} != ${tokCounts(doc)}")
      assert(rows.map(_._2).sorted.toSeq == (0L until rows.length).toSeq,
        s"doc $doc: chunk ids not contiguous")
    }
  }
}
