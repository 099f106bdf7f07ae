package graft

import org.apache.spark.sql.functions._

/** Every query must run to completion on a corpus with PATHOLOGICAL
  * documents — the third robustness gate's missing sibling (empty →
  * EmptyFixtureSpec, dirty → NullFixtureSpec, non-ASCII → the multibyte
  * oracle gate; this one: SKEW). Real crawl dumps contain megabyte
  * pages, binary-ish single-token blobs, and boilerplate pages repeated
  * thousands of times — the inputs that turn an O(len²) verifier or a
  * hot shuffle key into a stalled executor. The fixture plants:
  *
  *  - two ~50 k-token NEAR-IDENTICAL repetitive docs (the giant-page
  *    twins): too long for char-level DP (the levMaxLen guard this gate
  *    exercises — without it the banded DP stalls the suite), but the
  *    fingerprint paths (minhash/LSH, span postings) must still catch
  *    them, with full-coverage duplicated spans and bounded per-doc
  *    windows;
  *  - one 200 k-char SINGLE-TOKEN doc (no delimiter anywhere) — the
  *    tokenizer/char-gram/fingerprint expressions must treat it as one
  *    giant token without quadratic blowup;
  *  - a 100-copy IDENTICAL short doc (the boilerplate page): a 100-hot
  *    exact-dup group, a white-hot LSH bucket (4 950 candidate pairs
  *    from one signature), and a 100-member near-dup cluster.
  *
  * Contract: no exception anywhere on the full query surface, and the
  * dedup family still returns the RIGHT answers on the planted docs.
  */
class SkewFixtureSpec extends GraftSuite {

  private val GiantA = 900001L
  private val GiantB = 900002L
  private val OneTok = 900003L

  private lazy val skewDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings")) {
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    import spark.implicits._
    val phrase = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    val giantA = Seq.fill(6250)(phrase).mkString(" ") // 50k tokens
    // one more phrase repetition appended: NOT an exact dup (md5
    // differs, lengths differ) but the distinct shingle sets are
    // IDENTICAL (every boundary shingle already occurs), so the LSH
    // candidate + Jaccard-1 verification is deterministic — no
    // probabilistic band luck in the gate
    val giantB = giantA + " " + phrase
    val oneTok = (0 until 200000).map(i => ('a' + i % 7).toChar).mkString
    val boiler = "subscribe to our newsletter for the latest updates and " +
      "offers terms conditions privacy policy all rights reserved"
    val patho =
      Seq((GiantA, giantA, "en", "srcG", giantA.length.toLong),
        (GiantB, giantB, "en", "srcG", giantB.length.toLong),
        (OneTok, oneTok, "en", "srcG", oneTok.length.toLong)) ++
        (0 until 100).map(i =>
          (910000L + i, boiler, "en", "srcB", boiler.length.toLong))
    val pathoDf = patho.toDF("doc_id", "text", "lang", "source", "n_chars")
    spark.read.parquet(s"$sf/documents.parquet")
      .unionByName(pathoDf)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("every query runs on the skew fixture (no exceptions)") {
    val (failures, counts) = runAllQueries(skewDir)
    assert(failures.isEmpty, s"crashed on skew fixture:\n${failures.mkString("\n")}")
    assert(counts("dedup_exact") > 0)
  }

  test("skew fixture: dedup family answers are right on the planted docs") {
    val exact = SparkEntry.queries("dedup_exact")(spark, skewDir)
      .filter(col("n_copies") === 100).collect()
    assert(exact.length == 1, "the 100-copy boilerplate group is missing")

    // char-level DP refuses the giant twins (levMaxLen guard)...
    val levPairs = SparkEntry.queries("dedup_lev_blocked")(spark, skewDir)
      .filter(col("d1").isin(GiantA, GiantB) || col("d2").isin(GiantA, GiantB))
      .count()
    assert(levPairs == 0L, "giant docs entered the char-level DP")
    // ...but the fingerprint path still catches them
    val mh = SparkEntry.queries("dedup_minhash")(spark, skewDir)
      .filter(col("d1") === GiantA && col("d2") === GiantB).collect()
    assert(mh.length == 1, "minhash missed the giant near-identical twins")

    // the boilerplate cluster assembles completely
    val cl = SparkEntry.queries("dedup_cluster")(spark, skewDir)
      .filter(col("cluster_size") >= 100).count()
    assert(cl >= 100L, "boilerplate cluster did not assemble")

    // full-coverage duplicated span on the giant twin (bounded per-doc
    // islands window over 50k postings)
    val span = SparkEntry.queries("dedup_substring")(spark, skewDir)
      .filter(col("doc_id") === GiantB).collect()
    assert(span.nonEmpty &&
      span.exists(r => r.getAs[Long]("span_len") > 20000L),
      s"giant twin's duplicated span not found: ${span.mkString(",")}")

    // the single-token blob is one whitespace token end-to-end
    val t = SparkEntry.queries("text_tokens")(spark, skewDir)
      .filter(col("doc_id") === OneTok).collect().head
    assert(t.getAs[Int]("n_ws_tokens") == 1)
  }

  test("skew fixture: session-2 ops stay sane on the pathological docs") {
    // BM25: the giant twins push dl five hundred times past avgdl and
    // tf to 6 250 on every phrase token — the fixed-point BIGINT score
    // pipeline must neither overflow (negative/absurd rrf) nor starve
    // the ranking: still a full tie-broken top-k per query, rrf > 0
    val bm = SparkEntry.queries("hybrid_search_bm25")(spark, skewDir).collect()
    assert(bm.nonEmpty, "bm25 returned nothing on the skew fixture")
    assert(bm.forall(_.getAs[Double]("rrf") > 0.0), "non-positive rrf fusion score")
    val perQ = bm.groupBy(_.getAs[Long]("query_id")).values
    assert(perQ.forall(rows => rows.map(_.getAs[Int]("rk")).sorted.toSeq ==
      (1 to rows.length)), "rank column not dense per query")

    // token-budget fill: the giant twins alone carry ~100k of the
    // corpus's tokens — the budget (total div 4) must hold as a HARD
    // bound even when single documents dwarf it
    val tb = SparkEntry.queries("pipeline_token_budget")(spark, skewDir).collect()
    val total = tb.map(_.getAs[Long]("n_tokens")).sum
    val kept = tb.filter(_.getAs[Int]("kept") == 1).map(_.getAs[Long]("n_tokens")).sum
    assert(kept <= total / 4, s"budget overshot: kept=$kept budget=${total / 4}")
    // the 50k-token repetitive twins score as EXTREME perplexity
    // outliers in some direction; whatever bin they land in, the
    // monotone fill line must hold: every kept doc's bin >= every
    // dropped doc's bin
    // the twins can put the best bin ALONE over the budget, in which
    // case the bin-granular hard bound legitimately keeps NOTHING —
    // the fill line is only checkable when both sides are non-empty
    val keptBins = tb.filter(_.getAs[Int]("kept") == 1).map(_.getAs[Long]("bin"))
    val dropBins = tb.filter(_.getAs[Int]("kept") == 0).map(_.getAs[Long]("bin"))
    if (keptBins.nonEmpty && dropBins.nonEmpty)
      assert(keptBins.min >= dropBins.max,
        s"fill line crossed: ${keptBins.min} < ${dropBins.max}")

    // perplexity bucketing: a decision for every non-null doc, and the
    // 100 identical boilerplate copies land in ONE band with ONE
    // identical keep decision (content-stable md5 sampling would
    // otherwise split identical docs only by doc_id — allowed — but
    // band/score must agree exactly)
    val pp = SparkEntry.queries("pipeline_ppl_sample")(spark, skewDir).collect()
    val boiler = pp.filter(r => r.getAs[Long]("doc_id") >= 910000L &&
      r.getAs[Long]("doc_id") < 910100L)
    assert(boiler.length == 100)
    assert(boiler.map(_.getAs[Long]("avg_lp_micro")).distinct.length == 1,
      "identical boilerplate docs scored differently")
    assert(boiler.map(_.getAs[String]("band")).distinct.length == 1,
      "identical boilerplate docs banded differently")

    // HTML extraction: the 200k-char single token flows through the
    // regex chain as one token (no delimiter for the tag-stripper to
    // choke on) and the giant page extracts non-empty text
    val hx = SparkEntry.queries("text_html_extract")(spark, skewDir)
      .filter(col("doc_id").isin(GiantA, OneTok)).collect()
    assert(hx.length == 2)
    assert(hx.forall(_.getAs[Number]("n_text").longValue > 0L),
      "pathological page extracted empty")

    // NB classifier: 100 identical docs must get the identical score
    // and prediction (the model is a function of the corpus, the score
    // a function of the text)
    val nb = SparkEntry.queries("text_classify_nb")(spark, skewDir)
      .filter(col("doc_id") >= 910000L && col("doc_id") < 910100L).collect()
    assert(nb.length == 100)
    assert(nb.map(_.getAs[Long]("score_micro")).distinct.length == 1,
      "identical boilerplate docs scored differently by NB")
    assert(nb.map(_.getAs[String]("pred")).distinct.length == 1,
      "identical boilerplate docs classified differently")
  }
}
