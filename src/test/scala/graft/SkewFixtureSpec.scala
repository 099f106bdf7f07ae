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
}
