package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Subword (BPE) tokenization as a first-class operator family —
  * tokenizer-fidelity token counting and budgeting (round-13 verdict
  * item 4: every token-budget op counted regex tokens; training
  * pipelines budget in BPE tokens, which diverge 1.3–1.7× on web
  * text).
  *
  * TRAINING (classic Sennrich BPE over the word-frequency table): the
  * corpus collapses to distinct `[a-z]+` words with counts — ONE
  * distributed aggregation; every real BPE trainer (subword-nmt,
  * sentencepiece) operates on exactly this table, which is vocabulary-
  * sized however large the corpus. The top-[[VocabCap]] words by
  * (count desc, word asc — a total order) are collected (model-sized,
  * the quantizer precedent) and [[NumMerges]] merges are learned
  * driver-side: each step counts weighted adjacent symbol pairs and
  * merges the most frequent (ties broken lexicographically — fully
  * deterministic, the fixed-sweep Eigen discipline).
  *
  * ENCODING (the distributed work) is one codegen scalar per document
  * ([[graft.functions.BpeSubwordCount]]): no joins, no shuffle — the
  * merges ride the expression to every task. The merges table is
  * EXPORTED (content-addressed single-file parquet, the PQ-codebook
  * recipe) and the DuckDB oracle REPLAYS the encoder from it: merges
  * in rank order unroll into nested `replace()` calls over a
  * unit-separator-joined char sequence — provably the same algorithm
  * (see the equivalence note on BpeSubwordCount; BpeSpec pins a
  * hand-tokenized sentence against a hand-derived merges table).
  *
  * 100 TB: training reads the word-count table (vocab-sized shuffle),
  * encoding is embarrassingly parallel scan work, and the budget twin
  * reuses pipeline_token_budget's bin-granular fill — histogram-sized
  * frames, no corpus-wide sort.
  */
object Bpe extends QueryModule {

  private[graft] val NumMerges = 24
  private[graft] val VocabCap = 4096

  /** Per-fixture lazy cell (the Staging discipline: computeIfAbsent
    * only allocates; the multi-second train runs under the cell's own
    * lazy-val latch, never inside the CHM bin lock). */
  private final class Cell(thunk: () => Seq[(String, String)]) {
    lazy val value: Seq[(String, String)] = thunk()
  }
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Cell]()
  private val exported =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  /** Fixture of the most recent merges build in this JVM — read by
    * [[oracles]] (Verify dumps oracle SQL AFTER running the queries;
    * one fixture per Verify run — the lastIvf/lastPca pattern). */
  @volatile private var lastBpe: String = "/root/testdata/sf0.01"

  /** Pin the oracle-dump default to the fixture Verify is running
    * (the Similarity.pinOracleFixture twin): a subset Verify that
    * skips the bpe queries must not dump SQL keyed to another
    * fixture's merges cache. */
  def pinOracleFixture(dir: String): Unit = lastBpe = dir

  private[graft] def mergesOracleArtifactPath(dir: String): String =
    graft.OracleExport.path(s"$dir|bpe$NumMerges|v$VocabCap", "bpe-merges")

  /** The trained merges for a fixture: word-frequency table
    * distributed, training driver-side, artifact exported once. */
  private[graft] def merges(s: SparkSession, d: String): Seq[(String, String)] = {
    lastBpe = d
    val ms = mergeCache.computeIfAbsent(d, _ => new Cell(() => {
      val wordCounts = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .select(explode(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w"))
        .limit(VocabCap)
        .collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      train(wordCounts, NumMerges)
    })).value
    exported.computeIfAbsent(d, _ => {
      val p = mergesOracleArtifactPath(d)
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(p).getParent)
      val flat = ms.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      graft.ScaleData.writeSingleFile(
        s.createDataFrame(flat).toDF("rank", "left", "right"), p)
      true
    })
    ms
  }

  /** Driver-side Sennrich training over a word-frequency table.
    * Deterministic: pair counts are exact integers, the argmax tie
    * breaks on (count desc, left asc, right asc), and each learned
    * merge applies exhaustively left-to-right before the next count.
    * Stops early when no pair remains (every word fully merged). */
  private[graft] def train(
      wordCounts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] = wordCounts.toArray.map {
      case (w, c) => (Array.tabulate(w.length)(i => String.valueOf(w.charAt(i))), c)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((toks, c) <- words; i <- 0 until toks.length - 1) {
        val k = (toks(i), toks(i + 1))
        pc.update(k, pc.getOrElse(k, 0L) + c)
      }
      if (pc.isEmpty) exhausted = true
      else {
        val best = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        out += best
        words = words.map { case (toks, c) => (applyMerge(toks, best), c) }
        m += 1
      }
    }
    out.toSeq
  }

  private def applyMerge(
      toks: Array[String], rule: (String, String)): Array[String] = {
    val (l, r) = rule
    val out = Array.newBuilder[String]
    var k = 0
    while (k < toks.length) {
      if (k + 1 < toks.length && toks(k) == l && toks(k + 1) == r) {
        out += l + r
        k += 2
      } else {
        out += toks(k)
        k += 1
      }
    }
    out.result()
  }

  override def queries: Map[String, Q] = Map(

    // Per-document subword census: the BPE count next to the regex
    // pre-token count it refines (their ratio is the compression
    // signal quality filters use). One codegen projection, no shuffle.
    "text_bpe_tokens" -> { (s, d) =>
      val ms = merges(s, d)
      Tables.documents(s, d).select(
        col("doc_id"),
        graft.functions.BpeSubwordCount
          .bpe_subword_count(col("text"), ms).as("n_subwords"),
        graft.functions.BpeTokenCount
          .bpe_token_count(col("text")).as("n_pretokens"))
        .orderBy(col("doc_id"))
    },

    // The token-budget twin in SUBWORD units: keep the most
    // token-efficient documents (lowest subwords per 100 chars — high
    // ratios mean text the tokenizer finds out-of-distribution) until
    // the subword budget (total DIV 4) fills. Bin-granular, the
    // pipeline_token_budget discipline: histogram-sized frames only,
    // docs sharing a bin share a fate, no corpus-wide sort.
    "pipeline_bpe_budget" -> { (s, d) =>
      val ms = merges(s, d)
      val sc = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.BpeSubwordCount
            .bpe_subword_count(col("text"), ms).cast("long").as("n_subwords"),
          length(col("text")).cast("long").as("n_chars"))
        .withColumn("bin", expr("(n_subwords * 100) DIV nullif(n_chars, 0)"))
      val wAsc = Window.orderBy(col("bin").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val fill = sc.filter(col("bin").isNotNull)
        .groupBy(col("bin")).agg(sum(col("n_subwords")).as("btok"))
        .withColumn("cum", sum(col("btok")).over(wAsc))
        .crossJoin(broadcast(sc.agg(
          expr("sum(n_subwords) DIV 4").as("budget"))))
        .agg(max(when(col("cum") <= col("budget"), col("bin"))).as("kmax"))
      sc.crossJoin(broadcast(fill))
        .select(col("doc_id"), col("n_subwords"), col("bin"),
          when(coalesce(col("bin") <= col("kmax"), lit(false)), 1)
            .otherwise(0).as("kept"))
        .orderBy(col("doc_id"))
    }
  )

  /** The encoder unrolled into SQL. Each token is wrapped
    * RS‹token›US (chr(30)/chr(31) — delimiters that can never occur in
    * `[a-z]+` content), so a merge is one
    * `replace(seq, RS l US RS r US, RS lr US)`: any match must align
    * RS at a token start and US at its end, hence l and r each match
    * EXACTLY one whole token and the pair is adjacent — mid-token
    * suffix/prefix matches (the first cut's bug: pattern 'a∘b' matched
    * inside [xa, b]) are structurally impossible, and because the
    * replacement re-emits both delimiters, left-to-right
    * non-overlapping replace() is exactly the engine's one exhaustive
    * pass (adjacent occurrences keep their own delimiters). Token
    * count = #RS. */
  private def encodeSql(ms: Seq[(String, String)]): String =
    ms.foldLeft("regexp_replace(w, '(.)', chr(30) || '\\1' || chr(31), 'g')") {
      case (acc, (l, r)) =>
        s"replace($acc, chr(30) || '$l' || chr(31) || chr(30) || '$r' || chr(31), " +
          s"chr(30) || '$l$r' || chr(31))"
    }

  /** Shared oracle CTEs: distinct letter-words encoded once (the
    * scale shape — encoding is per-TYPE, not per-token), summed back
    * per document; digit runs and other non-space code points counted
    * by the class regexes the engine's byte walk mirrors. */
  private def subwordCtes(ms: Seq[(String, String)]): String =
    s"""words AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+')) AS w
       |  FROM documents),
       |dw AS (SELECT DISTINCT w FROM words),
       |enc AS (SELECT w, ${encodeSql(ms)} AS seq FROM dw),
       |wcnt AS (
       |  SELECT w, CAST(length(seq) - length(replace(seq, chr(30), ''))
       |              AS BIGINT) AS n
       |  FROM enc),
       |lsum AS (
       |  SELECT doc_id, sum(n) AS n_letters
       |  FROM words JOIN wcnt USING (w) GROUP BY doc_id),
       |sw AS (
       |  SELECT d.doc_id,
       |         CAST(coalesce(l.n_letters, 0)
       |              + len(regexp_extract_all(d.text, '[0-9]+'))
       |              + len(regexp_extract_all(d.text, '[^a-z0-9 ]'))
       |           AS BIGINT) AS n_subwords,
       |         length(d.text) AS n_chars
       |  FROM documents d LEFT JOIN lsum l USING (doc_id)
       |  WHERE d.text IS NOT NULL)""".stripMargin

  override def oracles: Map[String, String] = {
    // merges of the fixture Verify actually ran (dump happens after
    // the query loop); empty when the query never ran in this JVM —
    // the driver only checks oracles for dumped results, so the
    // merge-free SQL is never read in that case
    val ms = Option(mergeCache.get(lastBpe)).map(_.value).getOrElse(Seq.empty)
    Map(
      "text_bpe_tokens" ->
        s"""WITH ${subwordCtes(ms)}
           |SELECT d.doc_id,
           |       CAST(s.n_subwords AS INT) AS n_subwords,
           |       CAST(len(regexp_extract_all(d.text,
           |              '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_pretokens
           |FROM documents d LEFT JOIN sw s USING (doc_id)
           |ORDER BY doc_id""".stripMargin,

      "pipeline_bpe_budget" ->
        s"""WITH ${subwordCtes(ms)},
           |sb AS (
           |  SELECT doc_id, n_subwords,
           |         (n_subwords * 100) // NULLIF(n_chars, 0) AS bin
           |  FROM sw),
           |hist AS (
           |  SELECT bin, sum(n_subwords) AS btok
           |  FROM sb WHERE bin IS NOT NULL GROUP BY bin),
           |cumh AS (
           |  SELECT bin, sum(btok) OVER (ORDER BY bin ASC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM hist),
           |fill AS (
           |  SELECT max(CASE WHEN cum <= (SELECT CAST(sum(n_subwords) // 4
           |                                 AS BIGINT) FROM sb)
           |             THEN bin END) AS kmax
           |  FROM cumh)
           |SELECT doc_id, n_subwords, bin,
           |       CASE WHEN bin <= (SELECT kmax FROM fill)
           |            THEN 1 ELSE 0 END AS kept
           |FROM sb ORDER BY doc_id""".stripMargin
    )
  }
}
