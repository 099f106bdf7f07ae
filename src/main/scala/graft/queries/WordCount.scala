package graft.queries

import graft.{QueryModule, Tables}
import graft.operators.MapReduce
import org.apache.spark.sql.functions._

/** The reference's flagship (and only) job — word count — expressed two
  * ways:
  *
  *  - `wordcount`: pure DataFrame (scan → explode/split → filter →
  *    hash-shuffle groupBy → count → sort). This covers the reference's
  *    entire data-operator surface O1–O11 in one declarative plan
  *    (SURVEY.md §2.1): Catalyst plans it as parquet scan → generate →
  *    partial HashAggregate → shuffle on `word` → final HashAggregate →
  *    sort, all inside whole-stage codegen. The map-side partial aggregate
  *    is the combiner the reference lacks (`worker.go:277-281` ships one
  *    shuffle record per token; at 100 TB that is the difference between
  *    shuffling ~tokens and shuffling ~distinct words per partition).
  *  - `wordcount_mr`: the same job through the generic
  *    [[graft.operators.MapReduce]] surface (reference parity for
  *    `mapFunc`/`reduceFunc`, `worker.go:22-23`), proving the generic
  *    surface computes the same answer (same oracle).
  */
object WordCount extends QueryModule {

  /** Tokenizer shared with the oracle: ASCII-letter runs, as DuckDB's
    * regexp_split_to_array agrees with Spark's split on the class
    * `[^a-zA-Z]+` (SURVEY.md §7.4 — avoid `\p{L}` engine subtleties). */
  private val tokenRe = "[^a-zA-Z]+"

  /** O1/O2-faithful source: a directory of plain-text files, one row per
    * whole file (the reference's input model — `master.go:327-339` lists
    * the dir, `worker.go:131-140` reads files whole). Spark's `wholetext`
    * preserves per-file semantics; `input_file_name()` recovers the
    * identity the reference threads through its task table. At scale the
    * directory listing and file splits are handled by the data source —
    * one small file per task is exactly the reference's layout. */
  def wordcountFromTextDir(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    s.read.option("wholetext", "true").text(dir)
      .select(input_file_name().as("file"), col("value").as("text"))
      .select(explode(split(col("text"), tokenRe)).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("word"))

  val queries: Map[String, Q] = Map(
    "wordcount" -> { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), tokenRe)).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("word"))
    },
    "wordcount_mr" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
        .select(col("doc_id").cast("string"), col("text"))
        .as[(String, String)]
      MapReduce
        .runReducible(
          docs,
          MapReduce.wordCountMap,
          (a, b) => (a.toLong + b.toLong).toString)
        .toDF("word", "cnt_str")
        .select(col("word"), col("cnt_str").cast("long").as("cnt"))
        .orderBy(col("word"))
    },

    // Bit-exact reference partitioner parity (O5): bucket =
    // fnv32a(word) & 0x7fffffff % 4 (worker.go:226-239, nReduce=4,
    // master.go:341) via the codegen'd Fnv32a Catalyst expression.
    "partition_fnv" -> { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), tokenRe)).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("bucket", graft.functions.Fnv32a.fnvBucket(col("word"), 4))
        .orderBy(col("word"))
    },

    // O12 partition-id extraction (worker.go:220-223): the reference's
    // reduce worker recovers its bucket index from the intermediate
    // filename `m-<src>-<i>` (worker.go:143-166 naming) by splitting on
    // "-" and taking the LAST token. Reproduced end-to-end: build the
    // reference's intermediate filename per token pair (1 doc = 1 map
    // task under its 1-file-1-task model, bucket = fnv32a per O5), drop
    // the bucket column, and re-derive it from the filename string alone
    // — then summarize each recovered reduce task's input (pair count,
    // contributing map files, distinct keys).
    "partition_recover" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), tokenRe)).as("word"))
        .filter(col("word") =!= "")
        .withColumn("fname",
          concat(lit("m-"), col("doc_id"), lit("-"),
            graft.functions.Fnv32a.fnvBucket(col("word"), 4)))
        // from here on the bucket is ONLY knowable via the filename
        .select(col("doc_id"), col("word"), col("fname"))
        .withColumn("bucket", element_at(split(col("fname"), "-"), -1).cast("int"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("doc_id")).as("n_files"),
          countDistinct(col("word")).as("n_words"))
        .orderBy(col("bucket"))
    }
  )

  private val wcOracle =
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(regexp_split_to_array(text, '[^a-zA-Z]+')) AS word
      |      FROM documents)
      |WHERE word <> ''
      |GROUP BY word
      |ORDER BY word""".stripMargin

  val oracles: Map[String, String] = Map(
    "wordcount" -> wcOracle,
    // wordcount_mr computes the same answer through the generic
    // MapReduce surface, so it shares the oracle
    "wordcount_mr" -> wcOracle,
    // FNV-1a 32 reproduced in SQL: fold over byte values with
    // xor-then-multiply, masked to 32 bits (tokens are pure ASCII).
    "partition_fnv" ->
      """SELECT word, count(*) AS cnt,
        |       CAST((list_reduce(
        |               list_prepend(2166136261::BIGINT,
        |                 list_transform(range(length(word)), i -> ascii(substr(word, i + 1, 1)))),
        |               (h, b) -> (xor(h, b) * 16777619) & 4294967295)
        |             & 2147483647) % 4 AS INTEGER) AS bucket
        |FROM (SELECT unnest(regexp_split_to_array(text, '[^a-zA-Z]+')) AS word
        |      FROM documents)
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY word""".stripMargin,
    // Same FNV fold builds the filename; recovery mirrors the reference
    // literally — split on '-', take the last token (worker.go:220-223).
    "partition_recover" ->
      """WITH toks AS (
        |  SELECT doc_id, word
        |  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '[^a-zA-Z]+')) AS word
        |        FROM documents)
        |  WHERE word <> ''
        |), named AS (
        |  SELECT doc_id, word,
        |         'm-' || CAST(doc_id AS VARCHAR) || '-' ||
        |         CAST(CAST((list_reduce(
        |                 list_prepend(2166136261::BIGINT,
        |                   list_transform(range(length(word)), i -> ascii(substr(word, i + 1, 1)))),
        |                 (h, b) -> (xor(h, b) * 16777619) & 4294967295)
        |               & 2147483647) % 4 AS INTEGER) AS VARCHAR) AS fname
        |  FROM toks
        |), parts AS (
        |  SELECT doc_id, word, string_split(fname, '-') AS p FROM named
        |)
        |SELECT CAST(p[len(p)] AS INTEGER) AS bucket,
        |       count(*) AS n_pairs,
        |       count(DISTINCT doc_id) AS n_files,
        |       count(DISTINCT word) AS n_words
        |FROM parts
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin
  )
}
