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
        |ORDER BY word""".stripMargin
  )
}
