package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Reference-parity generic MapReduce surface.
  *
  * The reference's entire user-facing programming model is a pair of
  * function types (reference `src/worker/worker.go:22-23`):
  *
  * {{{
  *   type mapFunc    func(string, string) []KeyValue   // (k1,v1) -> [(k2,v2)]
  *   type reduceFunc func(string, []string) string     // (k2,[v2]) -> v3
  * }}}
  *
  * plus hash-partitioned shuffle (`worker.go:226-239`) and sort-based
  * grouping (`worker.go:191-215`). Expressed Spark-first that is exactly
  * `Dataset.flatMap` (narrow stage) → `groupByKey` (shuffle on key) →
  * `mapGroups` / `reduceGroups` (wide stage). Spark supersedes the
  * reference's physical choices: partial aggregation replaces the missing
  * combiner (`worker.go:277-281` shuffles one record per token), the
  * sort-based shuffle spills instead of materializing each bucket in memory
  * (`worker.go:171-189`), and stage scheduling replaces the master/worker
  * RPC machinery (`master.go` — all of §2.2 in SURVEY.md).
  *
  * Scale note: `run` keeps the reference's "all values of a key in one
  * place" contract, so a single hot key must fit in one task — same
  * contract as the reference, minus its OOM (Spark spills). When the
  * reduce function is associative+commutative, use [[runReducible]]: it
  * gets map-side partial reduction (combiner) and never materializes a
  * key's full value list — the 100 TB-safe path.
  */
object MapReduce {

  type KeyValue = (String, String)

  /** Direct analog of the reference contract: arbitrary mapf + reducef.
    * reducef sees ALL values for a key (sorted grouping semantics). The
    * shuffle width is governed by spark.sql.shuffle.partitions — the
    * engine-level analog of the reference's hard-coded nReduce=4
    * (master.go:341). */
  def run(
      input: Dataset[(String, String)],
      mapf: (String, String) => IterableOnce[KeyValue],
      reducef: (String, Iterator[String]) => String
  ): Dataset[(String, String)] = {
    val spark = input.sparkSession
    import spark.implicits._
    input
      .flatMap { case (k1, v1) => mapf(k1, v1) }
      .groupByKey(_._1)
      .mapGroups { (k, vs) => (k, reducef(k, vs.map(_._2))) }
  }

  /** Combiner-friendly variant: reducef must be associative+commutative
    * over values (the word-count shape). Spark plans this as partial
    * (map-side) + final aggregation — the shape the reference lacks
    * entirely (SURVEY.md §4.2 "no combiner"). */
  def runReducible(
      input: Dataset[(String, String)],
      mapf: (String, String) => IterableOnce[KeyValue],
      reducef: (String, String) => String
  ): Dataset[(String, String)] = {
    val spark = input.sparkSession
    import spark.implicits._
    input
      .flatMap { case (k1, v1) => mapf(k1, v1) }
      .groupByKey(_._1)
      .reduceGroups((a: KeyValue, b: KeyValue) => (a._1, reducef(a._2, b._2)))
      .map { case (k, kv) => (k, kv._2) }
  }

  /** The reference's only concrete job: word count
    * (`worker.go:270-288`). Tokenizer matches `strings.FieldsFunc(_,
    * !unicode.IsLetter)` restricted to ASCII letters for oracle parity
    * (SURVEY.md §7.4). */
  val wordCountMap: (String, String) => IterableOnce[KeyValue] =
    (_, contents) =>
      // null contents = an unreadable record: zero tokens, not an NPE
      // (the reference could never see one — file reads yield "" at
      // worst — but the generic surface accepts arbitrary datasets)
      if (contents == null) Iterator.empty
      else contents.split("[^a-zA-Z]+").iterator.filter(_.nonEmpty).map(w => (w, "1"))

  val wordCountReduce: (String, Iterator[String]) => String =
    (_, values) => values.size.toString
}
