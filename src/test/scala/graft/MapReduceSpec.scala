package graft

import graft.operators.MapReduce
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the generic mapf/reducef surface (reference parity,
  * worker.go:22-23): the two evaluation strategies must agree, and results
  * must be invariant under partitioning — the property the reference's
  * hash-partition shuffle (worker.go:226-239) is supposed to guarantee.
  * (Raw ScalaCheck generators sampled over fixed seeds; the
  * scalatest-scalacheck bridge artifact is not on the offline classpath.)
  */
class MapReduceSpec extends GraftSuite {

  private val wordGen = Gen.nonEmptyListOf(
    Gen.oneOf("spark", "data", "the", "graft", "x")).map(_.mkString(" "))
  private val docsGen: Gen[List[(String, String)]] =
    Gen.nonEmptyListOf(wordGen).map(_.zipWithIndex.map {
      case (t, i) => (i.toString, t)
    })

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def countVia(
      docs: List[(String, String)],
      f: org.apache.spark.sql.Dataset[(String, String)] => org.apache.spark.sql.Dataset[(String, String)]
  ): Map[String, String] = {
    import spark.implicits._
    f(spark.createDataset(docs)).collect().toMap
  }

  test("run and runReducible agree on word count for arbitrary corpora") {
    for (docs <- samples(docsGen, 8)) {
      val viaGroups = countVia(docs,
        ds => MapReduce.run(ds, MapReduce.wordCountMap, MapReduce.wordCountReduce))
      val viaReduce = countVia(docs,
        ds => MapReduce.runReducible(ds, MapReduce.wordCountMap,
          (a, b) => (a.toLong + b.toLong).toString))
      assert(viaGroups == viaReduce)
    }
  }

  test("word count is invariant under repartitioning") {
    for ((docs, i) <- samples(docsGen, 5).zipWithIndex) {
      val n = i % 7 + 1
      val base = countVia(docs,
        ds => MapReduce.runReducible(ds, MapReduce.wordCountMap,
          (a, b) => (a.toLong + b.toLong).toString))
      val repart = countVia(docs,
        ds => MapReduce.runReducible(ds.repartition(n), MapReduce.wordCountMap,
          (a, b) => (a.toLong + b.toLong).toString))
      assert(base == repart)
    }
  }

  test("tokenizer drops empty tokens (FieldsFunc semantics, worker.go:275)") {
    val toks = MapReduce.wordCountMap("f", "  hello,,world  123 ").iterator.toList
    assert(toks.map(_._1) == List("hello", "world"))
    assert(toks.forall(_._2 == "1"))
  }
}
