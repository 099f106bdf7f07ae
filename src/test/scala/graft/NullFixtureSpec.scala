package graft

import org.apache.spark.sql.functions._

/** Every query must survive NULLS in the nullable payload columns —
  * real web-scale inputs carry them routinely (failed extractions,
  * absent embeddings, missing event attributes), while the pristine
  * fixtures never do, so nothing else exercises this. ~10% of rows get
  * a NULL in each of text/lang/source (documents), value/props/
  * event_type (events), embedding/label (embeddings); keys and
  * timestamps stay intact (a null KEY is schema corruption, not data
  * dirt). The crash classes the first sweep found — null cosines and
  * lengths reaching primitive fields of typed aggregators, null
  * payloads NPE-ing the typed decode stage, null contents in the
  * generic mapf — are each guarded at their ingest boundary with a
  * documented contract (see withNorm, mediaTable, wordCountMap,
  * agg_quantile_merge). Contract here: no exception; result content is
  * each query's own null semantics. */
class NullFixtureSpec extends GraftSuite {

  private lazy val nullDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-nulls").toString
    def nullify(df: org.apache.spark.sql.DataFrame, cols: Seq[String], keyCol: String) =
      cols.foldLeft(df) { (d, c) =>
        d.withColumn(c,
          when(abs(hash(col(keyCol), lit(c))) % 10 === 0, lit(null))
            .otherwise(col(c)))
      }
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem"))
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    nullify(spark.read.parquet(s"$sf/events.parquet"),
      Seq("value", "props", "event_type"), "event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    nullify(spark.read.parquet(s"$sf/documents.parquet"),
      Seq("text", "lang", "source"), "doc_id")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    nullify(spark.read.parquet(s"$sf/embeddings.parquet"),
      Seq("embedding", "label"), "vec_id")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("every query runs on the null-injected fixture (no exceptions)") {
    val (failures, _) = runAllQueries(nullDir)
    assert(failures.isEmpty, s"crashed on null fixture:\n${failures.mkString("\n")}")
  }

  test("null-label vectors are retrieved but never vote in knn") {
    // unlabeled (sentinel) rows exist in the nullified corpus…
    val hasUnlabeled = spark.read.parquet(s"$nullDir/embeddings.parquet")
      .filter(col("label").isNull).count()
    assert(hasUnlabeled > 0)
    // …and no prediction ever carries the sentinel
    val preds = SparkEntry.queries("emb_knn_class")(spark, nullDir).collect()
    assert(preds.nonEmpty)
    // isNullAt + getInt, NOT getAs[Int]: a null would silently unbox
    // to 0 and pass the >= 0 check this test exists to enforce
    preds.foreach { r =>
      val i = r.fieldIndex("pred_label")
      assert(!r.isNullAt(i) && r.getInt(i) >= 0, s"pred_label in $r")
    }
  }

  test("zero-length embeddings follow the NULL contract: not indexable") {
    import spark.implicits._
    // a non-null EMPTY array has nothing to index (n2 = 0 ⇒ every
    // cosine is 0/0) — the engine must drop it like a NULL, exactly as
    // the oracles' unnest does (session-2 review finding: emb_kmeans
    // would otherwise assign it arbitrarily while the oracle drops it)
    val dir = java.nio.file.Files.createTempDirectory("graft-emptyemb").toString
    // vec_ids above NQ so the IVF trainer sees them as corpus vectors
    val rows = Seq(
      (101L, Seq(1.0f, 0.0f), 0),
      (102L, Seq.empty[Float], 1),
      (103L, Seq(0.0f, 1.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    rows.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("emb_kmeans")(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSet == Set(101L, 103L),
      s"zero-length embedding was indexed: ${out.mkString(",")}")
  }
}
