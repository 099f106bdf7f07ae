package graft

/** Every query must run to completion on a fully EMPTY corpus (all ten
  * tables present with their schemas, zero rows). This is the
  * degenerate-input contract a pipeline engine needs for bootstrap runs,
  * filtered-to-nothing partitions, and fresh ingest dirs — and the class
  * of bug it catches is real: pipeline_overlap_est dropped its estimate
  * row on an empty split (groupByKey emits no zero row — review round
  * 10), the streaming sentinel stagers crashed on a NULL max timestamp,
  * the upsert gate errored on zero data batches, and ann_ivf's
  * literal-array assignment failed to type an empty quantizer. Each is
  * now guarded; this suite keeps the whole surface honest.
  *
  * Contract: no exception, and a well-formed (usually empty) result.
  * Global aggregates legitimately return their one zero row. */
class EmptyFixtureSpec extends GraftSuite {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every query runs on the all-empty fixture (no exceptions, sane counts)") {
    val (failures, counts) = runAllQueries(emptyDir)
    assert(failures.isEmpty, s"crashed on empty fixture:\n${failures.mkString("\n")}")
    // only global aggregates may produce rows from nothing, and only
    // their fixed zero-row shape
    counts.foreach { case (name, n) =>
      assert(n <= 2, s"$name returned $n rows from an empty corpus")
    }
  }
}
