package graft

import graft.queries.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends GraftSuite {

  test("decodeStage is deterministic and batch-shaped") {
    import spark.implicits._
    val media = Tables.documents(spark, sf)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("source"))
      .as[Multimodal.MediaRow]
    val a = Multimodal.decodeStage(media).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeStage(media).collect().sortBy(_.doc_id)
    assert(a.map(_.width).toSeq == b.map(_.width).toSeq)
    assert(a.forall(m => m.sample_frame_offsets.length <= 4 && m.sample_frame_offsets.nonEmpty))
    assert(a.forall(m => m.byte_len > 0))
    // frame offsets are within the payload and monotonically increasing
    assert(a.forall(m => m.sample_frame_offsets.forall(o => o >= 0 && o < m.byte_len)))
    assert(a.forall(m => m.sample_frame_offsets == m.sample_frame_offsets.sorted))
  }

  test("mm_decode stage runs narrow: no shuffle in the physical plan") {
    import spark.implicits._
    val media = Tables.documents(spark, sf)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("source"))
      .as[Multimodal.MediaRow]
    val plan = Multimodal.decodeStage(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode stage should not shuffle:\n$plan")
  }
}
