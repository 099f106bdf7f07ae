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

  test("BmpCodec: hand-built byte-literal BMP decodes to spec values; rejects hold") {
    import graft.functions.BmpCodec
    // 2×1 24bpp BMP assembled BYTE BY BYTE from the format spec (not
    // via encode — this pins decode against the spec, the oracle pins
    // it against DuckDB's independent parser): 54-byte header + one
    // row of two BGR triples + 2 pad bytes (rowSize(2) = 8)
    val hdr = Array[Int](
      'B', 'M', 62, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
      40, 0, 0, 0, 2, 0, 0, 0, 1, 0, 0, 0, 1, 0, 24, 0, // info: w=2 h=1 bpp=24
      0, 0, 0, 0, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, // comp=0 imgsize=8
      0, 0, 0, 0, 0, 0, 0, 0)
    // pad bytes deliberately nonzero — a correct parser ignores them
    val pix = Array[Int](10, 20, 30, 40, 250, 60, 99, 98)
    val bytes = (hdr ++ pix).map(_.toByte)
    val dec = BmpCodec.decode(bytes)
    assert(dec != null)
    // 250 exercises the unsigned-byte read path
    assert(dec.toLongArray().toSeq == Seq(2L, 1L, 24L, 50L, 270L, 90L))
    // reject contract: bad magic, truncation, unsupported bpp
    assert(BmpCodec.decode("XYZ not a bitmap at all".getBytes("UTF-8")) == null)
    assert(BmpCodec.decode(bytes.take(53)) == null)
    val badBpp = bytes.clone(); badBpp(28) = 8
    assert(BmpCodec.decode(badBpp) == null)
    val badDims = bytes.clone(); badDims(18) = 0
    assert(BmpCodec.decode(badDims) == null)
    // encode→decode roundtrip on a padded width (w=3 ⇒ rowSize 12)
    val p2 = Array.tabulate[Byte](3 * 2 * 3)(i => (i * 11 % 256).toByte)
    val rt = BmpCodec.decode(BmpCodec.encode(3, 2, p2))
    assert(rt != null && rt.toLongArray().take(3).toSeq == Seq(3L, 2L, 24L))
    val want = p2.map(_ & 0xff).zipWithIndex.groupBy(_._2 % 3)
    assert(rt.toLongArray().drop(3).toSeq ==
      Seq(0, 1, 2).map(ch => want(ch).map(_._1.toLong).sum))
  }

  test("mm_decode: every fixture payload parses — dims in range, stats present") {
    val rows = q("mm_decode").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(2), s"doc ${r.getLong(0)} rejected by the codec")
      val (w, h, bpp) = (r.getInt(2), r.getInt(3), r.getInt(4))
      assert(w >= 1 && w <= 8 && h >= 1 && h <= 8 && bpp == 24)
      // header accounts for the byte length exactly: 54 + h * rowSize(w)
      val rowSz = ((w * 3 + 3) / 4) * 4
      assert(r.getLong(1) == 54L + h.toLong * rowSz)
      // channel sums bounded by the pixel area
      Seq(5, 6, 7).foreach { i =>
        assert(r.getLong(i) >= 0 && r.getLong(i) <= 255L * w * h)
      }
    }
  }

  test("mm_resize keeps every stride-th byte: sizes and digests line up") {
    // ceil(len/4) resized bytes, digest recomputable from the text
    val byText = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = q("mm_resize").collect()
    assert(rows.length == byText.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r =>
      val (doc, origLen, resizedLen, hex) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val text = byText(doc)
      assert(origLen == text.getBytes("UTF-8").length.toLong)
      assert(resizedLen == (origLen + 3) / 4)
      // digest of the LOWERCASE-HEX of the strided bytes (the
      // cross-engine fingerprint encoding — DuckDB md5 is VARCHAR-only)
      val expected = text.getBytes("UTF-8").grouped(4).map(_.head).toArray
        .map("%02x".format(_)).mkString
      md.reset()
      assert(hex == md.digest(expected.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, s"doc $doc digest")
    }
  }

  test("mm_frame_sample frames tile the payload exactly") {
    val rows = q("mm_frame_sample").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byteLens = q("mm_binary_meta").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    rows.groupBy(_._1).foreach { case (doc, fs) =>
      val sorted = fs.sortBy(_._2)
      // frames start at 0, are contiguous, and sum to the payload length
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3, s"gap in doc $doc")
        case _ =>
      }
      assert(fs.map(_._4).sum == byteLens(doc), s"doc $doc frames don't tile")
    }
  }

  test("mm_crossmodal: well-formed ranking; a media twin of the query text is its top match") {
    // standard fixture: 8 text queries, dense ranks, cosine bounded,
    // no self-match (the query's own media row is excluded)
    val rows = q("mm_crossmodal").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).distinct.length == 8)
    rows.groupBy(_._1).values.foreach { qs =>
      assert(qs.sortBy(_._2).map(_._2).toSeq == (1 to qs.length))
      assert(qs.forall(t => t._3 != t._1))
      assert(qs.forall(t => math.abs(t._4) <= 1.0 + 1e-9))
    }
    // planted cross-modal twin: a media doc whose decoded content is
    // the query's text shares its feature direction exactly → cosine 1
    // at the top of query 0's list
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-xmodal").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "src0"),
      (1L, "numbers 123 and CAPITALS here", "en", "src0"),
      (10L, "totally different content with zeds zz", "en", "src1"),
      (11L, "more unrelated words qqq xxx", "en", "src1"),
      (30L, "alpha beta gamma delta epsilon", "en", "src2"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val q0 = SparkEntry.queries("mm_crossmodal")(spark, dir).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(q0.nonEmpty)
    val top = q0.minBy(_._1)
    assert(top._2 == 30L && math.abs(top._3 - 1.0) < 1e-9,
      s"media twin not the top match: ${q0.mkString(",")}")
  }
}
