package graft

class SimilaritySpec extends GraftSuite {

  test("ann_brute: k results per query, cosine in [-1,1], no self-match") {
    val rows = q("ann_brute").collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == 8)
    assert(byQuery.values.forall(_.length == 10))
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
    assert(rows.forall(r => r.getLong(2) != r.getLong(0)))
  }

  test("ann_lsh (4 bands x 4 planes) recalls a useful share of exact top-k") {
    val exact = q("ann_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = q("ann_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // multi-probe (own bucket + 4 hamming-1 buckets per band) measured
    // 0.95 at sf0.001/sf0.01; this floor is the ONLY quality gate the
    // driver-rows-only approximate op has, so keep it tight (r2 verdict)
    assert(recall >= 0.9, s"recall=$recall")
    assert(approx.forall { case (a, b) => a != b })
  }

  test("ann_lsh bits/band is configurable: coarser buckets still recall") {
    val exact = q("ann_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    spark.conf.set("spark.graft.ann.bitsPerBand", "3")
    try {
      val approx = q("ann_lsh").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      val recall = (exact & approx).size.toDouble / exact.size
      // 3 bits = 8 buckets/band → bigger buckets → recall should be at
      // least as good as the 4-bit default's floor
      assert(recall >= 0.9, s"recall=$recall at 3 bits/band")
      assert(approx.forall { case (a, b) => a != b })
    } finally spark.conf.unset("spark.graft.ann.bitsPerBand")
  }

  test("ann_lsh bits/band scales up: 8-bit buckets (corpus-size lever) still recall") {
    // 8 bits = 256 buckets/band is the documented setting for corpora
    // ~16× the fixture (bits ≈ log2(corpus / target bucket size)); on
    // the SMALL fixture it over-partitions, so the probe radius must
    // grow with it — the paired lever: radius 2 probes 37 of 256
    // buckets/band, keeping probed corpus mass comparable to the 4-bit
    // default (radius 1 alone measured recall 0.25 here). The floor is
    // looser than the defaults' 0.9 by design: the bits lever trades
    // per-band recall for bucket size, and this pins that the trade
    // stays useful at the scaled-up setting, not that it is free.
    val exact = q("ann_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    spark.conf.set("spark.graft.ann.bitsPerBand", "8")
    spark.conf.set("spark.graft.ann.probeHamming", "2")
    try {
      val approx = q("ann_lsh").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      val recall = (exact & approx).size.toDouble / exact.size
      assert(recall >= 0.5, s"recall=$recall at 8 bits/band, probe radius 2")
      assert(approx.forall { case (a, b) => a != b })
    } finally {
      spark.conf.unset("spark.graft.ann.bitsPerBand")
      spark.conf.unset("spark.graft.ann.probeHamming")
    }
  }

  test("ann_ivf (trained quantizer, nprobe=4 of derived nlist) beats random bucketing") {
    val exact = q("ann_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = q("ann_ivf").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // defaults: 2 Lloyd rounds, nprobe=4 of nlist=⌈√N⌉=23 buckets on
    // this fixture — probed MASS is 4/23 ≈ 17% (it was 40% when nlist
    // was fixed at 10; shrinking mass at fixed nprobe as the corpus
    // grows IS the sublinear scale contract). The quality gate is that
    // the TRAINED quantizer concentrates neighbors: recall must beat
    // the random-bucketing baseline (= probed mass) by a clear factor.
    // Measured 0.425 ≈ 2.4× mass; floor at 1.5× mass catches a broken
    // quantizer or probe path (recall ≈ mass) with slack for fixture
    // regeneration. Deterministic: decimal-exact ranks, no variance.
    val mass = 4.0 / graft.queries.Similarity.nlistFor(500)
    assert(recall >= 1.5 * mass, s"recall=$recall vs probed mass $mass")
    assert(approx.forall { case (a, b) => a != b })
  }

  test("ann_recall_eval: recall monotone in nprobe, exact 1.0 at nlist") {
    val rows = q("ann_recall_eval").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // the grid the engine served (captured at run time) must be the
    // fraction-of-nlist derivation and fully reflected in the output
    assert(rows.map(_._1).toSeq == graft.queries.Similarity.lastRecallGrid)
    assert(graft.queries.Similarity.lastRecallGrid ==
      graft.queries.Similarity.recallGridFor(rows.last._1))
    // more probed buckets can only ADD candidates: recall nondecreasing
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 >= a._4, s"recall not monotone: $a -> $b")
    }
    // nprobe = nlist probes every bucket — exhaustive, recall exactly 1
    assert(rows.last._4 == 1.0 && rows.last._2 == rows.last._3)
    // ground-truth denominator is the full brute top-K set
    val nBrute = q("ann_brute").count()
    rows.foreach(r => assert(r._3 == nBrute))
    // the eval must agree with the independent set-overlap recall the
    // ann_ivf spec computes (same index, nprobe=4 default)
    val exact = q("ann_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = q("ann_ivf").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val atFour = rows.find(_._1 == 4).get
    assert(atFour._2 == (exact & approx).size,
      "ann_recall_eval at nprobe=4 must equal ann_ivf's measured overlap")
  }

  test("IVF nlist derives from the corpus size: √N-shaped, clamped, monotone") {
    import graft.queries.Similarity.nlistFor
    assert(nlistFor(0) == 10 && nlistFor(100) == 10) // floor clamp
    assert(nlistFor(500) == 23) // ⌈√500⌉ — the fixture regime
    assert(nlistFor(200000) == 448) // the 100× fixture regime
    assert(nlistFor(17000000L) == 4096 && nlistFor(Long.MaxValue) == 4096) // ceiling
    // monotone in N: adding data can never shrink the centroid count,
    // so bucket size stays ~√N instead of reverting toward N/const
    val probes = Seq(0L, 1L, 10L, 99L, 100L, 101L, 500L, 2000L, 65536L,
      200000L, 1000000L, 16777216L, 17000000L, 1000000000L)
    probes.sliding(2).foreach { case Seq(a, b) =>
      assert(nlistFor(a) <= nlistFor(b), s"nlist not monotone at $a -> $b")
    }
  }

  test("ann_ivf Lloyd iterations and nprobe are configurable levers") {
    val exact = q("ann_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallWith(confs: (String, String)*): Double = {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val approx = q("ann_ivf").collect()
          .map(r => (r.getLong(0), r.getLong(2))).toSet
        (exact & approx).size.toDouble / exact.size
      } finally confs.foreach { case (k, _) => spark.conf.unset(k) }
    }
    // fewer probes trade recall for cost but must stay useful; more
    // Lloyd rounds must not break the index at the default probe count
    // (floors calibrated to the derived nlist=23 — probed mass 8.7% /
    // 17% — as multiples of the random-bucketing baseline, see the
    // ann_ivf spec; measured 0.2875 / 0.4375)
    val rNarrow = recallWith("spark.graft.ann.nprobe" -> "2",
      "spark.graft.ann.kmeansIters" -> "1")
    val rTrained = recallWith("spark.graft.ann.kmeansIters" -> "4")
    val nlist = graft.queries.Similarity.nlistFor(500).toDouble
    assert(rNarrow >= 1.5 * 2 / nlist, s"recall=$rNarrow at nprobe=2, 1 iter")
    assert(rTrained >= 1.5 * 4 / nlist, s"recall=$rTrained at nprobe=4, 4 iters")
  }

  test("emb_knn_class predicts a label for every query vector") {
    val rows = q("emb_knn_class").collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getLong(2) >= 1))
  }

  test("dedup_embedding: pairs are same-label, ordered, cosine >= 0.99") {
    val rows = q("dedup_embedding").collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(3) >= 0.99))
  }

  test("dedup_embedding finds planted near-duplicates once each (band collapse)") {
    // the fixture corpus plants no cos>=0.99 pairs (the query's oracle
    // gate is 0 == 0), so the non-empty path — prefilter margin, decimal
    // rescore, and the collapse of a pair surviving in SEVERAL bands to
    // ONE output row — is exercised here on a planted table instead
    import spark.implicits._
    val dim = 64
    val base = Array.tabulate(dim)(i => (i + 1).toFloat / dim)
    val near = base.clone(); near(0) = near(0) + 1e-3f
    val far = Array.tabulate(dim)(i => if (i % 2 == 0) 1f else -1f)
    val rows = Seq(
      (0L, base, 1), (1L, base, 1), (2L, near, 1), // same-label dup cluster
      (3L, far, 1), // same label, far — must not pair
      (4L, base, 2), (5L, far, 2)) // other label — label blocking
    val dir = java.nio.file.Files.createTempDirectory("graft-embdup").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("dedup_embedding")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    // identical/near-identical vectors share every band's bucket, so each
    // pair appears 4× pre-collapse; exactly one output row each
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((0L, 1L), (0L, 2L), (1L, 2L)),
      s"got ${got.mkString(",")}")
    assert(got.forall(t => t._3 == 1 && t._4 >= 0.99))
    // exact duplicate: the decimal cosine is exactly 1.0
    assert(got.find(t => (t._1, t._2) == (0L, 1L)).get._4 == 1.0)
  }

  test("dedup_semantic drops every near-duplicate of a lower-id cluster-mate") {
    // the fixture corpus has no cos>=0.99 pairs (all-kept output there),
    // so the PRUNE path — within-cluster blocking, two-phase verify,
    // greedy min-id keep — is exercised on a planted corpus: ids must be
    // >= NQ(8) so the quantizer trains on them; the 10 one-hot anchors
    // seed 10 mutually-orthogonal clusters, and the dup trio (dense
    // all-positive vectors) lands in the anchor-19 cluster (largest
    // coordinate) as NON-seed members, proving the sub-blocking pairs
    // non-seed cluster-mates.
    import spark.implicits._
    val dim = 64
    def oneHot(j: Int) = Array.tabulate(dim)(i => if (i == j) 1f else 0f)
    val base = Array.tabulate(dim)(i => (i + 1).toFloat / dim)
    val near = base.clone(); near(0) = near(0) + 1e-3f
    val rows = (10 to 19).map(j => (j.toLong, oneHot(j - 10), 1)) ++
      Seq((20L, base, 1), (21L, base, 1), (22L, near, 1),
        // ALL-ZERO vector (positive length, zero norm): not indexable —
        // withNorm drops it at ingest and the oracle's norms CTE drops
        // it identically (round-10 advice + round-11 review finding);
        // the verdict table must not contain it
        (23L, Array.fill(dim)(0f), 1))
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("dedup_semantic")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.map(_._1).toSeq == (10L to 22L), s"got ${got.mkString(",")}")
    assert(!got.exists(_._1 == 23L), "zero-norm vector entered the index")
    // min-id representative (20) kept; its exact copy (21) and the 1e-3
    // perturbation (22) dropped; the orthogonal anchors all kept
    assert(got.filterNot(_._3).map(_._1).toSeq == Seq(21L, 22L),
      s"got ${got.mkString(",")}")
    // the trio shares one cluster — drops are within-cluster by design
    val cid = got.map(t => t._1 -> t._2).toMap
    assert(cid(20L) == cid(21L) && cid(21L) == cid(22L))
  }

  test("ann_ivf_pq: dense ranks, no self-matches, ADC monotone with rank") {
    val rows = q("ann_ivf_pq").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { qs =>
      val sorted = qs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"ranks not dense: $qs")
      assert(sorted.forall(t => t._3 != t._1), "self-match in PQ results")
      // fixed-point ADC distances must be non-decreasing with rank
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq,
        s"ADC not monotone: ${sorted.mkString(",")}")
    }
  }

  test("ann_ivf_pq: a planted exact copy of the query attains the rank-1 ADC distance") {
    // an exact copy gets the query's own codes in every subspace, so its
    // ADC distance is the MINIMUM any vector can have for that query —
    // the structural property that makes PQ retrieval work. (It can TIE
    // with a cell-mate — ADC cannot distinguish same-coded vectors —
    // so the assertion is on the distance, not on strict rank-1.)
    import spark.implicits._
    val dim = 64
    // seed 43 ≡ 9 (mod 17) is the one residue class no seed id 10..25
    // occupies, so the query/copy pair collides with no seed vector
    def vec(seed: Int) = Array.tabulate(dim)(i =>
      (((seed * 31 + i) % 17) - 8).toFloat / 8f)
    val rows =
      Seq((0L, vec(43), 1)) ++                        // the query
        (10 to 25).map(j => (j.toLong, vec(j), 1)) ++ // 16 seed vectors
        Seq((30L, vec(43), 1))                        // exact copy of the query
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val q0 = SparkEntry.queries("ann_ivf_pq")(spark, dir).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    val copy = q0.find(_._2 == 30L)
    assert(copy.isDefined, s"copy missing from the top list: ${q0.mkString(",")}")
    assert(copy.get._3 == q0.minBy(_._1)._3,
      s"copy not at the minimum ADC distance: ${q0.mkString(",")}")
  }

  test("ann_ivfpq_residual: dense ranks, no self-matches, ADC monotone, probed-bucket recall") {
    val rows = q("ann_ivfpq_residual").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { qs =>
      val sorted = qs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"ranks not dense: $qs")
      assert(sorted.forall(t => t._3 != t._1), "self-match in residual-PQ results")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq,
        s"ADC not monotone: ${sorted.mkString(",")}")
    }
    // residual coding retrieves a useful share of the exact cosine
    // top-k despite (a) probing 4 of the derived nlist=23 buckets
    // (~17% mass) and (b) 4-byte code quantization — the qualitative
    // property the residual fusion exists for. L2-over-residual vs
    // cosine ranking differ and ADC noise eats part of the probed-mass
    // ceiling (measured 0.1375 at 17% mass), so the floor is looser
    // than ann_ivf's; it is still the only quality gate this
    // approximate op has beyond the hash-exact oracle — ann_refine's
    // spec pins that the exact rerank recovers from here.
    val exact = q("ann_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = rows.map(r => (r._1, r._3)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.1, s"recall=$recall")
  }

  test("ann_refine: exact rerank dominates raw ADC agreement with brute") {
    val out = q("ann_refine").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).values.foreach { qs =>
      val sorted = qs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"ranks not dense: $qs")
      assert(sorted.forall(t => t._3 != t._1), "self-match in refined results")
      // exact rerank ⇒ cosine non-increasing with rank (rounded output)
      assert(sorted.map(_._4).sliding(2)
        .forall(p => p.length < 2 || p(0) >= p(1) - 1e-9),
        s"cosine not monotone: ${sorted.mkString(",")}")
    }
    // the point of the refine stage: within the shortlist the exact
    // rerank can only IMPROVE agreement with the exact brute top-k —
    // pinned as >= on this fixed fixture (both sets share the probed-
    // bucket recall ceiling; refine fixes ADC's rank noise inside it)
    val exact = q("ann_brute").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val adc = q("ann_ivfpq_residual").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val refined = out.map(r => (r._1, r._3)).toSet
    val adcHits = (exact & adc).size
    val refinedHits = (exact & refined).size
    assert(refinedHits >= adcHits,
      s"refine lost ground: adc=$adcHits refined=$refinedHits")
    assert(refinedHits.toDouble / exact.size >= 0.3,
      s"refined recall=${refinedHits.toDouble / exact.size}")
  }

  test("ann_ivfpq_residual: a planted exact copy of the query attains the rank-1 ADC distance") {
    // the residual of an exact copy (assigned to the same coarse bucket
    // — identical vector, identical argmax) equals the query's residual,
    // so it gets the query's own codes and the minimum ADC distance —
    // the IVFADC analog of the flat-PQ planted-copy property
    import spark.implicits._
    val dim = 64
    def vec(seed: Int) = Array.tabulate(dim)(i =>
      (((seed * 31 + i) % 17) - 8).toFloat / 8f)
    val rows =
      Seq((0L, vec(43), 1)) ++
        (10 to 25).map(j => (j.toLong, vec(j), 1)) ++
        Seq((30L, vec(43), 1))
    val dir = java.nio.file.Files.createTempDirectory("graft-pqres").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val q0 = SparkEntry.queries("ann_ivfpq_residual")(spark, dir).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    val copy = q0.find(_._2 == 30L)
    assert(copy.isDefined, s"copy missing from the top list: ${q0.mkString(",")}")
    assert(copy.get._3 == q0.minBy(_._1)._3,
      s"copy not at the minimum ADC distance: ${q0.mkString(",")}")
  }

  test("ann_filtered_pq: policy rule holds, predicates hold, ADC monotone, agrees with the unfiltered index") {
    import org.apache.spark.sql.functions.col
    val rows = q("ann_filtered_pq").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSet == Set("lang_zh", "label_even"))
    // fixture assumptions (as in the ann_filtered test): no zero/null
    // vectors, so raw counts equal the engine's indexable counts; and
    // labels are non-negative, so `>= 0 && % 2 == 0` equals the
    // engine's isNotNull + even rule
    val zhIds = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("lang") === "zh").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    def matches(pred: String, id: Long): Boolean = pred match {
      case "lang_zh"    => zhIds.contains(id)
      case "label_even" => emb(id) >= 0 && emb(id) % 2 == 0
    }
    val nc = emb.size
    val nMatch = Map(
      "lang_zh" -> emb.keys.count(matches("lang_zh", _)),
      "label_even" -> emb.keys.count(matches("label_even", _)))
    rows.groupBy(_._1).foreach { case (pred, rs) =>
      val expect = if (5L * nMatch(pred) <= nc) "pre" else "post"
      assert(rs.map(_._2).toSet == Set(expect), s"$pred policy ${rs.map(_._2).toSet}")
    }
    rows.foreach { case (pred, _, qid, _, vid, _) =>
      assert(vid != qid)
      assert(matches(pred, vid), s"$pred violated by vec $vid")
    }
    rows.groupBy(r => (r._1, r._3)).values.foreach { rs =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to rs.length))
      // exact fixed-point ADC distances are non-decreasing with rank
      assert(sorted.map(_._6).toSeq == sorted.map(_._6).sorted.toSeq)
    }
    // consistency with the unfiltered IVFADC index: a filtered result's
    // ADC distance comes from the SAME index, so every (query, vec)
    // that also appears in ann_ivfpq_residual's top list must carry
    // the identical score
    val unfiltered = q("ann_ivfpq_residual").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    rows.foreach { case (_, _, qid, _, vid, adc) =>
      unfiltered.get((qid, vid)).foreach(u =>
        assert(u == adc, s"ADC drift between filtered and unfiltered index at ($qid,$vid)"))
    }
  }

  test("ann_range agrees with ann_brute above the radius") {
    val tau = 0.25
    val range = q("ann_range").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(range.forall(_._3 >= tau))
    val rangeSet = range.map(r => (r._1, r._2)).toSet
    // every exact top-k neighbor at or above the radius must be in the
    // range result (range search is exact, not approximate)
    q("ann_brute").collect()
      .filter(_.getDouble(3) >= tau)
      .foreach { r =>
        assert(rangeSet.contains((r.getLong(0), r.getLong(2))),
          s"top-k neighbor above radius missing from ann_range: $r")
      }
  }

  test("hybrid_search_bm25: lexical arm actually de-saturates the overlap ranking") {
    // the BM25 arm exists because distinct-overlap scores TIE whole
    // swaths of the corpus (Similarity's own saturation note) — so on
    // the same fixture the two lexical rankings must genuinely differ
    // for at least one query, and both fusions must stay well-formed
    def lexSets(name: String): Map[Long, Set[Long]] =
      q(name).collect()
        .filter(!_.isNullAt(5)) // rl present = ranked by the lexical arm
        .map(r => (r.getLong(0), r.getLong(2), r.getInt(5)))
        .groupBy(_._1).map { case (qid, rs) =>
          qid -> rs.filter(_._3 <= 5).map(_._2).toSet } // lexical top-5
    val overlap = lexSets("hybrid_search")
    val bm25 = lexSets("hybrid_search_bm25")
    assert(overlap.keySet == bm25.keySet)
    assert(overlap.keys.exists(k => overlap(k) != bm25(k)),
      "BM25 lexical top-5 identical to overlap-count top-5 for every query — " +
        "the weighting is not differentiating")
    // well-formedness: ranks are 1..K dense per query
    val rows = q("hybrid_search_bm25").collect()
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
    }
  }

  test("ann_filtered: policy follows the selectivity rule, predicates hold, both arms recall the filtered brute top-k") {
    import org.apache.spark.sql.functions.col
    val rows = q("ann_filtered").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).toSet == Set("lang_zh", "label_even"))
    // fixture metadata (no zero/null vectors in this fixture, so the
    // raw counts equal the engine's indexable counts)
    val zhIds = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("lang") === "zh").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1),
        r.getSeq[Float](2).toArray))
    val nc = emb.length
    def matches(pred: String, id: Long, label: Int): Boolean = pred match {
      case "lang_zh"    => zhIds.contains(id)
      case "label_even" => label >= 0 && label % 2 == 0
    }
    val nMatch = Map(
      "lang_zh" -> emb.count(e => matches("lang_zh", e._1, e._2)),
      "label_even" -> emb.count(e => matches("label_even", e._1, e._2)))
    // policy column = the exact integer rule the engine and oracle apply
    rows.groupBy(_._1).foreach { case (pred, rs) =>
      val expect = if (5L * nMatch(pred) <= nc) "pre" else "post"
      assert(rs.map(_._2).toSet == Set(expect),
        s"$pred: policy ${rs.map(_._2).toSet}, expected $expect " +
          s"(nm=${nMatch(pred)}, nc=$nc)")
    }
    val labelOf = emb.map(e => e._1 -> e._2).toMap
    // every result satisfies its predicate; no self-matches; dense ranks
    rows.foreach { case (pred, _, qid, _, vid, _) =>
      assert(vid != qid)
      assert(matches(pred, vid, labelOf(vid)), s"$pred violated by vec $vid")
    }
    rows.groupBy(r => (r._1, r._3)).values.foreach { rs =>
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length))
    }
    // recall vs the FILTERED brute-force ground truth (double cosine is
    // fine for set overlap): probing nprobe=4 of the derived nlist=23
    // trained buckets measured 0.425 unfiltered (ann_ivf spec; ~17%
    // probed mass); filtering shrinks per-bucket candidates — measured
    // 0.3375 (lang_zh) / higher (label_even) on this pinned fixture —
    // so the floor is 1.5× the probed-mass baseline, same discipline
    // as the ann_ivf spec
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var i = 0; var d = 0.0; var na = 0.0; var nb = 0.0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val queries = emb.filter(_._1 < 8)
    Seq("lang_zh", "label_even").foreach { pred =>
      val truth = (for {
        (qid, _, qe) <- queries
        top = emb.filter(e => e._1 != qid && matches(pred, e._1, e._2))
          .map(e => (cos(qe, e._3), e._1)).sortBy(t => (-t._1, t._2)).take(10)
        (_, vid) <- top
      } yield (qid, vid)).toSet
      val got = rows.filter(_._1 == pred).map(r => (r._3, r._5)).toSet
      val recall = (truth & got).size.toDouble / truth.size
      val mass = 4.0 / graft.queries.Similarity.nlistFor(500)
      assert(recall >= 1.5 * mass, s"$pred recall=$recall vs probed mass $mass")
    }
  }

  test("emb_pca: projection variance matches the covariance spectrum, components decorrelate") {
    // rebuild the covariance from the ORACLED emb_covariance output and
    // eigendecompose it independently — the projections the query emits
    // must carry exactly that spectrum (projection variance onto an
    // eigenvector vᵀCv = λ; cross-projections decorrelate). Tolerances
    // absorb the two rounding layers (cov and projections at 1e-6).
    val covRows = q("emb_covariance").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3)))
    val dim = covRows.iterator.map(_._1._2).max + 1
    val c = Array.ofDim[Double](dim, dim)
    covRows.foreach { case ((i, j), v) => c(i)(j) = v; c(j)(i) = v }
    val (vals, _) = graft.operators.Eigen.jacobi(c)
    val proj = q("emb_pca").collect()
    val n = proj.length
    assert(n > 0 && vals(0) > 0)
    val pcs = (0 until 8).map(p => proj.map(_.getDouble(1 + p)))
    for (p <- 0 until 8) {
      val mean = pcs(p).sum / n
      assert(math.abs(mean) < 1e-4, s"pc_$p not centered: mean=$mean")
      val variance = pcs(p).map(x => (x - mean) * (x - mean)).sum / n
      assert(math.abs(variance - vals(p)) <= 1e-3 + 1e-3 * vals(p),
        s"pc_$p variance=$variance vs lambda=${vals(p)}")
    }
    for (p <- 0 until 8; r <- p + 1 until 8) {
      val cross = pcs(p).zip(pcs(r)).map { case (a, b) => a * b }.sum / n
      assert(math.abs(cross) <= 1e-3 * math.sqrt(vals(p) * vals(r)) + 1e-6,
        s"pc_$p × pc_$r correlate: $cross")
    }
    // the retained 8 are the TOP of the spectrum (descending)
    assert((0 until 7).forall(p => vals(p) >= vals(p + 1) - 1e-12))
  }

  test("emb_ood_score: mean subspace energy = dimension (exact algebra), flag = threshold") {
    val rows = q("emb_ood_score").collect()
    val n = rows.length
    assert(n > 0)
    // per component, mean(proj²) over the corpus IS the population
    // variance vᵀCv = λ, so mean(m_top) = 8 EXACTLY for any corpus —
    // an algebraic identity of the model, not a distributional
    // assumption (tolerance absorbs the two rounding layers)
    val meanM = rows.map(_.getDouble(1)).sum / n
    assert(math.abs(meanM - 8.0) < 1e-3, s"mean m_top=$meanM")
    assert(rows.forall(_.getDouble(1) >= 0.0))
    // residual energy ‖x−μ‖² − Σ proj² is the mass OUTSIDE the top-8
    // subspace — nonnegative by Bessel's inequality (up to rounding)
    assert(rows.forall(_.getDouble(2) >= -1e-5), "negative residual energy")
    // flag is the unrounded score vs the χ²₈ 99th percentile; check
    // consistency away from the rounding boundary
    rows.foreach { r =>
      val m = r.getDouble(1)
      if (math.abs(m - 20.09) > 1e-5)
        assert(r.getBoolean(3) == (m > 20.09), s"flag mismatch at m_top=$m")
    }
  }
}
