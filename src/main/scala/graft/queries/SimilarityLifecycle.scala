package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Index lifecycle gates (see [[SimilarityCore]] for the split
  * rationale): stream-built IVFADC index maintenance (gate 15) and
  * tombstone-delete + drift-triggered retrain verdicts (gate 16). */
private[queries] trait SimilarityLifecycle extends SimilaritySql {

  /** Lifecycle thresholds (gate 16): a bucket RETRAINS when it lost at
    * least 1/LifecycleDelDen of its training members (takedown mass
    * invalidates the local geometry the codebooks were trained on) OR
    * when the live members' mean quantized-residual energy drifts more
    * than 1/LifecycleDriftDen relative from the frozen training
    * snapshot. Both rules are exact integer comparisons
    * (cross-multiplied — no division, no floats), so the oracle
    * replays them bit-for-bit at any corpus size. */
  private[queries] val LifecycleDelDen = 6L
  private[queries] val LifecycleDriftDen = 50L

  /** The takedown feed: one full source takedown (label = 1) plus
    * scattered per-item requests (vec_id % 13 = 5) — the two shapes a
    * production tombstone list mixes. Deterministic and data-derived,
    * so the DuckDB oracle regenerates the identical list. */
  private[queries] def tombstoneIds(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .filter(col("label") === 1 || col("vec_id") % 13 === 5)
      .select(col("vec_id"))

  /** One tombstone-application step of the gate-16 maintenance stream:
    * the batch's ids become op='D' delta rows (payload columns NULL —
    * a delete only needs the key) applied through the shared MERGE
    * operator; a tombstone for an id the index doesn't hold is a no-op,
    * per SQL MERGE. */
  private[queries] def deleteStep(cur: DataFrame, batch: DataFrame): DataFrame = {
    val delta = cur.columns.filterNot(_ == "vec_id").foldLeft(
      batch.select(col("vec_id"))) { (acc, c) =>
        acc.withColumn(c, lit(null).cast(cur.schema(c).dataType)) }
      .withColumn("op", lit("D"))
    graft.operators.Merge.merge(cur, delta, "vec_id").drop("action")
  }

  private[queries] def lifecycleQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // STREAMING INDEX MAINTENANCE (gate 15) — the job that keeps the
    // IVFADC index CURRENT as embeddings arrive: vectors replay as
    // chunked micro-batches, each batch passes the same per-row ingest
    // contract ([[indexable]]), is assigned + residual-encoded with
    // the FROZEN serving artifacts (the trained coarse centroids and
    // residual sub-codebooks — a production updater trains once /
    // periodically and freezes between retrains), and APPENDS to the
    // versioned index table (foreachBatch, append-only — the
    // upsertLatestPerUser plumbing without the merge, since vec_ids
    // are immutable). Because encoding is per-row under frozen
    // artifacts, the stream-built index equals the batch encode
    // row-for-row WHATEVER the batch boundaries — so the oracle is the
    // batch derivation (members + codes from the two exported
    // artifacts), a full hash gate, and gate 14 + gate 15 together
    // cover the two ingest jobs a continuously-crawled corpus runs
    // (dedup the arrivals; index the survivors). Scale shape: each
    // micro-batch is one narrow assign+encode projection (model
    // artifacts broadcast as literals) and one append — no state
    // store, no shuffle; the index IS the state.
    "streaming_index_maintain" -> { (s, d) =>
      // the PARENT session, not stateSizedSession: there is no stateful
      // operator here (foreachBatch append-only — no state store to
      // size), and the state-partition derivation reads events.parquet,
      // which has nothing to do with the embeddings being indexed
      // (review finding)
      val iters = annKmeansIters(s)
      val centDf = ivfCentroids(s, d, iters)
      val centArr = collectQuantizer(centDf)
      def empty = withNorm(s, d).limit(0)
        .select(col("vec_id") +: lit(0L).as("c_id") +:
          (0 until PqM).map(m => lit(0).as(s"code_$m")): _*)
      if (centArr.isEmpty) empty
      else {
        val cb = collectPqCodebook(pqResCodebooks(s, d, iters, centDf, centArr))
        if (cb.isEmpty) empty
        else {
          def encodeBatch(raw: DataFrame): DataFrame =
            pqEncode(residuals(centDf, centArr)(indexable(raw)), cb)
              .select(col("vec_id") +: col("c_id") +:
                (0 until PqM).map(m => col(s"code_$m")): _*)
          // 2 chunks, not 4 (round-13 diet): the boundary-independence
          // proof above holds for ANY split, so two micro-batches carry
          // the full multi-batch demonstration at half the per-batch
          // commit/planning fixed cost (measured ~0.9 s/batch at sf0.1)
          graft.streaming.Streaming.appendThroughGate(
            graft.streaming.Streaming.embeddingsStreamChunked(s, d, 2),
            encodeBatch, empty)
            .orderBy(col("vec_id"))
        }
      }
    },

    // INDEX LIFECYCLE (gate 16, round-13 verdict item 1) — the two
    // maintenance jobs gates 14/15 left uncovered: DELETES from the
    // serving index (takedowns + dedup-driven removals arrive as a
    // tombstone CDC feed; each micro-batch MERGE-deletes its ids from
    // the versioned index table through the same [[graft.operators
    // .Merge]] op='D' path the batch CDC operator uses) and DRIFT
    // DETECTION (has the corpus the index now serves moved far enough
    // from the frozen training snapshot that the quantizer/codebooks
    // need retraining?). Deletes of distinct keys commute, so the
    // stream-maintained live index equals the batch anti-join WHATEVER
    // the batch boundaries — the gate-15 argument — and the whole
    // verdict is a batch derivation the DuckDB oracle replays exactly.
    //
    // The drift statistic is computed FROM THE INDEX ITSELF, never the
    // float corpus: each vector's quantized-residual energy is the sum
    // of its assigned sub-codebook entries' self-distances — a per-(m,
    // code) MODEL table (≤ M·Ksub rows) folded into literal lookup
    // arrays, so the per-vector qfp is one narrow codegen projection
    // over the coded index (the production property: lifecycle jobs
    // run on the compact index, not on 100 TB of floats). Per bucket,
    // RETRAIN fires on either exact integer rule: the bucket lost
    // ≥ 1/6 of its training members, or the live members' mean
    // quantized-residual energy drifted > 1/50 relative from the
    // training snapshot (cross-multiplied BIGINT/decimal comparisons —
    // no division, no floats, bit-replayable by the oracle).
    //
    // Scale shape: the tombstone feed is takedown-sized; each MERGE is
    // one key-partitioned join of a tombstone-sized delta against the
    // skinny coded index (a lakehouse deployment would use delete
    // vectors instead of table rewrites — same semantics); the stats
    // are two hash aggregations of the coded index down to nlist rows,
    // joined broadcast. The 38-digit decimal cross products hold to
    // ~10^14 indexed vectors per shard; beyond that the statistic
    // shards per bucket range first.
    "ann_index_lifecycle" -> { (s, d) =>
      val iters = annKmeansIters(s)
      val centDf = ivfCentroids(s, d, iters)
      val centArr = collectQuantizer(centDf)
      def empty = withNorm(s, d).limit(0).select(
        lit(0L).as("c_id"), lit(0L).as("n_train"), lit(0L).as("n_live"),
        lit(0L).as("n_deleted"), lit(0L).as("norm_train_fp"),
        lit(0L).as("norm_live_fp"), lit(false).as("retrain"))
      if (centArr.isEmpty) empty
      else {
        val cbDf = pqResCodebooks(s, d, iters, centDf, centArr)
        val cb = collectPqCodebook(cbDf)
        if (cb.isEmpty) empty
        else {
          val coded = residualCodedCorpus(s, d, iters, centDf, centArr, cb)
          // per-(m, code) quantized-residual self-energy, fixed point —
          // computed through the same decimal protocol as every ranking
          // distance (dotDec → d2Fp), collected model-sized (≤ 64 rows)
          val nfp = cbDf.select(col("m"), col("code"),
              d2Fp(dotDec(col("c_sub"), col("c_sub")).cast("decimal(20,12)"))
                .as("nfp"))
            .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
          val maxCode = cb.map(_._2).max
          def qfpCol: Column = (0 until PqM).map { m =>
            element_at(array((0 to maxCode).map(code =>
              lit(nfp.getOrElse((m, code), 0L))): _*), col(s"code_$m") + 1)
          }.reduce(_ + _)
          // live index: the tombstone feed replayed as 2 micro-batches
          // (deletes commute — any split carries the multi-batch
          // demonstration), each MERGE-deleted from the versioned table
          val live = graft.streaming.Streaming.maintainThroughGate(
            graft.streaming.Streaming.idsStreamChunked(
              s, d, "tomb", tombstoneIds(s, d), 2),
            "graft-gate-lifecycle-", initial = Some(coded),
            step = (cur, batch) => deleteStep(cur.get, batch),
            emptyResult = coded)
          def stats(df: DataFrame, n: String, sm: String): DataFrame =
            df.withColumn("qfp", qfpCol).groupBy(col("c_id"))
              // decimal-summed: a BIGINT sum would wrap silently at
              // scales a 100 TB shard reaches; decimal(38,0) is exact
              .agg(count(lit(1)).as(n),
                sum(col("qfp").cast("decimal(28,0)")).as(sm))
          val j = stats(coded, "n_train", "s_train")
            .join(broadcast(stats(live, "n_live", "s_live")), Seq("c_id"), "left")
            .withColumn("n_live", coalesce(col("n_live"), lit(0L)))
            .withColumn("s_live", coalesce(col("s_live"), lit(0).cast("decimal(38,0)")))
          // exact integer cross products: cast to the narrowest widths
          // that hold the magnitudes so no product exceeds precision 38
          def xmul(sc: Column, nc: Column): Column =
            sc.cast("decimal(24,0)") * nc.cast("decimal(10,0)")
          val del = lit(LifecycleDelDen) * (col("n_train") - col("n_live")) >=
            col("n_train")
          val drift = lit(LifecycleDriftDen).cast("decimal(3,0)") *
            abs(xmul(col("s_live"), col("n_train")) - xmul(col("s_train"), col("n_live"))) >
            xmul(col("s_train"), col("n_live"))
          j.select(col("c_id"), col("n_train"), col("n_live"),
              (col("n_train") - col("n_live")).as("n_deleted"),
              col("s_train").cast("long").as("norm_train_fp"),
              col("s_live").cast("long").as("norm_live_fp"),
              (del || drift).as("retrain"))
            .orderBy(col("c_id"))
        }
      }
    },
  )

  private[queries] def lifecycleOracles: Map[String, String] = Map(

    // the stream-built index must equal the BATCH derivation row for
    // row (per-row encoding under frozen artifacts is independent of
    // batch boundaries): members + codes from the shared residual CTE
    // chain, codes pivoted to the index's column layout
    "streaming_index_maintain" ->
      s"""WITH $exSql,
         |$assignMembersSql,
         |$residualCodesSql,
         |codesp AS (
         |  SELECT vec_id,
         |         ${(0 until PqM).map(m =>
        s"CAST(max(CASE WHEN m = $m THEN code END) AS INT) AS code_$m")
        .mkString(",\n         |         ")}
         |  FROM codes GROUP BY vec_id)
         |SELECT mm.vec_id, mm.c_id, ${(0 until PqM).map(m => s"cp.code_$m").mkString(", ")}
         |FROM members mm JOIN codesp cp ON cp.vec_id = mm.vec_id
         |ORDER BY mm.vec_id""".stripMargin,

    // gate 16: the live index is the batch anti-join of the coded index
    // against the tombstone list (deletes of distinct keys commute, so
    // the stream-maintained table equals it under any batch split); the
    // per-vector quantized-residual energy re-derives from the exported
    // sub-codebooks through the engine's exact d2Fp narrowing, and both
    // retrain rules replay as integer comparisons (HUGEINT cross
    // products — DuckDB BIGINT×BIGINT errors on overflow rather than
    // widening, and the DECIMAL route would silently fall to DOUBLE
    // past width 38)
    "ann_index_lifecycle" ->
      s"""WITH $exSql,
         |$assignMembersSql,
         |$residualCodesSql,
         |ncb AS (
         |  SELECT m, code,
         |         CAST(CAST(sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS DECIMAL(24,12)) *
         |              CAST($PqFp AS DECIMAL(13,0)) AS BIGINT) AS nfp
         |  FROM rcb GROUP BY m, code),
         |qn AS (SELECT c.vec_id, CAST(sum(n.nfp) AS BIGINT) AS qfp
         |       FROM codes c JOIN ncb n ON n.m = c.m AND n.code = c.code
         |       GROUP BY c.vec_id),
         |idx AS (SELECT mm.vec_id, mm.c_id, q.qfp
         |        FROM members mm JOIN qn q ON q.vec_id = mm.vec_id),
         |tomb AS (SELECT vec_id FROM embeddings WHERE label = 1 OR vec_id % 13 = 5),
         |lv AS (SELECT i.* FROM idx i LEFT JOIN tomb t ON t.vec_id = i.vec_id
         |       WHERE t.vec_id IS NULL),
         |ts AS (SELECT c_id, count(*) AS n_train, CAST(sum(qfp) AS BIGINT) AS s_train
         |       FROM idx GROUP BY c_id),
         |ls AS (SELECT c_id, count(*) AS n_live, CAST(sum(qfp) AS BIGINT) AS s_live
         |       FROM lv GROUP BY c_id)
         |SELECT t.c_id, t.n_train,
         |       CAST(coalesce(l.n_live, 0) AS BIGINT) AS n_live,
         |       CAST(t.n_train - coalesce(l.n_live, 0) AS BIGINT) AS n_deleted,
         |       t.s_train AS norm_train_fp,
         |       CAST(coalesce(l.s_live, 0) AS BIGINT) AS norm_live_fp,
         |       ($LifecycleDelDen * (t.n_train - coalesce(l.n_live, 0)) >= t.n_train
         |        OR $LifecycleDriftDen * abs(CAST(coalesce(l.s_live, 0) AS HUGEINT) * t.n_train
         |             - CAST(t.s_train AS HUGEINT) * coalesce(l.n_live, 0))
         |           > CAST(t.s_train AS HUGEINT) * coalesce(l.n_live, 0)) AS retrain
         |FROM ts t LEFT JOIN ls l ON l.c_id = t.c_id
         |ORDER BY t.c_id""".stripMargin,

  )
}
