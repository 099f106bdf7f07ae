package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding statistics / curation (see [[SimilarityCore]] for the
  * split rationale): k-means assignment census, cluster-balanced
  * sampling, one-pass covariance, PCA projection, Mahalanobis OOD
  * scoring. */
private[queries] trait SimilarityStats extends SimilaritySql {

  private[queries] def statsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // K-MEANS CLUSTERING as a first-class op — the grouping step
    // semantic curation recipes build on (SemDeDup prunes within
    // embedding clusters; domain discovery and cluster-balanced
    // sampling read the same assignment). Exposes the IVF coarse
    // quantizer's artifacts directly: the deterministically TRAINED
    // centroids ([[ivfCentroids]] — decimal-mean Lloyd, bit-stable)
    // and the margin-gated exact assignment ([[assignCentroid]] — the
    // per-row argmax over the collected model, NO join/shuffle/window;
    // at 100 TB assignment stays a narrow map over the corpus and only
    // the dim-sized cluster-size aggregate exchanges). ORACLED
    // compositionally like ann_ivf: GIVEN the exported centroids,
    // DuckDB reproduces the decimal-exact assignment and sizes.
    "emb_kmeans" -> { (s, d) =>
      val m = kmeansMembers(s, d)
      val sizes = m.groupBy(col("c_id")).agg(count(lit(1)).as("cluster_size"))
      m.join(broadcast(sizes), Seq("c_id"))
        .select(col("vec_id"), col("c_id").as("cluster_id"), col("cluster_size"))
        .orderBy(col("vec_id"))
    },

    // CLUSTER-BALANCED diversity sampling — the consumer the clustering
    // exists for in curation recipes (cluster-and-sample: cap each
    // embedding cluster's contribution so the selected set spans modes
    // instead of mirroring the corpus's density skew). Keep the
    // md5-min-8 vectors per emb_kmeans cluster: the keep decision is
    // the repo's content-stable md5 rule (reruns and engines agree
    // row-by-row), the per-cluster rank is a window PARTITIONED BY
    // cluster (bounded by cluster size — at a production nlist ~√n,
    // clusters are corpus/√n-sized and the window spills, never
    // driver-buffers). Oracled compositionally on the same exported
    // centroids as emb_kmeans.
    "data_sample_cluster_balanced" -> { (s, d) =>
      val m = kmeansMembers(s, d)
      val w = Window.partitionBy(col("c_id"))
        .orderBy(md5(concat(lit("cbal|"), col("vec_id").cast("string"))), col("vec_id"))
      m.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 8)
        .select(col("vec_id"), col("c_id").as("cluster_id"), col("rk"))
        .orderBy(col("cluster_id"), col("rk"))
    },

    // EMBEDDING COVARIANCE — the one-pass Gram/second-moment primitive
    // every linear embedding transform (PCA, whitening, OOD scoring)
    // starts from, as a first-class hash-oracled op. Upper-triangle
    // (i, j, n, cov) rows; exact-decimal term sums make the values
    // engine-identical (see [[covarianceStats]] for the map-side
    // aggregation shape — the corpus is never self-joined or shuffled;
    // the exchange is dim²-bounded). Population covariance (÷ n).
    "emb_covariance" -> { (s, d) =>
      covarianceStats(s, d)
        // + 0.0 folds IEEE −0.0 to +0.0 (the engines disagree on the
        // ZERO'S SIGN after rounding a tiny negative; both agree after
        // the add — same normalization on the oracle side)
        .select(col("i"), col("j"), col("n"),
          (round(col("cov"), 6) + lit(0.0)).as("cov"))
        .orderBy(col("i"), col("j"))
    },

    // PCA PROJECTION — dimensionality reduction as a serving op: every
    // vector projected onto the top-8 principal components of the
    // corpus covariance (centered: (x − μ)·v = x·v − μ·v, the μ·v
    // constant trained into the model). Training is model-sized driver
    // arithmetic over the staged covariance ([[pcaComponents]]:
    // deterministic cyclic Jacobi, canonical eigenpair order + sign —
    // bit-stable across runs/partitionings); serving is ONE narrow
    // codegen projection (8 DecimalDotProduct terms against literal
    // component vectors — the assignCentroid literal-fold shape), no
    // join, no shuffle beyond the presentation sort. ORACLE is
    // compositional like ann_ivf/emb_kmeans: GIVEN the exported
    // components (content-addressed parquet), DuckDB reproduces every
    // projection decimal-exactly — full hash match; the
    // eigendecomposition itself is pinned in ScalaTest (orthonormality,
    // Av = λv residual, spectrum ordering, Σλ = trace, per-component
    // projection variance = λ).
    "emb_pca" -> { (s, d) =>
      val model = pcaModel(s, d)
      val base = withNorm(s, d)
      if (model.comps.isEmpty)
        base.limit(0).select(
          col("vec_id") +: (0 until PcaP).map(p => lit(0.0).as(s"pc_$p")): _*)
      else
        base.select(
          col("vec_id") +: model.comps.map { case (p, v, muDot) =>
            // + 0.0 folds a rounded −0.0 to +0.0 (oracle does the same)
            (round(dotDec(col("embedding"), typedLit(v.toSeq)).cast("double")
              - lit(muDot), 6) + lit(0.0)).as(s"pc_$p")
          }.toSeq: _*)
          .orderBy(col("vec_id"))
    },

    // EMBEDDING OOD/OUTLIER SCORING — the geometric curation op the PCA
    // model exists for beyond projection (SemDeDup prunes duplicates;
    // this prunes the OPPOSITE tail — corrupt/off-manifold vectors):
    // per vector, the Mahalanobis energy in the top-8 principal
    // subspace, m_top = Σ_p proj_p²/λ_p (χ²₈-distributed for in-
    // distribution data — flagged past the 99th percentile 20.09), and
    // the RESIDUAL energy outside it, ‖x−μ‖² − Σ proj_p² (mass the
    // retained subspace can't explain — high residual = off-manifold
    // even when the top-8 energy looks normal). Serving is the same
    // narrow literal-fold projection as emb_pca plus two dot products
    // (x·μ via DecimalDotProduct, x·x = the ingest-contract n2 already
    // on every row) — no join, no shuffle beyond the presentation
    // sort. Every constant (λ, μ, μ·μ) ships to the oracle via the
    // SAME export, so DuckDB replays the full score bit-for-bit: the
    // term sums are exact decimals, the combination is the same
    // left-associated IEEE expression, and the flag compares the
    // UNROUNDED score on both engines. Full hash match.
    "emb_ood_score" -> { (s, d) =>
      val model = pcaModel(s, d)
      val base = withNorm(s, d)
      if (model.comps.isEmpty)
        base.limit(0).select(col("vec_id"), lit(0.0).as("m_top"),
          lit(0.0).as("resid"), lit(false).as("is_outlier"))
      else {
        // Round-16 optimization: materialize each projection (and x·μ)
        // ONCE as a named column in a first projection, then combine —
        // the single-select form repeated every DecimalDotProduct
        // subtree in 2–3 output expressions (m_top, resid, the
        // unrounded flag), and codegen subexpression elimination does
        // not reach across all of them, so each row paid ~2× the 9
        // decimal dots (whose per-term Double→Decimal rounding is the
        // pinned oracle cost). Two stacked projections collapse into
        // one WholeStageCodegen projection; values and the left-assoc
        // combination order are untouched.
        val projected = base.select(
          col("vec_id") +: col("n2") +:
            model.comps.map { case (p, v, muDot) =>
              (dotDec(col("embedding"), typedLit(v.toSeq)).cast("double")
                - lit(muDot)).as(s"proj_$p")
            }.toSeq :+
            dotDec(col("embedding"), typedLit(model.mu.toSeq))
              .cast("double").as("x_mu"): _*)
        val projs = model.comps.map { case (p, _, _) => col(s"proj_$p") }
        val mTop = projs.zipWithIndex
          .map { case (c, p) => c * c / lit(model.lambda(p)) }
          .reduce(_ + _) // left-assoc — the oracle writes t0+t1+…+t7
        val sumSq = projs.map(c => c * c).reduce(_ + _)
        val resid = col("n2").cast("double") - lit(2.0) * col("x_mu") +
          lit(model.muMu) - sumSq
        projected.select(col("vec_id"),
          (round(mTop, 6) + lit(0.0)).as("m_top"),
          (round(resid, 6) + lit(0.0)).as("resid"),
          // χ²₈ 99th percentile; compared on the UNROUNDED score
          (mTop > lit(20.09)).as("is_outlier"))
          .orderBy(col("vec_id"))
      }
    },
  )

  private[queries] def statsOracles: Map[String, String] = Map(
    // same exported-centroid assignment CTEs, md5-min-8 window per
    // cluster (the vec_id tiebreak matters only for md5 collisions)
    "data_sample_cluster_balanced" ->
      s"""WITH $exSql,
         |$assignMembersSql,
         |rk AS (
         |  SELECT vec_id, c_id AS cluster_id,
         |         row_number() OVER (PARTITION BY c_id
         |           ORDER BY md5('cbal|' || CAST(vec_id AS VARCHAR)), vec_id) AS rk
         |  FROM members)
         |SELECT vec_id, cluster_id, CAST(rk AS INT) AS rk
         |FROM rk WHERE rk <= 8
         |ORDER BY cluster_id, rk""".stripMargin,

    // same exported-centroid assignment CTEs as ann_ivf, stopped at
    // `members` and joined to the per-cluster counts
    "emb_kmeans" ->
      s"""WITH $exSql,
         |$assignMembersSql,
         |cs AS (SELECT c_id, count(*) AS cluster_size FROM members GROUP BY c_id)
         |SELECT m.vec_id, m.c_id AS cluster_id, cs.cluster_size
         |FROM members m JOIN cs USING (c_id)
         |ORDER BY m.vec_id""".stripMargin,

    // mirrors covarianceStats value-for-value: same DOUBLE products
    // rounded once to DECIMAL(38,12), exact sums (order-free), same
    // IEEE cov derivation; the vec_id self-join here is the oracle's
    // mechanism only — the engine never joins the corpus (two chained
    // generators + dim²-bounded hash aggregation)
    "emb_covariance" ->
      s"""WITH $exSql,
         |v AS (SELECT e.vec_id, CAST(e.i - 1 AS INT) AS i, e.x
         |      FROM ex e JOIN norms USING (vec_id)),
         |p AS (SELECT a.i AS i, b.i AS j, count(*) AS n,
         |             sum(CAST(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE) AS DECIMAL(38,12))) AS sxy
         |      FROM v a JOIN v b ON a.vec_id = b.vec_id AND b.i >= a.i
         |      GROUP BY a.i, b.i),
         |s AS (SELECT i, sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS sx
         |      FROM v GROUP BY i)
         |SELECT p.i, p.j, p.n,
         |       round(CAST(p.sxy AS DOUBLE) / p.n -
         |             (CAST(si.sx AS DOUBLE) / p.n) * (CAST(sj.sx AS DOUBLE) / p.n), 6) + 0.0 AS cov
         |FROM p JOIN s si ON si.i = p.i JOIN s sj ON sj.i = p.j
         |ORDER BY p.i, p.j""".stripMargin,

    // COMPOSITIONAL oracle (the ann_ivf/emb_kmeans recipe): GIVEN the
    // exported principal components (training is deterministic —
    // cyclic Jacobi with canonical order/sign over the exact-decimal
    // covariance), DuckDB reproduces every centered projection
    // decimal-exactly: same per-term DOUBLE products rounded to
    // DECIMAL(38,12), exact sums, same μ·v subtraction
    "emb_pca" ->
      s"""WITH $exSql,
         |v AS (SELECT e.vec_id, CAST(e.i - 1 AS INT) AS i, e.x
         |      FROM ex e JOIN norms USING (vec_id)),
         |pc AS (SELECT component, i, v AS cv, mu_dot
         |       FROM parquet_scan('${pcaOracleComponentsPath(lastPca)}')),
         |proj AS (SELECT v.vec_id, pc.component,
         |                sum(CAST(CAST(v.x AS DOUBLE) * CAST(pc.cv AS DOUBLE) AS DECIMAL(38,12))) AS pr,
         |                max(pc.mu_dot) AS mu_dot
         |         FROM v JOIN pc ON pc.i = v.i
         |         GROUP BY v.vec_id, pc.component)
         |SELECT vec_id,
         |${(0 until PcaP).map(p =>
        s"       round(CAST(max(CASE WHEN component = $p THEN pr END) AS DOUBLE) - " +
          s"max(CASE WHEN component = $p THEN mu_dot END), 6) + 0.0 AS pc_$p").mkString(",\n")}
         |FROM proj GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // same export, same decimal term sums, same left-associated IEEE
    // combination as the engine (see the query's contract note); the
    // outlier flag compares the UNROUNDED score on both engines
    "emb_ood_score" ->
      s"""WITH $exSql,
         |v AS (SELECT e.vec_id, CAST(e.i - 1 AS INT) AS i, e.x
         |      FROM ex e JOIN norms USING (vec_id)),
         |pc AS (SELECT component, i, v AS cv, mu_dot, lambda, mu, mu_mu
         |       FROM parquet_scan('${pcaOracleComponentsPath(lastPca)}')),
         |proj AS (SELECT v.vec_id, pc.component,
         |                CAST(sum(CAST(CAST(v.x AS DOUBLE) * CAST(pc.cv AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
         |                  - max(pc.mu_dot) AS pr,
         |                max(pc.lambda) AS lam
         |         FROM v JOIN pc ON pc.i = v.i
         |         GROUP BY v.vec_id, pc.component),
         |w AS (SELECT vec_id,
         |${(0 until PcaP).map(p =>
        s"             max(CASE WHEN component = $p THEN pr END) AS p$p," +
          s" max(CASE WHEN component = $p THEN lam END) AS l$p").mkString(",\n")}
         |      FROM proj GROUP BY vec_id),
         |xm AS (SELECT v.vec_id,
         |              CAST(sum(CAST(CAST(v.x AS DOUBLE) * CAST(m.mu AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS xmu
         |       FROM v JOIN (SELECT DISTINCT i, mu FROM pc) m ON m.i = v.i
         |       GROUP BY v.vec_id),
         |scored AS (SELECT w.vec_id,
         |                  ${(0 until PcaP).map(p => s"p$p * p$p / l$p").mkString(" + ")} AS m_top,
         |                  CAST(n.n2 AS DOUBLE) - 2.0 * xm.xmu
         |                    + (SELECT max(mu_mu) FROM pc)
         |                    - (${(0 until PcaP).map(p => s"p$p * p$p").mkString(" + ")}) AS resid
         |           FROM w JOIN xm USING (vec_id) JOIN norms n USING (vec_id))
         |SELECT vec_id,
         |       round(m_top, 6) + 0.0 AS m_top,
         |       round(resid, 6) + 0.0 AS resid,
         |       m_top > 20.09 AS is_outlier
         |FROM scored ORDER BY vec_id""".stripMargin,

  )
}
