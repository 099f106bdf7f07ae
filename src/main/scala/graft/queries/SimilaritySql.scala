package graft.queries

/** The Similarity family's shared DuckDB oracle CTE builders (see
  * [[SimilarityCore]] for the split rationale): exploded-vector norms,
  * exact pair scoring, LSH buckets, exported-centroid assignment,
  * residual PQ codes + ADC, and the filtered-search policy arms. */
private[queries] trait SimilaritySql extends SimilarityCore {

  /** Shared oracle CTEs: per-element exploded view + decimal norms.
    * The HAVING mirrors [[withNorm]]'s ingest filter EXACTLY: an
    * all-zero vector is not indexable (round-10 advice), and the
    * double sum of squares is 0 iff every element is 0 (float32
    * squares cannot underflow a double), the same predicate the
    * engine's codegen float self-dot evaluates — NOT `n2 > 0`, whose
    * per-term DECIMAL(…,12) rounding would also drop tiny-but-nonzero
    * vectors the engine keeps. NaN elements: Spark's `NaN > 0` is
    * false (vector dropped) while DuckDB orders NaN above every
    * number, so the HAVING carries an explicit NOT isnan to keep the
    * predicates identical. Accepted residual (review-noted, adversarial
    * only): a vector whose EVERY |element| < ~7e-7 passes both filters
    * yet rounds to decimal n2 = 0, so its cosines are NULL with
    * engine-specific ordering — a real ingest normalizes vectors, and
    * excluding the class would need a magnitude threshold whose
    * boundary ulps differ across engines. Every oracle consumer
    * reaches vectors through `norms` (or through `members`, which
    * joins it), so the filter applies corpus-wide. */
  private[queries] val exSql =
    """ex AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS x
      |       FROM embeddings),
      |norms AS (
      |  SELECT vec_id,
      |         sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS n2
      |  FROM ex GROUP BY vec_id
      |  HAVING sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) > 0
      |     AND NOT isnan(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""".stripMargin

  private[queries] def pairSql(nq: Int): String =
    s"""pairs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
       |         CAST(sum(CAST(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
       |           / sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS cosine
       |  FROM ex q
       |  JOIN ex c ON q.i = c.i AND q.vec_id < $nq AND c.vec_id <> q.vec_id
       |  JOIN norms nq ON nq.vec_id = q.vec_id
       |  JOIN norms nc ON nc.vec_id = c.vec_id
       |  GROUP BY q.vec_id, c.vec_id, nq.n2, nc.n2)""".stripMargin

  /** Hyperplane LSH bucketing CTEs (planes → projections → buckets) —
    * mirrors lshBucketed at 4 bands × the DERIVED bitsPerBand: `bcfg`
    * recomputes [[bitsFor]]'s integer rule (smallest b ≥ 4 with
    * 2^b · 200 ≥ count) from the same table, so the oracle tracks the
    * engine at ANY corpus size — exact integer comparisons, no
    * cross-engine log2 rounding hazard. Shared by the ann_lsh and
    * dedup_embedding oracles. */
  private[queries] val lshBucketsSql =
    s"""bcfg AS (
       |  SELECT min(b) AS bits
       |  FROM (SELECT unnest(generate_series(4, 30)) AS b),
       |       (SELECT count(*) AS n FROM embeddings)
       |  WHERE (CAST(1 AS BIGINT) << b) * $TargetBucket >= n),
       |planes AS (
       |  SELECT p, i,
       |         ('0x' || substr(md5(CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 6))::INTEGER
       |           / 8388608.0 - 1.0 AS c
       |  FROM (SELECT unnest(generate_series(0, 119)) AS p),
       |       (SELECT unnest(generate_series(0, 63)) AS i)
       |  WHERE p < 4 * (SELECT bits FROM bcfg)),
       |projections AS (
       |  SELECT e.vec_id, pl.p, sum(pl.c * CAST(e.x AS DOUBLE) ORDER BY pl.i) AS proj
       |  FROM ex e JOIN planes pl ON pl.i = e.i - 1
       |  GROUP BY e.vec_id, pl.p),
       |buckets AS (
       |  SELECT vec_id, p // (SELECT bits FROM bcfg) AS band,
       |         CAST(sum(CASE WHEN proj >= 0
       |                       THEN (CAST(1 AS BIGINT) << ((SELECT bits FROM bcfg) - 1 - p % (SELECT bits FROM bcfg)))
       |                       ELSE 0 END) AS INTEGER) AS bucket
       |  FROM projections GROUP BY vec_id, p // (SELECT bits FROM bcfg))""".stripMargin

  // a def, not a val: the ann_ivf oracle embeds the fixture-keyed
  // centroid-export path of the LAST ann_ivf build (Verify dumps oracle
  // SQL after running the queries, so the path matches the run it checks)
  /** Exported-centroid assignment CTE chain (cex → cnorms → assign →
    * ranked → members) — the SQL twin of [[assignCentroid]], shared by
    * the ann_ivf / emb_kmeans / data_sample_cluster_balanced oracles so
    * a tiebreak or decimal-scale change cannot silently diverge one of
    * them (the engine side shares assignCentroid for the same reason).
    * A DEF: it reads [[lastIvf]] at oracle-dump time, like the entries
    * that embed it (`oracles` itself is a def). Expects `ex`/`norms`
    * from $exSql in scope. */
  private[queries] def assignMembersSql: String =
    s"""cex AS (SELECT c_id, generate_subscripts(c_emb, 1) AS i, unnest(c_emb) AS x
       |        FROM parquet_scan('${ivfOracleCentroidsPath(lastIvf._1, lastIvf._2, lastIvf._3)}')),
       |cnorms AS (
       |  SELECT c_id,
       |         sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS n2
       |  FROM cex GROUP BY c_id),
       |assign AS (
       |  SELECT e.vec_id, c.c_id,
       |         CAST(sum(CAST(CAST(e.x AS DOUBLE) * CAST(c.x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
       |           / sqrt(CAST(n.n2 AS DOUBLE) * CAST(cn.n2 AS DOUBLE)) AS c_cos
       |  FROM ex e
       |  JOIN cex c ON c.i = e.i
       |  JOIN norms n ON n.vec_id = e.vec_id
       |  JOIN cnorms cn ON cn.c_id = c.c_id
       |  GROUP BY e.vec_id, c.c_id, n.n2, cn.n2),
       |ranked AS (
       |  SELECT vec_id, c_id,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, c_id) AS c_rank
       |  FROM assign),
       |members AS (SELECT vec_id, c_id FROM ranked WHERE c_rank = 1)""".stripMargin

  /** The residual ENCODING CTE chain (residual sub-codebooks →
    * per-vector residual encoding → winning codes) — the coded-index
    * derivation alone, shared by [[residualAdcSql]] (which adds the
    * query-side ADC tail) and the oracles that only need the index
    * itself (streaming_index_maintain, ann_index_lifecycle). A DEF:
    * embeds the fixture-keyed codebook export path of the last build,
    * like [[assignMembersSql]]. Expects ex/norms/cex/members in scope;
    * yields `rcb(m, code, j, x)` and `codes(vec_id, m, code)`. */
  private[queries] def residualCodesSql: String =
    s"""rcb AS (SELECT m, code, generate_subscripts(c_sub, 1) AS j, unnest(c_sub) AS x
       |        FROM parquet_scan('${pqResOracleCodebookPath(lastPqRes._1, lastPqRes._2, lastPqRes._3)}')),
       |res AS (
       |  SELECT e.vec_id, mm.c_id,
       |         CAST((e.i - 1) // $PqSubDim AS INT) AS m,
       |         CAST((e.i - 1) % $PqSubDim + 1 AS INT) AS j,
       |         CAST(CAST(e.x AS DOUBLE) - CAST(c.x AS DOUBLE) AS REAL) AS r
       |  FROM ex e
       |  JOIN members mm ON mm.vec_id = e.vec_id
       |  JOIN cex c ON c.c_id = mm.c_id AND c.i = e.i),
       |d2r AS (
       |  SELECT r.vec_id, r.m, b.code,
       |         sum(CAST(CAST(r.r AS DOUBLE) * CAST(r.r AS DOUBLE) AS DECIMAL(38,12)))
       |       - 2 * sum(CAST(CAST(r.r AS DOUBLE) * CAST(b.x AS DOUBLE) AS DECIMAL(38,12)))
       |       + sum(CAST(CAST(b.x AS DOUBLE) * CAST(b.x AS DOUBLE) AS DECIMAL(38,12))) AS d2dec
       |  FROM res r JOIN rcb b ON b.m = r.m AND b.j = r.j
       |  GROUP BY r.vec_id, r.m, b.code),
       |codes AS (
       |  SELECT vec_id, m, code FROM (
       |    SELECT vec_id, m, code,
       |           row_number() OVER (PARTITION BY vec_id, m ORDER BY d2dec, code) AS rn
       |    FROM d2r) WHERE rn = 1)""".stripMargin

  /** The full IVFADC CTE chain ([[residualCodesSql]] + probe residual
    * ADC tables → summed BIGINT scores over probed buckets), ONE copy
    * shared by the ann_ivfpq_residual and ann_filtered_pq oracles (the
    * incrementalOracle discipline). Expects ex/norms/cex/members/ranked
    * in scope; yields `adc(query_id, vec_id, adc_d2_fp)`. */
  private[queries] def residualAdcSql: String =
    s"""$residualCodesSql,
       |probes AS (SELECT vec_id AS query_id, c_id FROM ranked
       |           WHERE vec_id < $NQ AND c_rank <= 4),
       |qres AS (
       |  SELECT p.query_id, p.c_id,
       |         CAST((e.i - 1) // $PqSubDim AS INT) AS m,
       |         CAST((e.i - 1) % $PqSubDim + 1 AS INT) AS j,
       |         CAST(CAST(e.x AS DOUBLE) - CAST(c.x AS DOUBLE) AS REAL) AS r
       |  FROM probes p
       |  JOIN ex e ON e.vec_id = p.query_id
       |  JOIN cex c ON c.c_id = p.c_id AND c.i = e.i),
       |qd2 AS (
       |  SELECT q.query_id, q.c_id, q.m, b.code,
       |         sum(CAST(CAST(q.r AS DOUBLE) * CAST(q.r AS DOUBLE) AS DECIMAL(38,12)))
       |       - 2 * sum(CAST(CAST(q.r AS DOUBLE) * CAST(b.x AS DOUBLE) AS DECIMAL(38,12)))
       |       + sum(CAST(CAST(b.x AS DOUBLE) * CAST(b.x AS DOUBLE) AS DECIMAL(38,12))) AS d2dec
       |  FROM qres q JOIN rcb b ON b.m = q.m AND b.j = q.j
       |  GROUP BY q.query_id, q.c_id, q.m, b.code),
       |qtab AS (SELECT query_id, c_id, m, code,
       |                CAST(CAST(d2dec AS DECIMAL(24,12)) *
       |                     CAST($PqFp AS DECIMAL(13,0)) AS BIGINT) AS dfp
       |         FROM qd2),
       |adc AS (
       |  SELECT q.query_id, mm.vec_id, CAST(sum(q.dfp) AS BIGINT) AS adc_d2_fp
       |  FROM members mm
       |  JOIN codes cd ON cd.vec_id = mm.vec_id
       |  JOIN qtab q ON q.c_id = mm.c_id AND q.m = cd.m AND q.code = cd.code
       |  WHERE mm.vec_id <> q.query_id
       |  GROUP BY q.query_id, mm.vec_id)""".stripMargin

  /** The selectivity-policy CTE chain + final SELECT shared by the
    * ann_filtered and ann_filtered_pq oracles — ONE copy of the match
    * sets, the integer policy rule (5·nm ≤ nc), the k′ clamp, and the
    * four gated arms (review finding: the block had drifted into two
    * near-verbatim copies). `src` must expose (query_id, vec_id,
    * `valCol`); `desc` picks the ranking direction; `outScore` renders
    * the score column in the output row. Expects `norms` in scope.
    * greatest(nm, 1) only guards the k′ division: nm = 0 implies the
    * pre arm (5·0 ≤ nc), so the guard never alters an emitted row.
    * Built without margin chars — it is interpolated into stripMargin
    * templates. */
  private[queries] def policyArmsSql(src: String, valCol: String, desc: Boolean,
      outScore: String): String = {
    val dir = if (desc) " DESC" else ""
    def inner(from: String, mset: String, extra: String): String =
      s"SELECT t.query_id, t.vec_id, t.$valCol,\n" +
        s"               row_number() OVER (PARTITION BY t.query_id ORDER BY t.$valCol$dir, t.vec_id) AS rk\n" +
        s"        FROM $from t JOIN $mset ms ON ms.vec_id = t.vec_id$extra"
    def kPrime(nmCte: String): String =
      s"least(${10 * K}, greatest(${2 * K}, " +
        s"($K * (SELECT n FROM ntot) + (SELECT n FROM $nmCte) - 1) " +
        s"// greatest((SELECT n FROM $nmCte), 1)))"
    def arms(tag: String, pred: String, mset: String, nmCte: String): String =
      s"pre_$tag AS (\n" +
        s"  SELECT '$pred' AS pred, 'pre' AS policy, query_id, rk, vec_id, $valCol\n" +
        s"  FROM (${inner(src, mset, "")})\n" +
        s"  WHERE rk <= $K AND 5 * (SELECT n FROM $nmCte) <= (SELECT n FROM ntot)),\n" +
        s"post_$tag AS (\n" +
        s"  SELECT '$pred' AS pred, 'post' AS policy, query_id, rk, vec_id, $valCol\n" +
        s"  FROM (${inner("ranked_all", mset, s"\n        WHERE t.rk1 <= ${kPrime(nmCte)}")})\n" +
        s"  WHERE rk <= $K AND 5 * (SELECT n FROM $nmCte) > (SELECT n FROM ntot))"
    s"ranked_all AS (\n" +
      s"  SELECT query_id, vec_id, $valCol,\n" +
      s"         row_number() OVER (PARTITION BY query_id ORDER BY $valCol$dir, vec_id) AS rk1\n" +
      s"  FROM $src),\n" +
      "ntot AS (SELECT count(*) AS n FROM norms),\n" +
      "mz AS (SELECT n.vec_id FROM norms n JOIN documents dd ON dd.doc_id = n.vec_id\n" +
      "       WHERE dd.lang = 'zh'),\n" +
      "me AS (SELECT n.vec_id FROM norms n JOIN embeddings e ON e.vec_id = n.vec_id\n" +
      "       WHERE e.label IS NOT NULL AND e.label % 2 = 0),\n" +
      "nmz AS (SELECT count(*) AS n FROM mz),\n" +
      "nme AS (SELECT count(*) AS n FROM me),\n" +
      s"${arms("z", "lang_zh", "mz", "nmz")},\n" +
      s"${arms("e", "label_even", "me", "nme")}\n" +
      s"SELECT pred, policy, query_id, CAST(rk AS INT) AS rk, vec_id, $outScore\n" +
      "FROM (SELECT * FROM pre_z UNION ALL SELECT * FROM post_z\n" +
      "      UNION ALL SELECT * FROM pre_e UNION ALL SELECT * FROM post_e)\n" +
      "ORDER BY pred, query_id, rk"
  }

}
