package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared machinery of the Similarity family (round-13 verdict item 7:
  * the 2.9 kLoC single file split along its three seams — serving
  * ladder / embedding-statistics / index lifecycle — behind the
  * existing QueryModule aggregation; pure mechanical move, no query or
  * oracle change): cross-engine decimal dot discipline, staging,
  * quantizer/codebook training + content-addressed oracle exports,
  * ADC scoring, PCA model. Members are `private[queries]` so the
  * family traits compose without re-export shims. */
private[queries] trait SimilarityCore {
  private[queries] val K = 10
  private[queries] val NQ = 8 // query vectors: vec_id < NQ
  /** ann_refine's over-fetch multiple: the ADC stage proposes k′ = 4·K
    * candidates for the exact rerank (FAISS IndexRefine's conventional
    * k_factor regime — large enough that ADC rank noise inside the
    * shortlist can't push a true top-K vector past k′ on the gated
    * fixtures, small enough that the float fetch stays k′-sized). */
  private[queries] val RefineFactor = 4
  private[queries] val RangeTau = 0.25 // ann_range radius (≈2σ of fixture cosines)

  /** Tie-aware phase-1 cutoff margin: after ranking candidates by the
    * fast double cosine, keep every candidate within this epsilon of the
    * K-th fast score (not a fixed K+n buffer). Phase-1 can only misorder
    * pairs whose cosines differ by ≲1e-12 (double vs decimal
    * accumulation), so 1e-9 ≫ that drift guarantees the true top-K is
    * inside the kept set — while a fixed buffer could evict a true
    * top-K pair if >n near-identical candidates crowd the cutoff. */
  private[queries] val RescoreEps = 1e-9

  /** Keep phase-1 survivors: the top-K by fast rank plus everything
    * tied (within [[RescoreEps]]) with the K-th fast score. Expects
    * columns query_id/cos_fast/rk_fast ranked by (cos_fast desc, vec_id)
    * — the K-th score is read through a RUNNING frame over that same
    * ordering, so CollapseWindow merges it into the rank's WindowExec
    * (one sort, one pass) instead of adding a second unordered
    * whole-partition window over the corpus-sized candidate set. Rows
    * ranked below K always have the rank-K row earlier in the frame;
    * rows at rank < K see null and pass via the rank predicate. */
  private[queries] def tieAwareCut(df: DataFrame): DataFrame = tieAwareCutK(K)(df)

  /** [[tieAwareCut]] at an arbitrary boundary `k` — ann_filtered's
    * post-filter arm over-fetches k′ > K exact candidates before the
    * predicate prunes them, so the safe phase-1 cut must track ITS
    * boundary, not the output K. */
  private[queries] def tieAwareCutK(k: Int)(df: DataFrame): DataFrame = {
    val wRun = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_fast").desc, col("vec_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("kth_fast", max(when(col("rk_fast") === k, col("cos_fast"))).over(wRun))
      .filter(col("rk_fast") <= k || col("cos_fast") >= col("kth_fast") - RescoreEps)
  }

  /** Exact decimal dot product of two float-array columns — the codegen
    * [[graft.functions.DecimalDotProduct]], value-identical to the HOF
    * `aggregate(zip_with(...))` formulation it replaced (per-term double
    * product → HALF_UP cast to (20,12) → exact same-scale accumulation,
    * so the sum is order-independent and oracle-stable). Native because
    * HOF lambdas evaluate interpreted and expel their operator from
    * whole-stage codegen — ruinous when the rescore predicate rides a
    * corpus-pair-sized join (see dedup_embedding's shape note). */
  private[queries] def dotDec(a: Column, b: Column): Column =
    graft.functions.DecimalDotProduct.decimal_dot(a, b)

  private[queries] def normDec(a: Column): Column = dotDec(a, a)

  /** Fast in-order double dot product (codegen'd fused loop — see
    * [[graft.functions.FloatDotProduct]]) — NOT oracle-stable on its own
    * (accumulation order differs from the oracle's exact decimal sum by
    * ulps), so it is only ever used as a pre-filter with a safety margin
    * well above that error (~1e-12), never for output values or ranking. */
  private[queries] def dotDbl(a: Column, b: Column): Column =
    graft.functions.FloatDotProduct.float_dot(a, b)

  /** (vec_id, label, embedding, n2dec) with the squared norm precomputed. */
  /** Sentinel for a NULL label at [[topkPairs]]'s typed-tuple boundary
    * (the one place a label must fit a primitive Int): outside the
    * fixture's non-negative label space, and the knn vote filters it
    * explicitly. Deliberately NOT applied at [[withNorm]]: the sentinel
    * would otherwise flow into every similarity consumer — and a
    * corpus that legitimately used −1 would silently merge with
    * unlabeled rows in anything that groups or joins on label. */
  private[queries] val UnlabeledSentinel = -1

  private[queries] def withNorm(s: SparkSession, d: String): DataFrame =
    indexable(Tables.embeddings(s, d))

  /** The vector-ingest contract applied to ANY (vec_id, label,
    * embedding) frame — the whole corpus (withNorm) or one arriving
    * micro-batch (streaming_index_maintain); per-row, so the two can
    * never disagree on what is indexable. */
  private[queries] def indexable(df: DataFrame): DataFrame =
    df
      // a NULL embedding cannot be indexed or scored — excluded at the
      // load boundary (the ingest contract of any vector store). Without
      // this, a null cosine reaches the bounded top-k aggregator's
      // primitive Double field and fails the job (null-injection sweep).
      // A NULL label, by contrast, stays RETRIEVABLE — it is preserved
      // as NULL here and folded to [[UnlabeledSentinel]] only at
      // topkPairs' typed-tuple boundary (see the sentinel's scaladoc).
      // A zero-LENGTH embedding is the same contract as NULL (nothing
      // to index: n2 = 0 makes every cosine 0/0 = NaN, and emb_kmeans'
      // literal-array argmax would assign it arbitrarily while the
      // oracle's unnest drops it — a session-2 review finding); the
      // SQL oracles drop such rows naturally, so filtering here keeps
      // the two engines identical.
      // The third conjunct drops ALL-ZERO vectors (positive length,
      // n2 = 0): without it an all-zero embedding gets a NULL
      // try_divide cosine whose ordering differs across engines
      // (round-10 advice). Checked with the CODEGEN float self-dot —
      // sum of squares is 0 iff every element is 0 — not the
      // interpreted normDec HOF, so the pushed-down filter stays
      // inside whole-stage codegen (the lshBucketedNoNorm lesson).
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0 &&
        graft.functions.FloatDotProduct.float_dot(
          col("embedding"), col("embedding")) > lit(0d))
      .select(col("vec_id"), col("label"), col("embedding"),
        normDec(col("embedding")).as("n2"))

  /** Exact top-k per query, two-phase and HIERARCHICAL:
    *
    * Phase 1 scores every (query, corpus) pair with the cheap codegen
    * double cosine map-side (the query side is broadcast — no shuffle)
    * and reduces each input partition to its tie-aware top-K per query
    * via the bounded [[graft.operators.TopK.topKTies]] Aggregator.
    * Spark plans the typed Aggregator as ObjectHashAggregate with
    * partial merge, so the exchange carries O(tasks × NQ) bounded
    * buffers — never a corpus-sized candidate set hash-partitioned into
    * NQ window partitions (with NQ=8 that earlier shape degenerated to
    * 8 single-task corpus sorts at scale). Candidates carry their
    * payload (label, embedding) through the buffer so phase 2 never
    * re-scans the corpus to fetch it back.
    *
    * Phase 2 decimal-rescores only the O(NQ×K) survivors and re-ranks
    * exactly (decimal accumulation is order-independent, so ranks are
    * bit-stable vs the oracle). The eps tie band (see [[RescoreEps]])
    * guarantees the true top-K survives phase 1 even where the double
    * cosine misorders pairs within its ~1e-12 drift. */
  private[queries] def topkPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = withNorm(s, d)
    val q = broadcast(base.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("n2").as("qn2")))
    val survivors = base.join(q, col("vec_id") =!= col("query_id"))
      .withColumn("cos_fast",
        dotDbl(col("qe"), col("embedding")) /
          sqrt(col("qn2").cast("double") * col("n2").cast("double")))
      .select(col("query_id"), col("cos_fast"), col("vec_id"),
        // primitive Int slot: NULL labels fold to the sentinel HERE,
        // not corpus-wide (see UnlabeledSentinel)
        coalesce(col("label"), lit(UnlabeledSentinel)).as("label"),
        col("embedding"))
      .as[(Long, Double, Long, Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(t => graft.operators.TopK.Cand(t._2, t._3, t._4, t._5))
      .agg(graft.operators.TopK.topKTies(K, RescoreEps).toColumn.name("cands"))
      .flatMap { case (qid, cands) => cands.map(c => (qid, c.id, c.label, c.emb)) }
      .toDF("query_id", "vec_id", "label", "embedding")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    survivors
      .join(q, Seq("query_id"))
      // same decimal expression over the same floats ⇒ bit-identical to
      // the n2 the corpus pass computed (cheap: survivor set only)
      .withColumn("n2", normDec(col("embedding")))
      .withColumn("cosine",
        dotDec(col("qe"), col("embedding")).cast("double") /
          sqrt(col("qn2").cast("double") * col("n2").cast("double")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= K)
  }

  /** Random-hyperplane LSH bucketing: one row per (vector, band) with a
    * sign-pattern bucket — (vec_id, label, embedding, n2, band, bucket).
    *
    * bitsPerBand is the scale lever: buckets/band = 2^bits, and bits
    * tracks log2(corpus / target bucket size) — DERIVED from the corpus
    * count by default (see [[annBitsPerBand]]/[[bitsFor]]): 4 bits (16
    * buckets) at fixture scale, 10 at the 100× corpus, ~16 for a
    * 1B-vector corpus (~15k-row buckets). `spark.graft.ann.bitsPerBand`
    * overrides; the SQL oracle recomputes the same derivation from
    * `count(*)`, so oracle parity holds at any scale (explicit overrides
    * are covered by the recall spec instead). Hyperplane
    * coefficients are md5-derived so engines and reruns agree exactly.
    */
  // Bucketing runs through the codegen HyperplaneBuckets expression —
  // one fused pass per vector computing every band's sign-pattern bucket
  // (the HOF formulation it replaces was interpreted per element and was
  // the measured hot spot of this stage). Coefficients are the same
  // md5-derived doubles the SQL oracle computes, so buckets are
  // bit-identical across engines.
  private[queries] def lshBucketed(s: SparkSession, d: String, nBands: Int, bitsPerBand: Int): DataFrame =
    withNorm(s, d)
      .withColumn("buckets",
        graft.functions.HyperplaneBuckets.buckets(col("embedding"), nBands, bitsPerBand))
      .select(col("vec_id"), col("label"), col("embedding"), col("n2"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))

  /** [[lshBucketed]] without the decimal `n2` norm column. For passes
    * whose candidate volume is corpus-sized (the dedup self-join), the
    * norm column is poison: `normDec` is an interpreted higher-order
    * lambda (no codegen), so any Filter/Join it touches falls out of
    * whole-stage codegen — measured at 100× as the difference between a
    * ~10 s and a ~120+ s pass over the same 10.3 M candidate pairs.
    * Bucket-bounded passes (ann_lsh) keep the norm: their candidate set
    * is small, and phase-2 needs the oracle-exact decimal norm anyway. */
  private[queries] def lshBucketedNoNorm(s: SparkSession, d: String, nBands: Int, bitsPerBand: Int): DataFrame =
    Tables.embeddings(s, d)
      .withColumn("buckets",
        graft.functions.HyperplaneBuckets.buckets(col("embedding"), nBands, bitsPerBand))
      .select(col("vec_id"), col("label"), col("embedding"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))

  /** Target LSH bucket occupancy (corpus rows / 2^bits per band). 200
    * reproduces the measured hand-tuned settings exactly: 2 000 vectors
    * → 4 bits (fixture default), 200 000 → 10 bits (the documented-
    * correct 100× setting, docs/SCALING.md "Embeddings at 100×"). */
  private[queries] val TargetBucket = 200L

  /** Memoized corpus row count per fixture dir — one O(1) scalar per JVM
    * (parquet footer-count scan), shared by every LSH consumer. Same
    * immutable-input contract as [[graft.Staging]]. */
  private[queries] val corpusCounts = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  private[queries] def corpusCount(s: SparkSession, d: String): Long =
    corpusCounts.computeIfAbsent(d, _ => Tables.embeddings(s, d).count())

  /** Memoized INDEXABLE corpus count (withNorm's ingest filter applied)
    * and per-predicate match counts — ann_filtered's selectivity
    * estimate. Two model-sized count scalars per predicate, the table
    * statistics any planner's filter-strategy choice reads; the SQL
    * oracle recomputes both from its `norms` CTE, so the policy
    * decision is reproduced exactly at any corpus size. Same
    * immutable-fixture memo contract as [[corpusCount]]. */
  private[queries] val indexableCounts = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  private[queries] def indexableCount(s: SparkSession, d: String): Long =
    indexableCounts.computeIfAbsent(d, _ => withNorm(s, d).count())

  private[queries] val matchCounts = new java.util.concurrent.ConcurrentHashMap[(String, String), Long]()
  private[queries] def matchCount(d: String, pred: String, df: => DataFrame): Long =
    matchCounts.computeIfAbsent((d, pred), _ => df.count())

  /** The metadata-filter predicate set shared by ann_filtered and
    * ann_filtered_pq — ONE copy of the predicate definitions (review
    * finding: the policy machinery had drifted into per-query copies).
    * Each transform applies to ANY frame carrying (vec_id, label): the
    * float corpus, the coded index, or a survivor set with its index
    * metadata attached. lang_zh is the DIMENSION-join predicate (the
    * filtered dim broadcasts); label_even is vector-table metadata
    * (pushes into the scan as a plain filter). */
  private[queries] def filterPreds(s: SparkSession, d: String): Seq[(String, DataFrame => DataFrame)] = {
    val zhIds = broadcast(Tables.documents(s, d)
      .filter(col("lang") === "zh").select(col("doc_id").as("vec_id")))
    Seq(
      "lang_zh" -> ((df: DataFrame) => df.join(zhIds, Seq("vec_id"), "left_semi")),
      "label_even" -> ((df: DataFrame) =>
        df.filter(col("label").isNotNull && col("label") % 2 === 0)))
  }

  /** Filter-strategy policy + over-fetch, as exact integer rules the
    * oracles recompute: pre-filter iff sel ≤ 0.2 ⇔ 5·nm ≤ nc; post
    * arms over-fetch k′ = ⌈K·nc/nm⌉ clamped to [2K, 10K]. */
  private[queries] def preFilterChosen(nm: Long, nc: Long): Boolean = 5 * nm <= nc
  private[queries] def overfetchK(nc: Long, nm: Long): Int =
    math.min(10L * K, math.max(2L * K, (K * nc + nm - 1) / nm)).toInt

  /** Smallest b ≥ 4 with 2^b · [[TargetBucket]] ≥ n — the integer form of
    * bits ≈ log2(corpus / target bucket), exact-arithmetic so any SQL
    * oracle computes the identical value (a floating log2 could round
    * differently across engines at power-of-two boundaries). */
  private[graft] def bitsFor(n: Long): Int =
    (4 to 30).find(b => (1L << b) * TargetBucket >= n).getOrElse(30)

  /** bitsPerBand — THE corpus-size lever. Round-7 verdict: a config
    * default of 4 silently went quadratic at 100× (~570 M candidate
    * pairs, 31.6 s vs 7.8 s at the right setting), so when
    * `spark.graft.ann.bitsPerBand` is unset the value is now DERIVED
    * from the corpus count at plan-build time via [[bitsFor]]; the conf
    * stays as an explicit override. The SQL oracles compute the same
    * rule from `count(*)`, so correctness holds at every scale. */
  private[queries] def annBitsPerBand(s: SparkSession, d: String): Int =
    s.conf.getOption("spark.graft.ann.bitsPerBand").map(_.toInt)
      .getOrElse(bitsFor(corpusCount(s, d)))

  private[queries] def annKmeansIters(s: SparkSession): Int =
    s.conf.getOption("spark.graft.ann.kmeansIters").map(_.toInt).getOrElse(2)

  /** All bit masks of width `bits` with popcount ≤ `radius`, built by
    * choosing flip positions (Σ_{r≤radius} C(bits,r) results) rather than
    * filtering the full 0 until 2^bits range — the probe list must stay
    * cheap to build as bits grows with corpus size. Ascending-position
    * recursion yields each mask exactly once. */
  private[queries] def flipMasks(bits: Int, radius: Int): Seq[Int] = {
    def choose(start: Int, left: Int): Seq[Int] =
      if (left == 0) Seq(0)
      else (start to bits - left).flatMap(i =>
        choose(i + 1, left - 1).map(m => m | (1 << i)))
    (0 to math.min(radius, bits)).flatMap(r => choose(0, r))
  }

  /** Buckets probed per IVF query — THE recall/cost lever: recall tracks
    * the probed corpus mass (on near-uniform vectors almost linearly:
    * measured 0.36 at 20% probed mass, 0.7+ at 40%), cost is the probed
    * buckets' member count. Default 4 suits the fixtures' weakly
    * clustered embeddings at their derived nlist; a corpus with real
    * modes gets away with 1–2 of a much larger centroid count. Probed
    * MASS at the default shrinks as nlist grows with the corpus
    * (4/√N of the data) — that is the IVF scale contract working, not a
    * defect; ann_recall_eval's fraction-of-nlist grid is where the
    * recall/cost trade is monitored per corpus. */
  private[queries] def annNprobe(s: SparkSession): Int =
    s.conf.getOption("spark.graft.ann.nprobe").map(_.toInt).getOrElse(4)

  /** Coarse-quantizer size as a pure function of the corpus size —
    * THE parametric scale lever of the whole IVF family (round-15
    * verdict item 1: a fixed nlist = 10 made every bucket N/10, so a
    * 1-probe serve still scanned ~10% of a 100 TB corpus — linear in N
    * with a constant-factor discount). nlist = ⌈√N⌉ balances the two
    * costs that bound any IVF serve — the quantizer scan (nlist dots
    * per query/ingested vector) and the probed bucket scan (~N/nlist
    * rows per probe) — so both grow as √N, the textbook IVF sizing
    * (FAISS guidelines; Jégou et al., PAPERS.md). Clamps: 10 keeps the
    * tiny fixtures' index non-degenerate; 4096 is the ceiling of the
    * literal-folded margin-gated assignment projection
    * ([[assignCentroid]] — 2·nlist struct expressions per row; past it
    * the argmax belongs in a dedicated codegen expression looping over
    * a referenced centroid matrix). Monotone in N by construction
    * (√ and both clamps are monotone) — spec-pinned. */
  private[graft] def nlistFor(n: Long): Int =
    math.max(10, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** nlist for a fixture: `spark.graft.ann.nlist` override (oracle-
    * transparent — the oracles consume the exported centroids, which
    * are content-addressed by nlist) or [[nlistFor]] of the memoized
    * indexable count. */
  private[queries] def annNlist(s: SparkSession, d: String): Int =
    s.conf.getOption("spark.graft.ann.nlist").map(_.toInt)
      .getOrElse(nlistFor(indexableCount(s, d)))

  /** Trained IVF coarse quantizer: seed centroids (10 lowest non-query
    * vec_ids) refined by `iters` deterministic k-means (Lloyd) rounds —
    * assign every vector to its nearest centroid, recenter each cluster
    * at the member mean. Per-dimension means accumulate in DECIMAL
    * (order-independent), so the trained centroids are bit-stable across
    * runs and partitionings. Staged to parquet once per (dir, iters):
    * a production IVF trains its quantizer once and persists it, and the
    * probe/assign consumers below would otherwise each re-run the whole
    * training DAG (lazy plans re-expand per consumer). Empty clusters
    * drop out of the assignment group-by, exactly as in Lloyd. */
  /** Single-file export of the trained centroids for the DuckDB oracle
    * (round-8 verdict item 3: oracle ann_ivf compositionally — the
    * oracle reproduces assignment → probe → rescore GIVEN the trained
    * centroids, the dedup_embedding compositional recipe). The path is
    * keyed by a DIGEST OF THE FIXTURE DIR under a per-user tmp subdir
    * (round-9 advice: the previous world-shared fixed /tmp name let two
    * concurrent JVMs on different fixtures clobber each other's export,
    * and a revisit of fixture A after running B within one JVM served
    * A's memoized export while the file held B's quantizer). Keying by
    * fixture makes interleaved fixtures write DISJOINT files, so each
    * file always holds the centroids of ITS fixture — revisiting
    * fixture A after running B reads A's own export, never B's (the
    * one-write-per-(dir, iters) memo below stays, re-justified by the
    * next paragraph). Two concurrent JVMs on the SAME fixture write identical
    * bytes (training is deterministic), and the write goes through
    * [[graft.ScaleData.writeSingleFile]]'s write-then-rename, so a
    * concurrent reader never sees a half-written file.
    *
    * The (dir, iters) pair fully determines the file's CONTENT (training
    * is deterministic over immutable fixtures), and both are folded into
    * the NAME — so the export is content-addressed and memoizing one
    * write per (dir, iters) per JVM is sound again (the round-9 hazard
    * was the fixed name serving one fixture's bytes for another's). */
  /** Content-addressed oracle-export path under the per-user tmpdir
    * base — ONE copy of the base-dir / sanitization / digest rules,
    * shared by the IVF-centroid and PQ-codebook exports so the two can
    * never drift (review finding). Pure path computation — the parent
    * dir is created at the write sites, so callers that merely BUILD
    * oracle SQL strings (dumps, tests) never touch the filesystem. */
  private[queries] def oracleExportPath(salt: String, prefix: String): String =
    graft.OracleExport.path(salt, prefix)

  private[graft] def ivfOracleCentroidsPath(dir: String, iters: Int, nlist: Int): String =
    oracleExportPath(s"$dir|i$iters|n$nlist", "ivf-centroids")

  /** (fixture dir, iters) of the most recent ann_ivf plan build in this
    * JVM — read by [[oracles]] so the dumped oracle SQL names the export
    * file of the run Verify actually made (Verify dumps oracle SQL AFTER
    * running the queries; one fixture per Verify run). Defaults to the
    * driver's verify fixture so the SQL is well-formed even if ann_ivf
    * never ran in this JVM (the driver only checks oracles for queries
    * with a dumped result, so the default is never READ in that case). */
  @volatile private[queries] var lastIvf: (String, Int, Int) = ("/root/testdata/sf0.01", 2, 10)

  /** Pin the oracle-dump default to the fixture Verify is actually
    * running (round-10 advice): without this, a Verify subset run that
    * skips ann_ivf dumps SQL naming the hardcoded sf0.01 export path,
    * which on another machine/layout can never exist. Called by Verify
    * before the query loop; an actual ann_ivf/emb_kmeans build
    * overwrites it with the same fixture (and its true iters). */
  def pinOracleFixture(dir: String): Unit = {
    lastIvf = (dir, lastIvf._2, lastIvf._3)
    lastPq = dir
    lastPqRes = (dir, lastPqRes._2, lastPqRes._3)
    lastPca = dir
  }

  private[queries] val ivfExported = new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), Boolean]()

  private[queries] def ivfCentroids(s: SparkSession, d: String, iters: Int): DataFrame = {
    val nlist = annNlist(s, d)
    val staged = ivfCentroidsStaged(s, d, iters, nlist)
    lastIvf = (d, iters, nlist)
    ivfExported.computeIfAbsent((d, iters, nlist), _ => {
      val p = ivfOracleCentroidsPath(d, iters, nlist)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p).getParent)
      graft.ScaleData.writeSingleFile(staged, p)
      true
    })
    staged
  }

  /** Lloyd training at corpus-derived nlist. Each round COLLECTS the
    * current centroids (model-sized: ≤ nlist × dim floats) and assigns
    * every vector via [[assignCentroid]]'s margin-gated literal-folded
    * argmax — ONE narrow projection per round, no join, no shuffle of
    * the corpus (the previous broadcast-join + per-vector row_number
    * window shuffled corpus × nlist rows WITH their embedding payloads
    * per round; harmless at nlist = 10, ~90 M wide rows per round at
    * the 100× fixture's nlist ≈ 448 — the round-9 serving lesson
    * applied to training). The per-round collect also pins each
    * round's assignment input to MATERIALIZED driver-side arrays, so
    * round k never re-expands round k−1's DAG (the lazy-fold
    * re-expansion Staging exists to prevent). Recentering is the same
    * decimal-mean discipline: per-dimension sums in DECIMAL(20,12)
    * (order-independent ⇒ bit-stable across runs and partitionings),
    * one cast to float. Empty clusters drop out of the assignment
    * group-by, exactly as in Lloyd; an emptied corpus short-circuits
    * to the typed empty frame (the kmeansMembers lesson). */
  private[queries] def ivfCentroidsStaged(s: SparkSession, d: String, iters: Int,
      nlist: Int): DataFrame =
    graft.Staging.stage(s, s"ivf_centroids_i${iters}_n$nlist", d) {
      val base = withNorm(s, d)
      val seeds = base.filter(col("vec_id") >= NQ)
        .orderBy(col("vec_id")).limit(nlist)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          col("n2").as("c_n2"))
      (1 to iters).foldLeft(seeds) { (cent, _) =>
        val centArr = collectQuantizer(cent)
        if (centArr.isEmpty) cent.limit(0)
        else assignCentroid(base, centArr)
          .select(col("c_id"), posexplode(col("embedding")).as(Seq("i", "x")))
          .groupBy(col("c_id"), col("i"))
          .agg((sum(col("x").cast("decimal(20,12)")) / count(lit(1)))
            .cast("double").as("m"))
          .groupBy(col("c_id"))
          .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("ms"))
          .select(col("c_id"),
            expr("transform(ms, e -> CAST(e.m AS FLOAT))").as("c_emb"))
          .withColumn("c_n2", normDec(col("c_emb")))
          .filter(col("c_n2") > 0)
      }
    }

  // ---- Product quantization (ann_ivf_pq) ------------------------------

  /** PQ geometry: 64-dim vectors as M=4 contiguous 16-dim subspaces,
    * 16 codes per sub-codebook ⇒ a 4-byte code per vector — the
    * memory-bounded ANN shape for corpora where even float16 vectors
    * can't be RAM-resident (1 B × 64 dims = 256 GB raw vs 4 GB coded;
    * Jégou et al., PAPERS.md). Square L2 distances are computed through
    * the decimal identity ‖x−c‖² = x·x − 2·x·c + c·c over the SAME
    * codegen DecimalDotProduct the cosine family uses, so decimal
    * addition keeps every distance EXACT and cross-engine stable; the
    * fixed-point (×10¹²) rendering makes scores exact BIGINTs end to
    * end (the BM25 discipline — no double ever ranks). */
  private[queries] val PqM = 4
  private[queries] val PqSubDim = 16
  private[queries] val PqKsub = 16
  private[queries] val PqFp = 1000000000000L // 10^12: DECIMAL(…,12) → exact long

  private[queries] def subVec(e: Column, m: Int): Column =
    slice(e, m * PqSubDim + 1, PqSubDim)

  /** Decimal-exact squared L2 between a subvector column and a literal
    * sub-centroid (both 16 floats). Each dot is cast down to
    * DECIMAL(20,12) FIRST (values are ≤ ~10³, so the narrowing is
    * value-exact) and the 2· is written as two subtractions: on the raw
    * DECIMAL(38,12) dots, Spark's precision-overflow rule would REDUCE
    * SCALE on `2 * dot` (p = 38+10+1 > 38 ⇒ scale drops toward 6) and
    * silently round the distance — caught as an oracle fp mismatch in
    * the 12th digit. Result stays exact at scale 12. */
  private[queries] def d2Dec(sv: Column, c: Seq[Float]): Column = {
    val cl = typedLit(c)
    def dd(a: Column, b: Column): Column = dotDec(a, b).cast("decimal(20,12)")
    dd(sv, sv) - dd(sv, cl) - dd(sv, cl) + dd(cl, cl)
  }

  /** ×10¹² fixed-point rendering of an exact small decimal as a LONG —
    * the narrowing casts keep the multiply inside precision 38 (a
    * direct DECIMAL(38,12) × long literal overflows p = 38+20+1 and
    * triggers the same silent scale reduction). */
  private[queries] def d2Fp(d2: Column): Column =
    (d2.cast("decimal(24,12)") * lit(PqFp).cast("decimal(13,0)")).cast("long")

  private[queries] def d2Dbl(sv: Column, c: Seq[Float]): Column = {
    val cl = typedLit(c)
    dotDbl(sv, sv) - lit(2.0) * dotDbl(sv, cl) + dotDbl(cl, cl)
  }

  /** Deterministically trained sub-codebooks: per subspace, Lloyd on
    * subvectors (seeds = the 16 lowest vec_ids ≥ NQ, 2 iterations,
    * decimal means — the ivfCentroidsStaged recipe on (m, code) keys
    * with double-L2 assignment and a (d2, code) total order). Staged
    * once per fixture under `tag`; exported for the compositional
    * oracle like the IVF centroids. Rows: (m, code, c_sub). Shared by
    * the flat-PQ variant (over raw vectors) and the IVF-PQ residual
    * variant (over x − centroid residuals) — `vecs` supplies the
    * (vec_id, embedding) training frame. */
  private[queries] def trainPqCodebooks(s: SparkSession, tag: String, d: String,
      materializeInput: Boolean = false)(
      vecs: => DataFrame): DataFrame =
    graft.Staging.stage(s, tag, d) {
      // Round-17 (guide §8 computed-once; the round-16 residual item 1,
      // solved WITHOUT changing the trained artifact): the training
      // frame is consumed ~5× per stage build (seed id scan, seed
      // subvector join, and per Lloyd round the assignment + the
      // recenter) and lazy plans re-expand per consumer. When the frame
      // is EXPENSIVE to produce (the residual variant re-ran the
      // corpus-sized assignment + subtraction chain per consumer), one
      // eager materialization serves every consumer — values untouched
      // (checkpointing changes where rows come from, never what they
      // are), so the trained codebooks, the exports, and every PQ
      // consumer's hashes are bit-identical; measured 6.4 → 3.1–3.7 s
      // cold on the residual stage. When the frame is a plain
      // projected SCAN (the flat variant), re-scans are near-free in
      // the page-cached regime and the checkpoint's blocking job only
      // adds cost — so materialization is opt-in per variant. The
      // checkpoint reads ONLY the two columns the trainer uses: an
      // unprojected one would compute every input column (withNorm's
      // n2 is a per-row decimal self-dot Catalyst otherwise prunes
      // away; measured 1.5 → 6 s before the projection was added).
      // At 100 TB the FAISS-style answer is a bounded deterministic
      // training sample (O(sample) per round, smaller artifact) —
      // deliberately NOT taken here because it changes the trained
      // artifact and re-pins every PQ oracle export.
      val projected = vecs.select(col("vec_id"), col("embedding"))
      val v = if (materializeInput) projected.localCheckpoint() else projected
      val seedIds = v.filter(col("vec_id") >= NQ)
        .select(col("vec_id")).orderBy(col("vec_id")).limit(PqKsub)
        .withColumn("code", row_number().over(Window.orderBy(col("vec_id"))) - 1)
      val seeds = v.select(col("vec_id"),
          posexplode(array((0 until PqM).map(m => subVec(col("embedding"), m)): _*))
            .as(Seq("m", "sv")))
        .join(seedIds, Seq("vec_id"))
        .select(col("m"), col("code"), col("sv").as("c_sub"))
      // Round-16 optimization (the round-9 ivf-serving lesson applied
      // to TRAINING, like ivfCentroidsStaged already does for the
      // coarse quantizer): each Lloyd round used to join corpus×M
      // subvector rows against the candidate codebook and keep rank 1
      // through a (vec_id, m)-partitioned row_number — a corpus-sized
      // exchange + sort per round. The codebook is MODEL-sized
      // (≤ M·Ksub rows), so each round now collects it and assigns via
      // the codegen [[graft.functions.PqNearestCode]] with eps = −1
      // (the gate can never fire: gap ≥ 0 — reproducing the trainer's
      // pure double (d2, code) argmin exactly, PqNearestCodeSpec's
      // folded algebra with no decimal branch); recentering explodes
      // the full embedding once and derives (m, i) from the global
      // position — same (m, code, i) groups, same decimal means. No
      // corpus exchange remains in the round body.
      (1 to 2).foldLeft(seeds) { (cent, _) =>
        val cbArr = cent.select(col("m"), col("code"), col("c_sub"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
          .sortBy(t => (t._1, t._2))
        if (cbArr.isEmpty) cent.limit(0)
        else {
          val coded = (0 until PqM).foldLeft(v) { (acc, m) =>
            val cands = cbArr.filter(_._1 == m).map { case (_, c, e) => (c, e) }
            acc.withColumn(s"code_$m",
              graft.functions.PqNearestCode.pq_nearest_code(
                col("embedding"), m * PqSubDim, PqSubDim, cands, -1.0))
          }
          coded
            .select(col("vec_id"),
              array((0 until PqM).map(m => col(s"code_$m")): _*).as("cs"),
              posexplode(col("embedding")).as(Seq("gi", "x")))
            .select(expr(s"CAST(gi DIV $PqSubDim AS INT)").as("m"),
              element_at(col("cs"), (col("gi") / PqSubDim).cast("int") + 1).as("code"),
              expr(s"CAST(gi % $PqSubDim AS INT)").as("i"), col("x"))
            .filter(col("m") < PqM && col("code").isNotNull)
            .groupBy(col("m"), col("code"), col("i"))
            .agg((sum(col("x").cast("decimal(20,12)")) / count(lit(1)))
              .cast("double").as("mx"))
            .groupBy(col("m"), col("code"))
            .agg(array_sort(collect_list(struct(col("i"), col("mx")))).as("ms"))
            .select(col("m"), col("code"),
              expr("transform(ms, e -> CAST(e.mx AS FLOAT))").as("c_sub"))
        }
      }
    }

  private[queries] def pqCodebooksStaged(s: SparkSession, d: String): DataFrame =
    trainPqCodebooks(s, "pq_codebooks_i2", d)(withNorm(s, d))

  private[graft] def pqOracleCodebookPath(dir: String): String =
    oracleExportPath(s"$dir|pq2", "pq-codebooks")

  @volatile private[queries] var lastPq: String = "/root/testdata/sf0.01"

  private[queries] val pqExported = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  private[queries] def pqCodebooks(s: SparkSession, d: String): DataFrame = {
    val staged = pqCodebooksStaged(s, d)
    lastPq = d
    pqExported.computeIfAbsent(d, _ => {
      val p = pqOracleCodebookPath(d)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p).getParent)
      graft.ScaleData.writeSingleFile(staged, p)
      true
    })
    staged
  }

  /** Collected codebook, model-sized (≤ M·Ksub = 64 rows). */
  private[queries] def collectPqCodebook(cb: DataFrame): Array[(Int, Int, Seq[Float])] =
    cb.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
      .sortBy(t => (t._1, t._2))

  /** Margin-gated per-subspace encoder — assignCentroid's two-phase
    * argmax transposed to an L2 argmin: the fast double identity
    * decides unless the top-1/top-2 gap is within [[RescoreEps]]
    * (double L2 drift is ~1e-12 absolute at these magnitudes, three
    * orders inside the gate), in which case the decimal argmin
    * re-decides. Adds code_0..code_{M−1} columns; one narrow
    * projection, no join/shuffle. */
  private[queries] def pqEncode(df: DataFrame,
      cb: Array[(Int, Int, Seq[Float])]): DataFrame =
    // Round-16 optimization: the literal-folded 2·Ksub struct argmin
    // (each struct carrying THREE dot subtrees against a subdim-wide
    // literal) becomes the ONE codegen [[graft.functions.PqNearestCode]]
    // expression per subspace over a referenced sub-codebook — the
    // NearestCentroid recipe for the L2 argmin (see that file's
    // value-identity argument; PqNearestCodeSpec pins it against the
    // folded form). O(1) plan size at any Ksub; reads the subvector
    // window in place, no slice() allocation.
    (0 until PqM).foldLeft(df) { (acc, m) =>
      val cands = cb.filter(_._1 == m).map { case (_, code, c) => (code, c) }
      acc.withColumn(s"code_$m",
        graft.functions.PqNearestCode.pq_nearest_code(
          col("embedding"), m * PqSubDim, PqSubDim, cands, RescoreEps))
    }

  /** x − centroid RESIDUALS of the assigned corpus, as float arrays in
    * the `embedding` column so every PQ helper (subVec, d2Dec,
    * pqEncode, the codebook trainer) applies unchanged. The rounding
    * protocol is pinned for cross-engine exactness: float→double
    * conversions are exact, the DOUBLE subtraction rounds identically
    * under IEEE in both engines, and the single cast back to FLOAT
    * rounds identically — whereas a native float−float would rest on
    * both engines implementing the same single-rounding, and DuckDB's
    * REAL arithmetic isn't contractually pinned. The SQL twin is
    * CAST(CAST(x AS DOUBLE) − CAST(cx AS DOUBLE) AS REAL). */
  /** ONE copy of the pinned residual rounding protocol (see
    * [[residuals]]'s scaladoc), shared by the corpus-residual and
    * query-residual branches so the two can never drift (review
    * finding — the FeatureClasses/incrementalOracle discipline). */
  private[queries] def residualOf(vec: Column, cent: Column): Column =
    zip_with(vec, cent,
      (a, b) => (a.cast("double") - b.cast("double")).cast("float"))

  private[queries] def residuals(centDf: DataFrame,
      centArr: Array[(Long, Seq[Float], Double)])(base: DataFrame): DataFrame =
    assignCentroid(base, centArr)
      .join(broadcast(centDf.select(col("c_id"), col("c_emb"))), Seq("c_id"))
      // label rides along into the coded index: a PQ store keeps its
      // filterable metadata NEXT TO the codes (ann_filtered_pq's pre
      // arm filters the index scan on it) — one skinny int per row
      .select(col("vec_id"), col("label"), col("c_id"),
        residualOf(col("embedding"), col("c_emb")).as("embedding"))

  /** The staged residual-coded corpus — THE persisted IVFADC index:
    * (vec_id, label, c_id, code_0..code_{M-1}). Shared by
    * ann_ivfpq_residual and ann_filtered_pq. */
  private[queries] def residualCodedCorpus(s: SparkSession, d: String, iters: Int,
      centDf: DataFrame, centArr: Array[(Long, Seq[Float], Double)],
      cb: Array[(Int, Int, Seq[Float])]): DataFrame =
    graft.Staging.stage(s, s"pqres_codes_c${iters}_n${annNlist(s, d)}_i2", d) {
      pqEncode(residuals(centDf, centArr)(withNorm(s, d)), cb)
        .select(col("vec_id") +: col("label") +: col("c_id") +:
          (0 until PqM).map(m => col(s"code_$m")): _*)
    }

  /** Adds a_0..a_{M-1} dense ADC lookup arrays over `cb` to a query
    * frame, indexing by code against the subvectors of `vecCol` —
    * ONE copy of the in-engine ADC-table builder, shared by the
    * residual path (over query residuals) and the flat-PQ path (over
    * raw query vectors). Codes a Lloyd round emptied never appear in
    * the coded corpus, so their slots are inert fill. */
  private[queries] def adcLookupArrays(df: DataFrame, vecCol: String,
      cb: Array[(Int, Int, Seq[Float])]): DataFrame = {
    // Round-16 optimization (residual item 2 — the pqEncode treatment
    // for the ADC-table builder): the folded form materialized
    // M·(maxCode+1) literal subtrees, each `d2Fp(d2Dec(subVec(...)))`
    // carrying three DecimalDotProduct children — linear plan/codegen
    // growth toward a production Ksub = 256. ONE codegen
    // [[graft.functions.AdcLookupTable]] per subspace over a
    // REFERENCED sub-codebook is O(1) plan size at any Ksub;
    // AdcLookupTableSpec pins it against the verbatim folded algebra
    // (same MaxValue fill, same overflow-null slots, same decimal
    // arithmetic).
    val maxCode = cb.map(_._2).max
    (0 until PqM).foldLeft(df) { (acc, m) =>
      val cands = cb.filter(_._1 == m).map { case (_, code, c) => (code, c) }
      acc.withColumn(s"a_$m",
        graft.functions.AdcLookupTable.adc_lookup_table(
          col(vecCol), m * PqSubDim, PqSubDim, cands, maxCode))
    }.drop(vecCol)
  }

  /** (query_id, c_id, a_0..a_{M-1}) — per-(query, probed bucket) dense
    * ADC lookup arrays over the residual sub-codebooks, computed
    * IN-ENGINE on the probe frame (NQ × nprobe rows) and BROADCAST by
    * consumers: the join-based ADC, plan size O(M·Ksub) expressions
    * regardless of the query-batch size. */
  private[queries] def residualAdcTabs(s: SparkSession, base: DataFrame,
      cent: DataFrame, cb: Array[(Int, Int, Seq[Float])]): DataFrame =
    adcLookupArrays(
      rankCentroids(base.filter(col("vec_id") < NQ), cent, annNprobe(s))
        .filter(col("c_rank") <= annNprobe(s))
        .select(col("vec_id").as("query_id"), col("c_id"),
          residualOf(col("embedding"), col("c_emb")).as("qres")),
      "qres", cb)

  /** Exact fixed-point ADC score per (query, candidate): one broadcast
    * join of the coded corpus against the ADC arrays — on the bucket id
    * when the index is bucketed (IVFADC; restricts the scan to probed
    * buckets), or a broadcast nested-loop over the NQ-sized table for a
    * flat-PQ index (every query scans all codes by construction) — then
    * an element_at sum per subspace; no unpivot, no intermediate
    * aggregation. */
  private[queries] def adcScores(coded: DataFrame, adcTabs: DataFrame,
      onBucket: Boolean = true): DataFrame = {
    val joined =
      if (onBucket) coded.join(broadcast(adcTabs), Seq("c_id"))
      else coded.crossJoin(broadcast(adcTabs))
    joined.filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (0 until PqM).map(m =>
          element_at(col(s"a_$m"), col(s"code_$m") + 1)).reduce(_ + _)
          .as("dfp"))
  }

  /** Hierarchical exact-integer top-k ranks over (query_id, vec_id,
    * dfp) — ascending dfp, vec_id tiebreak — through the bounded
    * topKLong aggregator. Output (query_id, rk, vec_id, adc_d2_fp). */
  private[queries] def topKLongRanks(s: SparkSession, scored: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    scored.select(col("query_id"), col("vec_id"), col("dfp"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (-t._3, t._2))
      .agg(graft.operators.TopK.topKLong(k).toColumn.name("top"))
      .flatMap { case (qid, top) =>
        top.zipWithIndex.map { case ((v, id), i) => (qid, i + 1, id, -v) } }
      .toDF("query_id", "rk", "vec_id", "adc_d2_fp")
  }

  /** Stage 1 of the IVFADC family, ONE copy (review finding: ann_refine
    * had duplicated this chain verbatim): train/collect the coarse
    * quantizer and residual sub-codebooks, then rank the residual-coded
    * corpus by exact fixed-point ADC distance and keep the top k per
    * query. None when the corpus is too small to train either artifact
    * — each caller emits its own empty shape (if/else EXPRESSIONS, not
    * early returns: the kmeansMembers lesson). Shared by
    * ann_ivfpq_residual (k = K) and ann_refine (k = RefineFactor·K). */
  private[queries] def residualAdcTopK(s: SparkSession, d: String, k: Int): Option[DataFrame] = {
    val base = withNorm(s, d)
    val iters = annKmeansIters(s)
    val centDf = ivfCentroids(s, d, iters)
    val centArr = collectQuantizer(centDf)
    if (centArr.isEmpty) None
    else {
      val cent = broadcast(centDf)
      val cb = collectPqCodebook(pqResCodebooks(s, d, iters, centDf, centArr))
      if (cb.isEmpty) None
      else {
        val coded = residualCodedCorpus(s, d, iters, centDf, centArr, cb)
        val adcTabs = residualAdcTabs(s, base, cent, cb)
        Some(topKLongRanks(s, adcScores(coded, adcTabs), k))
      }
    }
  }

  /** Keyed by (dir, COARSE iters) like the IVF centroid export:
    * residual artifacts depend on the centroids that produced the
    * residuals, so a kmeansIters override must address DIFFERENT
    * staged/exported files — otherwise a same-JVM iters change would
    * serve residual codes bucketed under the OLD quantizer against
    * probes ranked by the NEW one (review finding; the content-
    * addressing contract of ivfOracleCentroidsPath). The trailing
    * `pqres2` is the sub-codebooks' OWN Lloyd iteration count. */
  private[graft] def pqResOracleCodebookPath(dir: String, iters: Int, nlist: Int): String =
    oracleExportPath(s"$dir|c$iters|n$nlist|pqres2", "pqres-codebooks")

  @volatile private[queries] var lastPqRes: (String, Int, Int) = ("/root/testdata/sf0.01", 2, 10)

  private[queries] val pqResExported =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), Boolean]()

  /** Residual sub-codebooks (trained on x − centroid, staged, exported
    * for the compositional oracle — the pqCodebooks recipe on the
    * residual frame). Keyed by (dir, iters, nlist): the residuals
    * depend on the coarse quantizer, which depends on both knobs. */
  private[queries] def pqResCodebooks(s: SparkSession, d: String, iters: Int,
      centDf: DataFrame,
      centArr: Array[(Long, Seq[Float], Double)]): DataFrame = {
    val nlist = annNlist(s, d)
    val staged = trainPqCodebooks(s, s"pqres_codebooks_c${iters}_n${nlist}_i2", d,
      materializeInput = true)(
      residuals(centDf, centArr)(withNorm(s, d)))
    lastPqRes = (d, iters, nlist)
    pqResExported.computeIfAbsent((d, iters, nlist), _ => {
      val p = pqResOracleCodebookPath(d, iters, nlist)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p).getParent)
      graft.ScaleData.writeSingleFile(staged, p)
      true
    })
    staged
  }

  /** The trained-quantizer path of ann_ivf (nonempty corpus):
    * literal-array margin-gated assignment, probe ranking, bucket join,
    * tie-aware decimal rescore. Split out so the empty-corpus guard in
    * the query lambda stays an expression (no non-local return). */
  /** The PERSISTED cluster-assignment table (vec_id, c_id) — the
    * artifact a production clustering run writes once and every
    * consumer reads (here: emb_kmeans's size aggregate AND size-attach
    * join, plus data_sample_cluster_balanced's per-cluster window —
    * three lazy consumers that would each re-expand the margin-gated
    * argmax subtree, the dominant cost; a round-10 bench showed
    * emb_kmeans as the slowest query purely from that re-expansion).
    * Skinny columns only: staging the rescore-bearing embedding/n2
    * payload would duplicate the corpus on disk, so ann_ivf keeps its
    * own in-plan assignment. Stage key folds the Lloyd iteration count
    * (different quantizer ⇒ different assignment). Empty corpus:
    * nothing to train on ⇒ the typed empty frame, never a staged
    * write of an untypeable literal array. */
  private[queries] def kmeansMembers(s: SparkSession, d: String): DataFrame = {
    val iters = annKmeansIters(s)
    val nlist = annNlist(s, d)
    val base = withNorm(s, d)
    val centArr = collectQuantizer(ivfCentroids(s, d, iters))
    if (centArr.isEmpty)
      base.limit(0).select(col("vec_id"), lit(0L).as("c_id"))
    else graft.Staging.stage(s, s"kmeans_members_i${iters}_n$nlist", d) {
      assignCentroid(base, centArr).select(col("vec_id"), col("c_id"))
    }
  }

  /** One-pass POPULATION-COVARIANCE stats over the indexable corpus —
    * the Gram-matrix primitive PCA/whitening builds on. Shape: two
    * chained generators turn each vector into its dim·(dim+1)/2
    * upper-triangle term pairs MAP-SIDE (no self-join, no shuffle of
    * the corpus), which partial hash aggregation folds into ≤ dim²
    * groups per task — the exchange carries O(dim²·partitions) rows
    * whatever the corpus size, the exact aggregation shape a 100 TB
    * covariance pass must have. Per-term products are computed in
    * DOUBLE (float×float is exact in double) then rounded once to
    * DECIMAL(38,12) and summed exactly — order-independent, so the
    * DuckDB oracle (a vec_id self-join over the same rounded terms)
    * reproduces every sum bit-for-bit; the cov/mean derivation is the
    * same IEEE expression on both engines. Staged: dim²-sized, the
    * centroid-table discipline. */
  private[queries] def covarianceStats(s: SparkSession, d: String): DataFrame =
    graft.Staging.stage(s, "emb_cov", d) {
      val ex = withNorm(s, d)
        .select(col("embedding").as("e"),
          posexplode(col("embedding")).as(Seq("i", "xi")))
      // Round-16 optimization: the second generator explodes only the
      // j ≥ i TAIL (slice from position i+1, 1-based) instead of the
      // whole vector followed by a filter — the dim·(dim+1)/2 term rows
      // are generated directly rather than as the surviving half of
      // dim² rows (at 64 dims: 2080 vs 4096 generated rows per vector,
      // measured 8.2 → 6.9 s on the sf0.1 stage build; the remaining
      // cost is dominated by the per-term Double→Decimal rounding the
      // oracle contract pins — Decimal.apply(double) routes through
      // Double.toString). Terms, their
      // per-term decimal rounding, and the exact sum are unchanged —
      // j = i + jj reindexes the slice positions back to the full
      // vector's coordinates.
      val pairs = ex
        .select(col("i"), col("xi"),
          posexplode(expr("slice(e, i + 1, size(e))")).as(Seq("jj", "xj")))
        .select(col("i"), (col("i") + col("jj")).as("j"), col("xi"), col("xj"))
        .groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n"),
          sum((col("xi").cast("double") * col("xj").cast("double"))
            .cast("decimal(38,12)")).as("sxy"))
      val sums = ex.groupBy(col("i"))
        .agg(sum(col("xi").cast("double").cast("decimal(38,12)")).as("sx"))
      pairs
        .join(broadcast(sums.select(col("i"), col("sx").as("sx_i"))), Seq("i"))
        .join(broadcast(sums.select(col("i").as("j"), col("sx").as("sx_j"))), Seq("j"))
        .select(col("i"), col("j"), col("n"),
          (col("sxy").cast("double") / col("n") -
            (col("sx_i").cast("double") / col("n")) *
              (col("sx_j").cast("double") / col("n"))).as("cov"),
          // per-dim mean rides along for the PCA centering constants
          // (exact decimal sum / n — same IEEE division both engines)
          (col("sx_i").cast("double") / col("n")).as("mean_i"))
    }

  /** The trained PCA model: top-[[PcaP]] (component, eigenvector, μ·v)
    * triples, their eigenvalues, the mean vector, and the μ·μ scalar —
    * everything the projection/whitening/OOD family serves from. All
    * doubles; the export ships the SAME bits to the oracle, so
    * derived constants never need cross-engine re-derivation. */
  private[graft] case class PcaModel(
      comps: Array[(Int, Array[Double], Double)],
      lambda: Array[Double], mu: Array[Double], muMu: Double)

  /** Train the PCA model — a driver-side scalar over MODEL-SIZED state
    * (dim² → eigen is a few KB of arithmetic however large the corpus,
    * the collected-quantizer precedent): covariance collected from the
    * staged stats, deterministic cyclic-Jacobi eigendecomposition
    * ([[graft.operators.Eigen]], canonical order + sign), top-[[PcaP]]
    * components kept; EXPORTS the model rows for the compositional
    * oracle (the ivfCentroids recipe: content-addressed single-file
    * parquet, memoized one write per fixture per JVM). */
  private[queries] def pcaModel(s: SparkSession, d: String): PcaModel = {
    val rows = covarianceStats(s, d)
      .select(col("i"), col("j"), col("cov"), col("mean_i")).collect()
    lastPca = d
    val model =
      if (rows.isEmpty)
        PcaModel(Array.empty, Array.empty, Array.empty, 0.0)
      else {
        val dim = rows.iterator.map(_.getInt(1)).max + 1
        // the oracle SQL (and the serving projections) emit a FIXED
        // PcaP-wide schema (pc_0..pc_7 / p0..p7); a corpus with
        // dim < PcaP would make vecs.take(PcaP) silently emit fewer
        // columns and hash-mismatch on schema — fail loudly instead
        // (advice finding; only ≥8-dim fixtures are supported)
        require(dim >= PcaP,
          s"pcaModel needs embedding dim >= $PcaP (got $dim): the " +
            "exported model and oracle schema are fixed at PcaP columns")
        val c = Array.ofDim[Double](dim, dim)
        val mu = new Array[Double](dim)
        rows.foreach { r =>
          val (i, j, cv) = (r.getInt(0), r.getInt(1), r.getDouble(2))
          c(i)(j) = cv
          c(j)(i) = cv
          if (i == j) mu(i) = r.getDouble(3)
        }
        val (vals, vecs) = graft.operators.Eigen.jacobi(c)
        val comps = vecs.take(PcaP).zipWithIndex.map { case (v, p) =>
          (p, v, (0 until dim).map(i => mu(i) * v(i)).sum)
        }
        // μ·μ with the SAME per-term decimal-rounding discipline every
        // cross-engine dot uses — not strictly required (the export
        // ships the bits), but keeps the model's arithmetic uniform
        val muMu = mu.map(x => BigDecimal(x * x)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble).sum
        PcaModel(comps, vals.take(PcaP), mu, muMu)
      }
    pcaExported.computeIfAbsent(d, _ => {
      val p = pcaOracleComponentsPath(d)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p).getParent)
      val flat = model.comps.flatMap { case (cmp, v, muDot) =>
        v.zipWithIndex.map { case (x, i) =>
          (cmp, i, x, muDot, model.lambda(cmp), model.mu(i), model.muMu)
        }
      }.toSeq
      graft.ScaleData.writeSingleFile(
        s.createDataFrame(flat)
          .toDF("component", "i", "v", "mu_dot", "lambda", "mu", "mu_mu"), p)
      true
    })
    model
  }

  /** Components kept by emb_pca — a serving choice, not a training one
    * (all dim eigenpairs exist; 8 of 64 retains the fixture's dominant
    * variance and keeps the projection row narrow). */
  private[queries] val PcaP = 8

  @volatile private[queries] var lastPca: String = "/root/testdata/sf0.01"
  private[graft] def pcaOracleComponentsPath(dir: String): String =
    oracleExportPath(s"$dir|pca$PcaP", "pca-components")
  private[queries] val pcaExported = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  /** The trained quantizer as a driver-side model artifact (bounded by
    * nlist, never by the data — see ann_ivf's scaladoc). */
  private[queries] def collectQuantizer(
      centDf: DataFrame): Array[(Long, Seq[Float], Double)] =
    centDf
      .select(col("c_id"), col("c_emb"), col("c_n2").cast("double").as("c_n2d"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
      .sortBy(_._1)

  /** Margin-gated nearest-centroid assignment as ONE narrow projection
    * over the collected (model-sized) quantizer — adds `c_id` to `df`.
    * Decimal-exact in effect: the fast-double argmax decides unless the
    * top-1/top-2 boundary gap is within RescoreEps, in which case the
    * decimal argmax re-decides (CaseWhen evaluates the decimal branch
    * only on ambiguous rows). Shared by ann_ivf (bucket membership) and
    * emb_kmeans (cluster assignment). */
  private[queries] def assignCentroid(df: DataFrame,
      centArr: Array[(Long, Seq[Float], Double)]): DataFrame =
    // Round-16 optimization: the margin-gated two-phase argmax runs as
    // the ONE codegen [[graft.functions.NearestCentroid]] expression
    // looping over a referenced centroid matrix. The literal-folded
    // array_sort(array(struct(...))) form it replaces (see that file's
    // scaladoc for the value-identity argument, spec-pinned in
    // NearestCentroidSpec) carried 2·nlist struct expressions each
    // holding a dim-wide literal vector, so per-EXECUTION plan
    // analysis + codegen grew linearly with the corpus-derived
    // nlist = ⌈√N⌉ — measured at sf0.1 (nlist = 45): ann_ivf warm
    // 4.6 s vs 1.9 s at nlist = 10 on identical data, and the round-15
    // verdict already called the fold's 4096 clamp "the ceiling of the
    // literal-folded assignment projection". try_divide parity (the
    // NullFixtureSpec zero-norm pushdown hazard) is preserved inside
    // the expression: a zero divisor yields a NULL assignment, never a
    // DIVIDE_BY_ZERO.
    df.withColumn("c_id",
      graft.functions.NearestCentroid.nearest_centroid(
        col("embedding"), col("n2").cast("double"), centArr, RescoreEps))

  /** Per-vector ranking against the broadcast centroid table, margin-
    * gated at `boundary` (the same fast-vs-decimal two-phase as
    * [[assignCentroid]], but windowed — only ever run on the QUERY set,
    * which is bounded). Shared by ann_ivf and ann_filtered's probe
    * branches. */
  private[queries] def rankCentroids(df: DataFrame, cent: DataFrame, boundary: Int): DataFrame = {
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("c_id"))
    val wFastA = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_fast").desc, col("c_id"))
    val wVec = Window.partitionBy(col("vec_id"))
    df.join(cent)
      .withColumn("c_fast",
        dotDbl(col("embedding"), col("c_emb")) /
          sqrt(col("n2").cast("double") * col("c_n2").cast("double")))
      .withColumn("fr", row_number().over(wFastA))
      .withColumn("gap",
        max(when(col("fr") === boundary, col("c_fast"))).over(wVec) -
          max(when(col("fr") === boundary + 1, col("c_fast"))).over(wVec))
      .withColumn("ambig", coalesce(col("gap") <= RescoreEps, lit(false)))
      .withColumn("c_cos",
        when(col("ambig"),
          dotDec(col("embedding"), col("c_emb")).cast("double") /
            sqrt(col("n2").cast("double") * col("c_n2").cast("double")))
          .otherwise(col("c_fast")))
      .withColumn("c_rank", row_number().over(wAssign))
  }

  /** The queries' nprobe nearest-centroid probe set:
    * (query_id, qe, qn2, c_id) — query-set × nprobe rows, broadcast by
    * every consumer. */
  private[queries] def ivfProbes(s: SparkSession, base: DataFrame, cent: DataFrame): DataFrame =
    rankCentroids(base.filter(col("vec_id") < NQ), cent, annNprobe(s))
      .filter(col("c_rank") <= annNprobe(s))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("n2").as("qn2"), col("c_id"))

  /** Probed-bucket candidate pairs: `corpus` (already centroid-assigned)
    * joined to the broadcast probe set on the bucket id. No dedup
    * needed: each member lives in exactly one bucket and a query's
    * probes are distinct buckets. */
  private[queries] def ivfCandidates(corpus: DataFrame, probes: DataFrame): DataFrame =
    corpus.join(broadcast(probes), Seq("c_id"))
      .filter(col("vec_id") =!= col("query_id"))
      // label rides along (skinny int) so a post-filter predicate on
      // vector-table metadata stays a narrow filter on the survivors
      .select(col("query_id"), col("vec_id"), col("label"), col("qe"),
        col("embedding"), col("qn2"), col("n2"))

  /** Exact decimal top-`k` per query over a candidate frame — the
    * two-phase rescoring of topkPairs/ann_lsh as a reusable tail:
    * double-rank the candidates, decimal-rescore only the tie-aware
    * top-k prefix, exact-rank the survivors. Candidate volume is
    * bucket-bounded for every caller, so the windows never see the
    * corpus (the bounded-aggregator shape of ann_brute is for
    * corpus-sized candidate sets). */
  private[queries] def exactTopK(cands: DataFrame, k: Int): DataFrame = {
    val wFast = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_fast").desc, col("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cands
      .withColumn("cos_fast",
        dotDbl(col("qe"), col("embedding")) /
          sqrt(col("qn2").cast("double") * col("n2").cast("double")))
      .withColumn("rk_fast", row_number().over(wFast))
      .transform(tieAwareCutK(k))
      .withColumn("cosine",
        dotDec(col("qe"), col("embedding")).cast("double") /
          sqrt(col("qn2").cast("double") * col("n2").cast("double")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  private[queries] def annIvfBody(s: SparkSession, base: DataFrame, cent: DataFrame,
      centArr: Array[(Long, Seq[Float], Double)]): DataFrame = {
    val members = assignCentroid(base, centArr)
      .select(col("vec_id"), col("label"), col("embedding"), col("n2"), col("c_id"))
    // probe branch: |queries| rows need their top-nprobe centroids —
    // a per-vector window is fine at query-set size, with the same
    // margin gate at the nprobe boundary
    val probes = ivfProbes(s, base, cent)
    exactTopK(ivfCandidates(members, probes), K)
      .select(col("query_id"), col("rk"), col("vec_id"),
        round(col("cosine"), 9).as("cosine"))
      .orderBy(col("query_id"), col("rk"))
  }
}
