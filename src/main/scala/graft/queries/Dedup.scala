package graft.queries

import graft.{QueryModule, Staging, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for a training-data pipeline (builder prompt):
  * exact, MinHash+LSH, SimHash, and n-gram Jaccard near-dup detection.
  *
  * Scale design (the whole point of these ops at 100 TB):
  *  - NOTHING here is O(n²) over documents. Every near-dup variant
  *    generates candidate pairs through a blocking key — LSH band
  *    signature, SimHash chunk, bounded id-window — then verifies only
  *    candidates. The shuffle keys are (band, signature) / chunk values,
  *    so equal signatures co-locate and the join is a plain shuffle join.
  *  - Hot buckets (a signature shared by thousands of near-identical
  *    docs) are the classic skew risk; AQE skew-join handles moderate
  *    cases, and the band width (4 rows/band) keeps bucket sizes small.
  *  - All hashes are md5-derived so the DuckDB oracle can reproduce them
  *    bit-for-bit (Spark's murmur3 `hash()` is not portable).
  *
  * MinHash math: P[band collision] = 1-(1-J^r)^b with r=4 rows, b=4
  * bands → ~0.97 at J=0.8, ~0.04 at J=0.3 — tuned to catch the fixture's
  * planted near-dups (J≈0.9+) with few false candidates.
  */
object Dedup extends QueryModule {

  /** Distinct word-3-gram shingles per doc: (doc_id, s), staged to
    * parquet once per input dir (see [[graft.Staging]]): every consumer
    * (band signatures, both verify sides, both size aggregates) reads the
    * staged table instead of re-scanning + re-exploding the corpus. */
  // one codegen WordShingles call per doc builds the DISTINCT shingle
  // set locally (see GramSet) — explode-all-positions + corpus-wide
  // .distinct() did the same dedup through a full gram-volume exchange
  // (the key is (doc_id, s), so deduplication is per-doc by definition
  // and needs no shuffle); a transform(...) array would instead run an
  // interpreted per-element lambda
  private def shingles(s: SparkSession, d: String): DataFrame =
    Staging.stage(s, "shingles", d) {
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(graft.functions.GramSet.word_shingles(col("text"), 3)).as("s"))
    }

  /** 16 portable minhashes → 4 LSH bands of 4; returns (doc_id, band,
    * sig). One md5 per (shingle, band) supplies the band's four 32-bit
    * minhash lanes as non-overlapping 8-hex chunks (md5 bits are
    * well-mixed, so the chunks act as independent hash functions) —
    * 4 hashes per shingle instead of 16, one aggregation instead of two,
    * same r=4/b=4 LSH collision curve. Fixed-width lowercase hex makes
    * lexicographic MIN equal numeric MIN per lane. */
  // One codegen MinhashBandSigs call per doc folds all 4 band signatures
  // (see the expression's scaladoc: min is idempotent, so per-occurrence
  // folding equals the groupBy over distinct staged shingles) — the old
  // build exploded shingles × bands into a 4-lane min aggregate, a
  // shingle-volume shuffle. Still staged: the a/b sides of the candidate
  // self-join each read the (tiny) signature parquet rather than
  // rescanning documents — round-1 plans showed canonicalized-subtree
  // ReusedExchange never fired across the join tree (12 corpus scans);
  // staging makes reuse unconditional.
  private def bandSignatures(s: SparkSession, d: String): DataFrame =
    Staging.stage(s, "band_sigs", d) {
      Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(graft.functions.MinhashBandSigs.minhash_band_sigs(col("text"), 3))
            .as(Seq("band", "sig")))
    }

  /** LSH band-collision candidate pairs (d1 < d2), deduplicated — the
    * content-based blocker feeding both verify paths (exact Jaccard in
    * dedup_minhash, edit distance in dedup_lev_blocked). Reads the staged
    * signature table twice; never touches the corpus. */
  private def lshCandidates(s: SparkSession, d: String): DataFrame = {
    val bands = bandSignatures(s, d)
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** Distinct lowercase char-4-grams per doc: (doc_id, g), staged to
    * parquet once per input dir — the x/y verify sides and the size
    * aggregate all read the gram parquet instead of re-exploding
    * ~n_chars rows/doc. Positions are exploded and the gram cut with
    * codegen substr (a transform() array would run the cut through an
    * interpreted lambda). */
  // per-doc distinct grams from one codegen call (same rationale as
  // [[shingles]]: the dedup key is (doc_id, g) — no shuffle required)
  private def char4grams(s: SparkSession, d: String): DataFrame =
    Staging.stage(s, "char4grams", d) {
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(graft.functions.GramSet.distinct_grams(lower(col("text")), 4)).as("g"))
    }

  /** Verified MinHash near-dup pairs (d1 < d2, exact-Jaccard ≥ 0.6 over
    * LSH band-collision candidates) WITHOUT the presentation sort — the
    * shared edge list for `dedup_minhash` (which just sorts it) and the
    * clustering / curation consumers (where a sort under a join would be
    * dead work). */
  private def minhashPairs(s: SparkSession, d: String): DataFrame = {
    val cand = lshCandidates(s, d)
    val sh = shingles(s, d)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("x"), col("d1") === col("x.doc_id"))
      .join(sh.as("y"), col("d2") === col("y.doc_id") && col("x.s") === col("y.s"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("ninter"))
    inter
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .withColumn("jaccard",
        round(col("ninter") * lit(1.0) / (col("s1.n") + col("s2.n") - col("ninter")), 6))
      .filter(col("jaccard") >= 0.6)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** Span length (in whitespace tokens) for substring-level dedup: a
    * window of `SpanK` consecutive tokens repeated across ≥2 distinct
    * documents marks a duplicated span. 8 on the fixtures' short docs;
    * the production value is 50 (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better" — the ≥50-token-span recipe). */
  private val SpanK = 8

  /** Longest document (chars) admitted to the char-level edit-distance
    * verifiers — past this, even banded DP is O(len·0.2len) per pair
    * and long near-identical docs stall executor cores; fingerprint
    * verification covers that regime. Oracle-pinned knob
    * `spark.graft.dedup.levMaxLen` (Verify downgrades on override). */
  private val LevMaxLenDefault = 20000
  private def levMaxLen(s: SparkSession): Int =
    s.conf.getOption("spark.graft.dedup.levMaxLen")
      .map(_.toInt).getOrElse(LevMaxLenDefault)

  /** (doc_id, pos, h): one posting per token position, h = md5 of the
    * [[SpanK]]-token shingle starting there (1-based positions). Staged
    * (see [[graft.Staging]]): the duplicate-hash aggregate and the
    * join-back both read this table. The per-position hash array is
    * built per document BEFORE the explode (a `transform` HOF), so the
    * generator emits (pos, 32-char hash) pairs — exploding positions
    * first and slicing afterwards would copy the document's whole token
    * array into every generated row (quadratic bytes in-flight per doc,
    * the same trap WinnowMin's scaladoc records for char grams). */
  private def spanPostings(s: SparkSession, d: String): DataFrame =
    Staging.stage(s, "span_postings", d) {
      tokenSpanPostings(Tables.documents(s, d), SpanK)
    }

  /** Un-staged posting builder over any (doc_id, text) frame — split out
    * so the spec can pin the span semantics on crafted documents. The
    * per-window hashes come from the codegen
    * [[graft.functions.TokenWindowHashes]] expression — value-identical
    * to the `transform(sequence(...), i -> md5(array_join(slice(toks,
    * i, k), ' ')))` HOF it replaced (parity pinned in DedupSpec; the
    * SQL oracle keeps the list_slice formulation), but one fused byte
    * pass per document instead of an interpreted lambda per window.
    * Measured at the 100× fixture (adjacent same-machine runs): the
    * staged span_postings build dropped 8.6 → 6.2 s — the remainder is
    * the ~50 M-row parquet write both variants pay, so the compute
    * share of the build shrank far more than the 1.4× end-to-end. */
  private[graft] def tokenSpanPostings(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(graft.functions.TokenWindowHashes.token_window_hashes(
          col("text"), k)).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("h"))

  /** Duplicated-hash filter + per-doc islands merge over a postings
    * frame (see the dedup_substring docstring for the full shape). */
  private[graft] def substringSpans(p: DataFrame, k: Int): DataFrame = {
    val dup = p.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
    mergeSpanIslands(p.join(dup, Seq("h")), k, "n_docs", "max_docs")
  }

  /** Merge consecutive flagged positions into MAXIMAL spans per doc —
    * the gaps-and-islands step shared by [[substringSpans]] and the
    * incremental variant (one copy of the pos − row_number trick and
    * the + (k−1) length arithmetic): `r` carries (doc_id, pos, cntCol);
    * each island reports its start, token length, and max(cntCol) as
    * `outCol`. The window is per-document, bounded by doc length. */
  private def mergeSpanIslands(
      r: DataFrame, k: Int, cntCol: String, outCol: String): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    r.withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (count(lit(1)) + (k - 1)).as("span_len"),
        max(col(cntCol)).as(outCol))
      .select(col("doc_id"), col("span_start"), col("span_len"), col(outCol))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** streaming_dedup_near is this module's one micro-batch-harness
    * gate (see [[graft.QueryModule.microBatchGates]]). */
  override def microBatchGates: Set[String] =
    queries.keySet.filter(_.startsWith("streaming_"))

  val queries: Map[String, Q] = Map(

    // SUBSTRING-level (cross-document span) dedup — the Lee et al.
    // suffix-array recipe re-expressed as an inverted shingle index
    // (round-9 verdict item 1): all the document-granular dedups above
    // miss boilerplate/template SPANS repeated inside otherwise-distinct
    // pages, the single largest dup mass in real web corpora. Shape:
    //   1. one posting per token position (doc, pos, hash of the
    //      SpanK-token shingle) — linear in corpus tokens, the same
    //      volume a suffix array indexes;
    //   2. hashes seen in ≥2 DISTINCT docs — the shingle hash is the
    //      blocking/shuffle key; count(distinct doc) partial-aggregates
    //      map-side, and a boilerplate hash hot across millions of docs
    //      is one skewed reduce key, which AQE's skew handling splits;
    //   3. join the duplicated hashes back to the postings (shuffle
    //      join on the hash — never an all-pairs doc comparison);
    //   4. merge runs of consecutive duplicated positions per doc into
    //      MAXIMAL spans (gaps-and-islands: pos − row_number is
    //      constant within a run) — the window is per-document, so its
    //      partition is bounded by doc length at any corpus size.
    // Output: every maximal duplicated span ≥ SpanK tokens with its
    // start, token length, and the widest cross-doc reach of any
    // shingle inside it. Exact — md5 shingles make Spark and the
    // DuckDB oracle bit-identical, so the gate is a hash match.
    "dedup_substring" -> { (s, d) =>
      substringSpans(spanPostings(s, d), SpanK)
    },

    // Exact PHRASE SEARCH over the same staged inverted index — the
    // retrieval consumer a span-postings table exists for beyond dedup:
    // an 8-token phrase IS one shingle hash, so lookup is a probe of
    // the posting list, never a text scan. Query phrases are derived
    // deterministically (the first SpanK tokens of five fixed docs) so
    // both engines build the identical query set; docs shorter than one
    // window contribute no phrase on either side. The dim-sized query
    // set BROADCASTS onto the postings scan — at 100 TB the probe is
    // one broadcast hash join against the staged index, no corpus
    // shuffle (PlanSpec-pinned); self-matches (the source doc at pos 1)
    // are kept deliberately — they prove retrieval, and a consumer
    // filters them trivially.
    "text_phrase_search" -> { (s, d) =>
      val queryDocs = Seq(0L, 7L, 14L, 21L, 28L)
      val qs = Tables.documents(s, d)
        .filter(col("doc_id").isin(queryDocs: _*))
        .filter(size(split(col("text"), " ")) >= SpanK)
        .select(col("doc_id").as("query_id"),
          md5(array_join(slice(split(col("text"), " "), 1, SpanK), " ")).as("h"))
      spanPostings(s, d).join(broadcast(qs), Seq("h"))
        .select(col("query_id"), col("doc_id"), col("pos"))
        .orderBy(col("query_id"), col("doc_id"), col("pos"))
    },

    // The CONSUMER of dedup_substring: actually remove the duplicated
    // spans (Lee et al.'s point is the removal, not the report). Policy:
    // per duplicated shingle hash, the doc with the MIN doc_id keeps
    // ALL of its occurrences (within-doc repeats included — within-doc
    // duplication is dedup_exact/minhash territory, not this op's);
    // every OTHER doc's occurrences are removed. A removed
    // position covers tokens [pos, pos+SpanK-1], so the removed token
    // count per doc is the INTERVAL UNION of its removed windows —
    // computed per document with the lag-based island split (a new
    // island starts when pos > prev + SpanK - 1; islands never span
    // documents, so the window partition is bounded by doc length).
    // Everything is exact integer arithmetic over the same staged
    // postings ⇒ hash-exact against the oracle. Output: per affected
    // doc, its token count, removed-token count, and removal fraction.
    "pipeline_span_dedup" -> { (s, d) =>
      val p = spanPostings(s, d)
      val keep = p.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("keeper"))
        .filter(col("n_docs") >= 2)
      val removed = p.join(keep, Seq("h"))
        .filter(col("doc_id") =!= col("keeper"))
        .select(col("doc_id"), col("pos")).distinct()
      val wLag = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val islands = removed
        .withColumn("brk",
          when(col("pos") > lag(col("pos"), 1).over(wLag) + (SpanK - 1), 1)
            .otherwise(lit(0)))
        .withColumn("island",
          sum(col("brk")).over(wLag.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("doc_id"), col("island"))
        .agg((max(col("pos")) - min(col("pos")) + SpanK).as("covered"))
        .groupBy(col("doc_id"))
        .agg(sum(col("covered")).as("n_removed"))
      val sizes = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      islands.join(sizes, Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
          round(col("n_removed") * lit(1.0) / col("n_tokens"), 6).as("pct_removed"))
        .orderBy(col("doc_id"))
    },

    // SET-OVERLAP sketch — the fourth sketch capability (after HLL
    // distinct, KLL quantiles, MG heavy hitters): estimate the SHINGLE
    // overlap between the train and test splits WITHOUT a join, via
    // k-minimum-values (KMV/theta-style) sketches of each split's
    // distinct word-3-gram set. This is the n-gram contamination
    // measurement the big LLM reports run ("what fraction of eval
    // n-grams appear in training data") answered from two bounded
    // sketches: each side reduces to its k smallest distinct
    // md5-derived 60-bit shingle-hash values (the bounded
    // [[graft.operators.TopK.kMinDistinct]] aggregator — map-side
    // partial merge, the exchange carries ≤k longs per task; the
    // shingle source is the SAME staged table every minhash consumer
    // reads), and union/Jaccard/intersection estimates are pure
    // arithmetic over the two k-min sets:
    //   U      = k smallest of S_A ∪ S_B          (the union's KMV)
    //   û(A∪B) = |U| < k ? |U| : (k−1)·2^60/max(U)  (the KMV estimator)
    //   ĵ      = |U ∩ S_A ∩ S_B| / |U|              (resemblance)
    //   î(A∩B) = ĵ · û                              (inclusion)
    // Everything is DETERMINISTIC — md5-derived hashes, set-union
    // k-min is order-independent, and the estimator arithmetic is the
    // same IEEE expression in both engines — so unlike the value-
    // randomized sketch families this one is fully ORACLED (DuckDB
    // mirrors the k-min sets with ORDER BY h LIMIT k and the same
    // formulas). Std error of ĵ is ~sqrt(j(1−j)/k) (k=256 ⇒ ±~2%
    // absolute at the fixture's j≈0.10) — accuracy asserted against
    // planted-overlap streams in ScalaTest and against the exact
    // intersection on the fixtures.
    "pipeline_overlap_est" -> { (s, d) =>
      import s.implicits._
      val k = 256
      val bucket = graft.functions.Md5LongPrefix.md5_prefix(col("doc_id").cast("string"), 6) % 10
      // GLOBAL typed aggregate (not groupByKey(_ => true)): a global
      // aggregate emits its zero row on EMPTY input, so an empty split
      // (nothing hashed into the bucket — possible on small/custom
      // fixtures) yields an empty k-min set and the query still returns
      // its one estimate row, matching the oracle's aggregate CTE
      def kmin(pred: org.apache.spark.sql.Column) =
        shingles(s, d).filter(pred)
          .select(graft.functions.Md5LongPrefix.md5_prefix(col("s"), 15).as("h"))
          .as[Long]
          .select(graft.operators.TopK.kMinDistinct(k).toColumn.name("s"))
      val a = kmin(bucket < 8).select(col("s").as("sa"))
      val b = kmin(bucket === 9).select(col("s").as("sb"))
      a.crossJoin(b) // 1×1
        .withColumn("u", slice(array_sort(array_distinct(
          concat(col("sa"), col("sb")))), 1, k))
        .withColumn("n_u", size(col("u")))
        // array_max == last element of the ascending k-min set, and is
        // NULL (not an ANSI index error) on the empty-split edge
        .withColumn("x_k", array_max(col("u")))
        .withColumn("union_est",
          when(col("n_u") < k, col("n_u").cast("double"))
            .otherwise(lit((k - 1).toDouble) * pow(lit(2.0), lit(60.0)) /
              col("x_k").cast("double")))
        .withColumn("n_both", size(expr(
          "filter(u, h -> array_contains(sa, h) AND array_contains(sb, h))")))
        // n_u = 0 (both splits empty) pins the ratios to 0 explicitly —
        // never an engine-specific 0/0
        .withColumn("jaccard_est",
          when(col("n_u") === 0, lit(0.0))
            .otherwise(round(col("n_both").cast("double") / col("n_u"), 6)))
        .withColumn("inter_est",
          when(col("n_u") === 0, lit(0.0))
            .otherwise(round(
              col("n_both").cast("double") / col("n_u") * col("union_est"), 2)))
        .select(lit(k).as("k"), col("n_u"), col("n_both"),
          round(col("union_est"), 2).as("union_est"),
          col("jaccard_est"), col("inter_est"))
    },

    // INCREMENTAL substring dedup — the continuous-ingest variant of
    // dedup_substring (the span-level analog of dedup_incremental's
    // delta-vs-base discipline): which spans of the NEWLY ARRIVED docs
    // (doc_id % 10 = 0, the same split rule) already exist in the base
    // corpus? Both sides are filter-pushdown slices of the ONE staged
    // span_postings table (nothing re-tokenizes); the base side reduces
    // to a (hash → distinct base docs) index with map-side partial
    // aggregation, the delta postings join it on the hash (blocking
    // key — never an all-pairs comparison), and consecutive covered
    // positions merge into maximal spans with the same per-DELTA-DOC
    // gaps-and-islands window dedup_substring uses (partition bounded
    // by doc length). At 100 TB the base index is the persisted
    // artifact a real ingest maintains; each delta batch touches it
    // through one hash-partitioned join. Exact md5 both sides ⇒ hash
    // oracle.
    "dedup_substring_incremental" -> { (s, d) =>
      val p = spanPostings(s, d)
      val baseIdx = p.filter(col("doc_id") % 10 =!= 0)
        .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("nb"))
      val r = p.filter(col("doc_id") % 10 === 0).join(baseIdx, Seq("h"))
      mergeSpanIslands(r, SpanK, "nb", "max_base_docs")
    },

    // CONTAMINATION SCREENING of an incoming delta batch with a BLOOM
    // PREFILTER ([[graft.operators.Bloom]]) — per new doc, how many of
    // its distinct span hashes already exist anywhere in the base
    // corpus (the score an ingest gate uses to admit/quarantine a
    // crawl dump; dedup_substring_incremental reports WHERE, this
    // reports HOW MUCH). The 100 TB shape this exists for: the exact
    // hash join must shuffle BOTH full posting sides, but base span
    // hashes folded into a bloom (16 bits/key ⇒ FPR ≈ 0.24 %) travel
    // as ONE broadcast array, and the map-side membership probe (pure
    // builtin bit tests, whole-stage codegen) drops ~all non-matching
    // delta hashes BEFORE the exchange — only maybe-members (true
    // matches + ~0.24 % FPs) reach the exact verify join that kills
    // the false positives. Bloom has NO false negatives, so the
    // output is provably the exact answer and the query stays fully
    // hash-ORACLED (the oracle runs the plain exact join; prefilter
    // transparency is also spec-pinned at the DataFrame level). The
    // filter sizes itself from a base-index count (model-sized scalar
    // to the driver, the IVF-quantizer/CC-convergence precedent;
    // build = partial blooms per partition OR-merged, an exchange of
    // O(partitions × m/8) bytes, never the key set).
    "dedup_bloom_prefilter" -> { (s, d) =>
      import s.implicits._
      val p = spanPostings(s, d)
      // sizing: the TOTAL posting count upper-bounds the distinct base
      // hash count — a vectorized metadata-cheap count over the staged
      // parquet, no wide job; overestimating n only LOWERS the FPR
      // (bitsFor's power-of-two step absorbs the slack)
      val mBits = graft.operators.Bloom.bitsFor(p.count())
      // build over the RAW base postings: bloom insertion is
      // idempotent, so the build pays NO distinct exchange (the only
      // shuffle is one partial bit-array per partition) — the exact
      // verify join below is the only consumer that needs distinct.
      // Round-17 (guide §2.2/§5 — the round-16 scaling anomaly): each
      // scan task emits a FULL m/8-byte partial bit array and every
      // partial funnels through the ONE final-merge task, so the merge
      // volume is tasks × m/8 — at 32 cores the split-floored scan
      // planned ~10× more partials than at 8, which is exactly the
      // measured inverse scaling. Bound the partial count by the merge
      // volume (≤ ~16 MiB of partials), never below 2 (parallel build)
      // nor above the cores: a narrow coalesce, no extra shuffle, and
      // bit-OR idempotence makes the value partition-invariant.
      // Production at ≥2.7e8 keys shards the hash space instead (see
      // [[graft.operators.Bloom]] scaladoc).
      val buildParts = math.max(2L, math.min(
        s.sparkContext.defaultParallelism.toLong,
        (16L * 1024 * 1024) / math.max(1L, mBits / 8))).toInt
      val bloom = p.filter(col("doc_id") % 10 =!= 0)
        .select(col("h")).coalesce(buildParts).as[String]
        .select(graft.operators.Bloom.agg(mBits).toColumn.name("bloom"))
        .toDF("bloom")
      val baseH = p.filter(col("doc_id") % 10 =!= 0).select(col("h")).distinct()
      val deltaRaw = p.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("h"))
      val totals = deltaRaw.groupBy(col("doc_id"))
        .agg(countDistinct(col("h")).as("n_spans"))
      // the probe sits DIRECTLY on the staged-parquet scan (before any
      // exchange — PlanSpec-pinned): only maybe-members pay the
      // distinct + verify-join shuffles
      val maybe = deltaRaw.crossJoin(broadcast(bloom))
        .filter(graft.operators.Bloom.member(col("h"), col("bloom"), mBits))
        .select(col("doc_id"), col("h")).distinct()
      val dups = maybe.join(baseH, Seq("h"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_spans"))
      // LEFT join from totals: a CLEAN delta doc is a screening result
      // too (dup_frac 0) — an ingest gate must be able to tell
      // "screened clean" from "never screened"
      totals.join(dups, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_spans"),
          coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
          round(coalesce(col("n_dup_spans"), lit(0L)) * lit(1.0) / col("n_spans"), 6)
            .as("dup_frac"))
        .orderBy(col("doc_id"))
    },

    // Exact dedup: content-hash groupBy; canonical = min doc_id. The
    // output keeps every group (n_copies = 1 for uniques) so the oracle
    // verifies the full grouping, not just the dup tail.
    "dedup_exact" -> { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("canonical_id"))
    },

    // MinHash + LSH: band-collision candidates, then exact-Jaccard
    // verification of candidates only. Emits verified near-dup pairs.
    "dedup_minhash" -> { (s, d) =>
      minhashPairs(s, d).orderBy(col("d1"), col("d2"))
    },

    // Near-dup CLUSTERING — the step between pair emission and "keep one
    // copy": connected components over the verified MinHash pair graph
    // ([[graft.operators.ConnectedComponents]] — per-round staged
    // min-label propagation, node-set-sized shuffles), labelling every
    // member with the component's min doc_id (= the canonical survivor)
    // plus the component size. The final size window runs over the
    // labelled node set, which is output-scale, never the corpus.
    "dedup_cluster" -> { (s, d) =>
      val edges = minhashPairs(s, d)
        .select(col("d1").as("src"), col("d2").as("dst"))
      graft.operators.ConnectedComponents.label(s, edges, "cc", d)
        .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy(col("label"))))
        .select(col("id").as("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
        .orderBy(col("doc_id"))
    },

    // LEAKAGE-SAFE train/val/test split — the assignment discipline for
    // corpora where near-dup VARIANTS are kept (contrast: data_split
    // hashes raw doc_ids, so a near-dup pair can straddle train/test —
    // silent eval contamination; pipeline_curate DROPS the losers).
    // Every doc is keyed by its near-dup CLUSTER (connected components
    // over the verified MinHash pair graph — the staged labels are
    // SHARED with dedup_cluster: same edge plan, same stage key, so one
    // CC run serves both queries) and the md5 split decision is made on
    // the cluster id: all members land in the same split BY
    // CONSTRUCTION, so cross-split near-dup leakage is structurally
    // zero (spec-asserted over every verified pair). Scale: the label
    // table is node-set-sized (docs in ≥1 pair, output-scale), left-
    // joined onto the corpus on doc_id; singletons fall back to their
    // own id; the split decision is a narrow md5 map — the one corpus-
    // sized operation is that single equi-join.
    "data_split_leakage_safe" -> { (s, d) =>
      val edges = minhashPairs(s, d)
        .select(col("d1").as("src"), col("d2").as("dst"))
      val labels = graft.operators.ConnectedComponents.label(s, edges, "cc", d)
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val b = graft.functions.Md5LongPrefix.md5_prefix(concat(lit("split|"),
        col("cluster_id").cast("string")), 6) % 10
      docs.join(labels, docs("doc_id") === labels("id"), "left")
        .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
        .withColumn("split",
          when(b < 8, "train").when(b === 8, "val").otherwise("test"))
        .orderBy(col("doc_id"))
    },

    // SimHash near-dup: block on any equal 16-bit chunk (pigeonhole: a
    // pair within hamming 3 of a 64-bit signature shares ≥1 of 4 chunks),
    // verify hamming ≤ 3 via xor+popcount. Signatures are computed ONCE
    // (staged), unpivoted to (doc_id, chunk_idx, chunk_val), and candidate
    // pairs come from a SINGLE self-join on (chunk_idx, chunk_val) — the
    // round-1 shape (4 unionAll'd self-joins) recomputed the signature DAG
    // 8×. Chunk-value skew (many docs sharing one 16-bit chunk) is the
    // known hazard at corpus scale; AQE skew-join splits hot buckets, and
    // the distinct-before-verify keeps the verify side |pairs|-sized.
    "dedup_simhash" -> { (s, d) =>
      val sig = Staging.stage(s, "simhash_sigs", d) {
        TextAnalysis.queries("text_simhash")(s, d)
      }
      val chunks = sig.select(col("doc_id"),
        posexplode(array(col("c0"), col("c1"), col("c2"), col("c3"))).as(Seq("ci", "cv")))
      val cand = chunks.as("a")
        .join(chunks.as("b"),
          col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      cand
        .join(sig.as("x"), col("d1") === col("x.doc_id"))
        .join(sig.as("y"), col("d2") === col("y.doc_id"))
        .select(col("d1"), col("d2"),
          ((0 to 3).map(i =>
            bit_count(col(s"x.c$i").bitwiseXOR(col(s"y.c$i")))): Seq[org.apache.spark.sql.Column])
            .reduce(_ + _).as("hamming"))
        .filter(col("hamming") <= 3)
        .orderBy(col("d1"), col("d2"))
    },

    // Edit-distance near-dup over the bounded id-window pair set:
    // levenshtein is O(len²) per pair, so it only ever runs on blocked
    // candidates (here the id window; in production an LSH/simhash
    // blocker) — never corpus × corpus. Pairs where either doc exceeds
    // [[levMaxLen]] are excluded OUTRIGHT: even the banded DP is
    // O(len·0.2len) and two near-identical multi-hundred-KB docs would
    // stall an executor core for minutes (the SkewFixtureSpec
    // scenario) — char-level DP is a SHORT-document verifier; past the
    // bound, production verifies by fingerprint/shingle (dedup_minhash,
    // dedup_substring), which this corpus-scale suite already provides.
    "dedup_levenshtein" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val cand = docs.select(col("doc_id").as("d1"), col("text").as("t1"),
        explode(expr("sequence(doc_id + 1, doc_id + 3)")).as("d2"))
      cand.join(docs.select(col("doc_id").as("d2"), col("text").as("t2")), Seq("d2"))
        .filter(greatest(length(col("t1")), length(col("t2"))) <= levMaxLen(s))
        // length prefilter, semantics-preserving: |len1-len2| lower-bounds
        // edit distance, so a pair violating it cannot reach similarity
        // 0.8 — skips the DP for most candidates
        .filter(abs(length(col("t1")) - length(col("t2"))) <=
          lit(0.2) * greatest(length(col("t1")), length(col("t2"))))
        // BOUNDED levenshtein: a pair can only survive with dist ≤
        // 0.2·max_len, so cap the DP there — Spark's 3-arg levenshtein
        // runs the O(len·k) banded DP and returns -1 past the cap, and
        // every -1 pair is exactly a pair the unbounded filter would
        // drop (dist > 0.2·max_len ⇔ sim < 0.8), so results are
        // identical to the oracle's full DP
        .select(col("d1"), col("d2"),
          // the DP sits INSIDE the length-guard CASE WHEN: pushed-down
          // filter predicates inline this whole expression, and a
          // combined conjunction does not promise to evaluate the
          // cheap guard filter first — the SkewFixtureSpec giants
          // measured 580+ s of DP before the conditional was added
          when(greatest(length(col("t1")), length(col("t2"))) <= levMaxLen(s),
            expr("levenshtein(t1, t2, CAST(FLOOR(0.2 * greatest(length(t1), length(t2))) AS INT))"))
            .otherwise(lit(-1))
            .as("edit_dist"),
          greatest(length(col("t1")), length(col("t2"))).as("max_len"))
        .filter(col("edit_dist") >= 0)
        // filter on the RAW value (the oracle's WHERE is unrounded too);
        // filtering on the rounded column would flip boundary pairs
        .withColumn("sim_raw",
          lit(1.0) - col("edit_dist").cast("double") / col("max_len"))
        .filter(col("sim_raw") >= 0.8)
        .select(col("d1"), col("d2"), col("edit_dist"),
          round(col("sim_raw"), 6).as("similarity"))
        .orderBy(col("d1"), col("d2"))
    },

    // Content-blocked edit-distance dedup — the composition a real
    // pipeline runs: MinHash LSH proposes candidates by CONTENT (no
    // positional assumption), levenshtein verifies each candidate pair.
    // The length prefilter is semantics-preserving (|len1-len2| lower-
    // bounds edit distance, so a violating pair can't reach 0.8) and
    // skips the O(len²) DP for most candidates. The candidate set is
    // |pairs|-sized, so joining the text back is a small shuffle — the
    // corpus itself never self-joins.
    "dedup_lev_blocked" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      lshCandidates(s, d)
        .join(docs.select(col("doc_id").as("d1"), col("text").as("t1")), Seq("d1"))
        .join(docs.select(col("doc_id").as("d2"), col("text").as("t2")), Seq("d2"))
        // long docs never enter the char-level DP — see dedup_levenshtein
        .filter(greatest(length(col("t1")), length(col("t2"))) <= levMaxLen(s))
        .filter(abs(length(col("t1")) - length(col("t2"))) <=
          lit(0.2) * greatest(length(col("t1")), length(col("t2"))))
        // bounded DP with -1 sentinel excluded — see dedup_levenshtein
        .select(col("d1"), col("d2"),
          // the DP sits INSIDE the length-guard CASE WHEN: pushed-down
          // filter predicates inline this whole expression, and a
          // combined conjunction does not promise to evaluate the
          // cheap guard filter first — the SkewFixtureSpec giants
          // measured 580+ s of DP before the conditional was added
          when(greatest(length(col("t1")), length(col("t2"))) <= levMaxLen(s),
            expr("levenshtein(t1, t2, CAST(FLOOR(0.2 * greatest(length(t1), length(t2))) AS INT))"))
            .otherwise(lit(-1))
            .as("edit_dist"),
          greatest(length(col("t1")), length(col("t2"))).as("max_len"))
        .filter(col("edit_dist") >= 0)
        .withColumn("sim_raw",
          lit(1.0) - col("edit_dist").cast("double") / col("max_len"))
        .filter(col("sim_raw") >= 0.8)
        .select(col("d1"), col("d2"), col("edit_dist"),
          round(col("sim_raw"), 6).as("similarity"))
        .orderBy(col("d1"), col("d2"))
    },

    // End-to-end curation pipeline — the composition a training-data
    // user actually runs: quality-filter the corpus, drop near-duplicate
    // losers (keep the lower doc_id of each verified MinHash pair), and
    // attach the reproducible split. One pass over documents plus the
    // LSH candidate machinery; the dedup exclusion is a broadcast-able
    // anti join on the (small) loser set.
    "pipeline_curate" -> { (s, d) =>
      val quality = Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 20 &&
          size(array_distinct(col("toks"))).cast("double") / size(col("toks")) > 0.05)
      val losers = minhashPairs(s, d).select(col("d2").as("doc_id")).distinct()
      val bucket = graft.functions.Md5LongPrefix.md5_prefix(col("doc_id").cast("string"), 6) % 10
      quality
        .join(losers, Seq("doc_id"), "left_anti")
        .withColumn("split",
          when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test"))
        .select(col("doc_id"), col("lang"), col("split"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // Train/test decontamination — the pipeline op every LLM corpus pass
    // runs before training: flag training documents that share ≥ 5
    // distinct word-3-gram shingles with any benchmark/eval document
    // (eval set here: doc_id % 37 == 0, a deterministic ~2.7% slice).
    // The scale shape rests on the real-world asymmetry the op exists
    // for: the benchmark suite is BOUNDED (thousands of docs) while the
    // training corpus is the 100 TB side — so the eval shingle index
    // broadcasts and the train side streams through a broadcast hash
    // join with NO corpus shuffle at all. Only the matched (train, eval)
    // overlap pairs — output-sized — reach the count aggregate, and the
    // worst-match rank windows over that flagged set, not the corpus.
    // Both sides read the per-doc-distinct staged shingle table, so
    // count(*) on the join IS the distinct-intersection size.
    "pipeline_decontaminate" -> { (s, d) =>
      val sh = shingles(s, d)
      val evalSh = sh.filter(col("doc_id") % 37 === 0)
        .select(col("doc_id").as("eval_id"), col("s"))
      val trainSh = sh.filter(col("doc_id") % 37 =!= 0)
        .select(col("doc_id").as("train_id"), col("s"))
      val flagged = trainSh.join(broadcast(evalSh), Seq("s"))
        .groupBy(col("train_id"), col("eval_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 5)
      flagged.withColumn("rk", row_number().over(
          Window.partitionBy(col("train_id"))
            .orderBy(col("n_shared").desc, col("eval_id"))))
        .filter(col("rk") === 1)
        .select(col("train_id"), col("eval_id"), col("n_shared"))
        .orderBy(col("train_id"))
    },

    // Content-blocked n-gram dedup — the composition a real corpus pass
    // runs (round-2 verdict #1): MinHash LSH proposes candidate pairs by
    // CONTENT, exact char-4-gram Jaccard verifies each. The LSH
    // candidate set is output-sized (pairs that actually collide), so
    // the verify is computed PER PAIR by the codegen GramSet expressions
    // over the two normalized bodies — candidate-sized joins carrying
    // two ~n_chars strings beat a gram equi-join whose exchange carries
    // ~n_chars rows per involved document. (The id-window dedup_ngram
    // below keeps the gram-join shape: its pair set is corpus-sized,
    // where per-pair set building measured allocation-bound.)
    "dedup_ngram_blocked" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), lower(col("text")).as("norm"))
        .withColumn("n", graft.functions.GramSet.distinct_gram_count(col("norm"), 4))
      lshCandidates(s, d)
        .join(docs.select(col("doc_id").as("d1"), col("norm").as("na"), col("n").as("n1")), Seq("d1"))
        .join(docs.select(col("doc_id").as("d2"), col("norm").as("nb"), col("n").as("n2")), Seq("d2"))
        .withColumn("ninter",
          graft.functions.GramSet.gram_intersect_count(col("na"), col("nb"), 4))
        .withColumn("jaccard",
          round(col("ninter") * lit(1.0) / (col("n1") + col("n2") - col("ninter")), 6))
        .filter(col("jaccard") >= 0.6)
        .select(col("d1"), col("d2"), col("jaccard"))
        .orderBy(col("d1"), col("d2"))
    },

    // Exact char-4-gram Jaccard over a bounded id-window pair set (the
    // "given candidates from any blocker, verify exactly" primitive).
    // PAIR-VOLUME NOTE: this pair set is corpus-sized (5 offsets × every
    // doc), so the intersection goes through the staged-gram equi-join —
    // streaming hash aggregation, no per-row set building. The per-pair
    // GramSet-expression shape (see dedup_ngram_blocked) measured 10×
    // WORSE here at 10× scale (250k pairs × 2 fresh hash sets per pair
    // is allocation-bound); it only wins when the candidate set is
    // output-sized, which an id-window by construction is not.
    "dedup_ngram" -> { (s, d) =>
      val grams = char4grams(s, d)
      val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val docs = Tables.documents(s, d).select(col("doc_id"))
      // candidate pairs by construction (explode the id offsets, keep
      // pairs whose partner exists via an equi semi join) — a non-equi
      // range self-join would plan as a nested-loop scan
      val cand = docs
        .select(col("doc_id").as("d1"),
          explode(expr("sequence(doc_id + 1, doc_id + 5)")).as("d2"))
        .join(docs.select(col("doc_id").as("d2")), Seq("d2"), "left_semi")
        .select(col("d1"), col("d2"))
      val inter = cand
        .join(grams.as("x"), col("d1") === col("x.doc_id"))
        .join(grams.as("y"), col("d2") === col("y.doc_id") && col("x.g") === col("y.g"))
        .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("ninter"))
      cand.join(inter, Seq("d1", "d2"), "left")
        .withColumn("ninter", coalesce(col("ninter"), lit(0L)))
        .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
        .withColumn("jaccard",
          round(col("ninter") * lit(1.0) / (col("s1.n") + col("s2.n") - col("ninter")), 6))
        .select(col("d1"), col("d2"), col("jaccard"))
        .orderBy(col("d1"), col("d2"))
    },

    // INCREMENTAL dedup — the daily-ingest shape: a delta batch (docs
    // with doc_id % 10 == 0 stand in for "today's crawl") is near-dup
    // checked against the EXISTING base corpus without ever comparing
    // base docs to each other. This is the asymmetric variant every
    // production pipeline actually runs: at 100 TB the base corpus's
    // band signatures are precomputed once (here: the same staged
    // band_sigs parquet every minhash consumer reads — filter pushdown
    // carves the two sides out of one tiny signature table), the
    // delta-sized side drives the (band, sig) bucket join, the
    // candidate set is output-sized, and the shingle-Jaccard verify
    // joins only candidate doc_ids. Per delta doc the verdict is the
    // arg-max match (highest jaccard, min base_id tiebreak — a bounded
    // per-new-doc window over the verified pair set) plus the match
    // count, so downstream can drop or link the duplicate.
    "dedup_incremental" -> { (s, d) =>
      val sigs = bandSignatures(s, d)
      val newSigs = sigs.filter(col("doc_id") % 10 === 0)
      val baseSigs = sigs.filter(col("doc_id") % 10 =!= 0)
      val cand = newSigs.as("a")
        .join(baseSigs.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig"))
        .select(col("a.doc_id").as("new_id"), col("b.doc_id").as("base_id"))
        .distinct()
      incrementalVerifyTail(s, d, cand)
    },

    // NEAR-DUP ON INGEST (gate 14, round-11 verdict item 4): the
    // streaming twin of dedup_incremental. The base corpus's band
    // signatures accumulate as keyed streaming state
    // ([[graft.streaming.Streaming.nearDupCandidates]] — state keyed by
    // (band, sig), the signature index a continuously-crawled corpus
    // maintains); the delta micro-batch probes the buckets and emits
    // candidate pairs immediately; the exact shingle-Jaccard verify +
    // per-new-doc argmax runs OUTSIDE the stream on the candidate-sized
    // output — the flag-then-verify split a production ingest runs.
    // The candidate set equals the batch bucket join deterministically
    // (base batch commits its state before the delta batch probes), so
    // dedup_incremental's oracle applies VERBATIM — a full hash gate.
    "streaming_dedup_near" -> { (s, d) =>
      val ss = graft.streaming.Streaming.stateSizedSession(s, d)
      val cand = graft.streaming.Streaming.runToCompletion(
        graft.streaming.Streaming.nearDupCandidates(
          graft.streaming.Streaming.documentsStreamBaseDelta(ss, d))
          .toDF("new_id", "base_id"),
        "streaming_dedup_near_" + java.util.UUID.randomUUID().toString.take(8),
        org.apache.spark.sql.streaming.OutputMode.Append(),
        // candidates emit in the arriving batch; nothing watermark-held
        awaitWatermarkOutput = false)
        // a pair may collide in several bands — same dedup as the batch
        // twin's DISTINCT candidate set
        .select(col("new_id"), col("base_id")).distinct()
      // ONE copy of the batch verify tail (shared with dedup_incremental
      // — round-13 advice: the inlined twin could drift from the oracle
      // they share)
      incrementalVerifyTail(ss, d, cand)
    }
  )

  /** The incremental-dedup verify tail shared by `dedup_incremental` and
    * its streaming twin `streaming_dedup_near` (one oracle, ONE engine
    * copy): exact shingle-Jaccard over the candidate (new_id, base_id)
    * pairs — staged-shingle equi-join intersection, rounded Jaccard
    * ≥ 0.6, then the per-new-doc argmax verdict (highest jaccard, min
    * base_id tiebreak) plus the match count. The window is bounded by
    * the per-new-doc candidate count, never corpus-sized. */
  private def incrementalVerifyTail(s: SparkSession, d: String, cand: DataFrame): DataFrame = {
    val sh = shingles(s, d)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("x"), col("new_id") === col("x.doc_id"))
      .join(sh.as("y"), col("base_id") === col("y.doc_id") && col("x.s") === col("y.s"))
      .groupBy(col("new_id"), col("base_id")).agg(count(lit(1)).as("ninter"))
    inter
      .join(sizes.as("s1"), col("new_id") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("base_id") === col("s2.doc_id"))
      .withColumn("jaccard",
        round(col("ninter") * lit(1.0) / (col("s1.n") + col("s2.n") - col("ninter")), 6))
      .filter(col("jaccard") >= 0.6)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("new_id"))
          .orderBy(col("jaccard").desc, col("base_id"))))
      .withColumn("n_matches", count(lit(1)).over(Window.partitionBy(col("new_id"))))
      .filter(col("rk") === 1)
      .select(col("new_id"), col("base_id").as("dup_of"), col("jaccard"), col("n_matches"))
      .orderBy(col("new_id"))
  }

  private val shingleSql =
    """sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)))""".stripMargin

  /** shingles + band signatures + LSH candidate pairs — shared by the
    * minhash verify and the content-blocked levenshtein verify. */
  private val bandCandSql =
      s"""$shingleSql,
        |bands AS (
        |  SELECT doc_id, band,
        |         min(substr(md5(CAST(band AS VARCHAR) || '|' || s), 1, 8)) ||
        |         min(substr(md5(CAST(band AS VARCHAR) || '|' || s), 9, 8)) ||
        |         min(substr(md5(CAST(band AS VARCHAR) || '|' || s), 17, 8)) ||
        |         min(substr(md5(CAST(band AS VARCHAR) || '|' || s), 25, 8)) AS sig
        |  FROM sh, (SELECT unnest(generate_series(0, 3)) AS band)
        |  GROUP BY doc_id, band),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin

  private val minhashOracle =
      s"""WITH $bandCandSql,
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT c.d1, c.d2, count(*) AS ninter
        |  FROM cand c JOIN sh x ON x.doc_id = c.d1 JOIN sh y ON y.doc_id = c.d2 AND y.s = x.s
        |  GROUP BY c.d1, c.d2)
        |SELECT d1, d2, round(ninter * 1.0 / (s1.n + s2.n - ninter), 6) AS jaccard
        |FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
        |WHERE round(ninter * 1.0 / (s1.n + s2.n - ninter), 6) >= 0.6
        |ORDER BY d1, d2""".stripMargin

  private val gramsSql =
    """grams AS (
      |  SELECT DISTINCT doc_id, substr(norm, i, 4) AS g
      |  FROM (SELECT doc_id, norm, unnest(generate_series(1, greatest(length(norm) - 3, 1))) AS i
      |        FROM (SELECT doc_id, lower(text) AS norm FROM documents)))""".stripMargin

  /** Shared span-posting CTE (the DuckDB mirror of
    * [[tokenSpanPostings]]): one posting per token position, md5 of the
    * SpanK-token window — ONE copy for the dedup_substring /
    * dedup_substring_incremental / pipeline_span_dedup oracles, so a
    * SpanK or tokenization change can never drift between them. */
  private val spanPostingsSql =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |p AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |         md5(array_to_string(list_slice(toks, i, i + ${SpanK - 1}), ' ')) AS h
       |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - ${SpanK - 1})) AS i))""".stripMargin

  val oracles: Map[String, String] = Map(

    // KMV mirrored exactly: same shingle CTE as the minhash family,
    // same 60-bit md5 prefix hashes, k-min via ORDER BY h LIMIT k, and
    // the same IEEE estimator expressions ((k-1)*power(2,60)/x_k —
    // long→double conversion rounds identically in both engines)
    "pipeline_overlap_est" ->
      s"""WITH $shingleSql,
         |bk AS (SELECT doc_id,
         |              ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 10 AS bucket
         |       FROM documents),
         |ha AS (SELECT DISTINCT CAST(('0x' || substr(md5(s), 1, 15))::UBIGINT AS BIGINT) AS h
         |       FROM sh JOIN bk USING (doc_id) WHERE bucket < 8),
         |hb AS (SELECT DISTINCT CAST(('0x' || substr(md5(s), 1, 15))::UBIGINT AS BIGINT) AS h
         |       FROM sh JOIN bk USING (doc_id) WHERE bucket = 9),
         |ka AS (SELECT h FROM ha ORDER BY h LIMIT 256),
         |kb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
         |u AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) ORDER BY h LIMIT 256),
         |st AS (SELECT count(*) AS n_u, max(h) AS x_k,
         |              count(*) FILTER (WHERE h IN (SELECT h FROM ka)
         |                                 AND h IN (SELECT h FROM kb)) AS n_both
         |       FROM u),
         |est AS (SELECT n_u, n_both,
         |               CASE WHEN n_u < 256 THEN CAST(n_u AS DOUBLE)
         |                    ELSE 255 * power(2.0, 60.0) / CAST(x_k AS DOUBLE) END AS ue
         |        FROM st)
         |SELECT CAST(256 AS INT) AS k, CAST(n_u AS INT) AS n_u,
         |       CAST(n_both AS INT) AS n_both,
         |       round(ue, 2) AS union_est,
         |       CASE WHEN n_u = 0 THEN 0.0
         |            ELSE round(CAST(n_both AS DOUBLE) / n_u, 6) END AS jaccard_est,
         |       CASE WHEN n_u = 0 THEN 0.0
         |            ELSE round(CAST(n_both AS DOUBLE) / n_u * ue, 2) END AS inter_est
         |FROM est""".stripMargin,

    // same postings CTE as dedup_substring; base index = per-hash
    // distinct base-doc count, delta positions joined on the hash,
    // islands merged per delta doc
    "dedup_substring_incremental" ->
      s"""WITH $spanPostingsSql,
         |bh AS (SELECT h, count(DISTINCT doc_id) AS nb FROM p
         |       WHERE doc_id % 10 <> 0 GROUP BY h),
         |r AS (SELECT p.doc_id, p.pos, bh.nb
         |      FROM p JOIN bh USING (h) WHERE p.doc_id % 10 = 0),
         |i AS (SELECT doc_id, pos, nb,
         |             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |      FROM r)
         |SELECT doc_id, min(pos) AS span_start,
         |       count(*) + ${SpanK - 1} AS span_len,
         |       max(nb) AS max_base_docs
         |FROM i GROUP BY doc_id, grp
         |ORDER BY doc_id, span_start""".stripMargin,

    // the PLAIN exact join — the bloom prefilter is engine-internal
    // and provably output-transparent (no false negatives + exact
    // verify join), so the oracle never models it
    "dedup_bloom_prefilter" ->
      s"""WITH $spanPostingsSql,
         |bh AS (SELECT DISTINCT h FROM p WHERE doc_id % 10 <> 0),
         |dh AS (SELECT DISTINCT doc_id, h FROM p WHERE doc_id % 10 = 0),
         |tot AS (SELECT doc_id, count(*) AS n_spans FROM dh GROUP BY doc_id),
         |dup AS (SELECT doc_id, count(*) AS n_dup_spans
         |        FROM dh JOIN bh USING (h) GROUP BY doc_id)
         |SELECT doc_id, n_spans,
         |       coalesce(n_dup_spans, 0) AS n_dup_spans,
         |       round(coalesce(n_dup_spans, 0) * 1.0 / n_spans, 6) AS dup_frac
         |FROM tot LEFT JOIN dup USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // same postings CTE as dedup_substring; min-doc keeper per hash,
    // interval union of removed [pos, pos+7] windows via the lag-based
    // island split (explicit ROWS frame — RANGE would differ on ties,
    // though positions are distinct per doc after the DISTINCT)
    "pipeline_span_dedup" ->
      s"""WITH $spanPostingsSql,
         |k AS (SELECT h, min(doc_id) AS keeper FROM p
         |      GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
         |r AS (SELECT DISTINCT p.doc_id, p.pos
         |      FROM p JOIN k USING (h) WHERE p.doc_id <> k.keeper),
         |i AS (SELECT doc_id, pos,
         |             CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |                             + ${SpanK - 1} THEN 1 ELSE 0 END AS brk
         |      FROM r),
         |i2 AS (SELECT doc_id, pos,
         |              sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |                             ROWS UNBOUNDED PRECEDING) AS island
         |       FROM i),
         |c AS (SELECT doc_id, island, max(pos) - min(pos) + $SpanK AS covered
         |      FROM i2 GROUP BY doc_id, island),
         |rm AS (SELECT doc_id, sum(covered) AS n_removed FROM c GROUP BY doc_id),
         |sz AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents)
         |SELECT rm.doc_id, CAST(sz.n_tokens AS BIGINT) AS n_tokens,
         |       CAST(rm.n_removed AS BIGINT) AS n_removed,
         |       round(rm.n_removed * 1.0 / sz.n_tokens, 6) AS pct_removed
         |FROM rm JOIN sz USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // mirrors spanPostings + the islands merge: 1-based positions, md5
    // over the space-joined 8-token slice (list_slice's inclusive end =
    // Spark slice's length-8 window), BIGINT casts to match Spark longs
    // same postings CTE; query hashes from the same five fixed docs
    "text_phrase_search" ->
      s"""WITH $spanPostingsSql,
         |q AS (
         |  SELECT doc_id AS query_id,
         |         md5(array_to_string(list_slice(toks, 1, $SpanK), ' ')) AS h
         |  FROM t WHERE doc_id IN (0, 7, 14, 21, 28) AND len(toks) >= $SpanK)
         |SELECT q.query_id, p.doc_id, p.pos
         |FROM p JOIN q USING (h)
         |ORDER BY q.query_id, p.doc_id, p.pos""".stripMargin,

    "dedup_substring" ->
      s"""WITH $spanPostingsSql,
         |dh AS (SELECT h, count(DISTINCT doc_id) AS n_docs
         |       FROM p GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
         |dp AS (SELECT p.doc_id, p.pos, dh.n_docs FROM p JOIN dh USING (h)),
         |g AS (SELECT doc_id, pos, n_docs,
         |             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |      FROM dp)
         |SELECT doc_id, min(pos) AS span_start,
         |       count(*) + ${SpanK - 1} AS span_len,
         |       max(n_docs) AS max_docs
         |FROM g GROUP BY doc_id, grp
         |ORDER BY doc_id, span_start""".stripMargin,

    // same LSH candidate CTEs as dedup_minhash; exact gram-Jaccard verify
    "dedup_ngram_blocked" ->
      s"""WITH $bandCandSql,
        |$gramsSql,
        |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        |inter AS (
        |  SELECT c.d1, c.d2, count(*) AS ninter
        |  FROM cand c JOIN grams x ON x.doc_id = c.d1 JOIN grams y ON y.doc_id = c.d2 AND y.g = x.g
        |  GROUP BY c.d1, c.d2)
        |SELECT d1, d2, round(ninter * 1.0 / (s1.n + s2.n - ninter), 6) AS jaccard
        |FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
        |WHERE round(ninter * 1.0 / (s1.n + s2.n - ninter), 6) >= 0.6
        |ORDER BY d1, d2""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY canonical_id""".stripMargin,

    "dedup_minhash" -> minhashOracle,

    // ground truth for connected components: recursive-CTE transitive
    // closure over the same verified pair set (fine at oracle scale —
    // the closure is quadratic per component, and components are tiny),
    // then label = min reachable node, size = members per label
    "dedup_cluster" ->
      s"""WITH RECURSIVE pairs AS (SELECT d1, d2 FROM ($minhashOracle)),
        |ud AS (SELECT d1 AS a, d2 AS b FROM pairs
        |       UNION SELECT d2 AS a, d1 AS b FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM ud
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN ud u ON r.b = u.a),
        |lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        |        FROM reach GROUP BY a)
        |SELECT doc_id, cluster_id,
        |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM lab
        |ORDER BY doc_id""".stripMargin,

    // same recursive-CTE component labels as dedup_cluster, left-joined
    // onto the corpus (singletons keep their own id), then the shared
    // md5 bucket rule on the CLUSTER id
    "data_split_leakage_safe" ->
      s"""WITH RECURSIVE pairs AS (SELECT d1, d2 FROM ($minhashOracle)),
        |ud AS (SELECT d1 AS a, d2 AS b FROM pairs
        |       UNION SELECT d2 AS a, d1 AS b FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM ud
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN ud u ON r.b = u.a),
        |lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        |        FROM reach GROUP BY a),
        |cl AS (SELECT d.doc_id, coalesce(lab.cluster_id, d.doc_id) AS cluster_id
        |       FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id),
        |sp AS (SELECT doc_id, cluster_id,
        |              ('0x' || substr(md5('split|' || CAST(cluster_id AS VARCHAR)), 1, 6))::BIGINT % 10 AS b
        |       FROM cl)
        |SELECT doc_id, cluster_id,
        |       CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
        |FROM sp
        |ORDER BY doc_id""".stripMargin,

    // same LSH candidate CTEs as dedup_minhash; levenshtein verify.
    // No length prefilter here: it is implied by similarity >= 0.8.
    "dedup_lev_blocked" ->
      s"""WITH $bandCandSql
        |SELECT d1, d2,
        |       levenshtein(a.text, b.text) AS edit_dist,
        |       round(1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
        |                   / greatest(length(a.text), length(b.text)), 6) AS similarity
        |FROM cand JOIN documents a ON a.doc_id = d1 JOIN documents b ON b.doc_id = d2
        |WHERE greatest(length(a.text), length(b.text)) <= $LevMaxLenDefault
        |  AND 1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
        |            / greatest(length(a.text), length(b.text)) >= 0.8
        |ORDER BY d1, d2""".stripMargin,

    "pipeline_curate" ->
      s"""WITH losers AS (SELECT DISTINCT d2 FROM ($minhashOracle) mh),
        |q AS (
        |  SELECT doc_id, lang, n_chars,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 10 AS b
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 20
        |    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |        / len(string_split(text, ' ')) > 0.05)
        |SELECT doc_id, lang,
        |       CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
        |       n_chars
        |FROM q
        |WHERE doc_id NOT IN (SELECT d2 FROM losers)
        |ORDER BY doc_id""".stripMargin,

    "dedup_simhash" -> {
      val simhashCte = TextAnalysis.oracles("text_simhash")
        .replaceAll("(?s)ORDER BY doc_id$", "")
      s"""WITH sig AS ($simhashCte),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
        |         bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1)) +
        |         bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) AS hamming
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |       AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3))
        |SELECT d1, d2, hamming FROM pairs
        |WHERE hamming <= 3
        |ORDER BY d1, d2""".stripMargin
    },

    "dedup_levenshtein" ->
      s"""WITH cand AS (
        |  SELECT a.doc_id AS d1, a.text AS t1, b.doc_id AS d2, b.text AS t2
        |  FROM documents a
        |  JOIN documents b ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 3
        |  WHERE greatest(length(a.text), length(b.text)) <= $LevMaxLenDefault)
        |SELECT d1, d2,
        |       levenshtein(t1, t2) AS edit_dist,
        |       round(1.0 - CAST(levenshtein(t1, t2) AS DOUBLE)
        |                   / greatest(length(t1), length(t2)), 6) AS similarity
        |FROM cand
        |WHERE 1.0 - CAST(levenshtein(t1, t2) AS DOUBLE)
        |            / greatest(length(t1), length(t2)) >= 0.8
        |ORDER BY d1, d2""".stripMargin,

    "dedup_ngram" ->
      s"""WITH $gramsSql,
        |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        |cand AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2
        |  FROM documents a JOIN documents b
        |    ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 5),
        |inter AS (
        |  SELECT c.d1, c.d2, count(*) AS ninter
        |  FROM cand c JOIN grams x ON x.doc_id = c.d1 JOIN grams y ON y.doc_id = c.d2 AND y.g = x.g
        |  GROUP BY c.d1, c.d2)
        |SELECT c.d1, c.d2,
        |       round(coalesce(i.ninter, 0) * 1.0 / (s1.n + s2.n - coalesce(i.ninter, 0)), 6) AS jaccard
        |FROM cand c
        |LEFT JOIN inter i ON i.d1 = c.d1 AND i.d2 = c.d2
        |JOIN sizes s1 ON s1.doc_id = c.d1
        |JOIN sizes s2 ON s2.doc_id = c.d2
        |ORDER BY c.d1, c.d2""".stripMargin,

    "pipeline_decontaminate" ->
      s"""WITH $shingleSql,
        |ov AS (
        |  SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
        |         count(*) AS n_shared
        |  FROM sh tr JOIN sh ev ON tr.s = ev.s
        |  WHERE ev.doc_id % 37 = 0 AND tr.doc_id % 37 <> 0
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |rk AS (
        |  SELECT train_id, eval_id, n_shared,
        |         row_number() OVER (PARTITION BY train_id
        |                            ORDER BY n_shared DESC, eval_id) AS rk
        |  FROM ov)
        |SELECT train_id, eval_id, n_shared FROM rk WHERE rk = 1
        |ORDER BY train_id""".stripMargin,

    // same band-signature CTEs; asymmetric delta-vs-base candidates
    // (the unused symmetric `cand` CTE rides along harmlessly)
    "dedup_incremental" -> incrementalOracle,

    // the streaming gate's candidate set equals the batch bucket join
    // deterministically (see the query), so the SAME oracle gates it
    "streaming_dedup_near" -> incrementalOracle
  )

  /** Shared by dedup_incremental and its streaming twin
    * streaming_dedup_near — one copy, so the two gates cannot drift. */
  private lazy val incrementalOracle: String =
      s"""WITH $bandCandSql,
        |cand2 AS (
        |  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS base_id
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT c.new_id, c.base_id, count(*) AS ninter
        |  FROM cand2 c
        |  JOIN sh x ON x.doc_id = c.new_id
        |  JOIN sh y ON y.doc_id = c.base_id AND y.s = x.s
        |  GROUP BY c.new_id, c.base_id),
        |v AS (
        |  SELECT new_id, base_id,
        |         round(ninter * 1.0 / (s1.n + s2.n - ninter), 6) AS jaccard
        |  FROM inter
        |  JOIN sizes s1 ON s1.doc_id = new_id
        |  JOIN sizes s2 ON s2.doc_id = base_id
        |  WHERE round(ninter * 1.0 / (s1.n + s2.n - ninter), 6) >= 0.6),
        |w AS (
        |  SELECT new_id, base_id, jaccard,
        |         row_number() OVER (PARTITION BY new_id
        |                            ORDER BY jaccard DESC, base_id) AS rk,
        |         count(*) OVER (PARTITION BY new_id) AS n_matches
        |  FROM v)
        |SELECT new_id, base_id AS dup_of, jaccard,
        |       CAST(n_matches AS BIGINT) AS n_matches
        |FROM w WHERE rk = 1
        |ORDER BY new_id""".stripMargin
}
