package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev/judge artifact: dump `explain("formatted")` output for headline
  * queries into docs/PLANS.md, with the scale property each plan is
  * expected to exhibit. Regenerate with:
  * `tools/run.sh graft.ExplainDump /root/testdata/sf0.01 docs/PLANS.md`
  */
object ExplainDump {

  private val headline: Seq[(String, String)] = Seq(
    "wordcount" -> ("scan→generate→partial HashAggregate→shuffle→final " +
      "HashAggregate inside WholeStageCodegen; ReadSchema prunes to text only"),
    "filter_project" -> "PushedFilters into the parquet scan; ReadSchema pruned to 5 columns",
    "q5_region_revenue" -> ("BroadcastHashJoin for region/nation/supplier dims; shuffle joins only " +
      "between facts — and the pruning dims join lineitem BEFORE the orders sort-merge " +
      "(syntactic join order IS the plan without CBO; PlanSpec-pinned)"),
    "sq_min_cost_supplier" -> ("correlated-MIN decorrelation done by hand: the min-per-part " +
      "aggregate (dim-sized, map-side partials) broadcasts onto the fact — Catalyst's own " +
      "decorrelation would shuffle the whole fact into a sort-merge join"),
    "topk_global" -> "TakeOrderedAndProject — per-partition heaps, no global sort",
    "topk_per_group" -> "ObjectHashAggregate with partial_topk — exchange carries O(groups×k)",
    "dedup_minhash" -> ("LSH band self-join on (band, sig) over the STAGED signature parquet; " +
      "zero raw documents scans in the query plan (shingles materialized once by graft.Staging)"),
    "dedup_simhash" -> "ONE self-join on unpivoted (chunk_idx, chunk_val) over staged signatures; hamming verify on |pairs| rows",
    "join_outer_agg" -> "aggregate-before-outer-join: customer pre-agg is the BroadcastHashJoin build side",
    "ann_brute" -> ("BroadcastExchange of the query vectors; phase-1 top-k is a partial " +
      "ObjectHashAggregate (per-partition bounded heaps, exchange carries O(partitions×K)) — " +
      "no corpus-wide window sort; decimal rescore touches only the O(NQ×K) survivors"),
    "dedup_embedding" -> ("ONE codegen self-join pass on (label, band, bucket) over staged " +
      "hyperplane buckets; DecimalDotProduct keeps the exact rescore inside WholeStageCodegen " +
      "— no skinny-pair distinct, no corpus join-backs"),
    "asof_purchase_click" -> "single hashpartitioning exchange (the window) — no range-join explosion",
    "events_session" -> "session_window aggregation — keyed state, no cross-row join",
    "dedup_ngram_blocked" -> ("LSH candidate pairs (staged band sigs) joined to narrow doc bodies; " +
      "gram intersection folded per pair by the codegen GramSet expressions — candidate-sized work only"),
    "join_salted_skew" -> ("SortMergeJoin on (user_id, __salt) — auto-broadcast disabled in the " +
      "query's cloned session so the salted exchange actually executes: fact scattered by hash, " +
      "dim replicated by explode, per-key work fans out 8 ways"),
    "ann_ivf" -> ("centroids read from the STAGED quantizer parquet (trained once per run, " +
      "exported for the compositional DuckDB oracle); margin-gated assignment — decimal " +
      "cosine evaluated only where the float boundary gap is inside RescoreEps — and the " +
      "probe join carries only probed-bucket members"),
    "mm_frame_sample" -> ("ONE narrow pass: scan→decode mapPartitions (payload carried in the " +
      "stage output row)→posexplode→project; no join, and the only exchange (final ORDER BY) " +
      "carries offsets + digests, never payload bytes"),
    "sql_tpch_q21" -> ("EXISTS and NOT EXISTS correlated on the same fact: lineitem self-semi and " +
      "self-anti joins on l_orderkey with the suppkey inequality as residual; nation broadcast"),
    "sql_tpch_q8" -> ("7-table chain with two nation roles, pruning dims (part/supplier) joined " +
      "to lineitem BEFORE the orders sort-merge (12.2 → 1.6 s at 60M rows; PlanSpec-pinned); " +
      "share-of-total as two SUMs in ONE aggregate (no self-join, no second scan)"),
    "text_tfidf" -> ("ONE tokenize+aggregate subtree (len/df as window aggregates over tf — the " +
      "GROUP-BY-CTE formulation re-executed it 3× since Catalyst inlines CTEs); corpus N as a " +
      "broadcast scalar subquery; top-5 rank reuses the doc_id exchange via WindowGroupLimit"),
    "sql_tpch_q15" -> ("ONE lineitem scan: the quarterly max rides an unpartitioned window over " +
      "the ALREADY AGGREGATED dim-sized revenue set (the spec's scalar-subquery formulation " +
      "re-scans the fact — Catalyst inlines the revenue CTE into both consumers); supplier " +
      "joins as the broadcast side (PlanSpec-pinned single scan)"),
    "events_funnel" -> ("ordered-step funnel as three chained conditional-min windows over ONE " +
      "user_id exchange (t2 reads t1's output so they can't fuse, but nothing re-partitions " +
      "between passes); WindowExec buffers SPILL where the earlier grouped collect_list " +
      "buffered unspillable heap — the join-chain formulation was 6 scans / 5 exchanges " +
      "(PlanSpec-pinned: 1 scan, 3 windows, ≤2 exchanges, no collect_list)"),
    "sql_tpch_q2" -> ("partsupp DERIVED from part × supplier-count (no stored table, rebuilt " +
      "bit-identically by the oracle); the correlated min is a per-partkey window over ONE " +
      "pass of the eligible set — region scanned once (PlanSpec-pinned), every non-partsupp " +
      "relation a broadcast dim"),
    "sql_tpch_q9" -> ("six-table profit rollup: part-keyed dims (filtered part, derived " +
      "partsupp) prune lineitem BEFORE the merge-pinned orders join; profit expression exact " +
      "in DECIMAL end-to-end, one cast to DOUBLE after the SUM"),
    "delta_upsert" -> ("MERGE with insert/update/delete/keep through operators.Merge: full-outer " +
      "sort-merge on the key (broadcast cannot produce the unmatched build side), multi-match " +
      "guard as a delta-sized count window CO-PARTITIONED with the join feeding raise_error, " +
      "delete filter after the join (a 'D' row must meet its snapshot row)"),
    "sql_tpch_q12" -> ("derived l_shipmode filter (2/7 of lineitem) evaluates BELOW the " +
      "merge-pinned fact-fact join; conditional priority counts are one partial+final " +
      "aggregate — no second fact scan"),
    "join_range" -> ("RangeJoin bucketize-to-equi-join: exploded interval dim broadcasts, " +
      "probe computes ONE bucket in a narrow projection, BroadcastHashJoin on the bucket " +
      "with the exact band residual as a post-join filter — no BroadcastNestedLoopJoin, " +
      "no CartesianProduct (PlanSpec-pinned)"),
    "delta_diff" -> ("snapshot diff through operators.Diff: ONE full-outer sort-merge on " +
      "the key (broadcast cannot produce the unmatched build side), null-safe column-wise " +
      "change detection in the post-join projection, unchanged rows dropped there — " +
      "output is change-set-sized"),
    "dedup_incremental" -> ("delta-vs-base: BOTH sides are filter-pushdown slices of the ONE " +
      "staged band-signature parquet (no documents rescan); (band, sig) bucket join emits " +
      "output-sized candidates; shingle-Jaccard verify joins candidate doc_ids only; arg-max " +
      "verdict windows run over the verified set, never the corpus"),
    "text_unigram_logprob" -> ("THREE narrow tokenization passes (the frequency subtree " +
      "evaluates under both the cap derivation and the kept-vocab projection, plus scoring — " +
      "re-tokenizing beats materializing a corpus-scale token table); the vocabulary " +
      "broadcast is BOUNDED at the top 2^20 types (frequency-of-frequencies histogram cut, " +
      "count-1 OOV floor), so exploded token rows never cross an exchange and the broadcast " +
      "cannot grow with Heaps-law type counts — the per-doc score partial-aggregates map-side"),
    "pipeline_length_filter" -> ("value-HISTOGRAM quantiles: groupBy(lang, n_chars) partial+final " +
      "agg (exchange carries one row per distinct length), cumulative windows over the " +
      "dim-sized histogram, bounds broadcast back onto the corpus — no corpus-wide sort, " +
      "no percentile buffers"),
    "events_anomaly" -> ("the classic two-pass z-score: moments pass (count/Σv/Σv² in exact " +
      "DECIMAL, map-side combined, dim-sized output) broadcast back onto a second narrow fact " +
      "scan for the 3σ flag — the fact shuffles only into the partial aggregates, never on a key"),
    "mm_dedup_near" -> ("perceptual near-dup over STAGED mean-centered bag-of-visual-words " +
      "buckets (the raw self-join re-expanded the descriptor pipeline per side); the " +
      "(band, bucket) self-join's float prefilter runs IN the join stage, the multi-band " +
      "dedup is groupBy+first — NOT distinct, whose grouping-key filter pushdown put the " +
      "decimal rescore into the join condition for every enumerated pair — and the decimal " +
      "cosine touches only the survivor set; no text/token strings in any exchange " +
      "(PlanSpec-pinned)"),
    "hybrid_search" -> ("RRF fusion: the vector arm is ann_brute's partial ObjectHashAggregate " +
      "top-k; the lexical arm broadcasts the dim-sized query token set, partial-aggregates " +
      "(query, doc) overlap counts map-side, and reduces through the bounded TopK aggregator; " +
      "the fusion full-outer and rank windows run on 2·NQ·K rows — no corpus-wide per-query " +
      "window anywhere (PlanSpec-pinned)"),
    "dedup_substring" -> ("inverted shingle index over STAGED (doc, pos, hash) postings — " +
      "linear in corpus tokens; count(distinct doc) per hash partial-aggregates map-side, " +
      "duplicated hashes shuffle-join back onto the postings (hash = the blocking key, no " +
      "all-pairs), and the islands merge is a per-DOCUMENT window (partition bounded by doc " +
      "length at any corpus size)"),
    "hybrid_search_bm25" -> ("BM25 lexical arm over the STAGED (doc, term, tf, dl) index " +
      "(dl is a COLUMN of the index since round 12 — no query-time corpus window at all): " +
      "df is a vocab-sized aggregate joined onto the tiny query-term set which then " +
      "BROADCASTS; integer fixed-point term scores partial-aggregate map-side; ZERO windows " +
      "below the bounded top-k aggregates; both arms hierarchical (PlanSpec-pinned)"),
    "agg_quantile_merge" -> ("two-level mergeable sketch rollup: per-lang compactor-stack " +
      "quantile sketches (typed Aggregator, ObjectHashAggregate partial merge — the exchange " +
      "carries k·log(n/k)-bounded sketch state, never values), then an ALL rollup that " +
      "aggregates SKETCH STATE only — the staged-sketch shape percentile_approx can't express"),
    "dedup_substring_incremental" -> ("both sides filter-pushdown slices of the ONE staged " +
      "span_postings scan; base side reduces to a (hash → distinct base docs) index with " +
      "partial_ map-side aggregation; delta postings join it on the hash (AQE broadcasts the " +
      "fixture-sized index; a corpus-sized index shuffle-joins on the same key); the islands " +
      "merge is one per-delta-doc window"),
    "events_resample" -> ("grid = sequence() explode over per-user (min, max) hour bounds — " +
      "users × horizon hours, never event volume; the grid-bounds and hourly aggregates each " +
      "shuffle once, AQE broadcasts the (dim-sized) hourly side onto the already-partitioned " +
      "grid, and the ffill window REUSES the grid's user_id partitioning — no window exchange"),
    "events_incident_overlap" -> ("no interval-inequality theta-join: sessions decompose into " +
      "covered hours (sequence explode), the hour equi-joins the BROADCAST dim-sized incident " +
      "set, exact µs overlap sums per session; incidents derived by integer cross-multiplication " +
      "over the dim-sized hourly aggregate"),
    "text_normalize" -> ("one narrow codegen projection: NfcNormalize (isNormalized fast path) " +
      "→ one [\\x00-\\x20]+ collapse regex → trim → lower → md5; no shuffle but the " +
      "presentation sort; ReadSchema prunes to (doc_id, text)"),
    "agg_unpivot" -> ("melt = Expand over the 3-row measure aggregate — rows × #measures, " +
      "no shuffle beyond the feeding aggregate"),
    "ann_ivf" -> ("corpus→bucket assignment is a per-row argmax against the collected " +
      "(model-sized) quantizer — a narrow projection, NO exchange; the only vec_id exchange " +
      "left is the query-set probe ranking; probed-bucket rescore joins members to the " +
      "broadcast probe set and two-phase decimal-rescores the tie-aware top-K prefix " +
      "(PlanSpec-pinned)"),
    "text_freq_merge" -> ("two-level Misra–Gries rollup: per-lang ObjectHashAggregate with " +
      "partial merge (exchanges carry ≤m-counter summaries, never token streams), then an " +
      "ALL union over SUMMARY STATE only — the mergeable frequent-items shape"),
    "pipeline_overlap_est" -> ("two bounded KMV k-min aggregations over the STAGED shingle " +
      "table (map-side partial merge, exchanges carry ≤k longs per task), fused by a 1×1 " +
      "cross join; estimator arithmetic runs on two 256-element arrays — nothing " +
      "shingle-set-sized ever joins"),
    "pipeline_ppl_sample" -> ("unigram scoring passes (narrow, codegen) → per-doc exact " +
      "integer micro-score → 0.001-nat bin histogram (bounded cardinality, single small " +
      "window over BINS, never docs) → broadcast tercile edges back onto the scored frame; " +
      "the keep decision is a pure md5 projection — no corpus sort, no percentile buffer"),
    "dedup_bloom_prefilter" -> ("bloom built over RAW base postings (insertion is idempotent " +
      "— no distinct exchange; the only build shuffle is one partial bit-array per " +
      "partition); the membership probe folds into the one-row-broadcast BNLJ condition, " +
      "filtering the delta posting SCAN in-stage before any exchange; only maybe-members " +
      "pay the distinct + exact verify join (PlanSpec-pinned)"),
    "text_classify_nb" -> ("train = one vocab-sized hash aggregate over the token stream " +
      "(map-side partials); score = the weight table BROADCAST onto the same stream with " +
      "per-doc partial sums — the corpus never shuffles wider than doc_id; all arithmetic " +
      "integer micro-units after one vocab-level rounding (PlanSpec pins the broadcast)"),
    "data_split_leakage_safe" -> ("CC labels (node-set-sized, staged rounds shared with " +
      "dedup_cluster) left-join the corpus on doc_id — AQE broadcasts the fixture-sized " +
      "label table, a corpus-scale one shuffle-joins on the same key; the split decision " +
      "is a narrow md5 projection on the cluster id"),
    "emb_kmeans" -> ("assignment = per-row margin-gated argmax over the collected " +
      "(model-sized) quantizer folded into the projection as literal arrays — no join, " +
      "no window, no shuffle below it (PlanSpec-pinned); only the dim-sized cluster-size " +
      "aggregate and the presentation sort exchange"),
    "text_html_extract" -> ("one narrow codegen projection: block-drop → tag-strip → " +
      "entity-decode → whitespace-collapse regex chain (RE2 ∩ Java, like text_pii_scrub); " +
      "no shuffle but the presentation sort"),
    "dedup_semantic" -> ("SemDeDup prune: candidates from the (cluster, band, bucket)-blocked " +
      "self-join over the staged kmeans_members assignment — clusters are never pairwised " +
      "whole, bitsPerBand grows with the corpus to hold buckets ~200 rows; two-phase codegen " +
      "scoring (float prefilter, decimal verify), drop set is survivor-sized; no window, no " +
      "cartesian (PlanSpec-pinned)"),
    "pipeline_chunk" -> ("one narrow codegen projection + per-doc explode: token-window " +
      "starts from exact integer arithmetic, chunk text md5'd via array_join(slice(split)) — " +
      "byte-exact byte-range reconstruction; no join, no window, no shuffle beyond the " +
      "presentation sort — a pure map-side pass at any corpus size"),
    "text_phrase_search" -> ("inverted-index phrase lookup: the dim-sized query-hash set " +
      "BROADCASTS onto the staged span-postings scan — one broadcast hash join, no corpus " +
      "shuffle (PlanSpec-pinned); an 8-token phrase IS one shingle hash, so search never " +
      "rescans text"),
    "pipeline_filter_cascade" -> ("four audit rules + in-row langid argmax as ONE narrow " +
      "projection over one documents scan — no join, no aggregate, only the presentation " +
      "sort (PlanSpec-pinned); all rules exact integer comparisons"),
    "ann_ivf_pq" -> ("product-quantized ANN via the join-based ADC (round 13 — the old " +
      "NQ-literal folding and its driver-side table are gone): the STAGED coded corpus is " +
      "scanned once and broadcast-nested-loop joined to the NQ-sized in-engine ADC lookup " +
      "arrays (flat-PQ semantics — no buckets, every query scans all codes), reduced by the " +
      "bounded exact-integer topKLong aggregator; every score a decimal-exact ×10^12 " +
      "fixed-point BIGINT; plan size O(M·Ksub) regardless of the query batch"),
    "ann_filtered" -> ("metadata-filtered ANN with the selectivity policy: bucket membership " +
      "attaches from the PERSISTED kmeans_members table (broadcast skinny pairs; " +
      "co-partitioned at production scale) — round 13 removed the twice-per-run in-plan " +
      "argmax; the pre arm's predicate is a broadcast LeftSemi UNDER the probe join, the " +
      "post arm over-fetches the exact top-k' then filters survivors; the corpus never " +
      "hash-partitions on vec_id; windows only over bucket-bounded candidates"),
    "text_segment" -> ("sentence-boundary-snapped chunking: page synthesis, terminator " +
      "split, and the per-doc token prefix-sum fold all inside ONE narrow projection (no " +
      "window — the fold is bounded by the doc's sentence count); the only exchange is the " +
      "(doc_id, chunk_id) re-group that materializes chunks, segmentation's floor " +
      "(PlanSpec-pinned ≤ 2 exchanges incl. the presentation sort)"),
    "ann_index_lifecycle" -> ("gate 16's batch-side verdict: per-vector quantized-residual " +
      "energy is a literal-array lookup over the coded index (model-sized nfp table — no " +
      "join below either stats aggregation); train and live stats are two skinny hash " +
      "aggregations to nlist rows joined BROADCAST; retrain rules exact decimal " +
      "cross-products (no division, no floats); the tombstone MERGE-deletes run in the " +
      "streaming gate, not this plan (PlanSpec-pinned broadcast-only)"),
    "ann_ivfpq_residual" -> ("IVFADC residual fusion: the STAGED residual-coded corpus is " +
      "scanned once and joined to the BROADCAST per-(query, bucket) ADC lookup arrays on " +
      "c_id (join-based ADC — plan size independent of the query-batch size), then reduced " +
      "by the bounded topKLong aggregator; probing restricts the scan to nprobe buckets of " +
      "4-byte codes — no per-query window over the coded corpus (PlanSpec-pinned)"),
    "ann_filtered_pq" -> ("filtered IVFADC (the production filtered-search serving shape): " +
      "the pre arm's predicate filters the coded-INDEX scan below the broadcast ADC join " +
      "(LeftSemi for the dimension predicate, a plain scan filter for index-resident " +
      "metadata), the post arm filters the exact fixed-point top-k' survivors; every join " +
      "broadcast — the coded corpus never shuffles (PlanSpec-pinned)"),
    "mm_crossmodal" -> ("text query → media corpus over one shared feature space: the media " +
      "arm is scan → decode → featurize in ONE narrow pass (payload pruned before any " +
      "exchange — PlanSpec-pinned), query features broadcast, per-query top-k through the " +
      "bounded TopK aggregator (exchange carries O(tasks × NQ) buffers, never media rows)"),
    "streaming_dedup_near" -> ("near-dup on ingest, the batch verify tail of gate 14: the " +
      "candidate pairs come from (band, sig)-keyed STREAMING STATE (base batch populates, " +
      "delta batch probes — the plan here shows the candidate-sized exact shingle-Jaccard " +
      "verify + per-new-doc argmax, every join keyed by shingle/doc, no corpus self-join)"),
    "agg_theta_sketch" -> ("KMV/theta set-operation sketches: two global typed bottom-k " +
      "aggregates over the year-filtered fact (partial k-min merge map-side — the exchange " +
      "carries ≤ k longs per task), combined by a 1×1 broadcast cross of the two sketch " +
      "ROWS; all estimator arithmetic rides that single-row projection"),
    "emb_covariance" -> ("serving scans the STAGED dim²-bounded artifact only (PlanSpec-pinned " +
      "no join/window/corpus scan); the one-time stage is two chained generators folded " +
      "map-side by partial hash aggregation into ≤ dim² groups — the corpus is never " +
      "self-joined and the exchange carries O(dim² × partitions) rows at any corpus size"),
    "emb_pca" -> ("projection is ONE narrow codegen pass: 8 DecimalDotProduct terms against " +
      "LITERAL component vectors (the collected-model fold, trained driver-side from the " +
      "staged covariance) — no join, no window, one presentation sort (PlanSpec-pinned)"),
    "emb_ood_score" -> ("emb_pca's literal-fold projection + two more decimal dots (x·μ and " +
      "the ingest-contract n2) combined in-row into the Mahalanobis energy and the " +
      "off-manifold residual — still join-free; the χ² flag is a scan-side comparison"),
    "ann_refine" -> ("two-stage serving: the IVFADC chain proposes the exact fixed-point " +
      "top-k' (shared stage-1, residualAdcTopK), then the ≤ NQ·k' shortlist BROADCASTS into " +
      "a column-pruned float-corpus fetch and a query-keyed rerank window re-orders by exact " +
      "decimal cosine — the corpus never shuffles and is never scored in full (PlanSpec-pinned)"),
    "events_scd2" -> ("SCD type-2 versioning: lag-flag → running-sum version → interval close " +
      "by lead, all over ONE user_id hash partitioning (two windows + the run aggregation " +
      "share the exchange); no joins — history materialization is window-shaped"),
    "graph_pagerank" -> ("checkpointed fixpoint (operators/Iterate): the dumped plan is the " +
      "POINT of the round-14 rework — a bare checkpoint scan + presentation sort, because " +
      "every iteration ran eagerly as ONE src-keyed join (ranks-edges-degree co-partitioned " +
      "over the STAGED edges) into one dst-keyed partial-aggregated sum and truncated its " +
      "lineage; plan size is flat in the iteration count (the step plan itself is " +
      "PlanSpec-pinned: no cartesian, no window, no raw-fact rescan)"),
    "graph_triangles" -> ("degree-oriented edge iterator: per-node adjacency lists attach " +
      "to each oriented edge (broadcast at this scale) and a codegen array_intersect finds " +
      "the third corners — no wedge set ever materializes; the per-node count is the only " +
      "corpus-sized exchange"),
    "graph_label_prop" -> ("checkpointed fixpoint, second consumer: the dumped plan is a " +
      "bare checkpoint scan + presentation sort — each of the 4 majority-vote iterations " +
      "ran eagerly as one src-keyed join into a (node,label) count and a node-keyed " +
      "struct-max argmax, then truncated its lineage"),
    "text_bpe_tokens" -> ("merges-table BPE as ONE codegen projection: the trained merges " +
      "ride the BpeSubwordCount expression to every task — no join, no shuffle below the " +
      "presentation sort; ReadSchema prunes to (doc_id, text)"),
    "pipeline_bpe_budget" -> ("bin-granular subword-budget fill: the only window cum-sums " +
      "the tokens-per-100-chars HISTOGRAM (bounded cardinality), the budget scalar and the " +
      "fill line attach by broadcast — no corpus-wide sort, no shuffling join"),
    "graph_sssp" -> ("convergence-gated checkpointed iteration (operators/Iterate.converge, " +
      "round 15): the dumped plan is a bare checkpoint scan + presentation sort — each BFS " +
      "relaxation ran eagerly as one src-keyed join over the STAGED edges into a dst-keyed " +
      "partial-aggregated MIN, and the loop stopped at the first round that relaxed nothing " +
      "(the 8-hop cap is the oracle's unroll bound; step plan PlanSpec-pinned)"),
    "ann_recall_eval" -> ("serving-quality eval: ground truth and every nprobe arm are " +
      "query-set-bounded (NQ*K rows), candidates bucket-bounded via the broadcast probe " +
      "set over the persisted assignment table; the output is |grid| rows — no corpus " +
      "window, no cartesian (PlanSpec-pinned)")
  )

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "docs/PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# Physical plans (generated by graft.ExplainDump)\n\n")
    sb.append(s"Scale factor dir: `$sfDir`. Each section lists the scale property\n")
    sb.append("the plan is expected to exhibit, then the Catalyst formatted plan.\n")
    for ((name, property) <- headline) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n**Expected:** $property\n\n```\n$plan```\n")
    }
    Option(Paths.get(out).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
