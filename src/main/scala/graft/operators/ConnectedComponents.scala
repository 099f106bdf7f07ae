package graft.operators

import graft.Staging
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list by iterative
  * min-label propagation — the clustering step every near-dup pipeline
  * needs between "emit verified pairs" and "keep one representative per
  * group".
  *
  * Algorithm: every node starts labelled with its own id; each round
  * replaces a node's label with the min over itself and its neighbors'
  * labels; at the fixpoint every node carries its component's min id.
  *
  * Scale shape (the reason this is written as rounds of joins rather
  * than anything driver-side):
  *  - One round = one shuffle join (edges ⋈ labels on node id) plus a
  *    partial/final MIN aggregate — both sized by the NODE set. For
  *    near-dup graphs the node set is output-scale (docs that appear in
  *    ≥1 pair), never the corpus.
  *  - Labels are MATERIALIZED every round (via [[graft.Staging]]), so
  *    the loop's lineage stays one round deep: a lost executor replays
  *    one round, not the whole chain, and the plan never grows.
  *  - The only driver-side value per round is the O(1) convergence
  *    boolean — the same exception class as the streaming flush
  *    sentinel's max(ts) scalar.
  *  - Each round is neighbor-min propagation PLUS one pointer-jumping
  *    step (label(v) ← label(label(v)) — a self-join of the label table
  *    on the label column). Jumping halves the remaining label-tree
  *    depth every round, so convergence is O(log n) rounds even on an
  *    adversarial path graph, where plain neighbor-min needs
  *    diameter-many rounds (a 60-node chain: 7 rounds vs 59 — pinned
  *    in OperatorsSpec). Correctness: a node's label is always the id
  *    of some node in its own component (initial labels are self-ids
  *    and both steps only adopt labels already held by component
  *    members), and labels only decrease, so the fixpoint is the
  *    component min either way.
  */
object ConnectedComponents {

  /** Label every node of the undirected graph `edges` (src, dst — one
    * row per edge, either orientation) with its component's min node
    * id. Returns (id, label).
    *
    * `stageKey` namespaces the per-round materializations in
    * [[graft.Staging]] (same build-once contract: one run per
    * (stageKey, input dir) per JVM — reruns replay from the staged
    * rounds). The semantic hash of the edge plan is folded into the
    * key (round-7 advice): a second call with the same stageKey/dir
    * but a DIFFERENT edge derivation gets fresh rounds instead of
    * silently replaying the first call's staged labels — while
    * repeated calls with the same plan (bench reps) still hit the
    * cache, and no extra Spark job runs to compute the fingerprint.
    * Same plan over MUTATED input files remains the caller's problem,
    * exactly as Staging's immutable-input contract documents.
    */
  def label(
      s: SparkSession,
      edges: DataFrame,
      stageKey: String,
      dir: String,
      maxRounds: Int = 50): DataFrame = {
    val fp = Integer.toHexString(edges.queryExecution.analyzed.semanticHash())
    val stageKeyFp = s"${stageKey}_$fp"
    val und = Staging.stage(s, s"${stageKeyFp}_edges", dir) {
      // mirrored per-row (round-17): the former
      // `edges.union(edges.select(swap))` re-expanded the caller's edge
      // DERIVATION twice — for the dedup consumers that is the whole
      // minhash pair pipeline run two times in this one staging build.
      // A single explode emits both orientations in one pass; same
      // multiset.
      edges.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
    }
    val l0 = Staging.stage(s, s"${stageKeyFp}_l0", dir) {
      und.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
    }
    // the shared convergence-gated round loop (operators/Iterate),
    // materializing each round through Staging instead of a local
    // checkpoint: CC's rounds are re-read across JVMs (bench reps
    // replay from parquet), which a checkpoint cannot provide. Stages
    // are never released — they ARE the replay artifact.
    val (labels, _, converged) = Iterate.loop(
      l0, maxRounds,
      materialize = (df, r) => Staging.stage(s, s"${stageKeyFp}_l$r", dir)(df),
      releasePrev = _ => ()) { (labels, _) =>
      val nbrMin = und.join(labels, und("src") === labels("id"))
        .groupBy(col("dst").as("id")).agg(min(col("label")).as("nbr_min"))
      // the round-input label rides along as lbl0 so the convergence
      // flag is computed WHERE the new label is computed (the ssspStep
      // `chg` recipe, round-17): labels only decrease, so "changed" ≡
      // "new ≠ round input", and the gate below becomes one narrow
      // filter over the already-staged round instead of a prev ⋈ next
      // join per round.
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("lbl0"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
      // pointer jump: label(v) ← label(label(v)). Every label is some
      // node's id, so the self-join matches (coalesce is defensive);
      // this halves the label-tree depth → O(log n) total rounds.
      val parents = stepped.select(col("id").as("pid"), col("label").as("plabel"))
      stepped.join(parents, stepped("label") === parents("pid"), "left")
        .select(stepped("id"),
          least(stepped("label"), coalesce(col("plabel"), stepped("label"))).as("label"),
          (least(stepped("label"), coalesce(col("plabel"), stepped("label")))
            =!= col("lbl0")).as("chg"))
    } { (_, next) =>
      !next.filter(col("chg")).isEmpty
    }
    require(converged,
      s"connected components did not converge within $maxRounds rounds " +
        "(component diameter exceeds the bound — raise maxRounds or switch " +
        "to star contraction)")
    // chg is loop plumbing — consumers get the (id, label) contract
    labels.select(col("id"), col("label"))
  }
}
