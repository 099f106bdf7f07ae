package graft.operators

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}

/** Checkpointed fixed-point iteration — the reusable discipline behind
  * every iterative relational algorithm (PageRank, large-diameter
  * connected components, label propagation, iterative closure).
  *
  * Why not plain `foldLeft` unrolling: each iteration's plan CONTAINS
  * every earlier iteration's subtree, so plan size, analysis time, and
  * codegen method size grow linearly (and task-serialization cost with
  * them) — fine at 5 iterations, pathological at 20+, and at 100 TB a
  * single failed task in iteration 18 would recompute the whole
  * 17-iteration lineage. The fix is the standard one (GraphX and every
  * production Pregel loop do exactly this): materialize each
  * iteration's state and TRUNCATE the lineage, so iteration N's plan
  * is one step over a checkpoint scan of iteration N−1.
  *
  * `localCheckpoint(eager = true)` is the right materialization here:
  * the iterated state is NODE-sized (ranks, component labels), orders
  * of magnitude smaller than the edge relation the step joins it
  * against, so it fits executor storage at any corpus scale; eager
  * evaluation bounds failure-recovery to one iteration. On a real
  * cluster with unreliable executors, reliable `checkpoint()` to
  * distributed storage is the drop-in upgrade (same call shape); the
  * single-JVM driver contract makes local the correct default. The
  * previous iteration's storage blocks are freed as soon as the next
  * state is materialized — the loop holds at most two node-sized RDDs
  * at any moment, regardless of iteration count.
  *
  * Determinism: checkpointing changes WHERE rows are recomputed from,
  * never their values — the exact-integer oracle contract of the
  * callers is untouched.
  *
  * Relation to [[ConnectedComponents]]: CC applies the SAME
  * lineage-truncation discipline but materializes each round through
  * [[graft.Staging]] (parquet) instead — it needs what fixpoint
  * deliberately doesn't provide: a data-dependent convergence gate
  * between rounds and cross-JVM memoized replay of the staged rounds
  * (bench reps re-read, never recompute). Use fixpoint for
  * FIXED-iteration algorithms where the state is transient; use the
  * staged-rounds form when rounds are convergence-gated or reread.
  */
object Iterate {

  /** Iterate `step` `iters` times from `init`, materializing every
    * iteration and truncating lineage.
    *
    * @param init  starting state (NOT checkpointed or unpersisted —
    *              the caller owns it; typically a cheap scan)
    * @param iters number of applications of `step` (0 returns `init`)
    * @param step  (state, iteration index 1..iters) → next state; must
    *              be a pure plan constructor (no actions)
    */
  def fixpoint(init: DataFrame, iters: Int)(
      step: (DataFrame, Int) => DataFrame): DataFrame = {
    require(iters >= 0, s"iteration count must be >= 0 (got $iters)")
    var state = init
    var i = 1
    while (i <= iters) {
      val next = step(state, i).localCheckpoint(eager = true)
      // `next` is materialized — the previous checkpoint's blocks are
      // dead weight now. Only frames THIS loop created are released;
      // the caller's `init` is never touched (i == 1 skips).
      if (i > 1) GraftColumnBridge.unpersistCheckpoint(state)
      state = next
      i += 1
    }
    state
  }
}
