package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * The shared round-barrier for iterative DataFrame algorithms — ONE
 * durability contract for every loop in the library (extracted from
 * [[Graph.pageRank]] and the [[Dedup]] CC loop so the iterative
 * family can't drift apart again).
 *
 * Why a barrier at all: an iterative plan that references round
 * N−1's DataFrame grows its LOGICAL plan geometrically (each round
 * embeds the previous rounds' trees several times) — analysis and
 * explain blow up long before execution does. An EAGER checkpoint
 * per round severs lineage and keeps the plan O(1) per round.
 *
 * Why two modes: `localCheckpoint()` stores blocks on executors —
 * fast, but the blocks die with their executor and BY DESIGN cannot
 * be recomputed (lineage is severed), so on a real cluster one lost
 * executor kills an entire multi-round job. When the caller has set
 * a checkpoint dir (`sc.setCheckpointDir` — the 100 TB deployment
 * shape), every barrier becomes a RELIABLE `checkpoint()` instead:
 * round state lives in the fault-tolerant FS and survives executor
 * loss. local[32] (and the test suite) runs the localCheckpoint
 * fast path; cluster deployments opt into durability with one line.
 *
 * Reclamation: superseded local checkpoints are freed eagerly via
 * [[org.apache.spark.sql.GraftBridge.freeLocalCheckpoint]] (block-
 * level; a NO-OP for reliable checkpoints, whose files are reclaimed
 * by dropping the checkpoint dir or by
 * `spark.cleaner.referenceTracking.cleanCheckpoints=true`).
 */
private[graft] object Barrier {

  /** Eager lineage cut: reliable when a checkpoint dir is set,
    * local otherwise. Both modes materialize `df` immediately. */
  def barrier(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()

  /** Free a superseded barrier's blocks (root-only contract of
    * `freeLocalCheckpoint`; no-op on the reliable path). Call only
    * once every downstream consumer has materialized. */
  def free(df: DataFrame): Unit =
    org.apache.spark.sql.GraftBridge.freeLocalCheckpoint(df)

  /** Postfix form: `df.barriered` == `Barrier.barrier(df)`. */
  implicit final class BarrierOps(private val df: DataFrame)
      extends AnyVal {
    def barriered: DataFrame = barrier(df)
  }
}
