package graft

import org.apache.spark.sql.Dataset

/** Lineage cuts for iterative plans (PageRank, connected components,
  * BPE, distributed ntile).
  *
  * `localCheckpoint()` severs lineage and keeps the blocks ONLY on
  * executors — the fastest cut (no DFS write), but unrecoverable: on
  * a real cluster with dynamic allocation, losing one executor
  * mid-loop kills the job (no lineage left to replay, no reliable
  * replica). The reference's own fault-tolerance story is reliable
  * per-iteration model dirs (BaumWelchDriver.java:118-137); the
  * dataframe-loop equivalent is a reliable `checkpoint()` into
  * `spark.checkpoint.dir`.
  *
  * [[cut]] picks per-deployment: when a checkpoint dir is configured
  * (`sc.setCheckpointDir` / `spark.checkpoint.dir`, as any 100 TB
  * job conf would set) it takes the reliable, replayable path;
  * otherwise it falls back to eager `localCheckpoint()` — the right
  * latency call for local[32] where executor loss means JVM death
  * anyway. Both are eager, both free superseded blocks via the
  * ContextCleaner, and both yield a LogicalRDD so loop-step analysis
  * cost stays O(1) in the step number.
  */
object Lineage {
  def cut[T](ds: Dataset[T]): Dataset[T] =
    if (ds.sparkSession.sparkContext.getCheckpointDir.isDefined)
      ds.checkpoint(eager = true)
    else ds.localCheckpoint()
}
