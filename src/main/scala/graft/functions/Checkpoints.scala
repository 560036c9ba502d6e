package graft.functions

import org.apache.spark.sql.DataFrame

/** Eager release of `localCheckpoint` block storage for ITERATE loops.
  *
  * Every equi-join fixpoint loop here (GraphOps connected components,
  * RankingOps' distributed PageRank) checkpoints its state per round to
  * truncate lineage. The superseded round's blocks are dead the moment
  * the next round has materialized (eager localCheckpoint), but absent
  * an explicit unpersist they sit in executor storage until the
  * DataFrame is GC'd and the ContextCleaner notices — across a
  * long-lived session running many loops that is an unbounded storage
  * accrual. Loops call [[release]] on each superseded snapshot; only
  * the FINAL state (still referenced by the returned plan) is left to
  * the ContextCleaner.
  */
object Checkpoints {

  /** Unpersist the RDD behind a `localCheckpoint`'d DataFrame. Safe only
    * when no live plan still reads the snapshot (a re-execution would
    * recompute from a missing block and fail). No-op for plans that are
    * not RDD-backed.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
