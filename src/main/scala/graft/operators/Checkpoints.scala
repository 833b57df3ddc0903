package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic block release for superseded `localCheckpoint`s.
  *
  * `df.queryExecution.toRdd` on a checkpointed Dataset is a
  * deserializing WRAPPER with its own RDD id — calling `unpersist` on
  * it is a silent no-op, and the actual blocks then live until
  * ContextCleaner happens to GC the reference (measured in
  * spark-shell: the persisted id is the one inside the plan's
  * [[LogicalRDD]] leaf, and only unpersisting THAT empties
  * `getPersistentRDDs`). Iterative operators (BPE training, CC label
  * propagation, PageRank) checkpoint every round, so GC-timed cleanup
  * accumulates a frame copy per iteration under load.
  */
object Checkpoints {

  /** Unpersist the RDD a `localCheckpoint()` result is holding.
    *
    * Matches ONLY a checkpoint ROOT (the analyzed plan IS the
    * LogicalRDD leaf): a frame merely DERIVED from a checkpoint also
    * contains some LogicalRDD leaf — of an upstream frame that may
    * still be live — and a `collectFirst` over the whole tree would
    * unpersist that upstream's blocks out from under later readers.
    * Anything that is not a checkpoint root is left untouched.
    *
    * Callers must drop only frames that are already superseded — i.e.
    * after the replacement checkpoint has eagerly materialized.
    */
  def dropBlocks(df: DataFrame): Unit =
    try df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => ()
    } catch {
      // best-effort cleanup must not turn into silent loss of control
      // signals: re-assert the interrupt for an interrupted job, let
      // fatal errors (OOM, linkage) propagate, swallow the rest
      case _: InterruptedException => Thread.currentThread().interrupt()
      case scala.util.control.NonFatal(_) => ()
    }
}
