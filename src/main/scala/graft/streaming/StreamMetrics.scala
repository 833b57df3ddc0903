package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability — the event-time counterpart of
  * `ops.MetricsRecorder` (Q32's run-metrics capture): a
  * `StreamingQueryListener` that snapshots every micro-batch's
  * progress — rows read, processing time, state-store size, rows
  * dropped by the watermark — into an appendable stats table. This is
  * the table an operator actually watches at 100 TB/day: state growth
  * says whether watermarks bound memory, `rowsDroppedByWatermark`
  * says whether lateness allowances are wrong, batch duration vs
  * trigger interval says whether the stream keeps up.
  */
final case class BatchStat(
    ts: Timestamp,
    queryName: String,
    batchId: Long,
    numInputRows: Long,
    batchDurationMs: Long,
    stateRows: Long,
    stateBytes: Long,
    rowsDroppedByWatermark: Long
)

final class StreamMetricsRecorder(spark: SparkSession, path: String) {
  private val buf = ArrayBuffer.empty[BatchStat]

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      buf.synchronized {
        val p = e.progress
        val (sRows, sBytes, dropped) = Option(p.stateOperators)
          .map(_.foldLeft((0L, 0L, 0L)) { (acc, so) =>
            (acc._1 + so.numRowsTotal, acc._2 + so.memoryUsedBytes,
              acc._3 + so.numRowsDroppedByWatermark)
          }).getOrElse((0L, 0L, 0L))
        buf += BatchStat(
          new Timestamp(System.currentTimeMillis()),
          Option(p.name).getOrElse(p.id.toString),
          p.batchId,
          p.numInputRows,
          Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(-1L),
          sRows, sBytes, dropped)
      }
  }

  def start(): Unit = spark.streams.addListener(listener)
  def stop(): Unit = spark.streams.removeListener(listener)

  def snapshots: Seq[BatchStat] = buf.synchronized(buf.toSeq)

  /** Snapshot under the buffer lock, write OUTSIDE it: that lock
    * serializes onQueryProgress, which runs on the shared listener-bus
    * delivery thread — holding it across a parquet write job would
    * stall event delivery to every other listener. The buffer is only
    * trimmed AFTER the write succeeds (onQueryProgress strictly
    * appends, so the written rows are a stable prefix), so a failed
    * write keeps its batch stats for the next flush instead of
    * silently dropping them. `flushLock` serializes flushers against
    * each other — without it two concurrent flushes would write the
    * same prefix twice.
    */
  private val flushLock = new Object
  def flush(): Unit = flushLock.synchronized {
    val pending = buf.synchronized(buf.toSeq)
    if (pending.nonEmpty) {
      import spark.implicits._
      spark.createDataset(pending).write.mode(SaveMode.Append).parquet(path)
      buf.synchronized(buf.remove(0, pending.length))
    }
  }
}
