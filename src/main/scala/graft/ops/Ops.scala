package graft.ops

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

import graft.model.LogEntry

/** K6: structured run logging to an append-only parquet table. The
  * reference opens one Postgres connection PER LOG LINE
  * (log_utils.py:103-123) — here entries buffer in memory and flush as
  * one columnar append per run (or when the buffer fills).
  */
final class RunLogger(
    spark: SparkSession,
    path: String,
    runUuid: String = java.util.UUID.randomUUID().toString,
    user: String = "graft",
    script: String = "graft",
    flushEvery: Int = 1000
) {
  private val buf = ArrayBuffer.empty[LogEntry]
  private val t0 = System.nanoTime()
  private var step = 0

  def log(level: String, message: String): Unit = synchronized {
    step += 1
    buf += LogEntry(
      runUuid = runUuid,
      ts = new Timestamp(System.currentTimeMillis()),
      level = level,
      step = s"Step_$step",
      message = message,
      user = user,
      script = script,
      elapsedSec = (System.nanoTime() - t0) / 1e9
    )
    if (buf.size >= flushEvery) flush()
  }

  def info(m: String): Unit = log("Info", m)
  def error(m: String): Unit = log("Error", m)

  def flush(): Unit = synchronized {
    if (buf.nonEmpty) {
      import spark.implicits._
      spark.createDataset(buf.toSeq).write.mode(SaveMode.Append).parquet(path)
      buf.clear()
    }
  }

  def read(): DataFrame = spark.read.parquet(path)
}

/** Q24: retention delete — age-based purge of date-stamped append-only
  * tables (log_cleanup.sql:10-74). Parquet has no row deletes; the
  * purge is a partition-granularity rewrite keeping only young rows —
  * on a date-partitioned table this degenerates to dropping whole
  * partition directories, no data rewrite.
  */
object Retention {
  def purgeOlderThan(
      spark: SparkSession,
      path: String,
      tsCol: String,
      keepDays: Int
  ): Long = {
    val df = spark.read.parquet(path)
    val kept = df.filter(col(tsCol) >= date_sub(current_date(), keepDays))
    val dropped = df.count() - kept.count()
    val tmp = path + ".retain"
    kept.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
    dropped
  }
}

/** Q33: maintenance — compaction (the VACUUM analog: rewrite a
  * many-small-files table into right-sized files) + statistics
  * (`ANALYZE TABLE` feeding the CBO, maintenance_procedures.sql:56-116).
  * The same sweep should call `DatasetRegistry.vacuum()` per registry:
  * snapshot pruning normally rides along with commits, but a registry
  * that stops being written still holds its superseded version dirs
  * until something sweeps them.
  */
object Maintenance {
  final case class CompactionReport(filesBefore: Long, filesAfter: Long, rows: Long)

  /** `partitionCols` preserves a `partitionBy` directory layout across
    * the rewrite (files compact WITHIN each partition dir);
    * `dropDuplicates` re-distincts content that appended batches may
    * have written twice (e.g. a fingerprint set composed by appends).
    */
  def compact(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      partitionCols: Seq[String] = Nil,
      dropDuplicates: Boolean = false
  ): CompactionReport = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileStats(p: String): (Long, Long) = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      var n = 0L; var bytes = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) { n += 1; bytes += f.getLen }
      }
      (n, bytes)
    }
    val (before, totalBytes) = fileStats(path)
    val df0 = spark.read.parquet(path)
    val df = if (dropDuplicates) df0.distinct() else df0
    val rows = df.count()
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = path + ".compact"
    val repartitioned =
      if (partitionCols.nonEmpty) df.repartition(parts, partitionCols.map(col): _*)
      else df.repartition(parts)
    val writer = repartitioned.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
    val (after, _) = fileStats(path)
    CompactionReport(before, after, rows)
  }

  /** Parquet file count under `path` — the compaction trigger metric. */
  def parquetFileCount(spark: SparkSession, path: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
    var n = 0L
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }

  /** Z-order clustered rewrite: sort by the Morton code of two
    * min/max-scaled columns before writing, so every output file
    * covers a tight range of BOTH — point/range predicates on either
    * column then skip most files via parquet min/max. Linear scaling
    * is distribution-sensitive; for heavy-tailed columns, upgrade the
    * key derivation to approxQuantile bucket boundaries.
    *
    * In-place rewrites (`path` also being the input) are supported via
    * the same tmp-path + rename swap the sibling maintenance ops use.
    */
  def zorderWrite(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      maxRecordsPerFile: Long = 0
  ): Unit = {
    graft.functions.InterleaveBits.register(df.sparkSession)
    // min/max scaling to 32-bit keys: one tiny aggregate, no global
    // window — fully distributed
    val mm = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    def bound(i: Int, dflt: Double) = if (mm.isNullAt(i)) dflt else mm.getDouble(i)
    def scale(c: String, lo: Double, hi: Double) =
      if (hi > lo)
        ((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit(Int.MaxValue.toDouble))
          .cast("int")
      else lit(0)
    // empty input / all-null column → no usable bounds; sort key
    // degenerates to a constant and the (possibly empty) data still
    // writes instead of NPE-ing a maintenance job
    val keyed = df
      .withColumn("__za", scale(colA, bound(0, 0.0), bound(1, 0.0)))
      .withColumn("__zb", scale(colB, bound(2, 0.0), bound(3, 0.0)))
      .withColumn("__z", graft.functions.InterleaveBits(
        coalesce(col("__za"), lit(0)), coalesce(col("__zb"), lit(0))))
      .orderBy("__z") // range-partitioned global sort — scales
      .drop("__za", "__zb", "__z")
    val tmp = path + ".zorder"
    val w = keyed.write.mode(SaveMode.Overwrite)
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile) else w)
      .parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
  }

  /** Compute table + column stats for the CBO over a registered table. */
  def analyze(spark: SparkSession, table: String, columns: Seq[String] = Nil): Unit = {
    val forCols =
      if (columns.isEmpty) "" else s" FOR COLUMNS ${columns.mkString(", ")}"
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS$forCols")
  }
}

/** Q32: run-metrics capture — the reference snapshots pg_stat tables
  * on a schedule (table_index_monitoring.sql:61-149); the Spark analog
  * listens to query executions and task metrics and appends snapshots
  * to a stats table.
  */
final case class QueryStat(
    ts: Timestamp,
    name: String,
    durationNs: Long,
    rowsOut: Long
)

final class MetricsRecorder(spark: SparkSession, path: String) {
  private val buf = ArrayBuffer.empty[QueryStat]
  @volatile private var bytesRead = 0L

  private val taskListener = new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) bytesRead += t.taskMetrics.inputMetrics.bytesRead
  }

  private val queryListener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      buf.synchronized {
        val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
        buf += QueryStat(new Timestamp(System.currentTimeMillis()), funcName, durationNs, rows)
      }
    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit =
      buf.synchronized {
        buf += QueryStat(new Timestamp(System.currentTimeMillis()), s"$funcName!failed", -1L, -1L)
      }
  }

  def start(): Unit = {
    spark.sparkContext.addSparkListener(taskListener)
    spark.listenerManager.register(queryListener)
  }

  def stop(): Unit = {
    spark.sparkContext.removeSparkListener(taskListener)
    spark.listenerManager.unregister(queryListener)
  }

  def totalBytesRead: Long = bytesRead
  def snapshots: Seq[QueryStat] = buf.synchronized(buf.toSeq)

  def flush(): Unit = buf.synchronized {
    if (buf.nonEmpty) {
      import spark.implicits._
      spark.createDataset(buf.toSeq).write.mode(SaveMode.Append).parquet(path)
      buf.clear()
    }
  }
}
