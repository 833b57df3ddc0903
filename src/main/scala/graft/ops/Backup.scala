package graft.ops

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Table backup + retention — the engine-side analog of the
  * reference's `daily_backup.sh` (pg_dump of all DBs, 3-day
  * retention) and `weekly_cleanup_*` scripts. A "backup" of a parquet
  * table is a timestamped directory copy; restore is the reverse;
  * retention prunes old stamps. File-level copies, no Spark jobs —
  * this is control-plane I/O like the reference's shell scripts.
  */
object Backup {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Copy `tablePath` to `backupRoot/<name>/<stamp>`; returns the
    * backup path. `stamp` is caller-supplied (the reference uses
    * `yyyyMMdd`) so backups are reproducible and testable. Source and
    * destination resolve their own FileSystems, so hdfs→s3a backups
    * work.
    */
  def backup(spark: SparkSession, tablePath: String, backupRoot: String, stamp: String): String = {
    val src = new Path(tablePath)
    val dst = new Path(s"$backupRoot/${src.getName}/$stamp")
    val srcFs = fs(spark, tablePath)
    val dstFs = fs(spark, backupRoot)
    if (dstFs.exists(dst)) dstFs.delete(dst, true)
    dstFs.mkdirs(dst.getParent)
    FileUtil.copy(srcFs, src, dstFs, dst, false, spark.sparkContext.hadoopConfiguration)
    dst.toString
  }

  /** Restore a stamped backup over the live table path. The backup is
    * copied to a staging path FIRST and swapped in only after the copy
    * succeeds — a failed copy must never destroy the live table.
    */
  def restore(spark: SparkSession, backupPath: String, tablePath: String): Unit = {
    val dstFs = fs(spark, tablePath)
    val srcFs = fs(spark, backupPath)
    val staged = new Path(tablePath + ".restore")
    if (dstFs.exists(staged)) dstFs.delete(staged, true)
    FileUtil.copy(srcFs, new Path(backupPath), dstFs, staged, false,
      spark.sparkContext.hadoopConfiguration)
    val dst = new Path(tablePath)
    if (dstFs.exists(dst)) dstFs.delete(dst, true)
    dstFs.rename(staged, dst)
  }

  /** List stamps for a table's backups, newest first. */
  def stamps(spark: SparkSession, backupRoot: String, tableName: String): Seq[String] = {
    val dir = new Path(s"$backupRoot/$tableName")
    val f = fs(spark, backupRoot)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName).sorted.reverse.toSeq
  }

  /** Keep the newest `keep` stamps, delete the rest (the reference's
    * RETENTION_DAYS=3 analog, daily_backup.sh).
    */
  def prune(spark: SparkSession, backupRoot: String, tableName: String, keep: Int): Seq[String] = {
    val f = fs(spark, backupRoot)
    val old = stamps(spark, backupRoot, tableName).drop(keep)
    old.foreach(s => f.delete(new Path(s"$backupRoot/$tableName/$s"), true))
    old
  }
}
