package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the library's own session factory, so the gate runs under the
    // exact config the operators are designed against (round 8's bench
    // ran with a DIFFERENT broadcast threshold than Sessions.local and
    // silently measured sort-merge plans the library never plans)
    val spark = Sessions.local(cpus.toIntOption.getOrElse(
      sys.error(s"SPARK_GRAFT_CPUS must be an integer core count, got '$cpus'")))
    new java.io.File(outDir).mkdirs()
    // per-query hard timeout with job-group cancellation: one
    // pathological plan must not block the round's correctness dump
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "300").toLong
    // SPARK_GRAFT_SQL_ONLY=1: refresh outDir/oracle_sql.json without
    // re-running the catalog (for oracle-SQL-only edits against an
    // existing dump)
    val sqlOnly = sys.env.getOrElse("SPARK_GRAFT_SQL_ONLY", "0") != "0"
    // SPARK_GRAFT_ONLY=a,b narrows the dump for targeted re-checks
    // (mirrors Bench); the driver never sets it, so the gate always
    // dumps the full catalog.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val pool = java.util.concurrent.Executors.newCachedThreadPool()
    (if (sqlOnly) Map.empty[String, (SparkSession, String) => org.apache.spark.sql.DataFrame]
     else SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) })
      .foreach { case (name, fn) =>
      val fut = pool.submit(new java.lang.Runnable {
        def run(): Unit = {
          spark.sparkContext.setJobGroup(s"verify-$name", name, interruptOnCancel = true)
          fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        }
      })
      try fut.get(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(s"verify-$name")
          fut.cancel(true)
          System.err.println(s"[verify] $name timed out after ${timeoutSec}s")
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        // drop each query's localCheckpoint blocks (checkpoint-heavy
        // rows leave several corpus-sized RDDs persisted; across a
        // 180+-query catalog the backlog is exactly the memory
        // pressure Bench.clearPersisted exists to avoid)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    pool.shutdownNow()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
