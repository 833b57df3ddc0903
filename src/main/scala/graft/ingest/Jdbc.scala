package graft.ingest

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4 companion — the literal JDBC scan. The reference's report jobs
  * read inputs straight from Postgres (`jobscripts/send_reports.py:115,
  * 130` — `pd.read_sql` over a psycopg2 connection); in-engine the
  * equivalent queries run as `spark.sql` over registered views
  * (`queries/Tables.scala`), but the capability itself — scanning an
  * external RDBMS table into a DataFrame — is `spark.read.jdbc`, seamed
  * here.
  *
  * Scale shape: the single-connection form funnels the whole table
  * through ONE executor connection — fine for the reference's
  * report-sized reads, wrong for big tables. [[readPartitioned]] is the
  * scale path: `numPartitions` parallel range-sliced connections
  * (`partitionColumn` BETWEEN stride bounds), which is how a 1000-
  * executor cluster drains an RDBMS without serializing on one socket.
  * Pushdown note: `spark.read.jdbc` pushes filters and column pruning
  * into the remote SQL (WHERE/SELECT list), so `.filter`/`.select` on
  * the result do not ship the full table.
  */
object JdbcSource {

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** One-connection read of `table` (a table name or a
    * `(SELECT ...) alias` subquery, the same forms pd.read_sql takes).
    */
  def read(
      spark: SparkSession,
      url: String,
      table: String,
      options: Map[String, String] = Map.empty
  ): DataFrame =
    spark.read.jdbc(url, table, props(options))

  /** Range-partitioned parallel read: `numPartitions` connections, each
    * scanning `partitionColumn` within its stride of [lower, upper].
    * Rows outside the bounds still arrive (first/last slice are
    * unbounded) — bounds shape parallelism, not a filter.
    */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      options: Map[String, String] = Map.empty
  ): DataFrame =
    spark.read.jdbc(
      url, table, partitionColumn, lowerBound, upperBound, numPartitions, props(options))
}
