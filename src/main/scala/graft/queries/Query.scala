package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark DataFrame builder plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query.
  * The driver hash-compares the two at sf0.01 (see Verify.scala), so:
  *   - output column names/aliases MUST match the oracle exactly;
  *   - row order must be deterministic (ORDER BY a unique key set);
  *   - floating aggregation goes through DECIMAL(12,2) per-value casts
  *     so the reduction is exact and order-insensitive in both engines.
  */
final case class Query(
    name: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame
)

object Query {
  /** A money/quantity sum that is bit-identical across engines:
    * per-value cast to DECIMAL(12,2) (exact, deterministic for any
    * double both engines see), exact decimal summation, then one cast
    * of the final value back to double.
    */
  val sumMoneySql: String => String =
    c => s"CAST(SUM(CAST($c AS DECIMAL(12,2))) AS DOUBLE)"

  /** Deterministic global sort for an EXPENSIVE pipeline feeding a
    * REPORT-SIZED result. A plain `orderBy` range-sorts: the
    * RangePartitioner executes the child twice (bounds sample +
    * shuffle), doubling the upstream pipeline; the r1–r12 form paid a
    * `localCheckpoint` (its own job + block round-trip) to avoid that.
    * r13: a single round-robin exchange into ONE partition + an
    * in-partition sort runs the upstream exactly once with NO
    * checkpoint job, no sampling pass, and no pinned blocks — total
    * order is identical because callers sort by a unique key set
    * (the oracle-parity contract). The one-task sort is fine precisely
    * because results here are report-sized; for genuinely huge sorted
    * outputs use a plain orderBy and eat the resample.
    */
  def checkpointSort(df: DataFrame, cols: String*): DataFrame =
    df.repartition(1)
      .sortWithinPartitions(cols.map(org.apache.spark.sql.functions.col): _*)
}
