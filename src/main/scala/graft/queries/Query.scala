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

  /** Deterministic global sort for an EXPENSIVE pipeline: materialize
    * once (localCheckpoint), then range-sort the materialized rows.
    * Spark's RangePartitioner executes its child twice — once to
    * sample partition bounds, once to shuffle — so an un-checkpointed
    * orderBy doubles the whole upstream pipeline. Result sets here are
    * report-sized; for genuinely huge sorted outputs skip the
    * checkpoint and eat the resample instead of pinning blocks.
    */
  def checkpointSort(df: DataFrame, cols: String*): DataFrame =
    df.localCheckpoint().orderBy(cols.map(org.apache.spark.sql.functions.col): _*)
}
