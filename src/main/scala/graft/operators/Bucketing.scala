package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables — the co-located-join lever for
  * 100 TB: two tables bucketed on the same key into the same bucket
  * count join with ZERO shuffle (the scan itself satisfies the
  * join's hashpartitioning requirement). Worth the write-side cost
  * whenever a large fact table is joined on the same key repeatedly
  * (the reference's fact→registry pattern at scale).
  *
  * PlanSpec asserts the no-Exchange plan shape.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner
    * sees both sides pre-hashed and skips the exchange.
    */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String,
      joinType: String = "inner"
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
