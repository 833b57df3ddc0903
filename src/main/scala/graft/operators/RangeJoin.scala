package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join, expressed as an EQUI-join so it
  * scales: Spark's only native plans for a pure range predicate are
  * BroadcastNestedLoopJoin (fine when one side broadcasts) or a
  * cartesian product (never fine). Bucketing recovers a shuffled hash
  * join for large×large:
  *
  *  - each point maps to one coarse time bucket;
  *  - each interval explodes to every bucket it overlaps (bounded by
  *    `ceil(span / bucketWidth) + 1` copies — pick `bucketDays` near
  *    the typical interval span so the blowup is ~2×);
  *  - equi-join on the bucket key, then the exact BETWEEN filter.
  *
  * The shuffle key is an 8-byte bucket id; skew follows the point
  * distribution over time, which AQE's skew-join splitting handles.
  * This is the standard interval-join decomposition (cf. Flink's
  * interval join and published range-join optimizations in
  * Spark-based engines).
  */
object RangeJoin {

  /** Join `points` (date column `pointCol`) to `intervals` (date
    * columns `loCol`..`hiCol`, inclusive) where
    * `lo <= point <= hi`. Returns all columns from both inputs.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketDays: Int = 32
  ): DataFrame = {
    require(bucketDays > 0, "bucketDays must be positive")
    val epoch = to_date(lit("1970-01-01"))
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(datediff(c, epoch) / bucketDays)
    val p = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val iv = intervals.withColumn(
      "__bucket",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    p.join(iv, Seq("__bucket"))
      .where(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__bucket")
  }
}
