package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated star schema (TESTDATA.md).
  * One parquet file per table under `<dir>/<name>.parquet`.
  *
  * All queries go through this so that filters/projections written
  * against the returned DataFrame are pushed into the parquet scan by
  * Catalyst (verify with `.explain`: PushedFilters / ReadSchema).
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is physically TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects. Read nanos as long and truncate to micros — the
    * same conversion DuckDB applies, so oracle comparisons line up.
    */
  private def withNanoTs(name: String, tsCol: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(name)
    raw.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn(tsCol, org.apache.spark.sql.functions.expr(s"timestamp_micros($tsCol div 1000)"))
      case _ => raw
    }
  }

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  def events: DataFrame     = withNanoTs("events", "ts")
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
