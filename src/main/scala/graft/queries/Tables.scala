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
  /** Every table scan normalizes any TIMESTAMP_NTZ column to LTZ on the
    * way in (bit-identical under the pinned UTC session timezone): the
    * driver regenerating a table with isAdjustedToUTC=0 — as happened
    * to `events.ts` in round 6 — must not be able to break consumers of
    * ANY other table either. A bare cast projection over the scan keeps
    * column pruning and row-group pruning intact.
    */
  def table(name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.filter(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
      .foldLeft(raw) { (df, f) =>
        df.withColumn(f.name,
          org.apache.spark.sql.functions.col(f.name)
            .cast(org.apache.spark.sql.types.TimestampType))
      }
  }

  /** Normalize `events.ts` to TIMESTAMP (LTZ, micros) regardless of the
    * file's physical encoding. The driver has shipped this column three
    * different ways across rounds, so the boundary must handle all of them:
    *
    *  - TIMESTAMP(NANOS): Spark's reader rejects it outright; with
    *    `nanosAsLong` it surfaces as LongType — truncate to micros (the
    *    same conversion DuckDB applies, so oracle comparisons line up).
    *  - TIMESTAMP_MICROS with isAdjustedToUTC=0: surfaces as
    *    TIMESTAMP_NTZ, which `unix_micros`/`withWatermark` reject — cast
    *    to LTZ. The session timezone is pinned to UTC (Sessions.scala),
    *    so the cast is bit-identical on the stored micros.
    *  - TIMESTAMP_MICROS/MILLIS with isAdjustedToUTC=1: already LTZ.
    *
    * There is deliberately no silent fall-through for timestamp-shaped
    * physical types: anything else is a long/LTZ already or a new drift
    * we want to fail loudly on (TablesSpec pins the three known cases).
    */
  private def withNanoTs(name: String, tsCol: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeTs(table(name), tsCol)
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

object Tables {
  import org.apache.spark.sql.functions.{col, expr}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Normalize a parquet-sourced timestamp column to TIMESTAMP (LTZ,
    * micros) whatever its surfaced type (see [[Tables.withNanoTs]] for
    * the three physical encodings this covers). Timestamp-shaped types
    * other than the known three fail loudly rather than flow through
    * and break `unix_micros`/watermarks downstream.
    */
  def normalizeTs(raw: DataFrame, tsCol: String): DataFrame =
    raw.schema(tsCol).dataType match {
      case LongType =>
        raw.withColumn(tsCol, expr(s"timestamp_micros($tsCol div 1000)"))
      case TimestampNTZType =>
        raw.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"unsupported physical encoding for timestamp column '$tsCol': $other")
    }
}
