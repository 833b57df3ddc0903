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
    // Analyzed-scan cache (metadata only, never data): `spark.read
    // .parquet` pays a driver-side file listing + footer schema read
    // EVERY time, and the bench builds each query fresh per run — at
    // ~194 queries × (warmup + runs) × 1-3 tables that listing/footer
    // tax is pure fixed overhead. The cached value is the lazy
    // DataFrame (logical plan + resolved FileIndex); every action
    // still scans the parquet from disk. Keyed by a (size|mtime) file
    // fingerprint so a driver-regenerated table invalidates itself.
    val path = s"$dir/$name.parquet"
    val key = (spark, path)
    val fp = Tables.fileFingerprint(path)
    val cached = Tables.scanCache.get(key)
    if (cached != null && cached._1 == fp) cached._2
    else {
      val raw = spark.read.parquet(path)
      val df = raw.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
        .foldLeft(raw) { (d, f) =>
          d.withColumn(f.name,
            org.apache.spark.sql.functions.col(f.name)
              .cast(org.apache.spark.sql.types.TimestampType))
        }
      Tables.scanCache.put(key, (fp, df))
      df
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

  /** (session, path) → (file fingerprint, analyzed scan). See
    * [[Tables.table]]. Strong session keys are fine: entries are one
    * lazy plan each, and sessions here are long-lived harness/test
    * sessions.
    */
  private[queries] val scanCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (String, DataFrame)]()

  /** Cheap (name|size|mtime) fingerprint of a parquet file or dir —
    * java.io only, no Hadoop FileSystem init. Changes whenever the
    * driver regenerates the table, invalidating the cached scan.
    */
  private[queries] def fileFingerprint(path: String): String = {
    val f = new java.io.File(path)
    if (!f.exists()) "absent"
    else if (f.isFile) s"${f.length()}|${f.lastModified()}"
    else {
      val kids = Option(f.listFiles()).getOrElse(Array.empty)
        .filter(_.isFile).sortBy(_.getName)
      kids.map(c => s"${c.getName}|${c.length()}|${c.lastModified()}").mkString(";")
    }
  }

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
