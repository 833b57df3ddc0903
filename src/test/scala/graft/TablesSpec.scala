package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.queries.Tables

/** Pins the `events.ts` physical-encoding contract. The driver has
  * regenerated `/root/testdata` mid-round with a different parquet
  * encoding for this column before (round 6: TIMESTAMP(NANOS) →
  * micros with isAdjustedToUTC=0, i.e. TIMESTAMP_NTZ), and every
  * downstream `unix_micros`/watermark consumer breaks if the boundary
  * passes the surprise type through. `Tables.events` must therefore
  * surface TIMESTAMP (LTZ) with identical micros values for ALL known
  * encodings, and refuse loudly on anything new.
  */
class TablesSpec extends SparkSpec {

  /** micros since epoch used in every encoding; includes a pre-1970
    * value and a non-millisecond-aligned value.
    */
  private val micros = Seq(0L, -1L, 1234567890123456L, 1700000000000001L)

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("tables-spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Write `<dir>/events.parquet` with ts as TIMESTAMP(NANOS,
    * isAdjustedToUTC=true) via parquet-mr directly — Spark itself
    * cannot produce this encoding (the round-1..5 driver data shape).
    */
  private def writeNanos(dir: String): Unit = {
    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .named("events")
    val f = new SimpleGroupFactory(schema)
    val w = ExampleParquetWriter.builder(new Path(s"$dir/events.parquet"))
      .withType(schema).build()
    try micros.zipWithIndex.foreach { case (us, i) =>
      w.write(f.newGroup().append("event_id", i.toLong).append("ts", us * 1000L))
    } finally w.close()
  }

  /** Write via Spark with ts surfaced as the given type (LTZ or NTZ);
    * NTZ lands in parquet as TIMESTAMP_MICROS with isAdjustedToUTC=0,
    * the round-6+ driver shape.
    */
  private def writeSpark(dir: String, asNtz: Boolean): Unit = {
    import spark.implicits._
    val df = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
      .withColumn("ts", {
        val ltz = timestamp_micros(col("us"))
        if (asNtz) ltz.cast(TimestampNTZType) else ltz
      })
      .drop("us")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def readBack(dir: String): Map[Long, Long] = {
    val events = Tables(spark, dir).events
    assert(events.schema("ts").dataType == TimestampType,
      s"$dir: ts must surface as TIMESTAMP (LTZ), got ${events.schema("ts").dataType}")
    events.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("Tables.events normalizes all three known ts encodings to identical LTZ micros") {
    val (dNanos, dNtz, dLtz) = (tmpDir(), tmpDir(), tmpDir())
    writeNanos(dNanos)
    writeSpark(dNtz, asNtz = true)
    writeSpark(dLtz, asNtz = false)
    val expected = micros.zipWithIndex.map { case (us, i) => i.toLong -> us }.toMap
    assert(readBack(dLtz) == expected, "LTZ passthrough")
    assert(readBack(dNtz) == expected, "NTZ (micros, isAdjustedToUTC=0) cast")
    assert(readBack(dNanos) == expected, "TIMESTAMP(NANOS) via nanosAsLong truncation")
  }

  test("normalizeTs refuses unknown timestamp-shaped encodings instead of passing through") {
    import spark.implicits._
    val df = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeTs(df, "ts"))
    assert(e.getMessage.contains("unsupported physical encoding"))
  }

  test("GenData preserves the source's surfaced ts encoding (NTZ in, NTZ out)") {
    val base = tmpDir()
    // minimal base dir: copy the tiny sf0.001 tables, but force events
    // to the NTZ encoding so the round-trip is observable.
    val src = Tables(spark, "/root/testdata/sf0.001")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
      src.table(t).write.parquet(s"$base/$t.parquet")
    }
    src.events
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.parquet(s"$base/events.parquet")

    val out = tmpDir()
    graft.tools.GenData.generate(spark, base, out, replicas = 2)

    val rawOut = spark.read.parquet(s"$out/events.parquet")
    assert(rawOut.schema("ts").dataType == TimestampNTZType,
      s"GenData must re-emit the source encoding, got ${rawOut.schema("ts").dataType}")
    // and the normalized values of replica 0 equal the source's
    val n = src.events.count()
    assert(Tables(spark, out).events.count() == 2 * n)
    val srcSum = src.events.agg(sum(unix_micros(col("ts")))).head.getLong(0)
    val outSum = Tables(spark, out).events
      .where(col("event_id") < n).agg(sum(unix_micros(col("ts")))).head.getLong(0)
    assert(outSum == srcSum, "replica 0 micros must be bit-identical to the source")
  }
}
