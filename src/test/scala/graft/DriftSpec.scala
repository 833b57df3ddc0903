package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.Tables
import graft.streaming.Drift

class DriftSpec extends SparkSpec {

  private def dailyTotals(sf: String) =
    Tables(spark, sf).events
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg((sum(col("value").cast("decimal(12,2)")) * 100).cast("long").as("cents"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getString(0), r.getDate(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .sortBy(t => (t._1, t._2.toString))
      .toSeq

  test("streaming EWMA drift monitor equals the batch x40 screen across a restart") {
    // the monitoring contract under failure: the stateful monitor is
    // run over the first half of the metrics stream, checkpointed,
    // stopped, and restarted when the second half lands — the union of
    // emitted rows must be BIT-equal (doubles included) to the batch
    // catalog screen over everything: lag state recovered, no row
    // emitted twice, no day's screen lost at the boundary.
    val root = Files.createTempDirectory("graft-drift")
    val sf = "/root/testdata/sf0.001"
    val d = dailyTotals(sf).localCheckpoint()
    val cut = lit("2024-01-15").cast("date")
    // one file per tranche: arrival order across micro-batches is the
    // day order, which is the monitor's input contract (in-order
    // metrics stream); within a batch onGroup sorts
    d.filter(col("day") <= cut).coalesce(1).write.parquet(s"$root/in")
    val schema = spark.read.parquet(s"$root/in").schema

    // a FILE sink, not the memory sink: append-mode memory sinks
    // cannot recover from a checkpoint, and the parquet sink also
    // proves emitted rows accumulate exactly-once across the restart
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$root/in")
      val q = Drift.ewmaStream(stream).toDF().writeStream
        .outputMode("append").format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.processAllAvailable()
      q.stop()
    }

    runOnce()
    val first = rows(spark.read.parquet(s"$root/out"))
    d.filter(col("day") > cut).coalesce(1).write.mode("append").parquet(s"$root/in")
    runOnce()
    val got = rows(spark.read.parquet(s"$root/out"))

    val want = rows(queries.Extras.x40EwmaAnomaly.build(spark, sf)
      .select("event_type", "day", "actual", "ewma", "rel_dev", "anomaly"))
    assert(first.nonEmpty && got.size > first.size,
      "both runs must emit rows (state must carry across the restart)")
    assert(got == want,
      "streamed drift rows must be bit-equal to the batch x40 screen")
  }

  test("out-of-order metric days are dropped, not folded into EWMA state") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def dt(day: String, cents: Long) =
      Drift.DailyTotal("a", java.sql.Date.valueOf(day), cents)
    val st = TestGroupState.create[Drift.EwmaState](
      org.apache.spark.api.java.Optional.empty[Drift.EwmaState](),
      GroupStateTimeout.NoTimeout(),
      0L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val batch1 = Drift.onGroup(0.25)("a",
      Iterator(dt("2024-01-01", 100L), dt("2024-01-02", 200L),
        dt("2024-01-03", 400L)), st).toSeq
    assert(batch1.map(_.day.toString) == Seq("2024-01-02", "2024-01-03"),
      "every day with at least one lag must emit a screen row")
    assert(batch1.head.ewma == 1.0 && batch1.last.rel_dev > 0,
      s"EWMA arithmetic drifted: $batch1")
    // a later micro-batch re-delivers an already-screened day: it must
    // emit nothing and leave the lag state untouched
    val stale = Drift.onGroup(0.25)("a", Iterator(dt("2024-01-02", 999L)), st).toSeq
    assert(stale.isEmpty, "a replayed day must not emit")
    val next = Drift.onGroup(0.25)("a", Iterator(dt("2024-01-04", 800L)), st).toSeq
    // lags after clean batches: [400, 200, 100] -> num = 400*64+200*32+100*16
    val expect = (400L * 64 + 200L * 32 + 100L * 16).toDouble / (64 + 32 + 16)
    assert(next.size == 1 && next.head.ewma == expect / 100.0,
      s"state after the dropped replay must reflect only in-order days: $next")
  }

  test("an all-zero-lag EWMA emits no screen row (no Infinity/NaN), state still advances") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def dt(day: String, cents: Long) =
      Drift.DailyTotal("z", java.sql.Date.valueOf(day), cents)
    val st = TestGroupState.create[Drift.EwmaState](
      org.apache.spark.api.java.Optional.empty[Drift.EwmaState](),
      GroupStateTimeout.NoTimeout(),
      0L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    // two zero days, then a nonzero one: day 2 has lags=[0] -> EWMA 0,
    // rel_dev undefined -> dropped (x40's num <> 0 rule); day 3 has
    // lags=[0,0] -> still dropped; day 4 has lags=[500,0,0] -> emits
    val out = Drift.onGroup(0.25)("z",
      Iterator(dt("2024-01-01", 0L), dt("2024-01-02", 0L),
        dt("2024-01-03", 500L), dt("2024-01-04", 600L)), st).toSeq
    assert(out.map(_.day.toString) == Seq("2024-01-04"),
      s"zero-EWMA days must be skipped, not emitted as Infinity/NaN: $out")
    assert(!out.exists(r => r.rel_dev.isNaN || r.rel_dev.isInfinite),
      s"no undefined deviations may escape: $out")
    // lag state advanced through the skipped days: [500, 0, 0]
    val expect = (500L * 64).toDouble / (64 + 32 + 16)
    assert(out.head.ewma == expect / 100.0,
      s"skipped days must still enter the lag state: $out")
  }
}
