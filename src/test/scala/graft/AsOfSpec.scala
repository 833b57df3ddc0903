package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2025-01-01 10:00:00"), 100.0),
    (1L, ts("2025-01-01 10:00:05"), 101.0),
    (1L, ts("2025-01-01 10:01:00"), 102.0),
    (2L, ts("2025-01-01 10:00:02"), 200.0)
  ).toDF("key", "qts", "px")

  private lazy val trades = Seq(
    (1L, ts("2025-01-01 10:00:03"), 10),   // matches 10:00:00 quote
    (1L, ts("2025-01-01 10:00:05"), 20),   // equal time matches 10:00:05
    (1L, ts("2025-01-01 10:02:00"), 30),   // matches 10:01:00
    (2L, ts("2025-01-01 10:00:01"), 40),   // before any quote -> null
    (3L, ts("2025-01-01 10:00:00"), 50)    // key with no quotes -> null
  ).toDF("key", "tts", "qty")

  test("backward as-of join picks the latest quote at-or-before each trade") {
    val j = AsOf.joinBackward(trades, quotes, Seq("key"), "tts", "qts")
      .orderBy("key", "tts")
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), Option(r.get(4)).map(_ => r.getDouble(4))))
    assert(j.toSeq == Seq(
      (1L, 10, Some(100.0)),
      (1L, 20, Some(101.0)), // equal timestamps match (inclusive)
      (1L, 30, Some(102.0)),
      (2L, 40, None),
      (3L, 50, None)
    ))
  }

  test("tolerance voids matches older than the bound") {
    val j = AsOf.joinBackward(trades, quotes, Seq("key"), "tts", "qts",
        tolerance = Some(lit(10L))) // seconds (timestamp cast to long)
      .orderBy("key", "tts")
      .collect()
      .map(r => (r.getInt(2), Option(r.get(4)).map(_ => r.getDouble(4))))
    // the 10:02:00 trade's best quote (10:01:00) is 60s old -> voided
    assert(j.toSeq == Seq(
      (10, Some(100.0)),
      (20, Some(101.0)),
      (30, None),
      (40, None),
      (50, None)
    ))
  }
}
