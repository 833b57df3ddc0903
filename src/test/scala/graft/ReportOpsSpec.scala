package graft

import java.nio.file.Files

import graft.model.{AttachmentQuery, ReportConfig}
import graft.ops.{Maintenance, MetricsRecorder, Retention, RunLogger}
import graft.report.{InMemoryMailer, ReportRunner}

class ReportOpsSpec extends SparkSpec {
  import spark.implicits._

  test("report render: grid substitution, CSV attachment with QUOTE_NONNUMERIC, mailer seam") {
    Seq((1, "a&b"), (2, "c")).toDF("id", "name").createOrReplaceTempView("graft_report_t")
    val mailer = new InMemoryMailer
    val runner = new ReportRunner(spark, mailer)
    val cfg = ReportConfig(
      reportId = 1, reportName = "daily",
      recipients = Seq("ops@example.com"), subject = "Daily",
      bodyTemplate = "<h2>Report</h2>{{grid1}}",
      emailBodyQueries = Map("grid1" -> "SELECT id, name FROM graft_report_t ORDER BY id"),
      attachmentQueries = Seq(AttachmentQuery("rows.csv", "SELECT id, name FROM graft_report_t ORDER BY id")),
      isActive = true
    )
    val out = runner.run(cfg)
    assert(out.htmlBody.startsWith("<h2>Report</h2><table border=\"1\""))
    assert(out.htmlBody.contains("<td>a&amp;b</td>")) // escaped
    assert(!out.htmlBody.contains("{{grid1}}"))
    val csv = out.attachments.head.content
    assert(csv.linesIterator.toSeq == Seq("\"id\",\"name\"", "1,\"a&b\"", "2,\"c\""))
    assert(mailer.sent.size == 1 && mailer.sent.head.recipients == Seq("ops@example.com"))
  }

  test("run logger buffers and flushes as one columnar append") {
    val path = Files.createTempDirectory("graft-log").toString + "/logs"
    val logger = new RunLogger(spark, path, runUuid = "test-uuid")
    logger.info("start")
    logger.error("boom")
    logger.info("end")
    logger.flush()
    val rows = logger.read().collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[String]("runUuid") == "test-uuid"))
    assert(rows.map(_.getAs[String]("level")).count(_ == "Error") == 1)
  }

  test("retention purge drops only old rows") {
    val path = Files.createTempDirectory("graft-ret").toString + "/t"
    val now = java.sql.Timestamp.valueOf("2026-08-10 00:00:00")
    val old = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    Seq((1, now), (2, old), (3, old)).toDF("id", "ts").write.parquet(path)
    val dropped = Retention.purgeOlderThan(spark, path, "ts", keepDays = 365)
    assert(dropped == 2L)
    assert(spark.read.parquet(path).collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("compaction rewrites many small files into few; row count preserved") {
    val path = Files.createTempDirectory("graft-compact").toString + "/t"
    spark.range(0, 10000).repartition(64).write.parquet(path)
    val rep = Maintenance.compact(spark, path, targetFileBytes = 64L * 1024 * 1024)
    assert(rep.filesBefore == 64)
    assert(rep.filesAfter < 8)
    assert(rep.rows == 10000)
    assert(spark.read.parquet(path).count() == 10000)
  }

  test("metrics recorder captures query executions and input bytes") {
    val path = Files.createTempDirectory("graft-metrics").toString + "/stats"
    val rec = new MetricsRecorder(spark, path)
    rec.start()
    try {
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet").count()
      // listener delivery is async; poll briefly instead of reaching
      // into the private listener bus
      val deadline = System.currentTimeMillis() + 10000
      while (rec.totalBytesRead == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally rec.stop()
    assert(rec.totalBytesRead > 0)
    assert(rec.snapshots.nonEmpty)
    rec.flush()
    assert(spark.read.parquet(path).count() >= 1)
  }
}
