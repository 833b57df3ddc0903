package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

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

  test("report render caps rows: marker in grid + CSV, truncation logged, full collect avoided") {
    import graft.report.{CsvRenderer, HtmlRenderer}
    spark.range(10000).selectExpr("id", "concat('n', id) AS name")
      .createOrReplaceTempView("graft_report_big")
    val mailer = new InMemoryMailer
    val truncations = scala.collection.mutable.ArrayBuffer.empty[String]
    val runner = new ReportRunner(spark, mailer, maxRows = 50, onTruncate = truncations += _)
    val out = runner.run(ReportConfig(
      reportId = 3, reportName = "big",
      recipients = Seq("ops@example.com"), subject = "Big",
      bodyTemplate = "{{g}}",
      emailBodyQueries = Map("g" -> "SELECT id, name FROM graft_report_big ORDER BY id"),
      attachmentQueries = Seq(AttachmentQuery("big.csv",
        "SELECT id, name FROM graft_report_big ORDER BY id")),
      isActive = true))
    // 50 data rows (plain <tr><td>) + 1 colspan marker row, not 10k
    assert(out.htmlBody.sliding(8).count(_ == "<tr><td>") == 50)
    assert(out.htmlBody.contains(s"""colspan="2">… truncated at 50 rows"""))
    val csvLines = out.attachments.head.content.linesIterator.toSeq
    assert(csvLines.size == 52 && csvLines.last == "\"… truncated at 50 rows\"")
    assert(truncations.size == 2, s"both renders must be logged, got $truncations")
    // an under-cap frame renders without any marker (full-frame parity)
    val (html, t1) = HtmlRenderer.gridWithInfo(
      spark.sql("SELECT id FROM graft_report_big WHERE id < 5"), maxRows = 50)
    val (csv, t2) = CsvRenderer.renderWithInfo(
      spark.sql("SELECT id FROM graft_report_big WHERE id < 5"), maxRows = 50)
    assert(!t1 && !t2 && !html.contains("truncated") && !csv.contains("truncated"))
  }

  test("SmtpMailer delivers the report end-to-end against a stub SMTP server") {
    import graft.report.{SmtpConfig, SmtpMailer}
    // single-connection stub SMTP server, canned replies, captures DATA
    val server = new java.net.ServerSocket(0)
    val captured = new java.util.concurrent.LinkedBlockingQueue[String]
    val srv = new Thread(() => {
      val s = server.accept()
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(s.getInputStream))
      val out = new java.io.PrintWriter(s.getOutputStream, true)
      def reply(r: String): Unit = { out.print(r + "\r\n"); out.flush() }
      reply("220 stub ESMTP")
      var inData = false
      var authStep = 0 // 0 idle, 1 expect username, 2 expect password
      val data = new StringBuilder
      var line = in.readLine()
      while (line != null) {
        if (inData) {
          if (line == ".") { inData = false; captured.put(data.toString); reply("250 OK") }
          else data ++= (if (line.startsWith("..")) line.drop(1) else line) + "\r\n"
        } else if (authStep == 1) { reply("334 UGFzc3dvcmQ6"); authStep = 2 }
        else if (authStep == 2) { reply("235 ok"); authStep = 0 }
        else line.takeWhile(_ != ' ') match {
          case "EHLO" => reply("250-stub"); reply("250 AUTH LOGIN")
          case "AUTH" => reply("334 VXNlcm5hbWU6"); authStep = 1
          case "MAIL" | "RCPT" => reply("250 OK")
          case "DATA" => inData = true; reply("354 go")
          case "QUIT" => reply("221 bye"); line = null
          case _ => reply("250 OK")
        }
        if (line != null) line = in.readLine()
      }
      s.close()
    })
    srv.start()

    Seq((1, "a,b"), (2, "c")).toDF("id", "name").createOrReplaceTempView("graft_smtp_t")
    val mailer = new SmtpMailer(SmtpConfig(
      "localhost", server.getLocalPort, from = "etl@example.com",
      username = Some("etl@example.com"), password = Some("secret")))
    val runner = new ReportRunner(spark, mailer)
    runner.run(ReportConfig(
      reportId = 2, reportName = "smtp",
      recipients = Seq("ops@example.com", "eng@example.com"), subject = "Daily SMTP",
      bodyTemplate = "<h2>R</h2>{{g}}",
      emailBodyQueries = Map("g" -> "SELECT id, name FROM graft_smtp_t ORDER BY id"),
      attachmentQueries = Seq(AttachmentQuery("rows.csv",
        "SELECT id, name FROM graft_smtp_t ORDER BY id")),
      isActive = true))
    val msg = captured.poll(10, java.util.concurrent.TimeUnit.SECONDS)
    srv.join(5000); server.close()
    assert(msg != null, "stub server must capture a DATA payload")
    // MIME assembly parity with send_reports.py:52-68
    assert(msg.contains("From: etl@example.com"))
    assert(msg.contains("To: ops@example.com, eng@example.com"))
    assert(msg.contains("Subject: Daily SMTP"))
    assert(msg.contains("Content-Type: multipart/mixed"))
    assert(msg.contains("Content-Type: text/html; charset=utf-8"))
    assert(msg.contains("<h2>R</h2><table border=\"1\""))
    assert(msg.contains("Content-Disposition: attachment; filename=rows.csv"))
    // the base64 attachment round-trips to the rendered CSV
    val b64 = msg.split("filename=rows\\.csv\r\n\r\n")(1).split("\r\n--")(0).replace("\r\n", "")
    val csv = new String(java.util.Base64.getDecoder.decode(b64), "UTF-8")
    assert(csv.linesIterator.toSeq == Seq("\"id\",\"name\"", "1,\"a,b\"", "2,\"c\""))
  }

  test("CRLF in subject / recipient / attachment name cannot inject headers or SMTP verbs") {
    import graft.report.{Attachment, RenderedReport, SmtpConfig, SmtpMailer}
    val mailer = new SmtpMailer(SmtpConfig("localhost", 0, from = "etl@example.com"))
    val mime = mailer.mime(RenderedReport(
      subject = "Daily\r\nBcc: evil@example.com",
      recipients = Seq("ops@example.com\r\nRCPT TO:<evil@example.com>"),
      htmlBody = "<p>ok</p>",
      attachments = Seq(Attachment("a\r\nX-Evil: 1\".csv", "x"))))
    // injected line breaks are flattened to spaces — the hostile text
    // stays INSIDE its value; no line of the message starts a new
    // header or SMTP verb
    val lines = mime.split("\r\n").toSeq
    assert(!lines.exists(_.startsWith("Bcc:")), mime)
    assert(!lines.exists(_.startsWith("X-Evil")), mime)
    assert(!lines.exists(_.startsWith("RCPT")), mime)
    assert(lines.contains("Subject: Daily  Bcc: evil@example.com"), mime)
    assert(lines.contains("To: ops@example.com  RCPT TO:evil@example.com"), mime)
  }

  test("ReportConfig parses the reference's JSONB column shapes") {
    import graft.model.ReportConfig
    val body = ReportConfig.parseBodyQueries("""{"grid1": "SELECT 1", "grid2": "SELECT 2"}""")
    assert(body == Right(Map("grid1" -> "SELECT 1", "grid2" -> "SELECT 2")))
    val atts = ReportConfig.parseAttachmentQueries(
      """[{"name": "f.csv", "query": "SELECT 1"}, {"name": "g.csv", "query": "SELECT 2"}]""")
    assert(atts.map(_.map(_.name)) == Right(Seq("f.csv", "g.csv")))
    // malformed shapes are Lefts, not exceptions
    assert(ReportConfig.parseBodyQueries("""["not","an","object"]""").isLeft)
    assert(ReportConfig.parseAttachmentQueries("""[{"name": "no-query"}]""").isLeft)
    assert(ReportConfig.parseBodyQueries("""{broken json""").isLeft)
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

  test("z-order clustering cuts bytes read for two-column point predicates") {
    import graft.ops.{Maintenance, MetricsRecorder}
    val root = Files.createTempDirectory("graft-zorder")
    // two independent uniform dims; natural order = ordered by a only
    val df = spark.range(0, 200000)
      .selectExpr("id", "cast(id % 447 as int) as a", "cast(pmod(hash(id), 447) as int) as b")
    df.orderBy("a").write.option("maxRecordsPerFile", 10000).parquet(s"$root/natural")
    Maintenance.zorderWrite(df, s"$root/zorder", "a", "b", maxRecordsPerFile = 10000)

    def bytesFor(path: String): Long = {
      val rec = new MetricsRecorder(spark, s"$root/stats")
      rec.start()
      try {
        spark.read.parquet(path)
          .filter(col("a").between(10, 30) && col("b").between(10, 30)).count()
        // listener delivery is async AND incremental: wait until the
        // counter is nonzero and stable, not just first-nonzero —
        // stopping early undercounts whichever scan we poll less
        val deadline = System.currentTimeMillis() + 15000
        var last = -1L
        var stable = 0
        while (stable < 3 && System.currentTimeMillis() < deadline) {
          Thread.sleep(150)
          val cur = rec.totalBytesRead
          if (cur > 0 && cur == last) stable += 1 else stable = 0
          last = cur
        }
      } finally rec.stop()
      rec.totalBytesRead
    }
    val naturalBytes = bytesFor(s"$root/natural")
    val zBytes = bytesFor(s"$root/zorder")
    // correctness: same rows either way
    val n1 = spark.read.parquet(s"$root/natural")
      .filter(col("a").between(10, 30) && col("b").between(10, 30)).count()
    val n2 = spark.read.parquet(s"$root/zorder")
      .filter(col("a").between(10, 30) && col("b").between(10, 30)).count()
    assert(n1 == n2 && n1 > 0)
    // skipping: the z-ordered layout reads meaningfully less
    assert(zBytes < naturalBytes,
      s"expected z-order to skip: z=$zBytes natural=$naturalBytes")
  }

  test("file stats report: clustered writes give disjoint per-file ranges, unclustered overlap") {
    import graft.ops.FileStats
    val root = Files.createTempDirectory("graft-filestats")
    val df = spark.range(0, 50000)
      .selectExpr("id", "cast(pmod(hash(id), 1000) as int) as k")
    // unclustered: k is scattered → every file spans ~the full k range
    df.repartition(5).write.parquet(s"$root/scattered")
    // clustered: range-partition + sort on k → disjoint per-file ranges
    df.repartitionByRange(5, col("k")).sortWithinPartitions("k")
      .write.parquet(s"$root/clustered")

    val stats = FileStats.parquetColumnStats(spark, s"$root/clustered")
    assert(stats.filter(col("column") === "k").count() >= 5)

    def overlaps(path: String): Long =
      FileStats.pruningReport(spark, path, "k")
        .filter(col("overlaps_prev")).count()
    assert(overlaps(s"$root/scattered") > 0, "scattered files should overlap on k")
    assert(overlaps(s"$root/clustered") == 0, "clustered files must be disjoint on k")

    // nested intervals: a wide file followed by two narrow files both
    // inside it — a lag(1) comparison would miss the second narrow
    // file (it doesn't overlap its NEIGHBOR, only the wide file);
    // the running-max comparison must flag both
    Seq((0, 100), (10, 20), (30, 40)).zipWithIndex.foreach { case ((lo, hi), i) =>
      spark.range(lo, hi + 1).selectExpr("cast(id as int) as k")
        .coalesce(1).write.mode("append").parquet(s"$root/nested")
    }
    val nested = FileStats.pruningReport(spark, s"$root/nested", "k")
      .orderBy("file_min").collect()
    assert(nested.length == 3)
    assert(!nested(0).getBoolean(4), "first file has nothing before it")
    assert(nested(1).getBoolean(4) && nested(2).getBoolean(4),
      "both nested files overlap the wide first file")
  }

  test("interleave_bits matches a reference morton implementation") {
    graft.functions.InterleaveBits.register(spark)
    def ref(a: Int, b: Int): Long = {
      var r = 0L
      for (i <- 0 until 32) {
        r |= ((a.toLong >> i) & 1L) << (2 * i)
        r |= ((b.toLong >> i) & 1L) << (2 * i + 1)
      }
      r
    }
    val cases = Seq((0, 0), (1, 0), (0, 1), (255, 255), (12345, 67890), (Int.MaxValue, 7))
    val got = cases.toDF("a", "b")
      .select(graft.functions.InterleaveBits(col("a"), col("b")))
      .collect().map(_.getLong(0))
    assert(got.toSeq == cases.map { case (a, b) => ref(a, b) })
  }

  test("metrics recorder captures query executions and input bytes") {
    val path = Files.createTempDirectory("graft-metrics").toString + "/stats"
    val rec = new MetricsRecorder(spark, path)
    rec.start()
    try {
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet").count()
      // listener delivery is async; poll BOTH listeners before
      // unregistering — the query-execution event can still be queued
      // on the bus after task metrics have already arrived (seen
      // under heavy load: snapshots empty while bytesRead > 0)
      val deadline = System.currentTimeMillis() + 10000
      while ((rec.totalBytesRead == 0 || rec.snapshots.isEmpty) &&
        System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally rec.stop()
    assert(rec.totalBytesRead > 0)
    assert(rec.snapshots.nonEmpty)
    rec.flush()
    assert(spark.read.parquet(path).count() >= 1)
  }
}
