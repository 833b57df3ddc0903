package graft.tools

import java.nio.file.Files

import graft.Sessions
import graft.model.{AttachmentQuery, ReportConfig}
import graft.ops.{Maintenance, MetricsRecorder, RunLogger}
import graft.report.{InMemoryMailer, ReportRunner}
import graft.streaming.StreamingIngest

/** CLI demo of the post-ingest surfaces: streaming backlog ingestion
  * (Trigger.AvailableNow), report rendering (HTML grid + CSV), run
  * logging, metrics capture, and table compaction.
  * `sbt "runMain graft.tools.PipelineDemo"`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cores = 8, app = "graft-pipeline-demo")
    val root = Files.createTempDirectory("graft-pipe")
    val logger = new RunLogger(spark, s"$root/logs")
    val metrics = new MetricsRecorder(spark, s"$root/stats")
    metrics.start()

    // 1. streaming ingestion of a landed backlog
    val in = Files.createDirectories(root.resolve("landing"))
    Files.write(in.resolve("20250401T120000_data.csv"), "id,v\n1,a\n2,b\n".getBytes)
    Files.write(in.resolve("20250402T120000_data.csv"), "id,v\n3,c\n".getBytes)
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id STRING, v STRING")
    val src = StreamingIngest.fileStream(spark, in.toString, schema, "*_data.csv")
    var landed = 0L
    StreamingIngest.runAvailableNow(src, s"$root/ckpt", (df, batchId) => {
      landed += df.count()
      logger.info(s"stream batch $batchId: ${df.count()} rows")
    })
    println(s"[demo] streamed rows: $landed")

    // 2. report over live data
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .createOrReplaceTempView("orders")
    val mailer = new InMemoryMailer
    val report = new ReportRunner(spark, mailer).run(ReportConfig(
      1, "orders-by-status", Seq("ops@example.com"), "Orders",
      "<h2>Orders by status</h2>{{grid}}",
      Map("grid" -> "SELECT o_orderstatus, count(*) n FROM orders GROUP BY 1 ORDER BY 1"),
      Seq(AttachmentQuery("top10.csv",
        "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC LIMIT 10")),
      isActive = true
    ))
    println(s"[demo] report html bytes: ${report.htmlBody.length}, " +
      s"attachment lines: ${report.attachments.head.content.linesIterator.size}, " +
      s"mailer deliveries: ${mailer.sent.size}")

    // 3. maintenance: compact a fragmented table
    val frag = s"$root/frag"
    spark.range(0, 50000).repartition(32).write.parquet(frag)
    val rep = Maintenance.compact(spark, frag)
    println(s"[demo] compaction: ${rep.filesBefore} -> ${rep.filesAfter} files, rows ${rep.rows}")

    // 3b. incremental dedup ingest with the maintenance trigger wired
    // in: daily batches land, each drops known-exact rows, reports
    // near-dups vs the corpus index, appends, and auto-compacts once
    // the append debt passes the file-count threshold
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .localCheckpoint()
    var compactions = 0
    (0 until 6).foreach { b =>
      val r = graft.operators.Dedup.ingestBatch(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 6 === b),
        "doc_id", "text", s"$root/dedup/lsh", s"$root/dedup/fp",
        threshold = 0.35, maxFiles = 24L)
      if (r.compacted) compactions += 1
      logger.info(s"dedup batch $b: fresh=${r.fresh.count()} " +
        s"nearDups=${r.nearDups.count()} compacted=${r.compacted}")
    }
    println(s"[demo] incremental dedup: 6 batches, $compactions auto-compactions, " +
      s"index files now " +
      Maintenance.parquetFileCount(spark, s"$root/dedup/lsh").toString)

    // 4. backup + retention (daily_backup.sh analog)
    graft.ops.Backup.backup(spark, frag, s"$root/backups", "20260811")
    graft.ops.Backup.backup(spark, frag, s"$root/backups", "20260812")
    graft.ops.Backup.prune(spark, s"$root/backups", "frag", keep = 1)
    println(s"[demo] backup stamps after prune(keep=1): " +
      graft.ops.Backup.stamps(spark, s"$root/backups", "frag").mkString(","))
    println(s"[demo] restored row count: " + {
      graft.ops.Backup.restore(spark, s"$root/backups/frag/20260812", frag)
      spark.read.parquet(frag).count()
    })

    // 5. z-order clustering: bytes read for a 2-column point predicate
    import org.apache.spark.sql.functions.col
    val dims = spark.range(0, 200000)
      .selectExpr("id", "cast(id % 447 as int) as a", "cast(pmod(hash(id), 447) as int) as b")
    dims.orderBy("a").write.option("maxRecordsPerFile", 10000).parquet(s"$root/natural")
    graft.ops.Maintenance.zorderWrite(dims, s"$root/zorder", "a", "b", 10000)
    def scanBytes(p: String): Long = {
      val rec = new MetricsRecorder(spark, s"$root/zstats")
      rec.start()
      try {
        spark.read.parquet(p).filter(col("a").between(10, 30) && col("b").between(10, 30)).count()
        // wait for a stable (not merely nonzero) counter: delivery is
        // async and incremental
        val deadline = System.currentTimeMillis() + 15000
        var last = -1L; var stable = 0
        while (stable < 3 && System.currentTimeMillis() < deadline) {
          Thread.sleep(150)
          val cur = rec.totalBytesRead
          if (cur > 0 && cur == last) stable += 1 else stable = 0
          last = cur
        }
      } finally rec.stop()
      rec.totalBytesRead
    }
    val nb = scanBytes(s"$root/natural"); val zb = scanBytes(s"$root/zorder")
    println(f"[demo] z-order file skipping: natural=$nb%,d bytes -> zorder=$zb%,d bytes (${100.0 * zb / nb}%.0f%%)")

    // 6. flush ops tables
    logger.flush(); metrics.flush(); metrics.stop()
    println(s"[demo] log rows: ${spark.read.parquet(s"$root/logs").count()}, " +
      s"metric snapshots: ${spark.read.parquet(s"$root/stats").count()}, " +
      s"bytes read observed: ${metrics.totalBytesRead}")
    spark.stop()
  }
}
