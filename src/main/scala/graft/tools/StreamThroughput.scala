package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.operators.CurationPipeline
import graft.registry.DatasetRegistry
import graft.streaming.StreamingIngest

/** Throughput notch for the AvailableNow curation stream — the number
  * the crash/parity evidence (PipelineSpec) deliberately doesn't give:
  * documents/second through the FULL streamed composition (quality
  * gate → registry insert → fingerprint + LSH index ingest → curated
  * append) versus the identical composition fed batch-directly, on
  * the same deliveries at the same scale.
  *
  * Deliveries are staged as JSON files in a landing dir (the
  * landing-zone contract the stream actually ingests in production)
  * and drained with `maxFilesPerTrigger=1`, so micro-batch count =
  * delivery count and the per-trigger scheduling overhead is included
  * in the streamed number — that overhead amortizes with delivery
  * size, which is exactly what the batch-vs-stream delta shows.
  *
  * Output `[stream]` lines are the NOTES table. Usage:
  *   runMain graft.tools.StreamThroughput [sfDir] [nDeliveries]
  */
object StreamThroughput {
  def main(args: Array[String]): Unit = {
    val dir =
      if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/.tmp/sf1")
    val nDeliveries = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = graft.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = graft.queries.Tables(spark, dir).documents.localCheckpoint()
    val nDocs = docs.count()
    val root = Files.createTempDirectory("graft-stream-tp")
    val landing = Files.createDirectory(root.resolve("landing")).toString
    val date = java.sql.Date.valueOf("2026-01-01")

    // stage the corpus as nDeliveries JSON files, in delivery order
    for (s <- 0 until nDeliveries) {
      val tmp = s"$root/stage_$s"
      docs.filter(pmod(col("doc_id"), lit(nDeliveries.toLong)) === s)
        .coalesce(1).write.mode("overwrite").json(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".json")).get
      Files.copy(part.toPath, Paths.get(landing, f"d$s%03d.json"),
        StandardCopyOption.REPLACE_EXISTING)
    }

    def run(label: String, streamed: Boolean): (Double, Long) = {
      val cfg = CurationPipeline.Config(s"$root/work_$label", date)
      val reg = new DatasetRegistry(spark, cfg.registryPath)
      var batches = 0L
      val t0 = System.nanoTime()
      if (streamed) {
        val src = spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).json(landing)
        StreamingIngest.runAvailableNow(src, s"$root/ckpt_$label", (df, _) => {
          val batch = df.localCheckpoint()
          if (batch.count() > 0) {
            batches += 1
            CurationPipeline.processDelivery(batch, s"b$batches", reg, cfg)
          }
        })
      } else {
        for (s <- 0 until nDeliveries) {
          batches += 1
          val batch = spark.read.schema(docs.schema).json(f"$landing/d$s%03d.json")
          CurationPipeline.processDelivery(batch, s"b$s", reg, cfg)
        }
      }
      val packed = CurationPipeline.packAndAudit(spark, cfg)
      val nShards = packed.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[stream] $label%-8s docs=$nDocs%-8d deliveries=$batches%-4d " +
        f"shards=$nShards%-5d secs=$secs%.1f rows_per_sec=${nDocs / secs}%.0f")
      (secs, batches)
    }

    run("warmup", streamed = false) // JIT + page-cache warm; discarded
    val (bSecs, _) = run("batch", streamed = false)
    val (sSecs, sBatches) = run("stream", streamed = true)
    println(f"[stream] overhead stream/batch=${sSecs / bSecs}%.2fx " +
      f"(${(sSecs - bSecs) * 1000 / sBatches}%.0f ms/micro-batch of trigger+checkpoint cost)")
    spark.stop()
  }
}
