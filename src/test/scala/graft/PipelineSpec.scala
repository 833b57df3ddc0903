package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.model.DatasetStatus
import graft.operators.CurationPipeline
import graft.queries.Tables
import graft.registry.DatasetRegistry
import graft.streaming.StreamingIngest

/** The composed end-to-end pipeline, STREAM-fed: a file-watcher source
  * over a landing zone drives the same `CurationPipeline
  * .processDelivery` the batch catalog row (in09) uses — across
  * micro-batch boundaries, a re-delivery, and a checkpoint restart —
  * and the final packed manifest must be BIT-equal to the batch-driven
  * composition. This is the full reference loop
  * (`run_download_and_import.sh` → `generic_import.py:520-796`)
  * with the curation/packing tail, proven under the failure modes a
  * real feed has.
  */
class PipelineSpec extends SparkSpec {

  test("stream-fed deliveries with re-delivery and restart equal the batch composition") {
    val sf = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-pipe")
    val landing = Files.createDirectory(root.resolve("landing")).toString
    val docs = Tables(spark, sf).documents.localCheckpoint()

    // stage each shard as ONE json file so maxFilesPerTrigger=1 makes
    // one delivery = one micro-batch
    def stage(shard: Long, name: String): Unit = {
      val tmp = s"$root/stage_$name"
      docs.filter(col("doc_id") % 3 === shard)
        .coalesce(1).write.mode("overwrite").json(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".json")).get
      Files.copy(part.toPath, Paths.get(landing, s"$name.json"),
        StandardCopyOption.REPLACE_EXISTING)
    }

    val cfg = CurationPipeline.Config(
      s"$root/work", java.sql.Date.valueOf("2026-01-01"),
      maxIndexFiles = 2L) // fire the Q33 compaction trigger on every append
    val reg = new DatasetRegistry(spark, cfg.registryPath)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[CurationPipeline.DeliveryResult]

    def drain(): Unit = {
      val src = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).json(landing)
      StreamingIngest.runAvailableNow(src, s"$root/ckpt", (df, _) => {
        val batch = df.localCheckpoint()
        if (batch.count() > 0) {
          val shard = batch.select(pmod(min(col("doc_id")), lit(3L))).head.getLong(0)
          results.add(CurationPipeline.processDelivery(batch, s"shard_$shard", reg, cfg))
        }
      })
    }

    stage(0, "d1_shard0")
    drain() // tranche 1: bootstrap delivery
    stage(1, "d2_shard1")
    stage(0, "d3_shard0_again") // the re-delivery
    drain() // tranche 2: two micro-batches, then the stream STOPS
    stage(2, "d4_shard2")
    drain() // tranche 3: restart from the checkpoint — no reprocessing

    val rs = results.toArray(Array.empty[CurationPipeline.DeliveryResult]).toSeq
    assert(rs.size == 4, s"4 deliveries must process exactly once, got ${rs.size}: $rs")
    val redelivery = rs.filter(_.label == "shard_0")
    assert(redelivery.size == 2, "shard_0 must be processed twice (original + re-delivery)")
    assert(redelivery.map(_.nFresh).count(_ == 0L) == 1,
      s"the re-delivered batch must be fully dropped by the fingerprint index: $redelivery")
    assert(rs.exists(_.compacted), "the auto-compaction trigger must fire during the run")

    // registry state: re-delivery displaced its sibling and was marked
    // Empty (reference semantics: Empty stays active, Q22/Q27)
    val regRows = reg.load().collect()
    assert(regRows.length == 4)
    val shard0 = regRows.filter(_.label == "shard_0").sortBy(_.datasetid)
    assert(shard0.length == 2 && !shard0.head.isactive && shard0.last.isactive)
    assert(shard0.last.datastatusid == DatasetStatus.Empty.id)
    assert(shard0.head.effthrudate.isDefined, "displaced version must close its SCD-2 window")
    assert(regRows.filter(_.label != "shard_0").forall(_.isactive))

    // the packed manifest must equal the batch-driven catalog row
    // (in09 runs the same composition with its own work dir) — stream
    // boundaries, delivery order, restart, and compaction cadence must
    // all be invisible in the output
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    val streamed = rows(CurationPipeline.packAndAudit(spark, cfg))
    val batch = rows(queries.TrainingData.in09CurationE2e.build(spark, sf))
    assert(streamed.nonEmpty && streamed.forall(_._4), s"audit must match: $streamed")
    assert(streamed == batch,
      s"stream-fed composition must equal the batch composition:\n$streamed\nvs\n$batch")
  }
}
