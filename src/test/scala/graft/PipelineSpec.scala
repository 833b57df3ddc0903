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
      maxIndexFiles = 2L, // fire the Q33 compaction trigger on every append
      decontamEval = Some(docs.filter(col("doc_id") % 10 === 7))) // in09's eval split
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

  test("sf1: stream-fed composition killed MID-STREAM equals the batch composition") {
    // the round-8 E2E evidence ran stream-fed at fixture scale and
    // batch-fed at sf1; this closes the gap — the SAME AvailableNow
    // composition at the sf1 notch, with a crash injected AFTER the
    // third delivery fully processed but BEFORE its micro-batch
    // committed to the checkpoint, so the restart RE-DELIVERS it and
    // the content-distinct pack must absorb the at-least-once replay.
    val sf1 = "/root/repo/.tmp/sf1"
    assume(new java.io.File(s"$sf1/documents.parquet").exists
      || new java.io.File(s"$sf1/documents.parquet/_SUCCESS").exists,
      "sf1 notch not generated (runMain graft.tools.GenData)")
    val t0 = System.nanoTime()
    val root = Files.createTempDirectory("graft-pipe-sf1")
    val landing = Files.createDirectory(root.resolve("landing")).toString
    val docs = Tables(spark, sf1).documents

    def stage(shard: Long, name: String): Unit = {
      val tmp = s"$root/stage_$name"
      docs.filter(col("doc_id") % 3 === shard)
        .coalesce(1).write.mode("overwrite").json(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".json")).get
      Files.copy(part.toPath, Paths.get(landing, s"$name.json"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // full backlog staged up front, in delivery order (mod time)
    stage(0, "d1_shard0"); stage(1, "d2_shard1")
    stage(2, "d3_shard2"); stage(0, "d4_shard0_again")

    val cfg = CurationPipeline.Config(s"$root/work", crashDate,
      decontamEval = Some(docs.filter(col("doc_id") % 10 === 7))) // in09's eval split
    val reg = new DatasetRegistry(spark, cfg.registryPath)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[CurationPipeline.DeliveryResult]
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)

    def drain(crashAfter: Int): Unit = {
      var n = 0
      val src = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).json(landing)
      try StreamingIngest.runAvailableNow(src, s"$root/ckpt", (df, _) => {
        val batch = df.localCheckpoint()
        if (batch.count() > 0) {
          val shard = batch.select(pmod(min(col("doc_id")), lit(3L))).head.getLong(0)
          results.add(CurationPipeline.processDelivery(batch, s"shard_$shard", reg, cfg))
          n += 1
          if (n == crashAfter)
            throw new RuntimeException("injected mid-stream crash")
        }
      }) catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          val chain = Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null)
            .map(c => Option(c.getMessage).getOrElse("")).mkString("|")
          if (chain.contains("injected mid-stream crash")) crashed.set(true)
          else throw e
      }
    }

    drain(crashAfter = 3) // dies with delivery 3 done but uncommitted
    assert(crashed.get, "the injected crash must surface as a stream failure")
    drain(crashAfter = Int.MaxValue) // restart: replays d3, then d4

    val rs = results.toArray(Array.empty[CurationPipeline.DeliveryResult]).toSeq
    assert(rs.size == 5, s"3 + replayed d3 + d4 = 5 processed deliveries, got: $rs")
    val shard2 = rs.filter(_.label == "shard_2")
    assert(shard2.size == 2 && shard2.map(_.nFresh).count(_ == 0L) == 1,
      s"the replayed delivery must die in the fingerprint index: $shard2")
    assert(rs.filter(_.label == "shard_0").map(_.nFresh).count(_ == 0L) == 1,
      "the staged re-delivery must also be fully dropped")

    // the packed manifest must be BIT-equal to the batch catalog row at
    // the same scale — crash, replay, and stream boundaries invisible
    val streamed = manifestRows(CurationPipeline.packAndAudit(spark, cfg))
    val batch = manifestRows(queries.TrainingData.in09CurationE2e.build(spark, sf1))
    assert(streamed.nonEmpty && streamed.forall(_._4), s"audit must match: $streamed")
    assert(streamed == batch,
      "sf1 stream-fed composition with a mid-stream kill must equal the batch composition")
    info(f"sf1 stream E2E with mid-stream kill: ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }

  // ── crash-recovery contract (processDelivery's write ordering) ────

  private val crashDate = java.sql.Date.valueOf("2026-01-01")

  private def docsOf(sf: String) =
    Tables(spark, sf).documents.localCheckpoint()

  private def shardOf(docs: org.apache.spark.sql.DataFrame, s: Long) =
    docs.filter(pmod(col("doc_id"), lit(3L)) === s)

  private def manifestRows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq

  /** Crash-free 3-delivery run; returns (manifest, per-delivery results). */
  private def crashFreeRun(docs: org.apache.spark.sql.DataFrame, work: String) = {
    val cfg = CurationPipeline.Config(work, crashDate)
    val reg = new DatasetRegistry(spark, cfg.registryPath)
    val rs = (0L to 2L).map(s =>
      CurationPipeline.processDelivery(shardOf(docs, s), s"shard_$s", reg, cfg))
    (manifestRows(CurationPipeline.packAndAudit(spark, cfg)), rs, cfg)
  }

  test("crash between curated append and index appends: re-delivery reproduces the crash-free manifest") {
    val docs = docsOf("/root/testdata/sf0.001")
    val root = Files.createTempDirectory("graft-crashA")
    val (baseline, baseRs, _) = crashFreeRun(docs, s"$root/base")

    val cfg = CurationPipeline.Config(s"$root/work", crashDate)
    val reg = new DatasetRegistry(spark, cfg.registryPath)
    CurationPipeline.processDelivery(shardOf(docs, 0), "shard_0", reg, cfg)
    val fpBefore = spark.read.parquet(cfg.fingerprintPath).count()

    // delivery 1 dies AFTER the curated store received the survivors
    // but BEFORE either index learned them — the exact interleaving the
    // sink-first ordering exists for
    val (kept1, _) = operators.TextAnalysis.qualityFilter(
      shardOf(docs, 1), col("text"), cfg.thresholds)
    val crashedId = reg.insert(crashDate, "shard_1", 1, 1)
    intercept[RuntimeException] {
      operators.Dedup.ingestBatch(kept1, "doc_id", "text",
        cfg.lshPath, cfg.fingerprintPath,
        threshold = cfg.nearDupThreshold, maxFiles = cfg.maxIndexFiles,
        freshSink = { fresh =>
          fresh.select(col("doc_id"), col("text"), col("source"))
            .withColumn("datasetid", lit(crashedId))
            .write.mode("append").parquet(cfg.curatedPath)
          throw new RuntimeException("simulated crash before the index appends")
        })
    }
    assert(spark.read.parquet(cfg.fingerprintPath).count() == fpBefore,
      "the aborted delivery must not have reached the fingerprint index")

    // plain re-delivery, then the rest of the feed
    val r1 = CurationPipeline.processDelivery(shardOf(docs, 1), "shard_1", reg, cfg)
    assert(r1.nFresh == baseRs(1).nFresh,
      "the retry must re-ingest the full batch (the index never saw it)")
    val r2 = CurationPipeline.processDelivery(shardOf(docs, 2), "shard_2", reg, cfg)
    assert(r2.nNearDupCandidates == baseRs(2).nNearDupCandidates,
      "later deliveries must see the same candidate report as crash-free")

    val got = manifestRows(CurationPipeline.packAndAudit(spark, cfg))
    assert(got.forall(_._4) && got == baseline,
      s"crash + re-delivery must reproduce the crash-free manifest:\n$got\nvs\n$baseline")

    // registry: the crashed version is displaced, the retry is active
    val shard1 = reg.load().collect().filter(_.label == "shard_1").sortBy(_.datasetid)
    assert(shard1.length == 2 && !shard1.head.isactive && shard1.last.isactive)
  }

  test("crash between LSH append and fingerprint append: duplicate index rows stay invisible and compaction removes them") {
    val docs = docsOf("/root/testdata/sf0.001")
    val root = Files.createTempDirectory("graft-crashB")
    val (baseline, baseRs, _) = crashFreeRun(docs, s"$root/base")

    // auto-compaction disabled: the window between the crash artifact
    // and the next compaction is exactly what this test exercises
    val cfg = CurationPipeline.Config(s"$root/work", crashDate,
      maxIndexFiles = 1000000L)
    val reg = new DatasetRegistry(spark, cfg.registryPath)
    CurationPipeline.processDelivery(shardOf(docs, 0), "shard_0", reg, cfg)

    // delivery 1 dies after curated append AND LSH append, before the
    // fingerprint append — replayed with the same pieces processDelivery
    // composes, stopping where the crash point sits
    val (kept1, _) = operators.TextAnalysis.qualityFilter(
      shardOf(docs, 1), col("text"), cfg.thresholds)
    val crashedId = reg.insert(crashDate, "shard_1", 1, 1)
    val fresh1 = operators.Dedup.dropKnownExact(
      operators.Dedup.exactDedup(kept1, "doc_id", Seq("text")),
      Seq("text"), cfg.fingerprintPath).localCheckpoint()
    fresh1.select(col("doc_id"), col("text"), col("source"))
      .withColumn("datasetid", lit(crashedId))
      .write.mode("append").parquet(cfg.curatedPath)
    operators.Dedup.writeLshIndex(fresh1, "doc_id", "text", cfg.lshPath, mode = "append")

    // plain re-delivery: the fingerprint index never learned the batch,
    // so every row re-ingests and the LSH/curated rows go in TWICE
    val r1 = CurationPipeline.processDelivery(shardOf(docs, 1), "shard_1", reg, cfg)
    assert(r1.nFresh == baseRs(1).nFresh)
    val sigs = spark.read.parquet(s"${cfg.lshPath}/sigs")
    assert(sigs.count() > sigs.distinct().count(),
      "precondition: the retry must have left physically duplicated sig rows")

    // the duplicates must be invisible to later probes…
    val r2 = CurationPipeline.processDelivery(shardOf(docs, 2), "shard_2", reg, cfg)
    assert(r2.nNearDupCandidates == baseRs(2).nNearDupCandidates,
      "duplicated index rows must not double-report candidates")
    // …and to the packed output
    val got = manifestRows(CurationPipeline.packAndAudit(spark, cfg))
    assert(got.forall(_._4) && got == baseline,
      s"crash + re-delivery must reproduce the crash-free manifest:\n$got\nvs\n$baseline")

    // compaction physically removes the crash artifacts
    operators.Dedup.compactLshIndex(spark, cfg.lshPath)
    val after = spark.read.parquet(s"${cfg.lshPath}/sigs")
    assert(after.count() == after.distinct().count(),
      "compaction must collapse the duplicated rows")
  }
}
