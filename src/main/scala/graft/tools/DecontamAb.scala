package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.CurationPipeline
import graft.queries.Tables

/** A/B isolation of the composed pipeline's fuzzy-decontam stage cost
  * (r11 VERDICT item 4): run the in09 delivery sequence (shards 0, 1,
  * 2, then the shard-0 re-delivery) twice per measured run — once with
  * `decontamEval` unset, once with the td54/dd20 `doc_id % 10 = 7`
  * eval split — in the SAME session on the SAME staged landing zone,
  * and report both medians. The difference is the decontam stage's
  * real cost; everything else (host, page cache, JIT) is shared, which
  * is what the r11 closing bench's 18.2 → 70.7 s reading could not
  * separate.
  *
  *   sbt "runMain graft.tools.DecontamAb [sfDir] [runs]"
  */
object DecontamAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/.tmp/sf1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)

    val landing = java.nio.file.Files.createTempDirectory("graft-ab-landing").toString
    val docs = t.documents.withColumn("shard", col("doc_id") % 3)
    (0L to 2L).foreach { s =>
      docs.filter(col("shard") === s).drop("shard")
        .coalesce(1).write.mode("overwrite").json(s"$landing/shard_$s")
    }
    val evalSuite = t.documents.filter(col("doc_id") % 10 === 7)

    def clearPersisted(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }

    def once(decontam: Boolean): Double = {
      clearPersisted()
      val work = java.nio.file.Files.createTempDirectory("graft-ab-work").toString
      val cfg = CurationPipeline.Config(work, java.sql.Date.valueOf("2026-01-01"),
        decontamEval = if (decontam) Some(evalSuite) else None)
      val reg = new graft.registry.DatasetRegistry(spark, cfg.registryPath)
      val t0 = System.nanoTime()
      Seq(0, 1, 2, 0).foreach { s =>
        val batch = spark.read.schema(t.documents.schema).json(s"$landing/shard_$s")
        CurationPipeline.processDelivery(batch, s"shard_$s", reg, cfg)
      }
      CurationPipeline.packAndAudit(spark, cfg).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val fs = new org.apache.hadoop.fs.Path(work)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(work), true)
      dt
    }

    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    once(decontam = false) // warmup: JIT + parquet footers + landing page cache
    // interleave A/B so host drift hits both arms equally
    val (off, on) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
    (1 to runs).foreach { r =>
      val a = once(decontam = false); off += a
      val b = once(decontam = true); on += b
      System.err.println(f"[ab] run $r: off $a%.2f s, on $b%.2f s")
    }
    val (mo, mn) = (med(off.result()), med(on.result()))
    def f(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"in09_decontam_ab","sf":"$sfDir","runs":$runs,""" +
      s""""off_median":${f(mo)},"on_median":${f(mn)},"delta":${f(mn - mo)},""" +
      s""""off":[${off.result().map(f).mkString(",")}],"on":[${on.result().map(f).mkString(",")}]}""")
    spark.stop()
  }
}
