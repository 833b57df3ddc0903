package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._

/** Per-job wall-clock profile of one catalog query: runs the query
  * (warmup + one measured run), then prints every Spark job's duration
  * and description in submission order. The tool that answers "where
  * do the seconds of a COMPOSED operator (in09-style multi-job
  * pipeline) actually go" — per-query medians can't.
  *
  * Usage: runMain graft.tools.JobProfile <queryName> [sfDir] [runs]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: JobProfile <q1,q2,...> [sfDir] [runs]"); sys.exit(2) }
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val dir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    final case class J(id: Int, desc: String, t0: Long, var t1: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    @volatile var recording = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (recording) {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.synchronized { jobs(e.jobId) = J(e.jobId, desc, e.time) }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
    })

    def clear(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warmup
      fn(spark, dir).count(); clear(); System.gc()
      (1 to runs).foreach { r =>
        jobs.synchronized(jobs.clear())
        recording = true
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        recording = false
        // listener delivery is async; give the bus a beat
        Thread.sleep(500)
        println(f"[profile] run $r: $name total $sec%.2f s ($n rows)")
        val snap = jobs.synchronized(jobs.values.toSeq)
        val total = snap.map(j => (j.t1 - j.t0).max(0L)).sum / 1000.0
        println(f"[profile] ${snap.size} jobs, sum of job wall ${total}%.2f s (gaps = driver work)")
        snap.foreach { j =>
          val d = (j.t1 - j.t0).max(0L) / 1000.0
          if (d >= 0.25) println(f"[profile]   job ${j.id}%4d ${d}%6.2f s  ${j.desc.take(140)}")
        }
        println("[profile] by description:")
        snap.groupBy(_.desc).map { case (d, js) =>
          (js.map(j => (j.t1 - j.t0).max(0L)).sum / 1000.0, js.size, d)
        }.toSeq.sortBy(-_._1).foreach { case (s, n2, d) =>
          if (s >= 0.01) println(f"[profile]   $s%6.2f s  x$n2%-3d  ${d.take(120)}")
        }
        clear()
      }
    }
    spark.stop()
  }
}
