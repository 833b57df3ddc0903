package graft

import java.util.concurrent.{Executors, TimeUnit, TimeoutException}

import org.apache.spark.sql.SparkSession

/** Benchmark entry point (driver contract): runs every catalog query
  * on `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query
  * steady-state seconds.
  *
  * Methodology: each query executes one warmup plus
  * `SPARK_GRAFT_BENCH_RUNS` (default 5) measured runs, reporting the
  * MEDIAN. The warmup pays one-time costs that don't exist in a
  * long-lived service or a 100 TB batch (JIT, codegen compile,
  * parquet footer reads); the median is robust to the scheduler/GC
  * spikes a shared container adds (±15% observed on identical code,
  * with rare 3× outliers that a min-of-few still lets through in
  * EITHER direction). `total` is the sum of medians.
  *
  * Between queries every leftover persisted RDD is dropped: several
  * operators `localCheckpoint()` intermediates, and 100+ queries × N
  * runs of retained checkpoint blocks otherwise build memory pressure
  * that taxes whichever queries happen to run LAST (the round-3
  * x01–x05 "regression" — late alphabetical names, untouched code).
  *
  * Each query runs under a cancellable job group with a hard timeout,
  * so one pathological plan cannot stall the whole bench (-1 marks a
  * timeout/failure).
  */
object Bench {
  private val TimeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "180").toLong
  private val Runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt

  /** Median of the valid (≥0) times; -1 if every run failed. */
  private def median(xs: Seq[Double]): Double = {
    val ok = xs.filter(_ >= 0).sorted
    if (ok.isEmpty) -1.0
    else if (ok.size % 2 == 1) ok(ok.size / 2)
    else (ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pool = Executors.newCachedThreadPool()

    /** Run `fn` in a cancellable job group; seconds, or -1 on
      * timeout/failure.
      */
    def guarded(name: String)(fn: => Unit): Double = {
      val fut = pool.submit(new java.util.concurrent.Callable[Double] {
        def call(): Double = {
          // job group is thread-local: set it in the executing thread
          spark.sparkContext.setJobGroup(s"bench-$name", name, interruptOnCancel = true)
          val t0 = System.nanoTime()
          fn
          (System.nanoTime() - t0) / 1e9
        }
      })
      try fut.get(TimeoutSec, TimeUnit.SECONDS)
      catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(s"bench-$name")
          fut.cancel(true)
          -1.0
        case _: Throwable => -1.0
      }
    }

    /** Drop leftover localCheckpoint blocks so state can't accumulate
      * across queries and runs.
      */
    def clearPersisted(): Unit = {
      // blocking: async unpersist lags behind checkpoint-heavy queries
      // (x27 creates ~6 checkpoint RDDs per run) and the backlog bleeds
      // GC pressure into the NEXT measured run
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
    }

    // SPARK_GRAFT_ONLY=q1,q2 narrows the run for targeted timing
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }

    val results = selected.map { case (name, fn) =>
      guarded(name)(fn(spark, sfDir).count()) // warmup: codegen + JIT + footers
      val times = (1 to Runs).map { _ =>
        clearPersisted()
        guarded(name)(fn(spark, sfDir).count())
      }
      clearPersisted()
      name -> times
    }
    def f(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, ts) => "\"" + k + "\":" + f(median(ts)) }
      .mkString("{", ",", "}")
    // per-query spread: a median alone can't distinguish container
    // noise (±15% observed, rare 3× spikes) from a real regression —
    // publish {median,min,max} over the measured runs so round-over-
    // round comparisons can see the run-to-run envelope
    val spread = results.map { case (k, ts) =>
      val ok = ts.filter(_ >= 0)
      val (mn, mx) = if (ok.isEmpty) (-1.0, -1.0) else (ok.min, ok.max)
      "\"" + k + "\":{\"median\":" + f(median(ts)) + ",\"min\":" + f(mn) +
        ",\"max\":" + f(mx) + "}"
    }.mkString("{", ",", "}")
    val total = results.map { case (_, ts) => median(ts) }.filter(_ >= 0).sum
    pool.shutdownNow()
    // stop (and silence) Spark BEFORE printing: the JSON must be the
    // LAST line of output — a driver that parses the tail line must
    // not see executor-shutdown chatter (or sbt's [success] banner,
    // suppressed via showSuccess := false) after it
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"spread":$spread,"runs":$Runs,"sf":"$sfDir"}""")
  }
}
