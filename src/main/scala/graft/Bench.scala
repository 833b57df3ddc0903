package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry point (driver contract): runs every catalog query
  * on `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query
  * steady-state seconds.
  *
  * Methodology: each query executes twice; the reported time is the
  * second run. The first run pays one-time costs that don't exist in
  * a long-lived service or a 100 TB batch (JIT, codegen compile,
  * parquet footer reads); the second run measures the actual operator
  * pipeline. `total` is the sum of reported times.
  */
object Bench {
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

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t =
        try {
          time(fn(spark, sfDir).count()) // warmup: codegen + JIT + footers
          time(fn(spark, sfDir).count())
        } catch { case _: Throwable => -1.0 }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
