package graft.tools

/** Row count of one catalog query at a given SF dir — the cheap
  * answer-set-size probe used when deciding scale-campaign inclusion
  * (an operator whose ANSWER grows super-linearly needs no plan fix).
  * Usage: runMain graft.tools.CountQuery <queryName> [sfDir]
  */
object CountQuery {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: runMain graft.tools.CountQuery <queryName> [sfDir]")
      sys.exit(2)
    }
    val dir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(args(0))(spark, dir).count()
    println(f"[count] ${args(0)} @ $dir: $n rows (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    spark.stop()
  }
}
