package graft.tools

/** Times catalog queries under different autoBroadcastJoinThreshold
  * values — the attribution probe for plan flips when session config
  * moves. Usage: runMain graft.tools.ThresholdProbe <sfDir> <q1,q2,...>
  */
object ThresholdProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val spark = graft.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      run(n) // warmup
      Seq(10L * 1024 * 1024, 64L * 1024 * 1024).foreach { thr =>
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        val ts = (1 to 3).map(_ => run(n))
        println(f"[thr] $n%-24s thr=${thr >> 20}%3dMB median=${ts.sorted.apply(1)}%6.2f s  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
