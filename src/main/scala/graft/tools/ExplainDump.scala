package graft.tools

/** Dump `.explain("formatted")` for catalog queries to files — the
  * optimization-round evidence trail (plans/rNN/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <q1,q2,...|all> [sfDir]
  *
  * Each query's FINAL (AQE-executed) formatted plan is written to
  * `<outDir>/<name>_<suffix>.txt`. The frame is executed first
  * (noop-style collect of the plan via count on a cloned Dataset is
  * wrong — we run the real frame) so `AdaptiveSparkPlan isFinalPlan=true`
  * and the actual join strategies / AQEShuffleRead nodes are visible.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: runMain graft.tools.ExplainDump <outDir> <suffix> <q1,q2,...|all> [sfDir]")
      sys.exit(2)
    }
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val dir =
      if (args.length > 3) args(3)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val all = graft.SparkEntry.queries
    val names =
      if (args(2) == "all") all.keys.toSeq.sorted
      else args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    names.foreach { name =>
      all.get(name) match {
        case None => System.err.println(s"[explaindump] UNKNOWN query $name")
        case Some(fn) =>
          try {
            spark.sparkContext.setJobDescription(s"explaindump: $name")
            val df = fn(spark, dir)
            df.write.format("noop").mode("overwrite").save() // finalize AQE plan
            val formatted = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              outDir.resolve(s"${name}_$suffix.txt"), formatted)
            System.err.println(s"[explaindump] wrote $name")
          } catch {
            case e: Throwable =>
              System.err.println(s"[explaindump] FAIL $name: ${e.getMessage}")
          }
          // release checkpoint blocks between queries (Bench does the same)
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
