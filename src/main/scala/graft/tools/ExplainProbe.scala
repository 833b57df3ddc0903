package graft.tools

/** Ad-hoc plan probe: prints the distinct ReadSchema lines of one
  * catalog query's executed plan — the column-pruning check.
  * Usage: runMain graft.tools.ExplainProbe <queryName> [sfDir]
  *
  * Caveat: a query whose result frame is checkpoint-rooted
  * (localCheckpoint feeds the final plan, e.g. td55/td56) shows no
  * ReadSchema here — its scans ran inside the materialization job;
  * probe the pre-checkpoint projection instead when auditing those.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.tools.ExplainProbe <queryName> [sfDir]\n" +
          "  sfDir defaults to $SPARK_GRAFT_SF_DIR, then the sf0.001 smoke dir")
      sys.exit(2)
    }
    val name = args(0)
    val dir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.Sessions.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect() // force AQE-final plan
    val plan = df.queryExecution.executedPlan.toString
    "ReadSchema: [^\n]*".r.findAllIn(plan).toSeq.distinct
      .foreach(l => println("[explain] " + l.take(220)))
    spark.stop()
  }
}
