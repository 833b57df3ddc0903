package graft.tools

import java.nio.file.{Files, Paths}

/** Catalog-wide column-pruning audit: one session, every catalog
  * query, the DISTINCT `ReadSchema` lines of each AQE-final executed
  * plan — the durable form of [[ExplainProbe]]. A scan that reads all
  * columns for a two-column projection is wrong at 100 TB, and this is
  * the artifact that makes such a regression fail loudly instead of
  * silently: `PLANAUDIT.md` is checked in, and `--check` regenerates
  * the audit and exits nonzero on ANY drift from the committed file.
  *
  * Usage:
  *   runMain graft.tools.PlanAudit [sfDir]          # rewrite PLANAUDIT.md
  *   runMain graft.tools.PlanAudit [sfDir] --check  # diff vs committed
  *
  * ReadSchema is schema-level, so the audit is stable across driver
  * testdata regenerations (content changes; schemas don't — and a
  * schema drift SHOULD fail this check until Tables absorbs it).
  * Queries whose result frame is checkpoint-rooted (the scans ran
  * inside materialization jobs) are recorded as such explicitly.
  */
object PlanAudit {
  private val AuditPath = "/root/repo/PLANAUDIT.md"

  def render(sfDir: String): String = {
    val spark = graft.Sessions.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb ++= "# PLANAUDIT — distinct ReadSchema lines per catalog query\n\n"
    sb ++= s"Source dir: schema-stable against any GenData/driver regeneration.\n"
    sb ++= "Regenerate: `sbt \"runMain graft.tools.PlanAudit\"`; gate: append `--check`.\n"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      System.err.println(s"[planaudit] $name")
      val lines =
        try {
          val df = fn(spark, sfDir)
          df.collect() // force the AQE-final plan
          val plan = df.queryExecution.executedPlan.toString
          val rs = "ReadSchema: [^\n]*".r.findAllIn(plan).toSeq.distinct.sorted
          if (rs.nonEmpty) rs
          else Seq("(checkpoint-rooted: scans ran inside materialization jobs)")
        } catch {
          case e: Throwable => Seq(s"(failed: ${e.getClass.getSimpleName})")
        }
      sb ++= s"\n## $name\n"
      lines.foreach(l => sb ++= s"- $l\n")
      // release whatever localCheckpoint blocks the query left behind
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
    sb.result()
  }

  def main(args: Array[String]): Unit = {
    val dirArgs = args.filterNot(_.startsWith("--"))
    val sfDir =
      if (dirArgs.nonEmpty) dirArgs(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = render(sfDir)
    if (args.contains("--check")) {
      val committed =
        if (Files.exists(Paths.get(AuditPath))) Files.readString(Paths.get(AuditPath))
        else ""
      if (committed == out) println("[planaudit] OK: plans match the committed audit")
      else {
        val cs = committed.linesIterator.toSet
        out.linesIterator.filterNot(cs).take(40)
          .foreach(l => println(s"[planaudit] DRIFT: $l"))
        println("[planaudit] FAIL: executed plans drifted from PLANAUDIT.md " +
          "(rerun without --check to accept)")
        sys.exit(1)
      }
    } else {
      Files.writeString(Paths.get(AuditPath), out)
      println(s"[planaudit] wrote $AuditPath")
    }
  }
}
