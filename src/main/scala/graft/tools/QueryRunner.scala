package graft.tools

import graft.{Sessions, SparkEntry}

/** Ad-hoc runner for any catalog query:
  * `sbt "runMain graft.tools.QueryRunner <query> [sfDir] [--plan]"`
  * Lists the catalog when called without args.
  */
object QueryRunner {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      val oracles = SparkEntry.oracleSql.keySet
      println("catalog queries (* = DuckDB-oracle-checked):")
      SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
        println(s"  ${if (oracles(n)) "*" else " "} $n")
      }
      return
    }
    val name = args(0)
    val sfDir = if (args.length > 1 && !args(1).startsWith("--")) args(1)
      else "/root/testdata/sf0.001"
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name' — run without args to list"))
    val spark = Sessions.local(8, s"graft-run-$name")
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"[$name] $n rows in ${"%.2f".format(sec)}s on $sfDir")
    df.show(20, truncate = 60)
    if (args.contains("--plan")) df.explain("formatted")
    spark.stop()
  }
}
