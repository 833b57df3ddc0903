package graft

import java.sql.DriverManager

import graft.ingest.JdbcSource

/** Round-trips a real RDBMS table through `spark.read.jdbc` using the
  * Derby engine that ships with Spark (the Hive-metastore dependency) —
  * an in-memory database, no external service.
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def seed(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE report_rows")
      catch { case _: java.sql.SQLException => () } // first run: no table
      st.execute("CREATE TABLE report_rows (id INT PRIMARY KEY, label VARCHAR(32), qty INT)")
      val ins = conn.prepareStatement("INSERT INTO report_rows VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setInt(1, i); ins.setString(2, s"row_$i"); ins.setInt(3, i * 10)
        ins.executeUpdate()
      }
      st.close(); ins.close()
    } finally conn.close()
  }

  test("JdbcSource reads a table and pushes filters into the remote query") {
    seed()
    val df = JdbcSource.read(spark, url, "report_rows")
    assert(df.count() == 100)
    assert(df.columns.map(_.toLowerCase).toSet == Set("id", "label", "qty"))
    val one = df.filter(df("ID") === 7).collect()
    assert(one.length == 1 && one.head.getAs[String]("LABEL") == "row_7")
    // filter pushdown: the JDBC scan node must carry the pushed predicate
    val planStr = df.filter(df("ID") === 7).queryExecution.executedPlan.toString
    assert(planStr.contains("PushedFilters") && planStr.contains("ID"), planStr)
  }

  test("partitioned JDBC read slices by range and preserves every row exactly once") {
    seed()
    val df = JdbcSource.readPartitioned(
      spark, url, "report_rows", "ID", lowerBound = 1, upperBound = 101, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4, "4 range slices = 4 parallel connections")
    val ids = df.collect().map(_.getAs[Int]("ID")).sorted.toSeq
    assert(ids == (1 to 100), "stride slicing must not drop or duplicate rows")
  }
}
