package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings this engine assumes everywhere:
  * UTC timestamps (oracle parity), shuffle partitions sized for the
  * local[32] harness (not the 200 default meant for real clusters),
  * AQE on so skewed joins/aggregations re-plan at runtime.
  *
  * On a real cluster the same builder is used minus `master`; shuffle
  * partitions then come from AQE coalescing
  * (`spark.sql.adaptive.coalescePartitions.enabled`).
  */
object Sessions {
  def local(cores: Int = 32, app: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
