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

  /** Builder pre-configured for a real cluster run against ~100 TB.
    * No `master` — spark-submit supplies it. Differences from the
    * local harness are the knobs that only matter at scale:
    * AQE coalescing + skew-join splitting sized by
    * `advisoryPartitionSizeInBytes`, CBO fed by `ANALYZE TABLE`
    * (ops.Maintenance.analyze), dynamic partition pruning for the
    * registry→fact semi-joins, and 128 MB scan partitions.
    */
  /** The scale knobs [[clusterBuilder]] applies, as data — exposed so
    * ClusterConfigSpec can apply the SQL-conf subset to an isolated
    * session (a `SparkSession.Builder` cannot be introspected) and
    * prove the mechanisms each knob enables actually fire.
    */
  val clusterConfigs: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> (128 * 1024 * 1024).toString,
    "spark.sql.files.maxPartitionBytes" -> (128 * 1024 * 1024).toString,
    "spark.sql.cbo.enabled" -> "true",
    "spark.sql.cbo.joinReorder.enabled" -> "true",
    "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.shuffle.partitions" -> "2000" // AQE coalesces down
  )

  def clusterBuilder(app: String = "graft"): SparkSession.Builder =
    clusterConfigs
      .foldLeft(SparkSession.builder().appName(app)) { case (b, (k, v)) => b.config(k, v) }
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")

  /** Shuffle width for local surfaces: the core count (right for the
    * sf0.1 harness) unless SPARK_GRAFT_SHUFFLE_PARTITIONS overrides
    * it for larger local notches. Shared by [[local]] and Bench so
    * the knob cannot drift between the two session builders.
    */
  def shuffleWidth(default: String): String =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", default)

  def local(cores: Int = 32, app: String = "graft"): SparkSession = {
    val shuffle = shuffleWidth(cores.toString)
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
