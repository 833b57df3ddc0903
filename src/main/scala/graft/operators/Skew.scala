package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot-key joins and aggregations.
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`, on in [[graft.Sessions]])
  * already splits skewed shuffle partitions at runtime; these helpers
  * cover the cases AQE can't fix — a single key so hot that ONE task
  * still owns it after splitting (AQE splits partitions, not keys).
  *
  *  - [[saltedJoin]]: replicate the small side `salt` ways, scatter the
  *    big side's hot keys across the replicas, join on (key, salt).
  *  - [[twoPhaseAgg]]: pre-aggregate on (key, salt) map-side-style,
  *    then final-aggregate on key — the manual form of partial
  *    aggregation for aggregates Spark can't partialize (e.g.
  *    collect_list with post-processing).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salting the big side into
    * `salt` buckets and replicating the small side accordingly. Result
    * equals the plain join; the hot key's rows spread over `salt`
    * tasks.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salt: Int,
      joinType: String = "inner"
  ): DataFrame = {
    // right/full outer would see each small-side replica as its own
    // row: unmatched replicas surface as spurious null-padded output
    require(
      Set("inner", "left", "left_outer", "left_semi", "left_anti").contains(joinType),
      s"saltedJoin supports big-side-preserving join types only, got '$joinType'")
    val spark = small.sparkSession
    val saltCol = "__graft_salt"
    val b = big.withColumn(saltCol, pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val salts = spark.range(0, salt).select(col("id").cast("int").as(saltCol))
    val s = small.crossJoin(broadcast(salts))
    // the salted join is BY DECLARATION a shuffle join: a caller salts
    // precisely because the dim is not broadcastable (otherwise a
    // broadcast join would dodge the skew outright), and the salt
    // replication must spread the hot key across tasks — letting the
    // planner broadcast the x-salt replicated small side (measured at
    // sf1 when its estimate slipped under the session threshold:
    // 1.8 s -> 5.0 s building a 12M-row broadcast) defeats both.
    b.join(s.hint("shuffle_hash"), Seq(key, saltCol), joinType).drop(saltCol)
  }

  /** Two-phase aggregation: `agg` runs per (key, salt-bucket), then
    * `merge` combines buckets per key. Caller guarantees
    * merge(agg(x), agg(y)) == agg(x ++ y) (associativity).
    */
  def twoPhaseAgg(
      df: DataFrame,
      key: String,
      salt: Int,
      agg: Seq[Column],
      merge: Seq[Column]
  ): DataFrame = {
    val saltCol = "__graft_salt"
    df.withColumn(saltCol, pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
      .groupBy(col(key), col(saltCol))
      .agg(agg.head, agg.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
  }
}
