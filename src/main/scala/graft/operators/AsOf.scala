package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the single most recent
  * right row with `rightTime <= leftTime` (optionally within a
  * tolerance), per equi-key — the time-series join behind the
  * reference's correlated "most recent business day ≤ d" lookup
  * (create_f_get_event_changes.sql:17-22) and every
  * last-known-value/attribution query.
  *
  * Spark-first implementation (SURVEY §7.3 preference (a) — compose
  * built-ins): tag and UNION the two sides, ONE shuffle on the keys,
  * sort within partitions by (time, side), and carry the latest right
  * payload forward with `last(_, ignoreNulls)`. Equal timestamps
  * match (right sorts before left at the same instant). This is
  * exactly the plan a custom SparkPlan would produce (sort-merge
  * within key partitions) with none of the planner surface.
  *
  * Scale: cost = one hash shuffle of both sides + an in-partition
  * sort — same profile as any windowed aggregation; no broadcast, no
  * per-row subquery.
  */
object AsOf {

  /** @param left       probe side
    * @param right      reference side (its columns are returned
    *                   null-filled when no match)
    * @param on         equi-keys present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param tolerance  max allowed `leftTime - rightTime`; None = any
    * @param rightCols  right columns to carry (default: all except
    *                   keys and time)
    */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Column] = None,
      rightCols: Seq[String] = Seq.empty
  ): DataFrame = {
    val carry =
      if (rightCols.nonEmpty) rightCols
      else right.columns.filterNot(c => on.contains(c) || c == rightTime).toSeq
    val t = "__asof_t"
    val side = "__asof_side" // 0 = right, 1 = left → right wins ties
    val payload = "__asof_payload"
    val leftCols = left.columns.toSeq

    val taggedRight = right.select(
      on.map(col) ++ Seq(
        col(rightTime).as(t),
        lit(0).as(side),
        struct(col(rightTime).as("__rt") +: carry.map(col): _*).as(payload)
      ) ++ leftCols.filterNot(on.contains).map(c => lit(null).as(c)): _*
    ).select((on ++ Seq(t, side, payload) ++ leftCols.filterNot(on.contains)).map(col): _*)

    val taggedLeft = left.select(
      on.map(col) ++ Seq(
        col(leftTime).as(t),
        lit(1).as(side),
        lit(null).cast(taggedRight.schema(payload).dataType).as(payload)
      ) ++ leftCols.filterNot(on.contains).map(col): _*
    )

    // payload as the final sort key: deterministic pick when several
    // right rows share (key, time) — without it, last() grabs
    // whichever row the partition sort happened to place later
    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy(col(t).asc, col(side).asc, col(payload).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    val anyKeyNull = on.map(col(_).isNull).reduce(_ || _)
    val matched = taggedRight
      .unionByName(taggedLeft)
      .withColumn("__asof_match", last(col(payload), ignoreNulls = true).over(w))
      // SQL equi-join semantics: NULL keys never match — the window
      // partitioner groups null keys together (GROUP BY semantics), so
      // void any match picked up inside the null-key partition
      .withColumn("__asof_match", when(anyKeyNull, lit(null)).otherwise(col("__asof_match")))
      .filter(col(side) === 1)

    val withinTol = tolerance match {
      case Some(tol) =>
        matched.withColumn(
          "__asof_match",
          when(
            col("__asof_match").isNotNull &&
              col(t).cast("long") - col("__asof_match.__rt").cast("long") <= tol.cast("long"),
            col("__asof_match")
          ).otherwise(lit(null))
        )
      case None => matched
    }

    withinTol.select(
      leftCols.map(col) ++
        Seq(col(s"__asof_match.__rt").as(s"asof_$rightTime")) ++
        carry.map(c => col(s"__asof_match.$c").as(c)): _*
    )
  }
}
