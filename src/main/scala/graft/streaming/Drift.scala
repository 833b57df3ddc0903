package graft.streaming

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming drift monitor — the online form of the batch
  * EWMA anomaly screen (`x40_ewma_anomaly` in the query catalog).
  *
  * Input is an in-order metrics stream of (group, day, cents) daily
  * totals — the shape an upstream watermarked window aggregation emits
  * as windows close. Per group the state is ONLY the most recent ≤7
  * totals (7 longs), so an unbounded metrics stream holds O(groups)
  * state no matter how long it runs.
  *
  * The arithmetic is bit-identical to the batch screen: integer
  * power-of-two weights (64·lag1 + … + 1·lag7) keep the weighted
  * numerator and present-lag weight sum in BIGINT; the EWMA and
  * relative deviation each spend exactly one IEEE division. DriftSpec
  * asserts the streamed output equals the batch catalog rows across
  * micro-batch boundaries and a checkpoint restart.
  *
  * Out-of-order input (a day ≤ the last seen day for its group) is
  * DROPPED rather than folded in: replaying it would poison every
  * subsequent EWMA in ways the batch computation (which sorts) never
  * sees. Upstream windowed aggregation + watermark already guarantees
  * in-order emission, so drops only occur on contract violations.
  */
object Drift {

  final case class DailyTotal(event_type: String, day: Date, cents: Long)
  final case class EwmaState(lags: List[Long], lastDay: Int)
  final case class DriftOut(
      event_type: String,
      day: Date,
      actual: Double,
      ewma: Double,
      rel_dev: Double,
      anomaly: Boolean
  )

  private val weights = Array(64L, 32L, 16L, 8L, 4L, 2L, 1L)

  /** Per-group transition: sort the micro-batch's rows by day (arrival
    * order within a batch isn't guaranteed), fold each into the lag
    * state, emit one screened row per input row that has ≥1 lag.
    */
  def onGroup(relThreshold: Double)(
      group: String,
      rows: Iterator[DailyTotal],
      state: GroupState[EwmaState]
  ): Iterator[DriftOut] = {
    val sorted = rows.toSeq.sortBy(_.day.toLocalDate.toEpochDay)
    var st = state.getOption.getOrElse(EwmaState(Nil, Int.MinValue))
    val out = Seq.newBuilder[DriftOut]
    sorted.foreach { r =>
      val epochDay = r.day.toLocalDate.toEpochDay.toInt
      if (epochDay > st.lastDay) {
        if (st.lags.nonEmpty) {
          val num = st.lags.iterator.zipWithIndex
            .map { case (c, i) => c * weights(i) }.sum
          val den = weights.take(st.lags.length).sum
          // A zero EWMA (every present lag exactly 0 cents) has no
          // defined relative deviation — emit nothing rather than
          // Infinity/NaN, matching the x40 catalog row's num <> 0
          // filter so stream/batch/oracle stay bit-equal.
          if (num != 0L) {
            val ewmaC = num.toDouble / den
            val relDev = (r.cents.toDouble - ewmaC) / ewmaC
            out += DriftOut(group, r.day, r.cents.toDouble / 100.0,
              ewmaC / 100.0, relDev, math.abs(relDev) > relThreshold)
          }
        }
        st = EwmaState((r.cents :: st.lags).take(7), epochDay)
      }
      // else: late/duplicate day — dropped (see scaladoc)
    }
    state.update(st)
    out.result().iterator
  }

  /** Wire the monitor over a (possibly streaming) daily-totals frame
    * with columns (event_type, day, cents).
    */
  def ewmaStream(dailyTotals: DataFrame, relThreshold: Double = 0.25): Dataset[DriftOut] = {
    val spark = dailyTotals.sparkSession
    import spark.implicits._
    dailyTotals
      .selectExpr("event_type", "day", "cents")
      .as[DailyTotal]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        onGroup(relThreshold))
  }
}
