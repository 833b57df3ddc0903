package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful sessionization — the `flatMapGroupsWithState` surface
  * (extension beyond the reference, which has no event-time logic;
  * clearly labeled per SURVEY.md §2.7).
  *
  * A session closes when the gap to the next event exceeds
  * `gapSeconds`. Closed sessions are emitted; the open tail session
  * rides in [[SessionState]] across micro-batches, so an unbounded
  * stream holds O(users) state, not O(events).
  *
  * The batch-equivalent computation (lag + cumulative-sum windows) is
  * `st01_sessionize` in the query catalog, oracle-checked against
  * DuckDB; SessionizeSpec asserts the stateful streaming form agrees
  * with it.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, event_id: Long)
  final case class SessionState(
      sessionNum: Long,
      startMicros: Long,
      lastMicros: Long,
      nEvents: Long
  )
  final case class SessionOut(
      user_id: Long,
      session_num: Long,
      n_events: Long,
      start_ts: Timestamp,
      end_ts: Timestamp
  )

  private def micros(t: Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000

  /** Per-user transition function: sorts the batch's events (arrival
    * order within a micro-batch isn't time order), folds them into the
    * carried state, emits every session closed by a gap.
    */
  def onUser(
      gapSeconds: Long
  )(userId: Long, events: Iterator[Event], state: GroupState[SessionState]): Iterator[SessionOut] = {
    val gapMicros = gapSeconds * 1000000L
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var st = state.getOption.orNull
    val out = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      val m = micros(e.ts)
      st match {
        case null =>
          st = SessionState(1L, m, m, 1L)
        case s if m - s.lastMicros > gapMicros =>
          out += SessionOut(userId, s.sessionNum, s.nEvents,
            toTs(s.startMicros), toTs(s.lastMicros))
          st = SessionState(s.sessionNum + 1, m, m, 1L)
        case s =>
          // a late cross-batch event (m < lastMicros) joins the open
          // session but must NOT regress its end — otherwise the next
          // on-time event measures its gap against the regressed value
          // and splits a session the batch computation keeps together
          st = s.copy(lastMicros = math.max(s.lastMicros, m), nEvents = s.nEvents + 1)
      }
    }
    if (st != null) state.update(st)
    out.result().iterator
  }

  private def toTs(m: Long): Timestamp = {
    val t = new Timestamp(m / 1000)
    t.setNanos(((m % 1000000) * 1000).toInt)
    t
  }

  /** Wire the transition function over a (possibly streaming) event
    * frame with columns (user_id, ts, event_id).
    */
  def sessions(events: DataFrame, gapSeconds: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "ts", "event_id")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        onUser(gapSeconds))
  }

  /** Timeout-closing transition: like [[onUser]], but the open tail
    * session is ALSO emitted once the event-time watermark passes
    * `last event + gap` — an idle user's final session surfaces
    * without waiting for their next visit.
    *
    * State-size tradeoff, chosen by `dropIdleState`:
    *  - `false` (default): the timeout keeps a tombstone carrying the
    *    next session number, so numbering stays continuous when the
    *    user returns. O(1) per idle user, but the AGGREGATE state
    *    store grows with lifetime-distinct users, not active users —
    *    unbounded on a high-churn key space.
    *  - `true`: `state.remove()` on timeout — the store holds only
    *    users active within the gap+watermark horizon (bounded), at
    *    the cost that a returning user's numbering restarts at 1.
    */
  def onUserTimeout(
      gapSeconds: Long,
      dropIdleState: Boolean = false
  )(userId: Long, events: Iterator[Event], state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      if (dropIdleState) state.remove()
      else {
        // tombstone carrying the next session number; startMicros = -1
        // flags "no open session"
        state.update(SessionState(s.sessionNum + 1, -1L, s.lastMicros, 0L))
      }
      return Iterator.single(
        SessionOut(userId, s.sessionNum, s.nEvents, toTs(s.startMicros), toTs(s.lastMicros)))
    }
    val gapMicros = gapSeconds * 1000000L
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var st = state.getOption.orNull
    val out = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      val m = micros(e.ts)
      st match {
        case null =>
          st = SessionState(1L, m, m, 1L)
        case s if s.startMicros < 0 => // tombstone: open a new session
          st = SessionState(s.sessionNum, m, m, 1L)
        case s if m - s.lastMicros > gapMicros =>
          out += SessionOut(userId, s.sessionNum, s.nEvents,
            toTs(s.startMicros), toTs(s.lastMicros))
          st = SessionState(s.sessionNum + 1, m, m, 1L)
        case s =>
          st = s.copy(lastMicros = math.max(s.lastMicros, m), nEvents = s.nEvents + 1)
      }
    }
    if (st != null) {
      state.update(st)
      if (st.startMicros >= 0)
        state.setTimeoutTimestamp(st.lastMicros / 1000 + gapSeconds * 1000)
    }
    out.result().iterator
  }

  /** Streaming sessionization with event-time timeout: requires a
    * watermark on `ts` (the timeout fires when the watermark passes
    * last-event + gap). See [[onUserTimeout]] for the `dropIdleState`
    * state-size/numbering tradeoff.
    */
  def sessionsWithTimeout(
      events: DataFrame,
      gapSeconds: Long,
      watermarkDelay: String = "10 minutes",
      dropIdleState: Boolean = false
  ): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "ts", "event_id")
      .withWatermark("ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        onUserTimeout(gapSeconds, dropIdleState))
  }
}
