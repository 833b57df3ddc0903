package graft

import graft.queries.{Tables, TrainingData}
import graft.streaming.Sessionize

/** The stateful streaming sessionizer must agree with the batch
  * window-function query (st01): every session the stream CLOSES
  * matches a batch session exactly; the only divergence allowed is
  * each user's final (still-open) session, which the stream keeps in
  * state awaiting more events.
  */
class SessionizeSpec extends SparkSpec {

  test("flatMapGroupsWithState sessions match the batch window computation") {
    val sf = "/root/testdata/sf0.001"
    val events = Tables(spark, sf).events

    val batch = TrainingData.st01Sessionize.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4)))
      .toMap

    val streamed = Sessionize.sessions(events, gapSeconds = 1800).collect()
      .map(s => (s.user_id, s.session_num) -> (s.n_events, s.start_ts, s.end_ts))
      .toMap

    // batch sessions = streamed closed sessions + one open tail per user
    val lastPerUser = batch.keySet.groupBy(_._1).map { case (u, ks) => u -> ks.map(_._2).max }
    val expectedClosed = batch.filter { case ((u, n), _) => n < lastPerUser(u) }
    assert(streamed == expectedClosed,
      s"streamed=${streamed.size} expectedClosed=${expectedClosed.size}")
    assert(streamed.nonEmpty, "fixture should close at least one session")
  }
}
