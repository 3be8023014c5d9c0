package graft

import graft.ext.EventsOps

/** Stateful streaming sessionization vs the batch window-function answer:
  * every emitted (closed) session must exactly match a batch session, and
  * only tail sessions (still open at end-of-input) may be withheld.
  */
class StreamingSessionsSpec extends SparkSuite {

  test("emitted streaming sessions are a prefix-correct subset of batch " +
    "sessions") {
    val streamed = graft.streaming.StatefulSessions.run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3),
        r.getLong(1), r.getDouble(4))).toSet
    val batch = EventsOps.sessionize.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(3), r.getTimestamp(4),
        r.getLong(2), r.getDouble(5))).toSet
    assert(streamed.subsetOf(batch),
      s"streamed sessions must match batch exactly; extras: " +
        s"${(streamed -- batch).take(3)}")
    // per user, at most one (the open tail) session may be missing
    val missingByUser = (batch -- streamed).groupBy(_._1)
    assert(missingByUser.values.forall(_.size <= 1),
      "only the open tail session per user may be withheld")
    assert(streamed.nonEmpty, "watermark advancement must close sessions")
  }
}
