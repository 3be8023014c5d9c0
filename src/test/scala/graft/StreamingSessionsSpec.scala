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

  test("state census predicts the real keyed state: the running query's " +
    "final numRowsTotal equals the census's open_state_keys") {
    val (_, stateRows) =
      graft.streaming.StatefulSessions.runCounting(spark, sf)
    assert(stateRows >= 0, "query reported no state-operator progress")
    val census = graft.streaming.StreamStateCensus.census(spark, sf)
      .collect()(0)
    val open = census.getAs[Long]("open_state_keys")
    assert(stateRows == open,
      s"census open_state_keys=$open but the real state store held " +
        s"$stateRows rows — the §7.5b sizing row would mis-size")
    // the census's traffic signals are internally consistent
    assert(census.getAs[Long]("n_rows") >= census.getAs[Long]("max_cnt"))
    assert(census.getAs[Long]("skew_ratio_ppm") >= 1000000L,
      "max/avg ppm is >= 1x by construction")
    assert(open <= census.getAs[Long]("n_keys"))
  }
}
