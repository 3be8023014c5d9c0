package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Q

/** [EXT] streaming per-user EWMA — the online counterpart of
  * [[graft.ext.EventsOps.eventsEwma]]: the smoothed value stays live at
  * ingest instead of being recomputed from history. The recurrence
  * (s_i = 0.2 v_i + 0.8 s_{i-1}) is exactly the computation batch
  * engines struggle to express and streaming state carries for free:
  * per user the state is ONE double + a count + the last event time —
  * never an event buffer — so state is bounded by active users, not
  * stream length, and a user silent past the 7-day horizon is reaped by
  * event-time timeout.
  *
  * == Determinism / oracle ==
  *
  * In-group events fold in (ts, event_id) order — the same total order
  * as the batch op's sorted array — and across micro-batches the state
  * carries the running (ewma, n) forward, so the chained fold is the
  * identical IEEE chain and the final per-user value IS the batch
  * result bit-for-bit; the gate reuses the batch oracle verbatim. The
  * fixture replays in [[StreamReplay.Batches]] time-ordered
  * micro-batches; the op emits each user's running (n, ewma) once per
  * batch touching them (a live metric stream), and the sink is keyed by
  * user_id keeping the latest row — exactly how a metric store consumes
  * such a stream. Replay-equals-batch holds because no fixture user is
  * silent past the 7 d reap horizon (max per-user gap ~4.1 d at sf0.01,
  * asserted in StreamingReplaySpec); a user reaped mid-history would
  * legitimately restart their fold, which is the op's declared
  * semantics, not the oracle's.
  */
object StreamEwma {

  case class VEv(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      value: Double) {
    def tsUs: Long = {
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
  }
  case class EwmaState(ewma: Double, n: Long, lastUs: Long)
  case class EwmaRow(user_id: Long, n_events: Long, ewma: Double)

  private val HorizonUs = 7L * 24 * 3600 * 1000000L

  private def step(userId: Long, evs: Iterator[VEv],
      state: GroupState[EwmaState]): Iterator[EwmaRow] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var st = state.getOption.getOrElse(EwmaState(0.0, 0L, 0L))
    evs.toSeq.sortBy(e => (e.tsUs, e.event_id)).foreach { e =>
      st = EwmaState(
        if (st.n == 0L) e.value else 0.2 * e.value + 0.8 * st.ewma,
        st.n + 1, math.max(st.lastUs, e.tsUs))
    }
    state.update(st)
    state.setTimeoutTimestamp((st.lastUs + HorizonUs) / 1000L + 1L)
    Iterator.single(EwmaRow(userId, st.n, st.ewma))
  }

  def run(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 8) {
    import spark.implicits._
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val name = "ewma_" + UUID.randomUUID().toString.replace("-", "")
    val stream = StreamReplay.source(spark, dir, batch.schema)
    val withTs =
      if (batch.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else stream
    implicit val evEnc = Encoders.product[VEv]
    implicit val stEnc = Encoders.product[EwmaState]
    implicit val outEnc = Encoders.product[EwmaRow]
    val rows = withTs
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[VEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(step)
    val q = rows.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      StreamReplay.requireMultiBatch(q)
    } finally q.stop()
    // keyed sink: one live row per user, the latest (highest n) wins —
    // n is strictly increasing per user, so max_by is unambiguous
    spark.table(name)
      .groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"),
        max_by(col("ewma"), col("n_events")).as("ewma"))
      .orderBy("user_id")
  }

  /** Gate entry: the live running values equal the batch EWMA — the
    * SAME oracle as `ext_events_ewma`. */
  val streamEwma: Q = Q(
    "ext_stream_ewma",
    """WITH seq AS (
      |  SELECT user_id, list(CAST(value AS DOUBLE) ORDER BY ts, event_id)
      |    AS vs
      |  FROM events GROUP BY 1)
      |SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
      |  list_reduce(vs, (acc, x) -> 0.2 * x + 0.8 * acc) AS ewma
      |FROM seq ORDER BY user_id""".stripMargin
  ) { (s, d) => run(s, d) }

  def all: Seq[Q] = Seq(streamEwma)
}
