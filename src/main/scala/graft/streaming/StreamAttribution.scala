package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.{Determinism, Q}

/** [EXT] streaming last-touch attribution — the online counterpart of
  * [[graft.ext.Attribution.lastTouch]]: as events stream in, each
  * user's state carries only their CURRENT last-touch channel; every
  * purchase is credited the moment it arrives. The batch op answers
  * "what happened"; this one keeps the attribution live at ingest.
  *
  * == State bound (the 100 TB contract) ==
  *
  * Per user: one short channel string plus the last event time — NOT an
  * event buffer. A purchase needs only the latest preceding touch, so
  * arrival-order folding (within the in-group event-time sort) is
  * sufficient. State for users silent past the attribution horizon
  * (7 days — a real campaign-credit window) is reaped by event-time
  * timeout, so state is bounded by (active users × horizon), never by
  * stream length.
  *
  * == Determinism / oracle ==
  *
  * In-group events sort by (ts, event_id) — exactly the batch window's
  * ROWS frame order — so an equal-timestamp touch counts iff its
  * event_id precedes the purchase's, matching the oracle bit-for-bit;
  * across micro-batches the carried state IS the latest touch, so the
  * fold chains exactly. Attributed purchases land in a memory sink;
  * the per-channel rollup is a batch aggregate over it (decimal-exact
  * revenue). Credits are emitted once per purchase ON ARRIVAL, so the
  * rollup is batching-invariant by construction; the fixture replays in
  * [[StreamReplay.Batches]] time-ordered micro-batches. Replay-equals-
  * batch needs no fixture user silent past the 7 d reap horizon (true:
  * max per-user gap ~4.1 d at sf0.01, asserted in StreamingReplaySpec).
  */
object StreamAttribution {

  case class AEv(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      event_type: String, channel: String, value: Double) {
    def tsUs: Long = {
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
  }
  case class TouchState(channel: String, lastUs: Long)
  case class Credit(channel: String, value: Double)

  private val HorizonUs = 7L * 24 * 3600 * 1000000L

  private def step(userId: Long, evs: Iterator[AEv],
      state: GroupState[TouchState]): Iterator[Credit] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var st = state.getOption.getOrElse(TouchState("none", 0L))
    var out = List.empty[Credit]
    evs.toSeq.sortBy(e => (e.tsUs, e.event_id)).foreach { e =>
      st = st.copy(lastUs = math.max(st.lastUs, e.tsUs))
      e.event_type match {
        // a touch with an unparseable payload has channel NULL; the
        // batch window's last(_, ignoreNulls) skips those — match it
        case "click" | "view" =>
          if (e.channel != null) st = st.copy(channel = e.channel)
        case "purchase"       => out ::= Credit(st.channel, e.value)
        case _                => ()
      }
    }
    state.update(st)
    state.setTimeoutTimestamp((st.lastUs + HorizonUs) / 1000L + 1L)
    out.reverseIterator
  }

  /** Run the live attributor over the fixture stream, then roll the
    * credited purchases up per channel. */
  def run(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 8) {
    import spark.implicits._
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val name = "attr_" + UUID.randomUUID().toString.replace("-", "")
    val stream = StreamReplay.source(spark, dir, batch.schema)
    val withTs =
      if (batch.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else stream
    implicit val evEnc = Encoders.product[AEv]
    implicit val stEnc = Encoders.product[TouchState]
    implicit val outEnc = Encoders.product[Credit]
    val credits = withTs
      .withWatermark("ts", "0 seconds")
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"),
        col("ts"),
        col("event_id"),
        col("event_type"),
        concat(lit("ch_"),
          (get_json_object(col("props"), "$.k").cast("int") % 5)
            .cast("string")).as("channel"),
        col("value"))
      .as[AEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(step)
    val q = credits.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      StreamReplay.requireMultiBatch(q)
    } finally q.stop()
    spark.table(name)
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        Determinism.dsum(col("value")).as("attributed_revenue"))
      .orderBy("channel")
  }

  /** Gate entry: the streaming credit stream rolls up to exactly the
    * batch attribution result — the SAME oracle as
    * `ext_events_attribution`. */
  val streamAttribution: Q = Q(
    "ext_stream_attribution",
    """WITH tagged AS (
      |  SELECT event_type, value,
      |    last_value(CASE WHEN event_type IN ('click','view') THEN
      |        'ch_' || CAST(CAST(json_extract_string(props, '$.k') AS INTEGER)
      |                      % 5 AS VARCHAR)
      |      END IGNORE NULLS) OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS channel
      |  FROM events)
      |SELECT COALESCE(channel, 'none') AS channel,
      |  COUNT(*) AS n_purchases,
      |  CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE)
      |    AS attributed_revenue
      |FROM tagged WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) => run(s, d) }

  val all: Seq[Q] = Seq(streamAttribution)
}
