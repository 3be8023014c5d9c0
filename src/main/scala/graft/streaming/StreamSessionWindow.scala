package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Q

/** [EXT] DECLARATIVE streaming sessionization — Spark's built-in
  * `session_window` aggregate, the catalyst-native counterpart of the
  * custom-state [[StatefulSessions]] (`flatMapGroupsWithState`). Both
  * ship because they are different engine surfaces with the same
  * semantics: the built-in window lets Catalyst own state layout,
  * merging, and eviction (sessions that arrive as fragments in
  * different micro-batches are MERGED by the state store when a
  * bridging event closes the gap), while the custom operator is the
  * escape hatch for logic `session_window` cannot express (the
  * funnel's step bounds, EWMA's order-sensitive fold).
  *
  * Semantics: a session window is `[first event, last event + gap)` —
  * note the gap-extended END, which is how the built-in differs
  * observably from [[StatefulSessions]]' last-event `t_end`. Append
  * mode emits a window once the watermark passes its end; under the
  * [[StreamReplay]] 3-batch replay, early sessions flush between data
  * batches and the rest in the trailing no-data batch. The gate
  * compares exactly the emitted (closed) set: the oracle recomputes
  * every gap-split session from the batch fixture and keeps those
  * whose gap-extended end is at-or-below the final watermark (max
  * event time, 0 s delay).
  *
  * Scale shape: state is one (user, window) row per OPEN session —
  * bounded by active users x active sessions, reaped by the watermark;
  * the aggregate is hash-partitioned on user_id and the money column
  * rides as exact cents (`Determinism` money rule), emitted as a
  * double only at the output boundary.
  */
object StreamSessionWindow {

  def run(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 8) {
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val name = "sesswin_" + UUID.randomUUID().toString.replace("-", "")
    val stream = StreamReplay.source(spark, dir, batch.schema)
    val withTs =
      if (batch.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else stream
    val agg = withTs
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value").cast("decimal(10,2)") * 100).cast("long"))
          .as("cents"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      StreamReplay.requireMultiBatch(q)
    } finally q.stop()
    spark.table(name)
      .select(col("user_id"),
        col("session_window.start").as("t_start"),
        col("session_window.end").as("t_end_gap"),
        col("n_events"),
        (col("cents") / 100.0).as("total"))
      .orderBy("user_id", "t_start")
  }

  /** Gate entry: the emitted set is the batch gap-split sessions whose
    * gap-extended end the final watermark passed. */
  val streamSessionWindow: Q = Q(
    "ext_stream_session_window",
    """WITH numbered AS (
      |  SELECT user_id, ts, event_id, value,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_seq
      |  FROM (
      |    SELECT user_id, ts, event_id, value,
      |      CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
      |        (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
      |        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |          IS NULL
      |      THEN 1 ELSE 0 END AS is_new
      |    FROM events) flagged),
      |sess AS (
      |  SELECT user_id, COUNT(*) AS n_events,
      |    MIN(ts) AS t_start,
      |    MAX(ts) + INTERVAL 30 MINUTE AS t_end_gap,
      |    SUM(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)) / 100.0
      |      AS total
      |  FROM numbered GROUP BY user_id, session_seq),
      |wm AS (SELECT MAX(ts) AS mt FROM events)
      |SELECT user_id, t_start, t_end_gap, n_events, total
      |FROM sess, wm WHERE t_end_gap <= mt
      |ORDER BY user_id, t_start""".stripMargin
  )(run _)

  val all: Seq[Q] = Seq(streamSessionWindow)
}
