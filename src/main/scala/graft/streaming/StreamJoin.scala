package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] stream-stream interval join (SURVEY §2.9): each purchase joined
  * to the same user's clicks in the preceding hour, computed by TWO
  * watermarked streams joined with a time-range condition — the canonical
  * Structured Streaming stream-stream inner join. The batch oracle is the
  * same join expressed in SQL; streaming and batch answers must agree.
  *
  * Scale shape: both sides shuffle on user_id (the equality key); the
  * range condition bounds each side's state to the watermark horizon, so
  * state size is (events/hour x horizon), independent of stream length —
  * exactly the property that lets this run forever on a 100 TB/day
  * firehose. Watermarks make eviction safe: a click older than the delay
  * below any future purchase's window can never match again and is
  * dropped from the state store.
  */
object StreamJoin {

  def purchaseClicks(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 4) {
    // multi-batch replay (StreamReplay): the time-ordered split keeps the
    // batch oracle exact because a click is only evicted once the
    // purchase-side watermark passes c_ts + 1 h, and every later-batch
    // purchase sorts at-or-after that watermark frontier — so join state
    // is genuinely filled, matched, and evicted ACROSS micro-batches
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val name = "stream_join_" + UUID.randomUUID().toString.replace("-", "")
    def side(typ: String, idAs: String, tsAs: String) = {
      val stream = StreamReplay.source(spark, dir, batch.schema)
      val withTs =
        if (batch.schema("ts").dataType ==
            org.apache.spark.sql.types.LongType)
          stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else stream
      withTs.filter(col("event_type") === typ)
        .select(col("user_id").as(s"${idAs}_user"),
          col("event_id").as(idAs), col("ts").as(tsAs))
        .withWatermark(tsAs, "2 hours")
    }
    val purchases = side("purchase", "purchase_id", "p_ts")
    val clicks = side("click", "click_id", "c_ts")
    val joined = purchases.join(clicks,
      col("purchase_id_user") === col("click_id_user")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
        && col("c_ts") < col("p_ts"))
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
      StreamReplay.requireMultiBatch(q)
    } finally q.stop()
    spark.table(name)
      .select(col("purchase_id_user").as("user_id"), col("purchase_id"),
        col("click_id"))
      .orderBy("purchase_id", "click_id")
  }

  /** Stream-stream LEFT OUTER interval join: every purchase emits — with
    * its preceding-hour clicks when they exist, or ONE null-extended row
    * (here a -1 sentinel + matched=false, so both engines order and hash
    * identically) when none do. The outer side is what makes this the
    * hard streaming shape: a "no match" is only knowable once the
    * WATERMARK has passed the purchase's whole click window, so the
    * engine holds the purchase in state and emits the null row in a
    * later watermark-advance micro-batch. Under the [[StreamReplay]]
    * 3-batch replay those flushes happen between real data batches for
    * early purchases and in the trailing no-data batch for the rest —
    * the production shape, not the single-batch degenerate case.
    *
    * Horizon contract: a purchase younger than the watermark delay never
    * reaches that provably-unmatched point before the fixture stream
    * ends, so the gate compares only purchases at least 3 h (delay + the
    * 1 h window, rounded up) older than the stream's max event time —
    * the same closed-horizon rule a production job applies when
    * reconciling a still-running stream against batch. The oracle mirrors
    * the cutoff with a MAX(ts) CTE.
    *
    * Scale shape: identical to the inner join above (user_id-keyed state
    * bounded by the watermark horizon); the outer extension adds no
    * state — it only defers each left row's eviction until the window
    * closes, which the same watermark bounds. */
  def purchaseClicksLeft(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 4) {
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val name = "stream_ljoin_" + UUID.randomUUID().toString.replace("-", "")
    def side(typ: String, idAs: String, tsAs: String) = {
      val stream = StreamReplay.source(spark, dir, batch.schema)
      val withTs =
        if (batch.schema("ts").dataType ==
            org.apache.spark.sql.types.LongType)
          stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else stream
      withTs.filter(col("event_type") === typ)
        .select(col("user_id").as(s"${idAs}_user"),
          col("event_id").as(idAs), col("ts").as(tsAs))
        .withWatermark(tsAs, "2 hours")
    }
    val purchases = side("purchase", "purchase_id", "p_ts")
    val clicks = side("click", "click_id", "c_ts")
    val joined = purchases.join(clicks,
      col("purchase_id_user") === col("click_id_user")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
        && col("c_ts") < col("p_ts"),
      "leftOuter")
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
      StreamReplay.requireMultiBatch(q)
    } finally q.stop()
    // closed horizon: compare only purchases the final watermark provably
    // passed (batch max ts is the harness stand-in for "now")
    val maxTsUs = batch
      .select(max(if (batch.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        expr("timestamp_micros(ts div 1000)") else col("ts")).as("mt"))
      .head().getTimestamp(0).toInstant
    spark.table(name)
      .filter(col("p_ts") <= lit(maxTsUs.minusSeconds(3 * 3600)))
      .select(col("purchase_id_user").as("user_id"), col("purchase_id"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"),
        col("click_id").isNotNull.as("matched"))
      .orderBy("purchase_id", "click_id")
  }

  /** Stream-stream FULL OUTER interval join (round 18 — the last
    * stream-stream join type): every purchase emits (matched, or one
    * -1-extended row once the watermark passes its click window) AND
    * every unmatched click emits its own -1-extended row once the
    * watermark passes the LAST purchase that could still claim it
    * (`c_ts + 1 h` — the engine derives the right side's eviction
    * horizon from the same range condition). This is the
    * reconciliation shape: joining a payments stream to a
    * confirmations stream where BOTH orphan classes are the signal.
    *
    * Horizon contract: one closed-horizon cutoff serves both orphan
    * classes, but their windows close at different times — a
    * purchase's at `p_ts`, a click's at `c_ts + 1 h` — so the gate
    * compares rows with `coalesce(p_ts, c_ts) <= max(ts) - 4 h`: an
    * extra hour over the left join's 3 h cutoff, leaving >= 1 h of
    * watermark margin past the LATER-closing click window (at 3 h a
    * click's window would close exactly ON the final watermark and
    * one row would hinge on eviction tie-breaking). The oracle
    * mirrors the cutoff; filters live INSIDE the join inputs — a
    * WHERE on event_type after a full join would silently drop every
    * null-extended row of the other side.
    *
    * Scale shape: identical keyed state, bounded by the watermark
    * horizon on both sides; the outer extension only defers eviction
    * to each row's window close — state is (events/hour x horizon)
    * regardless of stream length. */
  def purchaseClicksFull(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 4) {
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val name = "stream_fjoin_" + UUID.randomUUID().toString.replace("-", "")
    def side(typ: String, idAs: String, tsAs: String) = {
      val stream = StreamReplay.source(spark, dir, batch.schema)
      val withTs =
        if (batch.schema("ts").dataType ==
            org.apache.spark.sql.types.LongType)
          stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else stream
      withTs.filter(col("event_type") === typ)
        .select(col("user_id").as(s"${idAs}_user"),
          col("event_id").as(idAs), col("ts").as(tsAs))
        .withWatermark(tsAs, "2 hours")
    }
    val purchases = side("purchase", "purchase_id", "p_ts")
    val clicks = side("click", "click_id", "c_ts")
    val joined = purchases.join(clicks,
      col("purchase_id_user") === col("click_id_user")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")
        && col("c_ts") < col("p_ts"),
      "fullOuter")
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
      StreamReplay.requireMultiBatch(q)
    } finally q.stop()
    val maxTsUs = batch
      .select(max(if (batch.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        expr("timestamp_micros(ts div 1000)") else col("ts")).as("mt"))
      .head().getTimestamp(0).toInstant
    spark.table(name)
      .filter(coalesce(col("p_ts"), col("c_ts")) <=
        lit(maxTsUs.minusSeconds(4 * 3600)))
      .select(
        coalesce(col("purchase_id_user"), col("click_id_user"))
          .as("user_id"),
        coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"),
        (col("purchase_id").isNotNull && col("click_id").isNotNull)
          .as("matched"))
      .orderBy("purchase_id", "click_id")
  }

  val streamFullJoin: graft.core.Q = graft.core.Q(
    "ext_stream_full_join",
    """WITH mx AS (SELECT MAX(ts) AS mt FROM events),
      |p AS (SELECT user_id, event_id, ts FROM events
      |  WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, event_id, ts FROM events
      |  WHERE event_type = 'click')
      |SELECT COALESCE(p.user_id, c.user_id) AS user_id,
      |  COALESCE(p.event_id, -1) AS purchase_id,
      |  COALESCE(c.event_id, -1) AS click_id,
      |  p.event_id IS NOT NULL AND c.event_id IS NOT NULL AS matched
      |FROM p FULL JOIN c ON p.user_id = c.user_id
      |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
      |CROSS JOIN mx
      |WHERE COALESCE(p.ts, c.ts) <= mx.mt - INTERVAL 4 HOUR
      |ORDER BY purchase_id, click_id""".stripMargin
  )(purchaseClicksFull _)

  val streamLeftJoin: graft.core.Q = graft.core.Q(
    "ext_stream_left_join",
    """WITH mx AS (SELECT MAX(ts) AS mt FROM events)
      |SELECT p.user_id, p.event_id AS purchase_id,
      |COALESCE(c.event_id, -1) AS click_id,
      |c.event_id IS NOT NULL AS matched
      |FROM events p CROSS JOIN mx
      |LEFT JOIN events c ON p.user_id = c.user_id
      |  AND c.event_type = 'click'
      |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
      |WHERE p.event_type = 'purchase' AND p.ts <= mx.mt - INTERVAL 3 HOUR
      |ORDER BY purchase_id, click_id""".stripMargin
  )(purchaseClicksLeft _)

  val streamJoin: graft.core.Q = graft.core.Q(
    "ext_stream_join",
    """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
      |FROM events p JOIN events c ON p.user_id = c.user_id
      |AND p.event_type = 'purchase' AND c.event_type = 'click'
      |AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
      |ORDER BY purchase_id, click_id""".stripMargin
  )(purchaseClicks _)

  val all: Seq[graft.core.Q] =
    Seq(streamJoin, streamLeftJoin, streamFullJoin)
}
