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

  val all: Seq[graft.core.Q] = Seq(streamJoin, streamLeftJoin)
}
