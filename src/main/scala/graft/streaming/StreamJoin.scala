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
    // the batch oracle describes the stream only if no watermark advance
    // can evict a click before its purchase arrives — guaranteed when the
    // fixture lands as one micro-batch (same contract as the other
    // streaming oracles; see StreamContracts)
    StreamContracts.requireSingleBatch(dir, "events.parquet")
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val name = "stream_join_" + UUID.randomUUID().toString.replace("-", "")
    def side(typ: String, idAs: String, tsAs: String) = {
      val stream = StreamSource.table(spark, dir, "events", batch.schema)
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
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .select(col("purchase_id_user").as("user_id"), col("purchase_id"),
        col("click_id"))
      .orderBy("purchase_id", "click_id")
  }

  val streamJoin: graft.core.Q = graft.core.Q(
    "ext_stream_join",
    """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
      |FROM events p JOIN events c ON p.user_id = c.user_id
      |AND p.event_type = 'purchase' AND c.event_type = 'click'
      |AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
      |ORDER BY purchase_id, click_id""".stripMargin
  )(purchaseClicks _)

  val all: Seq[graft.core.Q] = Seq(streamJoin)
}
