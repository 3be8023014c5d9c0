package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Determinism, Q}
import Determinism.dsum

/** [EXT] Structured Streaming ingestion of the `events` fixture (SURVEY
  * §2.9): the same hourly tumbling aggregate as ext_window_hourly, but
  * computed BY A STREAMING QUERY (file source -> watermarked window agg ->
  * memory sink), drained synchronously so the gate can hash it against the
  * batch oracle. Streaming and batch answers must agree — that equivalence
  * is the point of the test.
  */
object EventsStream {

  /** Run the streaming aggregation to completion and return the result as
    * a batch DataFrame. */
  def hourlyByType(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 8) {
    // file streaming source needs the schema up front: take it from a batch
    // read (ts arrives as nanos BIGINT under nanosAsLong, converted below)
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val name = "stream_hourly_" + UUID.randomUUID().toString.replace("-", "")
    // layout-robust source: single fixture file OR Spark-written dir
    val stream = StreamReplay.source(spark, dir, batch.schema)
    val withTs =
      if (batch.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else stream
    val agg = withTs
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
      StreamReplay.requireMultiBatch(q)
    } finally q.stop()
    spark.table(name)
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))
      .orderBy("window_start", "event_type")
  }

  /** Gate entry: streaming result, batch oracle. */
  val streamHourly: Q = Q(
    "ext_stream_hourly",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
  )(hourlyByType _)

  /** Streaming SLIDING-window aggregate (1 h window, 30 min slide): each
    * event lands in exactly two overlapping windows — the moving-average
    * shape of live dashboards. Overlap multiplies only the AGGREGATE
    * state (2 tiny rows per slot), never the input: Spark assigns each
    * row its window set before the shuffle, so at 100 TB/day the cost
    * over tumbling is one extra state row per window per key, all still
    * watermark-bounded. Batch twin: `ext_window_sliding`. */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 8) {
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val name = "stream_sliding_" + UUID.randomUUID().toString.replace("-", "")
    val stream = StreamReplay.source(spark, dir, batch.schema)
    val withTs =
      if (batch.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else stream
    val agg = withTs
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
      StreamReplay.requireMultiBatch(q)
    } finally q.stop()
    spark.table(name)
      .select(col("window.start").as("window_start"), col("n"))
      .orderBy("window_start")
  }

  /** Gate entry: the streaming sliding window against the same epoch-slot
    * arithmetic oracle as the batch twin. */
  val streamSliding: Q = Q(
    "ext_stream_sliding",
    """SELECT make_timestamp(((epoch_us(ts) // 1800000000) - i) * 1800000000)
      |  AS window_start,
      |COUNT(*) AS n
      |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) shifts
      |GROUP BY 1 ORDER BY window_start""".stripMargin
  )(slidingCounts _)

  /** Streaming top-k: complete-mode grouped count with ORDER BY + LIMIT
    * pushed into the streaming sink update — the live-leaderboard shape.
    * Complete mode re-emits the full (tiny, k-bounded) result per batch;
    * the state is one count per user, which at 100 TB/day is exactly the
    * high-cardinality-but-bounded aggregate state Structured Streaming's
    * state store shards across executors. */
  def topUsers(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 4) {
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val name = "stream_topk_" + UUID.randomUUID().toString.replace("-", "")
    val stream = StreamReplay.source(spark, dir, batch.schema)
    val ranked = stream
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id"))
      .limit(5)
    val q = ranked.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
      StreamReplay.requireMultiBatch(q)
    } finally q.stop()
    // the sink already holds exactly the final top-5; re-sort for the
    // deterministic presentation order
    spark.table(name).orderBy(col("n").desc, col("user_id"))
  }

  val streamTopK: Q = Q(
    "ext_stream_topk",
    """SELECT user_id, COUNT(*) AS n FROM events
      |GROUP BY user_id ORDER BY n DESC, user_id LIMIT 5""".stripMargin
  )(topUsers _)

  // the static enrichment dim: event_type -> billing weight (same values
  // as Corpus.skewSaltedJoin's wt dim, so the two formulations cross-check)
  private val TypeWeights = Seq(("click", 1.0), ("error", 5.0),
    ("purchase", 10.0), ("signup", 2.0), ("view", 0.5))

  /** Stream-static enrichment: the streaming fact joined to a STATIC
    * in-memory dim (broadcast into every micro-batch — the stateless
    * join Structured Streaming re-plans per batch with zero state
    * store), then a watermarked daily aggregate of the enriched rows.
    * This is the canonical 100 TB/day ingest shape: dims live in the
    * driver/catalog, facts stream through, and no state accumulates for
    * the join itself (only the windowed agg keeps state, bounded by the
    * watermark). Money math follows Determinism: weights ride as exact
    * decimals through the weighted sum. */
  def enrichedDaily(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 8) {
    import spark.implicits._
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val name = "stream_enrich_" + UUID.randomUUID().toString.replace("-", "")
    val stream = StreamReplay.source(spark, dir, batch.schema)
    val withTs =
      if (batch.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else stream
    val dim = broadcast(TypeWeights.toDF("w_type", "w"))
    val agg = withTs
      .join(dim, col("event_type") === col("w_type"))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(Determinism.m(col("value")) * Determinism.m(col("w")))
          .cast("double").as("weighted_total"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
      StreamReplay.requireMultiBatch(q)
    } finally q.stop()
    spark.table(name)
      .select(col("window.start").as("day"), col("event_type"),
        col("n"), col("weighted_total"))
      .orderBy("day", "event_type")
  }

  val streamEnrich: Q = Q(
    "ext_stream_enrich",
    """SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n,
      |CAST(SUM(CAST(value AS DECIMAL(10,2)) * CASE event_type
      |  WHEN 'click' THEN CAST(1.0 AS DECIMAL(10,2))
      |  WHEN 'error' THEN CAST(5.0 AS DECIMAL(10,2))
      |  WHEN 'purchase' THEN CAST(10.0 AS DECIMAL(10,2))
      |  WHEN 'signup' THEN CAST(2.0 AS DECIMAL(10,2))
      |  WHEN 'view' THEN CAST(0.5 AS DECIMAL(10,2))
      |  END) AS DOUBLE) AS weighted_total
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin
  )(enrichedDaily _)

  val all: Seq[Q] = Seq(streamHourly, streamTopK, streamEnrich,
    streamSliding)
}
