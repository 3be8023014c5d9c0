package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Q

/** [EXT] streaming deduplication — the ingest-time half of the dedup
  * family: as documents stream in, drop every copy after the first of each
  * content fingerprint. This is `dropDuplicatesWithinWatermark` over a
  * state store keyed by md5(text): per-key state holds one timestamp, the
  * watermark reaps keys older than the horizon, so state is bounded by the
  * duplicate-arrival window, not corpus size — the property that makes
  * streaming dedup viable at 100 TB/day ingest (an unwatermarked
  * `dropDuplicates` would grow state forever).
  *
  * The fixture has no arrival time, so one is derived deterministically
  * from doc_id (one doc per second). The fixture replays in
  * [[StreamReplay.Batches]] doc_id-ordered micro-batches, so fingerprint
  * state really is admitted in one batch and matched against in later
  * ones, with the watermark advancing (and evicting) between batches.
  * `dropDuplicatesWithinWatermark` only guarantees dedup of copies
  * arriving within the watermark DELAY of each other — that is the
  * production contract (size the horizon to the duplicate-arrival SLA) —
  * so the gate sizes the delay to the fixture's measured max
  * same-fingerprint arrival span (one tiny batch aggregate, the analogue
  * of knowing your ingest SLA): every duplicate pair is inside the
  * horizon, and the emitted set equals the batch DISTINCT oracle. The
  * emitted row per fingerprint is the FIRST arrival, which is racy under
  * parallel replay — so the gate projects the fingerprint set only,
  * which is deterministic regardless of which copy won. */
object StreamDedup {

  def distinctFingerprints(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 8) {
    val batch = spark.read.parquet(s"$dir/documents.parquet")
    // horizon = the fixture's max duplicate-arrival span (seconds, since
    // arrival is 1 doc/s) + slack — the dedup window the op guarantees
    val maxSpanSec = batch
      .groupBy(md5(col("text")))
      .agg((max(col("doc_id")) - min(col("doc_id"))).as("span"))
      .agg(max(col("span")))
      .head().getLong(0)
    val name = "stream_dedup_" + UUID.randomUUID().toString.replace("-", "")
    val stream = StreamReplay.sourceFor(spark, dir, "documents",
      Seq("doc_id"), batch.schema)
    val keyed = stream
      .select(md5(col("text")).as("fp"),
        // deterministic synthetic arrival time: one doc per second
        timestamp_seconds(lit(1704067200L) + col("doc_id")).as("arrival_ts"))
      .withWatermark("arrival_ts", s"${maxSpanSec + 60} seconds")
      .dropDuplicatesWithinWatermark("fp")
    val q = keyed.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
      StreamReplay.requireMultiBatch(q)
    } finally q.stop()
    spark.table(name).select(col("fp")).orderBy("fp")
  }


  /** Gate entry: streaming dedup vs the batch DISTINCT oracle — the
    * stream must emit exactly one row per distinct content. */
  val streamDedup: Q = Q(
    "ext_stream_dedup",
    "SELECT DISTINCT md5(text) AS fp FROM documents ORDER BY fp"
  )(distinctFingerprints _)

  /** The SAME query under the RocksDB state store provider — the
    * 100 TB spill knob ([[graft.core.Sessions.RocksDbStateStoreProvider]]:
    * off-heap disk-backed state, the provider a day-scale fingerprint
    * horizon needs). Identical oracle: the provider must be an
    * execution detail, never a semantics change. */
  val streamDedupRocksDb: Q = Q(
    "ext_stream_dedup_rocksdb",
    "SELECT DISTINCT md5(text) AS fp FROM documents ORDER BY fp"
  ) { (s, d) =>
    graft.core.Sessions.withStateStore(s,
      graft.core.Sessions.RocksDbStateStoreProvider) {
      distinctFingerprints(s, d)
    }
  }

  val all: Seq[Q] = Seq(streamDedup, streamDedupRocksDb)
}
