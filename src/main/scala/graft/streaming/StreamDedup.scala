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
  * from doc_id (fixture docs are a single replay batch; the watermark
  * semantics are exercised, the horizon never truncates — same single-
  * batch contract as [[StatefulSessions]], asserted there). The emitted
  * row per fingerprint is the FIRST arrival, which is racy under parallel
  * replay — so the gate projects the fingerprint set only, which is
  * deterministic regardless of which copy won. */
object StreamDedup {

  def distinctFingerprints(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 8) {
    val batch = spark.read.parquet(s"$dir/documents.parquet")
    // the 10-minute watermark horizon covers far less than the synthetic
    // 1-doc/second arrival span, so dedup across the whole corpus is only
    // guaranteed when everything lands in one micro-batch — assert it
    // (same contract as StatefulSessions)
    StreamContracts.requireSingleBatch(dir, "documents.parquet")
    val name = "stream_dedup_" + UUID.randomUUID().toString.replace("-", "")
    val stream = StreamSource.table(spark, dir, "documents", batch.schema)
    val keyed = stream
      .select(md5(col("text")).as("fp"),
        // deterministic synthetic arrival time: one doc per second
        timestamp_seconds(lit(1704067200L) + col("doc_id")).as("arrival_ts"))
      .withWatermark("arrival_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")
    val q = keyed.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name).select(col("fp")).orderBy("fp")
  }


  /** Gate entry: streaming dedup vs the batch DISTINCT oracle — the
    * stream must emit exactly one row per distinct content. */
  val streamDedup: Q = Q(
    "ext_stream_dedup",
    "SELECT DISTINCT md5(text) AS fp FROM documents ORDER BY fp"
  )(distinctFingerprints _)

  val all: Seq[Q] = Seq(streamDedup)
}
