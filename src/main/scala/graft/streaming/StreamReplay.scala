package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** MULTI-batch fixture replay for the stateful streaming gate rows
  * (funnel, attribution, EWMA) — the contract upgrade over
  * [[StreamContracts.requireSingleBatch]]: instead of pinning the whole
  * fixture into micro-batch 0, the events table is staged as
  * [[Batches]] time-ordered parquet files and re-read with
  * `maxFilesPerTrigger = 1`, so the state machines are exercised across
  * REAL micro-batch boundaries — watermark advances between batches,
  * event-time timeouts actually fire mid-stream, and state handoff
  * (not a single in-group sort) has to reproduce the batch oracle.
  *
  * == Why time-ordered splits keep the batch oracles exact ==
  *
  *  - The split is `repartitionByRange(ts, event_id)`: every event in
  *    batch k+1 sorts at-or-after every event in batch k, so no event
  *    ever arrives behind the watermark (which only advances to batch
  *    k's max ts).
  *  - Pending-pattern timeouts purge only state whose step bound is
  *    already unreachable: a purged state's last event is > bound older
  *    than the watermark, and every later event is at-or-after the
  *    watermark, so it could not have extended the pattern anyway.
  *  - Horizon reaping (EWMA / attribution, 7 d) cannot fire mid-history
  *    for any fixture user: the max per-user inter-event gap is ~4.1 d
  *    at sf0.01 (asserted in StreamingReplaySpec), so a user always has
  *    data in some batch before their timeout crosses the watermark.
  *  - Completed-funnel tombstones (24 h) DO expire mid-replay (the
  *    fixture spans ~30 d), so a user can re-complete and re-emit;
  *    the funnel's sink is therefore keyed MIN-per-user, which realizes
  *    the oracle's first-completion semantics under ANY batching.
  */
private[graft] object StreamReplay {

  /** Number of staged time-range files = number of data micro-batches. */
  val Batches = 3

  private def stagingDir(s: SparkSession): Path =
    Paths.get(new java.net.URI(s.conf.get("spark.sql.warehouse.dir"))
      .getPath, "stream_replay_events")

  private def stage(s: SparkSession, d: String): Unit = {
    val dir = stagingDir(s)
    s.read.parquet(s"$d/events.parquet")
      .repartitionByRange(Batches, col("ts"), col("event_id"))
      .write.mode("overwrite").parquet(dir.toString)
    // keep only the part files; pin ascending mtimes so the file source
    // (oldest-first) replays the ranges in time order one per trigger
    val all = {
      val st = Files.list(dir)
      try st.iterator().asScala.toSeq finally st.close()
    }
    all.filterNot(_.getFileName.toString.endsWith(".parquet"))
      .foreach(Files.deleteIfExists(_))
    val parts = all.filter(_.getFileName.toString.endsWith(".parquet"))
      .sortBy(_.getFileName.toString)
    val t0 = System.currentTimeMillis() - 60000L * (parts.size + 1)
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.setLastModifiedTime(p, FileTime.fromMillis(t0 + 60000L * i))
    }
  }

  private val prepared = new graft.ext.PreparedTables(
    Seq("events.parquet"), Seq("stream_replay_events"), stage)

  /** Streaming read of the staged split, one file per micro-batch.
    * `schema` comes from the caller's batch read of the original table
    * (the staged copy is written from the same read, so types match). */
  def source(s: SparkSession, d: String, schema: StructType): DataFrame = {
    prepared.ensurePrepared(s, d)
    s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stagingDir(s).toString)
  }

  /** Loud contract: the finished replay must have run >= [[Batches]]
    * data-carrying micro-batches (plus any no-data watermark batches). */
  def requireMultiBatch(q: StreamingQuery): Unit = {
    val n = q.recentProgress.count(_.numInputRows > 0)
    require(n >= Batches,
      s"multi-batch replay contract: expected >= $Batches data " +
        s"micro-batches, saw $n")
  }
}
