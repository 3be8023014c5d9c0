package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Determinism, Q, Tables}
import Determinism.dsum

/** [EXT] partition-pruned scan: the `events` fixture is written ONCE
  * partitioned by event date (`partitionBy` at ingest), and the daily
  * query then reads exactly one partition directory — the scan's
  * `PartitionFilters` prune 29 of 30 days before a single row is read
  * (asserted in ExtSpec). This is the other half of [[BucketedJoin]]'s
  * write-once story and the single most important layout decision at
  * 100 TB: time-partitioned facts make every time-bounded query O(days
  * touched), not O(corpus).
  *
  * The oracle runs the same predicate over the RAW table — partitioning
  * must never change results, only how much data the plan touches.
  */
object PartitionedScan {

  private val Day = "2024-01-15"

  @volatile private var preparedKey: String = ""

  private def memoKey(s: SparkSession, d: String): String = {
    val p = java.nio.file.Paths.get(d, "events.parquet")
    val src =
      if (java.nio.file.Files.exists(p))
        s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}:${java.nio.file.Files.size(p)}"
      else "absent"
    s"${s.conf.get("spark.sql.warehouse.dir")}|$d|$src"
  }

  /** Write the date-partitioned copy unless it is already current (same
    * memo rule as [[BucketedJoin.ensurePrepared]]). */
  def ensurePrepared(s: SparkSession, d: String): Unit = synchronized {
    val key = memoKey(s, d)
    if (preparedKey != key) { prepare(s, d); preparedKey = key }
  }

  def prepare(s: SparkSession, d: String): Unit = {
    s.sql("DROP TABLE IF EXISTS graft_part_events")
    val dir = java.nio.file.Paths.get(
      new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath,
      "graft_part_events")
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    Tables.events(s, d)
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite")
      .format("parquet").partitionBy("event_date")
      .saveAsTable("graft_part_events")
  }

  /** The one-day aggregate over the partitioned copy (exposed for the
    * pruning spec). */
  def oneDay(s: SparkSession) =
    s.table("graft_part_events")
      .filter(col("event_date") === lit(Day).cast("date"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .orderBy("event_type")

  val partitionPruned: Q = Q(
    "ext_partition_pruned_scan",
    s"""SELECT event_type, COUNT(*) AS n,
       |CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
       |FROM events WHERE CAST(ts AS DATE) = DATE '$Day'
       |GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    ensurePrepared(s, d)
    oneDay(s)
  }.copy(setup = Some(ensurePrepared _))

  val all: Seq[Q] = Seq(partitionPruned)
}
