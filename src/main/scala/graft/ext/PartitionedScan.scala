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

  /** Prepare-once machinery shared with the other layout ops
    * ([[PreparedTables]]). */
  private val prepared = new PreparedTables(
    Seq("events.parquet"), Seq("graft_part_events"), write,
    // adoption must declare the partitioning AND recover the partition
    // directories — registered unpartitioned, the table reads as zero
    // rows (no data files at the root); registered without MSCK, the
    // catalog knows no partitions
    adoptDdl = (s, t, loc) => Seq(
      s"CREATE TABLE $t (${s.table(t).schema.toDDL}) USING parquet " +
        s"PARTITIONED BY (event_date) LOCATION '$loc'",
      s"MSCK REPAIR TABLE $t"))

  def ensurePrepared(s: SparkSession, d: String): Unit =
    prepared.ensurePrepared(s, d)

  private def write(s: SparkSession, d: String): Unit = {
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
