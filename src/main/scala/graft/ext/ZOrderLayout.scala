package graft.ext

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import graft.core.Determinism.revenueSum

/** [EXT] Z-order (Morton-curve) layout: the multi-dimensional clustering
  * technique lakehouse table formats ship as `OPTIMIZE ... ZORDER BY`
  * (Delta/Iceberg; the curve itself is Morton, "A computer oriented
  * geodetic data base...", IBM 1966). Sorting the fact table by the
  * interleaved bits of TWO keys gives every parquet row group a tight
  * min/max envelope on BOTH columns at once, so a conjunctive 2-D box
  * predicate prunes most row groups at footer-read time — a single-key
  * sort can only do this for one of the two dimensions.
  *
  * At 100 TB this is the difference between "point-ish queries on
  * (part, supplier) touch ~cells-intersecting-the-box" and "every such
  * query scans the corpus": like [[BucketedJoin]] and
  * [[PartitionedScan]], the cost is paid ONCE at ingest (the z-sorted
  * rewrite is a range shuffle) and every 2-D-selective reader wins.
  *
  * The gate checks result parity: the oracle runs the same box predicate
  * over the RAW table — layout must never change results, only how much
  * data the plan touches. The pruning claim itself is spec-checked by
  * reading the written files' parquet footers and counting row groups
  * whose [min,max] intersect the box (ZOrderSpec).
  */
object ZOrderLayout {

  /** Morton interleave of two non-negative int keys (21 bits per key
    * covers partkey/suppkey domains up to 2M rows of `part` — 100x the
    * 10x fixture — while the interleaved value stays in a 42-bit
    * long). Shared with the store's clustered compaction:
    * [[graft.core.Morton]]. */
  private[graft] def zval(a: Column, b: Column): Column =
    graft.core.Morton.interleave(a, b)

  // the 2-D box the gate query probes: selective on both dims at every
  // fixture SF (partkey domain starts at 200 rows, suppkey at 10)
  private val PartLo = 40L; private val PartHi = 80L
  private val SuppLo = 2L; private val SuppHi = 4L

  /** Prepare-once machinery shared with the other layout ops
    * ([[PreparedTables]]). */
  private val prepared = new PreparedTables(
    Seq("lineitem.parquet"), Seq("graft_zorder_lineitem"), write)

  def ensurePrepared(s: SparkSession, d: String): Unit =
    prepared.ensurePrepared(s, d)

  /** Write the z-ordered copy: range-shuffle on the Morton value, sort
    * within partitions, drop the helper column. 32 output slices stand
    * in for the cluster's per-executor writers. */
  def prepare(s: SparkSession, d: String): Unit =
    prepared.forcePrepare(s, d)

  private def write(s: SparkSession, d: String): Unit = {
    Tables.lineitem(s, d)
      .withColumn("zv", zval(col("l_partkey"), col("l_suppkey")))
      .repartitionByRange(32, col("zv"))
      .sortWithinPartitions("zv")
      .drop("zv")
      .write.mode("overwrite").format("parquet")
      .saveAsTable("graft_zorder_lineitem")
  }

  /** The 2-D box aggregate over the z-ordered copy (exposed for the
    * footer-pruning spec). */
  def boxQuery(s: SparkSession) =
    s.table("graft_zorder_lineitem")
      .filter(col("l_partkey").between(PartLo, PartHi)
        && col("l_suppkey").between(SuppLo, SuppHi))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("l_returnflag")

  private[graft] def box: (Long, Long, Long, Long) =
    (PartLo, PartHi, SuppLo, SuppHi)

  val zorderScan: Q = Q(
    "ext_zorder_scan",
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
       |  * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue
       |FROM lineitem
       |WHERE l_partkey BETWEEN $PartLo AND $PartHi
       |AND l_suppkey BETWEEN $SuppLo AND $SuppHi
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    ensurePrepared(s, d)
    boxQuery(s)
  }.copy(setup = Some(ensurePrepared _))

  val all: Seq[Q] = Seq(zorderScan)
}
