package graft

import org.apache.spark.sql.functions._

/** `ext_range_layout` verified two ways: the gate row's exact-boundary
  * assignment against a straight-line local octile recomputation, and the
  * PHYSICAL half the DuckDB oracle cannot observe — a range-partitioned +
  * within-partition-sorted frame is globally ordered across partition ids
  * (the property that makes the sorted-export write correct).
  */
class RangeLayoutSpec extends SparkSuite {

  private lazy val cents: Array[Long] = graft.core.Tables.orders(spark, sf)
    .select(round(col("o_totalprice") * 100).cast("long").as("v"))
    .collect().map(_.getLong(0))

  test("range-layout audit equals a local exact-octile recomputation: " +
    "disjoint monotone ranges, balanced counts, total preserved") {
    val k = 8
    val sorted = cents.sorted
    val n = sorted.length
    // boundary i = smallest v with count(<=v) >= ceil(i*n/8) — the
    // engine-wide lower-percentile convention
    val bounds = (1 until k).map(i => sorted(((i * n + k - 1) / k) - 1))
    val expected = cents.groupBy(v => 1 + bounds.count(v > _))
      .toSeq.sortBy(_._1)
      .map { case (b, vs) => (b.toLong, vs.length.toLong, vs.min, vs.max) }
    val got = graft.ext.RangeLayout.rangeLayout.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected, s"spark $got vs local $expected")
    // ranges tile disjointly in bucket order
    got.sliding(2).foreach {
      case Seq((_, _, _, maxA), (_, _, minB, _)) => assert(maxA < minB)
      case _ =>
    }
    assert(got.map(_._2).sum == n.toLong)
    // exact octiles: bucket sizes are floor/ceil-balanced up to ties
    assert(got.map(_._2).max - got.map(_._2).min <= 2,
      s"unbalanced buckets: ${got.map(_._2)}")
  }

  test("physical layout: repartitionByRange + sortWithinPartitions is " +
    "globally ordered across ascending partition ids") {
    val vals = graft.core.Tables.orders(spark, sf)
      .select(round(col("o_totalprice") * 100).cast("long").as("v"))
    val laid = vals.repartitionByRange(8, col("v"))
      .sortWithinPartitions("v")
    // per-partition census in one pass, plus a within-partition order scan
    val parts = laid.select(col("v"), spark_partition_id().as("pid"))
      .groupBy("pid")
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"),
        max(col("v")).as("mx"))
      .orderBy("pid")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(parts.map(_._2).sum == cents.length.toLong)
    assert(parts.forall(_._2 > 0), "range partitioner left an empty slot")
    // ascending pid order implies ascending disjoint value ranges
    parts.sliding(2).foreach {
      case Array((_, _, _, mxA), (_, _, mnB, _)) => assert(mxA <= mnB)
      case _ =>
    }
    // within-partition sortedness — the other half of global order
    import spark.implicits._
    val unsortedRuns = laid.select(col("v")).as[Long]
      .mapPartitions { it =>
        var bad = 0L
        var prev = Long.MinValue
        it.foreach { v => if (v < prev) bad += 1; prev = v }
        Iterator.single(bad)
      }.collect().sum
    assert(unsortedRuns == 0L)
  }
}
