package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.BloomMembership.{bloom_build, bloom_check}

/** Bloom semi-join reduction: no false negatives ever, real fact-row
  * pruning on the fixture, and the demonstrated plan shape (bloom filter
  * evaluated under the fact side of a shuffle join, not after it).
  */
class BloomJoinSpec extends SparkSuite {

  private def buildFilter(): (Array[Byte], Long) = {
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val n = dim.count()
    val bytes = dim.agg(bloom_build(spark, col("o_orderkey"), n).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    (bytes, n)
  }

  test("bloom filter has no false negatives over the build keys") {
    val (bytes, n) = buildFilter()
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val passed = dim.filter(bloom_check(spark, col("o_orderkey"), bytes))
      .count()
    assert(passed == n, s"every build key must pass: $passed of $n")
  }

  test("bloom pre-filter prunes most non-matching fact rows") {
    val (bytes, _) = buildFilter()
    val fact = Tables.lineitem(spark, sf).select("l_orderkey")
    val total = fact.count()
    val kept = fact.filter(bloom_check(spark, col("l_orderkey"), bytes))
      .count()
    // urgent orders are ~1/5 of the key space; with fpp=0.03 the kept
    // fraction must sit well under half (false positives only add ~3%)
    assert(kept < total / 2,
      s"bloom must prune the fact side: kept $kept of $total")
    assert(kept > 0, "fixture join is non-vacuous")
  }

  test("bloom check runs under the join, and the join result is exact") {
    val q = graft.ext.BloomJoin.bloomJoin
    val df = q.fn(spark, sf)
    val withBloom = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_check("),
      s"plan must carry the bloom membership filter:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      s"merge hint must pin the demonstrated shuffle join:\n$plan")
    // the filter must sit BELOW the join: in the rendered tree the
    // bloom_check line is indented under the SortMergeJoin node
    val lines = plan.linesIterator.toVector
    val joinIdx = lines.indexWhere(_.contains("SortMergeJoin"))
    val bloomIdx = lines.indexWhere(_.contains("bloom_check("))
    assert(joinIdx >= 0 && bloomIdx > joinIdx,
      s"bloom filter must be under the join's fact input:\n$plan")

    // exactness: identical to the plain (un-bloomed) join
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_returnflag")
      .agg(graft.core.Determinism
        .revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy("l_returnflag")
      .collect()
    assert(withBloom.toSeq == plain.toSeq,
      "bloom pre-filter must not change the join result")
  }
}
