package graft

import graft.ext.BucketedJoin

/** The bucketed join must be shuffle-free: same-bucketed sides join with
  * no Exchange in the executed plan.
  */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed join plans without a shuffle exchange") {
    BucketedJoin.bucketedJoin.fn(spark, sf).collect()
    val df = {
      // rebuild just the join (no presentation sort) to inspect its plan
      import graft.ext.BucketedJoin
      BucketedJoin.joined(spark)
    }
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
  }

  test("partitioned scan prunes to the one selected day before reading") {
    import graft.ext.PartitionedScan
    PartitionedScan.ensurePrepared(spark, sf)
    val df = PartitionedScan.oneDay(spark)
    df.collect()
    // AQE hides the scan node behind query-stage boundaries, so assert on
    // the final plan's rendering: the scan must carry a PartitionFilters
    // clause pinning event_date (i.e. pruning happens at file listing,
    // before any row is read)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["),
      s"scan must carry partition filters:\n$plan")
    assert(plan.contains("event_date"),
      s"partition filter must pin event_date:\n$plan")
    // and the day's slice must be a strict subset of the table
    val total = spark.table("graft_part_events").count()
    val day = spark.table("graft_part_events")
      .filter(org.apache.spark.sql.functions.col("event_date")
        === org.apache.spark.sql.functions.lit("2024-01-15").cast("date"))
      .count()
    assert(day > 0 && day < total)
  }
}
