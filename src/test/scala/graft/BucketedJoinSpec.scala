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
}
