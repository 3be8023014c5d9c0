package graft

/** Plan-inspection harness: prints formatted physical plans for the
  * headline queries. Run: sbt "Test/runMain graft.ExplainDrive [names...]"
  */
object ExplainDrive {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(8)
    val names = if (args.nonEmpty) args.toSet
      else Set("q1_pricing_summary", "q3_shipping_priority",
        "q5_local_supplier_volume", "q_p1_projection",
        "q_j3_latest_per_group", "ext_sim_topk_brute",
        "ext_sample_stratified", "ext_vocab_topk", "ext_pipeline_cleanse",
        "ext_skew_salted_agg", "ext_partition_pruned_scan")
    SparkEntry.registry.filter(q => names(q.name)).foreach { q =>
      println(s"\n===== ${q.name} =====")
      q.fn(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
