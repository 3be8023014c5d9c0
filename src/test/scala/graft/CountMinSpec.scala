package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMin

/** Count-Min sketch properties the DuckDB gate cannot see: partition
  * invariance of the finished counter matrix, the never-undercount
  * guarantee across the WHOLE vocabulary (the gate row audits only the
  * top 30), and that the row sums all equal N (each token lands exactly
  * once per row — the invariant the gate's no-extra-pass N derivation
  * relies on).
  */
class CountMinSpec extends SparkSuite {

  private def toksDf = graft.core.Tables.documents(spark, sf)
    .select(explode(filter(split(col("text"), "\\s+"),
      t => t =!= "")).as("t"))

  test("sketch is partition-invariant: 1-partition and 32-partition " +
    "builds produce the identical counter matrix") {
    val a = toksDf.repartition(1)
      .agg(CountMin.count_min(spark, col("t"))).collect()(0).getSeq[Long](0)
    val b = toksDf.repartition(32, col("t"))
      .agg(CountMin.count_min(spark, col("t"))).collect()(0).getSeq[Long](0)
    assert(a == b, "counter matrices differ across partitionings")
  }

  test("estimates never undercount any vocabulary token, and every row " +
    "of the matrix sums to N") {
    val sk = toksDf.agg(CountMin.count_min(spark, col("t")).as("cms"))
    val W = CountMin.DefaultWidth
    val n = toksDf.count()
    val rowSums = sk.select((0 until CountMin.DefaultDepth).map(d =>
      aggregate(slice(col("cms"), d * W + 1, W), lit(0L), (a, x) => a + x)
        .as(s"r$d")): _*).collect()(0)
    (0 until CountMin.DefaultDepth).foreach(d =>
      assert(rowSums.getLong(d) == n, s"row $d sums to ${rowSums.getLong(d)}"))
    val under = toksDf.groupBy("t").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sk))
      .filter(CountMin.cms_estimate(spark, col("cms"), col("t"))
        < col("exact"))
      .count()
    assert(under == 0L, s"$under tokens undercounted — CMS guarantee broken")
  }
}
