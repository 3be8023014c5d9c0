package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvSketch.kmv_sketch

/** KMV sketch properties the DuckDB gate cannot see: partition/merge
  * invariance, in-state dedup, and the estimator's error behavior.
  */
class KmvSpec extends SparkSuite {

  private def sketchOf(n: Int, parts: Int, dups: Int = 1): Seq[Long] = {
    import spark.implicits._
    val rows = (1 to n).flatMap(i => Seq.fill(dups)(i.toLong))
    rows.toDF("x").repartition(parts)
      .select(expr(
        "cast(conv(substring(md5(cast(x as string)), 1, 12), 16, 10) " +
          "as bigint)").as("h"))
      .agg(kmv_sketch(spark, col("h"), 64).as("ks"))
      .collect()(0).getSeq[Long](0)
  }

  test("sketch is invariant to partitioning and to duplicate inputs, " +
    "ascending, distinct, size-capped") {
    val base = sketchOf(5000, 4)
    assert(base == sketchOf(5000, 31), "partitioning changed the sketch")
    assert(base == sketchOf(5000, 1, dups = 3), "duplicates leaked in")
    assert(base.size == 64)
    assert(base == base.sorted && base.distinct == base)
  }

  test("estimator lands within 5/sqrt(k-1) of the true distinct count " +
    "on the fixture, and the exact regime is exact") {
    val rows = graft.ext.KmvDistinct.kmvUserDays.fn(spark, sf).collect()
    rows.foreach { r =>
      val (g, exact, kept, est) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(4))
      if (kept < 256) assert(est == exact && est == kept,
        s"$g: exact regime must be exact ($est vs $exact)")
      else {
        val rel = math.abs(est - exact).toDouble / exact
        assert(rel < 5.0 / math.sqrt(255.0),
          s"$g: KMV rel err $rel (est $est vs exact $exact)")
      }
    }
    // sf0.001 ALL group has > k distinct user-days? if not, both regimes
    // are still covered by the per-type rows above; assert rows exist
    assert(rows.length == 6)
  }
}
