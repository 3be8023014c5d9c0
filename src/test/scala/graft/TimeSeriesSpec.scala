package graft

import org.apache.spark.sql.functions._

/** Time-series ops vs straight-line local recomputations: the ACF formula
  * from the daily series, and the CUSUM closed form
  * (prefix-sum minus running extremum) against the textbook recursion
  * S+_t = max(0, S+_{t-1} + d_t) in exact BigDecimal arithmetic.
  */
class TimeSeriesSpec extends SparkSuite {

  test("acf matches a local recomputation and is bounded by 1") {
    val daily = graft.core.Tables.orders(spark, sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("rev"))
      .collect().map(r => (r.getDate(0).toString,
        r.getDecimal(1))).sortBy(_._1)
    val xs = daily.map(_._2.doubleValue)
    val n = xs.length
    val m = daily.map(d => BigDecimal(d._2)).sum.toDouble / n
    def fold(ts: Seq[Double]): Double = ts.foldLeft(0.0)(_ + _)
    val den = fold(xs.map(x => (x - m) * (x - m)))
    val rows = graft.ext.TimeSeries.acf.fn(spark, sf).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val (lag, nDays, acf) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(nDays == n.toLong)
      val num = fold((0 until n - lag.toInt).map(i =>
        (xs(i) - m) * (xs(i + lag.toInt) - m)))
      assert(math.abs(acf - num / den) < 1e-9,
        s"lag $lag: $acf vs ${num / den}")
      assert(math.abs(acf) <= 1.0 + 1e-9)
    }
  }

  test("cusum closed form equals the textbook recursion in exact " +
    "decimal arithmetic, and s_pos/s_neg have the right signs") {
    val daily = graft.core.Tables.events(spark, sf)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(col("value").cast("decimal(10,2)")).as("x"))
      .collect().map(r => (r.getDate(0).toString, BigDecimal(r.getDecimal(1))))
      .sortBy(_._1)
    val n = daily.length
    val total = daily.map(_._2).sum
    var sPos = BigDecimal(0); var sNeg = BigDecimal(0)
    val expected = daily.map { case (day, x) =>
      val dev = BigDecimal(n) * x - total
      sPos = (sPos + dev).max(0); sNeg = (sNeg + dev).min(0)
      (day, sPos, sNeg)
    }
    val rows = graft.ext.TimeSeries.cusum.fn(spark, sf).collect()
    assert(rows.length == n)
    rows.zip(expected).foreach { case (r, (day, ep, en)) =>
      assert(r.getString(0) == day)
      assert(math.abs(r.getDouble(2) - ep.toDouble) < 1e-6,
        s"$day s_pos ${r.getDouble(2)} vs $ep")
      assert(math.abs(r.getDouble(3) - en.toDouble) < 1e-6,
        s"$day s_neg ${r.getDouble(3)} vs $en")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(3) <= 0.0)
    }
  }
}
