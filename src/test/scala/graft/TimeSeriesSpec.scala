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

  test("holt backtest: each cutoff's forecast equals a local prefix " +
    "fold, and abs_err is consistent") {
    val daily = graft.core.Tables.orders(spark, sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("rev"))
      .collect().map(r => (r.getDate(0).toString, r.getDecimal(1)
        .doubleValue)).sortBy(_._1).map(_._2)
    def fit(c: Int): (Double, Double) = {
      var l = daily(0); var b = daily(1) - daily(0)
      daily.slice(2, c).foreach { x =>
        val lNew = 0.5 * x + 0.5 * (l + b)
        b = 0.3 * ((0.5 * x + 0.5 * (l + b)) - l) + 0.7 * b
        l = lNew
      }
      (l, b)
    }
    val rows = graft.ext.TimeSeries.holtBacktest.fn(spark, sf).collect()
    assert(rows.length == 12)
    rows.foreach { r =>
      val c = r.getLong(0).toInt
      val (l, b) = fit(c)
      assert(math.abs(r.getDouble(1) - (l + b)) < 1e-9 *
        math.max(1.0, math.abs(l + b)), s"cutoff $c forecast")
      assert(math.abs(r.getDouble(2) - daily(c)) < 1e-9)
      assert(math.abs(r.getDouble(3) -
        math.abs(r.getDouble(1) - r.getDouble(2))) < 1e-12)
    }
  }

  test("mad outliers: top-5 deviations match a local recomputation and " +
    "the flag fires iff |x - med| > 4.4478 MAD") {
    val daily = graft.core.Tables.events(spark, sf)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(col("value").cast("decimal(10,2)")).as("x"))
      .collect().map(r => (r.getDate(0).toString, BigDecimal(r.getDecimal(1))))
      .sortBy(_._1)
    def lowerMedian(vs: Seq[BigDecimal]): BigDecimal =
      vs.sorted.apply((vs.size + 1) / 2 - 1)
    val med = lowerMedian(daily.map(_._2))
    val mad = lowerMedian(daily.map { case (_, x) => (x - med).abs })
    val di = daily.map { case (d, x) =>
      (d, ((x - med).abs * 100).toLongExact) }
    val mi = (mad * 100).toLongExact
    val local = di.map { case (d, dv) =>
      (d, dv * 1000000L / mi, if (dv * 10000L > mi * 44478L) 1L else 0L) }
      .sortBy { case (d, ppm, _) => (-ppm, d) }.take(5).toSeq
    val got = graft.ext.TimeSeries.madOutliers.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(4), r.getLong(5))).toSeq
    assert(got == local, s"spark $got vs local $local")
  }

  test("js drift matches a local recomputation, is bounded by ln 2, " +
    "and is zero for a week paired with itself") {
    val cells = graft.core.Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.date_trunc("week",
          org.apache.spark.sql.functions.col("ts")).as("wk"),
        org.apache.spark.sql.functions.col("event_type").as("et"))
      .count().collect()
      .map(r => ((r.getTimestamp(0), r.getString(1)), r.getLong(2)))
      .toMap
    val weeks = cells.keys.map(_._1).toSeq.distinct.sortBy(_.getTime)
    val types = cells.keys.map(_._2).toSeq.distinct.sorted
    def js(w1: java.sql.Timestamp, w2: java.sql.Timestamp): Double = {
      val n1 = types.map(t => cells.getOrElse((w1, t), 0L)).sum.toDouble
      val n2 = types.map(t => cells.getOrElse((w2, t), 0L)).sum.toDouble
      types.map { t =>
        val p = cells.getOrElse((w1, t), 0L) / n1
        val q = cells.getOrElse((w2, t), 0L) / n2
        val m = (p + q) / 2
        (if (p > 0) 0.5 * p * math.log(p / m) else 0.0) +
          (if (q > 0) 0.5 * q * math.log(q / m) else 0.0)
      }.sum
    }
    val got = graft.ext.TimeSeries.driftJs.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(got.size == weeks.size - 1)
    weeks.init.zip(weeks.tail).foreach { case (w1, w2) =>
      val key = new java.text.SimpleDateFormat("yyyy-MM-dd").format(w1)
      val expected = js(w1, w2)
      assert(math.abs(got(key) - expected) <= 1e-5,
        s"week $key: ${got(key)} vs local $expected")
      assert(got(key) >= 0.0 && got(key) <= math.log(2.0) + 1e-9)
      assert(math.abs(js(w1, w1)) <= 1e-12) // self-drift is exactly zero
    }
  }
}
