package graft

import org.apache.spark.sql.functions._

/** Statistical-test operators: verify the statistics against a local
  * straight-line recomputation from the raw fixture (the DuckDB gate
  * proves cross-engine equality; this proves the FORMULA is the one the
  * textbooks define, independent of both engines' plans).
  */
class StatsSpec extends SparkSuite {

  test("chi2 matches a local recomputation from raw cells, dof is " +
    "(types-1)x(hours-1), and the statistic is non-negative") {
    val cells = graft.core.Tables.events(spark, sf)
      .groupBy(col("event_type"), hour(col("ts")).as("hr"))
      .count().collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
    val n = cells.map(_._2).sum.toDouble
    val rt = cells.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum }
    val ct = cells.groupBy(_._1._2).map { case (k, v) => k -> v.map(_._2).sum }
    val expected = cells.sortBy(_._1).map { case ((et, hr), o) =>
      val e = rt(et).toDouble * ct(hr).toDouble / n
      (o - e) * (o - e) / e
    }.sum
    val row = graft.ext.Stats.chi2.fn(spark, sf).collect()(0)
    val (chi2, dof, nObs) = (row.getDouble(0), row.getLong(1), row.getLong(2))
    assert(math.abs(chi2 - expected) < 1e-6 * math.max(1.0, expected),
      s"chi2 $chi2 vs local $expected")
    assert(chi2 >= 0.0)
    assert(dof == (rt.size - 1).toLong * (ct.size - 1).toLong)
    assert(nObs == n.toLong)
  }

  test("welch t: moments match a local recomputation and df lands " +
    "between min(n)-1 and n_a+n_b-2 (Welch-Satterthwaite bounds)") {
    val vals = graft.core.Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    def moments(et: String) = {
      val xs = vals.filter(_._1 == et).map(_._2)
      val nn = xs.length
      val s = xs.sum.toDouble
      val m = s / nn
      (nn, m, xs.map(x => x * x).sum.toDouble)
    }
    val (na, ma, _) = moments("purchase")
    val (nb, mb, _) = moments("click")
    val row = graft.ext.Stats.welch.fn(spark, sf).collect()(0)
    assert(row.getLong(0) == na && row.getLong(1) == nb)
    assert(math.abs(row.getDouble(2) - ma) < 1e-9)
    assert(math.abs(row.getDouble(3) - mb) < 1e-9)
    val df = row.getDouble(5)
    assert(df >= math.min(na, nb) - 1 && df <= na + nb - 2,
      s"welch df $df outside [${math.min(na, nb) - 1}, ${na + nb - 2}]")
    assert(!row.getDouble(4).isNaN)
  }

  test("mann-whitney U matches a local average-rank recomputation, and " +
    "U stays within [0, n1*n2]") {
    val vals = graft.core.Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"),
        col("value").cast("decimal(10,2)")).collect()
      .map(r => (r.getString(0) == "purchase", r.getDecimal(1)))
    val sorted = vals.sortBy(_._2)
    // average ranks with ties
    val rankOf = sorted.map(_._2).distinct.map { v =>
      val idxs = sorted.zipWithIndex.filter(_._1._2 == v).map(_._2 + 1)
      v -> idxs.map(_.toDouble).sum / idxs.length
    }.toMap
    val r1 = vals.filter(_._1).map(v => rankOf(v._2)).sum
    val n1 = vals.count(_._1).toLong
    val n2 = vals.length - n1
    val expectedU = r1 - n1 * (n1 + 1) / 2.0
    val row = graft.ext.Stats.mannWhitney.fn(spark, sf).collect()(0)
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(math.abs(row.getDouble(2) - expectedU) < 1e-6,
      s"U ${row.getDouble(2)} vs local $expectedU")
    assert(row.getDouble(2) >= 0 && row.getDouble(2) <= n1.toDouble * n2)
    assert(!row.getDouble(3).isNaN)
  }

  test("correlation matrix matches a local recomputation and stays in " +
    "[-1, 1]") {
    val data = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax")).collect()
      .map(r => Array(r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)).map(v => BigDecimal(v)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
    def corrOf(i: Int, j: Int): Double = {
      val n = data.length.toDouble
      val (sx, sy) = (data.map(_(i)).sum, data.map(_(j)).sum)
      val sxx = data.map(v => v(i) * v(i)).sum
      val syy = data.map(v => v(j) * v(j)).sum
      val sxy = data.map(v => v(i) * v(j)).sum
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val names = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val got = graft.ext.Stats.corr.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.size == 6)
    got.foreach { case ((x, y), c) =>
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
      val local = corrOf(names.indexOf(x), names.indexOf(y))
      assert(math.abs(c - local) < 1e-6, s"corr($x,$y): $c vs $local")
    }
  }

  test("percentile_cont matches a local sorted-array interpolation for " +
    "every (type, p)") {
    val byType = graft.core.Tables.events(spark, sf)
      .select(col("event_type"), col("value").cast("decimal(10,2)"))
      .collect().map(r => (r.getString(0), r.getDecimal(1).doubleValue()))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    def local(vs: Array[Double], p: Double): Double = {
      val h = (vs.length - 1).toDouble * p
      val lo = math.floor(h).toInt
      val hi = math.min(lo + 1, vs.length - 1)
      vs(lo) + (h - lo) * (vs(hi) - vs(lo))
    }
    val got = graft.ext.Stats.percentileCont.fn(spark, sf).collect()
    assert(got.length == byType.size * 3)
    got.foreach { r =>
      val (t, p, v) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      val e = local(byType(t), p)
      assert(math.abs(v - e) < 1e-9, s"pct($t, $p): $v vs local $e")
    }
  }

  test("streaming ewma replays to exactly the batch ewma result " +
    "(bit-identical running values under the single-batch contract)") {
    val batch = graft.ext.EventsOps.eventsEwma.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val stream = graft.streaming.StreamEwma.run(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(stream == batch,
      s"stream and batch EWMA diverge on ${
        (stream.keySet ++ batch.keySet)
          .filter(k => stream.get(k) != batch.get(k)).take(3)}")
  }

  test("ewma equals a local left-to-right recurrence per user and stays " +
    "inside that user's value envelope") {
    val evs = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0),
        (r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3))))
    val expected = evs.groupBy(_._1).map { case (u, rows) =>
      val vs = rows.map(_._2).sortBy(t => (t._1, t._2)).map(_._3)
      u -> vs.tail.foldLeft(vs.head)((acc, x) => 0.2 * x + 0.8 * acc)
    }
    val got = graft.ext.EventsOps.eventsEwma.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, e) =>
      assert(math.abs(got(u) - e) < 1e-12, s"user $u: ${got(u)} vs $e")
      val vs = evs.filter(_._1 == u).map(_._2._3)
      assert(got(u) >= vs.min - 1e-12 && got(u) <= vs.max + 1e-12)
    }
  }

  test("ks two-sample: D equals the brute max CDF gap as an exact " +
    "fraction, and the 5% flag matches the asymptotic rule") {
    val vals = graft.core.Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "click"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val p = vals.filter(_._1 == "purchase").map(_._2).sorted
    val c = vals.filter(_._1 == "click").map(_._2).sorted
    val support = (p ++ c).distinct.sorted
    val dnum = support.map { v =>
      val f1 = p.count(_ <= v).toLong
      val f2 = c.count(_ <= v).toLong
      (f1 * c.length - f2 * p.length).abs
    }.max
    val r = graft.ext.Stats.ksTest.fn(spark, sf).collect()(0)
    assert(r.getLong(0) == p.length.toLong)
    assert(r.getLong(1) == c.length.toLong)
    assert(r.getLong(2) == dnum, s"d_num ${r.getLong(2)} vs $dnum")
    assert(r.getLong(4) == dnum * 1000000L / (p.length.toLong * c.length))
    val d = dnum.toDouble / (p.length.toLong * c.length)
    val crit = 1.358 * math.sqrt(
      (p.length + c.length).toDouble / (p.length.toLong * c.length))
    assert(r.getLong(5) == (if (d >= crit) 1L else 0L))
  }

  test("ols: coefficients match a local normal-equations solve, " +
    "residuals are orthogonal to the regressors, and r2 is in [0,1]") {
    val rows = graft.core.Tables.lineitem(spark, sf)
      .select("l_quantity", "l_discount", "l_extendedprice").collect()
      .map(r => (BigDecimal(r.getDouble(0)).setScale(2),
        BigDecimal(r.getDouble(1)).setScale(2),
        BigDecimal(r.getDouble(2)).setScale(2)))
    val n = rows.length.toDouble
    def s(f: ((BigDecimal, BigDecimal, BigDecimal)) => BigDecimal) =
      rows.map(f).sum.toDouble
    val (s1, s2, sy) = (s(_._1), s(_._2), s(_._3))
    val c11 = n * s(t => t._1 * t._1) - s1 * s1
    val c22 = n * s(t => t._2 * t._2) - s2 * s2
    val c12 = n * s(t => t._1 * t._2) - s1 * s2
    val c1y = n * s(t => t._1 * t._3) - s1 * sy
    val c2y = n * s(t => t._2 * t._3) - s2 * sy
    val det = c11 * c22 - c12 * c12
    val b1 = (c22 * c1y - c12 * c2y) / det
    val b2 = (c11 * c2y - c12 * c1y) / det
    val b0 = (sy - b1 * s1 - b2 * s2) / n
    val r = graft.ext.Stats.ols.fn(spark, sf).collect()(0)
    assert(r.getLong(0) == rows.length.toLong)
    assert(math.abs(r.getDouble(1) - b0) <= 1e-9 * math.abs(b0),
      s"b0 ${r.getDouble(1)} vs local $b0")
    assert(math.abs(r.getDouble(2) - b1) <= 1e-9 * math.abs(b1),
      s"b1 ${r.getDouble(2)} vs local $b1")
    assert(math.abs(r.getDouble(3) - b2) <= 1e-9 * math.abs(b2),
      s"b2 ${r.getDouble(3)} vs local $b2")
    val r2 = r.getDouble(4)
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2 $r2 out of range")
    // normal equations ARE the orthogonality conditions: X'(y - Xb) = 0
    val res1 = rows.map(t => t._1.toDouble *
      (t._3.toDouble - b0 - b1 * t._1.toDouble - b2 * t._2.toDouble)).sum
    assert(math.abs(res1) <= 1e-6 * rows.map(t =>
      (t._1 * t._3).abs.toDouble).sum)
    assert(r.getDouble(5) > 0.0 && r.getDouble(6) > 0.0) // standard errors
  }
}
