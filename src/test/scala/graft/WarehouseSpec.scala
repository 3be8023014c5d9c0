package graft

import org.apache.spark.sql.functions._

import graft.ext.Warehouse

/** Plan and invariant pins for the dimensional-warehouse ops. */
class WarehouseSpec extends SparkSuite {

  test("star denorm: one shuffle join, every dimension hop broadcast") {
    val df = Warehouse.starDenorm.fn(spark, sf)
    df.collect()
    // AQE's rendering carries Final + Initial sections; pin the final one
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).size
    // the five dimension hops must all be broadcast; at fixture scale AQE
    // may legally convert the tiny fact join to a sixth broadcast
    assert(nBroadcast >= 5,
      s"expected >=5 broadcast dimension joins, got $nBroadcast:\n$plan")
    // at most the lineitem |><| orders join may shuffle
    val nOther = ("SortMergeJoin".r.findAllIn(plan).size
      + "ShuffledHashJoin".r.findAllIn(plan).size)
    assert(nOther <= 1,
      s"expected at most 1 shuffled fact join, got $nOther:\n$plan")
  }

  test("star denorm: broadcast is PINNED only on bounded dims (nation/" +
    "region/supplier); customer and part are size-gated, not forced") {
    // customer scales with orders and part with lineitem/30 — a forced
    // broadcast() on either OOMs at the 100 TB operating point. The pin:
    // exactly 3 broadcast hints survive analysis (the executed-plan
    // broadcasts above come from AQE/size thresholds, which is the point).
    val analyzed = Warehouse.starDenorm.fn(spark, sf)
      .queryExecution.analyzed.toString
    val nHints = "ResolvedHint".r.findAllIn(analyzed).size
    assert(nHints == 3,
      s"expected exactly 3 pinned broadcast hints, got $nHints:\n$analyzed")
  }

  test("star denorm: row count equals lineitem (dims are total functions)") {
    val n = Warehouse.starDenorm.fn(spark, sf).count()
    val li = graft.core.Tables.lineitem(spark, sf).count()
    assert(n == li, s"denormalized fact must be row-for-row: $n vs $li")
  }

  test("date dim: contiguous days, ISO weekday cycle, month-end flags") {
    val rows = Warehouse.dateDim.fn(spark, sf).collect()
    assert(rows.length > 365)
    val dates = rows.map(_.getAs[String]("d_date"))
    assert(dates.sorted.sameElements(dates), "must be date-ordered")
    // contiguity: row count equals day span between endpoints
    val span = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(dates.head),
      java.time.LocalDate.parse(dates.last)) + 1
    assert(span == rows.length, s"gaps in calendar: $span vs ${rows.length}")
    // ISO weekday advances mod 7 along consecutive days
    val dows = rows.map(_.getAs[Long]("d_isodow"))
    dows.sliding(2).foreach { case Array(a, b) =>
      assert(b == a % 7 + 1, s"weekday cycle broken: $a -> $b")
    }
    val jan1 = rows.find(_.getAs[String]("d_date") == "1996-01-31").get
    assert(jan1.getAs[Boolean]("d_is_month_end"))
    assert(jan1.getAs[String]("d_month_name") == "January")
  }

  test("dq audit: clean fixture yields zero violations on keyed checks") {
    val m = Warehouse.dqAudit.fn(spark, sf).collect()
      .map(r => r.getAs[String]("check_name") ->
        (r.getAs[Long]("n_checked"), r.getAs[Long]("n_violations"))).toMap
    assert(m.keySet.size == 7)
    // fixture generator emits referentially-intact keyed data
    assert(m("pk_unique_orders")._2 == 0)
    assert(m("fk_orders_customer")._2 == 0)
    assert(m("fk_lineitem_orders")._2 == 0)
    assert(m("enum_orderstatus")._2 == 0)
    // every check audited the full table it names
    assert(m("pk_unique_orders")._1 == m("enum_orderstatus")._1)
    assert(m("range_discount")._1 == m("nonneg_extendedprice")._1)
  }

  test("unpivot: 4x row expansion, per-metric sums match the wide table") {
    val long = Warehouse.unpivot.fn(spark, sf)
    val li = graft.core.Tables.lineitem(spark, sf)
    assert(long.count() == 4 * li.count())
    val qtyLong = long.filter(col("metric") === "quantity")
      .agg(sum("amount")).head.getDouble(0)
    val qtyWide = li.agg(sum("l_quantity")).head.getDouble(0)
    assert(math.abs(qtyLong - qtyWide) < 1e-6)
  }

  test("pareto share: the counted prefix is the MINIMAL set reaching " +
    "80% of revenue (one fewer customer falls short)") {
    import org.apache.spark.sql.functions.col
    val revs = graft.core.Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions
        .sum(col("o_totalprice").cast("decimal(12,2)")).as("r"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1)))
      .sortBy { case (k, r) => (r.negate, k) } // desc revenue, asc key
    val total = revs.map(_._2).reduce(_ add _)
    val row = graft.ext.Warehouse.paretoShare.fn(spark, sf).collect()(0)
    val (nCust, n80) = (row.getLong(0), row.getLong(1))
    assert(nCust == revs.length)
    assert(n80 >= 1 && n80 <= nCust)
    def cumAt(k: Int) = revs.take(k).map(_._2).reduce(_ add _)
    // prefix of n80 reaches 80%: cum*5 >= total*4
    assert(cumAt(n80.toInt).multiply(java.math.BigDecimal.valueOf(5))
      .compareTo(total.multiply(java.math.BigDecimal.valueOf(4))) >= 0)
    // one fewer does not
    if (n80 > 1)
      assert(cumAt(n80.toInt - 1).multiply(java.math.BigDecimal.valueOf(5))
        .compareTo(total.multiply(java.math.BigDecimal.valueOf(4))) < 0)
  }

  test("rfm census: scores are quintiles 1..5 and segment counts sum " +
    "to the customer count") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val rows = graft.ext.Warehouse.rfm.fn(spark, sf).collect()
    val nCust = graft.core.Tables.orders(spark, sf)
      .agg(countDistinct(col("o_custkey"))).head.getLong(0)
    assert(rows.map(_.getLong(3)).sum == nCust)
    rows.foreach { r =>
      (0 to 2).foreach(i =>
        assert(r.getLong(i) >= 1 && r.getLong(i) <= 5))
    }
  }

  test("backlog curve: conservation (sum opened = sum closed), backlog " +
    "non-negative, ends at zero, and matches a local replay") {
    val rows = graft.ext.Warehouse.backlogCurve.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    assert(rows.map(_._2).sum == rows.map(_._3).sum,
      "every opened order must eventually close")
    var bl = 0L
    rows.foreach { case (m, o, c, b) =>
      bl += o - c
      assert(b == bl, s"$m backlog $b vs replay $bl")
      assert(b >= 0, s"$m negative backlog")
    }
    assert(rows.last._4 == 0L, "curve must end fully drained")
  }

  test("interarrival plan holds no fact-sized array aggregate " +
    "(bucket-rank percentiles, no collect_list)") {
    val plan = graft.ext.Warehouse.interarrival.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list") && !plan.contains("sort_array"),
      s"percentile must stay bucket-rank, not a global array:\n$plan")
  }

  test("interarrival percentiles match a local lag-and-sort replay") {
    val orders = graft.core.Tables.orders(spark, sf)
      .select("o_custkey", "o_orderdate", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val gaps = orders.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2.getTime, r._3))
      sorted.zip(sorted.tail).map { case (a, b) =>
        (b._2.getTime - a._2.getTime) / 86400000L }
    }.toSeq.sorted
    val r = graft.ext.Warehouse.interarrival.fn(spark, sf).collect()(0)
    val n = gaps.size
    assert(r.getLong(0) == n.toLong)
    assert(r.getLong(1) == gaps((n + 3) / 4 - 1))
    assert(r.getLong(2) == gaps((n + 1) / 2 - 1))
    assert(r.getLong(3) == gaps((n * 3 + 3) / 4 - 1))
    assert(r.getLong(4) == gaps((n * 9 + 9) / 10 - 1))
    assert(r.getLong(5) == gaps.sum / n)
  }

  test("ship delay percentiles match a local join-and-sort replay " +
    "per priority") {
    val orders = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority", "o_orderdate").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getTimestamp(2)))
      .toMap
    val gaps = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_shipdate").collect()
      .map { r =>
        val (pri, od) = orders(r.getLong(0))
        (pri, (r.getTimestamp(1).getTime - od.getTime) / 86400000L)
      }
    val expected = gaps.groupBy(_._1).map { case (pri, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length
      (pri, n.toLong, sorted((n + 1) / 2 - 1), sorted((n * 9 + 9) / 10 - 1),
        sorted.last, sorted.sum / n)
    }.toSeq.sortBy(_._1)
    val got = graft.ext.Warehouse.shipDelay.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"spark $got vs local $expected")
    got.foreach { case (_, n, p50, p90, mx, mean) =>
      assert(n > 0 && p50 <= p90 && p90 <= mx && mean >= 0)
    }
  }

  test("supplier hhi: bounds 1/n <= hhi <= 1, and a local recomputation " +
    "agrees for every returned part") {
    val rows = graft.ext.Warehouse.supplierHhi.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val li = graft.core.Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    rows.foreach { case (part, ns, tot, hhi) =>
      val qs = li.filter(_._1 == part).groupBy(_._2)
        .map { case (_, xs) => math.round(xs.map(_._3).sum) }.toSeq
      assert(qs.size.toLong == ns && qs.sum == tot)
      val local = qs.map(q => BigInt(q) * q).sum * 1000000 /
        (BigInt(tot) * tot)
      assert(BigInt(hhi) == local, s"part $part hhi $hhi vs $local")
      assert(hhi <= 1000000L && hhi >= 1000000L / ns)
    }
  }
}
