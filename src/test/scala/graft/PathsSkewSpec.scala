package graft

import org.apache.spark.sql.functions._

/** Local recomputations for the batch-3 round-9 ops: Holt fold, trigram
  * path census, and the skew audit's exact-p99 contract.
  */
class PathsSkewSpec extends SparkSuite {

  test("holt forecast equals a local fold, and forecasts are linear " +
    "in the horizon") {
    val daily = graft.core.Tables.orders(spark, sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("rev"))
      .collect().map(r => (r.getDate(0).toString, r.getDecimal(1)
        .doubleValue)).sortBy(_._1).map(_._2)
    var l = daily(0); var b = daily(1) - daily(0)
    daily.drop(2).foreach { x =>
      val lNew = 0.5 * x + 0.5 * (l + b)
      b = 0.3 * ((0.5 * x + 0.5 * (l + b)) - l) + 0.7 * b
      l = lNew
    }
    val rows = graft.ext.TimeSeries.holt.fn(spark, sf).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val (h, lev, tr, f) = (r.getLong(0), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))
      assert(math.abs(lev - l) < 1e-9 * math.max(1.0, math.abs(l)),
        s"level $lev vs $l")
      assert(math.abs(tr - b) < 1e-9 * math.max(1.0, math.abs(b)))
      assert(math.abs(f - (lev + h * tr)) < 1e-9)
    }
  }

  test("trigram paths equal a local census with the same ordering and " +
    "the 30-min session split") {
    def us(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val ev = graft.core.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), us(r.getTimestamp(1)), r.getLong(2),
        r.getString(3)))
    val local = ev.groupBy(_._1).values.flatMap { rows =>
      val ordered = rows.sortBy(r => (r._2, r._3)).toSeq
      // split at >30-min gaps (the ext_sessionize boundary), THEN expand
      val sessions = ordered.foldLeft(List.empty[List[(Long, String)]]) {
        case (acc, r) => acc match {
          case (cur @ ((lastUs, _) :: _)) :: rest
              if r._2 - lastUs <= 1800000000L =>
            ((r._2, r._4) :: cur) :: rest
          case _ => List((r._2, r._4)) :: acc
        }
      }.map(_.reverse.map(_._2))
      sessions.flatMap(seq =>
        seq.sliding(3).filter(_.length == 3).map(_.mkString(">")))
    }.toSeq.groupBy(identity).map { case (p, ps) => (p, ps.size.toLong) }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = graft.ext.ClickPaths.sessionPaths.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == local, s"spark $got vs local $local")
  }

  test("skew audit: p99 is the smallest count at or above the 99% rank, " +
    "ratio consistent, all four keys present") {
    val rows = graft.ext.SkewAudit.skewAudit.fn(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("events.user_id",
      "lineitem.l_orderkey", "lineitem.l_partkey", "orders.o_custkey"))
    rows.foreach { r =>
      val (nk, nr, mx, p99b, p99, ratio) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(p99 <= mx && p99b <= p99)
      assert(ratio == mx * nk * 1000000L / nr)
      assert(nr >= nk && mx >= 1)
    }
    // cross-check one audited key against a local census
    val cnts = graft.core.Tables.events(spark, sf)
      .groupBy("user_id").count().collect().map(_.getLong(1)).sorted
    val n = cnts.length
    val cut = cnts.zipWithIndex
      .filter { case (_, i) => (i + 1) * 100 >= n * 99 }.map(_._1)
    val row = rows.find(_.getString(0) == "events.user_id").get
    assert(row.getLong(1) == n.toLong)
    assert(row.getLong(3) == cnts.last)
    assert(row.getLong(5) == cut.head)
  }

  test("stickiness: dau <= wau <= mau, ratios consistent, counts match " +
    "a local census") {
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("date").as("d")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val d0 = ev.map(_._2).maxBy(_.toEpochDay)
    def users(days: Int) = ev.filter(
      _._2.toEpochDay >= d0.toEpochDay - (days - 1)).map(_._1).distinct.size
    val r = graft.ext.ClickPaths.stickiness.fn(spark, sf).collect()(0)
    assert(r.getString(0) == d0.toString)
    assert(r.getLong(1) == users(1).toLong)
    assert(r.getLong(2) == users(7).toLong)
    assert(r.getLong(3) == users(30).toLong)
    assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3))
    assert(r.getLong(4) == r.getLong(1) * 1000000L / r.getLong(3))
    assert(r.getLong(5) == r.getLong(2) * 1000000L / r.getLong(3))
  }

  test("funnel latency plan holds no user-sized array aggregate " +
    "(bucket-rank percentiles, no collect_list)") {
    val plan = graft.ext.ClickPaths.funnelLatency.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list") && !plan.contains("sort_array"),
      s"percentile must stay bucket-rank, not a global array:\n$plan")
  }

  test("funnel latency matches a local first-view/first-purchase replay") {
    val ev = graft.core.Tables.events(spark, sf)
      .select("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
    def us(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val byUser = ev.groupBy(_._1)
    val lats = byUser.toSeq.flatMap { case (_, rows) =>
      val views = rows.filter(_._3 == "view").map(r => us(r._2))
      if (views.isEmpty) None
      else {
        val fv = views.min
        val ps = rows.filter(r => r._3 == "purchase"
          && us(r._2) >= fv).map(r => us(r._2))
        ps.minOption.map(fp => (fp - fv) / 1000000L)
      }
    }.sorted
    val r = graft.ext.ClickPaths.funnelLatency.fn(spark, sf).collect()(0)
    val nViewers = byUser.count(_._2.exists(_._3 == "view")).toLong
    assert(r.getLong(0) == nViewers)
    assert(r.getLong(1) == lats.size.toLong)
    assert(r.getLong(2) == lats((lats.size + 1) / 2 - 1))
    assert(r.getLong(3) == lats((lats.size * 9 + 9) / 10 - 1))
    assert(r.getLong(4) == lats.last)
    assert(r.getLong(5) == lats.sum / lats.size)
  }
}
