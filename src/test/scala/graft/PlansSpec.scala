package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import graft.plans.{AsOf, AsOfJoinExec}

/** The custom-plan tier: AsOfJoinPlan -> GraftStrategy -> AsOfJoinExec,
  * plus the pushdown/pruning optimizer rule. */
class PlansSpec extends SparkSuite {
  import spark.implicits._

  private def deals: DataFrame = Seq(
    // (entity, time, payload)
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 20L, 2.0), ("a", 40L, 3.0),
    ("b", 15L, 9.0),
    ("c", 99L, 7.0)
  ).toDF("k", "t", "v")

  private def probes: DataFrame = Seq(
    ("a", 5L), ("a", 10L), ("a", 25L), ("a", 1000L),
    ("b", 14L), ("b", 15L), ("b", 16L),
    ("d", 50L) // key with no right rows at all
  ).toDF("pk", "pt")

  private def executed(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def find[T](p: SparkPlan)(f: PartialFunction[SparkPlan, T]): Seq[T] =
    p.collect(f)

  test("as-of backward: latest at-or-before per probe, null for misses, " +
    "null keys/times excluded") {
    val got = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t")
      .select("pk", "pt", "v").as[(String, Long, Option[Double])]
      .collect().toSet
    assert(got == Set(
      ("a", 5L, None),          // before the first deal
      ("a", 10L, Some(1.0)),    // exactly at
      ("a", 25L, Some(2.0)),    // between 20 and 40
      ("a", 1000L, Some(3.0)),  // far after the last
      ("b", 14L, None),
      ("b", 15L, Some(9.0)),
      ("b", 16L, Some(9.0)),
      ("d", 50L, None)))
  }

  test("as-of backward with tolerance: stale matches drop to null") {
    val got = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t",
      tolerance = Some(10L))
      .select("pk", "pt", "v").as[(String, Long, Option[Double])]
      .collect().toSet
    assert(got(("a", 25L, Some(2.0))) && got(("a", 1000L, None)),
      s"tolerance=10 should keep (a,25) and drop (a,1000): $got")
  }

  test("as-of forward: earliest at-or-after per probe") {
    val got = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t",
      forward = true)
      .select("pk", "pt", "v").as[(String, Long, Option[Double])]
      .collect().toSet
    assert(got == Set(
      ("a", 5L, Some(1.0)),
      ("a", 10L, Some(1.0)),
      ("a", 25L, Some(3.0)),
      ("a", 1000L, None),
      ("b", 14L, Some(9.0)),
      ("b", 15L, Some(9.0)),
      ("b", 16L, None),
      ("d", 50L, None)))
  }

  test("null keys and null times never match but left rows survive") {
    val l = Seq(("a", Some(30L)), (null.asInstanceOf[String], Some(30L)),
      ("a", None)).toDF("pk", "pt")
    val r = Seq(("a", Some(10L), 1.0), (null.asInstanceOf[String],
      Some(5L), 8.0), ("a", None, 9.0))
      .toDF("k", "t", "v")
    val got = AsOf.join(l, r, Seq("pk" -> "k"), "pt", "t")
      .select("pk", "pt", "v")
      .collect().map(x => (Option(x.get(0)), Option(x.get(1)),
        Option(x.get(2)))).toSet
    assert(got == Set(
      (Some("a"), Some(30L), Some(1.0)),
      (None, Some(30L), None),
      (Some("a"), None, None)), got.toString)
  }

  test("plan shape: AsOfJoinExec is planned (no BNLJ), exactly one " +
    "exchange per side and none above the join") {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    val df = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t")
    val plan = executed(df)
    // walk through AQE stage boundaries, tracking whether we are above or
    // below the as-of join
    var asofs = 0; var exBelow = 0; var exAbove = 0
    def walk(p: SparkPlan, below: Boolean): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, below)
      case q: QueryStageExec => walk(q.plan, below)
      case e: AsOfJoinExec =>
        asofs += 1; e.children.foreach(walk(_, below = true))
      case s: ShuffleExchangeLike =>
        if (below) exBelow += 1 else exAbove += 1
        s.children.foreach(walk(_, below))
      case other => other.children.foreach(walk(_, below))
    }
    walk(plan, below = false)
    assert(asofs == 1, s"expected one AsOfJoinExec in:\n$plan")
    assert(!plan.toString.contains("BroadcastNestedLoop"))
    assert(exBelow == 2, s"expected one shuffle per side, got $exBelow:\n$plan")
    assert(exAbove == 0, s"exchange above the as-of join:\n$plan")
  }

  test("matches the union+window composed equivalent on fixture data " +
    "(events as-of orders)") {
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
    val or = graft.core.Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("ck"), col("o_orderdate").as("ot"))
      .agg(max("o_totalprice").as("price"))
    val fast = AsOf.join(ev, or, Seq("user_id" -> "ck"), "ts", "ot")
      .select($"event_id", $"ot", $"price")
    // composed reference: per event the max order date <= ts, then join
    val latest = ev.join(or, $"user_id" === $"ck" && $"ot" <= $"ts", "left")
      .groupBy("event_id").agg(max("ot").as("lot"))
    val or2 = or.select(col("ck").as("ck2"), col("ot").as("ot2"),
      col("price").as("price2"))
    val slow = ev.select("event_id", "user_id", "ts")
      .join(latest, Seq("event_id"), "left")
      .join(or2, $"user_id" === $"ck2" && $"ot2" === $"lot", "left")
      .select($"event_id", $"lot", $"price2")
    val a = fast.collect().map(r => (r.getLong(0), Option(r.get(1)),
      Option(r.get(2)))).toSet
    val b = slow.collect().map(r => (r.getLong(0), Option(r.get(1)),
      Option(r.get(2)))).toSet
    assert(a == b, s"asof vs composed: ${(a diff b).take(5)} / ${(b diff a).take(5)}")
    assert(a.exists(_._3.isDefined), "fixture produced no matches at all")
  }

  test("optimizer rule: left-only filters push through to the scan; " +
    "projection prunes both scan schemas") {
    val ev = graft.core.Tables.events(spark, sf)
    val or = graft.core.Tables.orders(spark, sf)
      .select(col("o_custkey").as("ck"), col("o_orderdate").as("ot"),
        col("o_totalprice").as("price"), col("o_orderpriority"))
    val df = AsOf.join(ev, or, Seq("user_id" -> "ck"), "ts", "ot")
      .filter($"user_id" <= 5 && $"price" > 0)
      .select("event_id", "price")
    // logical: filter on user_id must sit below the AsOfJoinPlan
    val opt = df.queryExecution.optimizedPlan
    val j = opt.collectFirst {
      case p: graft.plans.AsOfJoinPlan => p }.get
    assert(j.left.toString.contains("user_id"),
      s"left filter not pushed below the as-of join:\n$opt")
    // physical: scans are pruned + filtered
    val plan = executed(df)
    val scans = plan.toString
    assert(scans.contains("PushedFilters: [IsNotNull(user_id), " +
      "LessThanOrEqual(user_id,5)]") ||
      scans.contains("LessThanOrEqual(user_id,5)"),
      s"no pushed filter on events scan:\n$scans")
    assert(!scans.contains("o_orderpriority"),
      s"right scan still reads o_orderpriority after pruning:\n$scans")
    assert(!scans.contains("props"),
      s"left scan still reads the wide props column after pruning:\n$scans")
    // and values survive the rewrites
    assert(df.count() > 0)
  }

  test("output ordering is declared: a downstream sort on (key, time) " +
    "adds no SortExec above the join") {
    val df = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t")
      .sortWithinPartitions("pk", "pt")
    val plan = executed(df)
    val sortsAbove = find(plan) {
      case s: org.apache.spark.sql.execution.SortExec
        if s.collectFirst { case e: AsOfJoinExec => e }.nonEmpty => s
    }
    assert(sortsAbove.isEmpty,
      s"redundant sort above as-of join despite outputOrdering:\n$plan")
  }

  test("duplicate probe keys at scale: every left row appears exactly " +
    "once in the output") {
    val n = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t").count()
    assert(n == probes.count())
  }
}
