package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import graft.plans.{AsOf, AsOfJoinExec, IntervalJoin}

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

  // every semantic case runs under BOTH physical variants
  private val variants = Seq(
    "shuffle" -> Some(false), "broadcast" -> Some(true))

  test("as-of backward: latest at-or-before per probe, null for misses, " +
    "null keys/times excluded — both variants") {
    for ((name, bc) <- variants) {
      val got = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t",
        broadcastRight = bc)
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
        ("d", 50L, None)), s"variant=$name")
    }
  }

  test("as-of backward with tolerance: stale matches drop to null — " +
    "both variants") {
    for ((name, bc) <- variants) {
      val got = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t",
        tolerance = Some(10L), broadcastRight = bc)
        .select("pk", "pt", "v").as[(String, Long, Option[Double])]
        .collect().toSet
      assert(got(("a", 25L, Some(2.0))) && got(("a", 1000L, None)),
        s"variant=$name: tolerance=10 should keep (a,25), drop (a,1000): $got")
    }
  }

  test("as-of forward: earliest at-or-after per probe — both variants") {
    for ((name, bc) <- variants) {
      val got = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t",
        forward = true, broadcastRight = bc)
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
        ("d", 50L, None)), s"variant=$name")
    }
  }

  test("null keys and null times never match but left rows survive — " +
    "both variants") {
    val l = Seq(("a", Some(30L)), (null.asInstanceOf[String], Some(30L)),
      ("a", None)).toDF("pk", "pt")
    val r = Seq(("a", Some(10L), 1.0), (null.asInstanceOf[String],
      Some(5L), 8.0), ("a", None, 9.0))
      .toDF("k", "t", "v")
    for ((name, bc) <- variants) {
      val got = AsOf.join(l, r, Seq("pk" -> "k"), "pt", "t",
        broadcastRight = bc)
        .select("pk", "pt", "v")
        .collect().map(x => (Option(x.get(0)), Option(x.get(1)),
          Option(x.get(2)))).toSet
      assert(got == Set(
        (Some("a"), Some(30L), Some(1.0)),
        (None, Some(30L), None),
        (Some("a"), None, None)), s"variant=$name: $got")
    }
  }

  test("plan shape: AsOfJoinExec is planned (no BNLJ), exactly one " +
    "exchange per side and none above the join") {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    val df = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t",
      broadcastRight = Some(false))
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

  test("stats-driven variant choice: tiny right side plans broadcast " +
    "(no shuffle anywhere), huge-threshold pin plans co-partitioned; " +
    "values identical") {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
    val mk = (bc: Option[Boolean]) => AsOf.join(
      probes, deals, Seq("pk" -> "k"), "pt", "t", broadcastRight = bc)
    // default on a tiny right side -> broadcast variant
    val dfB = mk(None)
    val planB = executed(dfB)
    var bcasts = 0; var shuffles = 0; var bexec = 0
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case e: graft.plans.BroadcastAsOfJoinExec =>
        bexec += 1; e.children.foreach(walk)
      case s: ShuffleExchangeLike => shuffles += 1; s.children.foreach(walk)
      case b: BroadcastExchangeLike => bcasts += 1; b.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(planB)
    assert(bexec == 1 && bcasts == 1 && shuffles == 0,
      s"expected broadcast as-of with zero shuffles:\n$planB")
    // same values as the pinned co-partitioned variant
    val a = dfB.collect().map(_.toString).sorted
    val b = mk(Some(false)).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("limit pushdown: a limit above the as-of join bounds the LEFT " +
    "child (1:1 output), and the result is still valid as-of rows") {
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
    val or = graft.core.Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("ck"), col("o_orderdate").as("ot"))
      .agg(max("o_totalprice").as("price"))
    val df = AsOf.join(ev, or, Seq("user_id" -> "ck"), "ts", "ot").limit(7)
    val opt = df.queryExecution.optimizedPlan
    val j = opt.collectFirst { case p: graft.plans.AsOfJoinPlan => p }.get
    assert(j.left.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalLimit => l
    }.nonEmpty, s"limit not pushed into the as-of left child:\n$opt")
    assert(df.count() == 7)
  }

  test("output ordering is declared: a downstream sort on (key, time) " +
    "adds no SortExec above the join") {
    val df = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t",
      broadcastRight = Some(false))
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

  test("DATE-typed time columns exercise the int-width path in all four " +
    "execs — values match the long-typed equivalent") {
    // as-of: orders as-of orders by o_orderdate (DateType)
    val or = graft.core.Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("ck"), col("o_orderdate").cast("date")
        .as("od"))
      .agg(max("o_totalprice").as("price"))
    val probes = or.select(col("ck").as("pk"), col("od").as("pd"))
    for (bc <- Seq(Some(false), Some(true))) {
      val viaDate = AsOf.join(probes, or, Seq("pk" -> "ck"), "pd", "od",
        tolerance = Some(30L), broadcastRight = bc) // 30 DAYS (native unit)
        .select(col("pk"), col("pd"), col("price"))
        .collect().map(r => (r.getLong(0), r.get(1).toString,
          Option(r.get(2)))).toSet
      val longProbes = probes.select(col("pk"),
        datediff(col("pd"), lit("1992-01-01")).cast("long").as("pd"))
      val longOr = or.select(col("ck"),
        datediff(col("od"), lit("1992-01-01")).cast("long").as("od"),
        col("price"))
      val viaLong = AsOf.join(longProbes, longOr, Seq("pk" -> "ck"),
        "pd", "od", tolerance = Some(30L), broadcastRight = bc)
        .select(col("pk"), col("pd"), col("price"))
        .collect().map(r => (r.getLong(0),
          java.time.LocalDate.of(1992, 1, 1).plusDays(r.getLong(1))
            .toString, Option(r.get(2)))).toSet
      assert(viaDate == viaLong, s"bc=$bc: date vs long path diverged: " +
        s"${(viaDate diff viaLong).take(3)} / ${(viaLong diff viaDate).take(3)}")
      assert(viaDate.exists(_._3.isDefined))
    }
    // interval join: per-customer order-date windows [od, od+7d)
    val l = or.select(col("ck").as("lk"), col("od").as("lst"),
      date_add(col("od"), 7).as("len"), col("price").as("lp"))
    val r = or.select(col("ck").as("rk"), col("od").as("rst"),
      date_add(col("od"), 7).as("ren"), col("price").as("rp"))
    for (bc <- Seq(Some(false), Some(true))) {
      val fast = graft.plans.IntervalJoin.join(l, r, Seq("lk" -> "rk"),
        "lst", "len", "rst", "ren", broadcastRight = bc)
        .select("lp", "rp").collect()
        .map(x => (x.get(0), x.get(1))).toSet
      val slow = l.join(r, col("lk") === col("rk") &&
        col("lst") < col("ren") && col("rst") < col("len"))
        .select("lp", "rp").collect()
        .map(x => (x.get(0), x.get(1))).toSet
      assert(fast == slow && fast.nonEmpty, s"bc=$bc interval DATE path")
    }
  }

  test("interval join buffer cap: a pathological overlap pileup fails " +
    "loudly and attributably instead of growing the active set") {
    val key = "graft.interval.buffer.cap"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "10")
    try {
      val l = Seq.tabulate(40)(i => ("k", 0L + i, 1000L, i))
        .toDF("k", "st", "en", "lv")
      val r = Seq.tabulate(40)(i => ("k", 0L + i, 1000L, i))
        .toDF("rk", "rst", "ren", "rv")
      val e = intercept[Exception] {
        graft.plans.IntervalJoin.join(l, r, Seq("k" -> "rk"),
          "st", "en", "rst", "ren", broadcastRight = Some(false)).count()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("graft.interval.buffer.cap")),
        s"expected the cap throw, got: $e")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("composite equi-keys: two-column key as-of and interval joins " +
    "isolate on BOTH columns — both variants") {
    val l = Seq(("a", 1, 10L, "l1"), ("a", 2, 10L, "l2"), ("b", 1, 10L, "l3"))
      .toDF("k1", "k2", "t", "tag")
    val r = Seq(("a", 1, 5L, "r-a1"), ("a", 2, 7L, "r-a2"),
      ("b", 2, 3L, "r-b2")).toDF("rk1", "rk2", "rt", "rtag")
    for (bc <- Seq(Some(false), Some(true))) {
      val got = AsOf.join(l, r, Seq("k1" -> "rk1", "k2" -> "rk2"),
        "t", "rt", broadcastRight = bc)
        .select("tag", "rtag").collect()
        .map(x => (x.getString(0), Option(x.get(1)))).toSet
      assert(got == Set(("l1", Some("r-a1")), ("l2", Some("r-a2")),
        ("l3", None)), s"bc=$bc: $got")
      val il = l.select(col("k1"), col("k2"), col("t").as("st"),
        (col("t") + 10L).as("en"), col("tag"))
      val ir = r.select(col("rk1"), col("rk2"), col("rt").as("rst"),
        (col("rt") + 10L).as("ren"), col("rtag"))
      val ovl = graft.plans.IntervalJoin.join(il, ir,
        Seq("k1" -> "rk1", "k2" -> "rk2"), "st", "en", "rst", "ren",
        broadcastRight = bc)
        .select("tag", "rtag").as[(String, String)].collect().toSet
      assert(ovl == Set(("l1", "r-a1"), ("l2", "r-a2")), s"bc=$bc: $ovl")
    }
  }

  test("SQL metrics: numOutputRows counts every left row, numMatched " +
    "counts only matches — both variants") {
    for ((name, bc) <- variants) {
      val df = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t",
        broadcastRight = bc)
      df.collect()
      import org.apache.spark.sql.execution.adaptive.QueryStageExec
      var found: Option[Map[String,
        org.apache.spark.sql.execution.metric.SQLMetric]] = None
      def walk(p: SparkPlan): Unit = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case e: AsOfJoinExec => found = Some(e.metrics)
        case e: graft.plans.BroadcastAsOfJoinExec => found = Some(e.metrics)
        case other => other.children.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      val metrics = found.get
      assert(metrics("numOutputRows").value == 8, s"variant=$name")
      assert(metrics("numMatched").value == 5, s"variant=$name")
    }
  }

  // ---- interval join ----

  private def livs: DataFrame = Seq(
    ("a", 0L, 10L, "A1"), ("a", 5L, 15L, "A2"), ("a", 20L, 25L, "A3"),
    // start == end: a point probe — matches intervals strictly
    // containing 30 (the raw SQL predicate's reading; fuzz-pinned)
    ("a", 30L, 30L, "Apoint"),
    ("b", 0L, 100L, "B1"),
    ("d", 0L, 9L, "D1")        // no right rows for this key
  ).toDF("k", "st", "en", "tag")

  private def rivs: DataFrame = Seq(
    ("a", 8L, 12L, "ra1"),   // overlaps A1 [0,10) and A2 [5,15)
    ("a", 15L, 21L, "ra2"),  // touches A2 at 15 (no: half-open), hits A3
    ("a", 25L, 40L, "ra3"),  // touches A3 at 25 -> no; contains Apoint
    ("b", 99L, 200L, "rb1"), // clips B1's last unit
    ("b", 100L, 300L, "rb2"), // starts exactly at B1.end -> no
    ("c", 0L, 50L, "rc1")    // no left rows for this key
  ).toDF("rk", "rst", "ren", "rtag")

  test("interval join: exact overlap pair set under the raw predicate " +
    "— containment, ties at bounds, point intervals, key isolation — " +
    "both variants") {
    for ((name, bc) <- variants) {
      val got = graft.plans.IntervalJoin.join(livs, rivs,
        Seq("k" -> "rk"), "st", "en", "rst", "ren", broadcastRight = bc)
        .select("tag", "rtag").as[(String, String)].collect().toSet
      assert(got == Set(
        ("A1", "ra1"), ("A2", "ra1"), ("A3", "ra2"), ("Apoint", "ra3"),
        ("B1", "rb1")),
        s"variant=$name: $got")
    }
  }

  test("interval join: null keys and null bounds never match — both " +
    "variants") {
    val l = Seq(("a", Some(0L), Some(10L)), (null.asInstanceOf[String],
      Some(0L), Some(10L)), ("a", None, Some(10L)))
      .toDF("k", "st", "en")
    val r = Seq(("a", Some(5L), Some(6L)), ("a", Some(5L), None),
      (null.asInstanceOf[String], Some(5L), Some(6L)))
      .toDF("rk", "rst", "ren")
    for ((name, bc) <- variants) {
      val got = graft.plans.IntervalJoin.join(l, r, Seq("k" -> "rk"),
        "st", "en", "rst", "ren", broadcastRight = bc).count()
      assert(got == 1, s"variant=$name")
    }
  }

  test("broadcast interval join: zero shuffles, one broadcast, values " +
    "equal to the co-partitioned variant on fixture data") {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
    val ev = graft.core.Tables.events(spark, sf)
    def win(t: String, id: String) = ev
      .filter(col("event_type") === t)
      .select(col("user_id").as(s"${id}_u"), col("event_id").as(s"${id}_id"),
        unix_micros(col("ts")).as(s"${id}_st"),
        (unix_micros(col("ts")) + 7200000000L).as(s"${id}_en"))
    def run(bc: Option[Boolean]) = graft.plans.IntervalJoin.join(
      win("purchase", "l"), win("error", "r"), Seq("l_u" -> "r_u"),
      "l_st", "l_en", "r_st", "r_en", broadcastRight = bc)
    val dfB = run(None) // tiny right side -> stats pick broadcast
    val plan = executed(dfB)
    var bexec = 0; var shuffles = 0; var bcasts = 0
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case e: graft.plans.BroadcastIntervalJoinExec =>
        bexec += 1; e.children.foreach(walk)
      case s: ShuffleExchangeLike => shuffles += 1; s.children.foreach(walk)
      case b: BroadcastExchangeLike => bcasts += 1; b.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(plan)
    assert(bexec == 1 && bcasts == 1 && shuffles == 0,
      s"expected broadcast interval join with zero shuffles:\n$plan")
    val a = dfB.select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val b = run(Some(false)).select("l_id", "r_id").as[(Long, Long)]
      .collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("interval join matches the declarative equi-join + overlap filter " +
    "on fixture data") {
    val ev = graft.core.Tables.events(spark, sf)
    def win(t: String, id: String) = ev
      .filter(col("event_type") === t)
      .select(col("user_id").as(s"${id}_u"), col("event_id").as(s"${id}_id"),
        unix_micros(col("ts")).as(s"${id}_st"),
        (unix_micros(col("ts")) + 7200000000L).as(s"${id}_en"))
    val l = win("purchase", "l"); val r = win("error", "r")
    val fast = graft.plans.IntervalJoin.join(l, r, Seq("l_u" -> "r_u"),
      "l_st", "l_en", "r_st", "r_en")
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val slow = l.join(r, col("l_u") === col("r_u") &&
      col("l_st") < col("r_en") && col("r_st") < col("l_en"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(fast == slow,
      s"diff: ${(fast diff slow).take(5)} / ${(slow diff fast).take(5)}")
    assert(fast.nonEmpty, "fixture produced no overlapping pairs")
  }

  test("interval join plan shape: IntervalJoinExec with one exchange per " +
    "side; inner-join pushdown reaches BOTH scans") {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    val ev = graft.core.Tables.events(spark, sf)
    def win(t: String, id: String) = ev
      .filter(col("event_type") === t)
      .select(col("user_id").as(s"${id}_u"), col("event_id").as(s"${id}_id"),
        col("value").as(s"${id}_v"),
        unix_micros(col("ts")).as(s"${id}_st"),
        (unix_micros(col("ts")) + 7200000000L).as(s"${id}_en"))
    val df = graft.plans.IntervalJoin.join(
        win("purchase", "l"), win("error", "r"), Seq("l_u" -> "r_u"),
        "l_st", "l_en", "r_st", "r_en", broadcastRight = Some(false))
      .filter(col("l_id") > 100L && col("r_id") > 200L)
      .select("l_id", "r_id")
    // logical: both single-side conjuncts pushed below the join
    val opt = df.queryExecution.optimizedPlan
    val j = opt.collectFirst { case p: graft.plans.IntervalJoinPlan => p }.get
    assert(j.left.toString.contains("l_id") &&
      j.right.toString.contains("r_id"),
      s"inner-join pushdown failed on one side:\n$opt")
    val plan = executed(df)
    var ivjs = 0; var ex = 0
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case e: graft.plans.IntervalJoinExec =>
        ivjs += 1; e.children.foreach(walk)
      case s: ShuffleExchangeLike => ex += 1; s.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(plan)
    assert(ivjs == 1 && ex == 2, s"expected 1 IntervalJoinExec + 2 " +
      s"exchanges, got $ivjs/$ex:\n$plan")
    // the l_id/r_id filters reach the parquet scans
    val s = plan.toString
    assert(s.contains("GreaterThan(event_id,100)") ||
      s.contains("GreaterThan(event_id,200)"),
      s"no pushed id filter at the scans:\n$s")
    // projection pruning: unused l_v/r_v never leave the scan
    assert(!s.contains("value"), s"unused value column still read:\n$s")
  }

  // ---- round-13 skew rescue: salted-replicate rewrite ----------------

  /** Output rows per physical partition of the executed plan. */
  private def partSizes(df: DataFrame): Array[Int] =
    df.rdd.mapPartitions(it => Iterator(it.size)).collect()

  /** AQE's size-based coalescing merges the tiny test partitions back
    * together (at 100 TB they are task-sized and stay split), and the
    * suite's few shuffle partitions make unrelated salts hash-collide
    * into one task — the bounded-per-task assertions disable coalescing
    * and widen the partition count locally. */
  private def withoutCoalesce[T](body: => T): T = {
    val coalesce = "spark.sql.adaptive.coalescePartitions.enabled"
    val parts = "spark.sql.shuffle.partitions"
    val prevC = spark.conf.get(coalesce, "true")
    val prevP = spark.conf.get(parts)
    spark.conf.set(coalesce, "false")
    spark.conf.set(parts, "64")
    try body finally {
      spark.conf.set(coalesce, prevC); spark.conf.set(parts, prevP)
    }
  }

  /** Collect through AQE stage boundaries (a plain `plan.collect` stops
    * at QueryStageExec). */
  private def deepCollect[T](p: SparkPlan)(
      f: PartialFunction[SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    f.lift(p).toSeq ++ kids.flatMap(deepCollect(_)(f))
  }

  test("skewSalt bounds a planted hot as-of key's per-task rows and " +
    "preserves the join result exactly") {
    withoutCoalesce {
      val n = 20000
      val left = spark.range(n).select(lit("hot").as("pk"),
        (col("id") % 997L).as("pt"), col("id").as("lid"))
      val right = spark.range(100).select(lit("hot").as("k"),
        (col("id") * 10L).as("t"), col("id").as("rid"))
      def run(salt: Option[Int]) = AsOf.join(left, right,
        Seq("pk" -> "k"), "pt", "t", broadcastRight = Some(false),
        skewSalt = salt)
      val unsalted = run(None); val salted = run(Some(8))
      // identical output schema and multiset
      assert(salted.columns.sameElements(unsalted.columns))
      val a = unsalted.select("lid", "rid")
        .as[(Long, Option[Long])].collect().toSet
      val b = salted.select("lid", "rid")
        .as[(Long, Option[Long])].collect().toSet
      assert(a == b && a.size == n)
      // the skew: unsalted collapses every row into ONE task; salted
      // spreads them across the salt buckets
      val u = partSizes(unsalted); val s = partSizes(salted)
      assert(u.max == n, s"hot key should land in one task: ${u.toSeq}")
      // bound: ~n/8 per salt; allow one 2-salt hash collision per task
      assert(s.max <= 2 * n / 8,
        s"salted per-task rows not bounded: max=${s.max} of ${s.toSeq}")
    }
  }

  test("skewSalt bounds a planted hot interval key's per-task rows and " +
    "preserves the pair set exactly") {
    withoutCoalesce {
      val n = 20000
      val left = spark.range(n).select(lit("hot").as("k"),
        (col("id") % 997L).as("st"), (col("id") % 997L + 3L).as("en"),
        col("id").as("lid"))
      val right = spark.range(50).select(lit("hot").as("rk"),
        (col("id") * 20L).as("rst"), (col("id") * 20L + 5L).as("ren"),
        col("id").as("rid"))
      def run(salt: Option[Int]) = IntervalJoin.join(left, right,
        Seq("k" -> "rk"), "st", "en", "rst", "ren",
        broadcastRight = Some(false), skewSalt = salt)
      val unsalted = run(None); val salted = run(Some(8))
      val a = unsalted.select("lid", "rid").as[(Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val b = salted.select("lid", "rid").as[(Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(a == b && a.nonEmpty,
        "salted interval join must emit each pair exactly once")
      val u = partSizes(unsalted); val s = partSizes(salted)
      assert(u.max == u.sum, s"hot key should land in one task: ${u.toSeq}")
      // bound: ~1/8 of all pairs per salt; allow a 2-salt hash
      // collision plus per-salt pair-count jitter (pairs per left row
      // vary, only the left rows themselves spread uniformly)
      assert(s.max <= u.sum / 3,
        s"salted per-task pairs not bounded: max=${s.max} of ${s.toSeq}")
    }
  }

  test("skewSalt session conf activates salting on the shuffle path, " +
    "yields to the broadcast fast path, and respects an explicit pin") {
    val confKey = "spark.graft.join.skewSalt"
    spark.conf.set(confKey, "4")
    try {
      // shuffle path pinned: the conf salt applies — it rides as a
      // second equi-key pair in the planned exec
      val df = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t",
        broadcastRight = Some(false))
      val execs = deepCollect(executed(df)) { case e: AsOfJoinExec => e }
      assert(execs.nonEmpty && execs.head.leftKeys.size == 2,
        s"conf-driven salt missing from plan:\n${executed(df)}")
      // semantics unchanged under the conf-driven salt
      val got = df.select("pk", "pt", "v")
        .as[(String, Long, Option[Double])].collect().toSet
      assert(got(("a", 25L, Some(2.0))) && got(("d", 50L, None)))
      // UNPINNED with a broadcast-small right side: the conf must NOT
      // defeat the stats-picked broadcast plan (no shuffle, no skew to
      // rescue, and salting would replicate the right side for nothing)
      val auto = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t")
      val aexecs = deepCollect(executed(auto)) {
        case e: graft.plans.BroadcastAsOfJoinExec => e }
      assert(aexecs.nonEmpty && aexecs.head.leftKeys.size == 1,
        s"conf salt defeated the broadcast fast path:\n${executed(auto)}")
      // a pinned broadcast variant likewise ignores the conf
      val bdf = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t",
        broadcastRight = Some(true))
      val bexecs = deepCollect(executed(bdf)) {
        case e: graft.plans.BroadcastAsOfJoinExec => e }
      assert(bexecs.nonEmpty && bexecs.head.leftKeys.size == 1,
        "broadcast variant must ignore the skew-salt conf")
    } finally spark.conf.unset(confKey)
  }

  // ---- round-14 auto skew detection ----------------------------------

  /** Plan WITHOUT executing (the 4M-row auto-detect fixtures must not
    * be collected): pre-execution, AdaptiveSparkPlanExec.executedPlan
    * is the initial physical plan — enough for static shape checks. */
  private def planned(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  private def plannedLeftKeys(df: DataFrame): Int =
    deepCollect(planned(df)) { case e: AsOfJoinExec => e.leftKeys.size }.head

  test("auto skew detection: a planted hot key salts itself with NO " +
    "salt knob set, a uniform key keeps the exact unsalted plan, the " +
    "census is cached per plan, and 'off' disables detection") {
    graft.plans.SkewSalt.clearCensusCache()
    // 4M rows x (pk, pt, pad) estimates ~88 MB — past the census size
    // floor (64 MB); 1.5M rows share key 0: >= the 1M absolute floor
    // and ~37% of all rows >> 8x the mean per-key share
    val hot = spark.range(4000000L).select(
      when(col("id") < 1500000L, lit(0L)).otherwise(col("id")).as("pk"),
      (col("id") % 9973L).as("pt"), lit("pad-payload").as("pad"))
    val right = spark.range(200).select(col("id").as("k"),
      (col("id") * 50L).as("t"), col("id").as("rid"))
    // broadcastRight = Some(false) pins the SHUFFLE variant (the one
    // with a skewed partition to rescue); no salt knob is set anywhere
    val salted = AsOf.join(hot, right, Seq("pk" -> "k"), "pt", "t",
      broadcastRight = Some(false))
    assert(plannedLeftKeys(salted) == 2,
      s"planted hot key must auto-salt:\n${planned(salted)}")
    // the census is cached by plan: re-planning the same query must
    // not grow the cache (and pays no second census job)
    val n0 = graft.plans.SkewSalt.censusCacheSize
    AsOf.join(hot, right, Seq("pk" -> "k"), "pt", "t",
      broadcastRight = Some(false))
    assert(graft.plans.SkewSalt.censusCacheSize == n0,
      "re-planning the same join must hit the census cache")
    // uniform keys at the same size: the census runs and DECLINES
    val uni = spark.range(4000000L).select(col("id").as("pk"),
      (col("id") % 9973L).as("pt"), lit("pad-payload").as("pad"))
    val plain = AsOf.join(uni, right, Seq("pk" -> "k"), "pt", "t",
      broadcastRight = Some(false))
    assert(plannedLeftKeys(plain) == 1,
      s"uniform keys must keep the unsalted plan:\n${planned(plain)}")
    // a small left never pays the census at all (size floor)
    val tiny = AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t",
      broadcastRight = Some(false))
    assert(plannedLeftKeys(tiny) == 1)
    // conf 'off' disables detection even for the planted hot key
    spark.conf.set(graft.plans.SkewSalt.ConfKey, "off")
    try {
      val off = AsOf.join(hot, right, Seq("pk" -> "k"), "pt", "t",
        broadcastRight = Some(false))
      assert(plannedLeftKeys(off) == 1, "'off' must disable auto-salt")
    } finally spark.conf.unset(graft.plans.SkewSalt.ConfKey)
  }

  test("auto skew detection: the auto-salted result equals the pinned-" +
    "unsalted result on a downsized planted key (thresholds scaled via " +
    "the documented sizing confs); interval join detects too") {
    graft.plans.SkewSalt.clearCensusCache()
    val confs = Seq(
      graft.plans.SkewSalt.AutoMinLeftBytesKey -> "1",
      graft.plans.SkewSalt.AutoMinKeyRowsKey -> "1000",
      graft.plans.SkewSalt.AutoTargetRowsKey -> "2000")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val n = 20000
      // hot key carries 3/4 of the rows; a 5000-key uniform tail keeps
      // the max/mean ratio decisive
      val left = spark.range(n).select(
        when(col("id") < 15000L, lit(0L)).otherwise(col("id")).as("pk"),
        (col("id") % 997L).as("pt"), col("id").as("lid"))
      val right = spark.range(100).select((col("id") % 3L).as("k"),
        (col("id") * 10L).as("t"), col("id").as("rid"))
      val auto = AsOf.join(left, right, Seq("pk" -> "k"), "pt", "t",
        broadcastRight = Some(false))
      assert(plannedLeftKeys(auto) == 2,
        s"downsized planted key must auto-salt:\n${planned(auto)}")
      // skewSalt = Some(0): explicit per-call OFF (overrides auto)
      val unsalted = AsOf.join(left, right, Seq("pk" -> "k"), "pt", "t",
        broadcastRight = Some(false), skewSalt = Some(0))
      assert(plannedLeftKeys(unsalted) == 1)
      val a = auto.select("lid", "rid")
        .as[(Long, Option[Long])].collect().toSet
      val b = unsalted.select("lid", "rid")
        .as[(Long, Option[Long])].collect().toSet
      assert(a == b && a.size == n,
        "auto-salted result must equal the unsalted result")
      // interval join runs the same detection
      val il = spark.range(n).select(
        when(col("id") < 15000L, lit(0L)).otherwise(col("id")).as("k"),
        (col("id") % 997L).as("st"), (col("id") % 997L + 3L).as("en"))
      val ir = spark.range(50).select((col("id") % 3L).as("rk"),
        (col("id") * 20L).as("rst"), (col("id") * 20L + 5L).as("ren"))
      val iauto = IntervalJoin.join(il, ir, Seq("k" -> "rk"),
        "st", "en", "rst", "ren", broadcastRight = Some(false))
      val ikeys = deepCollect(planned(iauto)) {
        case e: graft.plans.IntervalJoinExec => e.leftKeys.size }.head
      assert(ikeys == 2,
        s"interval join must auto-salt the planted key:\n${planned(iauto)}")
    } finally {
      confs.foreach { case (k, _) => spark.conf.unset(k) }
      graft.plans.SkewSalt.clearCensusCache()
    }
  }

  test("skew-salt conf fails loudly on a malformed or negative value, " +
    "naming the conf key and the offending value") {
    val key = graft.plans.SkewSalt.ConfKey
    for (bad <- Seq("4x", "-3", "")) {
      spark.conf.set(key, bad)
      try {
        val e = intercept[IllegalArgumentException] {
          AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t",
            broadcastRight = Some(false))
        }
        assert(e.getMessage.contains(key) && e.getMessage.contains(bad),
          s"error must name the conf and value, got: ${e.getMessage}")
      } finally spark.conf.unset(key)
    }
    // the auto-sizing confs reject non-positive values the same way
    val sizing = graft.plans.SkewSalt.AutoMinLeftBytesKey
    for (bad <- Seq("0", "-5", "64mb")) {
      spark.conf.set(sizing, bad)
      try {
        val e = intercept[IllegalArgumentException] {
          AsOf.join(probes, deals, Seq("pk" -> "k"), "pt", "t",
            broadcastRight = Some(false))
        }
        assert(e.getMessage.contains(sizing),
          s"error must name the sizing conf, got: ${e.getMessage}")
      } finally spark.conf.unset(sizing)
    }
  }

  test("salt-column name collisions on EITHER side fail loudly instead " +
    "of silently dropping a user column") {
    val l2 = probes.withColumn("__graft_salt_r", lit(1))
    intercept[IllegalArgumentException] {
      AsOf.join(l2, deals, Seq("pk" -> "k"), "pt", "t",
        broadcastRight = Some(false), skewSalt = Some(4))
    }
    val r2 = deals.withColumn("__graft_salt_l", lit(1))
    intercept[IllegalArgumentException] {
      AsOf.join(probes, r2, Seq("pk" -> "k"), "pt", "t",
        broadcastRight = Some(false), skewSalt = Some(4))
    }
  }

  test("interval join: an unpinned salt request yields to the broadcast " +
    "fast path exactly like the as-of join") {
    val l = Seq(("a", 1L, 5L, 1)).toDF("k", "st", "en", "lv")
    val r = Seq(("a", 2L, 3L, 9)).toDF("rk", "rst", "ren", "rv")
    val auto = IntervalJoin.join(l, r, Seq("k" -> "rk"),
      "st", "en", "rst", "ren", skewSalt = Some(8))
    val bexecs = deepCollect(executed(auto)) {
      case e: graft.plans.BroadcastIntervalJoinExec => e }
    assert(bexecs.nonEmpty && bexecs.head.leftKeys.size == 1,
      s"salt defeated the interval broadcast fast path:\n${executed(auto)}")
    // pinned shuffle path: the salt applies
    val pinned = IntervalJoin.join(l, r, Seq("k" -> "rk"),
      "st", "en", "rst", "ren", broadcastRight = Some(false),
      skewSalt = Some(8))
    val iexecs = deepCollect(executed(pinned)) {
      case e: graft.plans.IntervalJoinExec => e }
    assert(iexecs.nonEmpty && iexecs.head.leftKeys.size == 2,
      s"pinned shuffle path must salt:\n${executed(pinned)}")
  }

  // ---- round-13 broadcast index cache: build-once + no tombstones ----

  test("BroadcastIndexCache builds exactly once under a parallel cold " +
    "start and purges GC-cleared entries instead of leaking tombstones") {
    import java.util.concurrent.atomic.AtomicInteger
    import graft.plans.BroadcastIndexCache
    BroadcastIndexCache.clear()
    try {
      val builds = new AtomicInteger(0)
      val build = () => { builds.incrementAndGet(); new Object }
      // 16 tasks race the same (broadcast, plan) key on a cold cache,
      // released together by a latch to maximize the first-touch overlap
      val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
      val start = new java.util.concurrent.CountDownLatch(1)
      val futures = (1 to 16).map(_ => pool.submit(
        new java.util.concurrent.Callable[AnyRef] {
          def call(): AnyRef = {
            start.await()
            BroadcastIndexCache.getOrBuild(1L, 1, build)
          }
        }))
      start.countDown()
      val results = futures.map(_.get()).toSet
      pool.shutdown()
      assert(builds.get() == 1,
        s"racing first-touch tasks built ${builds.get()} times")
      assert(results.size == 1, "racing tasks must share one index")
      // a different plan over the same broadcast builds its own index
      BroadcastIndexCache.getOrBuild(1L, 2, build)
      assert(builds.get() == 2)
      assert(BroadcastIndexCache.liveEntries == 2)
      // simulate memory pressure clearing one referent: the next lookup
      // sweeps it out (no tombstone) and a re-request rebuilds
      BroadcastIndexCache.clearReferentForTest(1L, 1)
      BroadcastIndexCache.getOrBuild(9L, 9, build) // unrelated touch
      assert(BroadcastIndexCache.rawEntries == 2,
        "cleared entry must be swept, not left as a tombstone")
      BroadcastIndexCache.getOrBuild(1L, 1, build)
      assert(builds.get() == 4, "a reclaimed index must rebuild on demand")
    } finally BroadcastIndexCache.clear()
  }
}
