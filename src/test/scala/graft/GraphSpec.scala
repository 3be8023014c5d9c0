package graft

import org.apache.spark.sql.functions._

/** Graph ops verified against straight-line local recomputations from the
  * raw fixture (the DuckDB gate proves cross-engine equality; this proves
  * the graph math itself — triangle count by adjacency-set intersection,
  * PageRank by a scalar fixed-point simulation).
  */
class GraphSpec extends SparkSuite {

  private lazy val localEdges: Set[(Long, Long)] = {
    val li = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
  }

  test("triangle count equals brute-force adjacency-set intersection " +
    "and the wedge census matches sum C(deg,2)") {
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    localEdges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    // each triangle counted once: for edge (a,b) with a<b, common
    // neighbors c>b close a triangle exactly once
    val bruteTri = localEdges.iterator.map { case (a, b) =>
      (adj(a) & adj(b)).count(_ > b).toLong
    }.sum
    val bruteWedges = adj.values.map(s =>
      s.size.toLong * (s.size - 1) / 2).sum
    val row = graft.ext.Graph.triangles.fn(spark, sf).collect()(0)
    assert(row.getAs[Long]("nodes") == adj.size.toLong)
    assert(row.getAs[Long]("edges") == localEdges.size.toLong)
    assert(row.getAs[Long]("triangles") == bruteTri,
      s"spark ${row.getAs[Long]("triangles")} vs brute $bruteTri")
    assert(row.getAs[Long]("wedges") == bruteWedges)
    assert(row.getAs[Long]("clustering_ppm") ==
      bruteTri * 3000000L / bruteWedges)
  }

  test("triangle plan: the count stage joins via BROADCAST adjacency " +
    "arrays — no sort-merge wedge join anywhere") {
    val plan = graft.ext.Graph.triangles.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"adjacency must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"wedge self-join resurfaced as a sort-merge join:\n$plan")
  }

  test("collocations plan: the top-50 vocabulary joins via broadcast, " +
    "so the pair expansion is bounded by the capped vocab") {
    val plan = graft.ext.Collocations.collocations.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"capped vocab must broadcast:\n$plan")
  }

  test("pagerank loop shape: the edge table is never exchanged or " +
    "sorted inside a round — only node-sized data moves") {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val (w, r0, n) = graft.ext.Graph.prInputs(spark, sf)
    val base = 1000000000L * 15L / 100L / n
    val round = graft.ext.Graph.prRound(r0, w, base)
    // pre-AQE static plan: this is where EnsureRequirements decides
    // whether the checkpointed layouts are honored (AQE can only improve)
    val plan = round.queryExecution.sparkPlan
    // the w scan must surface its checkpointed hash partitioning
    def plainChainScan(p: SparkPlan): Option[RDDScanExec] = p match {
      case r: RDDScanExec => Some(r)
      case pr: ProjectExec => plainChainScan(pr.child)
      case f: FilterExec => plainChainScan(f.child)
      case _ => None
    }
    // an Exchange or Sort sitting DIRECTLY above the edge-table scan
    // (output carries dg) means the static layout was not reused
    val offenders = plan.collect {
      case e: ShuffleExchangeExec => plainChainScan(e.child)
      case so: SortExec => plainChainScan(so.child)
    }.flatten.filter(_.output.exists(_.name == "dg"))
    assert(offenders.isEmpty,
      s"edge table re-shuffled/re-sorted inside the loop:\n$plan")
    // one round moves node-sized data only: at most the aggregate
    // exchange plus a rank-vector exchange — never a third
    val nEx = plan.collect { case e: ShuffleExchangeExec => e }.size
    assert(nEx <= 2, s"expected <=2 node-sized exchanges per round:\n$plan")
  }

  test("pagerank SHIPPED unrolled plan: the ten rounds' whole-stage " +
    "codegen sources COLLAPSE to a handful of distinct bodies " +
    "(useIdInClassName=false, the round-16 JIT-band cure) and the " +
    "edge table is never exchanged or re-sorted") {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    assert(spark.conf.get("spark.sql.codegen.useIdInClassName") == "false",
      "Sessions.tune must pin useIdInClassName=false — without it every " +
        "unrolled round compiles its own large class (the measured " +
        "graph-family JIT band)")
    val (w, r0, n) = graft.ext.Graph.prInputs(spark, sf)
    val base = graft.ext.Graph.PrScale * 15L / 100L / n
    var ranks = r0
    (1 to 10).foreach(_ =>
      ranks = graft.ext.Graph.prRound(ranks, w, base))
    val plan = ranks.queryExecution.executedPlan
    plan.execute().count() // finalize the adaptive plan's stages
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: (kids.flatMap(walk) ++ p.subqueries.flatMap(walk))
    }
    val all = walk(plan)
    val sources = all.collect { case w: WholeStageCodegenExec =>
      w.doCodeGen()._2.body
    }
    assert(sources.size >= 8,
      s"expected the unrolled loop to carry >=8 codegen stages, " +
        s"found ${sources.size} — plan shape changed, re-pin this test")
    // the pin: repeated round stages must SHARE bodies — at least 8
    // of the loop's stages are served from the codegen cache instead
    // of compiling their own class (without useIdInClassName=false,
    // distinct == sources.size: zero sharing)
    val distinct = sources.distinct.size
    assert(sources.size - distinct >= 8,
      s"only ${sources.size - distinct} of ${sources.size} codegen " +
        "stages share a body ($distinct distinct) — the unrolled " +
        "rounds are compiling per-round classes again (the measured " +
        "graph-family JIT band)")
    // the edge side (carries dg) is never exchanged or re-sorted
    def plainChainScan(p: SparkPlan): Option[RDDScanExec] = p match {
      case r: RDDScanExec => Some(r)
      case pr: ProjectExec => plainChainScan(pr.child)
      case f: FilterExec => plainChainScan(f.child)
      case _ => None
    }
    val offenders = all.flatMap {
      case e: ShuffleExchangeExec => plainChainScan(e.child)
      case so: SortExec => plainChainScan(so.child)
      case _ => None
    }.filter(_.output.exists(_.name == "dg"))
    assert(offenders.isEmpty,
      "edge table re-shuffled/re-sorted inside the shipped loop")
  }

  test("pagerank top-20 equals a scalar fixed-point simulation, ranks " +
    "are positive and descending") {
    val sym = localEdges.toSeq.flatMap { case (a, b) =>
      Seq((a, b), (b, a)) }
    val deg = sym.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    val n = deg.size.toLong
    val scale = 1000000000L
    val base = scale * 15L / 100L / n
    var rank = deg.map { case (v, _) => v -> scale / n }
    for (_ <- 1 to 10) {
      val incoming = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => rank(u) * 85L / (100L * deg(u)) }.sum
      }
      rank = deg.map { case (v, _) => v -> (base + incoming(v)) }
    }
    val expected = rank.toSeq.sortBy { case (v, r) => (-r, v) }.take(20)
    val got = graft.ext.Graph.pagerank.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, s"spark $got vs local $expected")
    assert(got.map(_._2).forall(_ > 0))
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
  }

  test("personalized pagerank equals a scalar seeded simulation and " +
    "concentrates mass at the seed") {
    val sym = localEdges.toSeq.flatMap { case (a, b) =>
      Seq((a, b), (b, a)) }
    val deg = sym.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    val scale = 1000000000L
    val seed = deg.toSeq.sortBy { case (v, dg) => (-dg, v) }.head._1
    val restart = scale * 15L / 100L
    var rank = deg.map { case (v, _) =>
      v -> (if (v == seed) scale else 0L) }
    for (_ <- 1 to 10) {
      val incoming = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => rank(u) * 85L / (100L * deg(u)) }.sum
      }
      rank = deg.map { case (v, _) =>
        v -> ((if (v == seed) restart else 0L) + incoming(v)) }
    }
    val expected = rank.toSeq.filter(_._2 > 0)
      .sortBy { case (v, r) => (-r, v) }.take(20)
    val got = graft.ext.Graph.personalizedPagerank.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, s"spark $got vs local $expected")
    // the restart vector makes proximity to the seed the ranking signal:
    // the seed itself must carry the top rank
    assert(got.head._1 == seed)
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
  }

  test("pagerank early exit: a planted fast-converging graph stops at " +
    "the detected fixed point and matches the full-cap run exactly") {
    import spark.implicits._
    import graft.core.Eager.EagerCheckpoint
    val scale = graft.ext.Graph.PrScale
    val m = 6
    // complete graph K6: perfectly symmetric, so every round's rank
    // vector is uniform and the scalar recurrence is monotone -> it
    // reaches its integer fixed point within a few rounds
    val sym = (for (a <- 0 until m; b <- 0 until m if a != b)
      yield (a.toLong, b.toLong, (m - 1).toLong)).toDF("s", "t", "dg")
    val w = sym.repartition(4, col("s")).sortWithinPartitions("s")
      .eagerCheckpoint()
    val r0 = (0 until m).map(v => (v.toLong, scale / m))
      .toDF("v", "rank").repartition(4, col("v")).eagerCheckpoint()
    val base = scale * 15L / 100L / m
    val cap = 40
    val (early, rounds) = graft.ext.Graph.prLoop(r0, w, base, cap,
      checkEvery = 2)
    assert(rounds < cap, s"expected early exit, ran all $rounds rounds")
    val (full, fullRounds) = graft.ext.Graph.prLoop(r0, w, base, cap,
      checkEvery = 0)
    assert(fullRounds == cap)
    val a = early.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = full.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.toSeq == b.toSeq,
      s"early-exit vector must equal the full-cap run: ${a.toSeq} vs ${b.toSeq}")
  }

  test("connected components: planted multi-component graph labels " +
    "every node with its component's min id and exits early") {
    import spark.implicits._
    // two cliques {0..3}, {10..13}, a path 20-21-22, an isolated edge 30-31
    val und = (for (a <- 0 to 3; b <- 0 to 3 if a < b) yield (a, b)) ++
      (for (a <- 10 to 13; b <- 10 to 13 if a < b) yield (a, b)) ++
      Seq((20, 21), (21, 22), (30, 31))
    val sym = und.flatMap { case (a, b) =>
      Seq((a.toLong, b.toLong), (b.toLong, a.toLong)) }.toDF("s", "t")
    val (lab, rounds) = graft.ext.Graph.ccLabels(spark, sym, cap = 20)
    assert(rounds < 20, s"expected early exit, ran $rounds rounds")
    val got = lab.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = ((0 to 3).map(_.toLong -> 0L) ++
      (10 to 13).map(_.toLong -> 10L) ++
      Seq(20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L)).toMap
    assert(got == expect, s"labels $got vs $expect")
  }

  test("link prediction: planted graph ranks the non-adjacent pair " +
    "with the most shared neighbors first and never suggests an edge") {
    import spark.implicits._
    // 0 and 1 share neighbors {2,3,4} but are NOT adjacent; 5 and 6
    // share only {2}; every adjacent pair must be absent from the output
    val e0 = Seq((0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (1, 4),
      (2, 5), (2, 6)).map { case (a, b) => (a.toLong, b.toLong) }
      .toDF("a", "b")
    val got = graft.ext.Graph.cnPairs(e0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.head == (0L, 1L, 3L), s"top pair wrong: $got")
    val edgeSet = Set((0L,2L),(0L,3L),(0L,4L),(1L,2L),(1L,3L),(1L,4L),
      (2L,5L),(2L,6L))
    assert(got.forall { case (a, b, _) =>
      !edgeSet((math.min(a, b), math.max(a, b))) && a != b },
      s"an existing edge or self-pair leaked into the predictions: $got")
    // directed serving output: both probe directions present
    assert(got.contains((5L, 6L, 1L)) && got.contains((6L, 5L, 1L)))
  }
}
