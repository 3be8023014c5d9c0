package graft

import org.apache.spark.sql.functions._

/** Association-rule invariants + the array-local plan shape (the gate
  * proves cross-engine value equality; these pin the measure algebra and
  * that pair expansion never becomes a basket self-join).
  */
class AssocRulesSpec extends SparkSuite {

  test("rule measures: lift is symmetric, support_pair <= min item " +
    "support via confidence <= 1, and everything matches a local " +
    "brute-force at sf0.001") {
    val rows = graft.ext.AssocRules.rules.fn(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), (sup, conf, lift)) =>
      assert(sup >= 1)
      assert(conf > 0.0 && conf <= 1.0, s"conf($a->$b) = $conf")
      assert(math.abs(lift - rows((b, a))._3) < 1e-12,
        s"lift must be symmetric for ($a,$b)")
    }
    // local brute-force over collected baskets
    val items = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d"),
        col("event_type")).distinct().collect()
      .map(r => ((r.getLong(0), r.getDate(1).toString), r.getString(2)))
    val baskets = items.groupBy(_._1).map { case (_, xs) =>
      xs.map(_._2).toSet }.toSeq
    val n = baskets.size.toLong
    def supOf(t: String) = baskets.count(_.contains(t)).toLong
    rows.foreach { case ((a, b), (sup, conf, lift)) =>
      val supAB = baskets.count(bk => bk.contains(a) && bk.contains(b))
      assert(sup == supAB, s"support($a,$b): $sup vs local $supAB")
      assert(math.abs(conf - supAB.toDouble / supOf(a)) < 1e-12)
      assert(math.abs(lift -
        (supAB * n).toDouble / (supOf(a) * supOf(b))) < 1e-12)
    }
  }

  test("bfs distances: a planted 50-node chain resolves exact hop " +
    "counts, a disconnected island is unreachable, and a too-deep " +
    "chain throws instead of returning partial distances") {
    import spark.implicits._
    // chain n0 - n1 - ... - n49 plus island x0 - x1
    val chain = (0 until 49).map(i => (s"n$i", s"n${i + 1}"))
    val island = Seq(("x0", "x1"))
    val edges = (chain ++ island).toDF("a", "b")
    val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
    val got = graft.ext.Corpus.bfsDistances(spark, sym, "n0")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 50).foreach(i =>
      assert(got(s"n$i") == i.toLong, s"n$i at ${got(s"n$i")}"))
    assert(!got.contains("x0") && !got.contains("x1"),
      "the island must be unreachable from n0")
    // depth guard: a chain longer than the round budget throws
    val deep = (0 until 30).map(i => (s"d$i", s"d${i + 1}")).toDF("a", "b")
    val deepSym = deep.union(deep.select(col("b").as("a"), col("a").as("b")))
    intercept[IllegalStateException] {
      graft.ext.Corpus.bfsDistances(spark, deepSym, "d0", maxRounds = 10)
    }
  }

  test("plan: pair expansion is array-local — no sort-merge join, no " +
    "basket-keyed item self-join; only broadcast support lookups") {
    val plan = graft.ext.AssocRules.rules.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"items must never self-join on basket keys:\n$plan")
    assert(plan.contains("Generate"), "expected the explode-based pair fan-out")
  }
}
