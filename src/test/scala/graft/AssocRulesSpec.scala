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

  test("plan: pair expansion is array-local — no sort-merge join, no " +
    "basket-keyed item self-join; only broadcast support lookups") {
    val plan = graft.ext.AssocRules.rules.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"items must never self-join on basket keys:\n$plan")
    assert(plan.contains("Generate"), "expected the explode-based pair fan-out")
  }
}
