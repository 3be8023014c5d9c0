package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.FeatureGen

/** Pins the properties of the training-set assembly ops that the value
  * gate cannot see: point-in-time strictness (no feature leakage), label
  * window semantics, and negative-sample coherence.
  */
class FeatureGenSpec extends SparkSuite {

  test("ext_feature_pit is strictly point-in-time: n_events_before equals " +
    "an independent count of events with ts < order date, never <=") {
    val got = FeatureGen.featurePit.fn(spark, sf)
      .select("o_orderkey", "o_custkey", "n_events_before")
    // independent correlated recount (the N+1 shape the op replaces)
    val od = Tables.orders(spark, sf).filter(col("o_custkey") <= 20)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val ev = Tables.events(spark, sf).filter(col("user_id") <= 20)
      .select(col("user_id"), col("ts"))
    val expected = od.join(ev,
        col("user_id") === col("o_custkey") && col("ts") < col("o_orderdate"),
        "left")
      .groupBy("o_orderkey")
      .agg(count(col("ts")).as("exp_n"))
    val bad = got.join(expected, Seq("o_orderkey"))
      .filter(col("n_events_before") =!= col("exp_n")).count()
    assert(bad == 0L, s"$bad orders disagree with the strict-< recount")
    // and the boundary direction: swap < for <= and the recount must
    // exceed the op's answer wherever an event lands exactly on the
    // order instant — i.e. the op never counts boundary events
    val leaky = od.join(ev,
        col("user_id") === col("o_custkey") && col("ts") <= col("o_orderdate"),
        "left")
      .groupBy("o_orderkey").agg(count(col("ts")).as("leq_n"))
    val under = got.join(leaky, Seq("o_orderkey"))
      .filter(col("n_events_before") > col("leq_n")).count()
    assert(under == 0L)
  }

  test("ext_label_repurchase: per-priority positives match an independent " +
    "per-customer gap scan, and rates are coherent") {
    val rows = FeatureGen.labelRepurchase.fn(spark, sf).collect()
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime / 86400000L, r.getString(3)))
    val byCust = orders.groupBy(_._1)
    val expected = scala.collection.mutable.Map[String, (Long, Long)]()
      .withDefaultValue((0L, 0L))
    byCust.values.foreach { os =>
      val sorted = os.sortBy(o => (o._3, o._2))
      sorted.zipWithIndex.foreach { case ((_, _, day, prio), i) =>
        val pos = i + 1 < sorted.length && sorted(i + 1)._3 - day <= 30
        val (n, p) = expected(prio)
        expected(prio) = (n + 1, p + (if (pos) 1L else 0L))
      }
    }
    rows.foreach { r =>
      val (n, p) = expected(r.getString(0))
      assert(r.getLong(1) == n, s"${r.getString(0)} n_orders")
      assert(r.getLong(2) == p, s"${r.getString(0)} n_repurchase_30d")
      assert(math.abs(r.getDouble(3) - p.toDouble / n) < 5e-5)
    }
  }

  test("ext_negative_sample: candidates are exactly k per positive, clean " +
    "counts are coherent, and totals match the independent pair count") {
    val rows = FeatureGen.negativeSample.fn(spark, sf).collect()
    rows.foreach { r =>
      val (nPos, nCand, nClean) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nCand == 3 * nPos, s"${r.getString(0)}: cand != 3*pos")
      assert(nClean <= nCand && nClean >= 0)
      assert(math.abs(r.getDouble(4) -
        (nCand - nClean).toDouble / nCand) < 5e-5)
    }
    val totalPos = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey", "l_partkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == totalPos,
      "per-segment n_pos must partition the distinct positive pairs")
  }
}
