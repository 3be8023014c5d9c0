package graft

import graft.core.Tables
import graft.ext.Survival

/** Pins the Kaplan-Meier estimator against an independent driver-side
  * recompute (plain Scala over collected spans) plus the estimator's
  * monotonicity invariants — properties the value gate shares with the
  * oracle SQL and therefore cannot falsify independently.
  */
class SurvivalSpec extends SparkSuite {

  test("ext_survival_km matches an independent driver-side KM recompute " +
    "and is monotone (survival non-increasing, at-risk non-increasing)") {
    val rows = Survival.survivalKm.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    // independent recompute from raw orders
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val horizon = orders.map(_._3).max
    val day = 86400000L
    val spans = orders.groupBy(_._1).values.flatMap { os =>
      val s = os.sortBy(o => (o._3, o._2))
      val gaps = s.sliding(2).collect { case Array(a, b) =>
        ((b._3 - a._3) / day, 1) }.toSeq
      gaps :+ (((horizon - s.last._3) / day, 0))
    }.toSeq
    val byDur = spans.groupBy(_._1).map { case (dur, ss) =>
      (dur, ss.count(_._2 == 1).toLong, ss.size.toLong)
    }.toSeq.sortBy(_._1)
    var atRisk = spans.size.toLong
    var surv = 1.0
    val expected = byDur.flatMap { case (dur, d, tot) =>
      val out = if (d > 0) {
        surv *= (atRisk - d).toDouble / atRisk
        Some((dur, atRisk, d, surv))
      } else None
      atRisk -= tot
      out
    }

    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case ((gd, gn, ge, gs), (ed, en, ee, es)) =>
      assert(gd == ed && gn == en && ge == ee, s"row at dur=$gd")
      assert(math.abs(gs - es) < 1e-3, s"survival at dur=$gd: $gs vs $es")
    }
    // monotone invariants
    rows.sliding(2).foreach { case Array((_, n1, _, s1), (_, n2, _, s2)) =>
      assert(n2 <= n1, "at-risk must shrink with duration")
      assert(s2 <= s1 + 1e-12, "survival must be non-increasing")
    }
    assert(rows.head._4 <= 1.0 && rows.last._4 >= 0.0)
  }
}
