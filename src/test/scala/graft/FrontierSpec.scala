package graft

import org.apache.spark.sql.functions._

/** Specs for the skyline / interval-merge / multi-touch-attribution ops:
  * algorithmic properties (dominance soundness, island equivalence, exact
  * money conservation) plus the plan shapes that make them scale — things
  * the value-equality DuckDB gate cannot see.
  */
class FrontierSpec extends SparkSuite {

  test("skyline2d matches the brute-force dominance definition at sf0.001") {
    val parts = graft.core.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_size"),
        col("p_retailprice").cast("decimal(10,2)").as("pd"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDecimal(2)))
    def dominated(p: (Long, Int, java.math.BigDecimal)): Boolean =
      parts.exists { q =>
        q._2 >= p._2 && q._3.compareTo(p._3) <= 0 &&
          (q._2 > p._2 || q._3.compareTo(p._3) < 0)
      }
    val expected = parts.filterNot(dominated).map(_._1).toSet
    val got = graft.ext.Skyline.skyline2d.fn(spark, sf)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"skyline mismatch: extra=${got -- expected} missing=${expected -- got}")
    assert(got.nonEmpty)
  }

  test("skyline2d plan: one per-size aggregate shuffle + broadcast join " +
    "back; the single-partition sort only ever sees the distinct-size frame") {
    val plan = graft.ext.Skyline.skyline2d.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"frontier must re-join via broadcast:\n$plan")
    val hashed = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashed == 1, // the groupBy(p_size) aggregate only
      s"expected exactly the per-size aggregate exchange, got $hashed:\n$plan")
  }

  test("interval merge equals a sequential per-user merge of the same " +
    "30-min intervals") {
    val LenUs = 1800000000L
    val evs = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("st"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = evs.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.map(_._2).sorted
      // sequential sweep: islands of [st, st+LenUs) intervals
      var islands = List.empty[(Long, Long)] // (start, end), newest first
      sorted.foreach { st =>
        val en = st + LenUs
        islands match {
          case (is, ie) :: rest if st <= ie =>
            islands = (is, math.max(ie, en)) :: rest
          case _ => islands = (st, en) :: islands
        }
      }
      val lens = islands.map { case (a, b) => b - a }
      u -> ((islands.size.toLong, lens.sum, lens.max))
    }
    val got = graft.ext.Intervals.intervalMerge.fn(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
  }

  test("multi-touch attribution conserves money exactly: channel credits " +
    "sum to the full purchase total in integer millicents") {
    val totalMc = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum((col("value").cast("decimal(10,2)") * 100).cast("long") * 1000))
      .collect()(0).getLong(0)
    val out = graft.ext.Attribution.multiTouch.fn(spark, sf).collect()
    val attributed = out.map(_.getLong(2)).sum
    assert(attributed == totalMc,
      s"allocated $attributed millicents vs $totalMc in purchases")
    assert(out.map(_.getString(0)).toSet.contains("none"))
  }

  test("multi-touch attribution plan: no self-join — segments come from " +
    "windows over one keyed shuffle") {
    val plan = graft.ext.Attribution.multiTouch.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"attribution must not interval-join purchases to touches:\n$plan")
    val userExchanges =
      "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(userExchanges <= 1,
      s"the user_id shuffle must be planned once, got $userExchanges:\n$plan")
  }

  test("vec array funcs: n_pos + n_nonpos == 64 and max_abs bounds l2/8") {
    val rows = graft.ext.VecFuncs.arrayFuncs.fn(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (norm, nPos, maxAbs) = (r.getDouble(1), r.getLong(2), r.getDouble(3))
      assert(nPos >= 0 && nPos <= 64)
      assert(maxAbs >= norm / 8.0 - 1e-9, // 64 dims: norm <= 8*max_abs
        s"vec ${r.getLong(0)}: max_abs $maxAbs vs norm $norm")
    }
  }
}
