package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Determinism, Q, Tables}
import graft.functions.BloomMembership.{bloom_build, bloom_check}

/** [EXT] Bloom-filter semi-join reduction — the large×large join shape
  * where neither side broadcasts as ROWS but the build side's key SET
  * compresses to a bitset that does (Bloom, CACM 1970; Spark's own
  * `InjectRuntimeFilter` optimization plants exactly this plan when
  * stats allow).
  *
  * Scenario: fact (lineitem) ⋈ selectively-filtered dim (urgent orders).
  * At 100 TB the filtered dim is still tens of billions of rows — far
  * past any broadcast threshold — so the join must shuffle BOTH sides,
  * and ~4/5 of the fact shuffle is rows whose order will never match.
  * The bloom path: (1) one pass over the filtered dim keys builds a
  * [[graft.functions.BloomBuildAgg]] filter distributed (per-partition
  * filters OR-merged — order-free, so the bitset is deterministic);
  * (2) the finished filter — ~1 byte/key, independent of row width —
  * ships to the fact scan like a broadcast variable; (3) the fact side
  * drops non-members INSIDE whole-stage codegen before paying the
  * exchange. False positives (3%) just ride along and are eliminated by
  * the exact join, so the RESULT is identical to the plain join — which
  * is precisely what lets the oracle check this operator with plain SQL.
  *
  * The merge hint keeps the demonstrated shuffle-join topology at
  * fixture scale (where the filtered dim would otherwise broadcast and
  * the bloom would be moot — same pinning discipline as the salted skew
  * join, Corpus.scala:506). The `expectedItems` count pass reads one
  * pushed-down column; on a cluster that number comes from column
  * stats, as InjectRuntimeFilter does.
  */
object BloomJoin {

  private val Priority = "1-URGENT"

  val bloomJoin: Q = Q(
    "ext_bloom_join",
    s"""SELECT l_returnflag,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
       |    * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue,
       |  COUNT(*) AS n_items,
       |  COUNT(DISTINCT l_orderkey) AS n_orders
       |FROM lineitem
       |JOIN orders ON o_orderkey = l_orderkey
       |WHERE o_orderpriority = '$Priority'
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    val dim = Tables.orders(s, d)
      .filter(col("o_orderpriority") === Priority)
      .select("o_orderkey")
    // stats estimate for the filter size (a 1-column pushed-down scan
    // here; table/column stats on a real catalog)
    val expected = math.max(dim.count(), 1L)
    val bytes = dim
      .agg(bloom_build(s, col("o_orderkey"), expected).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val fact = Tables.lineitem(s, d)
      .select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
      .filter(bloom_check(s, col("l_orderkey"), bytes))
    fact
      .join(dim.hint("merge"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        Determinism.revenueSum(col("l_extendedprice"), col("l_discount"))
          .as("revenue"),
        count(lit(1)).as("n_items"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy("l_returnflag")
  }

  val all: Seq[Q] = Seq(bloomJoin)
}
