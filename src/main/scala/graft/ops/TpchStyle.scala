package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core.{Determinism, Q, Tables}
import Determinism.{davg, dsum, m, revenueSum}

/** Headline analytical queries over the TPC-H-ish fixtures — the bench
  * workload. These exercise the engine end-to-end: multi-way joins with
  * broadcast dims, map-side partial aggregation, top-k, and AQE-planned
  * shuffles. Shapes follow the public TPC-H spec (Q1/Q3/Q5), adapted to the
  * fixture schema (TESTDATA.md). Money math follows the Determinism rules:
  * decimal in, exact decimal arithmetic, double out.
  */
object TpchStyle {

  private def ts(s: String) = lit(Timestamp.valueOf(s))

  /** Q1-style pricing summary: one scan, grouped partial aggregation.
    * At 100 TB this is scan-bound; everything here stays in whole-stage
    * codegen with map-side combine (2 group keys x 6 aggregates). */
  val q1: Q = Q(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS sum_base_price,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
      |  * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS sum_disc_price,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
      |  * (1 - CAST(l_discount AS DECIMAL(10,2)))
      |  * (1 + CAST(l_tax AS DECIMAL(10,2)))) AS DOUBLE) AS sum_charge,
      |ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
      |ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
      |ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
      |COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= ts("1999-12-01 00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        revenueSum(col("l_extendedprice"), col("l_discount"))
          .as("sum_disc_price"),
        sum(m(col("l_extendedprice")) * (lit(1) - m(col("l_discount")))
          * (lit(1) + m(col("l_tax")))).cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Q3-style shipping priority: selective dim filter -> two joins ->
    * grouped revenue -> top-10. Customer side is filtered before the join
    * so AQE can broadcast it. */
  val q3: Q = Q(
    "q3_shipping_priority",
    """SELECT l_orderkey,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
      |  * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue,
      |o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
  ) { (s, d) =>
    val cutoff = ts("1998-06-01 00:00:00")
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ords = Tables.orders(s, d)
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    cust.join(ords, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q5-style local-supplier revenue: 6-way join where region/nation are
    * broadcast and the customer-nation == supplier-nation constraint prunes
    * the join output before aggregation. */
  val q5: Q = Q(
    "q5_local_supplier_volume",
    """SELECT n_name,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
      |  * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    Tables.customer(s, d).select("c_custkey", "c_nationkey")
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val all: Seq[Q] = Seq(q1, q3, q5)
}
