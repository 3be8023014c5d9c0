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

  /** Q7-style volume shipping between two nations: supplier nation and
    * customer nation in either direction, revenue by year. Two broadcast
    * nation joins, year extraction feeding the group keys. */
  val q7: Q = Q(
    "q7_volume_shipping",
    """SELECT supp_nation, cust_nation, l_year,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
      |  * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |    l_extendedprice, l_discount
      |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin
  ) { (s, d) =>
    val n1 = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      .join(Tables.lineitem(s, d)
        .select("l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice",
          "l_discount"),
        col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
        col("c_custkey") === col("o_custkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1"
          && col("cust_nation") === "NATION_2")
        || (col("supp_nation") === "NATION_2"
          && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(revenueSum(col("l_extendedprice"), col("l_discount"))
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q10-style returned-item report: top 20 customers by revenue lost to
    * returns in a 6-month window. */
  val q10: Q = Q(
    "q10_returned_items",
    """SELECT c_custkey, c_name,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
      |  * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS revenue,
      |n_name
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d).select("c_custkey", "c_name", "c_nationkey")
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= ts("1997-01-01 00:00:00")
          && col("o_orderdate") < ts("1997-07-01 00:00:00"))
        .select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(revenueSum(col("l_extendedprice"), col("l_discount"))
        .as("revenue"))
      .select("c_custkey", "c_name", "revenue", "n_name")
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q12-style priority buckets: conditional counts per line status. */
  val q12: Q = Q(
    "q12_priority_buckets",
    """SELECT l_linestatus,
      |COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 END) AS high_count,
      |COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |      THEN 1 END) AS low_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
  ) { (s, d) =>
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
      .join(Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00")
          && col("l_shipdate") < ts("1998-01-01 00:00:00"))
        .select("l_orderkey", "l_linestatus"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_linestatus")
      .agg(count(when(hi, 1)).as("high_count"),
        count(when(!hi, 1)).as("low_count"))
      .orderBy("l_linestatus")
  }

  /** Q14-style promo revenue share: ratio of two decimal-exact sums,
    * rounded at scale 4 (tie-free). */
  val q14: Q = Q(
    "q14_promo_share",
    """SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |  THEN CAST(l_extendedprice AS DECIMAL(10,2))
      |    * (1 - CAST(l_discount AS DECIMAL(10,2)))
      |  ELSE CAST(0 AS DECIMAL(21,4)) END) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))
      |    * (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE), 4)
      |  AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin
  ) { (s, d) =>
    val rev = m(col("l_extendedprice")) * (lit(1) - m(col("l_discount")))
    Tables.lineitem(s, d)
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(Tables.part(s, d).select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0)
        * sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(21,4)"))).cast("double")
        / sum(rev).cast("double"), 4).as("promo_share"))
  }

  val all: Seq[Q] = Seq(q1, q3, q5, q7, q10, q12, q14)
}
