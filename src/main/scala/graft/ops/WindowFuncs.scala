package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Determinism, Q, Tables}
import Determinism.m

/** [EXT] window-function family (SURVEY §2.5 notes the reference only
  * exercises the two row_number patterns J3/J4 — these are the rest of the
  * standard surface: ranking, offsets, running frames, argmax join-back).
  * Every window is keyed by a real partition column so nothing degenerates
  * to a single-partition sort at scale.
  */
object WindowFuncs {

  /** Ranking family over customers per nation (acctbal desc). */
  val rankFamily: Q = Q(
    "q_w_rank_family",
    """SELECT c_custkey, c_nationkey,
      |rank() OVER w AS rnk,
      |dense_rank() OVER w AS drnk,
      |CAST(row_number() OVER w AS BIGINT) AS rn,
      |CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |percent_rank() OVER w AS prank,
      |cume_dist() OVER w AS cdist
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey
      |             ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_nationkey, rn""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d).select(
      col("c_custkey"), col("c_nationkey"),
      rank().over(w).cast("long").as("rnk"),
      dense_rank().over(w).cast("long").as("drnk"),
      row_number().over(w).cast("long").as("rn"),
      ntile(4).over(w).cast("long").as("quartile"),
      percent_rank().over(w).as("prank"),
      cume_dist().over(w).as("cdist"))
      .orderBy("c_nationkey", "rn")
  }

  /** Offset family: prior/next order amount per customer + delta (per-row
    * IEEE subtraction of raw doubles — engine-exact). */
  val lagLead: Q = Q(
    "q_w_lag_lead",
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |lag(o_totalprice) OVER w AS prev_price,
      |lead(o_totalprice) OVER w AS next_price,
      |o_totalprice - lag(o_totalprice) OVER w AS delta
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w))
        .as("delta"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Running (cumulative) decimal-exact sum per supplier. */
  val runningSum: Q = Q(
    "q_w_running_sum",
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) OVER (
      |  PARTITION BY l_suppkey
      |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |  AS running_qty
      |FROM lineitem
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d).select(
      col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
      col("l_quantity"), col("l_shipdate"),
      sum(m(col("l_quantity"))).over(w).cast("double").as("running_qty"))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"))
      .drop("l_shipdate")
  }

  /** Moving average over a 3-row frame (decimal-exact numerator). */
  val movingAvg: Q = Q(
    "q_w_moving_avg",
    """SELECT o_custkey, o_orderkey,
      |ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(10,2))) OVER w AS DOUBLE)
      |  / COUNT(*) OVER w, 4) AS mavg
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      round(sum(m(col("o_totalprice"))).over(w).cast("double")
        / count(lit(1)).over(w), 4).as("mavg"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      .drop("o_orderdate")
  }

  /** Argmax join-back (Q2-style min/max-per-group): the top-acctbal
    * customer per nation, with the nation dimension joined back. */
  val argmax: Q = Q(
    "q_w_argmax",
    """SELECT n_name, c_custkey, c_name, c_acctbal FROM (
      |  SELECT c_custkey, c_name, c_acctbal, c_nationkey,
      |    row_number() OVER (PARTITION BY c_nationkey
      |      ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer) t
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE rn = 1 ORDER BY n_name""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_custkey", "c_name", "c_acctbal")
      .orderBy("n_name")
  }

  /** first/last over an explicit frame. */
  val firstLast: Q = Q(
    "q_w_first_last",
    """SELECT o_custkey, o_orderkey,
      |first_value(o_totalprice) OVER w AS first_price,
      |last_value(o_totalprice) OVER w AS latest_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      first(col("o_totalprice")).over(w).as("first_price"),
      last(col("o_totalprice")).over(w).as("latest_price"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      .drop("o_orderdate")
  }

  /** Time-RANGE frame: per user, the trailing-1-hour event count and
    * exact cents sum at every event — the rolling-velocity feature
    * (rate limiting, burst detection) a ROWS frame cannot express
    * because it needs "everything in the last hour", not "the last k
    * rows". RANGE frames are also tie-robust: rows sharing an order
    * value share a frame, so the result is deterministic under any
    * shuffle order without a tiebreaker column. The frame rides on
    * epoch micros (Spark `rangeBetween` needs a numeric order column);
    * money is exact cents summed as BIGINT, emitted once at the
    * boundary ([[Determinism]] rule). */
  val rangeTime: Q = Q(
    "q_w_range_time",
    """SELECT event_id, user_id,
      |CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
      |CAST(SUM(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT))
      |  OVER w AS BIGINT) AS cents_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, epoch_us(ts), event_id""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        (col("value").cast("decimal(10,2)") * 100).cast("long").as("c"))
      .select(col("event_id"), col("user_id"), col("us"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("c")).over(w).cast("long").as("cents_1h"))
      .orderBy("user_id", "us", "event_id")
      .drop("us")
  }

  val all: Seq[Q] = Seq(rankFamily, lagLead, runningSum, movingAvg, argmax,
    firstLast, rangeTime)
}
