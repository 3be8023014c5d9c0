package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] Kaplan-Meier survival over purchase cadence (Kaplan & Meier,
  * JASA'58): "how long until the customer orders again?", with the open
  * interval after each customer's LAST order treated as right-censored at
  * the corpus horizon instead of silently dropped — dropping censored
  * spans is the classic retention-analysis bias (it deletes exactly the
  * customers who churned).
  *
  * Spans: one LEAD window per customer gives observed gaps (event = 1);
  * the last order contributes a censored span to the global max order
  * date (event = 0, horizon via a 1-row broadcast). The estimator runs
  * entirely on the DURATION DOMAIN: group spans by gap days, suffix-sum
  * the at-risk counts, prefix-sum the log hazard factors — two ordered
  * windows over the day-domain frame (bounded by the calendar span,
  * never by row count; the engine's documented unpartitioned-window
  * exemption). S(t) = prod_{u<=t}(1 - d_u/n_u) computed as
  * EXP(SUM(LN(.))) in both engines over identical IEEE ratios — the only
  * output rounding is the final round-4. The d_u == n_u boundary (everyone
  * remaining dies at u) is handled by an exact INTEGER zero-factor count,
  * not by LN(0) (Spark yields NULL and DuckDB -inf there — the one place
  * the engines genuinely disagree).
  *
  * Scale shape: one shuffle on the customer key for spans, one map-side
  * combined aggregate to the day domain, then day-domain windows. Output
  * rows are event days only.
  */
object Survival {

  val survivalKm: Q = Q(
    "ext_survival_km",
    """WITH mx AS (SELECT MAX(o_orderdate) AS horizon FROM orders),
      |spans AS (
      |  SELECT CASE WHEN nxt IS NULL
      |      THEN date_diff('day', o_orderdate, (SELECT horizon FROM mx))
      |      ELSE date_diff('day', o_orderdate, nxt) END AS dur,
      |    CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS event
      |  FROM (SELECT o_orderdate, LEAD(o_orderdate) OVER (
      |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS nxt
      |    FROM orders) t),
      |by_dur AS (
      |  SELECT dur, CAST(SUM(event) AS BIGINT) AS d,
      |    CAST(COUNT(*) AS BIGINT) AS tot
      |  FROM spans GROUP BY dur),
      |risk AS (
      |  SELECT dur, d,
      |    SUM(tot) OVER (ORDER BY dur
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
      |  FROM by_dur),
      |km AS (
      |  SELECT dur, d, n_risk,
      |    SUM(CASE WHEN d > 0 AND d < n_risk
      |        THEN LN(CAST(n_risk - d AS DOUBLE) / n_risk) ELSE 0 END)
      |      OVER w AS lnsum,
      |    SUM(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER w AS n_zero
      |  FROM risk
      |  WINDOW w AS (ORDER BY dur
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT dur AS dur_days, CAST(n_risk AS BIGINT) AS n_risk,
      |  d AS n_events,
      |  CASE WHEN n_zero > 0 THEN 0.0 ELSE ROUND(EXP(lnsum), 4) END
      |    AS survival
      |FROM km WHERE d > 0 ORDER BY dur_days""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val horizon = Tables.orders(s, d).agg(max(col("o_orderdate")).as("horizon"))
    val spans = Tables.orders(s, d)
      .withColumn("nxt", lead(col("o_orderdate"), 1).over(w))
      .crossJoin(broadcast(horizon))
      .select(
        when(col("nxt").isNull,
          datediff(col("horizon"), col("o_orderdate")))
          .otherwise(datediff(col("nxt"), col("o_orderdate")))
          .cast("long").as("dur"),
        when(col("nxt").isNull, lit(0L)).otherwise(lit(1L)).as("event"))
    val byDur = spans.groupBy("dur")
      .agg(sum(col("event")).as("d"), count(lit(1)).as("tot"))
    // day-domain windows: frames bounded by the calendar span
    val wRisk = Window.orderBy("dur")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDur
      .withColumn("n_risk", sum(col("tot")).over(wRisk))
      .withColumn("lnsum",
        sum(when(col("d") > 0 && col("d") < col("n_risk"),
          log((col("n_risk") - col("d")).cast("double") / col("n_risk")))
          .otherwise(lit(0.0))).over(wCum))
      .withColumn("n_zero",
        sum(when(col("d") === col("n_risk"), lit(1)).otherwise(lit(0)))
          .over(wCum))
      .filter(col("d") > 0)
      .select(col("dur").as("dur_days"), col("n_risk"),
        col("d").as("n_events"),
        when(col("n_zero") > 0, lit(0.0))
          .otherwise(round(exp(col("lnsum")), 4)).as("survival"))
      .orderBy("dur_days")
  }

  val all: Seq[Q] = Seq(survivalKm)
}
