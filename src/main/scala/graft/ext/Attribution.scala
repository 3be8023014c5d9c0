package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Determinism, Q, Tables}

/** [EXT] marketing-analytics event operators: conversion attribution and
  * rolling active-user reach — the two queries every event warehouse runs
  * on top of the sessionize/funnel family ([[EventsOps]]).
  */
object Attribution {

  /** Last-touch attribution: each `purchase` credits its user's most
    * recent preceding touch (`click`/`view`), keyed to a channel derived
    * from the touch's JSON payload; purchases with no prior touch land in
    * 'none'. Revenue stays decimal until the final cast
    * ([[Determinism]]).
    *
    * Scale shape: ONE keyed shuffle (user_id) feeds a running
    * `last(_, ignoreNulls)` window — no self-join, no per-purchase probe;
    * the channel rollup is a map-side-combined aggregate on a handful of
    * keys. The 100 TB failure mode this avoids is the purchases-to-
    * touches interval self-join, which explodes on power users.
    */
  val lastTouch: Q = Q(
    "ext_events_attribution",
    """WITH tagged AS (
      |  SELECT event_type, value,
      |    last_value(CASE WHEN event_type IN ('click','view') THEN
      |        'ch_' || CAST(CAST(json_extract_string(props, '$.k') AS INTEGER)
      |                      % 5 AS VARCHAR)
      |      END IGNORE NULLS) OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS channel
      |  FROM events)
      |SELECT COALESCE(channel, 'none') AS channel,
      |  COUNT(*) AS n_purchases,
      |  CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE)
      |    AS attributed_revenue
      |FROM tagged WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val touchChannel = when(col("event_type").isin("click", "view"),
      concat(lit("ch_"),
        (get_json_object(col("props"), "$.k").cast("int") % 5)
          .cast("string")))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("channel", last(touchChannel, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("channel"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        Determinism.dsum(col("value")).as("attributed_revenue"))
      .orderBy("channel")
  }

  /** Trailing-24h distinct active users per hour bucket.
    *
    * Scale shape: compress first (distinct (hour, user) pairs — one
    * aggregate over the raw stream), THEN fan each pair out to the 24
    * buckets it keeps alive (bounded ×24 Generate, no range self-join)
    * and count distinct per bucket. A window-function `COUNT(DISTINCT)`
    * doesn't exist, and the naive hours×events interval join is
    * quadratic in the window length; this shape is linear with a fixed
    * ×24 constant and both shuffles key on already-compressed pairs.
    */
  val rollingDistinct: Q = Q(
    "ext_events_rolling_distinct",
    """WITH hp AS (
      |  SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events),
      |hours AS (SELECT DISTINCT h FROM hp)
      |SELECT hours.h AS bucket_hour, COUNT(DISTINCT hp.user_id) AS n_users
      |FROM hours JOIN hp
      |  ON hp.h <= hours.h AND hp.h > hours.h - INTERVAL 24 HOURS
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val hp = Tables.events(s, d)
      .select(date_trunc("hour", col("ts")).as("h"), col("user_id"))
      .distinct()
    val hours = hp.select(col("h")).distinct()
      .withColumnRenamed("h", "bucket_hour")
    hp.select(col("h"), col("user_id"),
        explode(expr("sequence(0, 23)")).as("off"))
      .select(expr("timestampadd(HOUR, off, h)").as("bucket_hour"),
        col("user_id"))
      .join(hours, Seq("bucket_hour"), "left_semi")
      .groupBy("bucket_hour")
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("bucket_hour")
  }

  /** Linear multi-touch attribution with EXACT integer allocation: each
    * purchase's value is split equally across every touch (`click`/`view`)
    * since the user's previous purchase; purchases with no preceding touch
    * credit 'none'. Money is allocated in integer millicents with the
    * remainder going to the earliest touches (largest-remainder "penny
    * allocation"), so the split is exact — per-channel credits sum to
    * precisely the purchase total, with no floating-point drift for either
    * engine to disagree on.
    *
    * Scale shape: ONE keyed shuffle (user_id) carries everything. The
    * purchase-segment id is a suffix count (descending-frame running sum);
    * the per-segment pool/touch-count/touch-index are windows partitioned
    * by (user_id, segment), which the user_id hash partitioning already
    * satisfies — Catalyst plans no second exchange. No purchase-to-touch
    * interval self-join (the shape that explodes on power users), and the
    * channel rollup is a map-side-combined aggregate over a handful of
    * keys.
    */
  val multiTouch: Q = Q(
    "ext_events_attribution_multi",
    """WITH base AS (
      |  SELECT user_id, ts, event_id,
      |    event_type = 'purchase' AS is_pur,
      |    CASE WHEN event_type IN ('click','view') THEN
      |      'ch_' || CAST(CAST(json_extract_string(props, '$.k') AS INTEGER)
      |                    % 5 AS VARCHAR) END AS channel,
      |    CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) * 1000
      |      AS pool_mc
      |  FROM events),
      |seg AS (
      |  SELECT *, SUM(CASE WHEN is_pur THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS segc
      |  FROM base),
      |grp AS (
      |  SELECT *,
      |    MAX(CASE WHEN is_pur THEN pool_mc END) OVER wg AS pool,
      |    SUM(CASE WHEN channel IS NOT NULL THEN 1 ELSE 0 END) OVER wg
      |      AS n_touch,
      |    SUM(CASE WHEN channel IS NOT NULL THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY user_id, segc ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tidx
      |  FROM seg WHERE segc >= 1
      |  WINDOW wg AS (PARTITION BY user_id, segc)),
      |credits AS (
      |  SELECT channel,
      |    pool // n_touch
      |      + CASE WHEN tidx <= pool % n_touch THEN 1 ELSE 0 END AS mc
      |  FROM grp WHERE channel IS NOT NULL
      |  UNION ALL
      |  SELECT 'none' AS channel, pool AS mc
      |  FROM grp WHERE is_pur AND n_touch = 0)
      |SELECT channel, COUNT(*) AS n_credits,
      |  CAST(SUM(mc) AS BIGINT) AS attributed_millicents
      |FROM credits GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val base = Tables.events(s, d).select(
      col("user_id"), col("ts"), col("event_id"),
      (col("event_type") === "purchase").as("is_pur"),
      when(col("event_type").isin("click", "view"),
        concat(lit("ch_"),
          (get_json_object(col("props"), "$.k").cast("int") % 5)
            .cast("string"))).as("channel"),
      ((Determinism.m(col("value")) * 100).cast("long") * 1000)
        .as("pool_mc"))
    val wDesc = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seg = base
      .withColumn("segc",
        sum(when(col("is_pur"), 1).otherwise(0)).over(wDesc))
      .filter(col("segc") >= 1)
    val wg = Window.partitionBy("user_id", "segc")
    val wIdx = Window.partitionBy("user_id", "segc")
      .orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isTouch = col("channel").isNotNull
    val grp = seg
      .withColumn("pool",
        max(when(col("is_pur"), col("pool_mc"))).over(wg))
      .withColumn("n_touch",
        sum(when(isTouch, 1L).otherwise(0L)).over(wg))
      .withColumn("tidx",
        sum(when(isTouch, 1L).otherwise(0L)).over(wIdx))
    // one pass over grp: touches take their penny-allocated share, the
    // touchless purchase takes its whole pool as 'none', every other row
    // drops — no union fork, so the user_id shuffle is planned once
    val share = expr("pool div n_touch") +
      when(col("tidx") <= col("pool") % col("n_touch"), 1L).otherwise(0L)
    grp.select(
        when(isTouch, col("channel"))
          .when(col("is_pur") && col("n_touch") === 0, lit("none"))
          .as("channel"),
        when(isTouch, share)
          .when(col("is_pur") && col("n_touch") === 0, col("pool"))
          .as("mc"))
      .filter(col("mc").isNotNull)
      .groupBy("channel")
      .agg(count(lit(1)).as("n_credits"),
        sum(col("mc")).as("attributed_millicents"))
      .orderBy("channel")
  }

  def all: Seq[Q] = Seq(lastTouch, rollingDistinct, multiTouch)
}
