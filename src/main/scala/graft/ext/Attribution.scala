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

  def all: Seq[Q] = Seq(lastTouch, rollingDistinct)
}
