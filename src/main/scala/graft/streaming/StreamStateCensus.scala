package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] per-key STREAMING-STATE census (SURVEY §7.5b, round 14): the
  * sizing diagnostic for the keyed-state streaming families
  * (`flatMapGroupsWithState` sessionization/funnel/EWMA — state key =
  * `user_id`).
  *
  * The batch side has a skew thermometer (`ext_skew_audit`) and a cure
  * (SkewSalt / auto-detect); keyed streaming state has a harder
  * constraint: ALL of one key's state lives on ONE state partition of
  * one executor, and salting the key would change session semantics —
  * so the contract here is detection-not-cure, run BEFORE sizing a
  * deployment. Per state key this census reports the signals that
  * bound state-store memory and per-partition commit load:
  *
  *  - `n_keys` / `n_rows`: key cardinality and state-write traffic
  *    over the stream's replayed window;
  *  - `max_cnt` + `skew_ratio_ppm`: the hottest key's share (max over
  *    FLOORED-average in ppm, BIGINT-exact and overflow-safe — the
  *    `ext_skew_audit` signal with the division ordered so the product
  *    never exceeds max_cnt*1e6): a hot user concentrates that
  *    fraction of all state WRITES on one partition;
  *  - `open_state_keys`: state rows still HELD at end-of-replay —
  *    users whose final session the event-time timeout has not closed
  *    under the final watermark (the `ext_stream_sessions` closed-set
  *    rule, inverted). This is exactly the sessionize family's
  *    `numRowsTotal` state metric, and the StreamingSessionsSpec pins
  *    that equality against the REAL running query's state.
  *
  * Scale shape: one map-side-combined per-key aggregate + one scalar
  * watermark agg (broadcast) — entity-sized shuffle, never a window
  * over raw events. */
object StreamStateCensus {

  /** Same session gap as [[StatefulSessions]] (30 min, micros). */
  private val GapUs = 1800L * 1000000L

  def census(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val per = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("c"), max(col("ts")).as("last_ts"))
    // final watermark (ms): max event time over the whole replay, 0 s
    // delay — the frontier the last timeout batch fires against
    val wm = ev.agg(expr("max(unix_micros(ts)) div 1000").as("wm_ms"))
    per.crossJoin(broadcast(wm)).agg(
      count(lit(1)).cast("long").as("n_keys"),
      sum(col("c")).cast("long").as("n_rows"),
      max(col("c")).cast("long").as("max_cnt"),
      // max/avg with the average FLOORED first: the triple product
      // max*keys*1e6 wraps Long past ~1e8 keys x 1e6-row hot key, while
      // max*1e6 only wraps past a 9-trillion-row single key — the
      // division order is the overflow guard, mirrored in the oracle
      expr("max(c) * 1000000 div (sum(c) div count(*))").cast("long")
        .as("skew_ratio_ppm"),
      sum(when(
        expr(s"(unix_micros(last_ts) + $GapUs) div 1000 + 1") >=
          col("wm_ms"), 1L).otherwise(0L)).cast("long")
        .as("open_state_keys"))
  }

  val streamStateCensus: Q = Q(
    "ext_stream_state_census",
    s"""WITH per AS (
       |  SELECT user_id, COUNT(*) AS c, MAX(ts) AS last_ts
       |  FROM events GROUP BY 1),
       |wm AS (SELECT MAX(epoch_us(ts)) // 1000 AS wm_ms FROM events)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       |  CAST(SUM(c) AS BIGINT) AS n_rows,
       |  CAST(MAX(c) AS BIGINT) AS max_cnt,
       |  CAST(MAX(c) * 1000000 // (SUM(c) // COUNT(*)) AS BIGINT)
       |    AS skew_ratio_ppm,
       |  CAST(SUM(CASE WHEN (epoch_us(last_ts) + $GapUs) // 1000 + 1
       |    >= wm_ms THEN 1 ELSE 0 END) AS BIGINT) AS open_state_keys
       |FROM per, wm""".stripMargin
  ) { (s, d) => census(s, d) }

  def all: Seq[Q] = Seq(streamStateCensus)
}
