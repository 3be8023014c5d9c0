package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import graft.plans.AsOf

/** Gate rows for the native as-of join ([[graft.plans.AsOfJoinPlan]] /
  * [[graft.plans.AsOfJoinExec]] — the custom-plan tier). The oracle is
  * DuckDB's own first-class `ASOF LEFT JOIN`, so two independent as-of
  * implementations are hash-compared row by row.
  *
  * Shape: each purchase event matched to the same user's latest prior
  * 'view' event (classic last-touch attribution). The right side is
  * tie-free by fixture construction (unique (user_id, ts) per type), so
  * the match is deterministic. Output is per-event (not aggregated) —
  * every match, every gap, every null miss participates in the hash.
  *
  * Tolerance semantics note: at-or-before with tolerance T is exactly
  * "match, then null out matches with gap > T" — which is how the oracle
  * expresses it (DuckDB ASOF has no MATCH_CONDITION clause).
  */
object AsOfNative {

  private val TolMicros = 360L * 60 * 1000000 // 6 hours

  private def sides(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, d)
    (ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts")),
      ev.filter(col("event_type") === "view")
        .select(col("user_id").as("u"), col("ts").as("rts"),
          col("value").as("rv")))
  }

  private def oracleSides =
    """(SELECT event_id, user_id, ts FROM events
      |   WHERE event_type = 'purchase') l
      |ASOF LEFT JOIN
      |  (SELECT user_id u, ts rts, value rv FROM events
      |   WHERE event_type = 'view') r""".stripMargin

  /** Backward: latest view at-or-before each purchase. */
  val asofBackward: Q = Q(
    "ext_asof_exec",
    s"""SELECT l.event_id,
       |  epoch_us(l.ts) - epoch_us(r.rts) AS gap_us, r.rv
       |FROM $oracleSides
       |  ON l.user_id = r.u AND l.ts >= r.rts
       |ORDER BY l.event_id""".stripMargin
  ) { (s, d) =>
    val (l, r) = sides(s, d)
    AsOf.join(l, r, Seq("user_id" -> "u"), "ts", "rts")
      .select(col("event_id"),
        (unix_micros(col("ts")) - unix_micros(col("rts"))).as("gap_us"),
        col("rv"))
      .orderBy("event_id")
  }

  /** Backward with a 6 h tolerance: stale views stop matching, so the
    * null-emission path is exercised on ~90 % of rows at gate scale. */
  val asofTolerance: Q = Q(
    "ext_asof_exec_tol",
    s"""SELECT event_id,
       |  CASE WHEN gap_us <= $TolMicros THEN gap_us END AS gap_us,
       |  CASE WHEN gap_us <= $TolMicros THEN rv END AS rv
       |FROM (
       |  SELECT l.event_id, epoch_us(l.ts) - epoch_us(r.rts) AS gap_us,
       |    r.rv
       |  FROM $oracleSides
       |    ON l.user_id = r.u AND l.ts >= r.rts)
       |ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    val (l, r) = sides(s, d)
    AsOf.join(l, r, Seq("user_id" -> "u"), "ts", "rts",
      tolerance = Some(TolMicros))
      .select(col("event_id"),
        (unix_micros(col("ts")) - unix_micros(col("rts"))).as("gap_us"),
        col("rv"))
      .orderBy("event_id")
  }

  /** Forward: earliest view at-or-after each purchase (post-purchase
    * re-engagement lag). */
  val asofForward: Q = Q(
    "ext_asof_exec_fwd",
    s"""SELECT l.event_id,
       |  epoch_us(r.rts) - epoch_us(l.ts) AS gap_us, r.rv
       |FROM $oracleSides
       |  ON l.user_id = r.u AND l.ts <= r.rts
       |ORDER BY l.event_id""".stripMargin
  ) { (s, d) =>
    val (l, r) = sides(s, d)
    AsOf.join(l, r, Seq("user_id" -> "u"), "ts", "rts", forward = true)
      .select(col("event_id"),
        (unix_micros(col("rts")) - unix_micros(col("ts"))).as("gap_us"),
        col("rv"))
      .orderBy("event_id")
  }

  /** Keyed interval-overlap join ([[graft.plans.IntervalJoinExec]] — the
    * plane-sweep operator): every (purchase-window, error-window) pair of
    * the same user whose 2 h half-open windows overlap, with the overlap
    * length. Oracle is the declarative equi-join + overlap filter — fine
    * for DuckDB at gate scale; the custom exec exists because that shape
    * is per-key quadratic at 100 TB. */
  val intervalJoin: Q = Q(
    "ext_interval_join",
    s"""WITH l AS (
       |  SELECT user_id, event_id AS lid, epoch_us(ts) AS st,
       |    epoch_us(ts) + 7200000000 AS en
       |  FROM events WHERE event_type = 'purchase'),
       |r AS (
       |  SELECT user_id AS ru, event_id AS rid, epoch_us(ts) AS rst,
       |    epoch_us(ts) + 7200000000 AS ren
       |  FROM events WHERE event_type = 'error')
       |SELECT user_id, lid, rid,
       |  LEAST(en, ren) - GREATEST(st, rst) AS overlap_us
       |FROM l JOIN r ON user_id = ru AND st < ren AND rst < en
       |ORDER BY lid, rid""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    def win(t: String, u: String, id: String, st: String, en: String) = ev
      .filter(col("event_type") === t)
      .select(col("user_id").as(u), col("event_id").as(id),
        unix_micros(col("ts")).as(st),
        (unix_micros(col("ts")) + 7200000000L).as(en))
    graft.plans.IntervalJoin.join(
        win("purchase", "user_id", "lid", "st", "en"),
        win("error", "ru", "rid", "rst", "ren"),
        Seq("user_id" -> "ru"), "st", "en", "rst", "ren")
      .select(col("user_id"), col("lid"), col("rid"),
        (least(col("en"), col("ren"))
          - greatest(col("st"), col("rst"))).as("overlap_us"))
      .orderBy("lid", "rid")
  }

  /** The native as-of join composed with the SCD2 dimension
    * ([[Scd2.history]]'s episode derivation): for each purchase, the
    * state episode in effect ONE MICROSECOND BEFORE it — "what state was
    * the user in when they purchased" (the point-in-time dimension
    * lookup every feature store does). The as-of formulation REPLACES
    * the SCD2 BETWEEN join: with contiguous tie-free episodes, latest
    * effective_from at-or-before t == the episode with from <= t < to —
    * and the oracle deliberately uses the BETWEEN formulation, so two
    * structurally different lookups must agree row-for-row.
    *
    * 100 TB shape: the episodes side is change-proportional (far smaller
    * than the event stream); the planner's stats decision broadcasts it
    * and the probe side is never shuffled. */
  val asofScd2: Q = Q(
    "ext_asof_scd2",
    s"""WITH obs AS (
       |  SELECT user_id, ts, event_id, event_type FROM events),
       |marked AS (
       |  SELECT *, lag(event_type) OVER
       |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM obs),
       |changes AS (
       |  SELECT user_id, ts, event_id, event_type FROM marked
       |  WHERE prev IS NULL OR prev <> event_type),
       |seg AS (
       |  SELECT user_id, event_type AS state,
       |    epoch_us(ts) AS from_us,
       |    epoch_us(lead(ts) OVER
       |      (PARTITION BY user_id ORDER BY ts, event_id)) AS to_us
       |  FROM changes),
       |probes AS (
       |  SELECT event_id, user_id, epoch_us(ts) - 1 AS t
       |  FROM events WHERE event_type = 'purchase')
       |SELECT p.event_id, e.state AS prior_state
       |FROM probes p LEFT JOIN seg e
       |  ON p.user_id = e.user_id AND p.t >= e.from_us
       |    AND (p.t < e.to_us OR e.to_us IS NULL)
       |ORDER BY p.event_id""".stripMargin
  ) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, d)
    val seg = ev
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(col("user_id").as("u"), col("event_type").as("state"),
        unix_micros(col("ts")).as("from_us"))
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - 1).as("t"))
    graft.plans.AsOf.join(probes, seg, Seq("user_id" -> "u"), "t", "from_us")
      .select(col("event_id"), col("state").as("prior_state"))
      .orderBy("event_id")
  }

  /** The round-13 hot-key rescue under the oracle: the SAME backward
    * as-of as `ext_asof_exec`, executed through the [[graft.plans.SkewSalt]]
    * salted-replicate rewrite (salt 4 — left rows split across 4 salt
    * buckets, the view history replicated into each). Salting is
    * semantics-neutral by construction (each left row lands in exactly
    * one bucket with the full right history for its key), so the oracle
    * is DuckDB's plain ASOF LEFT JOIN — a hash mismatch here means the
    * rescue changed results. The per-task bound itself is pinned in
    * PlansSpec (planted hot key) and PlansFuzzSpec (fuzzed salt). */
  val asofSalted: Q = Q(
    "ext_asof_salted",
    s"""SELECT l.event_id,
       |  epoch_us(l.ts) - epoch_us(r.rts) AS gap_us, r.rv
       |FROM $oracleSides
       |  ON l.user_id = r.u AND l.ts >= r.rts
       |ORDER BY l.event_id""".stripMargin
  ) { (s, d) =>
    val (l, r) = sides(s, d)
    // broadcastRight pinned false: the fixture's view side is broadcast-
    // small, and an unpinned salt request yields to the planner's
    // broadcast fast path (no shuffle = nothing to rescue) — the pin is
    // what a 100 TB caller whose right side outgrows the estimate does,
    // and it makes the gate row actually execute the salted rewrite
    AsOf.join(l, r, Seq("user_id" -> "u"), "ts", "rts",
      broadcastRight = Some(false), skewSalt = Some(4))
      .select(col("event_id"),
        (unix_micros(col("ts")) - unix_micros(col("rts"))).as("gap_us"),
        col("rv"))
      .orderBy("event_id")
  }

  /** The salted rewrite under the oracle for the SECOND custom join:
    * same pair semantics as `ext_interval_join`, executed through the
    * SkewSalt rewrite (salt 4, shuffle path pinned — see
    * [[asofSalted]]'s rationale). Each (l, r) overlap pair must appear
    * exactly ONCE (in l's salt bucket), so the plain declarative oracle
    * hash-checks both correctness and no-duplication. */
  val intervalSalted: Q = Q(
    "ext_interval_salted",
    s"""WITH l AS (
       |  SELECT user_id, event_id AS lid, epoch_us(ts) AS st,
       |    epoch_us(ts) + 7200000000 AS en
       |  FROM events WHERE event_type = 'purchase'),
       |r AS (
       |  SELECT user_id AS ru, event_id AS rid, epoch_us(ts) AS rst,
       |    epoch_us(ts) + 7200000000 AS ren
       |  FROM events WHERE event_type = 'error')
       |SELECT user_id, lid, rid,
       |  LEAST(en, ren) - GREATEST(st, rst) AS overlap_us
       |FROM l JOIN r ON user_id = ru AND st < ren AND rst < en
       |ORDER BY lid, rid""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    def win(t: String, u: String, id: String, st: String, en: String) = ev
      .filter(col("event_type") === t)
      .select(col("user_id").as(u), col("event_id").as(id),
        unix_micros(col("ts")).as(st),
        (unix_micros(col("ts")) + 7200000000L).as(en))
    graft.plans.IntervalJoin.join(
        win("purchase", "user_id", "lid", "st", "en"),
        win("error", "ru", "rid", "rst", "ren"),
        Seq("user_id" -> "ru"), "st", "en", "rst", "ren",
        broadcastRight = Some(false), skewSalt = Some(4))
      .select(col("user_id"), col("lid"), col("rid"),
        (least(col("en"), col("ren"))
          - greatest(col("st"), col("rst"))).as("overlap_us"))
      .orderBy("lid", "rid")
  }

  def all: Seq[Q] = Seq(asofBackward, asofTolerance, asofForward,
    intervalJoin, asofScd2, asofSalted, intervalSalted)
}
