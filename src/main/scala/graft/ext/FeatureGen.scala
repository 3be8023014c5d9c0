package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Determinism, Q, Tables}

/** [EXT] training-set assembly over the warehouse: the three shapes every
  * supervised pipeline needs before a single model line is written —
  * point-in-time-correct feature snapshots, label windows, and
  * deterministic negative sampling.
  *
  * `ext_feature_pit` is the feature-store join: for each order (a label
  * row at `o_orderdate`) attach features computed from the customer's
  * event stream STRICTLY before that instant — running count, exact
  * decimal running spend, last event type. The classic implementation
  * mistake is a per-label correlated scan (N+1 at training scale) or a
  * non-PIT join that leaks future events into features; here label and
  * feature rows are union-tagged and a single per-entity ordered window
  * computes every feature in one shuffle. Tie rule: a label row sorts
  * BEFORE feature rows at the same timestamp (kind 0 < 1), so an event at
  * exactly the label instant is excluded — strict "<", no leakage
  * (spec-pinned).
  *
  * `ext_label_repurchase` is the label generator: did the customer order
  * again within 30 days? One LEAD window per customer — never a
  * self-join — aggregated into the per-priority label balance a trainer
  * inspects before fitting.
  *
  * `ext_negative_sample` is recsys-style negative generation: for each
  * positive (customer, part) pair, 3 pseudo-negatives drawn
  * deterministically from md5 (same hex-prefix idiom as the KMV/vocab
  * sketches, so the DuckDB oracle reproduces every draw bit-for-bit),
  * then cleaned against the positive set with one left join. The output
  * is the per-segment census (candidates, accidental-positive collisions,
  * clean negatives) — the rate a sampler must correct for.
  *
  * Scale shapes: PIT = one shuffle on the entity key + ordered window
  * (state bounded per entity, sessionize upstream for power users); label
  * = one LEAD window on the same key; negatives = distinct on the
  * composite pair key, map-side ×k expansion, one shuffled left join back
  * on the pair key. No correlated subqueries, no driver loops; the
  * customer dimension join is left to AQE (it scales with SF, so no
  * pinned broadcast — the `ext_star_denorm` rule).
  */
object FeatureGen {

  /** Probe entity range: events.user_id and orders.o_custkey share the
    * low id range in the fixture (users 1..15 at sf0.001). */
  private val ProbeMax = 20

  val featurePit: Q = Q(
    "ext_feature_pit",
    s"""WITH u AS (
       |  SELECT user_id AS k, ts, 1 AS kind, event_id AS seq,
       |    CAST(NULL AS BIGINT) AS orderkey, event_type,
       |    CAST(value AS DECIMAL(10,2)) AS v
       |  FROM events WHERE user_id <= $ProbeMax
       |  UNION ALL
       |  SELECT o_custkey, o_orderdate, 0, o_orderkey, o_orderkey,
       |    CAST(NULL AS VARCHAR), CAST(NULL AS DECIMAL(10,2))
       |  FROM orders WHERE o_custkey <= $ProbeMax),
       |f AS (
       |  SELECT orderkey, k, kind,
       |    COUNT(CASE WHEN kind = 1 THEN 1 END) OVER w AS n_events_before,
       |    COALESCE(CAST(SUM(CASE WHEN kind = 1 THEN v END) OVER w
       |      AS DOUBLE), 0) AS sum_value_before,
       |    last_value(CASE WHEN kind = 1 THEN event_type END IGNORE NULLS)
       |      OVER w AS last_event_type
       |  FROM u
       |  WINDOW w AS (PARTITION BY k ORDER BY ts, kind, seq
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       |SELECT orderkey AS o_orderkey, k AS o_custkey,
       |  CAST(n_events_before AS BIGINT) AS n_events_before,
       |  sum_value_before, last_event_type
       |FROM f WHERE kind = 0 ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("user_id") <= ProbeMax)
      .select(col("user_id").as("k"), col("ts"), lit(1).as("kind"),
        col("event_id").as("seq"),
        lit(null).cast("long").as("orderkey"), col("event_type"),
        Determinism.m(col("value")).as("v"))
    val od = Tables.orders(s, d).filter(col("o_custkey") <= ProbeMax)
      .select(col("o_custkey").as("k"), col("o_orderdate").as("ts"),
        lit(0).as("kind"), col("o_orderkey").as("seq"),
        col("o_orderkey").as("orderkey"),
        lit(null).cast("string").as("event_type"),
        lit(null).cast(DecimalType(10, 2)).as("v"))
    val w = Window.partitionBy("k").orderBy("ts", "kind", "seq")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.unionByName(od)
      .withColumn("n_events_before",
        count(when(col("kind") === 1, lit(1))).over(w).cast("long"))
      .withColumn("sum_value_before",
        coalesce(sum(when(col("kind") === 1, col("v"))).over(w)
          .cast("double"), lit(0.0)))
      .withColumn("last_event_type",
        last(when(col("kind") === 1, col("event_type")), ignoreNulls = true)
          .over(w))
      .filter(col("kind") === 0)
      .select(col("orderkey").as("o_orderkey"), col("k").as("o_custkey"),
        col("n_events_before"), col("sum_value_before"),
        col("last_event_type"))
      .orderBy("o_orderkey")
  }

  private val posSql = "COUNT(CASE WHEN nxt IS NOT NULL " +
    "AND date_diff('day', o_orderdate, nxt) <= 30 THEN 1 END)"

  val labelRepurchase: Q = Q(
    "ext_label_repurchase",
    s"""WITH t AS (
      |  SELECT o_orderpriority, o_orderdate,
      |    LEAD(o_orderdate) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS nxt
      |  FROM orders)
      |SELECT o_orderpriority,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(COUNT(CASE WHEN nxt IS NOT NULL
      |    AND date_diff('day', o_orderdate, nxt) <= 30 THEN 1 END)
      |    AS BIGINT) AS n_repurchase_30d,
      |  ${TextAnalysis.r4Sql(posSql, "COUNT(*)")} AS pos_rate
      |FROM t GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val pos = col("nxt").isNotNull &&
      datediff(col("nxt"), col("o_orderdate")) <= 30
    Tables.orders(s, d)
      .withColumn("nxt", lead(col("o_orderdate"), 1).over(w))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        count(when(pos, lit(1))).as("n_repurchase_30d"))
      .select(col("o_orderpriority"), col("n_orders"),
        col("n_repurchase_30d"),
        // exact-integer half-up round: small-int quotients land on ...5
        // boundaries where the engines' double ROUND diverges
        TextAnalysis.r4(col("n_repurchase_30d"), col("n_orders"))
          .as("pos_rate"))
      .orderBy("o_orderpriority")
  }

  /** negatives per positive pair */
  private val NegK = 3

  val negativeSample: Q = Q(
    "ext_negative_sample",
    s"""WITH pos AS (
       |  SELECT DISTINCT o_custkey AS custkey, l_partkey AS partkey
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |pmax AS (SELECT MAX(p_partkey) AS p FROM part),
       |cand AS (
       |  SELECT custkey, partkey, j,
       |    1 + ('0x' || substr(md5(custkey::VARCHAR || ':' ||
       |        partkey::VARCHAR || ':' || j::VARCHAR), 1, 12))
       |      ::UBIGINT::BIGINT % (SELECT p FROM pmax) AS cand_part
       |  FROM pos CROSS JOIN
       |    (SELECT unnest(generate_series(1, $NegK)) AS j) js),
       |flagged AS (
       |  SELECT c.custkey, c.cand_part,
       |    CASE WHEN p2.custkey IS NULL THEN 1 ELSE 0 END AS is_clean
       |  FROM cand c LEFT JOIN pos p2
       |    ON p2.custkey = c.custkey AND p2.partkey = c.cand_part)
       |SELECT c_mktsegment,
       |  CAST(COUNT(*) / $NegK AS BIGINT) AS n_pos,
       |  CAST(COUNT(*) AS BIGINT) AS n_cand,
       |  CAST(SUM(is_clean) AS BIGINT) AS n_clean,
       |  ${TextAnalysis.r4Sql("COUNT(*) - SUM(is_clean)", "COUNT(*)")}
       |    AS collision_rate
       |FROM flagged JOIN customer ON c_custkey = custkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { (s, d) =>
    val pos = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"))
      .distinct()
    val pmax = Tables.part(s, d).agg(max(col("p_partkey")).as("p"))
    val cand = pos.crossJoin(broadcast(pmax))
      .select(col("custkey"), col("partkey"), col("p"),
        explode(array((1 to NegK).map(lit): _*)).as("j"))
      .withColumn("cand_part",
        lit(1) + expr("cast(conv(substring(md5(concat(" +
          "cast(custkey as string), ':', cast(partkey as string), ':', " +
          "cast(j as string))), 1, 12), 16, 10) as bigint)") % col("p"))
    val flagged = cand.as("c")
      .join(pos.as("p2"),
        col("p2.custkey") === col("c.custkey")
          && col("p2.partkey") === col("c.cand_part"), "left")
      .select(col("c.custkey").as("custkey"),
        when(col("p2.custkey").isNull, lit(1)).otherwise(lit(0))
          .as("is_clean"))
    flagged
      .join(Tables.customer(s, d), col("c_custkey") === col("custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_cand"), sum(col("is_clean")).as("n_clean"))
      .select(col("c_mktsegment"), (col("n_cand") / NegK).cast("long").as("n_pos"),
        col("n_cand"), col("n_clean"),
        TextAnalysis.r4(col("n_cand") - col("n_clean"), col("n_cand"))
          .as("collision_rate"))
      .orderBy("c_mktsegment")
  }

  val all: Seq[Q] = Seq(featurePit, labelRepurchase, negativeSample)
}
