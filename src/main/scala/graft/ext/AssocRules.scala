package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] market-basket association rules (support / confidence / lift —
  * Agrawal & Srikant's Apriori measures, VLDB 1994) over per-user-day
  * event-type baskets: "users who error today also purchase today"
  * quantified, the classic co-occurrence query of behavioral analytics.
  *
  * Scale shape: baskets compress FIRST (distinct (user, day, type) —
  * one aggregate over the raw stream), then each basket's sorted type
  * array expands to its own pairs ARRAY-LOCALLY (bounded x C(k,2) with
  * k <= |event types|, no basket self-join, no shuffle keyed on basket
  * id), and pair/item supports are map-side-combined counts over a
  * handful of keys. Confidence is one IEEE division of exact integers;
  * lift multiplies BIGINTs before its single division — both engines
  * evaluate the identical chain, so the measures hash-match without
  * rounding.
  */
object AssocRules {

  val rules: Q = Q(
    "ext_assoc_rules",
    """WITH items AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type AS t
      |  FROM events),
      |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM
      |  (SELECT DISTINCT user_id, d FROM items)),
      |ic AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS sup FROM items
      |  GROUP BY 1),
      |pc AS (
      |  SELECT a.t AS ta, b.t AS tb, CAST(COUNT(*) AS BIGINT) AS sup_ab
      |  FROM items a JOIN items b
      |    ON a.user_id = b.user_id AND a.d = b.d AND a.t < b.t
      |  GROUP BY 1, 2),
      |ordered AS (
      |  SELECT ta AS antecedent, tb AS consequent, sup_ab FROM pc
      |  UNION ALL
      |  SELECT tb, ta, sup_ab FROM pc)
      |SELECT o.antecedent, o.consequent, o.sup_ab AS support_pair,
      |  CAST(o.sup_ab AS DOUBLE) / ia.sup AS confidence,
      |  CAST(o.sup_ab * nb.n AS DOUBLE) / (ia.sup * ib.sup) AS lift
      |FROM ordered o
      |JOIN ic ia ON ia.t = o.antecedent
      |JOIN ic ib ON ib.t = o.consequent
      |CROSS JOIN nb
      |ORDER BY antecedent, consequent""".stripMargin
  ) { (s, d) =>
    val items = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("d"),
        col("event_type").as("t"))
      .distinct()
    val nb = items.select(col("user_id"), col("d")).distinct()
      .agg(count(lit(1)).as("n"))
    val ic = items.groupBy("t").agg(count(lit(1)).as("sup"))
    // array-local pair expansion: per-basket sorted types -> C(k,2) pairs
    val baskets = items.groupBy("user_id", "d")
      .agg(array_sort(collect_set(col("t"))).as("ts"))
    val pc = baskets
      .select(posexplode(col("ts")).as(Seq("i", "ta")), col("ts"))
      .select(col("ta"), explode(slice(col("ts"), col("i") + 2,
        greatest(size(col("ts")) - col("i") - 1, lit(0)))).as("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("sup_ab"))
    val ordered = pc.select(col("ta").as("antecedent"),
        col("tb").as("consequent"), col("sup_ab"))
      .unionByName(pc.select(col("tb").as("antecedent"),
        col("ta").as("consequent"), col("sup_ab")))
    ordered
      .join(broadcast(ic.select(col("t").as("antecedent"),
        col("sup").as("sup_a"))), Seq("antecedent"))
      .join(broadcast(ic.select(col("t").as("consequent"),
        col("sup").as("sup_b"))), Seq("consequent"))
      .crossJoin(broadcast(nb))
      .select(col("antecedent"), col("consequent"),
        col("sup_ab").as("support_pair"),
        (col("sup_ab").cast("double") / col("sup_a")).as("confidence"),
        ((col("sup_ab") * col("n")).cast("double") /
          (col("sup_a") * col("sup_b"))).as("lift"))
      .orderBy("antecedent", "consequent")
  }

  def all: Seq[Q] = Seq(rules)
}
