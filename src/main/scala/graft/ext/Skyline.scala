package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Determinism, Q, Tables}

/** [EXT] Pareto-frontier (skyline) operator — "best tradeoff" rows under
  * multi-objective dominance, the classic catalog/analytics query the
  * reference's event-listing UI (price-sorted browsing, `db.py:271-276`)
  * gestures at but MySQL cannot express without a quadratic self-join.
  *
  * A part is on the skyline iff no other part strictly dominates it under
  * (maximize p_size, minimize p_retailprice): q dominates p when
  * q.size >= p.size, q.price <= p.price, and at least one is strict.
  *
  * Scale shape: the textbook formulation is a NOT EXISTS self-join —
  * O(n^2) and un-shardable. For a 2D skyline it decomposes exactly:
  *
  *   1. per-size minimum price — ONE map-side-combined aggregate whose
  *      output is bounded by |distinct sizes|, not |rows|;
  *   2. over the distinct sizes ordered size-DESC, a running min of the
  *      per-size minimum from strictly larger sizes (an exclusive-frame
  *      window over the already-aggregated frame — the only unpartitioned
  *      sort touches |distinct sizes| rows, never the fact table);
  *   3. broadcast the surviving (size, min_price) frontier back and keep
  *      rows whose price equals their size's minimum.
  *
  * At 100 TB the fact scan is one aggregate + one broadcast-joined filter
  * pass; nothing quadratic, no row-count-sized shuffle beyond the
  * per-size aggregate. Price comparisons run in DECIMAL(10,2) (exact,
  * engine-independent — [[Determinism]]); the final price is a single
  * decimal->double cast.
  */
object Skyline {

  val skyline2d: Q = Q(
    "ext_skyline_2d",
    """WITH p AS (
      |  SELECT p_partkey, p_name, p_size,
      |    CAST(p_retailprice AS DECIMAL(10,2)) AS pd
      |  FROM part)
      |SELECT a.p_partkey, a.p_name, a.p_size, CAST(a.pd AS DOUBLE) AS price
      |FROM p a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM p b
      |  WHERE b.p_size >= a.p_size AND b.pd <= a.pd
      |    AND (b.p_size > a.p_size OR b.pd < a.pd))
      |ORDER BY a.p_size DESC, a.p_partkey""".stripMargin
  ) { (s, d) =>
    val p = Tables.part(s, d).select(
      col("p_partkey"), col("p_name"), col("p_size"),
      Determinism.m(col("p_retailprice")).as("pd"))
    val bySize = p.groupBy("p_size").agg(min(col("pd")).as("min_pd"))
    // running min over STRICTLY larger sizes (exclusive frame); the frame
    // input is the distinct-size aggregate, so the single-partition sort
    // is bounded by |distinct sizes|, not the table
    val wLarger = Window.orderBy(col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = bySize
      .withColumn("larger_min", min(col("min_pd")).over(wLarger))
      .filter(col("larger_min").isNull ||
        col("min_pd") < col("larger_min"))
      .select(col("p_size"), col("min_pd"))
    p.join(broadcast(frontier), Seq("p_size"))
      .filter(col("pd") === col("min_pd"))
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        col("pd").cast("double").as("price"))
      .orderBy(col("p_size").desc, col("p_partkey"))
  }

  def all: Seq[Q] = Seq(skyline2d)
}
