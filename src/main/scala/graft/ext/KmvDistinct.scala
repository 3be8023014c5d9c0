package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] KMV distinct-count sketch over active user-days, per event type
  * and merged (ROLLUP ALL row) — the deterministic counterpart to the
  * HLL row `ext_approx_distinct`. See [[graft.functions.KmvSketch]] for
  * the sketch; the key property exploited here is that md5 is computable
  * identically in both engines, so the oracle recomputes the k smallest
  * distinct hashes AND the integer-division estimate — the gate
  * hash-checks the estimator arithmetic itself, not just an error bound.
  *
  * Hash: first 12 hex digits of md5("user_id|yyyy-MM-dd"), a uniform
  * value in [0, 2^48). Estimator: (k-1) * 2^48 / h_(k) by integer
  * division when the sketch is full, else the kept count (exact regime).
  * k = 256 gives ~6% relative error; the fixture's ALL group (~4k
  * distinct at sf0.01) exercises the estimator path, per-type groups sit
  * near the boundary.
  *
  * Scale shape: ONE aggregate pass over the raw stream — distinctness is
  * inside the O(k) sketch state (map-side partial sketches, set-union
  * merge), so there is no distinct shuffle at any scale; the exact
  * n_exact column is gate-time observability the 100 TB deployment would
  * drop. The ROLLUP row demonstrates sketch mergeability end to end.
  */
object KmvDistinct {

  private val K = 256
  private val HashRange = 1L << 48
  private val EstNum = (K - 1).toLong * HashRange // 255 * 2^48, fits i64

  val kmvUserDays: Q = Q(
    "ext_kmv_distinct",
    s"""WITH hv AS (
       |  SELECT event_type, user_id, ts::DATE AS d,
       |    ('0x' || substr(md5(user_id::VARCHAR || '|' ||
       |      (ts::DATE)::VARCHAR), 1, 12))::UBIGINT::BIGINT AS h
       |  FROM events),
       |pairs AS (
       |  SELECT DISTINCT event_type AS g, h FROM hv
       |  UNION ALL
       |  SELECT DISTINCT 'ALL', h FROM hv),
       |ranked AS (
       |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
       |  FROM pairs),
       |ex AS (
       |  SELECT event_type AS g,
       |    CAST(COUNT(DISTINCT (user_id, d)) AS BIGINT) AS n_exact
       |  FROM hv GROUP BY 1
       |  UNION ALL
       |  SELECT 'ALL', CAST(COUNT(DISTINCT (user_id, d)) AS BIGINT)
       |  FROM hv),
       |st AS (
       |  SELECT g,
       |    CAST(SUM(CASE WHEN rn <= $K THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_kept,
       |    MAX(CASE WHEN rn = $K THEN h END) AS kth
       |  FROM ranked GROUP BY g)
       |SELECT ex.g AS event_type, ex.n_exact, st.n_kept,
       |  COALESCE(st.kth, -1) AS kth_hash,
       |  CASE WHEN st.n_kept < $K THEN st.n_kept
       |       ELSE $EstNum // st.kth END AS est_distinct
       |FROM ex JOIN st ON st.g = ex.g
       |ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    val hv = expr(
      "cast(conv(substring(md5(cast(user_id as string) || '|' || " +
        "cast(cast(ts as date) as string)), 1, 12), 16, 10) as bigint)")
    val exactKey = struct(col("user_id"), col("ts").cast("date"))
    Tables.events(s, d)
      .rollup("event_type")
      .agg(
        graft.functions.KmvSketch.kmv_sketch(s, hv, K).as("ks"),
        count_distinct(exactKey).as("n_exact"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        col("n_exact"),
        size(col("ks")).cast("long").as("n_kept"),
        coalesce(expr(s"try_element_at(ks, $K)"), lit(-1L)).as("kth_hash"),
        expr(s"case when size(ks) < $K then cast(size(ks) as bigint) " +
          s"else $EstNum div try_element_at(ks, $K) end").as("est_distinct"))
      .orderBy("event_type")
  }

  def all: Seq[Q] = Seq(kmvUserDays)
}
