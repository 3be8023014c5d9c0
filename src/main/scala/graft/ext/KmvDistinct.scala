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

  /** KMV SET ALGEBRA over per-event-type active-user-day populations:
    * estimated union size, intersection size, and Jaccard for every type
    * pair, from the SAME per-type sketches [[kmvUserDays]] builds — the
    * audience-overlap question ("how many user-days are both `view` and
    * `click` active?") answered WITHOUT a pairwise distinct scan.
    *
    * Estimator (Beyer et al. SIGMOD'07 §5 / the theta-sketch set
    * operations): with S_A, S_B the bottom-k distinct-hash sketches,
    * U_k = the k smallest of S_A UNION S_B is exactly the bottom-k sketch
    * of A UNION B (every hash below the union threshold is in its side's
    * bottom-k), so est(|A UNION B|) is the standard KMV estimate on U_k;
    * m = |U_k INTERSECT S_A INTERSECT S_B| counts union-sketch members in
    * BOTH sets, m/k estimates Jaccard, and est(|A INTERSECT B|) =
    * m * est_union / k. All integer arithmetic on a deterministic md5
    * hash, so the oracle replays the estimators bit-for-bit — the gate
    * checks the sketch algebra, not an error bound. The exact columns are
    * gate-time observability a 100 TB deployment would drop.
    *
    * Scale shape: ONE aggregate pass builds the per-type sketches (O(k)
    * state, map-side partials); the pair algebra runs on the #types^2
    * sketch frame (array ops over <=512-element arrays). The exact
    * intersection is a per-key self-join on the distinct (type, user-day)
    * frame — bounded by per-key type fanout (<= #types), the standard
    * co-occurrence shape, not all-pairs.
    */
  val kmvOverlap: Q = Q(
    "ext_kmv_overlap",
    s"""WITH hv AS (
       |  SELECT event_type AS g, user_id, ts::DATE AS d,
       |    ('0x' || substr(md5(user_id::VARCHAR || '|' ||
       |      (ts::DATE)::VARCHAR), 1, 12))::UBIGINT::BIGINT AS h
       |  FROM events),
       |dh AS (SELECT DISTINCT g, h FROM hv),
       |rk AS (
       |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
       |  FROM dh),
       |sk AS (SELECT g, h FROM rk WHERE rn <= $K),
       |ex AS (
       |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_ex FROM dh GROUP BY g),
       |keys AS (SELECT DISTINCT g, user_id, d FROM hv),
       |inter AS (
       |  SELECT a.g AS ga, b.g AS gb, CAST(COUNT(*) AS BIGINT) AS n_inter
       |  FROM keys a JOIN keys b
       |    ON a.user_id = b.user_id AND a.d = b.d AND a.g < b.g
       |  GROUP BY 1, 2),
       |prs AS (
       |  SELECT a.g AS ga, b.g AS gb
       |  FROM (SELECT DISTINCT g FROM dh) a
       |  JOIN (SELECT DISTINCT g FROM dh) b ON a.g < b.g),
       |su AS (
       |  SELECT p.ga, p.gb, k.h FROM prs p JOIN sk k ON k.g = p.ga
       |  UNION
       |  SELECT p.ga, p.gb, k.h FROM prs p JOIN sk k ON k.g = p.gb),
       |ur AS (
       |  SELECT ga, gb, h,
       |    row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
       |  FROM su),
       |uk AS (SELECT ga, gb, h FROM ur WHERE rn <= $K),
       |ust AS (
       |  SELECT ga, gb, CAST(COUNT(*) AS BIGINT) AS ku, MAX(h) AS kth
       |  FROM uk GROUP BY 1, 2),
       |mt AS (
       |  SELECT u.ga, u.gb, CAST(COUNT(*) AS BIGINT) AS m
       |  FROM uk u
       |  JOIN sk a ON a.g = u.ga AND a.h = u.h
       |  JOIN sk b ON b.g = u.gb AND b.h = u.h
       |  GROUP BY 1, 2),
       |est AS (
       |  SELECT ust.ga, ust.gb, ust.ku,
       |    COALESCE(mt.m, 0) AS m,
       |    CASE WHEN ust.ku < $K THEN ust.ku
       |         ELSE $EstNum // ust.kth END AS est_union
       |  FROM ust LEFT JOIN mt ON mt.ga = ust.ga AND mt.gb = ust.gb)
       |SELECT e.ga AS type_a, e.gb AS type_b,
       |  ea.n_ex AS n_a_exact, eb.n_ex AS n_b_exact,
       |  COALESCE(i.n_inter, 0) AS n_inter_exact,
       |  e.m AS k_matches, e.est_union,
       |  (e.m * e.est_union) // e.ku AS est_inter,
       |  (e.m * 1000000) // e.ku AS jacc_ppm_est,
       |  (COALESCE(i.n_inter, 0) * 1000000)
       |    // (ea.n_ex + eb.n_ex - COALESCE(i.n_inter, 0)) AS jacc_ppm_exact
       |FROM est e
       |JOIN ex ea ON ea.g = e.ga
       |JOIN ex eb ON eb.g = e.gb
       |LEFT JOIN inter i ON i.ga = e.ga AND i.gb = e.gb
       |ORDER BY type_a, type_b""".stripMargin
  ) { (s, d) =>
    val hv = expr(
      "cast(conv(substring(md5(cast(user_id as string) || '|' || " +
        "cast(cast(ts as date) as string)), 1, 12), 16, 10) as bigint)")
    val exactKey = struct(col("user_id"), col("ts").cast("date"))
    val ev = Tables.events(s, d)
    // one pass: per-type bottom-k sketch + exact distinct count
    val sk = ev.groupBy("event_type")
      .agg(graft.functions.KmvSketch.kmv_sketch(s, hv, K).as("sk"),
        count_distinct(exactKey).as("n_ex"))
    val a = sk.select(col("event_type").as("type_a"), col("sk").as("sa"),
      col("n_ex").as("n_a_exact"))
    val b = sk.select(col("event_type").as("type_b"), col("sk").as("sb"),
      col("n_ex").as("n_b_exact"))
    // exact pairwise intersection: per-key type co-occurrence join
    val keys = ev.select(col("event_type").as("g"), col("user_id"),
      col("ts").cast("date").as("d")).distinct()
    val inter = keys.select(col("g").as("ia"), col("user_id"), col("d"))
      .join(keys.select(col("g").as("ib"), col("user_id"), col("d")),
        Seq("user_id", "d"))
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia").as("type_a"), col("ib").as("type_b"))
      .agg(count(lit(1)).as("n_inter_exact"))
    a.crossJoin(b).filter(col("type_a") < col("type_b"))
      .join(inter, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"), col("n_a_exact"),
        col("n_b_exact"),
        coalesce(col("n_inter_exact"), lit(0L)).as("n_inter_exact"),
        col("sa"), col("sb"),
        expr(s"slice(array_sort(array_union(sa, sb)), 1, $K)").as("u"))
      .select(col("type_a"), col("type_b"), col("n_a_exact"),
        col("n_b_exact"), col("n_inter_exact"),
        expr("cast(size(array_intersect(array_intersect(u, sa), sb)) " +
          "as bigint)").as("m"),
        expr("cast(size(u) as bigint)").as("ku"),
        expr(s"case when size(u) < $K then cast(size(u) as bigint) " +
          s"else $EstNum div element_at(u, $K) end").as("est_union"))
      .select(col("type_a"), col("type_b"), col("n_a_exact"),
        col("n_b_exact"), col("n_inter_exact"),
        col("m").as("k_matches"), col("est_union"),
        expr("(m * est_union) div ku").as("est_inter"),
        expr("(m * 1000000) div ku").as("jacc_ppm_est"),
        expr("(n_inter_exact * 1000000) div " +
          "(n_a_exact + n_b_exact - n_inter_exact)").as("jacc_ppm_exact"))
      .orderBy("type_a", "type_b")
  }

  def all: Seq[Q] = Seq(kmvUserDays, kmvOverlap)
}
