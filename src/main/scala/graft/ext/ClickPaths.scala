package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import graft.core.Eager.EagerCheckpoint

/** [EXT] clickstream path mining: the top event-type TRIGRAM paths across
  * all SESSIONS — the "what do users actually do, three steps at a time"
  * query product analytics runs constantly. [[EventsOps]]'
  * `ext_events_transitions` is the first-order (bigram/Markov) view;
  * trigrams expose asymmetries a first-order chain cannot (view>click>
  * purchase vs click>view>purchase are distinct here, identical there).
  *
  * Scale shape: ONE shuffle (user_id) both sessionizes and builds each
  * SESSION's ordered type sequence — the stream splits at 30-minute
  * gaps (the `ext_sessionize` boundary) BEFORE the trigram expansion,
  * so a trigram never spans a session break (the analytics-correct
  * reading: "view then click then purchase, days apart" is not a path)
  * and the per-array bound is STRUCTURAL — a session is at most
  * gap-bounded dwell, never a user's lifetime history. Trigram
  * expansion is array-local (the bigram-zip idiom of
  * `ext_text_bigram_lm` extended to width 3); the count is a map-side-
  * combined aggregate over short path strings, and top-20 is
  * TakeOrderedAndProject — no global sort.
  */
object ClickPaths {

  val sessionPaths: Q = Q(
    "ext_session_paths",
    """WITH numbered AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_seq
      |  FROM (
      |    SELECT user_id, ts, event_id, event_type,
      |      CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
      |        (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
      |        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |          IS NULL
      |      THEN 1 ELSE 0 END AS is_new
      |    FROM events) flagged),
      |seq AS (
      |  SELECT user_id, session_seq,
      |    list(event_type ORDER BY ts, event_id) AS ts2
      |  FROM numbered GROUP BY 1, 2),
      |tri AS (
      |  SELECT unnest(list_transform(
      |    generate_series(1, len(ts2) - 2),
      |    i -> ts2[i] || '>' || ts2[i+1] || '>' || ts2[i+2])) AS path
      |  FROM seq WHERE len(ts2) >= 3)
      |SELECT path, CAST(COUNT(*) AS BIGINT) AS n
      |FROM tri GROUP BY path
      |ORDER BY n DESC, path LIMIT 20""".stripMargin
  ) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val sess = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("is_new", when(col("prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L,
        1L).otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
    val seq = sess
      .groupBy("user_id", "session_seq")
      .agg(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))),
        st => st("event_type")).as("ts2"))
    seq.filter(size(col("ts2")) >= 3)
      .select(explode(expr(
        "transform(sequence(1, size(ts2) - 2), " +
          "i -> concat_ws('>', ts2[i-1], ts2[i], ts2[i+1]))")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(20)
  }

  /** Funnel conversion latency: per user, seconds from FIRST view to the
    * first purchase AFTER it; the summary row is the latency
    * distribution (exact lower-percentile p50/p90 over the sorted
    * converting-user array, integer mean by floor division) — the
    * time-to-convert companion of `ext_events_funnel`'s conversion
    * counts. All integer seconds; the percentile contract is the lower
    * median (element (n+1)/2), engine-exact, no interpolation.
    *
    * Scale shape: one user_id-keyed aggregate reduces the stream to a
    * first-view/first-purchase row per user; the distribution runs
    * through [[BucketRank.lowerPercentiles]] (two-pass bucket-rank,
    * hour-granular buckets — the bucket domain is the latency span in
    * hours, bounded by the observation window, never by user count).
    * The previous `sort_array(collect_list(...))` form was bounded by
    * CONVERTING users — fine at fixture, but still one task's buffer
    * holding every converting user at 100 TB; migrated alongside
    * `ext_orders_interarrival` to the shared scale-safe shape.
    */
  val funnelLatency: Q = Q(
    "ext_funnel_latency",
    """WITH fv AS (
      |  SELECT user_id, MIN(ts) AS first_view
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |fp AS (
      |  SELECT e.user_id, MIN(e.ts) AS first_purchase
      |  FROM events e JOIN fv ON fv.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
      |  GROUP BY 1),
      |lat AS (
      |  SELECT fv.user_id,
      |    CAST(epoch_us(fp.first_purchase) - epoch_us(fv.first_view)
      |      AS BIGINT) // 1000000 AS lat_s
      |  FROM fv JOIN fp ON fp.user_id = fv.user_id),
      |arr AS (SELECT list(lat_s ORDER BY lat_s) AS ls,
      |               CAST(COUNT(*) AS BIGINT) AS n_conv,
      |               CAST(SUM(lat_s) AS BIGINT) AS tot FROM lat),
      |u AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_viewers FROM fv)
      |SELECT n_viewers, n_conv,
      |  ls[(CAST(n_conv AS INTEGER) + 1) // 2] AS p50_s,
      |  ls[(CAST(n_conv AS INTEGER) * 9 + 9) // 10] AS p90_s,
      |  ls[CAST(n_conv AS INTEGER)] AS max_s,
      |  tot // n_conv AS mean_s
      |FROM arr CROSS JOIN u""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val fv = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("first_view"))
    val fp = ev.filter(col("event_type") === "purchase")
      .join(fv, Seq("user_id"))
      .filter(col("ts") >= col("first_view"))
      .groupBy("user_id").agg(min(col("ts")).as("first_purchase"))
    // converting-user-sized; BOTH bucket-rank passes read it, so derive
    // the two keyed aggregates + join once
    val lat = fv.join(fp, Seq("user_id"))
      .select(expr("cast((unix_micros(first_purchase) - " +
        "unix_micros(first_view)) div 1000000 as bigint)").as("lat_s"))
      .eagerCheckpoint()
    val dist = BucketRank.lowerPercentiles(lat, "lat_s",
      v => floor(v / 3600L), // hour buckets; lat_s >= 0 by construction
      Seq("p50_s" -> "(n + 1) div 2", "p90_s" -> "(n * 9 + 9) div 10"))
    val u = fv.agg(count(lit(1)).as("n_viewers"))
    dist.crossJoin(broadcast(u))
      .select(col("n_viewers"), col("n").as("n_conv"),
        col("p50_s"), col("p90_s"), col("max_v").as("max_s"),
        expr("cast(tot div n as bigint)").as("mean_s"))
  }

  /** Engagement stickiness at the stream head: DAU / WAU (7 d) / MAU
    * (30 d) distinct users anchored on the LAST event day, plus the
    * classic DAU/MAU and WAU/MAU ratios in integer ppm. Exact distinct
    * counts (the observability contract at gate; a 100 TB deployment
    * swaps in the KMV sketch of `ext_kmv_distinct` for the same three
    * windows). One broadcast bounds row + three conditional distinct
    * aggregates — no per-day window, no self-join.
    */
  val stickiness: Q = Q(
    "ext_events_stickiness",
    """WITH ref AS (SELECT MAX(ts::DATE) AS d0 FROM events),
      |agg AS (
      |  SELECT
      |    CAST(COUNT(DISTINCT CASE WHEN ts::DATE = d0
      |      THEN user_id END) AS BIGINT) AS dau,
      |    CAST(COUNT(DISTINCT CASE WHEN ts::DATE >= d0 - 6
      |      THEN user_id END) AS BIGINT) AS wau,
      |    CAST(COUNT(DISTINCT CASE WHEN ts::DATE >= d0 - 29
      |      THEN user_id END) AS BIGINT) AS mau,
      |    strftime(MAX(d0), '%Y-%m-%d') AS ref_day
      |  FROM events CROSS JOIN ref)
      |SELECT ref_day, dau, wau, mau,
      |  dau * 1000000 // mau AS dau_mau_ppm,
      |  wau * 1000000 // mau AS wau_mau_ppm
      |FROM agg""".stripMargin
  ) { (s, d) =>
    val ref = Tables.events(s, d)
      .agg(max(col("ts").cast("date")).as("d0"))
    Tables.events(s, d).crossJoin(broadcast(ref))
      .agg(
        count_distinct(when(col("ts").cast("date") === col("d0"),
          col("user_id"))).as("dau"),
        count_distinct(when(col("ts").cast("date") >=
          date_sub(col("d0"), 6), col("user_id"))).as("wau"),
        count_distinct(when(col("ts").cast("date") >=
          date_sub(col("d0"), 29), col("user_id"))).as("mau"),
        date_format(max(col("d0")), "yyyy-MM-dd").as("ref_day"))
      .select(col("ref_day"), col("dau"), col("wau"), col("mau"),
        expr("dau * 1000000 div mau").as("dau_mau_ppm"),
        expr("wau * 1000000 div mau").as("wau_mau_ppm"))
  }

  def all: Seq[Q] = Seq(sessionPaths, funnelLatency, stickiness)
}
