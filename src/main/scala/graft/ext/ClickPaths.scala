package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] clickstream path mining: the top event-type TRIGRAM paths across
  * all users — the "what do users actually do, three steps at a time"
  * query product analytics runs constantly. [[EventsOps]]'
  * `ext_events_transitions` is the first-order (bigram/Markov) view;
  * trigrams expose asymmetries a first-order chain cannot (view>click>
  * purchase vs click>view>purchase are distinct here, identical there).
  *
  * Scale shape: ONE shuffle (user_id) builds each user's ordered type
  * sequence; trigram expansion is array-local (the bigram-zip idiom of
  * `ext_text_bigram_lm` extended to width 3); the count is a map-side-
  * combined aggregate over short path strings, and top-20 is
  * TakeOrderedAndProject — no global sort. Per-user arrays are bounded
  * by per-user event counts (fixture ~70; a real deployment sessionizes
  * first, bounding them harder).
  */
object ClickPaths {

  val sessionPaths: Q = Q(
    "ext_session_paths",
    """WITH seq AS (
      |  SELECT user_id,
      |    list(event_type ORDER BY ts, event_id) AS ts2
      |  FROM events GROUP BY 1),
      |tri AS (
      |  SELECT unnest(list_transform(
      |    generate_series(1, len(ts2) - 2),
      |    i -> ts2[i] || '>' || ts2[i+1] || '>' || ts2[i+2])) AS path
      |  FROM seq WHERE len(ts2) >= 3)
      |SELECT path, CAST(COUNT(*) AS BIGINT) AS n
      |FROM tri GROUP BY path
      |ORDER BY n DESC, path LIMIT 20""".stripMargin
  ) { (s, d) =>
    val seq = Tables.events(s, d)
      .groupBy("user_id")
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

  def all: Seq[Q] = Seq(sessionPaths)
}
