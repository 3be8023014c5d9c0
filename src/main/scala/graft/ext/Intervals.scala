package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] interval coalescing (gaps-and-islands): each event opens a
  * 30-minute activity interval; overlapping/touching intervals per user
  * merge into maximal "islands", rolled up to per-user coverage stats.
  * The canonical warehouse shape for uptime/coverage/contiguous-activity
  * questions that correlated self-joins answer quadratically.
  *
  * Scale shape: ONE keyed shuffle (user_id) feeds everything — the
  * exclusive-frame running `max(end)` that marks island breaks, the
  * running sum that numbers islands, and both rollups (groupBy
  * (user_id, island) and groupBy(user_id) are satisfied by the same
  * hash partitioning, so Catalyst plans no further exchange). No
  * self-join, no interval join; per-user state is a sort, not a cross
  * product, so power users cost n log n, never n^2.
  *
  * All arithmetic is integer microseconds (engine-exact); ties on `ts`
  * are ordered by event_id so both engines walk identical frames.
  */
object Intervals {

  private val LenUs = 1800000000L // 30 min in microseconds

  val intervalMerge: Q = Q(
    "ext_interval_merge",
    s"""WITH iv AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS st,
       |    epoch_us(ts) + $LenUs AS en
       |  FROM events),
       |flagged AS (
       |  SELECT user_id, event_id, st, en,
       |    CASE WHEN max(en) OVER wprev IS NULL
       |           OR st > max(en) OVER wprev THEN 1 ELSE 0 END AS brk
       |  FROM iv
       |  WINDOW wprev AS (PARTITION BY user_id ORDER BY st, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |islands AS (
       |  SELECT user_id, st, en,
       |    SUM(brk) OVER (PARTITION BY user_id ORDER BY st, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM flagged),
       |grp AS (
       |  SELECT user_id, island, MIN(st) AS ist, MAX(en) AS ien
       |  FROM islands GROUP BY 1, 2)
       |SELECT user_id, COUNT(*) AS n_islands,
       |  CAST(SUM(ien - ist) AS BIGINT) AS covered_us,
       |  MAX(ien - ist) AS max_island_us
       |FROM grp GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val iv = Tables.events(s, d).select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("st"))
      .withColumn("en", col("st") + LenUs)
    val wPrev = Window.partitionBy("user_id").orderBy("st", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("user_id").orderBy("st", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevEnd = max(col("en")).over(wPrev)
    iv.withColumn("brk",
        when(prevEnd.isNull || col("st") > prevEnd, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy("user_id", "island")
      .agg(min(col("st")).as("ist"), max(col("en")).as("ien"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum(col("ien") - col("ist")).as("covered_us"),
        max(col("ien") - col("ist")).as("max_island_us"))
      .orderBy("user_id")
  }

  def all: Seq[Q] = Seq(intervalMerge)
}
