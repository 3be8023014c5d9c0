package graft

import org.apache.spark.sql.functions._

import graft.ext.Attribution

/** Invariant pins for the attribution / rolling-reach ops. */
class AttributionSpec extends SparkSuite {

  test("last-touch: every purchase is attributed exactly once") {
    val out = Attribution.lastTouch.fn(spark, sf)
    val events = graft.core.Tables.events(spark, sf)
    val nPurch = events.filter(col("event_type") === "purchase").count()
    val attributed = out.agg(sum("n_purchases")).head.getLong(0)
    assert(attributed == nPurch,
      s"attribution must partition purchases: $attributed vs $nPurch")
    // conservation of revenue: channel split resums to the global total
    val revOut = out.agg(sum("attributed_revenue")).head.getDouble(0)
    val revIn = events.filter(col("event_type") === "purchase")
      .agg(graft.core.Determinism.dsum(col("value"))).head.getDouble(0)
    assert(math.abs(revOut - revIn) < 1e-6, s"$revOut vs $revIn")
    // channels are the derived domain plus optionally 'none'
    val chans = out.select("channel").collect().map(_.getString(0)).toSet
    assert(chans.subsetOf(Set("none", "ch_0", "ch_1", "ch_2", "ch_3", "ch_4")))
  }

  test("rolling distinct: one row per active hour, trailing window bounds") {
    val out = Attribution.rollingDistinct.fn(spark, sf).collect()
    val events = graft.core.Tables.events(spark, sf)
    val hourly = events
      .select(date_trunc("hour", col("ts")).as("h"), col("user_id"))
      .distinct()
    val nHours = hourly.select("h").distinct().count()
    assert(out.length == nHours,
      s"one row per active hour: ${out.length} vs $nHours")
    // the trailing-24h reach can never be below the single-hour reach,
    // nor above the global distinct-user count
    val perHour = hourly.groupBy("h").agg(count_distinct(col("user_id"))
      .as("n1")).collect()
      .map(r => r.getAs[java.sql.Timestamp]("h") -> r.getAs[Long]("n1"))
      .toMap
    val nGlobal = events.select("user_id").distinct().count()
    out.foreach { r =>
      val h = r.getAs[java.sql.Timestamp]("bucket_hour")
      val n = r.getAs[Long]("n_users")
      assert(n >= perHour(h), s"$h: rolling $n < single-hour ${perHour(h)}")
      assert(n <= nGlobal)
    }
  }
}
