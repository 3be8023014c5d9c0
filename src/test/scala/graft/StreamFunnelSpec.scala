package graft

import java.sql.Timestamp

import graft.streaming.StreamFunnel

/** Planted-fixture semantics for the streaming CEP funnel: ordering,
  * step bounds, first-completion-only, and the latest-view rule.
  */
class StreamFunnelSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime
      .of(2024, 1, 1, 0, 0, 0).plusMinutes(minutes))

  test("funnel: completes in order within bounds; rejects wrong order, " +
    "blown step bounds; emits once per user; uses the LATEST view") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_test_funnel").toString
    val rows = Seq(
      // user 1: clean completion -> hit at +20min
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(10), 1L, "click", 1.0, "{}"),
      (3L, ts(20), 1L, "purchase", 1.0, "{}"),
      // user 2: click 7h after view (> 6h bound) -> no hit
      (4L, ts(0), 2L, "view", 1.0, "{}"),
      (5L, ts(420), 2L, "click", 1.0, "{}"),
      (6L, ts(430), 2L, "purchase", 1.0, "{}"),
      // user 3: click precedes view -> no hit
      (7L, ts(0), 3L, "click", 1.0, "{}"),
      (8L, ts(1), 3L, "view", 1.0, "{}"),
      (9L, ts(2), 3L, "purchase", 1.0, "{}"),
      // user 5: two valid purchases -> ONE hit, the earliest (+120min)
      (10L, ts(0), 5L, "view", 1.0, "{}"),
      (11L, ts(60), 5L, "click", 1.0, "{}"),
      (12L, ts(120), 5L, "purchase", 1.0, "{}"),
      (13L, ts(180), 5L, "purchase", 1.0, "{}"),
      // user 6: first view is stale, but the LATEST view (+300min)
      // puts the +600min click in bound -> hit at +660min
      (14L, ts(0), 6L, "view", 1.0, "{}"),
      (15L, ts(300), 6L, "view", 1.0, "{}"),
      (16L, ts(600), 6L, "click", 1.0, "{}"),
      (17L, ts(660), 6L, "purchase", 1.0, "{}"),
      // user 7: a view TIES the click at +600min (strict < excludes it),
      // but the strictly-earlier view at +300min anchors the click
      // -> hit at +660min regardless of tie order in the sort
      (18L, ts(300), 7L, "view", 1.0, "{}"),
      (19L, ts(600), 7L, "view", 1.0, "{}"),
      (20L, ts(600), 7L, "click", 1.0, "{}"),
      (21L, ts(660), 7L, "purchase", 1.0, "{}"),
      // user 8: the purchase TIES the latest valid click (+600min, valid
      // via view@+300); the prevClickUs rotation must keep the
      // strictly-earlier valid click (+300min) as the purchase's anchor
      (22L, ts(0), 8L, "view", 1.0, "{}"),
      (29L, ts(300), 8L, "view", 1.0, "{}"),
      (23L, ts(300), 8L, "click", 1.0, "{}"),
      (24L, ts(600), 8L, "click", 1.0, "{}"),
      (25L, ts(600), 8L, "purchase", 1.0, "{}"),
      // user 9: view and click tie with NO earlier view -> no hit
      (26L, ts(600), 9L, "view", 1.0, "{}"),
      (27L, ts(600), 9L, "click", 1.0, "{}"),
      (28L, ts(660), 9L, "purchase", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = StreamFunnel.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(out == Map(1L -> ts(20), 5L -> ts(120), 6L -> ts(660),
      7L -> ts(660), 8L -> ts(600)),
      s"funnel hits wrong: $out")
  }
}
