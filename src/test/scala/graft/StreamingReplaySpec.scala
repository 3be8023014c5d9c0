package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Multi-batch replay contracts for the stateful streaming ops (funnel /
  * attribution / EWMA): the fixture now replays in >= 3 time-ordered
  * micro-batches (StreamReplay), so these specs pin (1) the fixture
  * precondition that makes replay-equals-batch exact, (2) stream==batch
  * equality under real batch boundaries, and (3) the funnel tombstone
  * mechanism: expiry + re-completion really re-emits, and the keyed
  * MIN-per-user sink is what restores the oracle's first-completion
  * semantics.
  */
class StreamingReplaySpec extends SparkSuite {
  import spark.implicits._

  test("fixture precondition: no user is silent past the 7d reap " +
    "horizon, so horizon reaping cannot fire mid-history") {
    val gaps = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"))
      .withColumn("prev", lag(col("ts"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts")))
      .filter(col("prev").isNotNull)
      .select((unix_timestamp(col("ts")) - unix_timestamp(col("prev")))
        .as("gap_s"))
    val maxGap = gaps.agg(max(col("gap_s"))).head.getLong(0)
    assert(maxGap < 7L * 24 * 3600,
      s"max per-user gap ${maxGap}s breaches the 7d horizon — the " +
        "stream-equals-batch contract for EWMA/attribution no longer holds")
  }

  test("EWMA under 3-batch replay equals the batch fold exactly") {
    val stream = graft.streaming.StreamEwma.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val batch = graft.ext.EventsOps.eventsEwma.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(stream.toSeq == batch.toSeq)
  }

  test("attribution under 3-batch replay equals the batch rollup exactly") {
    val stream = graft.streaming.StreamAttribution.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val batch = graft.ext.Attribution.lastTouch.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(stream.toSeq == batch.toSeq)
  }

  test("funnel tombstone: expiry + re-completion re-emits in the raw " +
    "stream, and the keyed sink keeps the FIRST completion") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_test_tombstone").toString
    def ts(hours: Double): Timestamp =
      new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime
        + (hours * 3600_000L).toLong)
    var id = 0L
    def row(h: Double, user: Long, typ: String) = {
      id += 1; (id, ts(h), user, typ, 1.0, "{}")
    }
    val rows = Seq(
      // user 1 completes early: tombstone horizon ends at 3h + 24h = 27h
      row(1.0, 1L, "view"), row(2.0, 1L, "click"), row(3.0, 1L, "purchase")
    ) ++
      // batch-1 filler (views only, no funnels) drives the watermark to
      // ~31h > 27h, so user 1's tombstone expires during batch 2
      (0 until 37).map(i => row(4.0 + i, 100L + i, "view")) ++
      // batch-2 filler: user 1 absent -> the expiry fires here
      (0 until 20).map(i => row(41.0 + i, 200L + i, "view")) ++
      // batch 3: user 1 re-completes against a FRESH state
      Seq(row(80.0, 1L, "view"), row(81.0, 1L, "click"),
        row(82.0, 1L, "purchase")) ++
      (0 until 27).map(i => row(61.0 + i * 0.5, 300L + i, "view"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val raw = graft.streaming.StreamFunnel.rawHits(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val user1 = raw.filter(_._1 == 1L).map(_._2).sorted
    assert(user1.length == 2,
      s"expected tombstone expiry + re-completion to emit twice, got " +
        s"${user1.toSeq} — the keyed-sink rule would be decorative")
    val out = graft.streaming.StreamFunnel.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    assert(out.count(_._1 == 1L) == 1)
    assert(out.find(_._1 == 1L).get._2 == ts(3.0),
      "keyed sink must keep the FIRST completion")
  }

  test("streaming dedup under the RocksDB state store provider (the " +
    "100 TB spill knob) equals the batch DISTINCT oracle; provider " +
    "restores after") {
    import graft.core.Sessions
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    val got = Sessions.withStateStore(spark,
        Sessions.RocksDbStateStoreProvider) {
      assert(spark.conf.get(key) == Sessions.RocksDbStateStoreProvider)
      graft.streaming.StreamDedup.distinctFingerprints(spark, sf)
        .as[String].collect().toSeq
    }
    assert(spark.conf.getOption(key) == before,
      "state-store provider must restore after the scope")
    val oracle = spark.read.parquet(s"$sf/documents.parquet")
      .select(md5(col("text")).as("fp")).distinct()
      .orderBy("fp").as[String].collect().toSeq
    assert(got == oracle,
      s"RocksDB-backed dedup diverged: got ${got.size} vs " +
        s"${oracle.size} fingerprints")
    assert(got.nonEmpty)
  }

  test("streaming PIT features equal the batch PIT join row-for-row " +
    "(online == offline under two-source multi-batch replay)") {
    val sf = "/root/testdata/sf0.001"
    val online = graft.streaming.StreamFeaturePit.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        Option(r.getString(4)))).toSet
    val offline = graft.ext.FeatureGen.featurePit.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        Option(r.getString(4)))).toSet
    assert(online == offline,
      s"online-offline skew: only-online=${(online -- offline).take(3)} " +
        s"only-offline=${(offline -- online).take(3)}")
    assert(online.nonEmpty)
  }
}
