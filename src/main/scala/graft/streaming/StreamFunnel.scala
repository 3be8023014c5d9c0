package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Q

/** [EXT] streaming CEP-style pattern detection: the strict sequence
  * view -> click -> purchase where EACH step follows the previous within
  * 6 hours (one constant; production tunes it per pattern), detected
  * per user with `flatMapGroupsWithState` — the
  * "complex event processing" shape (match-recognize / Flink CEP) that
  * windowed aggregation cannot express, because the predicate couples
  * each event to the per-user pattern position, not to a fixed window.
  *
  * == State bound (the 100 TB contract) ==
  *
  * Per user the state is five longs + a flag — NOT an event buffer. The
  * sorted-order scan keeps the latest view time and the latest VALID
  * click time plus each one's latest strictly-earlier occurrence (the
  * tie anchors), which is sufficient: a click is pattern-valid iff the
  * latest STRICTLY earlier view is within the bound (that view
  * minimizes the gap), and likewise for purchases over valid clicks.
  * Pending
  * patterns time out one step-bound past their last progress (no later event
  * can extend them: the watermark is already past every timestamp that
  * could), and completed users hold a 24 h tombstone so the
  * one-emission-per-user contract holds across that horizon — bounded
  * state either way, enforced by event-time timeout, never by growth.
  *
  * == Determinism / oracle ==
  *
  * The emitted row per user is the EARLIEST pattern-completing purchase
  * time, which is batch-expressible: the oracle joins the three steps
  * with the same strict-< and step bounds and takes MIN(purchase.ts).
  * The fixture replays in [[StreamReplay.Batches]] time-ordered
  * micro-batches ([[StreamReplay]]), so watermark advances, pending
  * timeouts, and tombstone expiry all fire mid-stream — the state
  * handoff itself is what the gate checks, not one in-group sort.
  *
  * '''One-emission contract (was: horizon caveat).''' The stream emits
  * one row per (user, tombstone-separated completion): a user who
  * completes, goes silent past [[TombstoneUs]] (letting the tombstone
  * expire), and completes a SECOND funnel emits again — bounded state
  * requires forgetting completed users eventually. The oracle's
  * first-completion (MIN-per-user) semantics are realized at the sink,
  * which is keyed by user and keeps the earliest completion; under the
  * 30 d fixture span tombstones genuinely expire between batches, so
  * the sink rule is load-bearing, not decorative.
  */
object StreamFunnel {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String) {
    def tsUs: Long = {
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
  }
  /** viewUs/clickUs = latest (valid) step times; prevViewUs/prevClickUs
    * = latest STRICTLY-EARLIER ones (0 = not reached). The prev slots
    * exist for equal-timestamp ties: the oracle's strict `<` means an
    * event tying the latest step time must anchor on the latest
    * strictly-earlier occurrence instead — without it the outcome would
    * depend on tie order inside the sort and diverge from the batch
    * oracle. lastUs = last processed event time (timeout anchor). */
  case class FunnelState(viewUs: Long, prevViewUs: Long, clickUs: Long,
      prevClickUs: Long, lastUs: Long, done: Boolean)
  case class Hit(user_id: Long, t_funnel_us: Long)

  private val StepUs = 21600L * 1000000L
  private val TombstoneUs = 24L * 3600L * 1000000L

  private def step(userId: Long, evs: Iterator[Ev],
      state: GroupState[FunnelState]): Iterator[Hit] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var st = state.getOption
      .getOrElse(FunnelState(0L, 0L, 0L, 0L, 0L, done = false))
    var hits = List.empty[Hit]
    // anchor = the latest prior-step time STRICTLY before e (the gap
    // minimizer): the latest one when it is earlier than e, else the
    // latest strictly-earlier one (equal-timestamp tie). If the anchor
    // fails the step bound, every earlier occurrence fails it harder.
    def anchor(latest: Long, prev: Long, ts: Long): Long =
      if (latest > 0 && ts > latest) latest else prev
    evs.toSeq.sortBy(_.tsUs).foreach { e =>
      st = st.copy(lastUs = math.max(st.lastUs, e.tsUs))
      if (!st.done) e.event_type match {
        case "view" =>
          // sorted order: a strictly-later view rotates latest -> prev;
          // an equal-timestamp duplicate changes nothing
          if (e.tsUs > st.viewUs)
            st = st.copy(prevViewUs = st.viewUs, viewUs = e.tsUs)
        case "click" =>
          val a = anchor(st.viewUs, st.prevViewUs, e.tsUs)
          if (a > 0 && e.tsUs - a <= StepUs && e.tsUs > st.clickUs)
            st = st.copy(prevClickUs = st.clickUs, clickUs = e.tsUs)
        case "purchase" =>
          val a = anchor(st.clickUs, st.prevClickUs, e.tsUs)
          if (a > 0 && e.tsUs - a <= StepUs) {
            hits ::= Hit(userId, e.tsUs)
            st = st.copy(done = true)
          }
        case _ => ()
      }
    }
    state.update(st)
    state.setTimeoutTimestamp(
      (st.lastUs + (if (st.done) TombstoneUs else StepUs)) / 1000L + 1L)
    hits.reverseIterator
  }

  /** Run the pattern matcher to completion over the fixture stream —
    * replayed in [[StreamReplay.Batches]] time-ordered micro-batches, so
    * watermark advances and timeouts fire mid-stream like a real
    * deployment — and apply the keyed first-completion sink rule. */
  def run(spark: SparkSession, dir: String): DataFrame =
    rawHits(spark, dir)
      .groupBy("user_id")
      .agg(timestamp_micros(min(col("t_funnel_us"))).as("t_funnel"))
      .orderBy("user_id")

  /** The raw emission stream (one row per (user, tombstone-separated
    * completion)) — exposed pre-dedupe so StreamingReplaySpec can pin
    * that tombstone expiry + re-completion really re-emits, and that
    * [[run]]'s keyed sink is therefore load-bearing. */
  private[graft] def rawHits(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 8) {
    import spark.implicits._
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val name = "funnel_" + UUID.randomUUID().toString.replace("-", "")
    val stream = StreamReplay.source(spark, dir, batch.schema)
    val withTs =
      if (batch.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else stream
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[Hit]
    // only the three pattern types reach the state store (filter pushes
    // into the scan; everything else never shuffles)
    val hits = withTs
      .withWatermark("ts", "0 seconds")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(step)
    val q = hits.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      StreamReplay.requireMultiBatch(q)
    } finally q.stop()
    spark.table(name)
  }

  val streamFunnel: Q = Q(
    "ext_stream_funnel",
    s"""SELECT p.user_id, MIN(p.ts) AS t_funnel
      |FROM events p
      |JOIN events c ON c.user_id = p.user_id AND c.event_type = 'click'
      |  AND c.ts < p.ts AND epoch_us(p.ts) - epoch_us(c.ts) <= $StepUs
      |JOIN events v ON v.user_id = c.user_id AND v.event_type = 'view'
      |  AND v.ts < c.ts AND epoch_us(c.ts) - epoch_us(v.ts) <= $StepUs
      |WHERE p.event_type = 'purchase'
      |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin
  ) { (s, d) => run(s, d) }

  val all: Seq[Q] = Seq(streamFunnel)
}
