package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Q

/** [EXT] streaming point-in-time features — the ONLINE half of the
  * feature store whose offline half is [[graft.ext.FeatureGen.featurePit]]:
  * label rows (orders) and feature rows (events) arrive as TWO streams,
  * and the state machine serves each label the running
  * (count, exact-cent spend, last event type) over the entity's events
  * STRICTLY before the label instant. The gate asserts the
  * feature-store contract that makes online models trustworthy:
  * online == offline, checked value-exact against the SAME DuckDB
  * oracle as the batch op.
  *
  * == Two-source replay and out-of-order arrival ==
  *
  * Each source replays as [[StreamReplay.Batches]] time-ordered files of
  * its OWN time distribution, so across sources rows interleave out of
  * order (an order in batch 1 can precede events with smaller
  * timestamps arriving in events-batch 2). The state machine therefore
  * emits MONOTONE REFINEMENTS: every batch touching a user re-emits all
  * of that user's labels computed from the events seen so far; a
  * label's n_events_before only grows as earlier events land, so the
  * keyed sink (max n per label, payload via max_by) converges to the
  * complete view once both sources drain — which processAllAvailable
  * guarantees before the sink read.
  *
  * State is the per-entity event set plus labels (entity-bounded — the
  * sessionize caveat; a production deployment folds the prefix behind
  * the combined watermark into running aggregates and keeps only the
  * tail buffer). Spend is folded in exact integer CENTS, so the final
  * double equals the batch op's DECIMAL(10,2)->DOUBLE cast
  * bit-for-bit; the strict-< boundary (an event AT the label instant is
  * excluded) is the same leak rule, spec-pinned batch-side.
  */
object StreamFeaturePit {

  private val ProbeMax = 20L

  case class PitEv(user_id: Long, tsUs: Long, kind: Int, seq: Long,
      etype: String, cents: Long)
  case class PitState(rows: List[PitEv])
  case class PitRow(o_orderkey: Long, o_custkey: Long,
      n_events_before: Long, sum_value_before: Double,
      last_event_type: String)

  private def features(userId: Long, all: Seq[PitEv]): Seq[PitRow] = {
    // one ordered pass: labels sort before events at equal ts (kind 0
    // first) == the batch op's strict-< rule
    val ordered = all.sortBy(e => (e.tsUs, e.kind, e.seq))
    var n = 0L
    var cents = 0L
    var last: String = null
    val out = Seq.newBuilder[PitRow]
    ordered.foreach { e =>
      if (e.kind == 0)
        out += PitRow(e.seq, userId, n, cents / 100.0, last)
      else { n += 1; cents += e.cents; last = e.etype }
    }
    out.result()
  }

  private def step(userId: Long, evs: Iterator[PitEv],
      state: GroupState[PitState]): Iterator[PitRow] = {
    val st = PitState(
      state.getOption.map(_.rows).getOrElse(Nil) ++: evs.toList)
    state.update(st)
    features(userId, st.rows).iterator
  }

  def run(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 8) {
    import spark.implicits._
    val name = "pit_" + UUID.randomUUID().toString.replace("-", "")
    val evBatch = spark.read.parquet(s"$dir/events.parquet")
    val odBatch = spark.read.parquet(s"$dir/orders.parquet")
    val evStream = {
      val s0 = StreamReplay.source(spark, dir, evBatch.schema)
      val s1 =
        if (evBatch.schema("ts").dataType ==
            org.apache.spark.sql.types.LongType)
          s0.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else s0
      s1.filter(col("user_id") <= ProbeMax)
        .select(col("user_id"), unix_micros(col("ts")).as("tsUs"),
          lit(1).as("kind"), col("event_id").as("seq"),
          col("event_type").as("etype"),
          round(col("value") * 100).cast("long").as("cents"))
    }
    val odStream = StreamReplay
      .sourceFor(spark, dir, "orders", Seq("o_orderdate", "o_orderkey"),
        odBatch.schema)
      .filter(col("o_custkey") <= ProbeMax)
      .select(col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate")).as("tsUs"), lit(0).as("kind"),
        col("o_orderkey").as("seq"),
        lit(null).cast("string").as("etype"), lit(0L).as("cents"))
    implicit val evEnc = Encoders.product[PitEv]
    implicit val stEnc = Encoders.product[PitState]
    implicit val outEnc = Encoders.product[PitRow]
    val rows = evStream.unionByName(odStream).as[PitEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
    val q = rows.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      StreamReplay.requireMultiBatch(q)
    } finally q.stop()
    // keyed sink: the refinement with the most folded events wins
    spark.table(name)
      .groupBy("o_orderkey")
      .agg(first(col("o_custkey")).as("o_custkey"),
        max(col("n_events_before")).as("n_events_before"),
        max_by(col("sum_value_before"), col("n_events_before"))
          .as("sum_value_before"),
        max_by(col("last_event_type"), col("n_events_before"))
          .as("last_event_type"))
      .orderBy("o_orderkey")
  }

  /** Gate entry: online features equal the offline PIT join — the SAME
    * oracle as `ext_feature_pit`. */
  val streamFeaturePit: Q = Q(
    "ext_stream_feature_pit",
    graft.ext.FeatureGen.featurePit.oracle.get
  ) { (s, d) => run(s, d) }

  def all: Seq[Q] = Seq(streamFeaturePit)
}
