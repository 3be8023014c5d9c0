package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Q

/** [EXT] streaming online anomaly detection — each event is judged
  * against the moments of everything that arrived BEFORE it (per
  * event_type): z = (v - mean_prefix) / sd_prefix, flagged when
  * |z| > 3 once the prefix holds >= 30 observations with positive
  * variance. The batch anomaly op (`ext_events_anomaly`) asks "which
  * values were outliers against the WHOLE corpus"; this one answers
  * the production question — "would we have alerted at arrival time,
  * knowing only the past" — with no retrospective leakage.
  *
  * == State bound / determinism ==
  *
  * Per event_type the state is three integers: n, sum of cents, sum of
  * squared cents — EXACT (values are 2-decimal, cents^2 sums stay well
  * inside BIGINT at fixture scale and become mergeable decimals at
  * warehouse scale). O(|event types|) state total, no event buffer, no
  * timeout needed. In-group events fold in (ts, event_id) order and
  * the z chain is a fixed sequence of IEEE ops mirrored verbatim in
  * the oracle's exclusive-prefix window SQL, so the per-type anomaly
  * census hash-matches the batch oracle exactly. The fixture replays in
  * [[StreamReplay.Batches]] time-ordered micro-batches; prefix-moment
  * state is slicing-invariant (the fold order is the same total order
  * regardless of where batch boundaries fall), and the sink SUMS the
  * per-batch census deltas, so the multi-batch replay proves the
  * invariance instead of assuming it.
  */
object StreamAnomaly {

  case class ZEv(event_type: String, ts: java.sql.Timestamp,
      event_id: Long, vc: Long) {
    def tsUs: Long = {
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
  }
  case class MomentState(n: Long, s: Long, ss: Long)
  case class TypeCensus(event_type: String, n_events: Long,
      n_anomalies: Long)

  private def step(et: String, evs: Iterator[ZEv],
      state: GroupState[MomentState]): Iterator[TypeCensus] = {
    var st = state.getOption.getOrElse(MomentState(0L, 0L, 0L))
    var seen = 0L
    var anomalies = 0L
    evs.toSeq.sortBy(e => (e.tsUs, e.event_id)).foreach { e =>
      // judge against the EXCLUSIVE prefix, then admit the event
      if (st.n >= 30) {
        val mean = st.s.toDouble / st.n
        val varc = st.ss.toDouble / st.n - mean * mean
        if (varc > 0 &&
          math.abs((e.vc - mean) / math.sqrt(varc)) > 3) anomalies += 1
      }
      st = MomentState(st.n + 1, st.s + e.vc, st.ss + e.vc * e.vc)
      seen += 1
    }
    state.update(st)
    Iterator.single(TypeCensus(et, seen, anomalies))
  }

  def run(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 8) {
    import spark.implicits._
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val name = "zan_" + UUID.randomUUID().toString.replace("-", "")
    val stream = StreamReplay.source(spark, dir, batch.schema)
    val withTs =
      if (batch.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else stream
    implicit val evEnc = Encoders.product[ZEv]
    implicit val stEnc = Encoders.product[MomentState]
    implicit val outEnc = Encoders.product[TypeCensus]
    val census = withTs
      .withWatermark("ts", "0 seconds")
      .select(col("event_type"), col("ts"), col("event_id"),
        (col("value").cast("decimal(10,2)") * 100).cast("long").as("vc"))
      .as[ZEv]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
    val q = census.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      StreamReplay.requireMultiBatch(q)
    } finally q.stop()
    spark.table(name)
      .groupBy("event_type")
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("n_anomalies")).as("n_anomalies"))
      .orderBy("event_type")
  }

  /** Gate entry: the arrival-time anomaly census equals the batch
    * exclusive-prefix-window recomputation. */
  val streamAnomaly: Q = Q(
    "ext_stream_anomaly",
    """WITH seq AS (
      |  SELECT event_type, ts, event_id,
      |    CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS vc
      |  FROM events),
      |pre AS (
      |  SELECT event_type, vc,
      |    COUNT(*) OVER w AS n,
      |    CAST(COALESCE(SUM(vc) OVER w, 0) AS BIGINT) AS s,
      |    CAST(COALESCE(SUM(vc * vc) OVER w, 0) AS BIGINT) AS ss
      |  FROM seq
      |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |fl AS (
      |  SELECT event_type,
      |    CASE WHEN n >= 30
      |        AND (CAST(ss AS DOUBLE) / n
      |             - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) > 0
      |        AND ABS((vc - CAST(s AS DOUBLE) / n) /
      |          sqrt(CAST(ss AS DOUBLE) / n
      |            - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))) > 3
      |      THEN 1 ELSE 0 END AS an
      |  FROM pre)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(an) AS BIGINT) AS n_anomalies
      |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) => run(s, d) }

  def all: Seq[Q] = Seq(streamAnomaly)
}
