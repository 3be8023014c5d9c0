package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.{Q, Tables}

/** [EXT] stateful streaming sessionization:
  * `KeyValueGroupedDataset.flatMapGroupsWithState` with event-time timeout —
  * the Structured Streaming pattern for custom per-key state (SURVEY §2.9
  * marks all streaming as engine extensions).
  *
  * A session closes when the event-time watermark passes its last event +
  * gap; closed sessions are emitted in Append mode. Sessions still open at
  * end-of-input are held in state (correct streaming semantics — they may
  * yet grow), so the gate records rows-only and the spec asserts the
  * emitted set is exactly the batch sessions whose close precedes the
  * final watermark.
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double) {
    def tsUs: Long = {
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
  }
  case class Session(user_id: Long, n_events: Long, t_start_us: Long,
      t_end_us: Long, total_cents: Long)
  case class State(n: Long, startUs: Long, lastUs: Long,
      cents: Long)

  private val GapUs = 1800L * 1000000L

  private def step(userId: Long, evs: Iterator[Ev],
      state: GroupState[State]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(Session(userId, s.n, s.startUs, s.lastUs, s.cents))
    }
    var closed = List.empty[Session]
    var cur = state.getOption
    evs.toSeq.sortBy(_.tsUs).foreach { e =>
      cur match {
        case Some(s) if e.tsUs - s.lastUs <= GapUs =>
          cur = Some(State(s.n + 1, s.startUs, e.tsUs,
            s.cents + math.round(e.value * 100)))
        case Some(s) =>
          closed ::= Session(userId, s.n, s.startUs, s.lastUs, s.cents)
          cur = Some(State(1, e.tsUs, e.tsUs, math.round(e.value * 100)))
        case None =>
          cur = Some(State(1, e.tsUs, e.tsUs, math.round(e.value * 100)))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // close when watermark passes last event + gap
      state.setTimeoutTimestamp((s.lastUs + GapUs) / 1000L + 1L)
    }
    closed.reverseIterator
  }

  /** Run the stateful streaming query to completion over the fixture file
    * and return the emitted (closed) sessions. */
  def run(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val name = "sessions_" + UUID.randomUUID().toString.replace("-", "")
    val stream = spark.readStream.schema(batch.schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val withTs =
      if (batch.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else stream
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[State]
    implicit val outEnc = Encoders.product[Session]
    // keep the watermarked `ts` attribute itself in the typed row — a
    // lambda projection would detach the event-time watermark tag
    val sessions = withTs
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("ts"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(step)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .select(col("user_id"), col("n_events"),
        timestamp_micros(col("t_start_us")).as("t_start"),
        timestamp_micros(col("t_end_us")).as("t_end"),
        (col("total_cents") / 100.0).as("total"))
      .orderBy("user_id", "t_start")
  }

  /** Gate entry (rows-only: open sessions are legitimately withheld). */
  val statefulSessions: Q = Q.noOracle("ext_stream_sessions")(run _)

  val all: Seq[Q] = Seq(statefulSessions)
}
