package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Q

/** [EXT] streaming KMV distinct sketch — live approximate distinct
  * user-days per event type, the online counterpart of
  * [[graft.ext.KmvDistinct]]. The state per group is the k smallest
  * DISTINCT hashes (O(k) longs, k = 256) — bounded regardless of stream
  * length, and the admit operation is COMMUTATIVE and IDEMPOTENT, so the
  * result is independent of arrival order and of micro-batch boundaries:
  * no in-group sorting is needed (contrast [[StreamEwma]], whose fold is
  * order-sensitive). That property is exactly why KMV-style sketches are
  * the right distinct-count state for streams at any scale: replays,
  * reordering, and duplicate delivery all collapse into the same state.
  *
  * == Determinism / oracle ==
  *
  * The hash (md5 of "user_id|day", first 12 hex digits) and the
  * (k-1)*2^48/h_k integer estimator are the batch op's exactly, so the
  * final per-type state equals the per-type rows of `ext_kmv_distinct`
  * and the DuckDB oracle recomputes them from scratch. The fixture
  * replays in [[StreamReplay.Batches]] time-ordered micro-batches —
  * because the admit is commutative/idempotent the final state is
  * batching-invariant, and the multi-batch gate PROVES it rather than
  * assuming it. The group-key domain is the bounded event_type enum (5
  * values), so state never needs reaping (NoTimeout); each group emits
  * its current estimate once per micro-batch touching it — a live
  * metric stream, keyed by event_type in the sink (latest n_seen wins).
  */
object StreamKmv {

  private val K = 256
  private val HashRange = 1L << 48
  private val EstNum = (K - 1).toLong * HashRange

  case class HEv(event_type: String, h: Long)
  case class KmvState(hashes: Seq[Long], seen: Long)
  case class KmvRow(event_type: String, n_seen: Long, n_kept: Long,
      kth_hash: Long, est_distinct: Long)

  private def step(et: String, evs: Iterator[HEv],
      state: GroupState[KmvState]): Iterator[KmvRow] = {
    val prev = state.getOption.getOrElse(KmvState(Seq.empty, 0L))
    // set-union + trim: commutative, idempotent, order-independent
    var admitted = 0L
    val merged = (prev.hashes.iterator ++ evs.map { e => admitted += 1; e.h })
      .foldLeft(scala.collection.immutable.TreeSet.empty[Long])(_ + _)
      .take(K).toSeq
    val seen = prev.seen + admitted
    state.update(KmvState(merged, seen))
    val nKept = merged.size.toLong
    val kth = if (merged.size == K) merged.last else -1L
    val est = if (merged.size < K) nKept else EstNum / kth
    // n_seen (events admitted so far) strictly increases with every
    // emission of a group, so a keyed sink can pick the latest estimate
    Iterator.single(KmvRow(et, seen, nKept, kth, est))
  }

  def run(spark: SparkSession, dir: String): DataFrame =
      graft.core.Sessions.withShufflePartitions(spark, 8) {
    import spark.implicits._
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val name = "kmv_" + UUID.randomUUID().toString.replace("-", "")
    val stream = StreamReplay.source(spark, dir, batch.schema)
    val withTs =
      if (batch.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else stream
    implicit val evEnc = Encoders.product[HEv]
    implicit val stEnc = Encoders.product[KmvState]
    implicit val outEnc = Encoders.product[KmvRow]
    val rows = withTs
      .withWatermark("ts", "0 seconds")
      .select(col("event_type"), expr(
        "cast(conv(substring(md5(cast(user_id as string) || '|' || " +
          "cast(cast(ts as date) as string)), 1, 12), 16, 10) as bigint)")
        .as("h"))
      .as[HEv]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
    val q = rows.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      StreamReplay.requireMultiBatch(q)
    } finally q.stop()
    // keyed sink: one live row per type, the latest (highest n_seen) wins
    spark.table(name)
      .groupBy("event_type")
      .agg(max_by(struct(col("n_kept"), col("kth_hash"),
        col("est_distinct")), col("n_seen")).as("r"))
      .select(col("event_type"), col("r.n_kept").as("n_kept"),
        col("r.kth_hash").as("kth_hash"),
        col("r.est_distinct").as("est_distinct"))
      .orderBy("event_type")
  }

  /** Gate entry: the live sketch equals a from-scratch DuckDB KMV per
    * event type (the per-type portion of `ext_kmv_distinct`'s oracle). */
  val streamKmv: Q = Q(
    "ext_stream_kmv_distinct",
    s"""WITH hv AS (
       |  SELECT event_type,
       |    ('0x' || substr(md5(user_id::VARCHAR || '|' ||
       |      (ts::DATE)::VARCHAR), 1, 12))::UBIGINT::BIGINT AS h
       |  FROM events),
       |pairs AS (SELECT DISTINCT event_type AS g, h FROM hv),
       |ranked AS (
       |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
       |  FROM pairs),
       |st AS (
       |  SELECT g,
       |    CAST(SUM(CASE WHEN rn <= $K THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_kept,
       |    MAX(CASE WHEN rn = $K THEN h END) AS kth
       |  FROM ranked GROUP BY g)
       |SELECT g AS event_type, n_kept,
       |  COALESCE(kth, -1) AS kth_hash,
       |  CASE WHEN n_kept < $K THEN n_kept
       |       ELSE $EstNum // kth END AS est_distinct
       |FROM st ORDER BY event_type""".stripMargin
  ) { (s, d) => run(s, d) }

  def all: Seq[Q] = Seq(streamKmv)
}
