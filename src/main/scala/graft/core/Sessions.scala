package graft.core

import org.apache.spark.sql.SparkSession

/** Session construction shared by Verify / Bench / tests.
  *
  * One long-lived session per process (the reference opens a MySQL
  * connection per call, db.py:28-59 — we deliberately do not mirror that).
  */
object Sessions {

  /** Configs every graft session needs, applied to a builder. Also wires
    * the custom-plan tier (graft.plans: as-of join strategy + its
    * pushdown/pruning optimizer rules) — extensions bind at session
    * creation, and every graft entry point builds through here. */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .withExtensions(graft.plans.GraftExtensions.install)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    // the generated-class cache defaults to 100 entries; this engine's
    // registry compiles several hundred distinct codegen classes per pass
    // (80+ queries x multiple stages, some huge — 64 vec_dot calls with
    // 64-element literal arrays), so at 100 the hot classes thrash and
    // janino recompiles INSIDE tasks: a measured intermittent 2-20 s
    // single-threaded stall per stage (thread dumps show
    // CodeGenerator.doCompile under Executor task launch worker; task
    // counters show wall time with ~zero user CPU, zero GC, zero retries).
    // Static conf — must be set before the first session is created.
    .config("spark.sql.codegen.cache.maxEntries", "5000")
    // Round 16: drop the codegen stage id from generated CLASS NAMES so
    // structurally identical stages hash to the SAME source and the
    // codegen cache collapses them. Measured on the pagerank loop (the
    // registry's biggest codegen bodies): the 10 unrolled rounds'
    // whole-stage sources collapse to 2 distinct bodies instead of
    // compiling ~34 distinct classes per run (cold run 6.9 s -> 5.5 s,
    // and far fewer large methods for C2 to churn through — the r15
    // verdict's graph-family JIT band attribution). Cost: generated
    // class names no longer embed the stage id in stack traces; plans
    // still carry the ids.
    .config("spark.sql.codegen.useIdInClassName", "false")
    // NOTE on AQE coalescing (measured, round 5): the default 1 MB
    // minPartitionSize coalesces the dedup family's byte-small but
    // md5-dense shuffles to ~2 partitions (probe: tasks=2 on hot stages).
    // Lowering the floor to 16k restored 32-way parallelism and was
    // FASTER in isolated runs (minhash 3.4 s -> 1.8 s warm), but in
    // full-bench context it was catastrophically slower (minhash 2-5 s ->
    // 40-240 s; per-task wall exploded ~8 s/task with low GC and a code
    // cache far from full). The trigger is long-JVM execution state, not
    // plan shape; until that interaction is attributed, the default floor
    // stays — at 100 TB partitions dwarf either floor, so this is a
    // fixture-scale tradeoff only.
    // fixture `events.ts` is parquet TIMESTAMP(NANOS): read as nanos long,
    // converted to a micros timestamp in Tables.load
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Fixture timestamps are timezone-naive parquet micros (the round-8
    // regen dropped isAdjustedToUTC). Spark 4 infers those as
    // TIMESTAMP_NTZ by default, which streaming watermarks reject
    // (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) and the store's TimestampType
    // encoders cannot accept (LocalDateTime external type). With the
    // session pinned to UTC above, reading them as TIMESTAMP yields the
    // identical wall-clock values DuckDB sees — same engine-parity
    // behavior as the earlier tz-adjusted fixtures.
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // managed-table home for the bucketed-join path (ext.BucketedJoin);
    // keep it out of the repo working tree
    .config("spark.sql.warehouse.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
    // streaming checkpoints on file: skip the local ChecksumFs CRC
    // mirror (2 extra file ops per WAL entry / state commit per batch);
    // non-file checkpoint schemes resolve unmodified — see
    // RawLocalCheckpointFileManager. Overridable per session/query conf.
    .config("spark.sql.streaming.checkpointFileManagerClass",
      "graft.core.RawLocalCheckpointFileManager")

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n`, restoring the previous value after. Streaming queries use this:
    * stateful operators pay a per-partition-per-microbatch state-store
    * commit (file create + rename), so a 10k-row fixture stream through
    * 32 state partitions is pure fixed overhead — 8 partitions carry the
    * same data with a quarter of the commits. On a real cluster the
    * stream's state partition count is sized to key cardinality at the
    * query's FIRST start (it is sticky in the checkpoint), not to the
    * batch session default — this helper is that sizing decision. */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** The disk-spilling state store for stateful streaming (SURVEY
    * §7.5b): the default HDFSBackedStateStoreProvider keeps every
    * partition's state map ON-HEAP, so at 100 TB-scale state (dedup
    * fingerprints over a day's ingest, open sessions for hundreds of
    * millions of users) executors OOM long before CPU saturates.
    * RocksDB keeps state off-heap on local disk with incremental
    * checkpointing — the provider Spark itself recommends for large
    * state. Sizing rule: default provider while peak state per
    * partition stays well inside executor heap (state rows x row size /
    * partitions << heap); switch to RocksDB beyond that, at the cost of
    * per-access (de)serialization. The provider is STICKY in a query's
    * checkpoint: choose it before first start. */
  val RocksDbStateStoreProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the streaming state-store provider temporarily set
    * (queries STARTED inside pick it up; running queries keep theirs).
    * `withStateStore(spark, RocksDbStateStoreProvider) { ... }` is the
    * 100 TB knob — see [[RocksDbStateStoreProvider]].
    *
    * Cross-thread hazard (single-writer session assumption): the provider
    * rides SESSION-scoped conf for the scope's duration, so a streaming
    * query started concurrently from ANOTHER thread of the same
    * SparkSession inside this window silently inherits the provider — and
    * the choice is sticky in that query's checkpoint forever. Callers that
    * start streams from multiple threads must either serialize query
    * starts around this scope or pass the provider per query via
    * `.option("spark.sql.streaming.stateStore.providerClass", ...)` on
    * the writeStream (per-query options shadow the session conf). */
  def withStateStore[T](spark: SparkSession, providerClass: String)(
      body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, providerClass)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Local session sized to the harness (local[N] = N executor threads in
    * one JVM; shuffle partitions match cores, not the 200 default). */
  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
