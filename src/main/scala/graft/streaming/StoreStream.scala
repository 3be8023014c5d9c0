package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.store.Catalog

/** The COW store as a STRUCTURED STREAMING SOURCE (round 15) — the
  * Delta-Lake "stream from a table" surface:
  *
  * {{{
  *   spark.readStream.format("graft.streaming.GraftStreamProvider")
  *     .option("root", storeRoot).option("table", "events_ingest")
  *     .load()
  * }}}
  *
  * Offsets ARE commit versions: micro-batch k serves exactly the rows
  * of `(v_{k-1}, v_k]`'s manifest diff through [[Catalog.readAppends]]
  * — immutable snapshots make `getBatch` deterministic for fixed
  * versions, so checkpoint replay is EXACTLY-ONCE with no dedup state.
  * The full snapshot backfills as the first batch (`startingVersion`
  * 0, the default); `startingVersion=latest` tails new commits only.
  *
  * Modes:
  *  - '''tail''' (default): appends only. A commit that rewrote,
  *    deleted, or DV-masked existing rows fails the stream LOUDLY
  *    (Delta's own default contract for streaming from a table) —
  *    silently dropping a row removal would corrupt every downstream
  *    aggregate.
  *  - '''readChangeFeed=true''': the row-level changefeed
  *    ([[Catalog.changesWithUpdates]]) with `_change_type` ∈ insert /
  *    delete / update_preimage / update_postimage — updates and
  *    deletes stream as paired images, the CDC-consumer shape.
  *
  * `maxVersionsPerBatch=n` paces admission (the `maxFilesPerTrigger`
  * analogue): at most n commits per micro-batch. Pacing survives
  * restart through a progress file under the source's Spark-assigned
  * `metadataPath` (atomic tmp+move). The file is written at two safe
  * points ONLY: once at construction with the resolved
  * `startingVersion` (so `latest` pins exactly once per checkpoint),
  * and in `Source.commit(end)` — which the engine calls only AFTER
  * the batch is durably recorded in its commit log. It must never be
  * written at `getBatch` time: the file doubles as the `fromV`
  * fallback when recovery replays `getBatch(None, toV)`, and a
  * persist inside `getBatch` followed by a crash before the batch
  * commit would make that replay resolve to the empty `(toV, toV]`
  * range — the backfill silently lost. In-memory `lastEnd` still
  * advances in `getBatch` so pacing works within a run; on restart
  * the recovery `getBatch` replays from the engine's offset log and
  * re-advances it before any new `getOffset`.
  *
  * At 100 TB: `getOffset` reads one version pointer; `getBatch` diffs
  * two manifests driver-side (∝ file count, through the parquet
  * checkpoint + tail deltas) and scans only the files the streamed
  * commits added — a CDC tick's cost, never the table's. */
final class GraftStreamProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-store"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) =
    (shortName(), GraftStoreSource.schemaFor(ctx.sparkSession, parameters))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftStoreSource(ctx.sparkSession, metadataPath, schema,
      parameters)

  /** `writeStream.format(...)` INTO the store, two modes:
    *
    *  - '''append''' (default): each micro-batch lands through
    *    [[StreamIngest.commitBatch]] — batch rows plus the (ledger
    *    key, batchId) row in ONE atomic manifest swap, so delivery is
    *    exactly-once under at-least-once replay with NO dedup scan
    *    (the Delta txn-version pattern, already gate-proven for the
    *    foreachBatch form by `ext_stream_store_ingest`). `orderBy`
    *    fixes intra-batch id order (default: every column —
    *    deterministic for distinct rows).
    *  - '''update + `.option("mergeKey", col)`''' (round 18 — the
    *    CDC-apply / streaming-aggregate shape): each micro-batch
    *    MERGES by the key through [[StreamIngest.mergeBatch]], so an
    *    update-mode aggregation's changed-key emissions land as
    *    upserts and the table converges to the latest per-key image —
    *    exactly-once via the same atomic ledger co-commit (merge is
    *    NOT naturally idempotent, which is why the ledger is
    *    load-bearing here, not an optimization). Complete mode stays
    *    unsupported (it re-emits the world; route a snapshot overwrite
    *    through foreachBatch + replaceWhere).
    *
    * '''Auto-compaction''' (`.option("autoCompact", "true")`, round
    * 18): a streaming sink mints one file group per micro-batch — at a
    * 10 s trigger that is ~8,640 file groups/day/table, and read
    * fan-in (and manifest growth) degrades until someone remembers to
    * run maintenance. With the option set, after each LANDED batch the
    * sink runs [[graft.store.Catalog.Tx.compactSmall]] in a follow-on
    * transaction: only files below `autoCompactSmallRows` visible rows
    * (default 100k) fold, into ~`autoCompactTargetRows` bins (default
    * 1M ≈ a 100 MB parquet file at typical event widths), and only
    * once `autoCompactMinFiles` (default 8) candidates accumulate —
    * so steady state pays one small rewrite per ~8 batches, cost
    * ∝ small-file bytes. It runs OUTSIDE the data commit: the batch's
    * exactly-once ledger row is already durable, a compaction crash
    * loses nothing (content-invariant layout op), and a lost OCC race
    * against a concurrent writer is skipped — maintenance never fails
    * or delays the stream, and never serializes other writers behind
    * it. Sub-options without `autoCompact=true` fail loudly.
    *
    * The ledger key defaults to the query's checkpointLocation (stable
    * across restarts); override with `ledgerQuery` when several
    * queries share a checkpoint convention. */
  override def createSink(ctx: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    import GraftStoreSource.{opt, required}
    if (partitionColumns.nonEmpty)
      throw new UnsupportedOperationException(
        "partitionBy is not supported: layout is engine-managed " +
          "(compact/optimize)")
    val mergeKey = opt(parameters, "mergeKey")
    if (outputMode == OutputMode.Append() && mergeKey.isDefined)
      throw new UnsupportedOperationException(
        "mergeKey needs update output mode: append-mode batches are " +
          "new rows by contract, an upsert there would silently drop " +
          "duplicates — use .outputMode(\"update\")")
    if (outputMode == OutputMode.Update() && mergeKey.isEmpty)
      throw new UnsupportedOperationException(
        "update output mode needs .option(\"mergeKey\", <natural key " +
          "column>): the sink must know which rows an emission " +
          "replaces")
    if (outputMode != OutputMode.Append() &&
        outputMode != OutputMode.Update())
      throw new UnsupportedOperationException(
        s"the graft-store sink supports append (new rows) and update " +
          s"+ mergeKey (upserts); got $outputMode — complete mode " +
          "re-emits the world, route it through foreachBatch + " +
          "replaceWhere")
    val ledger = opt(parameters, "ledgerQuery")
      .orElse(opt(parameters, "checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "the graft-store sink needs a stable exactly-once identity: " +
          "set a checkpointLocation (default ledger key) or " +
          ".option(\"ledgerQuery\", <name>)"))
    val auto = AutoCompact.fromOptions(parameters)
    mergeKey match {
      case Some(k) => new GraftStoreMergeSink(ctx.sparkSession,
        required(parameters, "root"), required(parameters, "table"),
        ledger, k, auto)
      case None => new GraftStoreSink(ctx.sparkSession,
        required(parameters, "root"), required(parameters, "table"),
        ledger,
        opt(parameters, "orderBy").map(_.split(",").map(_.trim).toSeq)
          .getOrElse(Nil), auto)
    }
  }
}

/** Post-commit small-file maintenance policy for the store sinks (see
  * [[GraftStreamProvider.createSink]]'s auto-compaction paragraph). */
private[streaming] final case class AutoCompact(smallRows: Long,
    targetRows: Long, minFiles: Int) {

  /** Best-effort maintenance after a LANDED batch: content-invariant,
    * so an OCC loss to a concurrent writer (another sink instance's
    * compaction, a batch merge) is safely skipped — the candidates are
    * still there for the next batch's pass. Any other failure
    * propagates: a broken store must stop the stream, not be papered
    * over. */
  def run(cat: Catalog, table: String): Unit =
    try cat.compactSmall(table, smallRows, targetRows, minFiles): Unit
    catch { case _: Catalog.ConcurrentWriteException => () }
}

private[streaming] object AutoCompact {

  def fromOptions(parameters: Map[String, String]): Option[AutoCompact] = {
    import GraftStoreSource.opt
    val enabled = opt(parameters, "autoCompact").exists { v =>
      require(v == "true" || v == "false",
        s"autoCompact must be true or false, got '$v'")
      v.toBoolean
    }
    def num(key: String, default: Long): Long = {
      val v = opt(parameters, key)
      if (v.isDefined && !enabled)
        throw new IllegalArgumentException(
          s"$key is set but autoCompact is not enabled — set " +
            ".option(\"autoCompact\", \"true\") or drop the tuning knob")
      val n = v.map(_.toLong).getOrElse(default)
      require(n > 0, s"$key must be positive, got $n")
      n
    }
    val smallRows = num("autoCompactSmallRows", 100000L)
    val targetRows = num("autoCompactTargetRows", 1000000L)
    val minFiles = num("autoCompactMinFiles", 8L).toInt
    if (enabled) Some(AutoCompact(smallRows, targetRows, minFiles))
    else None
  }
}

/** One store table as a V1 streaming sink (see
  * [[GraftStreamProvider.createSink]]). */
private[streaming] final class GraftStoreSink(spark: SparkSession,
    root: String, table: String, ledgerKey: String,
    orderBy: Seq[String],
    autoCompact: Option[AutoCompact] = None) extends Sink {

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = {
    // snapshot the incrementally-planned frame (V1 sink caveat) before
    // the transactional append re-plans it
    val batch = org.apache.spark.sql.GraftSqlShim.batchFrame(spark,
      data.toDF())
    val cat = new Catalog(spark, root)
    val landed = StreamIngest.commitBatch(cat, table,
      ledgerKey, batchId, batch,
      orderBy = orderBy)
    if (landed) autoCompact.foreach(_.run(cat, table))
  }

  override def toString: String =
    s"GraftStoreSink[root=$root, table=$table, ledger=$ledgerKey]"
}

/** One store table as an UPSERT streaming sink (update mode +
  * `mergeKey` — see [[GraftStreamProvider.createSink]]). */
private[streaming] final class GraftStoreMergeSink(spark: SparkSession,
    root: String, table: String, ledgerKey: String,
    keyCol: String,
    autoCompact: Option[AutoCompact] = None) extends Sink {

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = {
    val batch = org.apache.spark.sql.GraftSqlShim.batchFrame(spark,
      data.toDF())
    val cat = new Catalog(spark, root)
    val landed = StreamIngest.mergeBatch(cat, table,
      ledgerKey, batchId, batch, keyCol)
    if (landed) autoCompact.foreach(_.run(cat, table))
  }

  override def toString: String =
    s"GraftStoreMergeSink[root=$root, table=$table, key=$keyCol, " +
      s"ledger=$ledgerKey]"
}

private[streaming] object GraftStoreSource {

  def opt(parameters: Map[String, String], key: String): Option[String] = {
    val hits = parameters.filter(_._1.equalsIgnoreCase(key))
    require(hits.size <= 1, s"duplicate option '$key'")
    hits.values.headOption
  }

  def required(parameters: Map[String, String], key: String): String =
    opt(parameters, key).getOrElse(throw new IllegalArgumentException(
      s"the graft-store stream source requires option '$key' " +
        "(.option(\"root\", <store root>).option(\"table\", <name>))"))

  def isCdf(parameters: Map[String, String]): Boolean =
    opt(parameters, "readChangeFeed").exists(_.toBoolean)

  def schemaFor(spark: SparkSession,
      parameters: Map[String, String]): StructType = {
    val base = new Catalog(spark, required(parameters, "root"))
      .tableShape(required(parameters, "table"))._1
    if (!isCdf(parameters)) base
    else StructType(base.fields :+
      StructField("_change_type", StringType, nullable = false))
  }
}

private[streaming] final class GraftStoreSource(spark: SparkSession,
    metadataPath: String,
    providedSchema: Option[StructType],
    parameters: Map[String, String]) extends Source {

  import GraftStoreSource._

  private val root = required(parameters, "root")
  private val table = required(parameters, "table")
  private val cdf = isCdf(parameters)
  private val maxVersions: Option[Long] =
    opt(parameters, "maxVersionsPerBatch").map { v =>
      val n = try v.toLong catch {
        case _: NumberFormatException => -1L
      }
      if (n <= 0) throw new IllegalArgumentException(
        s"maxVersionsPerBatch must be a positive integer; got '$v'")
      n
    }

  private def cat = new Catalog(spark, root)

  /** High-water mark (highest version ever COMMITTED or resolved as
    * the start), persisted under the Spark-assigned checkpoint
    * metadata path THROUGH THE CHECKPOINT'S OWN FILESYSTEM (round 16:
    * Hadoop FileSystem/FileContext, not java.nio — an HDFS/object-
    * store checkpoint works exactly like Spark's own offset log next
    * to it; the old local-path requirement was the streaming tier's
    * last filesystem assumption beyond the store root itself).
    * `startingVersion=latest` must resolve ONCE per checkpoint (first
    * start pins it; a restart re-resolving 'latest' would silently
    * skip the commits made while the stream was down).
    *
    * Exactly-once NEVER depends on this file: recovery replays from
    * the engine's offset log, and the file only advances in
    * `commit(end)` — a STALE file can at most make `getOffset`
    * re-offer already-committed ground, which the engine's own
    * committed-offset tracking ignores (StoreStreamSpec pins the
    * no-regress property). */
  private val hadoopConf =
    spark.sessionState.newHadoopConf()
  private val progressPath =
    new org.apache.hadoop.fs.Path(metadataPath, "graft_tail_progress")

  private def persist(v: Long): Unit = {
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      progressPath.toUri, hadoopConf)
    val tmp = new org.apache.hadoop.fs.Path(progressPath.getParent,
      s"${progressPath.getName}.tmp${System.nanoTime()}")
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      org.apache.hadoop.fs.Options.CreateOpts.createParent())
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fc.rename(tmp, progressPath,
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def readPersisted(): Option[Long] = {
    val fs = progressPath.getFileSystem(hadoopConf)
    if (!fs.exists(progressPath)) None
    else {
      val in = fs.open(progressPath)
      try {
        val len = fs.getFileStatus(progressPath).getLen.toInt
        val buf = new Array[Byte](len)
        in.readFully(0L, buf)
        Some(new String(buf, StandardCharsets.UTF_8).trim.toLong)
      } finally in.close()
    }
  }

  private val startingVersion: Long = {
    val persisted = readPersisted()
    persisted.getOrElse {
      val resolved = opt(parameters, "startingVersion") match {
        case None => 0L
        case Some("latest") => cat.version
        case Some(v) =>
          val n = try v.toLong catch {
            case _: NumberFormatException => -1L
          }
          if (n < 0) throw new IllegalArgumentException(
            "startingVersion must be a non-negative commit number or " +
              s"'latest'; got '$v'")
          n
      }
      persist(resolved)
      resolved
    }
  }

  private var lastEnd: Long = startingVersion
  // highest version durably recorded in the progress file (monotonic
  // guard: an out-of-order commit callback must never move it back)
  private var persistedV: Long = startingVersion

  /** The CONSUMER's schema — the one Spark resolved at `load()` time
    * and planned the query against (re-resolving here would desync from
    * the plan's attributes when the table evolves between load() and
    * start(): the engine asserts batch arity against the plan). */
  override val schema: StructType =
    providedSchema.getOrElse(schemaFor(spark, parameters))

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] = {
    val cur = cat.version
    val capped = maxVersions.fold(cur)(m => math.min(cur, lastEnd + m))
    val v = math.max(capped, lastEnd)
    if (v <= startingVersion) None else Some(LongOffset(v))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(versionOf).getOrElse(startingVersion)
    val toV = versionOf(end)
    // in-memory only — persisting here would corrupt the start=None
    // recovery fallback (see the class doc); durable progress moves
    // forward in commit(end), after the engine's commit-log write
    if (toV > lastEnd) lastEnd = toV
    val batch =
      if (cdf) cat.changesWithUpdates(table, fromV, toV)
      else cat.readAppends(table, fromV, toV)
    // align the range's rows (END-version schema) to the stream's FIXED
    // consumer schema: a nullable column added after the streamed range
    // NULL-backfills (the batch-read rule); a table that evolved BEYOND
    // the stream's schema fails loudly — restarting re-resolves the
    // schema and continues from the checkpoint (the Delta
    // restart-on-schema-change contract)
    val extra = batch.columns.filterNot(c =>
      schema.fieldNames.exists(_.equalsIgnoreCase(c)))
    if (extra.nonEmpty)
      throw new IllegalStateException(
        s"table '$table' evolved beyond this stream's schema (new " +
          s"column(s): ${extra.mkString(", ")}); restart the stream — " +
          "it resumes from its checkpoint through the evolved schema")
    val cols = schema.fields.map { f =>
      if (batch.columns.exists(_.equalsIgnoreCase(f.name)))
        org.apache.spark.sql.functions.col(f.name)
      else if (f.nullable)
        org.apache.spark.sql.functions.lit(null).cast(f.dataType)
          .as(f.name)
      else throw new IllegalStateException(
        s"stream schema column '${f.name}' is non-nullable but absent " +
          s"from the v$fromV..v$toV range of '$table'")
    }
    org.apache.spark.sql.GraftSqlShim.streamingFrame(spark,
      batch.select(cols.toIndexedSeq: _*))
  }

  /** Called by the engine once `end`'s batch is durably committed —
    * the ONLY point where advancing the persisted high-water mark is
    * safe for the `start=None` recovery fallback. */
  override def commit(end: Offset): Unit = {
    val v = versionOf(end)
    if (v > lastEnd) lastEnd = v
    if (v > persistedV) { persist(v); persistedV = v }
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftStoreSource[root=$root, table=$table, " +
      s"mode=${if (cdf) "changefeed" else "tail"}]"
}
