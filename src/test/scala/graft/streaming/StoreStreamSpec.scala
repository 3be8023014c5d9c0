package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkSuite
import graft.store.Catalog

/** The store as a streaming source ([[GraftStreamProvider]]): commit
  * versions are offsets, `getBatch` is [[Catalog.readAppends]] /
  * [[Catalog.changesWithUpdates]] over immutable snapshots — so the
  * spec pins real multi-batch pacing, exactly-once restart from the
  * checkpoint, the loud non-append contract, CDF mode, and
  * `startingVersion=latest`. */
class StoreStreamSpec extends SparkSuite {

  private def freshRoot(slices: Int): String = {
    val dir = Files.createTempDirectory("graft-storestream").toString
    val cat = new Catalog(spark, dir)
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    (1 to slices).foreach { i =>
      cat.append("events_ingest",
        ev.filter(col("event_id") > (i - 1) * 100 &&
          col("event_id") <= i * 100),
        orderBy = Seq("event_id"))
    }
    dir
  }

  private def reader(root: String, extra: (String, String)*) = {
    var r = spark.readStream
      .format(classOf[GraftStreamProvider].getName)
      .option("root", root).option("table", "events_ingest")
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  /** Run a stream to exhaustion via foreachBatch, collecting every
    * delivered row; returns (rows, number of non-empty batches). */
  private def drain(df: DataFrame, checkpoint: String)
      : (Seq[Row], Int) = {
    val buf = mutable.ArrayBuffer.empty[Row]
    var batches = 0
    // default trigger + processAllAvailable, NOT Trigger.AvailableNow:
    // the available-now wrapper snapshots getOffset once at start,
    // which with maxVersionsPerBatch pacing is only the FIRST paced
    // offset — processAllAvailable keeps triggering until caught up
    val q = df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.collect()
        buf.synchronized {
          if (rows.nonEmpty) batches += 1
          buf ++= rows
        }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    q.awaitTermination()
    (buf.toSeq, batches)
  }

  private def sortedStrings(rows: Seq[Row]): Seq[String] =
    rows.map(_.toString).sorted

  test("tail mode: the full snapshot backfills, maxVersionsPerBatch " +
    "paces one commit per micro-batch, and the drained stream equals " +
    "the batch read") {
    val root = freshRoot(3)
    val ckpt = Files.createTempDirectory("ckpt-tail").toString
    val (rows, batches) = drain(
      reader(root, "maxVersionsPerBatch" -> "1"), ckpt)
    assert(batches == 3, s"expected 3 paced data batches, got $batches")
    val batch = new Catalog(spark, root).read("events_ingest").collect()
    assert(sortedStrings(rows) == sortedStrings(batch.toSeq))
    // the pacing progress file must land under the REAL checkpoint dir
    // (metadataPath arrives as a file: URI string — a naive Paths.get
    // would write a literal "file:/" tree under the CWD)
    assert(Files.exists(java.nio.file.Paths.get(ckpt, "sources", "0",
      "graft_tail_progress")), "pacing progress file not in checkpoint")
    assert(!Files.exists(java.nio.file.Paths.get("file:")),
      "stray file:/ tree written under the working directory")
  }

  test("exactly-once across restart: a restarted stream on the same " +
    "checkpoint delivers ONLY the commits that landed while it was " +
    "down — no replays, no gaps") {
    val root = freshRoot(2)
    val ckpt = Files.createTempDirectory("ckpt-restart").toString
    val (first, _) = drain(reader(root, "maxVersionsPerBatch" -> "1"),
      ckpt)
    val cat = new Catalog(spark, root)
    assert(first.length == cat.read("events_ingest").count())
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    cat.append("events_ingest",
      ev.filter(col("event_id") > 200 && col("event_id") <= 300),
      orderBy = Seq("event_id"))
    val (second, _) = drain(reader(root, "maxVersionsPerBatch" -> "1"),
      ckpt)
    assert(sortedStrings(first ++ second) ==
      sortedStrings(cat.read("events_ingest").collect().toSeq),
      "restart replayed or dropped rows")
    assert(second.nonEmpty &&
      second.forall(_.getAs[Long]("event_id") > 200),
      "restart re-delivered pre-checkpoint rows")
  }

  test("a non-append commit fails the tail stream loudly (the Delta " +
    "streaming default), and CDF mode streams the same commit as " +
    "paired update images") {
    val root = freshRoot(2)
    new Catalog(spark, root).update("events_ingest",
      col("ingest_id") === 50L, Map("value" -> lit(9999.0)))
    // paced, so the stream must serve (2, 3] — the update commit —
    // explicitly (an UNPACED fresh stream collapses to the final
    // snapshot, where a pre-start update is legitimately invisible)
    val e = intercept[StreamingQueryException] {
      drain(reader(root, "maxVersionsPerBatch" -> "1"),
        Files.createTempDirectory("ckpt-nonappend").toString)
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => String.valueOf(c.getMessage)
        .contains("appends-only")), s"wrong failure: ${e.getMessage}")

    val (rows, batches) = drain(
      reader(root, "readChangeFeed" -> "true",
        "maxVersionsPerBatch" -> "1"),
      Files.createTempDirectory("ckpt-cdf").toString)
    assert(batches == 3)
    val types = rows.groupBy(_.getAs[String]("_change_type"))
      .view.mapValues(_.size).toMap
    val nBase = new Catalog(spark, root).read("events_ingest").count()
    assert(types("update_preimage") == 1 &&
      types("update_postimage") == 1 &&
      types("insert") == nBase,
      s"unexpected change-type census: $types")
    val post = rows.find(
      _.getAs[String]("_change_type") == "update_postimage").get
    assert(post.getAs[Long]("ingest_id") == 50L &&
      post.getAs[Double]("value") == 9999.0)
  }

  test("startingVersion=latest skips the backfill and serves only " +
    "commits after stream registration") {
    val root = freshRoot(2)
    // 'latest' resolves at SOURCE CREATION (first start): commits made
    // after root staging but before the first drain are skipped too
    val ckpt = Files.createTempDirectory("ckpt-latest").toString
    val (none, _) = drain(
      reader(root, "startingVersion" -> "latest"), ckpt)
    assert(none.isEmpty, "latest-start stream backfilled")
    val cat = new Catalog(spark, root)
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    cat.append("events_ingest",
      ev.filter(col("event_id") > 200 && col("event_id") <= 250),
      orderBy = Seq("event_id"))
    val (tail, _) = drain(
      reader(root, "startingVersion" -> "latest"), ckpt)
    assert(tail.nonEmpty && tail.forall(_.getAs[Long]("event_id") > 200))
    assert(tail.length ==
      cat.read("events_ingest")
        .filter(col("event_id") > 200).count())
  }

  test("schema evolution: a stream started on the evolved schema " +
    "serves pre-evolution ranges NULL-backfilled; a stream whose " +
    "schema predates the evolution fails loudly and restarting " +
    "continues from the checkpoint (the Delta contract)") {
    val root = freshRoot(1)
    val cat = new Catalog(spark, root)

    // a LIVE stream (schema resolved at start, pre-evolution) consumes
    // v1, then the table evolves UNDER it — the next batch carries a
    // column its schema cannot represent: loud failure naming it
    val ckptStale = Files.createTempDirectory("ckpt-evo-stale").toString
    val buf = mutable.ArrayBuffer.empty[Row]
    val q = reader(root, "maxVersionsPerBatch" -> "1").writeStream
      .option("checkpointLocation", ckptStale)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.collect(); buf.synchronized { buf ++= rows }; ()
      }.start()
    q.processAllAvailable()
    assert(buf.length == 100, "live stream did not consume v1")
    cat.transaction { tx =>
      tx.addColumn("events_ingest", org.apache.spark.sql.types.StructField(
        "quality", org.apache.spark.sql.types.IntegerType, nullable = true))
    }
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    cat.append("events_ingest",
      ev.filter(col("event_id") > 100 && col("event_id") <= 150)
        .withColumn("quality", pmod(col("event_id"), lit(7)).cast("int")),
      orderBy = Seq("event_id"))
    val e = intercept[StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => String.valueOf(c.getMessage)
        .contains("evolved beyond this stream's schema")),
      s"wrong failure: ${chain(e).map(_.getMessage).mkString(" | ")}")

    // a stream started AFTER the evolution paces straight across it:
    // (0,1] pre-evolution rows NULL-backfill quality, (1,2] is the
    // metadata-only commit (empty), (2,3] carries values
    val (rows, _) = drain(reader(root, "maxVersionsPerBatch" -> "1"),
      Files.createTempDirectory("ckpt-evo").toString)
    assert(rows.length == cat.read("events_ingest").count())
    assert(rows.filter(_.getAs[Long]("event_id") <= 100)
      .forall(_.isNullAt(rows.head.fieldIndex("quality"))))
    assert(rows.exists(r => r.getAs[Long]("event_id") > 100 &&
      !r.isNullAt(r.fieldIndex("quality"))))

    // readAppends itself serves ranges through the END schema
    assert(cat.readAppends("events_ingest", 1L, 3L).columns
      .contains("quality"))
    // 'restart' = a fresh handle (re-resolved schema) on the SAME
    // checkpoint: the stale run already committed the (0,1] backfill
    // before failing, so the restart delivers exactly the remainder
    val (rows2, _) = drain(reader(root, "maxVersionsPerBatch" -> "1"),
      ckptStale)
    assert(rows2.nonEmpty &&
      rows2.forall(_.getAs[Long]("event_id") > 100) &&
      rows2.length == cat.read("events_ingest")
        .filter(col("event_id") > 100).count(),
      "restarted stream lost or replayed rows")
  }

  test("a file added AND DV-masked inside the same tail range fails " +
    "loudly (per-version audit): endpoint diffing alone would serve it " +
    "pre-masked, silently folding the delete — and whether the stream " +
    "failed would then depend on batch pacing") {
    val root = freshRoot(1) // v1
    val cat = new Catalog(spark, root)
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    cat.append("events_ingest",
      ev.filter(col("event_id") > 100 && col("event_id") <= 200),
      orderBy = Seq("event_id")) // v2 adds a file...
    val victim = cat.read("events_ingest")
      .filter(col("event_id") === 150L)
      .select("ingest_id").collect()(0).getLong(0)
    cat.delete("events_ingest", col("ingest_id") === victim) // ...v3 DVs it
    // the tail range (1, 3] contains both the add and the mask: the
    // v2-added entry exists at NEITHER endpoint in its unmasked form,
    // so only the per-version delta audit can see the mutation
    val e = intercept[IllegalStateException] {
      cat.readAppends("events_ingest", 1L, 3L).collect()
    }
    assert(e.getMessage.contains("appends-only") &&
      e.getMessage.contains("v3"), e.getMessage)
    // same through the paced stream, regardless of where batch
    // boundaries fall (here: one batch per commit)
    val se = intercept[StreamingQueryException] {
      drain(reader(root, "maxVersionsPerBatch" -> "1",
        "startingVersion" -> "1"),
        Files.createTempDirectory("ckpt-inrange-dv").toString)
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(se).exists(c => String.valueOf(c.getMessage)
      .contains("appends-only")), s"wrong failure: ${se.getMessage}")
    // the INITIAL BACKFILL (fromVersion 0) is a snapshot read by
    // contract (the Delta initial-snapshot shape): it serves the
    // reconciled end state — masked — without auditing history
    val backfill = cat.readAppends("events_ingest", 0L, 3L)
    assert(backfill.count() == cat.read("events_ingest").count())
    assert(backfill.filter(col("ingest_id") === victim).isEmpty)
  }

  test("the durable tail progress advances at COMMIT time, never at " +
    "getBatch: a crash between the engine's offset write and the batch " +
    "commit must not make recovery's getBatch(None, toV) resolve to " +
    "the empty range") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val root = freshRoot(2)
    val meta = Files.createTempDirectory("graft-progress-meta").toString
    val params = Map("root" -> root, "table" -> "events_ingest")
    val progress = java.nio.file.Paths.get(meta, "graft_tail_progress")
    def persisted: Long =
      new String(Files.readAllBytes(progress)).trim.toLong
    val src = new GraftStoreSource(spark, meta, None, params)
    assert(persisted == 0L,
      "construction must persist the RESOLVED startingVersion")
    val end = src.getOffset.get
    src.getBatch(None, end) // backfill served, batch NOT yet committed
    assert(persisted == 0L,
      "getBatch advanced the durable progress — a crash before the " +
        "batch commit would make recovery resolve the empty range")
    // a source rebuilt BEFORE commit (the crash-recovery shape) still
    // sees the original start: its getOffset must re-offer the range
    val recovered = new GraftStoreSource(spark, meta, None, params)
    assert(recovered.getOffset.nonEmpty,
      "recovery lost the uncommitted backfill range")
    // after the engine's commit callback the progress is durable...
    src.commit(end)
    assert(persisted == end.asInstanceOf[LongOffset].offset)
    // ...and a post-commit rebuild has nothing new to offer
    assert(new GraftStoreSource(spark, meta, None, params)
      .getOffset.isEmpty)
  }

  test("a STALE progress file cannot regress offsets: exactly-once " +
    "recovery comes from the engine's offset log — a restart with " +
    "tampered-low progress re-delivers nothing and loses nothing") {
    val root = freshRoot(2)
    val ckpt = Files.createTempDirectory("ckpt-stale-progress").toString
    val (first, _) = drain(reader(root), ckpt)
    assert(first.nonEmpty)
    // tamper the durable progress back to 0 — the worst stale state a
    // lost write or restored checkpoint copy could produce
    val progress = java.nio.file.Paths.get(ckpt, "sources", "0",
      "graft_tail_progress")
    assert(Files.exists(progress), s"progress file not at $progress")
    Files.write(progress, "0".getBytes)
    // new data lands while the stream is down
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    new Catalog(spark, root).append("events_ingest",
      ev.filter(col("event_id") > 200 && col("event_id") <= 250),
      orderBy = Seq("event_id"))
    val (second, _) = drain(reader(root), ckpt)
    assert(second.nonEmpty &&
      second.forall(_.getAs[Long]("event_id") > 200) &&
      second.map(_.getAs[Long]("event_id")).toSet ==
        (201L to 250L).toSet,
      s"stale progress corrupted recovery: got ${second.size} rows")
  }
}
