package graft.ext

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Shared prepare-once machinery for the layout-at-rest operators
  * ([[BucketedJoin]], [[PartitionedScan]], [[ZOrderLayout]]) and the
  * store-root fixtures: each rewrites fixture tables into a managed
  * layout ONCE per (warehouse, fixture dir, source mtime/size) and
  * reuses the copies until either changes — the ingest-time cost model
  * the 100 TB versions of these ops have. One implementation so a fix
  * to the memo rule or the orphan-directory cleanup cannot silently
  * miss a sibling.
  *
  * '''Cross-process memo (round 17).''' The in-JVM `@volatile` key is
  * only the fast path; staging itself runs under a per-warehouse OS
  * file lock (`_graft_stage.lock`, `FileChannel.lock`, plus a JVM
  * monitor — POSIX locks are process-scoped) and records an on-disk
  * DONE MARKER per fixture (`_graft_staged_<table0>.marker`: the memo
  * key + which managed tables were session-catalog-registered). A
  * later instance — same or different process — ADOPTS the staged
  * copies without the destructive drop+rewrite when the marker's key
  * matches, every managed directory exists, and every
  * catalog-registered table resolves in ITS session. Store-root
  * fixtures (no session-catalog entries — graft Catalog state lives
  * wholly on disk) therefore adopt across processes, which is exactly
  * the `sbt test` + `graft.Verify` shared-checkout race the old
  * single-process assumption documented: one process no longer deletes
  * a root the other is mid-read. saveAsTable fixtures still restage
  * per process (a fresh in-memory session catalog cannot adopt a
  * registration it never made) — but serialized under the stage lock,
  * so concurrent stagings cannot interleave destructively. The marker
  * is deleted before a restage and written only after the writer
  * succeeds, so a crash mid-stage can never leave an adoptable lie. */
private[graft] final class PreparedTables(
    sourceFiles: Seq[String],
    managedTables: Seq[String],
    writer: (SparkSession, String) => Unit,
    /** Writer-logic version, part of the memo key: bump when the STAGED
      * CONTENT for the same sources changes (e.g. a trainer starts
      * snapping its means), so an already-staged warehouse restages
      * instead of silently serving the old layout — source mtime/size
      * alone cannot see a code change. */
    version: String = "") {

  @volatile private var preparedKey: String = ""

  /** Memo key of the copies last written: warehouse dir + fixture dir +
    * writer version + each source file's (mtime, size) — rewritten
    * fixture content at the same path, a different warehouse in the
    * same JVM, or a bumped writer version triggers a re-prepare instead
    * of silently reusing stale tables. */
  private def memoKey(s: SparkSession, d: String): String = {
    val srcs = sourceFiles.map { f =>
      val p = java.nio.file.Paths.get(d, f)
      if (java.nio.file.Files.exists(p))
        s"$f:${java.nio.file.Files.getLastModifiedTime(p).toMillis}:${java.nio.file.Files.size(p)}"
      else s"$f:absent"
    }
    (s.conf.get("spark.sql.warehouse.dir") +: d +: version +: srcs)
      .mkString("|")
  }

  /** Local path of `spark.sql.warehouse.dir`. Parsed via Hadoop `Path`,
    * not `new java.net.URI(raw)`: Spark populates this conf from
    * `Path.toString`, which does NOT percent-encode, so a warehouse dir
    * containing a space (or any RFC-3986-reserved char) would throw
    * URISyntaxException at staging time; and a scheme-less value must
    * resolve against the process CWD the same way Spark itself resolves
    * it, not surprise the caller with a URI-relative path. */
  private def warehousePath(s: SparkSession): Path = {
    val raw = s.conf.get("spark.sql.warehouse.dir")
    val u = new org.apache.hadoop.fs.Path(raw).toUri
    require(u.getScheme == null || u.getScheme == "file",
      s"fixture staging needs a local warehouse dir; got '$raw'")
    Paths.get(u.getPath).toAbsolutePath
  }

  private def markerPath(wh: Path): Path =
    wh.resolve(s"_graft_staged_${managedTables.head}.marker")

  def ensurePrepared(s: SparkSession, d: String): Unit = {
    val key = memoKey(s, d)
    if (preparedKey == key) return // in-JVM fast path, no IO
    val wh = warehousePath(s)
    Files.createDirectories(wh)
    PreparedTables.withStageLock(wh) {
      if (preparedKey != key) { // may have raced another thread here
        val marker = markerPath(wh)
        val adopted = readMarker(marker) match {
          case Some((mk, catTables)) if mk == key =>
            managedTables.forall(t => Files.exists(wh.resolve(t))) &&
              catTables.forall(t =>
                s.catalog.tableExists(t) || adoptCatalogTable(s, wh, t))
          case _ => false
        }
        if (!adopted) {
          Files.deleteIfExists(marker) // a crash below must not leave a lie
          prepare(s, d)
          // record which managed tables this WRITER registered in the
          // session catalog: adoption by a fresh process is legal only
          // for fixtures whose state lives wholly on disk (none listed)
          val catTables =
            managedTables.filter(t => s.catalog.tableExists(t))
          Files.write(marker,
            s"$key\n${catTables.mkString(",")}".getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
        }
        preparedKey = key
      }
    }
  }

  /** Cross-process saveAsTable adoption (round 18, closing SURVEY
    * §7.7.4): a fresh process's in-memory session catalog has no entry
    * for a table another process staged with `saveAsTable`, so until
    * now such fixtures restaged per process (slow-but-safe). The staged
    * DATA is just a parquet directory under the warehouse, though — so
    * when the marker's memo key matches, this registers that directory
    * as an external parquet table in THIS session instead of
    * rewriting. Reads are identical (same files, schema from the
    * parquet footers); [[prepare]]'s drop+delete path still fully
    * clears an external registration plus its directory on restage.
    * Returns false (→ restage) if registration fails for any reason —
    * adoption is an optimization, never a correctness gamble. */
  private def adoptCatalogTable(s: SparkSession, wh: Path,
      t: String): Boolean =
    try {
      val dir = wh.resolve(t)
      Files.exists(dir) && {
        s.sql(s"CREATE TABLE $t USING parquet LOCATION '$dir'")
        s.catalog.tableExists(t)
      }
    } catch { case _: Exception => false }

  private def readMarker(p: Path): Option[(String, Seq[String])] =
    if (!Files.exists(p)) None
    else {
      val lines = new String(Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8).split("\n", -1)
      if (lines.isEmpty) None
      else Some((lines(0),
        lines.lift(1).map(_.split(",").filter(_.nonEmpty).toSeq)
          .getOrElse(Nil)))
    }

  /** Unconditional restage for callers that need a fresh layout (the
    * z-order spec): same lock + marker discipline as [[ensurePrepared]],
    * never a silent reuse. */
  def forcePrepare(s: SparkSession, d: String): Unit = {
    val wh = warehousePath(s)
    Files.createDirectories(wh)
    PreparedTables.withStageLock(wh) {
      Files.deleteIfExists(markerPath(wh))
      prepare(s, d)
      preparedKey = memoKey(s, d)
      val catTables =
        managedTables.filter(t => s.catalog.tableExists(t))
      Files.write(markerPath(wh),
        (preparedKey + "\n" + catTables.mkString(",")).getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** Drop stale catalog entries AND any orphan managed-table directory a
    * previous process left (a fresh session's catalog doesn't know about
    * them), then run the writer. Idempotent; callers hold the stage
    * lock. */
  private def prepare(s: SparkSession, d: String): Unit = {
    managedTables.foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val dir = warehousePath(s).resolve(t)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    writer(s, d)
  }
}

private[graft] object PreparedTables {
  /** Per-warehouse JVM monitors (POSIX locks are process-scoped: a
    * second lock attempt from the same JVM throws instead of
    * blocking, so same-JVM stagers serialize here first). */
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Warehouses whose stage lock THIS thread already holds: fixture
    * writers legitimately stage sub-fixtures (a streaming feed's
    * writer prepares its replay source), so the lock must be
    * REENTRANT per thread — `synchronized` already is, but a second
    * `FileChannel.lock` from the same JVM throws
    * OverlappingFileLockException instead of granting. */
  private val holding = new ThreadLocal[java.util.HashSet[String]] {
    override def initialValue() = new java.util.HashSet[String]()
  }

  /** Run `f` holding the per-warehouse stage lock: JVM monitor + OS
    * file lock, so stagings are serialized across threads AND
    * processes sharing one warehouse; reentrant within a thread. */
  private def withStageLock[A](wh: Path)(f: => A): A = {
    val key = wh.toAbsolutePath.normalize.toString
    if (holding.get().contains(key)) f
    else monitors.computeIfAbsent(key, _ => new Object).synchronized {
      val lockFile = wh.resolve("_graft_stage.lock")
      val ch = java.nio.channels.FileChannel.open(lockFile,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        holding.get().add(key)
        try f finally {
          holding.get().remove(key)
          lock.release()
        }
      } finally ch.close()
    }
  }
}
