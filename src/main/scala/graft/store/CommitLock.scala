package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}

/** Mutual-exclusion SPI for the store's commit validate-and-swap
  * (round 17, closing the "commit coordination is single-host"
  * residual): the OCC design above this primitive is already correct —
  * a transaction body runs lock-free against a snapshot; only the
  * commit's validate-and-swap needs mutual exclusion — so porting the
  * store to an object store or multi-driver cluster means swapping
  * THIS primitive, nothing else.
  *
  * Two implementations ship:
  *
  *  - [[FileChannelCommitLock]] (default, `spark.graft.store.commitLock`
  *    absent or `file`): the original per-root JVM monitor +
  *    `FileChannel.lock` on `_manifest.lock`. Correct on a local or
  *    cluster POSIX filesystem; POSIX advisory locks do NOT work on
  *    object stores and are unreliable on NFS.
  *  - [[LeaseCommitLock]] (`lease`): a TTL lease over a [[LeaseStore]] —
  *    a five-operation conditional-KV contract (round 18) whose every
  *    compound read-then-write is ATOMIC inside the store: conditional
  *    create, conditional touch (heartbeat), conditional delete
  *    (release), and an atomic expiry-check-and-delete (steal). The
  *    local [[FileLeaseStore]] enforces that atomicity with a
  *    short-lived OS file lock around each operation; object-store
  *    ports implement each operation as ONE conditional request (S3
  *    `If-None-Match`/`If-Match` on the ETag, GCS `ifGenerationMatch`,
  *    DynamoDB conditional expressions, etcd lease revisions) — no
  *    side lock needed there.
  *
  * Both serialize same-JVM threads through the per-root monitor first
  * (for `file` this is load-bearing — POSIX locks are process-scoped
  * and re-locking throws; for `lease` it just avoids useless local
  * spin).
  *
  * Holders HEARTBEAT: while the lock is held, a daemon task refreshes
  * the lease every ttl/3 (token-checked and atomic in the store — a
  * stolen lease is never resurrected), so a slow validate-and-swap
  * (OCC reconcile re-validates rows) cannot be stolen from a LIVE
  * holder no matter how long it runs; the TTL only bounds how long a
  * CRASHED holder stalls contenders
  * (`spark.graft.store.commitLease.ttlMs`, default 60 s).
  *
  * '''The paused-holder steal window, stated precisely.''' The
  * heartbeat runs in the holder's process; a stop-the-world pause
  * longer than the heartbeat slack (TTL − ttl/3 ≈ 2/3·TTL — GC pause,
  * VM suspend, cgroup freeze) stops the heartbeat with the lease still
  * on disk, a contender's atomic expiry-check then legitimately steals
  * it, and when the paused holder RESUMES it is no longer the holder
  * while believing it is. A TTL lease cannot eliminate this — only a
  * fencing check at the protected resource can (Chubby/ZooKeeper
  * sequencers). That check exists: the commit path calls
  * [[CommitLock.verifyStillHeld]] immediately before the final
  * manifest swap and fails the commit with
  * [[Catalog.ConcurrentWriteException]] if the lease no longer carries
  * its token — locally this narrows the unfenced window to the
  * nanoseconds between the verify read and the rename, and the OCC
  * validate above it bounds the blast radius of even that residue to
  * commits whose staged tables ALSO collided. A production port must
  * carry the fence into the store itself: the manifest swap must be
  * conditional on a fencing token/generation checked BY the store
  * (e.g. the delta object's create-if-absent carrying the lease
  * generation), not merely re-read by the client. */
private[store] trait CommitLock {
  /** Run `f` holding the exclusive commit lock for this store root. */
  def withLock[A](f: => A): A

  /** Fencing check, called by the commit path IMMEDIATELY before the
    * irreversible swap (the delta-file rename): verify this holder
    * still owns the lock, throwing [[Catalog.ConcurrentWriteException]]
    * if it was stolen (lease TTL expiry during a >2/3·TTL pause — see
    * the class scaladoc). For [[FileChannelCommitLock]] this is a
    * no-op: the OS revokes a POSIX lock only when the holder dies,
    * taking the commit with it. Must be called on the thread inside
    * [[withLock]]. */
  def verifyStillHeld(): Unit = ()
}

private[store] object CommitLock {
  /** Per-root in-JVM monitors (see scaladoc above). */
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def monitorFor(rootKey: String): Object =
    monitors.computeIfAbsent(rootKey, _ => new Object)

  /** Name of the per-root lock-mode marker (see [[forRoot]]). */
  private[store] val ModeMarker = "_commit.lockmode"

  /** Resolve the configured implementation for one store root.
    *
    * The chosen mode is PERSISTED in `_commit.lockmode` at first
    * resolution (atomic create-if-absent via the store's [[StoreIO]];
    * the loser of a first-open race re-reads the winner's choice): the
    * two implementations take DISJOINT primitives (`_manifest.lock` vs
    * `_commit.lease`), so two processes sharing a root but configured
    * differently would get no mutual exclusion at all — exactly the
    * lost-commit race the SPI exists to prevent. A mismatch therefore
    * fails loudly here instead of silently racing.
    *
    * Both SHIPPED implementations bind their primitive to a LOCAL
    * path (POSIX locks / mtime leases); a root on HDFS or an object
    * store must pair `lease` mode with a [[LeaseStore]] port (one
    * conditional request per operation — see that trait's scaladoc),
    * so a remote root without one fails loudly here rather than
    * pretending to lock. */
  def forRoot(spark: org.apache.spark.sql.SparkSession,
      root: String, io: StoreIO): CommitLock = {
    val mode = spark.conf.getOption("spark.graft.store.commitLock")
      .map(_.trim.toLowerCase).getOrElse("file")
    if (mode != "file" && mode != "lease")
      throw new IllegalArgumentException(
        s"spark.graft.store.commitLock must be 'file' or 'lease'; got '$mode'")
    val marker = io.resolve(root, ModeMarker)
    // Atomic first-write (round 19, ADVICE r18): HadoopStoreIO's
    // createIfAbsent is exists-then-create on RawLocalFileSystem, so two
    // processes first-opening one root with DIFFERENT lock modes could
    // both believe they created the marker and proceed with disjoint
    // primitives — the exact race the marker fails loudly on. Every
    // reachable commit-lock root is local (enforced below), so the
    // marker goes through java.nio CREATE_NEW (O_CREAT|O_EXCL, atomic
    // on every local FS) whenever the path is locally addressable; a
    // future conditional-create port keeps the io path.
    StoreIO.localPathOf(root) match {
      case Some(rp) =>
        try {
          // the root may not exist yet for a caller that skips
          // Catalog's mkdirs (FileSystem.create auto-created parents on
          // the old io path; CREATE_NEW does not)
          java.nio.file.Files.createDirectories(rp)
          java.nio.file.Files.write(rp.resolve(ModeMarker),
            mode.getBytes(StandardCharsets.UTF_8),
            StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
          ()
        } catch { case _: java.nio.file.FileAlreadyExistsException => () }
      case None =>
        io.createIfAbsent(marker, mode.getBytes(StandardCharsets.UTF_8))
    }
    val recorded =
      new String(io.readAllBytes(marker), StandardCharsets.UTF_8).trim
    if (recorded != mode)
      throw new IllegalStateException(
        s"store root '$root' was opened with " +
          s"spark.graft.store.commitLock='$recorded' and is now being " +
          s"opened with '$mode': the two lock modes use disjoint " +
          "primitives and give NO mutual exclusion against each other. " +
          s"Set spark.graft.store.commitLock=$recorded, or delete " +
          s"$ModeMarker under the root if every process is being " +
          "migrated together")
    val rootPath = StoreIO.localPathOf(root).getOrElse(
      throw new IllegalStateException(
        s"store root '$root' is not on a local filesystem: the shipped " +
          "commit-lock primitives (POSIX file lock / mtime lease) " +
          "cannot serialize commits there. Deploy with " +
          "spark.graft.store.commitLock=lease and a LeaseStore port " +
          "for the object store (one conditional request per " +
          "operation — see LeaseStore's scaladoc)"))
    val key = rootPath.toAbsolutePath.normalize.toString
    mode match {
      case "file" => new FileChannelCommitLock(rootPath, monitorFor(key))
      case "lease" =>
        val ttl = spark.conf
          .getOption("spark.graft.store.commitLease.ttlMs")
          .map(_.toLong).getOrElse(60000L)
        require(ttl > 0, "spark.graft.store.commitLease.ttlMs must be > 0")
        new LeaseCommitLock(rootPath, monitorFor(key), ttl)
      case _ => throw new IllegalStateException("unreachable")
    }
  }
}

/** POSIX advisory-lock implementation — the original single-host
  * primitive, verbatim. [[verifyStillHeld]] stays the no-op default:
  * the OS releases the lock only when the holding process exits, so a
  * paused-then-resumed holder still owns it. */
private[store] final class FileChannelCommitLock(rootPath: Path,
    monitor: Object) extends CommitLock {
  private val lockPath = rootPath.resolve("_manifest.lock")
  override def withLock[A](f: => A): A = monitor.synchronized {
    val ch = java.nio.channels.FileChannel.open(lockPath,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try f finally lock.release()
    } finally ch.close()
  }
}

/** The conditional-KV contract a TTL lease needs from its store — five
  * operations, EACH atomic (its read-then-write cannot interleave with
  * another client's operation on the same slot). This is the whole
  * surface an object-store port implements:
  *
  *  - S3: `If-None-Match: *` put for create; `If-Match: <etag>` put /
  *    delete for touch / release / steal.
  *  - GCS: `ifGenerationMatch=0` / `ifGenerationMatch=<gen>`.
  *  - DynamoDB: `attribute_not_exists` / `ConditionExpression` on the
  *    token and heartbeat stamp.
  *  - etcd/ZooKeeper: native leases/ephemerals replace the whole file.
  *
  * The local [[FileLeaseStore]] gets the same atomicity from a
  * short-lived OS file lock around each operation — microseconds held,
  * never across a poll sleep. */
private[store] trait LeaseStore {
  /** Atomically create the lease carrying `token` iff no lease exists.
    * True = this caller now holds it. */
  def createIfAbsent(token: String): Boolean
  /** The token the lease currently carries, if any. Read-only. */
  def readToken(): Option[String]
  /** Atomically refresh the lease's expiry clock iff it still carries
    * `token`. False = the lease is gone or stolen (caller must NOT
    * treat itself as holder). */
  def touchIfToken(token: String): Boolean
  /** Atomically delete the lease iff it still carries `token`.
    * False = it was not ours to delete (already stolen/released). */
  def deleteIfToken(token: String): Boolean
  /** Atomically delete the lease iff its last refresh is older than
    * `ttlMillis` — the steal. Atomicity makes the expiry check and the
    * delete ONE step: a heartbeat landing first refreshes the clock
    * and the steal correctly no-ops; at most one of N contenders'
    * steals succeeds. True = caller may retry [[createIfAbsent]]
    * immediately. */
  def stealIfExpired(ttlMillis: Long): Boolean
}

/** Local-filesystem [[LeaseStore]]: the lease is `_commit.lease`
  * (body = holder token, mtime = last refresh); every operation runs
  * under a `FileChannel.lock` on `_commit.lease.kv` so its
  * read-then-write is atomic across processes — the property a real
  * object store provides natively per request. The side lock is held
  * for microseconds per call (one stat + one small read/write), never
  * across waiting. */
private[store] final class FileLeaseStore(leasePath: Path)
    extends LeaseStore {

  private val kvLockPath =
    leasePath.resolveSibling(leasePath.getFileName.toString + ".kv")

  /** One atomic KV operation: OS-file-lock, run, unlock. Same-JVM
    * callers serialize on a monitor first (POSIX locks are
    * process-scoped; a second same-process lock attempt throws). */
  private def atomically[A](f: => A): A =
    FileLeaseStore.monitorFor(kvLockPath).synchronized {
      val ch = java.nio.channels.FileChannel.open(kvLockPath,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val l = ch.lock()
        try f finally l.release()
      } finally ch.close()
    }

  override def createIfAbsent(token: String): Boolean = atomically {
    try {
      Files.write(leasePath, token.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }
  }

  override def readToken(): Option[String] =
    try Some(new String(Files.readAllBytes(leasePath),
      StandardCharsets.UTF_8))
    catch { case _: java.io.IOException => None }

  override def touchIfToken(token: String): Boolean = atomically {
    readToken().contains(token) && {
      Files.setLastModifiedTime(leasePath,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis()))
      true
    }
  }

  override def deleteIfToken(token: String): Boolean = atomically {
    readToken().contains(token) && { Files.delete(leasePath); true }
  }

  override def stealIfExpired(ttlMillis: Long): Boolean = atomically {
    val expired =
      try System.currentTimeMillis() -
        Files.getLastModifiedTime(leasePath).toMillis > ttlMillis
      catch { case _: java.io.IOException => false } // gone = released
    expired && { Files.delete(leasePath); true }
  }
}

private[store] object FileLeaseStore {
  /** Per-kv-lock-file JVM monitors (POSIX locks are process-scoped). */
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def monitorFor(p: Path): Object =
    monitors.computeIfAbsent(p.toAbsolutePath.normalize.toString,
      _ => new Object)
}

/** TTL-lease implementation over [[LeaseStore]] (see [[CommitLock]]
  * scaladoc for the protocol and the paused-holder analysis).
  * `sleepMillis` is the contender poll interval; `acquireTimeoutMillis`
  * bounds how long one commit waits before failing loudly (a commit
  * that cannot get the lease for minutes signals an operational
  * problem, not a retryable race). */
private[store] object LeaseCommitLock {
  /** Shared daemon scheduler for lease heartbeats (one thread serves
    * every held lease in the process; tasks are sub-millisecond
    * conditional touches). */
  private[store] val heartbeats =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-lease-heartbeat")
        t.setDaemon(true)
        t
      })
}

private[store] final class LeaseCommitLock(rootPath: Path,
    monitor: Object, ttlMillis: Long,
    sleepMillis: Long = 25L,
    acquireTimeoutMillis: Long = 120000L,
    store: LeaseStore = null) extends CommitLock {

  private val leaseStore: LeaseStore =
    if (store != null) store
    else new FileLeaseStore(rootPath.resolve("_commit.lease"))

  /** Token of the CURRENT hold. Only one thread per root per JVM is
    * ever inside [[withLock]] (the monitor), so a plain volatile
    * field is race-free. */
  @volatile private var heldToken: String = null

  override def withLock[A](f: => A): A = monitor.synchronized {
    val token = acquire()
    heldToken = token
    // heartbeat: keep a LIVE holder's lease fresh so contenders never
    // steal mid-swap; the touch is token-conditional AND atomic in the
    // store, so a stolen lease is never resurrected. Cancelled before
    // release.
    val beat = LeaseCommitLock.heartbeats.scheduleAtFixedRate(
      new Runnable {
        override def run(): Unit =
          try leaseStore.touchIfToken(token)
          catch { case _: java.io.IOException => () }
      },
      math.max(ttlMillis / 3, 20L), math.max(ttlMillis / 3, 20L),
      java.util.concurrent.TimeUnit.MILLISECONDS)
    try f finally {
      beat.cancel(false)
      heldToken = null
      leaseStore.deleteIfToken(token)
    }
  }

  /** The fencing check (see [[CommitLock.verifyStillHeld]]): re-read
    * the lease and fail the commit if it no longer carries our token —
    * a contender stole it while this process was paused past the TTL.
    * The commit aborts BEFORE the manifest swap, so the stealer's
    * commits are never clobbered; the caller surfaces
    * [[Catalog.ConcurrentWriteException]] and the transaction retry
    * machinery re-runs against the winner's state. */
  override def verifyStillHeld(): Unit = {
    val token = heldToken
    if (token == null)
      throw new IllegalStateException(
        "verifyStillHeld() called outside withLock")
    if (!leaseStore.readToken().contains(token))
      throw new Catalog.ConcurrentWriteException(
        s"commit lease on '$rootPath' was stolen mid-hold (holder " +
          s"paused past the $ttlMillis ms TTL — GC pause, VM suspend?); " +
          "aborting before the manifest swap so the new holder's " +
          "commits are preserved")
  }

  private def acquire(): String = {
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + acquireTimeoutMillis
    while (true) {
      if (leaseStore.createIfAbsent(token)) return token
      // held by someone: steal only via the store's ATOMIC
      // expiry-check-and-delete (a heartbeat landing first wins and
      // the steal no-ops), then loop back to the conditional create —
      // at most one contender's create lands after a steal.
      if (!leaseStore.stealIfExpired(ttlMillis))
        Thread.sleep(sleepMillis)
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"commit lease on $rootPath not acquired within " +
            s"${acquireTimeoutMillis} ms — holder alive past the " +
            s"$ttlMillis ms TTL? (operational stall, not an OCC race)")
    }
    throw new IllegalStateException("unreachable")
  }
}
