package graft.store

import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

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
  *  - [[LeaseCommitLock]] (`lease`): a conditional-put lease, built
  *    here on the one primitive object stores and lock services all
  *    offer — atomic create-if-absent (`CREATE_NEW` locally; S3
  *    `If-None-Match`, GCS `ifGenerationMatch=0`, DynamoDB conditional
  *    put, etcd lease in production ports). The holder owns
  *    `_commit.lease` (body = its random token); a contender that
  *    finds the lease older than the TTL presumes a crashed holder and
  *    STEALS it via atomic rename (at most one contender's rename
  *    succeeds), then retries the conditional create. Release deletes
  *    only a lease still carrying the holder's own token.
  *
  * Both serialize same-JVM threads through the per-root monitor first
  * (for `file` this is load-bearing — POSIX locks are process-scoped
  * and re-locking throws; for `lease` it just avoids useless local
  * spin).
  *
  * Holders HEARTBEAT: while the lock is held, a daemon task refreshes
  * the lease's mtime every ttl/3 (token-checked — a stolen lease is
  * never resurrected), so a slow validate-and-swap (OCC reconcile
  * re-validates rows) cannot be stolen from a LIVE holder no matter
  * how long it runs; the TTL only bounds how long a CRASHED holder
  * stalls contenders (`spark.graft.store.commitLease.ttlMs`,
  * default 60 s).
  *
  * Caveat the production port must close (documented, not hidden):
  * the local release's and heartbeat's read-then-write are not atomic
  * (a real object store uses a conditional delete/update on the
  * token/generation). */
private[store] trait CommitLock {
  /** Run `f` holding the exclusive commit lock for this store root. */
  def withLock[A](f: => A): A
}

private[store] object CommitLock {
  /** Per-root in-JVM monitors (see scaladoc above). */
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def monitorFor(rootKey: String): Object =
    monitors.computeIfAbsent(rootKey, _ => new Object)

  /** Resolve the configured implementation for one store root. */
  def forRoot(spark: org.apache.spark.sql.SparkSession,
      rootPath: Path): CommitLock = {
    val mode = spark.conf.getOption("spark.graft.store.commitLock")
      .map(_.trim.toLowerCase).getOrElse("file")
    val key = rootPath.toAbsolutePath.normalize.toString
    mode match {
      case "file" => new FileChannelCommitLock(rootPath, monitorFor(key))
      case "lease" =>
        val ttl = spark.conf
          .getOption("spark.graft.store.commitLease.ttlMs")
          .map(_.toLong).getOrElse(60000L)
        require(ttl > 0, "spark.graft.store.commitLease.ttlMs must be > 0")
        new LeaseCommitLock(rootPath, monitorFor(key), ttl)
      case v => throw new IllegalArgumentException(
        s"spark.graft.store.commitLock must be 'file' or 'lease'; got '$v'")
    }
  }
}

/** POSIX advisory-lock implementation — the original single-host
  * primitive, verbatim. */
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

/** Conditional-put lease implementation (see [[CommitLock]] scaladoc).
  * `sleepMillis` is the contender poll interval; `acquireTimeoutMillis`
  * bounds how long one commit waits before failing loudly (a commit
  * that cannot get the lease for minutes signals an operational
  * problem, not a retryable race). */
private[store] object LeaseCommitLock {
  /** Shared daemon scheduler for lease heartbeats (one thread serves
    * every held lease in the process; tasks are sub-millisecond file
    * touches). */
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
    acquireTimeoutMillis: Long = 120000L) extends CommitLock {

  private val leasePath = rootPath.resolve("_commit.lease")

  override def withLock[A](f: => A): A = monitor.synchronized {
    val token = acquire()
    // heartbeat: keep a LIVE holder's lease fresh so contenders never
    // steal mid-swap; token-checked so a somehow-stolen lease is not
    // resurrected. Cancelled before release.
    val beat = LeaseCommitLock.heartbeats.scheduleAtFixedRate(
      new Runnable {
        override def run(): Unit =
          try {
            val cur = new String(Files.readAllBytes(leasePath),
              java.nio.charset.StandardCharsets.UTF_8)
            if (cur == token)
              Files.setLastModifiedTime(leasePath,
                java.nio.file.attribute.FileTime.fromMillis(
                  System.currentTimeMillis()))
          } catch { case _: java.io.IOException => () }
      },
      math.max(ttlMillis / 3, 20L), math.max(ttlMillis / 3, 20L),
      java.util.concurrent.TimeUnit.MILLISECONDS)
    try f finally {
      beat.cancel(false)
      release(token)
    }
  }

  private def acquire(): String = {
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + acquireTimeoutMillis
    while (true) {
      try {
        // the conditional put: atomic create-if-absent
        Files.write(leasePath,
          token.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        return token
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val heldSince =
            try Some(Files.getLastModifiedTime(leasePath).toMillis)
            catch { case _: java.io.IOException => None } // released mid-probe
          heldSince match {
            case Some(t)
                if System.currentTimeMillis() - t > ttlMillis =>
              // presumed-crashed holder: steal via atomic rename — at
              // most ONE contender's move succeeds; losers loop back to
              // the conditional create
              val tomb = rootPath.resolve(s"_commit.lease.stale.$token")
              try {
                Files.move(leasePath, tomb, StandardCopyOption.ATOMIC_MOVE)
                Files.deleteIfExists(tomb)
              } catch { case _: java.io.IOException => () }
            case _ => Thread.sleep(sleepMillis)
          }
          if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(
              s"commit lease on $leasePath not acquired within " +
                s"${acquireTimeoutMillis} ms — holder alive past the " +
                s"$ttlMillis ms TTL? (operational stall, not an OCC race)")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def release(token: String): Unit =
    try {
      // delete only OUR lease: after a TTL steal, the path may carry a
      // different holder's token (a real object store makes this one
      // conditional delete on the generation/token)
      val cur = new String(Files.readAllBytes(leasePath),
        java.nio.charset.StandardCharsets.UTF_8)
      if (cur == token) Files.delete(leasePath)
    } catch { case _: java.io.IOException => () }
}
