package graft.ext

import org.apache.spark.sql.SparkSession

/** Shared prepare-once machinery for the layout-at-rest operators
  * ([[BucketedJoin]], [[PartitionedScan]], [[ZOrderLayout]]): each
  * rewrites fixture tables into a managed layout ONCE per (warehouse,
  * fixture dir, source mtime/size) and reuses the copies until either
  * changes — the ingest-time cost model the 100 TB versions of these
  * ops have. One implementation so a fix to the memo rule or the
  * orphan-directory cleanup cannot silently miss a sibling.
  *
  * '''Single-process assumption.''' The memo is in-JVM; every fresh
  * process re-stages on first use (drop + rewrite), which is idempotent
  * alone but NOT safe against a concurrent graft process sharing the
  * same warehouse dir (one deletes while the other reads/writes — e.g.
  * `sbt test` and `graft.Verify` racing in one checkout produces stale
  * reads). The driver, bench harness (sequential child JVMs), and
  * Verify all run staging single-process by construction; keep dev
  * runs that share a warehouse sequential too. A cross-process memo
  * would need an on-disk key + OS lock + catalog re-registration
  * (bucketing metadata included) — not worth the surface while every
  * production path stages at ingest, once.
  */
private[graft] final class PreparedTables(
    sourceFiles: Seq[String],
    managedTables: Seq[String],
    writer: (SparkSession, String) => Unit) {

  @volatile private var preparedKey: String = ""

  /** Memo key of the copies last written: warehouse dir + fixture dir +
    * each source file's (mtime, size) — rewritten fixture content at the
    * same path, or a different warehouse in the same JVM, triggers a
    * re-prepare instead of silently reusing stale tables. */
  private def memoKey(s: SparkSession, d: String): String = {
    val srcs = sourceFiles.map { f =>
      val p = java.nio.file.Paths.get(d, f)
      if (java.nio.file.Files.exists(p))
        s"$f:${java.nio.file.Files.getLastModifiedTime(p).toMillis}:${java.nio.file.Files.size(p)}"
      else s"$f:absent"
    }
    (s.conf.get("spark.sql.warehouse.dir") +: d +: srcs).mkString("|")
  }

  def ensurePrepared(s: SparkSession, d: String): Unit = synchronized {
    val key = memoKey(s, d)
    if (preparedKey != key) { prepare(s, d); preparedKey = key }
  }

  /** Drop stale catalog entries AND any orphan managed-table directory a
    * previous process left (a fresh session's catalog doesn't know about
    * them), then run the writer. Idempotent. */
  def prepare(s: SparkSession, d: String): Unit = {
    managedTables.foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val dir = java.nio.file.Paths.get(
        new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath, t)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    writer(s, d)
  }
}
