package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Determinism, Q, Tables}
import Determinism.dsum

/** [EXT] co-located (bucketed) join: both fact tables are written
  * bucket-by-key with the same bucket count, so the join needs NO shuffle
  * exchange — each task reads matching buckets from both sides. This is
  * the 100 TB pattern for repeated joins on a stable key: pay the
  * partitioning once at write time, never at query time.
  *
  * The oracle is the plain (shuffled) join — bucketing must not change
  * results, only the plan (the spec asserts the plan has no exchange).
  */
object BucketedJoin {

  private val Buckets = 8

  /** Memo key of the bucketed copies last written: warehouse dir +
    * fixture dir + source-file (mtime, size) — so rewritten fixture
    * content at the same path, or a different warehouse in the same JVM,
    * triggers a re-prepare instead of silently reusing stale tables.
    * `prepare` remains ingest-time work (the whole point of bucketing is
    * paying the partitioning once at write time); the key only decides
    * when "once" must happen again. */
  @volatile private var preparedKey: String = ""

  private def memoKey(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    val srcs = Seq("orders.parquet", "lineitem.parquet").map { f =>
      val p = java.nio.file.Paths.get(d, f)
      if (java.nio.file.Files.exists(p))
        s"$f:${java.nio.file.Files.getLastModifiedTime(p).toMillis}:${java.nio.file.Files.size(p)}"
      else s"$f:absent"
    }
    (s.conf.get("spark.sql.warehouse.dir") +: d +: srcs).mkString("|")
  }

  /** Write the bucketed copies for `d` unless they are already current. */
  def ensurePrepared(s: org.apache.spark.sql.SparkSession,
      d: String): Unit = synchronized {
    val key = memoKey(s, d)
    if (preparedKey != key) { prepare(s, d); preparedKey = key }
  }

  /** (Re)write the bucketed copies for the given fixture dir. Idempotent;
    * one managed table per (table, bucket key). */
  def prepare(s: org.apache.spark.sql.SparkSession,
      d: String): Unit = {
    // a fresh session's catalog doesn't know about a previous process's
    // managed-table directory — drop both the entry and any orphan dir
    Seq("graft_bkt_orders", "graft_bkt_lineitem").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val dir = java.nio.file.Paths.get(
        new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath, t)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Tables.orders(s, d).write.mode("overwrite")
      .format("parquet").bucketBy(Buckets, "o_orderkey")
      .sortBy("o_orderkey")
      .saveAsTable("graft_bkt_orders")
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_extendedprice")
      .write.mode("overwrite")
      .format("parquet").bucketBy(Buckets, "l_orderkey")
      .sortBy("l_orderkey")
      .saveAsTable("graft_bkt_lineitem")
  }

  /** The joined aggregate over the bucketed copies. */
  def joined(s: org.apache.spark.sql.SparkSession) =
    s.table("graft_bkt_orders")
      .select("o_orderkey", "o_orderstatus")
      .join(s.table("graft_bkt_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderkey")

  val bucketedJoin: Q = Q(
    "ext_bucketed_join",
    """SELECT o_orderkey, o_orderstatus, COUNT(*) AS n_items,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE)
      |  AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderkey, o_orderstatus ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    ensurePrepared(s, d)
    joined(s)
  }.copy(setup = Some(ensurePrepared _))

  val all: Seq[Q] = Seq(bucketedJoin)
}
