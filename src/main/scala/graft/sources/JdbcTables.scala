package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source mirroring the reference's deployment shape (SURVEY §2.1 S1:
  * an env-configured MySQL connection, db.py:28-59/42-48). The engine's
  * native format is parquet; this reader exists so a user whose data still
  * lives behind a JDBC database can point the same service/table API at it
  * with one config switch:
  *
  *   spark.conf.set("graft.jdbc.url", "jdbc:...")       // enables
  *   spark.conf.set("graft.jdbc.user" / "graft.jdbc.password", ...)
  *
  * Scale design — JDBC reads are the classic single-task trap: with no
  * partitioning options `spark.read.jdbc` funnels the whole table through
  * one connection. [[read]] therefore always partitions on the table's
  * numeric surrogate key: one cheap MIN/MAX bounds probe, then
  * `numPartitions` range-partitioned parallel readers
  * (`partitionColumn`/`lowerBound`/`upperBound`), which is the shape that
  * survives a large table. Predicates pushed by Catalyst reach the remote
  * database as WHERE clauses (JDBCRelation pushdown), so `filter` on the
  * returned frame does not mean "transfer everything".
  *
  * The reference opens a fresh connection per call with 3 retries
  * (db.py:28-41); a Spark cluster instead holds `numPartitions` concurrent
  * connections per scan — bounded explicitly here to stay polite to the
  * source database.
  */
object JdbcTables {

  val UrlConf = "graft.jdbc.url"
  val UserConf = "graft.jdbc.user"
  val PasswordConf = "graft.jdbc.password"

  /** Max concurrent connections one table scan opens against the source
    * database (MySQL-class defaults cap total connections low; a 1000-
    * executor cluster must not open 1000 sockets to one primary). */
  val MaxConnectionsPerScan = 8

  def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption(UrlConf).isDefined

  private def props(spark: SparkSession): Properties = {
    val p = new Properties()
    spark.conf.getOption(UserConf).foreach(p.setProperty("user", _))
    spark.conf.getOption(PasswordConf).foreach(p.setProperty("password", _))
    p
  }

  /** Read `table` partitioned on numeric `idCol`. Bounds come from one
    * MIN/MAX probe (pushed down as an aggregate, a single-row transfer).
    * Empty tables short-circuit to an unpartitioned read of the empty
    * result rather than a degenerate 0-range partitioning. */
  def read(spark: SparkSession, table: String, idCol: String,
      numPartitions: Int = MaxConnectionsPerScan): DataFrame = {
    val url = spark.conf.get(UrlConf)
    val bounds = spark.read
      .jdbc(url, s"(SELECT MIN($idCol) AS lo, MAX($idCol) AS hi " +
        s"FROM $table) b", props(spark))
      .collect()(0)
    if (bounds.isNullAt(0))
      spark.read.jdbc(url, table, props(spark))
    else {
      val (lo, hi) = (toLong(bounds.get(0)), toLong(bounds.get(1)))
      spark.read.jdbc(url, table, idCol, lo, hi,
        math.min(numPartitions, MaxConnectionsPerScan), props(spark))
    }
  }

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case n: java.lang.Number => n.longValue()
  }

  /** The five reference tables (SURVEY §1.2) keyed by their surrogate id —
    * the drop-in JDBC counterpart of `store.Catalog.read`. */
  def referenceTable(spark: SparkSession, name: String): DataFrame = {
    val idCol = graft.store.Schemas.registry(name)._2
    read(spark, name, idCol)
  }
}
