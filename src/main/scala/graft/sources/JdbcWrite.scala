package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** JDBC write passthrough — the INSERT/UPDATE half of the reference's
  * deployment shape (db.py:202-266 insert_*, db.py:268-468 update_* /
  * soft-delete flips), behind the same `graft.jdbc.url` config switch as
  * [[JdbcTables]]. The engine's native write path is the parquet
  * [[graft.store.Catalog]]; this exists so the same service code can keep
  * writing to a JDBC database during a migration.
  *
  * Scale design:
  *  - Appends go through Spark's JDBC writer (`df.write.jdbc` append):
  *    one connection per partition, `batchsize`-batched INSERTs — but the
  *    frame is first coalesced to [[JdbcTables.MaxConnectionsPerScan]]
  *    partitions so a wide cluster cannot open a connection storm against
  *    one primary (same bound as the read path).
  *  - Keyed UPDATEs have no Spark writer; [[updateByKey]] emulates them
  *    with batched `UPDATE ... SET c=? WHERE id=?` statements per
  *    partition. That is ONE round trip per `executeBatch`, not per row,
  *    and the update frame is coalesced under the same connection bound.
  *    This is the standard bulk shape for "flip status on these N keys";
  *    a migration moving 100 TB of facts belongs in the parquet store,
  *    not behind row-at-a-time JDBC — mirrored from the reference, which
  *    updates single rows from a UI (db.py:268-321).
  */
object JdbcWrite {

  /** Rows per JDBC batch round-trip (both insert and update paths). */
  val BatchSize = 1000

  /** Append `df` to JDBC `table` (reference insert_*, db.py:202-266). */
  def append(spark: SparkSession, table: String, df: DataFrame): Unit = {
    val url = spark.conf.get(JdbcTables.UrlConf)
    val p = new java.util.Properties()
    spark.conf.getOption(JdbcTables.UserConf).foreach(p.setProperty("user", _))
    spark.conf.getOption(JdbcTables.PasswordConf)
      .foreach(p.setProperty("password", _))
    p.setProperty("batchsize", BatchSize.toString)
    val bounded =
      if (df.rdd.getNumPartitions > JdbcTables.MaxConnectionsPerScan)
        df.coalesce(JdbcTables.MaxConnectionsPerScan)
      else df
    bounded.write.mode("append").jdbc(url, table, p)
  }

  /** Batched keyed UPDATE (reference update_* / soft-delete flips,
    * db.py:268-468): for each row of `updates`, executes
    * `UPDATE table SET <setCols> = ? WHERE <idCol> = ?`. `updates` must
    * carry `idCol` and every column in `setCols`. Returns the number of
    * rows the database reports as updated. */
  def updateByKey(spark: SparkSession, table: String, idCol: String,
      setCols: Seq[String], updates: DataFrame): Long = {
    require(setCols.nonEmpty, "updateByKey needs at least one SET column")
    val url = spark.conf.get(JdbcTables.UrlConf)
    val user = spark.conf.getOption(JdbcTables.UserConf)
    val password = spark.conf.getOption(JdbcTables.PasswordConf)
    val sql = s"UPDATE $table SET " +
      setCols.map(c => s"$c = ?").mkString(", ") + s" WHERE $idCol = ?"
    val batch = BatchSize
    val counter = spark.sparkContext.longAccumulator("jdbc_rows_updated")
    val projected = updates.select((setCols :+ idCol).map(col): _*)
    val bounded =
      if (projected.rdd.getNumPartitions > JdbcTables.MaxConnectionsPerScan)
        projected.coalesce(JdbcTables.MaxConnectionsPerScan)
      else projected
    bounded.foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val props = new java.util.Properties()
        user.foreach(props.setProperty("user", _))
        password.foreach(props.setProperty("password", _))
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var inBatch = 0
          rows.foreach { r =>
            var i = 0
            while (i < r.length) { ps.setObject(i + 1, r.get(i)); i += 1 }
            ps.addBatch()
            inBatch += 1
            if (inBatch >= batch) {
              counter.add(ps.executeBatch().map(_.toLong.max(0L)).sum)
              inBatch = 0
            }
          }
          if (inBatch > 0)
            counter.add(ps.executeBatch().map(_.toLong.max(0L)).sum)
          conn.commit()
        } finally conn.close()
      }
    }
    counter.value
  }
}
