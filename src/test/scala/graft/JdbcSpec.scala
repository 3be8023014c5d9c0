package graft

import java.sql.DriverManager

import graft.sources.JdbcTables

/** JDBC source integration (SURVEY §2.1 S1 deployment mirror): an
  * embedded in-memory Derby database stands in for the reference's MySQL.
  * Verifies the config switch, the partitioned read path (bounds probe +
  * range partitioning), predicate pushdown reaching the source, and the
  * empty-table short-circuit.
  */
class JdbcSpec extends SparkSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  // one-time embedded-database setup (runs at construction, before tests)
  locally {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        """CREATE TABLE users (
          |  user_id BIGINT PRIMARY KEY,
          |  first_name VARCHAR(64),
          |  email VARCHAR(128))""".stripMargin)
      (1 to 100).foreach { i =>
        st.execute(s"INSERT INTO users VALUES ($i, 'fn$i', 'u$i@x.c')")
      }
      st.execute(
        """CREATE TABLE events (
          |  event_id BIGINT PRIMARY KEY,
          |  event_name VARCHAR(64))""".stripMargin)
      st.close()
    } finally conn.close()
    spark.conf.set(JdbcTables.UrlConf, url)
  }

  test("config switch gates the source") {
    assert(JdbcTables.enabled(spark))
  }

  test("partitioned read returns every row across range partitions") {
    val df = JdbcTables.read(spark, "users", "user_id", numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4,
      "the scan must range-partition on the surrogate key")
    val ids = df.select("user_id").as[Long].collect().sorted
    assert(ids.toSeq == (1L to 100L))
  }

  test("predicates push down to the database as WHERE clauses") {
    val df = JdbcTables.read(spark, "users", "user_id")
      .filter($"user_id" === 42L)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") ||
      physical.toLowerCase.contains("user_id"),
      s"filter must reach the JDBC scan, got:\n$physical")
    assert(df.select("email").as[String].collect().toSeq == Seq("u42@x.c"))
  }

  test("empty table short-circuits the degenerate partitioning") {
    val df = JdbcTables.read(spark, "events", "event_id")
    assert(df.count() == 0)
  }

  test("write passthrough round-trip: append then keyed update " +
    "(reference insert_*/update_* shape, db.py:202-468)") {
    import graft.sources.JdbcWrite
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        """CREATE TABLE cards (
          |  card_id BIGINT PRIMARY KEY,
          |  card_name VARCHAR(64),
          |  card_status VARCHAR(16))""".stripMargin)
    } finally conn.close()
    val rows = (1L to 50L)
      .map(i => (i, s"card$i", "active")).toDF(
        "card_id", "card_name", "card_status")
    JdbcWrite.append(spark, "cards", rows)
    val readBack = JdbcTables.read(spark, "cards", "card_id")
    assert(readBack.count() == 50L)
    // keyed update: soft-delete the even ids (reference status flip)
    val updates = (2L to 50L by 2)
      .map(i => (i, "deleted")).toDF("card_id", "card_status")
    val n = JdbcWrite.updateByKey(
      spark, "cards", "card_id", Seq("card_status"), updates)
    assert(n == 25L, s"expected 25 rows updated, got $n")
    val statuses = JdbcTables.read(spark, "cards", "card_id")
      .select("card_id", "card_status").as[(Long, String)]
      .collect().toMap
    assert(statuses(2L) == "deleted" && statuses(3L) == "active")
    assert(statuses.values.count(_ == "deleted") == 25)
    // appends after updates keep working (same table, fresh ids)
    JdbcWrite.append(spark, "cards",
      Seq((51L, "card51", "active")).toDF(
        "card_id", "card_name", "card_status"))
    assert(JdbcTables.read(spark, "cards", "card_id").count() == 51L)
  }
}
