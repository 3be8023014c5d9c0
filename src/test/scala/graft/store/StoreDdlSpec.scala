package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** CREATE/DROP TABLE (round 15): dynamic tables whose identity lives in
  * the manifest — creatable and droppable through BOTH doors (Scala API
  * and SQL), fully writable (dense ids, CHECKs, DML routing), history
  * readable below a drop, and DDL conflicting loudly under OCC. */
class StoreDdlSpec extends SparkSuite {

  private var n = 0

  private def fresh(): (Catalog, String) = {
    n += 1
    val dir = Files.createTempDirectory(s"graft-ddl$n").toString
    val catName = s"gddl$n"
    spark.conf.set(s"spark.sql.catalog.$catName",
      classOf[graft.store.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.root", dir)
    (new Catalog(spark, dir), catName)
  }

  private val shape = StructType(Seq(
    StructField("m_id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("a created table is a first-class table: dense engine ids, " +
    "CHECKs, update/delete, clone, time travel") {
    val (cat, _) = fresh()
    cat.createTable("metrics", shape, "m_id")
    assert(cat.read("metrics").count() == 0)
    import spark.implicits._
    val id1 = cat.append("metrics",
      Seq(("a", 1.0), ("b", 2.0)).toDF("name", "score"))
    assert(id1 == 2L)
    cat.addCheck("metrics", "score_pos", "score >= 0")
    intercept[Exception] {
      cat.append("metrics", Seq(("bad", -1.0)).toDF("name", "score"))
    }
    cat.update("metrics", col("name") === "a",
      Map("score" -> lit(7.0)))
    cat.delete("metrics", col("name") === "b")
    val got = cat.read("metrics").select("m_id", "name", "score")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a", 7.0)))
    cat.cloneTable("metrics", "metrics_snap")
    assert(cat.read("metrics_snap").count() == 1)
    // time travel below the writes still sees the empty created table
    assert(cat.readAt("metrics", 1L).count() == 0)
  }

  test("DROP removes the table from current state (cold reopen " +
    "included) but history below the drop stays readable; the name is " +
    "reusable with a fresh identity") {
    val (cat, _) = fresh()
    cat.createTable("metrics", shape, "m_id")
    import spark.implicits._
    cat.append("metrics", Seq(("a", 1.0)).toDF("name", "score"))
    val vData = cat.version
    cat.dropTable("metrics")
    assert(!cat.sqlTableNames().contains("metrics"))
    intercept[Exception] { cat.read("metrics").collect() }
    // cold instance: tombstone replays through the log (targeted AND
    // full paths)
    val cold = new Catalog(spark, cat.root)
    assert(!cold.sqlTableNames().contains("metrics"))
    // history below the drop: time travel still serves the data
    assert(cold.readAt("metrics", vData).count() == 1)
    // recreate under the same name: fresh identity, fresh dense ids
    val shape2 = StructType(Seq(
      StructField("m_id", LongType, nullable = false),
      StructField("label", StringType)))
    cold.createTable("metrics", shape2, "m_id")
    val id = cold.append("metrics", Seq("x").toDF("label"))
    assert(id == 1L, s"recreated table did not restart dense ids: $id")
    assert(cold.read("metrics").columns.toSeq ==
      Seq("m_id", "label"))
  }

  test("pure SQL DDL + DML lifecycle: CREATE TABLE (explicit id " +
    "property and auto row_id), INSERT/UPDATE/SELECT, SHOW TABLES, " +
    "DROP TABLE") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.metrics (m_id BIGINT NOT NULL, " +
      "name STRING, score DOUBLE) TBLPROPERTIES('id_column'='m_id')")
    spark.sql(s"INSERT INTO $c.metrics VALUES (NULL, 'a', 1.0), " +
      "(NULL, 'b', 2.0)")
    spark.sql(s"UPDATE $c.metrics SET score = 9.0 WHERE name = 'b'")
    val rows = spark.sql(s"SELECT m_id, name, score FROM $c.metrics " +
      "ORDER BY m_id").collect().map(_.toString).toSeq
    assert(rows == Seq("[1,a,1.0]", "[2,b,9.0]"))
    assert(spark.sql(s"SHOW TABLES IN $c").collect()
      .map(_.getString(1)).contains("metrics"))
    // auto id: no property -> leading engine-managed row_id
    spark.sql(s"CREATE TABLE $c.notes (txt STRING)")
    spark.sql(s"INSERT INTO $c.notes VALUES (NULL, 'hello')")
    assert(spark.sql(s"SELECT row_id, txt FROM $c.notes").collect()
      .map(_.toString).toSeq == Seq("[1,hello]"))
    spark.sql(s"DROP TABLE $c.notes")
    assert(!cat.sqlTableNames().contains("notes"))
    assert(cat.sqlTableNames().contains("metrics"))
  }

  test("SQL ALTER TABLE: ADD COLUMNS NULL-backfills, DROP COLUMN " +
    "projection-drops, both as one-statement transactions; unsupported " +
    "shapes fail loudly") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.metrics (m_id BIGINT NOT NULL, " +
      "name STRING) TBLPROPERTIES('id_column'='m_id')")
    spark.sql(s"INSERT INTO $c.metrics VALUES (NULL, 'a')")
    spark.sql(s"ALTER TABLE $c.metrics ADD COLUMNS (score DOUBLE)")
    // pre-evolution row NULL-backfills; new writes carry the column
    spark.sql(s"INSERT INTO $c.metrics VALUES (NULL, 'b', 2.5)")
    val rows = spark.sql(s"SELECT m_id, name, score FROM $c.metrics " +
      "ORDER BY m_id").collect().map(_.toString).toSeq
    assert(rows == Seq("[1,a,null]", "[2,b,2.5]"))
    spark.sql(s"ALTER TABLE $c.metrics DROP COLUMN score")
    assert(spark.sql(s"SELECT * FROM $c.metrics").columns.toSeq ==
      Seq("m_id", "name"))
    // time travel below the evolution reads each snapshot's own shape
    assert(cat.readAt("metrics", 2L).columns.toSeq ==
      Seq("m_id", "name"))
    def msg(sql: String): String =
      intercept[Exception](spark.sql(sql)).getMessage
    assert(msg(s"ALTER TABLE $c.metrics ADD COLUMNS " +
      "(x DOUBLE NOT NULL)").contains("nullable"))
    assert(msg(s"ALTER TABLE $c.metrics RENAME COLUMN name TO nm")
      .contains("not"))
    assert(msg(s"ALTER TABLE $c.metrics DROP COLUMN m_id")
      .contains("surrogate id"))
  }

  test("DDL preconditions and OCC: loud duplicate/registry/bad-id/" +
    "partitioned failures; a concurrent write under a DROP cannot " +
    "resurrect the table") {
    val (cat, c) = fresh()
    cat.createTable("metrics", shape, "m_id")
    def msg(body: => Unit): String =
      intercept[Exception](body).getMessage
    assert(msg(cat.createTable("metrics", shape, "m_id"))
      .contains("already exists"))
    assert(msg(cat.createTable("users", shape, "m_id"))
      .contains("registry"))
    assert(msg(cat.createTable("t2", shape, "name"))
      .contains("non-nullable BIGINT"))
    assert(msg(cat.createTable("t2", shape, "nope"))
      .contains("not in the schema"))
    assert(msg(cat.dropTable("users")).contains("registry"))
    assert(msg(cat.dropTable("ghost")).contains("no such table"))
    assert(msg(spark.sql(
      s"CREATE TABLE $c.p (a BIGINT) PARTITIONED BY (a)"))
      .contains("PARTITIONED BY"))

    // OCC: a transaction that appended to the table must fail when a
    // concurrent DROP removed it — not silently resurrect it
    import spark.implicits._
    cat.append("metrics", Seq(("a", 1.0)).toDF("name", "score"))
    val other = new Catalog(spark, cat.root)
    intercept[Catalog.ConcurrentWriteException] {
      cat.transaction { tx =>
        tx.append("metrics", Seq(("b", 2.0)).toDF("name", "score"))
        other.dropTable("metrics")
      }
    }
    assert(!cat.sqlTableNames().contains("metrics"),
      "conflicted append resurrected a dropped table")
  }
}
