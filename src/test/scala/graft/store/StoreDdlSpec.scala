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
    // RENAME COLUMN is a feature since round 16 (RenameColumnSpec);
    // what stays loud here is renaming the surrogate id
    assert(msg(s"ALTER TABLE $c.metrics RENAME COLUMN m_id TO rid")
      .contains("surrogate id"))
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

  private val statShape = StructType(Seq(
    StructField("m_id", LongType, nullable = false),
    StructField("k", LongType),
    StructField("tag", StringType),
    StructField("score", DoubleType)))

  private def kvRows(lo: Long, hi: Long) = {
    import org.apache.spark.sql.Row
    spark.createDataFrame(
      spark.sparkContext.parallelize((lo to hi).map(i =>
        Row(i, s"t${i % 7}", i * 1.5)), 2),
      StructType(statShape.fields.filterNot(_.name == "m_id")))
  }

  test("RENAME TABLE (round 16): one atomic zero-copy manifest-key " +
    "move — new name serves the same rows and dense ids, old name is " +
    "tombstoned with history readable below, both doors work, and " +
    "registry/collision shapes stay loud") {
    val (cat, c) = fresh()
    cat.createTable("metrics", shape, "m_id")
    import spark.implicits._
    cat.append("metrics", Seq(("a", 1.0), ("b", 2.0)).toDF("name", "score"))
    val vData = cat.version
    val parquetBefore = cat.liveFiles("metrics").map(_._1).toSet
    cat.renameTable("metrics", "kpis")
    // zero-copy: same file entries under the new key
    assert(cat.liveFiles("kpis").map(_._1).toSet == parquetBefore)
    assert(cat.read("kpis").count() == 2)
    assert(!cat.sqlTableNames().contains("metrics"))
    // dense ids continue from the carried high-water mark
    val id = cat.append("kpis", Seq(("c", 3.0)).toDF("name", "score"))
    assert(id == 3L, s"rename rewound dense ids: $id")
    // history below the rename reads the OLD name
    assert(cat.readAt("metrics", vData).count() == 2)
    intercept[Exception] { cat.read("metrics").collect() }
    // cold reopen agrees
    val cold = new Catalog(spark, cat.root)
    assert(cold.read("kpis").count() == 3 &&
      !cold.sqlTableNames().contains("metrics"))
    // SQL door: ALTER TABLE ... RENAME TO, then read under the new name
    spark.sql(s"ALTER TABLE $c.kpis RENAME TO scorecard")
    assert(spark.sql(s"SELECT * FROM $c.scorecard").count() == 3)
    // loud shapes
    def msg(body: => Unit): String = intercept[Exception](body).getMessage
    assert(msg(cat.renameTable("users", "users2")).contains("registry"))
    assert(msg(cat.renameTable("scorecard", "users"))
      .contains("registry"))
    cat.createTable("other", shape, "m_id")
    assert(msg(cat.renameTable("other", "scorecard"))
      .contains("already exists"))
    assert(msg(cat.renameTable("ghost", "g2")).contains("no such table"))
    // the old name is reusable with a fresh identity
    cat.createTable("metrics", shape, "m_id")
    assert(cat.append("metrics", Seq(("x", 9.0)).toDF("name", "score"))
      == 1L)
  }

  test("manifest-carried stats columns (round 16): createTable " +
    "designates them — even within the SAME transaction as the first " +
    "append — files collect value stats, readRange prunes, and " +
    "OPTIMIZE ZORDER accepts the dynamic table") {
    val (cat, _) = fresh()
    // createTable + first append in ONE tx: the staged designation must
    // be visible to the tx's own write (stats resolution through the
    // in-tx state, not the committed manifest)
    cat.transaction { tx =>
      tx.createTable("facts", statShape, "m_id",
        statsColumns = Seq("k", "tag"))
      tx.append("facts", kvRows(1, 100))
    }
    cat.append("facts", kvRows(101, 200))
    cat.append("facts", kvRows(201, 300))
    val (hit, total) = cat.rangeFiles("facts", "k", 1L, 50L)
    assert(total >= 3 && hit.size < total,
      s"designated Long column did not prune: ${hit.size} of $total")
    val (shit, stotal) = cat.rangeFilesStr("facts", "tag", "t0", "t6")
    assert(shit.size == stotal, "string stats bounds broke a full cover")
    // pruning is sound: the range read equals the exact filter
    assert(cat.readRange("facts", "k", 1L, 50L).count() == 50L)
    // ZORDER on the designated column works on the dynamic table
    cat.optimize("facts", Seq("k"), numFiles = 4)
    val (hit2, total2) = cat.rangeFiles("facts", "k", 1L, 50L)
    assert(total2 == 4 && hit2.size < total2,
      s"post-ZORDER prune failed: ${hit2.size} of $total2")
    assert(cat.readRange("facts", "k", 1L, 50L).count() == 50L)
    // fsck verifies the stats claims on the dynamic table
    assert(cat.fsck("facts").collect().forall(_.getBoolean(2)))
  }

  test("stats-column designation validates loudly: unknown column, " +
    "surrogate id, non-normalizable type, duplicates — and " +
    "setStatsColumns re-designates an existing table (future files " +
    "collect; old files conservatively stay un-pruned)") {
    val (cat, _) = fresh()
    def msg(body: => Unit): String = intercept[Exception](body).getMessage
    assert(msg(cat.createTable("t", statShape, "m_id",
      statsColumns = Seq("nope"))).contains("not in"))
    assert(msg(cat.createTable("t", statShape, "m_id",
      statsColumns = Seq("m_id"))).contains("surrogate id"))
    assert(msg(cat.createTable("t", statShape, "m_id",
      statsColumns = Seq("score"))).contains("stats-normalizable"))
    assert(msg(cat.createTable("t", statShape, "m_id",
      statsColumns = Seq("k", "k"))).contains("duplicate"))

    cat.createTable("t", statShape, "m_id") // no designation
    cat.append("t", kvRows(1, 100))
    assert(msg(cat.optimize("t", Seq("k")))
      .contains("no file stats"))
    val (hit0, total0) = cat.rangeFiles("t", "k", 1L, 10L)
    assert(hit0.size == total0, "stat-less files must all be kept")
    cat.setStatsColumns("t", Seq("k"))
    cat.append("t", kvRows(101, 200))
    // the pre-designation file has no k stats (kept); the new one does
    val (hit1, total1) = cat.rangeFiles("t", "k", 1L, 10L)
    assert(total1 == 2 && hit1.size == 1,
      s"expected only the pre-designation file kept, got ${hit1.size} " +
        s"of $total1")
    // ...and OPTIMIZE is now accepted (rewrites WITH stats)
    cat.optimize("t", Seq("k"), numFiles = 2)
    assert(cat.readRange("t", "k", 1L, 10L).count() == 10L)
    assert(cat.fsck("t").collect().forall(_.getBoolean(2)))
  }

  test("the manifest designation overrides the registry for fixture " +
    "tables, survives the parquet checkpoint across a cold reopen, " +
    "and versions with time travel") {
    val (cat, _) = fresh()
    cat.createTable("facts", statShape, "m_id",
      statsColumns = Seq("k"))
    cat.append("facts", kvRows(1, 100))        // v2
    // push the log past a checkpoint (interval 10) WITHOUT touching
    // 'facts' again: its stats designation must then be served from the
    // parquet checkpoint's meta row, not a tail delta
    import spark.implicits._
    (1 to 9).foreach(i => cat.append("users",
      Seq((s"u$i", "L", "0123456789", s"u$i@x.c", "h", "user",
        new java.sql.Timestamp(i * 1000L)))
        .toDF("first_name", "last_name", "phone", "email",
          "password_hash", "user_role", "created_at")))
    assert(cat.version >= Catalog.CheckpointInterval,
      s"fixture did not cross a checkpoint (v${cat.version})")
    val cold = new Catalog(spark, cat.root)
    // cold write collects stats for the checkpoint-carried designation
    cold.append("facts", kvRows(101, 200))
    val (hit, total) = cold.rangeFiles("facts", "k", 150L, 160L)
    assert(total == 2 && hit.size == 1,
      s"checkpoint-carried designation lost: ${hit.size} of $total")
    cold.optimize("facts", Seq("k"), numFiles = 2)

    // registry override: users carries 'created_at' from the registry;
    // re-designating through the manifest wins from that commit on
    val vBefore = cold.version
    cold.setStatsColumns("users", Seq("email"))
    intercept[Exception] { cold.optimize("users", Seq("created_at")) }
    // time travel reads the OLD designation epoch: the pre-override
    // snapshot still validates stats claims through the registry list
    assert(cold.readAt("users", vBefore).count() ==
      cold.read("users").count())
  }

  test("vacuum on a RENAMED table sweeps the old-name directory " +
    "(round 17): dead pre-rename rewrites are reclaimed by vacuuming " +
    "the NEW name, live old-dir files survive") {
    import scala.jdk.CollectionConverters._
    val (cat, _) = fresh()
    cat.createTable("metrics", shape, "m_id")
    import spark.implicits._
    cat.append("metrics",
      (1 to 50).map(i => (s"n$i", i.toDouble)).toDF("name", "score"))
    // a broad COW update leaves the original file dead under metrics/
    cat.update("metrics", lit(true), Map("score" -> (col("score") + 1)))
    cat.renameTable("metrics", "kpis")
    val oldDir = java.nio.file.Paths.get(cat.root, "metrics")
    def parquetUnder(d: java.nio.file.Path): Set[String] = {
      if (!Files.exists(d)) return Set.empty
      val w = Files.walk(d)
      try w.iterator().asScala
        .filter(p => Files.isRegularFile(p)
          && p.toString.endsWith(".parquet"))
        .map(_.toString).toSet
      finally w.close()
    }
    val before = parquetUnder(oldDir)
    val liveOld = cat.liveFiles("kpis").map(_._1)
      .filter(_.startsWith("metrics/")).toSet
    assert(liveOld.nonEmpty, "rename should keep files under the old dir")
    assert(before.size > liveOld.size,
      "setup must leave dead files under the old dir")
    val reclaimed = cat.vacuum("kpis", retainMillis = 0L)
    assert(reclaimed > 0, "vacuum(newName) reclaimed nothing")
    val after = parquetUnder(oldDir)
    assert(after.map(p => java.nio.file.Paths.get(cat.root)
        .relativize(java.nio.file.Paths.get(p)).toString) == liveOld,
      s"old dir should hold exactly the live files, got $after")
    assert(cat.read("kpis").count() == 50, "vacuum touched live data")
    // a chained rename keeps accumulating: kpis -> scorecard still
    // sweeps the original metrics/ directory
    cat.update("kpis", lit(true), Map("score" -> (col("score") + 1)))
    cat.renameTable("kpis", "scorecard")
    assert(cat.vacuum("scorecard", retainMillis = 0L) > 0)
    assert(cat.read("scorecard").count() == 50)
  }
}
