package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** RENAME COLUMN (round 16, SURVEY §7.7.2): metadata-only rename via a
  * manifest prior-name map — no file rewrites. Pins the coalesce read
  * across epochs, stats pruning under historical names, time travel,
  * clone inheritance, the changefeed across the rename, write paths on
  * the renamed table, the loud guards, and the SQL door's
  * migrate-before-scan contract. */
class RenameColumnSpec extends SparkSuite {

  private var n = 0

  private def fresh(): (Catalog, String) = {
    n += 1
    val dir = Files.createTempDirectory(s"graft-ren$n").toString
    val catName = s"gren$n"
    spark.conf.set(s"spark.sql.catalog.$catName",
      classOf[graft.store.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.root", dir)
    (new Catalog(spark, dir), catName)
  }

  private val shape = StructType(Seq(
    StructField("m_id", LongType, nullable = false),
    StructField("k", LongType),
    StructField("tag", StringType)))

  /** Batch under the CURRENT (`keyName`) column name — writes speak
    * the table's current schema; a post-rename producer must ship the
    * new name (an old-name batch NULL-backfills like any other absent
    * nullable column, the append contract). */
  private def rowsAs(keyName: String, lo: Long, hi: Long) = {
    import org.apache.spark.sql.Row
    spark.createDataFrame(
      spark.sparkContext.parallelize((lo to hi).map(i =>
        Row(i, if (i % 10 == 0) null else s"t$i")), 2),
      StructType(Seq(
        StructField(keyName, LongType),
        StructField("tag", StringType))))
  }
  private def rows(lo: Long, hi: Long) = rowsAs("k", lo, hi)

  test("rename is metadata-only: files from both epochs read through " +
    "the new name (genuine NULLs preserved), no parquet is rewritten, " +
    "and writes after the rename land under the new name") {
    val (cat, _) = fresh()
    cat.createTable("t", shape, "m_id", statsColumns = Seq("k"))
    cat.append("t", rows(1, 100))         // epoch 1: files carry 'k'
    val filesBefore = cat.liveFiles("t").map(_._1).toSet
    cat.renameColumn("t", "k", "key")     // pure metadata commit
    assert(cat.liveFiles("t").map(_._1).toSet == filesBefore,
      "rename rewrote files")
    cat.append("t", rowsAs("key", 101, 200)) // epoch 2: carry 'key'
    val got = cat.read("t")
    assert(got.columns.toSeq == Seq("m_id", "key", "tag"))
    assert(got.count() == 200)
    assert(got.filter(col("key").isNull).count() == 0,
      "old-epoch values lost through the rename")
    assert(got.filter(col("tag").isNull).count() == 20,
      "genuine NULLs must survive the coalesce read")
    assert(got.filter(col("key") === 50L).count() == 1 &&
      got.filter(col("key") === 150L).count() == 1)
    // point lookups / updates / deletes on the renamed column work
    cat.update("t", col("key") === 50L, Map("tag" -> lit("updated")))
    assert(cat.read("t").filter(col("tag") === "updated").count() == 1)
    cat.delete("t", col("key") === 150L)
    assert(cat.read("t").count() == 199)
    assert(cat.fsck("t").collect().forall(_.getBoolean(2)),
      "fsck flagged a renamed table")
  }

  test("stats pruning consults historical names: old files prune by " +
    "their 'k'-keyed stats, new files by 'key' — readRange stays exact") {
    val (cat, _) = fresh()
    cat.createTable("t", shape, "m_id", statsColumns = Seq("k"))
    cat.append("t", rows(1, 100))
    cat.append("t", rows(101, 200))
    cat.renameColumn("t", "k", "key")
    cat.append("t", rowsAs("key", 201, 300))
    val (hit, total) = cat.rangeFiles("t", "key", 1L, 50L)
    assert(total == 3 && hit.size == 1,
      s"historical-name stats did not prune: ${hit.size} of $total")
    val (hit2, _) = cat.rangeFiles("t", "key", 201L, 250L)
    assert(hit2.size == 1, "new-epoch stats lost after rename")
    assert(cat.readRange("t", "key", 1L, 50L).count() == 50L)
    assert(cat.readRange("t", "key", 95L, 205L).count() == 111L)
  }

  test("time travel reads each snapshot through ITS OWN names; clones " +
    "inherit the rename; the changefeed crosses the rename epoch with " +
    "the end schema") {
    val (cat, _) = fresh()
    cat.createTable("t", shape, "m_id")
    cat.append("t", rows(1, 50))          // v2
    val vOld = cat.version
    cat.renameColumn("t", "k", "key")     // v3
    cat.append("t", rowsAs("key", 51, 80)) // v4
    // below the rename: the old name, old values
    val old = cat.readAt("t", vOld)
    assert(old.columns.contains("k") && !old.columns.contains("key"))
    assert(old.count() == 50)
    // at the rename commit: new name, same rows
    assert(cat.readAt("t", vOld + 1).columns.contains("key"))
    // clone AFTER the rename: inherits mapping, reads both epochs
    cat.cloneTable("t", "t_snap")
    assert(cat.read("t_snap").filter(col("key") <= 50).count() == 50)
    cat.append("t_snap", rowsAs("key", 81, 90))
    assert(cat.read("t_snap").count() == 90)
    // changefeed spanning the rename: appends from both epochs present
    // through the END version's (renamed) schema
    val feed = cat.readAppends("t", 1L, cat.version)
    assert(feed.columns.contains("key"))
    assert(feed.count() == 80)
    assert(feed.filter(col("key").isNull).count() == 0)
  }

  test("loud guards: surrogate id, existing/historical target names, " +
    "CHECK-referenced columns, absent columns; chained renames keep " +
    "resolving") {
    val (cat, _) = fresh()
    cat.createTable("t", shape, "m_id")
    cat.append("t", rows(1, 10))
    def msg(body: => Unit): String = intercept[Exception](body).getMessage
    assert(msg(cat.renameColumn("t", "m_id", "rid"))
      .contains("surrogate id"))
    assert(msg(cat.renameColumn("t", "k", "tag"))
      .contains("already exists"))
    assert(msg(cat.renameColumn("t", "nope", "x"))
      .contains("does not exist"))
    cat.addCheck("t", "k_pos", "k >= 0")
    assert(msg(cat.renameColumn("t", "k", "key")).contains("k_pos"))
    // chained rename: k -> key -> kk still reads epoch-1 files, and
    // reusing a historical name is rejected
    val (cat2, _) = fresh()
    cat2.createTable("u", shape, "m_id")
    cat2.append("u", rows(1, 20))
    cat2.renameColumn("u", "k", "key")
    cat2.append("u", rowsAs("key", 21, 40))
    cat2.renameColumn("u", "key", "kk")
    cat2.append("u", rowsAs("kk", 41, 60))
    assert(cat2.read("u").filter(col("kk").isNull).count() == 0)
    assert(cat2.read("u").count() == 60)
    assert(msg(cat2.renameColumn("u", "tag", "key"))
      .contains("historical"))
    // addColumn mirrors the historical-name guard (round 17): a NEW
    // column named like a renamed-away one would appear in the physical
    // read schema twice (itself + the prior-name twin) and brick every
    // read of the table until dropped
    assert(msg(cat2.addColumn("u",
      StructField("key", StringType, nullable = true)))
      .contains("historical"))
    assert(msg(cat2.addColumn("u",
      StructField("K", StringType, nullable = true)))
      .contains("historical"), "historical guard must be case-insensitive")
    // ...and the table is still fully readable afterwards
    assert(cat2.read("u").count() == 60)
    cat2.addColumn("u", StructField("fresh", StringType, nullable = true))
    assert(cat2.read("u").filter(col("fresh").isNull).count() == 60)
  }

  test("SQL door: ALTER TABLE RENAME COLUMN works as text; SELECT " +
    "serves IMMEDIATELY across rename epochs (round 17 — coalescing " +
    "scan, no forced compaction), filters on the renamed column are " +
    "correct against pre-rename files, and SQL time travel below the " +
    "rename still reads") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.t (m_id BIGINT NOT NULL, k BIGINT, " +
      "tag STRING) TBLPROPERTIES('id_column'='m_id')")
    cat.append("t", rows(1, 60))
    cat.append("t", rows(61, 100))
    val vOld = cat.version
    spark.sql(s"ALTER TABLE $c.t RENAME COLUMN k TO key")
    // pre-rename files live -> the scan coalesces epochs per row: all
    // 100 values serve under the new name, genuine NULLs preserved
    // (rowsAs NULLs tag at every id % 10 == 0 — they must stay NULL)
    val immediate = spark.sql(s"SELECT m_id, key, tag FROM $c.t")
    assert(immediate.count() == 100)
    assert(immediate.filter(col("key").isNull).count() == 0)
    assert(immediate.filter(col("tag").isNull).count() == 10)
    // a filter ON the renamed column evaluates against coalesced
    // values — NOT pushed into parquet, where the absent column in
    // old files would silently drop their rows
    assert(spark.sql(s"SELECT * FROM $c.t WHERE key = 42").count() == 1)
    assert(spark.sql(
      s"SELECT sum(key) AS s FROM $c.t WHERE key > 90")
      .collect()(0).getLong(0) == (91L to 100L).sum)
    // mixed epochs: a post-rename append under the NEW name reads
    // alongside the old files in one scan
    cat.append("t", rowsAs("key", 101, 120))
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.t WHERE key > 100")
      .collect()(0).getLong(0) == 20)
    // time travel BELOW the rename serves (that snapshot has no map)
    assert(spark.sql(
      s"SELECT k FROM $c.t VERSION AS OF $vOld").count() == 100)
    // compact migrates the layout -> same answers on the fast path
    cat.compact("t")
    val got = spark.sql(s"SELECT m_id, key, tag FROM $c.t")
    assert(got.count() == 120)
    assert(got.filter(col("key").isNull).count() == 0)
    // and SQL DML works against the new name
    spark.sql(s"UPDATE $c.t SET tag = 'sqlup' WHERE key = 42")
    assert(spark.sql(
      s"SELECT * FROM $c.t WHERE tag = 'sqlup'").count() == 1)
  }

  test("SQL scans across rename epochs honour deletion vectors and " +
    "SQL DML on the renamed column BEFORE any compaction") {
    val (cat, c) = fresh()
    spark.sql(s"CREATE TABLE $c.t (m_id BIGINT NOT NULL, k BIGINT, " +
      "tag STRING) TBLPROPERTIES('id_column'='m_id')")
    cat.append("t", rows(1, 50))
    spark.sql(s"ALTER TABLE $c.t RENAME COLUMN k TO key")
    // point SQL UPDATE through the DV path, keyed by the RENAMED name,
    // while every live file still carries the old name
    spark.sql(s"UPDATE $c.t SET tag = 'hit' WHERE m_id = 7")
    assert(spark.sql(s"SELECT key FROM $c.t WHERE tag = 'hit'")
      .collect()(0).getLong(0) == 7L)
    // DELETE keyed by the renamed column; the DV mask and the epoch
    // coalesce compose in one scan
    spark.sql(s"DELETE FROM $c.t WHERE key = 9")
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.t")
      .collect()(0).getLong(0) == 49)
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.t WHERE key = 9")
      .collect()(0).getLong(0) == 0)
  }

  test("the rename survives the parquet checkpoint and a cold reopen") {
    val (cat, _) = fresh()
    cat.createTable("t", shape, "m_id")
    cat.append("t", rows(1, 50))
    cat.renameColumn("t", "k", "key")
    import spark.implicits._
    (1 to 9).foreach(i => cat.append("users",
      Seq((s"u$i", "L", "0123456789", s"u$i@x.c", "h", "user",
        new java.sql.Timestamp(i * 1000L)))
        .toDF("first_name", "last_name", "phone", "email",
          "password_hash", "user_role", "created_at")))
    assert(cat.version >= Catalog.CheckpointInterval)
    val cold = new Catalog(spark, cat.root)
    val got = cold.read("t")
    assert(got.columns.contains("key") &&
      got.filter(col("key").isNull).count() == 0,
      "rename map lost through the checkpoint")
    cold.append("t", rowsAs("key", 51, 60))
    assert(cold.read("t").count() == 60)
  }
}
