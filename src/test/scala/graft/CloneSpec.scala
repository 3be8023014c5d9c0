package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.store.Catalog

/** Shallow clone: zero-copy snapshot tables that stay correct under
  * divergent writes and vacuum. */
class CloneSpec extends SparkSuite {
  import spark.implicits._

  private def freshCat(): Catalog =
    new Catalog(spark, Files.createTempDirectory("graft_clone").toString)

  private def user(fn: String, email: String) =
    Seq((fn, "L", "0123456789", email, "h", "user",
      new java.sql.Timestamp(0L)))
      .toDF("first_name", "last_name", "phone", "email", "password_hash",
        "user_role", "created_at")

  private def parquetCount(root: String): Int = {
    val it = Files.walk(Paths.get(root))
    try it.iterator().asInstanceOf[java.util.Iterator[Path]]
      .asScala.count(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
    finally it.close()
  }
  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }

  test("clone is zero-copy: identical rows, no parquet written by the " +
    "clone commit, and the clone is time-travelable") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c").unionAll(user("b", "b@x.c")))
    val before = parquetCount(cat.root)
    val vBefore = cat.version
    cat.cloneTable("users", "users_snap")
    assert(parquetCount(cat.root) == before, "clone must not write data")
    assert(cat.version == vBefore + 1, "clone is a real commit")
    val src = cat.read("users").orderBy("user_id").collect().toSeq
    val dst = cat.read("users_snap").orderBy("user_id").collect().toSeq
    assert(src == dst)
    // fsck resolves the clone's cross-directory file references cleanly
    assert(cat.fsck("users_snap").collect().forall(_.getBoolean(2)))
    // the snapshot BEFORE the clone has no users_snap
    intercept[Exception] { cat.readAt("users_snap", vBefore).collect() }
  }

  test("writes diverge: source update and clone append do not see each " +
    "other; clone id assignment continues from the source high-water") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c").unionAll(user("b", "b@x.c")))
    cat.cloneTable("users", "users_snap")
    // write to the CLONE (unregistered table name — manifest idcol path)
    val id = cat.append("users_snap", user("c", "c@x.c"))
    assert(id == 3L, s"clone must continue dense ids, got $id")
    cat.update("users", col("email") === "a@x.c",
      Map("user_role" -> lit("admin")))
    val srcRoles = cat.read("users").select("email", "user_role")
      .as[(String, String)].collect().toMap
    val dstRoles = cat.read("users_snap").select("email", "user_role")
      .as[(String, String)].collect().toMap
    assert(srcRoles == Map("a@x.c" -> "admin", "b@x.c" -> "user"))
    assert(dstRoles == Map("a@x.c" -> "user", "b@x.c" -> "user",
      "c@x.c" -> "user"))
    // COW update on the clone itself works through the manifest idcol
    cat.update("users_snap", col("email") === "c@x.c",
      Map("user_role" -> lit("vip")))
    assert(cat.read("users_snap").filter(col("user_role") === "vip")
      .count() == 1)
    assert(cat.read("users").filter(col("user_role") === "vip").count() == 0)
  }

  test("vacuum never reclaims source files a clone still references " +
    "(root-wide liveness), even at retain=0") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    cat.cloneTable("users", "users_snap")
    // source COW-rewrites its only file -> the original parquet under
    // users/ is dead for the SOURCE but still live for the CLONE
    cat.update("users", col("email") === "a@x.c",
      Map("user_role" -> lit("admin")))
    val reclaimed = cat.vacuum("users", retainMillis = 0L)
    assert(reclaimed == 0,
      s"vacuum reclaimed $reclaimed file(s) the clone references")
    assert(cat.read("users_snap").count() == 1, "clone must still read")
    assert(cat.read("users_snap").select("user_role").as[String].head()
      == "user", "clone sees the pre-update snapshot")
    // drop the clone's reference (COW update rewrites its only file,
    // under the clone's OWN directory), then the original is genuinely
    // dead and vacuum reclaims it
    cat.update("users_snap", col("email") === "a@x.c",
      Map("user_role" -> lit("x")))
    assert(cat.vacuum("users", retainMillis = 0L) >= 1)
    assert(cat.read("users").count() == 1 &&
      cat.read("users_snap").count() == 1)
  }

  test("clone target collisions and self-clones are rejected") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    intercept[IllegalArgumentException] {
      cat.cloneTable("users", "users")
    }
    intercept[IllegalArgumentException] {
      cat.cloneTable("users", "events") // registered name
    }
    cat.cloneTable("users", "users_snap")
    intercept[IllegalArgumentException] {
      cat.cloneTable("users", "users_snap") // existing clone
    }
  }

  test("clone VERSION AS OF: freezes a PAST snapshot, guards missing " +
    "versions and pre-existence") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    val v1 = cat.version
    cat.append("users", user("b", "b@x.c"))
    cat.update("users", col("email") === "a@x.c",
      Map("user_role" -> lit("admin")))
    // clone the v1 snapshot: one row, pre-update role
    cat.cloneTable("users", "users_v1", versionAsOf = Some(v1))
    val got = cat.read("users_v1").select("email", "user_role")
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("a@x.c", "user")), got.toString)
    // current table unaffected; id continuation follows v1's high-water
    assert(cat.read("users").count() == 2)
    assert(cat.append("users_v1", user("c", "c@x.c")) == 2L)
    // guards
    intercept[IllegalArgumentException] {
      cat.cloneTable("users", "users_v99", versionAsOf = Some(99L))
    }
    intercept[IllegalArgumentException] {
      // users_v1 did not exist at v1
      cat.cloneTable("users_v1", "users_x", versionAsOf = Some(v1))
    }
  }

  test("fsck: healthy store verifies clean; a tampered manifest id range " +
    "and a deleted live file are each flagged with the right diagnosis") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    cat.append("users", user("b", "b@x.c"))
    val healthy = cat.fsck("users").collect()
    assert(healthy.length == 2 && healthy.forall(_.getBoolean(2)),
      healthy.mkString(", "))
    // tamper: bump one file's claimed max id directly in the manifest
    val mPath = java.nio.file.Paths.get(cat.root, "_manifest.json")
    val json = new String(java.nio.file.Files.readAllBytes(mPath), "UTF-8")
    val tampered = json.replaceFirst("\"max\":1\\b", "\"max\":1001")
    assert(tampered != json, "tamper target not found")
    java.nio.file.Files.write(mPath, tampered.getBytes("UTF-8"))
    val cat2 = new Catalog(spark, cat.root)
    val flagged = cat2.fsck("users").collect()
    assert(flagged.count(!_.getBoolean(2)) == 1, flagged.mkString(", "))
    assert(flagged.find(!_.getBoolean(2)).get.getString(3)
      .contains("id range"), flagged.mkString(", "))
    // delete a live parquet out-of-band: flagged as missing
    java.nio.file.Files.write(mPath, json.getBytes("UTF-8")) // untamper
    val cat3 = new Catalog(spark, cat.root)
    val victim = cat3.fsck("users").collect().head.getString(0)
    java.nio.file.Files.delete(java.nio.file.Paths.get(cat.root, victim))
    val after = cat3.fsck("users").collect()
    assert(after.exists(r => !r.getBoolean(2) &&
      r.getString(3).contains("missing")), after.mkString(", "))
  }

  test("fsck column stats: a stats-bearing table verifies clean and a " +
    "narrowed stat range is flagged as an escape") {
    val cat = freshCat()
    val rows = graft.core.Tables.orders(spark, sf)
      .filter(col("o_orderkey") <= 500)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    cat.append("orders_ingest", rows, orderBy = Seq("o_orderkey"))
    assert(cat.fsck("orders_ingest").collect().forall(_.getBoolean(2)))
    // narrow the recorded o_orderkey stat range: observed data now
    // escapes the claim — exactly the corruption that would make
    // readRange skip files it must scan
    val mPath = java.nio.file.Paths.get(cat.root, "_manifest.json")
    val json = new String(java.nio.file.Files.readAllBytes(mPath), "UTF-8")
    val tampered = json.replaceFirst(
      """"o_orderkey":\[0,""", "\"o_orderkey\":[1,")
    assert(tampered != json, "stats tamper target not found:\n" + json)
    java.nio.file.Files.write(mPath, tampered.getBytes("UTF-8"))
    val flagged = new Catalog(spark, cat.root).fsck("orders_ingest")
      .collect().filter(!_.getBoolean(2))
    assert(flagged.length == 1 &&
      flagged.head.getString(3).contains("o_orderkey"),
      flagged.mkString(", "))
  }

  test("manifest round-trip: a fresh Catalog instance reads the clone's " +
    "pinned schema and id column from disk") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    cat.cloneTable("users", "users_snap")
    val cat2 = new Catalog(spark, cat.root)
    assert(cat2.read("users_snap").columns.contains("user_id"))
    assert(cat2.append("users_snap", user("b", "b@x.c")) == 2L)
  }
}
