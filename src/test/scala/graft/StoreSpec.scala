package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.store.{Catalog, StoreIO}

/** COW store semantics (SURVEY §7.3/§7.4): dense id assignment, update
  * isolation, atomic multi-table commit. Parameterized over BOTH
  * [[StoreIO]] implementations (round 18): [[StoreSpec]] runs the
  * default java.nio impl, [[StoreHadoopIOSpec]] the Hadoop-FileSystem
  * impl over `RawLocalFileSystem` — one semantics contract, two IO
  * bindings, so the HDFS/object-store path is pinned by the same
  * assertions as the local one.
  */
abstract class StoreSpecBase(ioMode: String) extends SparkSuite {
  import spark.implicits._

  protected def mkCat(root: String): Catalog =
    if (ioMode == "hadoop")
      new Catalog(spark, root, StoreIO.hadoop(spark))
    else new Catalog(spark, root)

  private def freshCat(): Catalog =
    mkCat(Files.createTempDirectory("graft_store").toString)

  private def user(fn: String, email: String) =
    Seq((fn, "L", "0123456789", email, "h", "user",
      new java.sql.Timestamp(0L)))
      .toDF("first_name", "last_name", "phone", "email", "password_hash",
        "user_role", "created_at")

  test("append assigns dense, monotonically increasing ids (lastrowid)") {
    val cat = freshCat()
    assert(cat.append("users", user("a", "a@x.c")) == 1L)
    assert(cat.append("users", user("b", "b@x.c")) == 2L)
    val multi = user("c", "c@x.c").unionAll(user("d", "d@x.c"))
    assert(cat.append("users", multi, orderBy = Seq("email")) == 4L)
    val ids = cat.read("users").select("user_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(1L, 2L, 3L, 4L)))
  }

  test("update touches only matching rows, preserves the rest") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c").unionAll(user("b", "b@x.c")))
    cat.update("users", col("email") === "a@x.c",
      Map("user_role" -> lit("admin")))
    val roles = cat.read("users")
      .select("email", "user_role").as[(String, String)].collect().toMap
    assert(roles("a@x.c") == "admin" && roles("b@x.c") == "user")
  }

  test("multi-table transaction commits atomically: nothing visible if " +
    "the body throws") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    intercept[RuntimeException] {
      cat.transaction { tx =>
        tx.append("users", user("b", "b@x.c"))
        throw new RuntimeException("boom")
      }
    }
    assert(cat.read("users").count() == 1,
      "aborted append must not be visible")
    // and a successful multi-table tx makes both writes visible together
    cat.transaction { tx =>
      tx.append("users", user("c", "c@x.c"))
      tx.update("users", col("email") === "a@x.c",
        Map("first_name" -> lit("A2")))
    }
    val after = cat.read("users")
    assert(after.count() == 2)
    assert(after.filter($"first_name" === "A2").count() == 1)
  }

  test("in-transaction reads see staged writes (read-your-writes)") {
    val cat = freshCat()
    cat.transaction { tx =>
      tx.append("users", user("a", "a@x.c"))
      assert(tx.read("users").count() == 1)
    }
    assert(cat.read("users").count() == 1)
  }

  test("bulk append: 10k multi-partition rows get dense ids in order " +
    "with no global window") {
    val cat = freshCat()
    val bulk = spark.range(10000)
      .select(
        concat(lit("fn"), $"id").as("first_name"), lit("L").as("last_name"),
        lit("0123456789").as("phone"),
        // zero-padded so the requested string order == numeric order
        concat(lit("u"), format_string("%05d", $"id"), lit("@x.c")).as("email"),
        lit("h").as("password_hash"), lit("user").as("user_role"),
        lit(new java.sql.Timestamp(0L)).as("created_at"))
      .repartition(8)
    assert(cat.append("users", bulk, orderBy = Seq("email")) == 10000L)
    val rows = cat.read("users")
      .select("user_id", "email").as[(Long, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 10000L).toSeq, "dense ids")
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq,
      "id order must follow the requested orderBy")
  }

  test("two catalogs on one root: concurrent appends lose nothing " +
    "(manifest file lock)") {
    val root = Files.createTempDirectory("graft_store").toString
    val cats = Seq(mkCat(root), mkCat(root))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { i =>
      new Thread(() => {
        try cats(i % 2).append("users", user(s"t$i", s"t$i@x.c"))
        catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"append failed: ${Option(errs.peek())}")
    val ids = cats.head.read("users")
      .select("user_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(1L, 2L, 3L, 4L)),
      "every committed append must survive both catalogs")
  }

  test("two catalogs on one root: concurrent MERGEs serialize losslessly " +
    "(each sees the prior commit; no lost update, ids stay dense)") {
    val root = Files.createTempDirectory("graft_store").toString
    val cats = Seq(mkCat(root), mkCat(root))
    cats.head.append("users", user("a", "a@x.c").unionAll(user("b", "b@x.c")))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val jobs: Seq[() => Unit] = Seq(
      () => { cats(0).merge("users",
        Seq(("a2", "L", "0", "a@x.c", "h", "admin",
          new java.sql.Timestamp(0L)))
          .toDF("first_name", "last_name", "phone", "email",
            "password_hash", "user_role", "created_at"), "email"); () },
      () => { cats(1).merge("users", user("c", "c@x.c"), "email"); () },
      () => { cats(0).merge("users", user("d", "d@x.c"), "email"); () })
    val threads = jobs.map(j => new Thread(() => {
      try j() catch { case e: Throwable => errs.add(e) }
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"merge failed: ${Option(errs.peek())}")
    val rows = cats.head.read("users")
      .select("email", "user_id", "user_role")
      .as[(String, Long, String)].collect().sortBy(_._2)
    assert(rows.length == 4, s"lost a merge: ${rows.toSeq}")
    assert(rows.map(_._2).sameElements(Array(1L, 2L, 3L, 4L)),
      s"ids must stay dense across serialized merges: ${rows.toSeq}")
    val byEmail = rows.map(r => r._1 -> r._3).toMap
    assert(byEmail("a@x.c") == "admin", "the keyed update must survive")
    assert(byEmail.keySet == Set("a@x.c", "b@x.c", "c@x.c", "d@x.c"))
  }

  test("OCC lock scope: a writer on a DISJOINT table commits while a " +
    "long transaction is still mid-body (no root-wide serialization)") {
    val root = Files.createTempDirectory("graft_store").toString
    val catA = mkCat(root)
    val catB = mkCat(root)
    catA.append("users", user("a", "a@x.c"))
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // writer A: a "long merge" on users — parks mid-body after staging
    val a = new Thread(() => {
      try catA.transaction { tx =>
        tx.merge("users", user("a2", "a@x.c"), "email")
        entered.countDown()
        release.await()
      } catch { case e: Throwable => errs.add(e); entered.countDown() }
    })
    a.start()
    assert(entered.await(60, java.util.concurrent.TimeUnit.SECONDS))
    // writer B on a DIFFERENT table must commit while A is parked —
    // under the old root-wide lock this deadlocks until release
    val bDone = new java.util.concurrent.CountDownLatch(1)
    val b = new Thread(() => {
      try { catB.append("events_ingest",
        Seq((1L, new java.sql.Timestamp(0L), 1L, "view", 1.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value",
            "props")); bDone.countDown() }
      catch { case e: Throwable => errs.add(e); bDone.countDown() }
    })
    b.start()
    assert(bDone.await(60, java.util.concurrent.TimeUnit.SECONDS),
      "disjoint-table writer must not serialize behind the parked merge")
    assert(catB.read("events_ingest").count() == 1L,
      "B's commit must be visible while A is still mid-body")
    release.countDown(); a.join(60000)
    assert(errs.isEmpty, s"unexpected failure: ${Option(errs.peek())}")
    // A's merge committed cleanly after release (no conflict: different
    // tables) and B's earlier commit survived the swap
    val roles = catA.read("users")
      .select("email", "first_name").as[(String, String)].collect().toMap
    assert(roles("a@x.c") == "a2", "parked merge must still commit")
    assert(catB.read("events_ingest").count() == 1L)
  }

  test("file-level OCC: two appends to the SAME table both commit — " +
    "the later one id-rebases instead of re-running (dense ids)") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    // a full commit lands on the same table mid-body: the in-flight
    // transaction's append (provisional id 2) reconciles at commit —
    // its new file is rewritten with ids shifted past the concurrent
    // high-water mark, no body re-run, nothing lost
    cat.transaction { tx =>
      tx.append("users", user("b", "b@x.c"))
      cat.append("users", user("c", "c@x.c"))
    }
    val rows = cat.read("users").select("email", "user_id")
      .as[(String, Long)].collect().sortBy(_._2)
    assert(rows.map(_._2).sameElements(Array(1L, 2L, 3L)),
      s"rebased ids must stay dense: ${rows.toSeq}")
    assert(rows.map(_._1).toSet == Set("a@x.c", "b@x.c", "c@x.c"))
    assert(rows.toMap == Map("a@x.c" -> 1L, "c@x.c" -> 2L, "b@x.c" -> 3L),
      s"concurrent winner keeps id 2, staged append rebases to 3: " +
        s"${rows.toSeq}")
    assert(cat.maxId("users") == 3L)
  }

  test("file-level OCC: the convenience append returns the FINAL id " +
    "after a commit-time rebase, not the provisional one") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    // stage a conflicting append through a parked transaction so the
    // convenience append's commit must rebase... simplest determinstic
    // shape: the convenience runs INSIDE another tx's body; the OUTER
    // tx then rebases. Here instead assert the convenience path
    // directly: a concurrent commit between its snapshot and commit.
    var innerId = 0L
    cat.transaction { tx =>
      tx.append("users", user("b", "b@x.c"))
      innerId = cat.append("users", user("c", "c@x.c"))
    }
    // the convenience saw a clean snapshot (no rebase): id 2; the
    // outer tx rebased b to 3 — asserted above; here assert the
    // convenience's return matched what landed
    val ids = cat.read("users").select("email", "user_id")
      .as[(String, Long)].collect().toMap
    assert(innerId == ids("c@x.c"),
      s"returned id $innerId vs landed ${ids("c@x.c")}")
  }

  test("file-level OCC conflict: overlapping file rewrites still fail " +
    "loudly with ConcurrentWriteException") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    intercept[Catalog.ConcurrentWriteException] {
      cat.transaction { tx =>
        tx.update("users", col("user_id") === 1L,
          Map("first_name" -> lit("x")))
        // a concurrent commit rewrites the SAME file
        cat.update("users", col("user_id") === 1L,
          Map("first_name" -> lit("y")))
      }
    }
    // the loser aborted cleanly; the concurrent winner's value survives
    val name = cat.read("users").select("first_name").as[String].head()
    assert(name == "y", s"winner's rewrite must survive, got $name")
  }

  test("file-level OCC conflict: a CHECK added concurrently cannot be " +
    "bypassed by in-flight rows validated against the old set") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    intercept[Catalog.ConcurrentWriteException] {
      cat.transaction { tx =>
        tx.append("users", user("b", "b@x.c"))
        cat.addCheck("users", "has_at", "email LIKE '%@%'")
      }
    }
    assert(cat.read("users").count() == 1L,
      "the staged append must abort, not slip past the new check")
  }

  test("file-level OCC conflict: id rebase is refused for a MULTI-table " +
    "transaction (staged rows elsewhere may reference provisional ids)") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    intercept[Catalog.ConcurrentWriteException] {
      cat.transaction { tx =>
        val uid = tx.append("users", user("b", "b@x.c"))
        // a second table stages rows derived from the provisional id —
        // exactly the FK flow the engine cannot see through
        tx.append("events_ingest",
          Seq((1L, new java.sql.Timestamp(0L), uid, "view", 1.0, "{}"))
            .toDF("event_id", "ts", "user_id", "event_type", "value",
              "props"))
        cat.append("users", user("c", "c@x.c"))
      }
    }
    // neither staged table landed; the concurrent winner survives
    assert(cat.read("users").select("email").as[String].collect().toSet
      == Set("a@x.c", "c@x.c"))
    assert(cat.read("events_ingest").count() == 0L)
  }

  test("read-set serializability: a transaction that READ a table " +
    "conflicts when that table changes before its commit (no write skew)") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    intercept[Catalog.ConcurrentWriteException] {
      cat.transaction { tx =>
        // decision input: read users...
        assert(tx.read("users").count() == 1L)
        // ...users changes under the transaction...
        cat.append("users", user("b", "b@x.c"))
        // ...and the tx writes a DIFFERENT table based on what it read
        tx.append("events_ingest",
          Seq((1L, new java.sql.Timestamp(0L), 1L, "view", 1.0, "{}"))
            .toDF("event_id", "ts", "user_id", "event_type", "value",
              "props"))
      }
    }
    assert(cat.read("events_ingest").count() == 0L,
      "the skewed write must not land")
  }

  test("file-level OCC: two disjoint-day replaceWhere loaders both " +
    "commit; untouched files carried by reference through both") {
    val cat = freshCat()
    def ev(name: String, dayMs: Long) = Seq((name, "d",
      new java.sql.Timestamp(dayMs), 60, "loc", "t", 1L,
      new java.math.BigDecimal("1.00"), 10, true,
      new java.sql.Timestamp(0L)))
      .toDF("event_name", "event_description", "event_date",
        "event_time_sec", "location", "event_type", "organizer_id",
        "price", "capacity", "is_active", "created_at")
    val day = 86400000L
    cat.append("events", ev("d1a", 1 * day))
    cat.append("events", ev("d2a", 2 * day))
    cat.append("events", ev("d3a", 3 * day))
    val before = cat.liveFiles("events").map(_._1).toSet
    // loader A stages a day-2 reload mid-body; loader B commits a
    // day-3 reload concurrently; A's commit reconciles (disjoint hit
    // files) and id-rebases its fresh rows — neither re-runs
    cat.transaction { tx =>
      tx.replaceWhere("events", "event_date",
        2 * day * 1000L, (3 * day - 1) * 1000L, ev("d2b", 2 * day))
      cat.replaceWhere("events", "event_date",
        java.time.Instant.ofEpochMilli(3 * day),
        java.time.Instant.ofEpochMilli(4 * day - 1), ev("d3b", 3 * day))
    }
    val rows = cat.read("events").select("event_name", "event_id")
      .as[(String, Long)].collect().sortBy(_._2)
    assert(rows.map(_._1).toSet == Set("d1a", "d2b", "d3b"),
      s"both reloads must land: ${rows.toSeq}")
    assert(rows.map(_._2).sameElements(Array(1L, 4L, 5L)),
      s"ids dense across the rebase (d3b=4 committed first, d2b " +
        s"rebased to 5): ${rows.toSeq}")
    // the day-1 file survived BOTH reloads by reference
    val after = cat.liveFiles("events").map(_._1).toSet
    assert(before.intersect(after).size == 1,
      s"day-1 file must carry by reference: ${before.intersect(after)}")
    assert(cat.maxId("events") == 5L)
  }

  test("vacuum cannot reclaim an in-flight writer's staged files " +
    "(writer-lease guard, retainMillis = 0)") {
    val root = Files.createTempDirectory("graft_store").toString
    val catA = mkCat(root)
    val catB = mkCat(root)
    catA.append("users", user("a", "a@x.c"))
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val a = new Thread(() => {
      try catA.transaction { tx =>
        tx.append("users", user("b", "b@x.c"))
        entered.countDown()
        release.await()
      } catch { case e: Throwable => errs.add(e); entered.countDown() }
    })
    a.start()
    assert(entered.await(60, java.util.concurrent.TimeUnit.SECONDS))
    // the staged (manifest-unreferenced) file is brand new; without the
    // lease guard an immediate-reclaim vacuum would delete it and the
    // parked transaction would commit a manifest pointing at nothing
    catB.vacuum("users", retainMillis = 0)
    release.countDown(); a.join(60000)
    assert(errs.isEmpty, s"parked writer failed: ${Option(errs.peek())}")
    val emails = catA.read("users").select("email").as[String]
      .collect().toSet
    assert(emails == Set("a@x.c", "b@x.c"),
      s"staged file must survive the vacuum and commit: $emails")
  }

  test("compact merges file groups into disjoint id ranges; vacuum " +
    "removes only dead files and keeps every visible row") {
    val cat = freshCat()
    (1 to 4).foreach(i => cat.append("users", user(s"u$i", s"u$i@x.c")))
    cat.update("users", col("user_id") === 2L,
      Map("user_role" -> lit("admin")))
    val before = cat.read("users")
      .select("user_id", "user_role").as[(Long, String)].collect().toMap
    assert(cat.liveFiles("users").size >= 4)
    cat.compact("users", numFiles = 2)
    val files = cat.liveFiles("users")
    assert(files.size <= 2, s"expected <= 2 files, got ${files.size}")
    // ranges are disjoint after the range repartition
    files.sortBy(_._2).sliding(2).foreach {
      case Seq((_, _, aMax), (_, bMin, _)) => assert(aMax < bMin)
      case _ =>
    }
    val deleted = cat.vacuum("users", retainMillis = 0)
    assert(deleted > 0, "appends + update + compact must leave dead files")
    val after = cat.read("users")
      .select("user_id", "user_role").as[(Long, String)].collect().toMap
    assert(after == before, "compact + vacuum must not change table rows")
    assert(after(2L) == "admin")
    // store stays writable with correct id continuation after maintenance
    assert(cat.append("users", user("u5", "u5@x.c")) == 5L)
  }

  test("compactSmall folds only sub-threshold files (DVs folded), " +
    "carries large files by reference, and is content-invariant") {
    val cat = freshCat()
    // one large file group (12 rows) + six single-row small groups
    val big = (1 to 12).map(i => (s"b$i", "L", "0123456789",
      s"b$i@x.c", "h", "user", new java.sql.Timestamp(0L)))
      .toDF("first_name", "last_name", "phone", "email", "password_hash",
        "user_role", "created_at")
    cat.append("users", big.coalesce(1), orderBy = Seq("email"))
    (1 to 6).foreach(i => cat.append("users", user(s"s$i", s"s$i@x.c")))
    // a merge-on-read point update marks a DV on one small file (and
    // stages one more small patch file)
    cat.update("users", col("user_id") === 14L,
      Map("user_role" -> lit("admin")))
    val expected = cat.read("users")
      .select("user_id", "email", "user_role").as[(Long, String, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val beforeFiles = cat.liveFiles("users")
    assert(beforeFiles.size >= 8, s"fixture: ${beforeFiles.size} files")
    // the big append's file(s) hold ids 1..12; everything else is small
    val bigPaths = beforeFiles.filter(_._3 <= 12L).map(_._1).toSet
    assert(bigPaths.nonEmpty)
    val folded = cat.compactSmall("users", smallRows = 5L,
      targetRows = 100L)
    assert(folded >= 6, s"expected >= 6 small files folded, got $folded")
    val afterFiles = cat.liveFiles("users")
    assert(bigPaths.subsetOf(afterFiles.map(_._1).toSet),
      "the large file(s) must carry by reference, not be rewritten")
    assert(afterFiles.size == bigPaths.size + 1,
      s"large + one bin expected, got: $afterFiles")
    val after = cat.read("users")
      .select("user_id", "email", "user_role").as[(Long, String, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(after == expected, "compactSmall must not change content")
    assert(after(14L)._2 == "admin",
      "the DV-patched image must survive the fold")
    // the folded bin carries no deletion vector: vacuum retires the
    // dead small files and their sidecar
    assert(cat.vacuum("users", retainMillis = 0) > 0)
    assert(cat.read("users").count() == 18L)
  }

  test("compactSmall no-ops below minSmallFiles and never rewrites a " +
    "table of large files") {
    val cat = freshCat()
    val big = (1 to 20).map(i => (s"b$i", "L", "0123456789",
      s"b$i@x.c", "h", "user", new java.sql.Timestamp(0L)))
      .toDF("first_name", "last_name", "phone", "email", "password_hash",
        "user_role", "created_at")
    cat.append("users", big.coalesce(1), orderBy = Seq("email"))
    cat.append("users", user("s1", "s1@x.c"))
    val v = cat.version
    // one small candidate < minSmallFiles=2: stage nothing, commit
    // nothing
    assert(cat.compactSmall("users", smallRows = 10L,
      targetRows = 100L) == 0)
    // all files at/above the threshold: nothing is a candidate
    assert(cat.compactSmall("users", smallRows = 1L,
      targetRows = 100L) == 0)
    assert(cat.version == v, "a no-op pass must not mint a commit")
  }

  test("compactSmall folds fully-dead small files to nothing " +
    "(DV garbage collection)") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    cat.append("users", user("b", "b@x.c"))
    assert(cat.delete("users", col("user_id") === 1L) == 1L)
    assert(cat.delete("users", col("user_id") === 2L) == 1L)
    assert(cat.compactSmall("users", smallRows = 10L,
      targetRows = 100L) == 2)
    assert(cat.liveFiles("users").isEmpty,
      s"all-dead files fold away: ${cat.liveFiles("users")}")
    assert(cat.read("users").count() == 0L)
    // ids continue past the folded-away high-water mark
    assert(cat.append("users", user("c", "c@x.c")) == 3L)
  }

  test("default vacuum keeps freshly-dead files inside the retention " +
    "window, so a pre-vacuum reader snapshot still resolves") {
    val cat = freshCat()
    (1 to 3).foreach(i => cat.append("users", user(s"v$i", s"v$i@x.c")))
    // a reader plans over the current snapshot BEFORE maintenance runs
    val snapshot = cat.read("users").select("user_id", "first_name")
    cat.compact("users", numFiles = 1) // makes the 3 original files dead
    val deleted = cat.vacuum("users") // default retention: files too young
    assert(deleted == 0,
      "files dead for seconds must survive the default retention window")
    // the pre-vacuum snapshot still reads its (now-dead) files
    assert(snapshot.count() == 3L)
    // the escape hatch still reclaims immediately
    assert(cat.vacuum("users", retainMillis = 0) > 0)
    assert(cat.read("users").count() == 3L)
  }

  test("time travel: readAt serves every committed snapshot until vacuum " +
    "retires it, then fails loudly instead of returning a partial table") {
    val cat = freshCat()
    assert(cat.version == 0L)
    cat.append("users", user("t1", "t1@x.c")) // v1
    cat.append("users", user("t2", "t2@x.c")) // v2
    cat.update("users", col("user_id") === 1L, // v3
      Map("user_role" -> lit("admin")))
    assert(cat.version == 3L)
    // each version is the table as of that commit
    assert(cat.readAt("users", 1L).count() == 1L)
    assert(cat.readAt("users", 2L).count() == 2L)
    val rolesV2 = cat.readAt("users", 2L)
      .select("user_id", "user_role").as[(Long, String)].collect().toMap
    assert(rolesV2(1L) == "user", "v2 predates the role update")
    val rolesV3 = cat.readAt("users", 3L)
      .select("user_id", "user_role").as[(Long, String)].collect().toMap
    assert(rolesV3(1L) == "admin")
    // a never-committed version is a clear error
    intercept[IllegalArgumentException](cat.readAt("users", 99L))
    // a multi-table transaction is ONE commit -> one version
    cat.transaction { tx =>
      tx.append("users", user("t3", "t3@x.c"))
      tx.update("users", col("user_id") === 2L,
        Map("user_role" -> lit("organizer")))
    }
    assert(cat.version == 4L)
    // merge-on-read (round 15): the point updates above landed as
    // deletion vectors, so every data file is still LIVE — vacuum(0)
    // has nothing to reclaim and the old snapshot STAYS readable
    // (strictly better availability than the COW formulation)
    cat.vacuum("users", retainMillis = 0)
    assert(cat.readAt("users", 2L).count() == 2L)
    // fold the masks into a rewrite, then vacuum: now the originals are
    // dead and reclaimed, and the loud-failure contract kicks in —
    // readAt must throw, never silently drop rows
    cat.compact("users")
    cat.vacuum("users", retainMillis = 0)
    val ex = intercept[RuntimeException](cat.readAt("users", 2L).count())
    assert(ex.isInstanceOf[IllegalArgumentException]
      || ex.isInstanceOf[IllegalStateException])
    // the current snapshot is always readable, before and after vacuum
    assert(cat.readAt("users", cat.version).count() == 3L)
    assert(cat.read("users").count() == 3L)
  }

  test("streaming ingest lands the fixture exactly once; a replayed " +
    "batch is rejected by the transactional offsets ledger") {
    val cat = freshCat()
    val n = graft.streaming.StreamIngest.ingestEvents(spark, sf, cat, "qA")
    val fixtureN = spark.read.parquet(s"$sf/events.parquet").count()
    assert(n == fixtureN, s"expected $fixtureN ingested rows, got $n")
    assert(cat.read("stream_offsets").count() >= 1L)
    // a checkpoint-free re-run replays batch id 0 -> ledger rejects it;
    // the return value is the rows landed by THIS run (a delta), so 0
    assert(graft.streaming.StreamIngest
      .ingestEvents(spark, sf, cat, "qA") == 0L,
      "a fully-replayed re-run must report a 0 landed-row delta")
    // replaying an already-committed batch id must be a no-op
    val rows = graft.core.Tables.events(spark, sf)
    assert(!graft.streaming.StreamIngest
      .commitBatch(cat, "events_ingest", "qA", 0L, rows))
    assert(cat.read("events_ingest").count() == fixtureN)
    // a different query name owns its own batch-id space
    assert(graft.streaming.StreamIngest
      .commitBatch(cat, "events_ingest", "qB", 0L, rows))
    assert(cat.read("events_ingest").count() == 2 * fixtureN)
    // ids stayed dense across streaming + manual commits
    assert(cat.maxId("events_ingest") == 2 * fixtureN)
    val distinctIds = cat.read("events_ingest")
      .select("ingest_id").distinct().count()
    assert(distinctIds == 2 * fixtureN)
  }

  test("multi-batch stream ingest: one ledger row per batch, dense ids, " +
    "and re-running the whole stream lands nothing new") {
    val cat = freshCat()
    // split the fixture into 3 files -> maxFilesPerTrigger(1) gives 3
    // genuine micro-batches
    val srcDir = Files.createTempDirectory("graft_ingest_src").toString
    graft.core.Tables.events(spark, sf).repartition(3)
      .write.mode("overwrite").parquet(s"$srcDir/events.parquet")
    val fixtureN = graft.core.Tables.events(spark, sf).count()
    def run(): Long = {
      val batch = spark.read.parquet(s"$srcDir/events.parquet")
      val stream = spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/events.parquet")
      val q = stream.writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          graft.streaming.StreamIngest
            .commitBatch(cat, "events_ingest", "qMulti", id, df): Unit
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      cat.read("events_ingest").count()
    }
    assert(run() == fixtureN)
    val ledger = cat.read("stream_offsets")
      .filter(col("query") === "qMulti").count()
    assert(ledger == 3L, s"expected 3 admitted batches, got $ledger")
    assert(cat.maxId("events_ingest") == fixtureN) // dense across batches
    // a restart without checkpoint replays batch ids 0..2 — the ledger
    // rejects all of them, so the store is unchanged
    assert(run() == fixtureN)
    assert(cat.read("stream_offsets")
      .filter(col("query") === "qMulti").count() == 3L)
  }

  test("keyed update rewrites only files whose id range matches; " +
    "others stay byte-identical") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c").unionAll(user("b", "b@x.c")))
    cat.append("users", user("c", "c@x.c").unionAll(user("d", "d@x.c")))
    val before = cat.liveFiles("users")
    assert(before.size >= 2, "two appends must produce >= 2 live files")
    // file group from append #1 covers ids 1-2; update pins id 3
    val untouched = before.filter { case (_, mn, mx) => mx < 3 }
    val bytesBefore = untouched.map { case (p, _, _) =>
      p -> Files.readAllBytes(java.nio.file.Paths.get(s"${cat.root}/$p")).toSeq
    }.toMap
    cat.update("users", col("user_id") === 3L,
      Map("user_role" -> lit("admin")))
    val after = cat.liveFiles("users")
    bytesBefore.foreach { case (p, bytes) =>
      assert(after.exists(_._1 == p),
        s"non-matching file $p must be carried forward by reference")
      assert(Files.readAllBytes(
        java.nio.file.Paths.get(s"${cat.root}/$p")).toSeq == bytes,
        s"non-matching file $p must stay byte-identical")
    }
    val roles = cat.read("users")
      .select("user_id", "user_role").as[(Long, String)].collect().toMap
    assert(roles(3L) == "admin" && roles(1L) == "user" &&
      roles(2L) == "user" && roles(4L) == "user")
  }

  test("merge upserts by natural key: matched rows keep their surrogate " +
    "id and take EVERY source column (nulls included); unmatched rows " +
    "append with fresh dense ids") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c").unionAll(user("b", "b@x.c")))
    val src = Seq(
      ("a2", null.asInstanceOf[String], "0", "a@x.c", "h2", "admin",
        new java.sql.Timestamp(0L)),
      ("c", "L", "0", "c@x.c", "h", "user", new java.sql.Timestamp(0L)))
      .toDF("first_name", "last_name", "phone", "email", "password_hash",
        "user_role", "created_at")
    val (nUpd, nIns) = cat.merge("users", src, "email")
    assert((nUpd, nIns) == ((1L, 1L)), s"got ($nUpd, $nIns)")
    val rows = cat.read("users")
      .select("user_id", "email", "first_name", "last_name", "user_role")
      .as[(Long, String, String, Option[String], String)]
      .collect().map(r => r._2 -> r).toMap
    assert(rows("a@x.c") == ((1L, "a@x.c", "a2", None, "admin")),
      s"matched row must keep id 1 and take source values: ${rows("a@x.c")}")
    assert(rows("b@x.c")._1 == 2L && rows("b@x.c")._3 == "b",
      "unmatched target row must be untouched")
    assert(rows("c@x.c")._1 == 3L, "inserted row must get the next id")
  }

  test("merge rewrites ONLY files containing matched keys — untouched " +
    "file groups survive by reference") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c")) // file group 1
    cat.append("users", user("b", "b@x.c")) // file group 2
    val before = cat.liveFiles("users").map(_._1).toSet
    cat.merge("users", user("a2", "a@x.c"), "email")
    val after = cat.liveFiles("users").map(_._1).toSet
    val carried = before.intersect(after)
    assert(carried.nonEmpty,
      s"the b-file must survive by reference:\nbefore=$before\nafter=$after")
    val bFiles = after -- before
    assert(bFiles.nonEmpty, "the a-file must have been rewritten")
  }

  test("merge rejects duplicate source keys (ambiguous merge), and a " +
    "merge inside a failed transaction leaves the table unchanged") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    intercept[IllegalArgumentException] {
      cat.merge("users",
        user("x", "a@x.c").unionAll(user("y", "a@x.c")), "email")
    }
    intercept[RuntimeException] {
      cat.transaction { tx =>
        tx.merge("users", user("a2", "a@x.c"), "email")
        throw new RuntimeException("boom")
      }
    }
    val a = cat.read("users").select("first_name").as[String].collect()
    assert(a.toSeq == Seq("a"), "failed tx must not leak the merge")
    // several NULL-key rows are NOT ambiguous: NULL matches no target
    // row, so they all insert as new rows
    val (nU, nI) = cat.merge("users",
      user("n1", null).unionAll(user("n2", null)), "email")
    assert((nU, nI) == ((0L, 2L)), s"null-key merge must insert: ($nU, $nI)")
    assert(cat.read("users").count() == 3)
  }

  private def orderBatch(keys: Seq[Long], status: String) =
    keys.map(k => (k, k * 10, status, 1.0,
      new java.sql.Timestamp(0L), "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")

  test("disjoint-key merges reconcile: two writers upserting different " +
    "key ranges of one table both commit (stats prove disjointness); " +
    "overlapping domains still conflict") {
    val root = Files.createTempDirectory("graft_store").toString
    val cat1 = mkCat(root)
    val cat2 = mkCat(root)
    // seed two file groups with well-separated o_orderkey stats ranges
    cat1.append("orders_ingest", orderBatch(1L to 10L, "seed"))   // ids 1-10
    cat1.append("orders_ingest", orderBatch(100L to 110L, "seed")) // ids 11-21
    // writer 1 opens a tx and merges in the LOW domain (updates 1-3,
    // inserts 11-12); before it commits, writer 2's merge in the HIGH
    // domain (updates 100-101, inserts 111) lands fully
    cat1.transaction { tx =>
      tx.merge("orders_ingest",
        orderBatch(Seq(1L, 2L, 3L, 11L, 12L), "A"), "o_orderkey")
      cat2.merge("orders_ingest",
        orderBatch(Seq(100L, 101L, 111L), "B"), "o_orderkey")
    } // commit-time reconcile: key domains [1,12] vs [100,111] disjoint
    val rows = cat1.read("orders_ingest")
      .select("o_orderkey", "o_orderstatus", "ingest_id")
      .as[(Long, String, Long)].collect()
    val byKey = rows.map(r => r._1 -> r._2).toMap
    assert(Seq(1L, 2L, 3L, 11L, 12L).forall(byKey(_) == "A"),
      s"merge A lost: $byKey")
    assert(Seq(100L, 101L, 111L).forall(byKey(_) == "B"),
      s"merge B lost: $byKey")
    assert(Seq(4L, 10L, 102L, 110L).forall(byKey(_) == "seed"),
      "untouched keys must keep seed values")
    assert(rows.length == 24, s"21 seed + 3 inserts, got ${rows.length}")
    // both sides inserted -> writer 1's new ids were REBASED past
    // writer 2's allocation: still dense and unique
    val ids = rows.map(_._3).sorted
    assert(ids.sameElements(1L to 24L),
      s"ids not dense after rebase: ${ids.toSeq}")
    // overlapping key domains: the stats ranges intersect, so the
    // second committer still fails loudly
    intercept[Catalog.ConcurrentWriteException] {
      cat1.transaction { tx =>
        tx.merge("orders_ingest", orderBatch(Seq(1L, 2L), "C"),
          "o_orderkey")
        cat2.merge("orders_ingest", orderBatch(Seq(2L, 3L), "D"),
          "o_orderkey")
      }
    }
    // a merge keyed on a NON-stats column stays whole-table strict:
    // any concurrent commit (even key-disjoint) conflicts
    // (o_totalprice — o_custkey gained stats in round 15 for the
    // clustered-compaction gate and now reconciles like o_orderkey)
    intercept[Catalog.ConcurrentWriteException] {
      cat1.transaction { tx =>
        tx.merge("orders_ingest", orderBatch(Seq(5L), "E"),
          "o_totalprice")
        cat2.merge("orders_ingest", orderBatch(Seq(300L), "F"),
          "o_orderkey")
      }
    }
  }

  test("disjoint-key SCD2 merges reconcile: two dimension loaders on " +
    "different key shards both commit; overlapping shards conflict") {
    val root = Files.createTempDirectory("graft_store").toString
    val cat1 = mkCat(root)
    val cat2 = mkCat(root)
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    def batch(rows: (Long, String, String)*) =
      rows.toSeq.toDF("user_id", "user_role", "email")
    // seed both shards' current rows in separate commits (separate
    // file groups with disjoint user_id stats)
    cat1.scd2Merge("users_dim", batch((1L, "user", "a@x.c"),
      (2L, "user", "b@x.c")), "user_id", Seq("user_role", "email"), t1)
    cat1.scd2Merge("users_dim", batch((100L, "user", "x@x.c")),
      "user_id", Seq("user_role", "email"), t1)
    // loader 1 (keys 1-2) is mid-transaction when loader 2 (key 100,
    // plus a new key 101) commits — disjoint shards must reconcile
    cat1.transaction { tx =>
      tx.scd2Merge("users_dim", batch((2L, "organizer", "b@x.c")),
        "user_id", Seq("user_role", "email"), t2)
      cat2.scd2Merge("users_dim", batch((100L, "admin", "x@x.c"),
        (101L, "user", "y@x.c")), "user_id", Seq("user_role", "email"), t2)
    }
    val rows = cat1.read("users_dim")
      .select("user_id", "user_role", "is_current")
      .as[(Long, String, Boolean)].collect()
    val current = rows.filter(_._3).map(r => r._1 -> r._2).toMap
    assert(current == Map(1L -> "user", 2L -> "organizer",
      100L -> "admin", 101L -> "user"), s"current rows: $current")
    // both loaders' closed episodes survive (2 and 100 each have one)
    assert(rows.count(!_._3) == 2, s"closed episodes: ${rows.toSeq}")
    // ids stay dense across the reconcile's insert rebase
    val ids = cat1.read("users_dim").select("dim_id")
      .as[Long].collect().sorted
    assert(ids.sameElements(1L to ids.length.toLong),
      s"ids not dense: ${ids.toSeq}")
    // overlapping shards: loser fails loudly
    intercept[Catalog.ConcurrentWriteException] {
      cat1.transaction { tx =>
        tx.scd2Merge("users_dim", batch((1L, "vip", "a@x.c")),
          "user_id", Seq("user_role", "email"), t2)
        cat2.scd2Merge("users_dim", batch((1L, "banned", "a@x.c")),
          "user_id", Seq("user_role", "email"), t2)
      }
    }
  }

  test("changefeed: inserts/deletes between versions reflect appends, " +
    "updates (old+new image) and merges; COW-copied rows cancel out; " +
    "v0 baseline replays the table as inserts") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c").unionAll(user("b", "b@x.c")))
    val v1 = cat.version
    cat.update("users", col("email") === "a@x.c",
      Map("user_role" -> lit("admin")))
    val v2 = cat.version
    cat.merge("users", user("c", "c@x.c"), "email")
    val v3 = cat.version
    def feed(from: Long, to: Long): Set[(String, String, String)] =
      cat.changesBetween("users", from, to)
        .select("email", "user_role", "_change_type")
        .as[(String, String, String)].collect().toSet
    // the update rewrote a+b's file; b's copied row must cancel
    assert(feed(v1, v2) == Set(("a@x.c", "admin", "insert"),
      ("a@x.c", "user", "delete")), s"got ${feed(v1, v2)}")
    assert(feed(v2, v3) == Set(("c@x.c", "user", "insert")))
    // composition across versions: net change only
    assert(feed(v1, v3) == Set(("a@x.c", "admin", "insert"),
      ("a@x.c", "user", "delete"), ("c@x.c", "user", "insert")))
    // empty-store baseline replays everything as inserts
    assert(feed(0L, v1) == Set(("a@x.c", "user", "insert"),
      ("b@x.c", "user", "insert")))
    // identical versions -> empty feed
    assert(feed(v2, v2).isEmpty)
  }

  test("delete removes only matching rows, prunes by pinned id, drops " +
    "empty rewrites, and surfaces as changefeed deletes") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c")) // file 1: id 1
    cat.append("users", user("b", "b@x.c").unionAll(user("c", "c@x.c")))
    val before = cat.liveFiles("users").map(_._1).toSet
    val v1 = cat.version
    // pinned-id delete (round 15, merge-on-read): a pure-DV commit —
    // only file 1 (ids 1..1) is touched, and it touches it by SIDECAR:
    // the file survives on disk fully masked (bytes written follow the
    // deleted row), and compaction is what later retires it
    assert(cat.delete("users", col("user_id") === 1L) == 1L)
    val after = cat.liveFiles("users").map(_._1).toSet
    assert(after == before,
      s"a DV delete must not change the file set: before=$before " +
        s"after=$after")
    assert(cat.read("users").count() == 2)
    // no-match delete is a no-op (id outside every file range)
    assert(cat.delete("users", col("user_id") === 99L) == 0L)
    assert(cat.version == v1 + 1, "a no-op delete must not commit")
    // unpinned predicate: full scan path still deletes correctly
    assert(cat.delete("users", col("email") === "c@x.c") == 1L)
    assert(cat.read("users").select("email").as[String].collect().toSeq
      == Seq("b@x.c"))
    val changes = cat.changesBetween("users", v1, cat.version)
      .select("email", "_change_type").as[(String, String)].collect().toSet
    assert(changes == Set(("a@x.c", "delete"), ("c@x.c", "delete")),
      s"deletes must surface in the changefeed: $changes")
  }

  test("timestamp time travel: readAsOf resolves the latest commit at " +
    "or before the given wall-clock time, and fails loudly outside the " +
    "committed range") {
    val cat = freshCat()
    intercept[IllegalArgumentException] {
      cat.versionAsOf(System.currentTimeMillis()) // empty store
    }
    cat.append("users", user("a", "a@x.c"))
    Thread.sleep(15)
    val t = System.currentTimeMillis()
    Thread.sleep(15)
    cat.append("users", user("b", "b@x.c"))
    assert(cat.readAsOf("users", t).count() == 1,
      "between the commits, only the first snapshot existed")
    assert(cat.readAsOf("users", System.currentTimeMillis()).count() == 2)
    intercept[IllegalArgumentException] {
      cat.versionAsOf(t - 3600L * 1000) // before any commit
    }
  }

  test("changesWithUpdates pairs an id on both feed sides into " +
    "update_preimage/update_postimage; one-sided rows stay " +
    "insert/delete") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c").unionAll(user("b", "b@x.c")))
    val v1 = cat.version
    cat.transaction { tx =>
      tx.update("users", col("email") === "a@x.c",
        Map("first_name" -> lit("a2")))
      tx.delete("users", col("email") === "b@x.c")
      tx.append("users", user("c", "c@x.c"))
    }
    val feed = cat.changesWithUpdates("users", v1, cat.version)
      .select("email", "first_name", "_change_type")
      .as[(String, String, String)].collect().toSet
    assert(feed == Set(
      ("a@x.c", "a", "update_preimage"),
      ("a@x.c", "a2", "update_postimage"),
      ("b@x.c", "b", "delete"),
      ("c@x.c", "c", "insert")), s"paired feed: $feed")
  }

  test("scd2Merge maintains validity intervals under upsert: a changed " +
    "attribute closes the current row and opens a tiling new one, " +
    "re-applying a batch is a no-op, and history survives time travel") {
    val cat = freshCat()
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    def batch(rows: (Long, String, String)*) =
      rows.toSeq.toDF("user_id", "user_role", "email")
    val r1 = cat.scd2Merge("users_dim",
      batch((1L, "admin", "a@x.c"), (2L, "user", "b@x.c"),
        (3L, "user", "c@x.c")),
      "user_id", Seq("user_role", "email"), t1)
    assert(r1 == ((0L, 3L)), s"first batch inserts all: $r1")
    val v1 = cat.version
    // batch 2: user 1 unchanged (no-op), user 2 changes role, user 4 new
    val b2 = batch((1L, "admin", "a@x.c"), (2L, "organizer", "b@x.c"),
      (4L, "user", "d@x.c"))
    val r2 = cat.scd2Merge("users_dim", b2,
      "user_id", Seq("user_role", "email"), t2)
    assert(r2 == ((1L, 2L)), s"one close, two inserts: $r2")
    val rows = cat.read("users_dim")
      .select("user_id", "user_role", "effective_from", "effective_to",
        "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getBoolean(4)))
    // user 2: closed [t1, t2) tiling into current [t2, null)
    val u2 = rows.filter(_._1 == 2L).sortBy(_._3)
    assert(u2.toSeq == Seq((2L, "user", t1, t2, false),
      (2L, "organizer", t2, null, true)), s"user 2 history: ${u2.toSeq}")
    assert(rows.filter(_._1 == 1L).toSeq == Seq((1L, "admin", t1, null, true)),
      "an unchanged key must not be versioned")
    assert(rows.filter(_._1 == 3L).toSeq == Seq((3L, "user", t1, null, true)))
    assert(rows.filter(_._1 == 4L).toSeq == Seq((4L, "user", t2, null, true)))
    // invariant: exactly one current row per key
    assert(rows.filter(_._5).groupBy(_._1).values.forall(_.length == 1))
    // idempotency: the same batch again stages nothing, commits nothing
    val files = cat.liveFiles("users_dim")
    val vBefore = cat.version
    assert(cat.scd2Merge("users_dim", b2,
      "user_id", Seq("user_role", "email"), t2) == ((0L, 0L)))
    assert(cat.liveFiles("users_dim") == files && cat.version == vBefore,
      "idempotent re-apply must not rewrite or commit")
    // time travel: before batch 2, user 2 was current as 'user'
    val old = cat.readAt("users_dim", v1)
      .filter(col("user_id") === 2L)
      .select("user_role", "is_current").as[(String, Boolean)].collect()
    assert(old.toSeq == Seq(("user", true)))
    // duplicate and NULL keys are rejected (ambiguous dimension batch)
    intercept[IllegalArgumentException] {
      cat.scd2Merge("users_dim",
        batch((5L, "a", "x"), (5L, "b", "y")),
        "user_id", Seq("user_role", "email"), t2)
    }
    intercept[IllegalArgumentException] {
      cat.scd2Merge("users_dim",
        Seq((Option.empty[Long], "a", "x"))
          .toDF("user_id", "user_role", "email"),
        "user_id", Seq("user_role", "email"), t2)
    }
  }

  test("schema evolution: addColumn widens with NULL backfill, old-shape " +
    "producers keep working, and time travel crosses the boundary with " +
    "each snapshot's own schema") {
    import org.apache.spark.sql.types.{StringType, StructField}
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    val v1 = cat.version
    // widen: pure metadata commit, no file rewritten
    val filesBefore = cat.liveFiles("users")
    cat.transaction(_.addColumn("users", StructField("loyalty_tier",
      StringType)))
    assert(cat.liveFiles("users") == filesBefore,
      "addColumn must not touch data files")
    val widened = cat.read("users")
    assert(widened.columns.contains("loyalty_tier"))
    assert(widened.select("loyalty_tier").as[Option[String]]
      .collect().toSeq == Seq(None), "pre-evolution rows backfill NULL")
    // old-shape producer (no loyalty_tier column) still appends
    cat.append("users", user("b", "b@x.c"))
    // new-shape producer writes the column
    cat.append("users",
      Seq(("c", "L", "0123456789", "c@x.c", "h", "user",
        new java.sql.Timestamp(0L), "gold"))
        .toDF("first_name", "last_name", "phone", "email", "password_hash",
          "user_role", "created_at", "loyalty_tier"))
    val tiers = cat.read("users").select("email", "loyalty_tier")
      .as[(String, Option[String])].collect().toMap
    assert(tiers == Map("a@x.c" -> None, "b@x.c" -> None,
      "c@x.c" -> Some("gold")), s"tiers: $tiers")
    // DML through the widened schema reaches pre-evolution rows
    cat.update("users", col("email") === "a@x.c",
      Map("loyalty_tier" -> lit("silver")))
    assert(cat.read("users").filter(col("email") === "a@x.c")
      .select("loyalty_tier").as[String].collect().toSeq == Seq("silver"))
    // time travel: the v1 snapshot keeps its pre-evolution shape
    assert(!cat.readAt("users", v1).columns.contains("loyalty_tier"),
      "old snapshots read through their own schema")
    // the widened schema survives a fresh Catalog on the same root
    // (manifest-persisted, not in-memory)
    val cat2 = mkCat(cat.root)
    assert(cat2.read("users").columns.contains("loyalty_tier"))
    // guards: duplicate and non-nullable additions are rejected
    intercept[IllegalArgumentException] {
      cat.transaction(_.addColumn("users",
        StructField("LOYALTY_TIER", StringType)))
    }
    intercept[IllegalArgumentException] {
      cat.transaction(_.addColumn("users",
        StructField("must_have", StringType, nullable = false)))
    }
    // changefeed across the boundary: both images read through the TO
    // schema, so the feed is well-formed with NULL-backfilled old rows
    val feed = cat.changesBetween("users", v1, cat.version)
    assert(feed.columns.contains("loyalty_tier"))
    assert(feed.filter(col("_change_type") === "insert").count() >= 2)
  }

  test("scd2Merge close-out rewrites ONLY files holding a changed key's " +
    "current row — settled file groups survive by reference") {
    val cat = freshCat()
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val t3 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def batch(rows: (Long, String, String)*) =
      rows.toSeq.toDF("user_id", "user_role", "email")
    cat.scd2Merge("users_dim", batch((1L, "admin", "a@x.c")),
      "user_id", Seq("user_role", "email"), t1) // group 1: user 1
    cat.scd2Merge("users_dim", batch((2L, "user", "b@x.c")),
      "user_id", Seq("user_role", "email"), t2) // group 2: user 2
    val before = cat.liveFiles("users_dim").map(_._1).toSet
    // change user 2 only: group 1 (user 1's current row) must be carried
    val r = cat.scd2Merge("users_dim", batch((2L, "organizer", "b@x.c")),
      "user_id", Seq("user_role", "email"), t3)
    assert(r == ((1L, 1L)))
    val after = cat.liveFiles("users_dim").map(_._1).toSet
    assert(before.intersect(after).nonEmpty,
      s"user 1's file must survive by reference:\nbefore=$before\nafter=$after")
    assert((after -- before).nonEmpty, "user 2's file must be rewritten")
  }

  test("data skipping: readRange opens only files whose event_date stats " +
    "overlap the range, and matches the full-scan filter") {
    val cat = freshCat()
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    def batch(month: Int) = (1 to 10).map(i =>
        (f"e$month-$i", ts(f"2024-$month%02d-${i}%02d" + "T12:00:00Z")))
      .toDF("event_name", "event_date")
    (1 to 3).foreach(m => cat.append("events", batch(m)))
    val lo = java.time.Instant.parse("2024-02-01T00:00:00Z")
    val hi = java.time.Instant.parse("2024-02-29T23:59:59Z")
    val (loUs, hiUs) = (lo.getEpochSecond * 1000000L,
      hi.getEpochSecond * 1000000L)
    val (kept, total) = cat.rangeFiles("events", "event_date", loUs, hiUs)
    assert(kept.size < total,
      s"February range must skip Jan/Mar files: kept ${kept.size}/$total")
    val pruned = cat.readRange("events", "event_date", lo, hi)
      .select("event_name").as[String].collect().sorted.toSeq
    val full = cat.read("events")
      .filter(col("event_date") >= lit(ts("2024-02-01T00:00:00Z"))
        && col("event_date") <= lit(ts("2024-02-29T23:59:59Z")))
      .select("event_name").as[String].collect().sorted.toSeq
    assert(pruned == full && pruned.size == 10,
      s"pruned read must equal full-scan filter: $pruned vs $full")
    // a rewrite (update) must re-derive stats for the rewritten files:
    // move one February event into April, then the Feb range must lose it
    cat.update("events", col("event_name") === "e2-5",
      Map("event_date" -> lit(ts("2024-04-05T12:00:00Z"))))
    val afterMove = cat.readRange("events", "event_date", lo, hi)
      .select("event_name").as[String].collect().toSet
    assert(!afterMove.contains("e2-5") && afterMove.size == 9,
      s"moved row must leave the range: $afterMove")
  }

  test("CHECK constraints: enforced on append/update/merge, versioned " +
    "in the manifest, rejected when existing data violates") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c"))
    // declaring a check existing data violates must fail
    intercept[IllegalArgumentException] {
      cat.addCheck("users", "role_domain", "user_role = 'admin'")
    }
    cat.addCheck("users", "phone_len", "length(phone) = 10")
    cat.addCheck("users", "email_at", "email LIKE '%@%'")
    // a violating append aborts BEFORE commit: nothing lands
    val bad = Seq(("b", "L", "123", "b@x.c", "h", "user",
      new java.sql.Timestamp(0L)))
      .toDF("first_name", "last_name", "phone", "email", "password_hash",
        "user_role", "created_at")
    intercept[IllegalArgumentException] { cat.append("users", bad) }
    assert(cat.read("users").count() == 1)
    // a violating update aborts too
    intercept[IllegalArgumentException] {
      cat.update("users", col("email") === "a@x.c",
        Map("phone" -> lit("00")))
    }
    // a violating merge source aborts
    intercept[IllegalArgumentException] { cat.merge("users", bad, "email") }
    // valid writes still flow, and a SECOND catalog on the same root
    // sees the manifest-versioned checks (no in-memory state involved)
    cat.append("users", user("c", "c@x.c"))
    val cat2 = mkCat(cat.root)
    intercept[IllegalArgumentException] { cat2.append("users", bad) }
    assert(cat2.read("users").count() == 2)
    // NULL evaluates as pass (ANSI CHECK): a row with NULL phone lands
    val withNull = Seq(("d", "L", null.asInstanceOf[String], "d@x.c", "h",
      "user", new java.sql.Timestamp(0L)))
      .toDF("first_name", "last_name", "phone", "email", "password_hash",
        "user_role", "created_at")
    cat2.append("users", withNull)
    assert(cat2.read("users").count() == 3)
  }

  test("restoreTo rewinds state as a NEW commit: contents, maxId, and " +
    "later-created tables revert; history stays readable; ids resume " +
    "from the restored high-water mark") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c")) // v1
    cat.append("users", user("b", "b@x.c")) // v2
    cat.update("users", col("email") === "a@x.c",
      Map("user_role" -> lit("admin"))) // v3
    cat.append("events", Seq(("E", "d",
      new java.sql.Timestamp(1000L), 60, "loc", "t", 1L,
      new java.math.BigDecimal("1.00"), 10, true,
      new java.sql.Timestamp(0L)))
      .toDF("event_name", "event_description", "event_date",
        "event_time_sec", "location", "event_type", "organizer_id",
        "price", "capacity", "is_active", "created_at")) // v4
    val vNow = cat.version
    cat.restoreTo(1L) // v5
    assert(cat.version == vNow + 1, "restore must be a forward commit")
    // v1 state: one user, unmodified role, no events
    val rows = cat.read("users")
      .select("email", "user_role").as[(String, String)].collect()
    assert(rows.toSeq == Seq(("a@x.c", "user")))
    assert(cat.read("events").count() == 0,
      "table created after the restored version must revert to empty")
    // pre-restore snapshots still time-travel
    assert(cat.readAt("users", vNow).count() == 2)
    // dense ids resume from the RESTORED maxId: next user gets id 2
    assert(cat.append("users", user("c", "c@x.c")) == 2L)
    // restore to a never-committed version fails loudly
    intercept[IllegalArgumentException] { cat.restoreTo(99L) }
  }

  test("restoreTo preserves a born-after table's FULL catalog identity: " +
    "schema, id column, AND check constraints still enforce") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c")) // v1 — the restore point
    cat.cloneTable("users", "snap") // v2 — born after v1
    cat.addCheck("snap", "email_at", "email LIKE '%@%'") // v3
    cat.append("snap", user("b", "b@x.c")) // v4 — passes the check
    cat.restoreTo(1L) // snap did not exist at v1 → data rewinds to empty
    assert(cat.read("snap").count() == 0)
    // identity survives: a violating write STILL fails the check —
    // pre-round-13 the restore silently dropped the constraint set
    intercept[IllegalArgumentException] {
      cat.append("snap", user("x", "no-at-sign"))
    }
    assert(cat.read("snap").count() == 0, "failed append must not land")
    // and a conforming write still works, with ids resuming from the
    // restored (empty) high-water mark
    assert(cat.append("snap", user("c", "c@x.c")) == 1L)
  }

  test("dropColumn is a pure-metadata narrowing: the column vanishes " +
    "from reads, survives in time travel, old-shape producers still " +
    "append, and id/absent columns are protected") {
    val cat = freshCat()
    cat.append("users", user("a", "a@x.c")) // v1 (has phone)
    val vBefore = cat.version
    val filesBefore = cat.liveFiles("users").map(_._1).toSet
    cat.dropColumn("users", "phone") // v2, metadata only
    assert(cat.liveFiles("users").map(_._1).toSet == filesBefore,
      "drop must not rewrite any file")
    assert(!cat.read("users").columns.contains("phone"))
    // time travel to the pre-drop snapshot still reads the column
    assert(cat.readAt("users", vBefore).columns.contains("phone"))
    assert(cat.readAt("users", vBefore)
      .select("phone").as[String].collect()(0) == "0123456789")
    // an old-shape producer (still sending phone) appends fine: the
    // extra column is projected away by the schema-aligned write
    cat.append("users", user("b", "b@x.c"))
    assert(cat.read("users").count() == 2)
    assert(!cat.read("users").columns.contains("phone"))
    // updates rewrite through the narrowed schema
    cat.update("users", col("email") === "a@x.c",
      Map("user_role" -> lit("admin")))
    assert(cat.read("users").filter(col("user_role") === "admin")
      .count() == 1)
    // guards
    intercept[IllegalArgumentException] {
      cat.dropColumn("users", "user_id") }
    intercept[IllegalArgumentException] {
      cat.dropColumn("users", "no_such_col") }
  }

  test("replaceWhere reloads exactly the target range: out-of-range files " +
    "survive by reference, in-range rows are replaced, and a source row " +
    "outside the range aborts the whole commit") {
    val cat = freshCat()
    def ev(name: String, dayMs: Long) = Seq((name, "d",
      new java.sql.Timestamp(dayMs), 60, "loc", "t", 1L,
      new java.math.BigDecimal("1.00"), 10, true,
      new java.sql.Timestamp(0L)))
      .toDF("event_name", "event_description", "event_date",
        "event_time_sec", "location", "event_type", "organizer_id",
        "price", "capacity", "is_active", "created_at")
    val day = 86400000L
    cat.append("events", ev("d1a", 1 * day)) // file 1: day 1
    cat.append("events", ev("d2a", 2 * day)) // file 2: day 2
    cat.append("events", ev("d3a", 3 * day)) // file 3: day 3
    val before = cat.liveFiles("events").map(_._1).toSet
    // reload day 2 with two fresh rows
    val (nDel, lastId) = cat.replaceWhere("events", "event_date",
      java.time.Instant.ofEpochMilli(2 * day),
      java.time.Instant.ofEpochMilli(3 * day - 1),
      ev("d2b", 2 * day).unionAll(ev("d2c", 2 * day + 3600000L)))
    assert(nDel == 1L && lastId == 5L)
    val names = cat.read("events").select("event_name")
      .as[String].collect().sorted
    assert(names.sameElements(Array("d1a", "d2b", "d2c", "d3a")))
    // the day-1 and day-3 files are the SAME paths as before the reload
    val after = cat.liveFiles("events").map(_._1).toSet
    assert(before.intersect(after).size == 2,
      s"expected 2 untouched files carried by reference, " +
        s"got ${before.intersect(after).size}")
    // containment: a source row outside the range aborts atomically
    intercept[IllegalArgumentException] {
      cat.replaceWhere("events", "event_date",
        java.time.Instant.ofEpochMilli(2 * day),
        java.time.Instant.ofEpochMilli(3 * day - 1),
        ev("smuggled", 10 * day))
    }
    assert(cat.read("events").count() == 4, "failed reload must change nothing")
  }

  test("changefeed follower: the summary equals a direct aggregate " +
    "after every tick, and a caught-up tick neither commits nor drifts") {
    val cat = freshCat()
    def ev(id: Long, et: String, v: Double) =
      Seq((id, new java.sql.Timestamp(id), 1L, et, v, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def tick() =
      graft.streaming.ChangefeedFollower.tick(cat, "events_ingest", "qF")
    def summaryEqualsDirect(): Unit = {
      val direct = cat.read("events_ingest")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).cast("long").as("c"))
        .as[(String, Long, Long)].collect().map {
          case (k, n, c) => k -> ((n, c)) }.toMap
      val got = cat.read("events_type_summary")
        .filter(col("n_rows") > 0)
        .select("event_type", "n_rows", "total_cents")
        .as[(String, Long, Long)].collect().map {
          case (k, n, c) => k -> ((n, c)) }.toMap
      assert(got == direct, s"summary $got vs direct $direct")
    }
    cat.append("events_ingest", ev(1, "view", 1.10).unionAll(ev(2, "click", 2.25)))
    assert(tick() > 0)
    summaryEqualsDirect()
    cat.transaction { tx =>
      tx.delete("events_ingest", col("event_type") === "view")
      tx.append("events_ingest", ev(3, "click", 0.40))
      ()
    }
    cat.update("events_ingest", col("event_id") === 2L,
      Map("value" -> lit(5.00)))
    assert(tick() > 0) // two data commits folded in one catch-up tick
    summaryEqualsDirect()
    // fully-deleted type cancels to a zero row, filtered by the serving read
    assert(cat.read("events_type_summary")
      .filter(col("event_type") === "view")
      .select("n_rows").as[Long].head() == 0L)
    val vBefore = cat.version
    assert(tick() == 0L, "caught-up tick must report no progress")
    assert(cat.version == vBefore, "an empty feed must not commit")
    summaryEqualsDirect()
  }

  test("racing followers on one query name never double-apply a feed: " +
    "whatever the interleaving, the summary stays exact and the ledger " +
    "holds one watermark") {
    val root = Files.createTempDirectory("graft_store").toString
    mkCat(root).append("events_ingest",
      Seq((1L, new java.sql.Timestamp(1L), 1L, "view", 2.50, "{}"),
        (2L, new java.sql.Timestamp(2L), 1L, "click", 1.25, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        // each racer gets its OWN Catalog (own snapshot reads); losers
        // may surface ConcurrentWriteException — an accepted outcome,
        // the caller re-ticks
        try graft.streaming.ChangefeedFollower
          .tick(mkCat(root), "events_ingest", "qR"): Unit
        catch {
          case _: graft.store.Catalog.ConcurrentWriteException => ()
          case t: Throwable => errs.add(t)
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"unexpected failure: ${errs.peek()}")
    val cat = mkCat(root)
    // catch-up tick for the case where BOTH racers lost to each other
    graft.streaming.ChangefeedFollower.tick(cat, "events_ingest", "qR")
    val got = cat.read("events_type_summary")
      .select("event_type", "n_rows", "total_cents")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("click", 1L, 125L), ("view", 1L, 250L)),
      s"double-applied or lost feed: $got")
    assert(cat.read("stream_offsets").filter(col("query") === "qR")
      .select("batch_id").as[Long].collect().toSet.size >= 1)
    assert(cat.read("stream_offsets").filter(col("query") === "qR")
      .groupBy("batch_id").count().filter(col("count") > 1).isEmpty,
      "the same version must never be admitted twice")
  }

  test("ReplaceFeed fixture really transitions: v1 carries the corrupted " +
    "range, the current version does not") {
    val sf = "/root/testdata/sf0.001"
    graft.ext.ReplaceFeed.ensurePrepared(spark, sf)
    val root = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
      .getPath.stripSuffix("/") + "/graft_rw_root"
    val cat = mkCat(root)
    assert(cat.version == 2L)
    val zerosAtV1 = cat.readAt("orders_ingest", 1L)
      .filter(col("o_orderkey").between(1000, 2000) &&
        col("o_totalprice") === 0.0).count()
    assert(zerosAtV1 > 0, "v1 must actually be corrupted or the gate " +
      "row proves nothing")
    assert(cat.read("orders_ingest")
      .filter(col("o_totalprice") === 0.0).count() == 0L,
      "the reload must have replaced every corrupted row")
  }

  private def typeSummary(types: Seq[String], tag: Long) =
    types.map(t => (t, tag, tag * 100L))
      .toDF("event_type", "n_rows", "total_cents")

  test("string-keyed disjoint-domain merges reconcile: two writers " +
    "upserting different event_type ranges both commit (bounded string " +
    "stats prove disjointness); overlapping string domains conflict") {
    val root = Files.createTempDirectory("graft_store").toString
    val cat1 = mkCat(root)
    val cat2 = mkCat(root)
    // seed two file groups with separated event_type string ranges
    cat1.append("events_type_summary",
      typeSummary(Seq("alpha", "bravo", "charlie"), 1L),
      orderBy = Seq("event_type"))
    cat1.append("events_type_summary",
      typeSummary(Seq("romeo", "sierra", "tango"), 1L),
      orderBy = Seq("event_type"))
    // writer 1 merges the LOW domain [alpha, delta]; before it commits,
    // writer 2's merge in the HIGH domain [romeo, uniform] lands fully
    cat1.transaction { tx =>
      tx.merge("events_type_summary",
        typeSummary(Seq("alpha", "bravo", "delta"), 2L), "event_type")
      cat2.merge("events_type_summary",
        typeSummary(Seq("romeo", "uniform"), 3L), "event_type")
    } // commit-time reconcile: string domains provably disjoint
    val rows = cat1.read("events_type_summary")
      .select("event_type", "n_rows").as[(String, Long)].collect().toMap
    assert(Seq("alpha", "bravo", "delta").forall(rows(_) == 2L),
      s"merge A lost: $rows")
    assert(Seq("romeo", "uniform").forall(rows(_) == 3L),
      s"merge B lost: $rows")
    assert(Seq("charlie", "sierra", "tango").forall(rows(_) == 1L),
      "untouched keys must keep seed values")
    assert(rows.size == 8)
    // both sides inserted -> writer 1's ids were rebased: dense, unique
    val ids = cat1.read("events_type_summary")
      .select("summary_id").as[Long].collect().sorted
    assert(ids.sameElements(1L to 8L), s"ids not dense: ${ids.toSeq}")
    // overlapping string domains: the second committer fails loudly
    intercept[Catalog.ConcurrentWriteException] {
      cat1.transaction { tx =>
        tx.merge("events_type_summary",
          typeSummary(Seq("alpha", "sierra"), 4L), "event_type")
        cat2.merge("events_type_summary",
          typeSummary(Seq("bravo"), 5L), "event_type")
      }
    }
  }

  test("string data skipping: readRange(String) opens only files whose " +
    "bounded event_type stats overlap the probe; a truncated long key " +
    "stays findable through its outer bounds") {
    val cat = freshCat()
    cat.append("events_type_summary",
      typeSummary(Seq("alpha", "bravo", "charlie"), 1L),
      orderBy = Seq("event_type"))
    cat.append("events_type_summary",
      typeSummary(Seq("romeo", "sierra"), 1L), orderBy = Seq("event_type"))
    val longKey = "z" * 40 // past StringStatMaxLen: stats hold BOUNDS
    cat.append("events_type_summary", typeSummary(Seq(longKey), 1L),
      orderBy = Seq("event_type"))
    // low probe: only the [alpha, charlie] file opens
    val (opened, total) =
      cat.rangeFilesStr("events_type_summary", "event_type", "a", "m")
    assert(total == 3 && opened.size == 1, s"opened $opened of $total")
    assert(cat.readRange("events_type_summary", "event_type", "a", "m")
      .count() == 3)
    // point probe inside the second file's range
    val (opened2, _) =
      cat.rangeFilesStr("events_type_summary", "event_type",
        "romeo", "romeo")
    assert(opened2.size == 1, s"opened $opened2")
    // the long key's file carries truncated OUTER bounds — a probe
    // covering the key must keep the file and find the row
    assert(cat.readRange("events_type_summary", "event_type",
      "z", "z" * 42).count() == 1)
    // skipping equals the full-scan filter (correctness identity)
    val viaRange = cat.readRange("events_type_summary", "event_type",
      "b", "s").select("event_type").as[String].collect().sorted.toSeq
    val viaScan = cat.read("events_type_summary")
      .filter(col("event_type") >= "b" && col("event_type") <= "s")
      .select("event_type").as[String].collect().sorted.toSeq
    assert(viaRange == viaScan && viaRange.nonEmpty)
  }

  test("log-structured commits: bytes written per commit are bounded by " +
    "the commit's file delta, not the table's accumulated file count") {
    val cat = freshCat()
    (1 to 25).foreach(i => cat.append("users", user(s"u$i", s"u$i@x.c")))
    val logDir = java.nio.file.Paths.get(cat.root, "_log")
    def sz(name: String) = Files.size(logDir.resolve(name))
    // an early and a late single-file append write the SAME-shaped delta:
    // commit bytes never grow with the table's live file count (the
    // pre-round-14 root manifest grew by one full file list per commit)
    val early = sz("v3.json"); val late = sz("v23.json")
    assert(late <= early + 200,
      s"commit bytes grew with the table: v3=$early B -> v23=$late B")
    // checkpoints land every CheckpointInterval commits as PARQUET
    // (round 15) and carry the FULL state; the checkpoint is a plain
    // parquet table a cluster can scan — pin that it reads back with
    // one file-entry row per live file
    assert(Files.exists(logDir.resolve("v10.checkpoint.parquet")))
    assert(Files.exists(logDir.resolve("v20.checkpoint.parquet")))
    val ckDf = spark.read.parquet(
      logDir.resolve("v20.checkpoint.parquet").toString)
    assert(ckDf.filter(col("kind") === "f").count() == 20L,
      "v20 checkpoint must carry exactly the 20 live file entries")
    assert(late.toDouble < sz("v20.checkpoint.parquet"),
      "a delta must be smaller than the full-state checkpoint")
    // every retained version stays time-travelable (checkpoint + tail)
    assert(cat.readAt("users", 7L).count() == 7L)
    assert(cat.readAt("users", 25L).count() == 25L)
    // vacuum(0) retires log files below the newest checkpoint at/below
    // the retention floor; replay re-anchors on that checkpoint
    cat.vacuum("users", retainMillis = 0)
    assert(!Files.exists(logDir.resolve("v3.json")), "old deltas retired")
    assert(!Files.exists(logDir.resolve("v10.checkpoint.parquet")),
      "superseded checkpoint retired")
    assert(Files.exists(logDir.resolve("v20.checkpoint.parquet")),
      "the anchoring checkpoint must survive")
    intercept[IllegalArgumentException](cat.readAt("users", 7L))
    // a FRESH instance (cold cache) replays checkpoint + tail correctly
    // and keeps committing with dense ids
    val cat2 = mkCat(cat.root)
    assert(cat2.read("users").count() == 25L)
    assert(cat2.append("users", user("u26", "u26@x.c")) == 26L)
  }

  test("a crashed commit's tmp debris in _log is inert: reads and " +
    "reopens unaffected, fsck flags exactly the debris") {
    val cat = freshCat()
    (1 to 3).foreach(i => cat.append("users", user(s"d$i", s"d$i@x.c")))
    // simulate a writer that died between staging its delta tmp and the
    // atomic rename — the commit never happened
    val debris = java.nio.file.Paths.get(cat.root, "_log", "v99.json.tmp")
    Files.write(debris, "{\"torn".getBytes("UTF-8"))
    assert(cat.read("users").count() == 3, "tmp debris must not affect reads")
    val cold = mkCat(cat.root)
    assert(cold.read("users").count() == 3, "cold replay must skip tmp debris")
    assert(cold.append("users", user("d4", "d4@x.c")) == 4L,
      "commits must proceed past debris")
    val flagged = cold.fsck("users").collect().filter(!_.getBoolean(2))
    assert(flagged.length == 1 &&
      flagged.head.getString(3).contains("unrecognized"),
      flagged.mkString(", "))
  }

  test("legacy single-manifest layout fails loudly at construction " +
    "instead of reading back as an empty store") {
    val root = Files.createTempDirectory("graft_store_legacy")
    Files.write(root.resolve("_manifest.json"),
      """{"_version":3}""".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      mkCat(root.toString)
    }
    assert(e.getMessage.contains("legacy"), e.getMessage)
  }

}

class StoreSpec extends StoreSpecBase("local")

class StoreHadoopIOSpec extends StoreSpecBase("hadoop")
