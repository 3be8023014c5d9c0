package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.store.{Catalog, StoreIO}

/** Randomized concurrent-writer fuzz over the OCC reconcile path: two
  * writer threads (separate Catalog instances on one root) interleave
  * appends and email-keyed updates/deletes on the SAME table through the
  * retried single-op conveniences. Step-equivalence is impossible under
  * interleaving, so the check is invariant-based after the dust settles:
  *
  *  - no lost or duplicated ids: user_id is exactly the dense 1..maxId
  *    with deleted ids absent, each surviving id exactly once;
  *  - no lost or duplicated payloads: every appended email that was not
  *    deleted is present exactly once (commit-time id REBASE must move
  *    ids, never drop or copy rows);
  *  - every update landed: a role update that returned is visible unless
  *    its row was later deleted.
  */
class StoreRaceFuzzSpec extends SparkSuite {
  import spark.implicits._

  /** Round-18 IO axis for the OCC races: `mkCat` binds a Catalog to
    * the named [[StoreIO]] impl; the mixed-impl race below pins that
    * two processes on one root need NOT agree on the binding (both
    * impls speak the identical on-disk protocol). */
  private def mkCat(root: String, ioMode: String = "local"): Catalog =
    ioMode match {
      case "hadoop" => new Catalog(spark, root, StoreIO.hadoop(spark))
      case "object" =>
        new Catalog(spark, root, new graft.store.ObjectStoreSemanticsIO)
      case _ => new Catalog(spark, root)
    }

  private def userDf(email: String) =
    Seq(("F", "L", "0123456789", email, "h", "user",
      new java.sql.Timestamp(0L)))
      .toDF("first_name", "last_name", "phone", "email", "password_hash",
        "user_role", "created_at")

  for (lockMode <- Seq("file", "lease"))
  test(s"two racing writers on one table [commitLock=$lockMode]: dense " +
    "ids, no lost rows, no duplicates, all committed deletes and " +
    "updates visible") {
    spark.conf.set("spark.graft.store.commitLock", lockMode)
    try raceOneTable()
    finally spark.conf.unset("spark.graft.store.commitLock")
  }

  private def raceOneTable(): Unit = {
    val root = Files.createTempDirectory("graft_race").toString
    val perWriter = 12
    val appended = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
    val deleted = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
    val updated = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

    def writer(wid: Int): Runnable = () => {
      val rnd = new Random(1000 + wid)
      // mixed-impl race: writer 0 commits through java.nio, writer 1
      // through Hadoop-FS — the on-disk protocol is the contract
      val cat = mkCat(root, if (wid % 2 == 1) "hadoop" else "local")
      // (the merge race below pairs java.nio with the OBJECT-STORE
      // semantics binding, so the no-atomic-rename publish also runs
      // under genuine two-writer contention)
      start.await()
      try {
        for (i <- 1 to perWriter) {
          rnd.nextInt(5) match {
            case 0 | 1 =>
              val em = s"w$wid-$i@x.c"
              cat.append("users", userDf(em))
              appended.add(em)
            case 4 =>
              // round 18: selective small-file fold racing the other
              // writer's appends/updates/deletes — content-invariant,
              // so NO bookkeeping; OCC must reconcile it against
              // disjoint concurrent commits and retry-recompute when
              // the fold's victims were concurrently rewritten
              cat.compactSmall("users", smallRows = 3L,
                targetRows = 9L): Unit
            case 2 =>
              // delete one of THIS writer's earlier rows (no cross-thread
              // coordination needed for the invariant bookkeeping)
              val mine = appended.toArray(Array.empty[String])
                .filter(_.startsWith(s"w$wid-")).filterNot(deleted.contains)
              if (mine.nonEmpty) {
                val em = mine(rnd.nextInt(mine.length))
                cat.delete("users", col("email") === em)
                deleted.add(em)
              } else {
                val em = s"w$wid-$i@x.c"
                cat.append("users", userDf(em)); appended.add(em)
              }
            case 3 =>
              val mine = appended.toArray(Array.empty[String])
                .filter(_.startsWith(s"w$wid-")).filterNot(deleted.contains)
              if (mine.nonEmpty) {
                val em = mine(rnd.nextInt(mine.length))
                cat.update("users", col("email") === em,
                  Map("user_role" -> lit(s"r$wid")))
                updated.add(em)
              } else {
                val em = s"w$wid-$i@x.c"
                cat.append("users", userDf(em)); appended.add(em)
              }
          }
        }
      } catch { case t: Throwable => errors.add(t) }
    }

    pool.submit(writer(1)); pool.submit(writer(2))
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "writers hung")
    assert(errors.isEmpty, s"writer threw: ${errors.peek()}")

    val cat = mkCat(root)
    val rows = cat.read("users").select("user_id", "email", "user_role")
      .as[(Long, String, String)].collect()
    val ids = rows.map(_._1).sorted
    // ids unique
    assert(ids.distinct.length == ids.length, s"duplicate ids: ${ids.toSeq}")
    // ids dense up to maxId modulo deletions: every id in 1..maxId was
    // assigned exactly once, so survivors + deletions partition the range
    val expectedSurvivors =
      appended.toArray(Array.empty[String]).toSet --
        deleted.toArray(Array.empty[String]).toSet
    assert(rows.map(_._2).toSet == expectedSurvivors,
      s"lost/extra rows: got ${rows.map(_._2).toSet.size} vs " +
        s"${expectedSurvivors.size} expected")
    assert(rows.map(_._2).distinct.length == rows.length,
      "a rebase duplicated a payload row")
    assert(ids.length == expectedSurvivors.size)
    assert(cat.maxId("users") >= appended.size(),
      "maxId below total appended count")
    // updates on surviving rows are visible (each writer used a distinct
    // role tag; a row updated by its owner must not read 'user')
    val byEmail = rows.map(r => r._2 -> r._3).toMap
    updated.toArray(Array.empty[String]).filter(expectedSurvivors.contains)
      .foreach { em =>
        assert(byEmail(em) != "user", s"update lost on $em")
      }
  }

  test("two racing writers mixing MERGE/update/delete on disjoint key " +
    "domains: every op lands per-key last-writer-exact (round-13 " +
    "keyed-upsert reconcile), ids unique, no row lost or duplicated") {
    val root = Files.createTempDirectory("graft_merge_race").toString
    val rounds = 6
    // writer w upserts only keys in its own domain: w1 -> [1, 60],
    // w2 -> [1001, 1060]; o_orderkey is a manifest stats column, so the
    // domains are provably disjoint and both merges should reconcile
    // instead of serializing through retries
    def domain(wid: Int): Long = if (wid == 1) 0L else 1000L
    val lastValue = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    // expected o_totalprice per key: star merges RESET it to the batch
    // value (1.0); target-reading expr merges FOLD it (+1.0 per hit) —
    // round 17, pinning the incremental-aggregate merge under the
    // disjoint-domain OCC reconcile (not just retry)
    val lastPrice = new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Double]()
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

    def batch(keys: Seq[Long], status: String) =
      keys.map(k => (k, k * 10, status, 1.0,
        new java.sql.Timestamp(0L), "P"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")

    def writer(wid: Int): Runnable = () => {
      val rnd = new Random(sys.env.get("GRAFT_FUZZ_SEED")
        .map(_.toLong + 100 + wid).getOrElse(7000L + wid))
      // mixed-impl merge race: one writer java.nio, one the
      // object-store-semantics binding — conditional-create publishes
      // under contention (the fence path), not just solo
      val cat = mkCat(root, if (wid % 2 == 1) "object" else "local")
      // this writer's keys currently in the table (domains are disjoint,
      // so single-thread bookkeeping is exact)
      val mine = scala.collection.mutable.Set[Long]()
      start.await()
      try {
        for (i <- 1 to rounds) {
          val status = s"w$wid-r$i"
          rnd.nextInt(4) match {
            case 0 | 1 => // keyed upsert: repeats update, fresh inserts;
              // half the draws run the round-17 TARGET-READING partial
              // merge (status from the source, totalprice folds t+s)
              val keys = Seq.fill(1 + rnd.nextInt(5))(
                domain(wid) + 1 + rnd.nextInt(60)).distinct.map(_.toLong)
              if (rnd.nextBoolean()) {
                cat.merge("orders_ingest", batch(keys, status), "o_orderkey")
                keys.foreach { k =>
                  lastValue.put(k, status); lastPrice.put(k, 1.0); mine += k
                }
              } else {
                cat.merge("orders_ingest", batch(keys, status), "o_orderkey",
                  matchedCols = Some(Map("o_orderstatus" -> "o_orderstatus")),
                  matchedExprs = Map("o_totalprice" ->
                    "t.o_totalprice + s.o_totalprice"))
                keys.foreach { k =>
                  lastValue.put(k, status)
                  if (mine(k)) lastPrice.put(k, lastPrice.get(k) + 1.0)
                  else { lastPrice.put(k, 1.0); mine += k }
                }
              }
            case 2 => // pinned update on one owned key (hit-file rewrite
              // racing the other writer's merges through reconcile)
              if (mine.nonEmpty) {
                val k = mine.toVector(rnd.nextInt(mine.size))
                cat.update("orders_ingest", col("o_orderkey") === k,
                  Map("o_orderstatus" -> lit(status)))
                lastValue.put(k, status)
              } else {
                val k = domain(wid) + 1 + rnd.nextInt(60)
                cat.merge("orders_ingest", batch(Seq(k), status),
                  "o_orderkey")
                lastValue.put(k, status); lastPrice.put(k, 1.0); mine += k
              }
            case 3 => // delete one owned key (a later merge re-inserts it)
              if (mine.nonEmpty) {
                val k = mine.toVector(rnd.nextInt(mine.size))
                cat.delete("orders_ingest", col("o_orderkey") === k)
                lastValue.remove(k); lastPrice.remove(k); mine -= k
              } else {
                val k = domain(wid) + 1 + rnd.nextInt(60)
                cat.merge("orders_ingest", batch(Seq(k), status),
                  "o_orderkey")
                lastValue.put(k, status); lastPrice.put(k, 1.0); mine += k
              }
          }
        }
      } catch { case t: Throwable => errors.add(t) }
    }

    pool.submit(writer(1)); pool.submit(writer(2))
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "writers hung")
    assert(errors.isEmpty, s"merge writer threw: ${errors.peek()}")

    val cat = mkCat(root)
    val rows = cat.read("orders_ingest")
      .select("o_orderkey", "o_orderstatus", "ingest_id", "o_totalprice")
      .as[(Long, String, Long, Double)].collect()
    import scala.jdk.CollectionConverters._
    val expect = lastValue.asScala.toMap
    assert(rows.map(_._1).toSet == expect.keySet,
      s"row set diverged: got ${rows.length} keys, " +
        s"expected ${expect.size}")
    assert(rows.length == expect.size,
      "a key appears more than once (lost-update anomaly)")
    rows.foreach { case (k, v, _, _) =>
      assert(v == expect(k), s"key $k: got '$v', last merge was " +
        s"'${expect(k)}' (lost update)")
    }
    // the folded totalprice is per-key last-writer-exact too: star
    // merges reset it, expr merges accumulated +1.0 per matched hit —
    // a reconcile that replayed raw source values instead of the
    // staged joined images would lose the fold
    val priceExpect = lastPrice.asScala.toMap
    rows.foreach { case (k, _, _, p) =>
      assert(p == priceExpect(k),
        s"key $k: totalprice $p, model ${priceExpect(k)} (fold lost)")
    }
    // id rebases under reconcile must never clone or collide an id
    // (deletes make gaps legal; uniqueness and the high-water bound are
    // the surviving invariants)
    val ids = rows.map(_._3)
    assert(ids.distinct.length == ids.length,
      s"duplicate ids after reconcile rebase: ${ids.sorted.toSeq}")
    assert(ids.isEmpty || ids.max <= cat.maxId("orders_ingest"),
      "an id escaped the recorded high-water mark")
  }

  test("ADD CONSTRAINT reconciles against a concurrent CONFORMING " +
    "append (both land); a VIOLATING concurrent append fails the " +
    "constraint, not the data") {
    val root = Files.createTempDirectory("graft_check_race").toString
    val catA = mkCat(root)
    val catB = mkCat(root)
    catA.append("users", userDf("seed@x.c"))
    // conforming race: B's append commits BETWEEN A's snapshot and A's
    // validate-and-swap — the round-15 reconcile re-validates exactly
    // B's added file against the new constraint and lands both
    @volatile var sneaked = false
    catA.transaction { tx =>
      tx.addCheck("users", "email_at", "email LIKE '%@%'")
      if (!sneaked) { catB.append("users", userDf("mid@x.c")); sneaked = true }
    }
    assert(catA.read("users").count() == 2,
      "the concurrent conforming append must survive the reconcile")
    intercept[IllegalArgumentException] {
      catA.append("users", userDf("no-at-sign"))
    }
    // violating race: the constraint must FAIL (conflict), the already-
    // committed data must stand, and the check must NOT be installed
    @volatile var sneaked2 = false
    val ex = intercept[Catalog.ConcurrentWriteException] {
      catA.transaction { tx =>
        tx.addCheck("users", "no_evil", "email NOT LIKE '%evil%'")
        if (!sneaked2) {
          catB.append("users", userDf("evil@x.c"))
          sneaked2 = true
        }
      }
    }
    assert(ex.getMessage.contains("violate the new check"), ex.getMessage)
    assert(catA.read("users").filter(col("email") === "evil@x.c").count()
      == 1, "the committed concurrent row must stand")
    // the failed constraint is not installed: a violating append works
    catA.append("users", userDf("evil2@x.c"))
    assert(catA.read("users").count() == 4)
  }
}
