package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.service.Portal

/** End-to-end lifecycle scenarios E1-E3 (SURVEY §3) against golden
  * expectations, encoding the §0.1 defect decisions.
  */
class PortalSpec extends SparkSuite {

  private def freshPortal(): Portal =
    Portal(spark, Files.createTempDirectory("graft_portal").toString)

  private val ts = Timestamp.valueOf("2026-09-01 18:00:00")

  test("E1: signup + login (hash pushed into plan); wrong password fails") {
    val p = freshPortal()
    val uid = p.createUser("Ada", "L", "0123456789", "ada@x.com", "s3cret1")
    assert(uid == 1L)
    val u = p.authenticateUser("ada@x.com", "s3cret1")
    assert(u.isDefined && u.get.getAs[Long]("user_id") == uid)
    assert(p.authenticateUser("ada@x.com", "wrong").isEmpty)
    // §0.1.4: role gate is case-insensitive on {admin, organizer}
    p.createUser("Org", "O", "", "org@x.com", "s3cret1", role = "Organizer")
    assert(p.isAdmin(p.getUserByEmail("org@x.com").get))
    assert(!p.isAdmin(u.get))
  }

  test("validation blocks bad signups (P7; §0.1.5 decision: it BLOCKS)") {
    val p = freshPortal()
    intercept[IllegalArgumentException](
      p.createUser("", "L", "", "a@x.c", "s3cret1"))
    intercept[IllegalArgumentException](
      p.createUser("A", "L", "", "not-an-email", "s3cret1"))
    intercept[IllegalArgumentException](
      p.createUser("A", "L", "12345", "a@x.c", "s3cret1"))
    intercept[IllegalArgumentException](
      p.createUser("A", "L", "", "a@x.c", "short"))
  }

  test("E2: listEvents hides soft-deleted; eventStats is one grouped plan") {
    val p = freshPortal()
    val org = p.createUser("Org", "O", "", "o@x.com", "s3cret1", "organizer")
    val e1 = p.addEvent("Gala", "d", ts, 64800, "Hall", "Music", org,
      BigDecimal(25))
    val e2 = p.addEvent("Free Fair", "d", ts, 36000, "Park", "Expo", org,
      BigDecimal(0))
    p.deleteEvent(e2)
    val listed = p.listEvents().collect()
    assert(listed.map(_.getAs[Long]("id")).toSeq == Seq(e1))
    // stats: one registration with successful payment on e1
    val u = p.createUser("Ada", "L", "", "ada@x.com", "s3cret1")
    val reg = p.registerUserForEvent(u, e1)
    p.recordPayment(u, reg, amount = BigDecimal(25), paymentType = "OneTime")
    val stats = p.eventStats().collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("registrations"), r.getAs[Double]("revenue"))).toMap
    assert(stats(e1) == ((1L, 25.0)))
    assert(stats(e2) == ((0L, 0.0)))
  }

  test("E3: free event pays immediately; paid stays Pending until " +
    "recordPayment; the 2-statement payment is atomic") {
    val p = freshPortal()
    val org = p.createUser("Org", "O", "", "o@x.com", "s3cret1", "organizer")
    val paid = p.addEvent("Gala", "d", ts, 64800, "Hall", "Music", org,
      BigDecimal(25))
    val free = p.addEvent("Fair", "d", ts, 36000, "Park", "Expo", org,
      BigDecimal(0))
    val u = p.createUser("Ada", "L", "", "ada@x.com", "s3cret1")

    val (regFree, payFree) = p.registerAndPay(u, free)
    assert(payFree.isDefined)
    val (regPaid, payPaid) = p.registerAndPay(u, paid)
    assert(payPaid.isEmpty)

    val regsBefore = p.getUserRegistrations(u).collect()
      .map(r => r.getAs[Long]("registration_id") ->
        r.getAs[String]("registration_status")).toMap
    assert(regsBefore(regFree) == "Success")
    assert(regsBefore(regPaid) == "Pending")
    // J3 left-preservation: unpaid registration has NULL latest status
    val nullStatus = p.getUserRegistrations(u).collect()
      .find(_.getAs[Long]("registration_id") == regPaid).get
    assert(nullStatus.isNullAt(nullStatus.fieldIndex("latest_payment_status")))

    p.recordPayment(u, regPaid, amount = BigDecimal(25),
      paymentType = "OneTime")
    val after = p.getUserRegistrations(u).collect()
      .map(r => r.getAs[Long]("registration_id") ->
        r.getAs[String]("latest_payment_status")).toMap
    assert(after(regPaid) == "Success")
  }

  test("J4: multiple registrations for one (user,event) dedup to newest") {
    val p = freshPortal()
    val org = p.createUser("O", "O", "", "o@x.com", "s3cret1", "organizer")
    val e = p.addEvent("Gala", "d", ts, 0, "Hall", "Music", org,
      BigDecimal(10))
    val u = p.createUser("A", "L", "", "a@x.com", "s3cret1")
    val r1 = p.registerUserForEvent(u, e)
    val r2 = p.registerUserForEvent(u, e)
    assert(r2 > r1)
    val regs = p.getUserRegistrations(u).collect()
    assert(regs.length == 1
      && regs(0).getAs[Long]("registration_id") == r2)
  }

  test("saved cards: encrypt/decrypt roundtrip, last4, deterministic " +
    "newest (O4 decision)") {
    val cat = new graft.store.Catalog(spark,
      Files.createTempDirectory("graft_cards").toString)
    val p = new Portal(cat)
    val u = p.createUser("A", "L", "", "a@x.com", "s3cret1")
    p.addSavedCard(u, "Ada L", "4111111111111111", "123", "12/28")
    val c2 = p.addSavedCard(u, "Ada L", "5500005555555559", "456", "01/29")
    val cards = p.getSavedCards(u).collect()
      .map(r => r.getAs[Long]("card_id") ->
        (r.getAs[String]("card_number"), r.getAs[String]("last4"))).toMap
    assert(cards(c2) == (("5500005555555559", "5559")))
    assert(cards.size == 2)
    // stored form is ciphertext, not plaintext
    val stored = cat.read("saved_cards")
      .select("card_number_encrypted").collect().map(_.getString(0))
    assert(stored.forall(s => !s.contains("4111111111111111")
      && !s.contains("5500005555555559")))
    assert(p.newestCardId(u).contains(c2))
  }
}
