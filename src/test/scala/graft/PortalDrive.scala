package graft

import java.sql.Timestamp

import graft.service.Portal

/** Manual end-to-end drive of the Portal API (verification harness, not a
  * test): exercises E1-E3 through the public service surface and prints
  * observable outcomes. Run: sbt "Test/runMain graft.PortalDrive"
  */
object PortalDrive {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(4)
    val p = Portal(spark,
      java.nio.file.Files.createTempDirectory("drive").toString)
    val org = p.createUser("Org", "Anizer", "0123456789", "org@ex.com",
      "s3cret1", "Organizer")
    val uid = p.createUser("Ada", "Lovelace", "0123456789", "ada@ex.com",
      "s3cret1")
    println("AUTH-OK=" + p.authenticateUser("ada@ex.com", "s3cret1").isDefined)
    println("AUTH-BAD=" + p.authenticateUser("ada@ex.com", "nope").isDefined)
    val gala = p.addEvent("Gala", "big",
      Timestamp.valueOf("2026-09-01 18:00:00"), 64800, "Hall", "Music", org,
      BigDecimal(25))
    val fair = p.addEvent("Fair", "free",
      Timestamp.valueOf("2026-09-02 10:00:00"), 36000, "Park", "Expo", org,
      BigDecimal(0))
    println("LISTED=" + p.listEvents().collect()
      .map(_.getAs[String]("title")).mkString(","))
    val (_, payF) = p.registerAndPay(uid, fair)
    val (regG, payG) = p.registerAndPay(uid, gala)
    println("FREE-AUTOPAID=" + payF.isDefined
      + " PAID-PENDING=" + payG.isEmpty)
    p.addSavedCard(uid, "Ada L", "4111111111111111", "123", "12/28")
    val card = p.newestCardId(uid)
    p.recordPayment(uid, regG, card, BigDecimal(25), "Saved")
    p.getUserRegistrations(uid).show(false)
    p.eventStats().show(false)
    p.getSavedCards(uid).select("card_id", "last4", "expiry_date").show(false)
    p.deleteEvent(gala)
    println("AFTER-DELETE=" + p.listEvents().collect()
      .map(_.getAs[String]("title")).mkString(","))
    val regG2 = p.registerUserForEvent(uid, gala)
    println("DEDUP-NEWEST=" + (p.getUserRegistrations(uid).collect()
      .filter(_.getAs[Long]("event_id") == gala)
      .map(_.getAs[Long]("registration_id")).toSeq == Seq(regG2)))
    try {
      p.createUser("X", "Y", "12", "x@y.z", "s3cret1")
      println("PHONE-CHECK=missed")
    } catch {
      case _: IllegalArgumentException => println("PHONE-CHECK=blocked")
    }
    println("DRIVE-DONE")
    spark.stop()
  }
}
