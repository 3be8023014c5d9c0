package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.store.Catalog

/** COW store semantics (SURVEY §7.3/§7.4): dense id assignment, update
  * isolation, atomic multi-table commit.
  */
class StoreSpec extends SparkSuite {
  import spark.implicits._

  private def freshCat(): Catalog =
    new Catalog(spark, Files.createTempDirectory("graft_store").toString)

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
}
