package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.ShingleGen

/** The native shingle generator must be value-equal to the declarative
  * form it replaces (explode . array_distinct . transform . sequence). */
class ShingleGenSpec extends SparkSuite {
  import spark.implicits._

  private def declarative(k: Int) = {
    val w = filter(split(col("text"), "\\s+"), t => t =!= "")
    explode(array_distinct(transform(
      sequence(lit(1), greatest(size(w) - (k - 1), lit(0))),
      i => concat_ws(" ", slice(w, i, lit(k))))))
  }

  test("generator equals the declarative shingle pipeline on the fixture " +
    "corpus, k = 3 and k = 5, including multiplicity after dedup") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    for (k <- Seq(3, 5)) {
      val gen = docs.select(col("doc_id"),
          ShingleGen.shingle_gen(spark, col("text"), k).as("sh"))
        .as[(Long, String)].collect().toVector
      val dec = docs
        .filter(size(filter(split(col("text"), "\\s+"),
          t => t =!= "")) >= k)
        .select(col("doc_id"), declarative(k).as("sh"))
        .as[(Long, String)].collect().toVector
      // sets AND sizes agree (both are per-doc distinct)
      assert(gen.size == dec.size, s"k=$k: ${gen.size} vs ${dec.size}")
      assert(gen.toSet == dec.toSet,
        s"k=$k diff: ${(gen.toSet diff dec.toSet).take(3)} / " +
          s"${(dec.toSet diff gen.toSet).take(3)}")
      assert(gen.nonEmpty)
    }
  }

  test("edge cases: short docs, repeated shingles, mixed whitespace, " +
    "nulls, empty strings") {
    def shs(t: String, k: Int): Seq[String] =
      ShingleGen.shingles(UTF8String.fromString(t), k)
        .map(_.getUTF8String(0).toString).toSeq
    assert(shs("a b", 3) == Nil)           // fewer than k tokens
    assert(shs("", 3) == Nil)
    assert(shs("   ", 3) == Nil)
    assert(shs("a b c", 3) == Seq("a b c"))
    assert(shs("a b c d", 3) == Seq("a b c", "b c d"))
    // duplicates collapse to first occurrence
    assert(shs("x y x y x y x", 2) == Seq("x y", "y x"))
    // any \s run is one separator, exactly like split("\\s+")
    assert(shs("a\tb\n c\r\nd", 3) == Seq("a b c", "b c d"))
    // k = 1 is plain distinct tokens
    assert(shs("p q p", 1) == Seq("p", "q"))
    // null input emits nothing through the expression path
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "a b c"))
      .toDF("id", "text")
    val got = df.select(col("id"),
      ShingleGen.shingle_gen(spark, col("text"), 3).as("sh"))
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "a b c")))
  }

  test("iterator contract: next() past exhaustion throws " +
    "NoSuchElementException, never a silent null row") {
    val it = ShingleGen.shingles(UTF8String.fromString("a b c"), 3)
    assert(it.hasNext)
    assert(it.next().getUTF8String(0).toString == "a b c")
    assert(!it.hasNext)
    intercept[NoSuchElementException] { it.next() }
    // an empty iterator throws immediately
    intercept[NoSuchElementException] {
      ShingleGen.shingles(UTF8String.fromString("a"), 2).next()
    }
  }
}
