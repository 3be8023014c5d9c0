package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, EventsOps, Multimodal, Similarity, TextAnalysis}
import graft.functions.RollingHash

/** Behavior specs for the [EXT] operator families. The DuckDB gate checks
  * cross-engine value equality; these pin the algorithmic properties the
  * SQL oracle cannot see (recall, error bounds, partition invariance).
  */
class ExtSpec extends SparkSuite {
  import spark.implicits._

  // ---- dedup ----

  test("exact dedup groups identical texts under one fingerprint") {
    val df = Seq(
      (1L, "aa bb cc"), (2L, "aa bb cc"), (3L, "zz")
    ).toDF("doc_id", "text").cache()
    df.createOrReplaceTempView("tmp_docs")
    val out = df.groupBy(md5(col("text")).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out(1L) == 2 && out(3L) == 1)
  }

  test("minhash-LSH pipeline reports jaccard >= 0.6 pairs only, " +
    "symmetric-free (a < b)") {
    val out = Dedup.minhashLsh.fn(spark, sf).collect()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.6)
    }
  }

  test("simhash: signatures are 64-bit strings; identical docs collide") {
    val out = Dedup.simhash.fn(spark, sf)
    val sigs = out.collect()
    assert(sigs.forall(_.getString(1).length == 64))
    assert(sigs.forall(_.getString(1).forall(c => c == '0' || c == '1')))
    // identical text -> identical simhash (join docs with same text)
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text")
    val joined = docs.as("x").join(docs.as("y"),
        col("x.text") === col("y.text") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).collect()
    if (joined.nonEmpty) {
      val sigMap = sigs.map(r => r.getLong(0) -> r.getString(1)).toMap
      joined.foreach(p => assert(sigMap(p.getLong(0)) == sigMap(p.getLong(1))))
    }
  }

  test("ngram jaccard join emits only >= 0.5 pairs with a < b") {
    val out = Dedup.ngramJaccard.fn(spark, sf).collect()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1) && r.getDouble(2) >= 0.5)
    }
  }

  // ---- similarity ----

  test("brute-force top-k: ranks are 1..10 per probe, cosine descending") {
    val rows = Similarity.topkBrute.fn(spark, sf).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.size == 5)
    byProbe.values.foreach { rs =>
      val ranked = rs.sortBy(_.getLong(2))
      assert(ranked.map(_.getLong(2)).sameElements(1L to 10L))
      val cos = ranked.map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (x, y) => x >= y })
    }
  }

  test("ANN-LSH results are a subset of correct cosines; every returned " +
    "neighbor's cosine matches brute-force scoring") {
    val brute = Similarity.topkBrute.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val ann = Similarity.annLsh.fn(spark, sf).collect()
    // ANN returns fewer/other ranks, but any (probe, neighbor) it shares
    // with brute force must carry the identical cosine
    ann.foreach { r =>
      brute.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(math.abs(c - r.getDouble(3)) < 1e-12)
      }
    }
  }

  // ---- text ----

  test("rolling hash matches the reference fold ('abc' -> 96354) and the " +
    "codegen path agrees with interpreted eval") {
    assert(RollingHash.hash("abc") == 96354L)
    assert(RollingHash.hash("") == 0L)
    val viaSpark = Seq("abc", "", "hello world")
      .toDF("text")
      .select(RollingHash.rolling_hash(spark, col("text")))
      .collect().map(_.getLong(0))
    assert(viaSpark.sameElements(
      Array(96354L, 0L, RollingHash.hash("hello world"))))
  }

  test("langid: marker-heavy English text scores en; empty scores und") {
    val df = Seq((1L, "the cat and the dog of a house"), (2L, "xyzzy plugh"))
      .toDF("doc_id", "text")
    df.write.mode("overwrite").parquet("/tmp/graft_test_docs/documents.parquet")
    val out = TextAnalysis.langId.fn(spark, "/tmp/graft_test_docs")
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(out(1L) == "en" && out(2L) == "und")
  }

  test("approx distinct is within 10% of exact") {
    val approx = EventsOps.approxDistinct.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.core.Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1, n / 10))
    }
  }

  // ---- multimodal ----

  test("decode-features stub is deterministic and partition-invariant") {
    val a = Multimodal.decodeFeatures.fn(spark, sf).collect()
    val b = Multimodal.decodeFeatures.fn(spark, sf).repartition(7)
      .orderBy("doc_id").collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
  }

  test("frame sampling caps at 8 frames and keys are unique") {
    val rows = Multimodal.frameSample.fn(spark, sf).collect()
    val perDoc = rows.groupBy(_.getLong(0))
    assert(perDoc.values.forall(_.length <= 8))
    assert(rows.map(_.getString(2)).distinct.length == rows.length)
  }

  // ---- streaming ----

  test("streaming hourly aggregate equals the batch aggregate") {
    val streamed = graft.streaming.EventsStream.hourlyByType(spark, sf)
      .collect().map(_.toString).sorted
    val batch = EventsOps.windowHourly.fn(spark, sf)
      .collect().map(_.toString).sorted
    assert(streamed.sameElements(batch))
  }
}
