package graft

import org.apache.spark.sql.functions._

/** Margin-based bitext mining verified against a scalar replay: best /
  * runner-up English neighbor per non-English probe by exact cosine,
  * absolute margin, (margin desc, src_id) top-20.
  */
class BitextSpec extends SparkSuite {

  test("ivf occupancy audit equals a local argmax-assignment census " +
    "and conserves the corpus") {
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding")
          .cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]) = {
      var dab = 0.0; var da = 0.0; var db = 0.0
      (0 until 64).foreach { i =>
        dab += a(i) * b(i); da += a(i) * a(i); db += b(i) * b(i)
      }
      dab / (math.sqrt(da) * math.sqrt(db))
    }
    val cents = vecs.filter(_._1 < 32)
    val localOcc = vecs.map { case (_, e) =>
      cents.map { case (cid, ce) => (cid, cos(e, ce)) }
        .minBy { case (cid, c) => (-c, cid) }._1
    }.groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    val got = graft.ext.IvfSearch.ivfStats.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(r => r._1 -> r._2).toMap == localOcc)
    assert(got.map(_._2).sum == vecs.length.toLong, "census conserves")
    got.foreach { case (cell, n, ppm) =>
      assert(cell >= 0 && cell < 32 && n > 0)
      assert(ppm == n * 1000000L / vecs.length)
    }
  }

  test("mined pairs equal a local best/runner-up cosine replay") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    def cos(a: Array[Double], b: Array[Double]) = {
      var dab = 0.0; var da = 0.0; var db = 0.0
      (0 until 64).foreach { i =>
        dab += a(i) * b(i); da += a(i) * a(i); db += b(i) * b(i)
      }
      r6(dab / (math.sqrt(da) * math.sqrt(db)))
    }
    val enSide = vecs.filter { case (id, _) => docs(id) == "en" }
    val expected = vecs
      .filter { case (id, _) => docs(id) != "en" && id < 100 }
      .map { case (sid, pe) =>
        val ranked = enSide
          .map { case (eid, e) => (eid, cos(pe, e)) }
          .sortBy { case (eid, c) => (-c, eid) }
        val (e1, c1) = ranked(0)
        val (_, c2) = ranked(1)
        (sid, docs(sid), e1, c1, r6(c1 - c2))
      }
      .sortBy { case (sid, _, _, _, m) => (-m, sid) }.take(20).toSeq
    val got = graft.ext.Similarity.bitextMine.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"spark $got vs local $expected")
    // every mined pair really is cross-lingual with a positive best cos
    got.foreach { case (sid, lang, eid, c1, _) =>
      assert(lang != "en" && docs(eid) == "en")
      assert(c1 >= -1.0 && c1 <= 1.0)
    }
  }
}
