package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMin

/** Count-Min sketch properties the DuckDB gate cannot see: partition
  * invariance of the finished counter matrix, the never-undercount
  * guarantee across the WHOLE vocabulary (the gate row audits only the
  * top 30), and that the row sums all equal N (each token lands exactly
  * once per row — the invariant the gate's no-extra-pass N derivation
  * relies on).
  */
class CountMinSpec extends SparkSuite {

  private def toksDf = graft.core.Tables.documents(spark, sf)
    .select(explode(filter(split(col("text"), "\\s+"),
      t => t =!= "")).as("t"))

  test("sketch is partition-invariant: 1-partition and 32-partition " +
    "builds produce the identical counter matrix") {
    val a = toksDf.repartition(1)
      .agg(CountMin.count_min(spark, col("t"))).collect()(0).getSeq[Long](0)
    val b = toksDf.repartition(32, col("t"))
      .agg(CountMin.count_min(spark, col("t"))).collect()(0).getSeq[Long](0)
    assert(a == b, "counter matrices differ across partitionings")
  }

  test("estimates never undercount any vocabulary token, and every row " +
    "of the matrix sums to N") {
    val sk = toksDf.agg(CountMin.count_min(spark, col("t")).as("cms"))
    val W = CountMin.DefaultWidth
    val n = toksDf.count()
    val rowSums = sk.select((0 until CountMin.DefaultDepth).map(d =>
      aggregate(slice(col("cms"), d * W + 1, W), lit(0L), (a, x) => a + x)
        .as(s"r$d")): _*).collect()(0)
    (0 until CountMin.DefaultDepth).foreach(d =>
      assert(rowSums.getLong(d) == n, s"row $d sums to ${rowSums.getLong(d)}"))
    val under = toksDf.groupBy("t").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sk))
      .filter(CountMin.cms_estimate(spark, col("cms"), col("t"))
        < col("exact"))
      .count()
    assert(under == 0L, s"$under tokens undercounted — CMS guarantee broken")
  }

  // ---- q-digest ----

  import graft.functions.QDigest

  private def centsDf = graft.core.Tables.events(spark, sf)
    .select((col("value").cast("decimal(10,2)") * 100).cast("long").as("c"))

  test("qdigest: rank bound holds under BOTH 1-partition and " +
    "32-partition merge trees, counts conserve n, and the summary " +
    "stays O(k)") {
    val vals = centsDf.collect().map(_.getLong(0)).sorted
    val n = vals.length.toLong
    val epsN = QDigest.DefaultLogU.toDouble / QDigest.DefaultK * n
    Seq(1, 32).foreach { parts =>
      val flat = QDigest.flatOf(centsDf.repartition(parts)
        .agg(QDigest.qdigest(spark, col("c"))).collect()(0).get(0))
      assert(flat.length / 2 <= 3 * QDigest.DefaultK,
        s"summary has ${flat.length / 2} entries at $parts partitions")
      assert(flat.grouped(2).map(_(1)).sum == n,
        "sketch counts must conserve n")
      Seq(0.25, 0.5, 0.75, 0.9, 0.99).foreach { q =>
        val est = QDigest.estimate(flat, q, QDigest.DefaultLogU)
        val lo = vals.count(_ < est).toLong
        val hi = vals.count(_ <= est).toLong
        val target = math.ceil(q * n)
        val dist = math.max(0.0, math.max(lo + 1 - target, target - hi))
        assert(dist <= epsN,
          s"q=$q at $parts parts: est $est rank [$lo,$hi] vs target " +
            s"$target exceeds eps*n=$epsN")
      }
    }
  }

  test("cms_estimate rejects a sketch with mismatched geometry loudly " +
    "instead of probing wrong cells") {
    import spark.implicits._
    // a "sketch" array of the wrong length must fail with the geometry
    // message, not ArrayIndexOutOfBounds or a silent wrong estimate
    val truncated = Seq(Seq.fill(16)(0L)).toDF("cms")
      .withColumn("t", org.apache.spark.sql.functions.lit("x"))
    val e = intercept[Exception] {
      truncated.select(
        graft.functions.CountMin.cms_estimate(spark, col("cms"), col("t")))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("geometry mismatch")),
      s"expected the geometry guard, got: $e")
  }

  test("qdigest recovers the exact median of a planted uniform ramp " +
    "within the deterministic bound") {
    import spark.implicits._
    val n = 10000
    val df = (0 until n).map(_.toLong).toDF("c")
    val flat = QDigest.flatOf(
      df.agg(QDigest.qdigest(spark, col("c"))).collect()(0).get(0))
    val est = QDigest.estimate(flat, 0.5, QDigest.DefaultLogU)
    val epsN = QDigest.DefaultLogU.toDouble / QDigest.DefaultK * n
    assert(math.abs(est - n / 2.0) <= epsN + 1,
      s"median estimate $est vs ${n / 2} (eps*n=$epsN)")
  }
}
