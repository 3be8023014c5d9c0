package graft

import org.apache.spark.sql.functions._

import graft.ext.BucketRank

/** Randomized (seeded) equivalence pins for the distributed-rank
  * helpers that now underpin pareto/rfm/skew/percentile rows:
  * rankAndExclSum must equal the single-window row_number/cumsum on
  * arbitrary data under every bucket configuration, and ntileFromRank
  * must equal ANSI ntile for every (n, rank).
  */
class BucketRankSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def scenario(n: Int, valueRange: Int): Seq[(Long, Long, Long)] =
    (0 until n).map { i =>
      (rnd.nextInt(valueRange).toLong, // value (with heavy ties)
        rnd.nextLong().abs % 100000L + i * 100000L, // unique tie id
        rnd.nextInt(1000).toLong) // weight
    }

  test("rankAndExclSum equals the global-window form on random data, " +
    "asc and desc, with and without tie chunking") {
    for ((n, vr, desc, chunked) <- Seq((200, 5, false, true),
        (200, 5, true, true), (150, 40, true, false),
        (1, 1, false, false), (17, 1, false, true))) {
      val rows = scenario(n, vr)
      val df = rows.toDF("v", "tie", "w")
      val b2 = if (chunked) (col("tie") / 25000L).cast("long") else lit(0L)
      val got = BucketRank.rankAndExclSum(df,
          b1 = col("v"), b1Desc = desc, b2 = b2,
          order = Seq(col("tie")), weight = Some(col("w")))
        .select("v", "tie", "w", "rk", "excl").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      // local single-window replay: sort by (value dir, tie), rank and
      // exclusive running sum
      val sorted = rows.sortBy { case (v, t, _) =>
        (if (desc) -v else v, t) }
      var cum = 0L
      val expect = sorted.zipWithIndex.map { case ((v, t, w), i) =>
        val e = (v, t, w, (i + 1).toLong, cum); cum += w; e
      }
      assert(got.sortBy(r => (r._4)).toSeq == expect.toSeq,
        s"mismatch at n=$n vr=$vr desc=$desc chunked=$chunked")
    }
  }

  test("ntileFromRank equals ANSI ntile(5) for every rank at many n, " +
    "including n < k and exact multiples") {
    for (n <- Seq(1, 3, 4, 5, 6, 7, 10, 23, 100, 101, 104)) {
      val df = (1 to n).map(_.toLong).toDF("rk")
        .withColumn("n", lit(n.toLong))
      val got = df.select(col("rk"),
          BucketRank.ntileFromRank(col("rk"), col("n"), 5).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // ANSI ntile: first (n mod 5) groups take (n div 5 + 1) rows
      val q = n / 5; val rem = n % 5
      (1 to n).foreach { rk =>
        val expect =
          if (q == 0) rk.toLong // degenerate n < k: one row per group
          else if (rk <= rem * (q + 1)) ((rk - 1) / (q + 1) + 1).toLong
          else (rem + (rk - rem * (q + 1) - 1) / q + 1).toLong
        assert(got(rk.toLong) == expect, s"n=$n rk=$rk")
      }
    }
  }

  test("lowerPercentiles on EMPTY input fails loudly instead of " +
    "returning an all-NULL row") {
    val empty = Seq.empty[Long].toDF("v")
    val ex = intercept[Exception] {
      BucketRank.lowerPercentiles(empty, "v",
        v => v, Seq(("p50", "(n + 1) div 2"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("empty input")),
      s"expected the raise_error message, got: ${msgs(ex)}")
  }
}
