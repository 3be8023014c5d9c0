package graft

import org.apache.spark.sql.functions._

/** The fixed-point PCA op's eigen-properties the hash gate cannot judge:
  * the returned direction must (a) carry the sign convention, (b) beat
  * every coordinate axis on the Rayleigh quotient of the exact scatter
  * matrix (variance maximization — the point of PCA), and (c) be stable
  * under one more power step (near-fixed-point of the iteration).
  */
class PcaSpec extends SparkSuite {

  private def scatter: (Array[Array[BigInt]], Int) = {
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val n = vecs.length
    val d = vecs.head.length
    val q = vecs.map(_.map(x => BigInt(math.round(x * 1000))))
    val s = Array.tabulate(d)(i => q.map(_(i)).sum)
    val c = Array.tabulate(d)(i => Array.tabulate(d)(j =>
      BigInt(n) * q.map(v => v(i) * v(j)).sum - s(i) * s(j)))
    (c, d)
  }

  private def rayleigh(c: Array[Array[BigInt]], v: Array[BigInt]):
      BigDecimal = {
    val num = (v.indices).map(i =>
      v(i) * v.indices.map(j => c(i)(j) * v(j)).sum).sum
    val den = v.map(x => x * x).sum
    BigDecimal(num) / BigDecimal(den)
  }

  test("pca direction maximizes the Rayleigh quotient over every axis, " +
    "respects the sign convention, and is a near-fixed-point") {
    val (c, d) = scatter
    val v = graft.ext.PcaPower.pcaTop.fn(spark, sf).collect()
      .sortBy(_.getLong(0)).map(r => BigInt(r.getLong(1)))
    assert(v.length == d)
    assert(v.find(_ != 0).exists(_ > 0), "sign convention violated")
    val rv = rayleigh(c, v)
    (0 until d).foreach { i =>
      val axis = Array.tabulate(d)(j => if (j == i) BigInt(1) else BigInt(0))
      assert(rv >= rayleigh(c, axis),
        s"axis $i beats the returned direction")
    }
    // one more exact power step must not rotate the direction much:
    // cos(v, Cv) >= 0.999
    val w = Array.tabulate(d)(i => v.indices.map(j => c(i)(j) * v(j)).sum)
    val dot = BigDecimal((v.indices).map(i => v(i) * w(i)).sum)
    val cos = dot / (BigDecimal(math.sqrt(v.map(x => x * x).sum.toDouble))
      * BigDecimal(math.sqrt(w.map(x => (x * x).toDouble).sum)))
    assert(cos > 0.999, s"not a fixed point: cos = $cos")
  }
}
