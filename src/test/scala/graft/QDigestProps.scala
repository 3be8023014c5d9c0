package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.QDigest

/** Property tests for the q-digest rank bound (no SparkSession): the
  * SenSys'04 guarantee — any reported q-quantile's true rank is within
  * (log2 U / k) * n of q*n — must hold for ARBITRARY inputs and
  * ARBITRARY merge trees, because the gate row pins the bound flag
  * TRUE unconditionally. Small k values are exercised deliberately:
  * the bound must degrade gracefully, never break.
  */
object QDigestProps extends Properties("QDigest") {

  private val logU = 12 // 4096-value universe keeps cases fast
  private val ks = Gen.oneOf(16, 64, 256)
  private val valuesGen: Gen[List[Long]] = Gen.sized { sz =>
    Gen.listOfN(math.max(1, sz * 4),
      Gen.frequency(
        3 -> Gen.choose(0L, (1L << logU) - 1),
        2 -> Gen.choose(0L, 63L), // heavy head
        1 -> Gen.const(17L))) // hot key
  }
  private val qGen = Gen.oneOf(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  private def rankBoundHolds(values: List[Long], q: Double, k: Int,
      flat: Array[Long]): Boolean = {
    val sorted = values.sorted
    val n = sorted.length.toLong
    val est = QDigest.estimate(flat, q, logU)
    val lo = sorted.count(_ < est).toLong
    val hi = sorted.count(_ <= est).toLong
    val target = math.ceil(q * n).max(1.0)
    val dist = math.max(0.0, math.max(lo + 1 - target, target - hi))
    dist <= logU.toDouble / k * n + 1e-9
  }

  property("single-partition build: rank bound holds for arbitrary " +
    "inputs, q, and k") =
    Prop.forAll(valuesGen, qGen, ks) { (values, q, k) =>
      val flat = QDigest.flatten(QDigest.sketchOf(values, logU, k))
      rankBoundHolds(values, q, k, flat)
    }

  property("arbitrary merge trees: splitting the input into random " +
    "chunks and merging in order preserves the bound and conserves n") =
    Prop.forAll(valuesGen, qGen, ks, Gen.choose(2, 7)) {
      (values, q, k, parts) =>
        val chunks = values.grouped(
          math.max(1, values.length / parts)).toList
        val merged = chunks.map(c => QDigest.sketchOf(c, logU, k))
          .reduce((a, b) => QDigest.mergeSketch(a, b, logU, k))
        val flat = QDigest.flatten(merged)
        val conserved = flat.grouped(2).map(_(1)).sum == values.length
        conserved && rankBoundHolds(values, q, k, flat)
    }
}
