package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.LshPlanes
import graft.functions.LshBuckets

/** Pins [[LshBuckets]] (the compact all-tables bucket expression) to the
  * definitional per-plane formula it replaced: bucket(t) =
  * sum_j (dot(e, plane[t*B+j]) > 0) << j with the dot accumulated strictly
  * left-to-right — the order the DuckDB oracle's `list_reduce` mirror
  * depends on for bit-identical sign decisions.
  */
class LshBucketsSpec extends AnyFunSuite {

  private def reference(e: Array[Double]): Array[Long] = {
    val out = new Array[Long](LshPlanes.NumTables)
    for (t <- 0 until LshPlanes.NumTables;
         j <- 0 until LshPlanes.BitsPerTable) {
      val plane = LshPlanes.planes(t * LshPlanes.BitsPerTable + j)
      var acc = 0.0
      var i = 0
      while (i < math.min(e.length, LshPlanes.Dims)) {
        acc += e(i) * plane(i); i += 1
      }
      if (acc > 0) out(t) |= (1L << j)
    }
    out
  }

  private def viaExpression(e: Array[Double]): Array[Long] =
    LshBuckets.buckets(new GenericArrayData(e)).toLongArray()

  test("matches the per-plane sign formula on deterministic vectors") {
    // deterministic pseudo-random vectors (no RNG state in tests)
    val vecs = (0 until 50).map { k =>
      Array.tabulate(LshPlanes.Dims) { i =>
        math.sin(k * 131.0 + i * 17.0) // in [-1, 1], sign-diverse
      }
    }
    vecs.foreach { e =>
      assert(viaExpression(e).sameElements(reference(e)))
    }
  }

  test("buckets are within [0, 2^BitsPerTable)") {
    val e = Array.tabulate(LshPlanes.Dims)(i => math.cos(i * 3.0))
    viaExpression(e).foreach { b =>
      assert(b >= 0 && b < (1L << LshPlanes.BitsPerTable))
    }
  }

  test("zero vector lands in bucket 0 of every table (no dot is > 0)") {
    assert(viaExpression(new Array[Double](LshPlanes.Dims))
      .forall(_ == 0L))
  }
}
