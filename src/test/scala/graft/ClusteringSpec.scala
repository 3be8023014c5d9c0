package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.Clustering

/** Pins the Lloyd-iteration properties the value gate cannot see (the
  * oracle replays the same rounds, so it would agree with a wrong-but-
  * mirrored trainer): inertia monotonicity, the partition property, and
  * rerun determinism.
  */
class ClusteringSpec extends SparkSuite {

  private def inertiaAt(rounds: Int): Double =
    Clustering.lloyd(spark, sf, rounds)
      .agg(sum(col("dist"))).collect()(0).getDouble(0)

  test("kmeans: every vector lands in exactly one cluster and sizes " +
    "partition the corpus") {
    val out = Clustering.embedKmeans.fn(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == n,
      "cluster sizes must sum to the corpus size")
    assert(out.forall(_.getLong(1) > 0))
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    assert(out.forall(_.getDouble(2) >= 0.0))
  }

  test("kmeans: Lloyd rounds never increase inertia (round-6 centroid " +
    "snapping allowed a tiny tolerance)") {
    val i1 = inertiaAt(1)
    val i2 = inertiaAt(2)
    val i3 = inertiaAt(3)
    assert(i2 <= i1 + 1e-3, s"round 2 inertia rose: $i1 -> $i2")
    assert(i3 <= i2 + 1e-3, s"round 3 inertia rose: $i2 -> $i3")
    assert(i3 < i1, "three rounds must actually improve the fixture fit")
  }

  test("kmeans: rerun is bit-deterministic") {
    val a = Clustering.embedKmeans.fn(spark, sf).collect().toSeq
    val b = Clustering.embedKmeans.fn(spark, sf).collect().toSeq
    assert(a == b)
  }
}
