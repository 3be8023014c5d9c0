package graft

import graft.core.Eager.EagerCheckpoint

/** Pins the round-20 size-gated checkpoint helper: below the input-byte
  * gate it must be an exact no-op (same Dataset — zero barrier at
  * fixture scale, the bench-protecting half of the contract); above it
  * the result must be a materialized LogicalRDD (lineage cut — the
  * 100 TB half). The gate reads LEAF stats, so a selective filter on a
  * large input still checkpoints. */
class EagerScaleSpec extends SparkSuite {

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("below the gate: no-op, same Dataset") {
    val df = docs.select("doc_id")
    val out = df.eagerCheckpointAtScale() // default gate 8 GiB >> fixture
    assert(out eq df)
  }

  test("above the gate: checkpointed to a LogicalRDD") {
    val prev = spark.conf.getOption("spark.graft.checkpoint.minInputBytes")
    spark.conf.set("spark.graft.checkpoint.minInputBytes", "1")
    try {
      val df = docs.select("doc_id").filter("doc_id >= 0")
      val out = df.eagerCheckpointAtScale()
      assert(out ne df)
      assert(out.queryExecution.analyzed.getClass.getSimpleName
        == "LogicalRDD")
      assert(out.count() == df.count())
    } finally {
      spark.conf.unset("spark.graft.checkpoint.minInputBytes")
      prev.foreach(spark.conf
        .set("spark.graft.checkpoint.minInputBytes", _))
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(false))
    }
  }

  test("gate reads leaf input stats, not output estimates") {
    val prev = spark.conf.getOption("spark.graft.checkpoint.minInputBytes")
    // set the gate just above the fixture file size: still a no-op
    val bytes = java.nio.file.Files.walk(
      java.nio.file.Paths.get(s"$sf/documents.parquet")).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(java.nio.file.Files.size).sum
    spark.conf.set("spark.graft.checkpoint.minInputBytes",
      (bytes * 100).toString)
    try {
      val df = docs.select("doc_id")
      assert(df.eagerCheckpointAtScale() eq df)
    } finally {
      spark.conf.unset("spark.graft.checkpoint.minInputBytes")
      prev.foreach(spark.conf
        .set("spark.graft.checkpoint.minInputBytes", _))
    }
  }
}
