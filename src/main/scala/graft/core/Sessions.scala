package graft.core

import org.apache.spark.sql.SparkSession

/** Session construction shared by Verify / Bench / tests.
  *
  * One long-lived session per process (the reference opens a MySQL
  * connection per call, db.py:28-59 — we deliberately do not mirror that).
  */
object Sessions {

  /** Configs every graft session needs, applied to a builder. */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    // fixture `events.ts` is parquet TIMESTAMP(NANOS): read as nanos long,
    // converted to a micros timestamp in Tables.load
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // managed-table home for the bucketed-join path (ext.BucketedJoin);
    // keep it out of the repo working tree
    .config("spark.sql.warehouse.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")

  /** Local session sized to the harness (local[N] = N executor threads in
    * one JVM; shuffle partitions match cores, not the 200 default). */
  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
