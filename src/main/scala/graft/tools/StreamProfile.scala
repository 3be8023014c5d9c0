package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Diagnostic main (round 19): attribute the streaming gate rows'
  * per-row seconds to micro-batch phases. Registers a
  * [[StreamingQueryListener]] and replays a caller-chosen set of
  * streaming rows (SPARK_GRAFT_STREAM_PROBE, comma-separated names;
  * default a representative spread), then prints, per row, the batch
  * count and the summed `durationMs` phases Spark reports per batch
  * (triggerExecution = wall; addBatch = execution incl. sink;
  * queryPlanning / walCommit / commitOffsets / getBatch / latestOffset
  * = machinery). This is the guide-§1 "decide whether the time is
  * compute or machinery" step for the one family whose rows are >2x
  * DuckDB structurally.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spec = sys.env.getOrElse("SPARK_GRAFT_STREAM_PROBE",
      "ext_stream_hourly,ext_stream_sessions,ext_stream_dedup," +
        "ext_stream_join,ext_stream_funnel,ext_stream_topk")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val byName = graft.SparkEntry.registry.map(q => q.name -> q).toMap

    // per-query-run accumulated phase totals (the listener fires on the
    // session's streams thread; a synchronized buffer is plenty here)
    val phases = mutable.LinkedHashMap.empty[String, Double]
    var batches = 0
    var rows = 0L
    val lock = new Object
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        lock.synchronized {
          batches += 1
          rows += e.progress.numInputRows
          e.progress.durationMs.forEach { (k, v) =>
            phases(k) = phases.getOrElse(k, 0.0) + v / 1000.0
          }
        }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    spec.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val q = byName.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      q.setup.foreach(f => f(spark, sfDir))
      // one untimed warm pass, then the timed pass (the bench protocol)
      (1 to 2).foreach { pass =>
        lock.synchronized { phases.clear(); batches = 0; rows = 0 }
        val t0 = System.nanoTime()
        val df = q.fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        if (pass == 2) lock.synchronized {
          val ph = phases.toSeq.sortBy(-_._2)
            .map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")
          println(f"[streamprof] $name%-28s wall=$wall%.2f " +
            f"batches=$batches rows=$rows $ph")
        }
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
