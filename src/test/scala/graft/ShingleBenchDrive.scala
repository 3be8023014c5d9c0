package graft

import org.apache.spark.sql.functions._

/** Micro-benchmark: native ShingleGen generator vs the declarative
  * explode(array_distinct(transform(...))) shingle pipeline, end-to-end
  * through the same downstream aggregate (distinct shingle count — forces
  * full materialization of every shingle through a shuffle).
  *
  * Usage: ShingleBenchDrive <sfDir> [k] [reps]
  */
object ShingleBenchDrive {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 3
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.Sessions.local()
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)

    def declarative = {
      val w = filter(split(col("text"), "\\s+"), t => t =!= "")
      docs.filter(size(filter(split(col("text"), "\\s+"),
          t => t =!= "")) >= k)
        .select(col("doc_id"), explode(array_distinct(transform(
          sequence(lit(1), size(w) - (k - 1)),
          i => concat_ws(" ", slice(w, i, lit(k)))))).as("sh"))
    }
    def generator = docs.select(col("doc_id"),
      graft.functions.ShingleGen.shingle_gen(spark, col("text"), k).as("sh"))

    def time(name: String, mk: => org.apache.spark.sql.DataFrame): Unit = {
      var best = Double.MaxValue
      var n = 0L
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        n = mk.select("sh").distinct().count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[shinglebench] $name%-12s k=$k best=$best%.3f s " +
        f"distinct=$n")
    }
    time("declarative", declarative)
    time("generator", generator)
    time("declarative", declarative) // order-swap to expose JIT bias
    time("generator", generator)
    spark.stop()
  }
}
