package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: derive a deterministic Nx-scaled copy of a fixture dir into
  * an output dir (default 10x), for scale-trend evidence runs.
  *
  * Big tables are replicated with key offsets chosen so the scaled data
  * keeps the fixture's *structure* rather than becoming a degenerate
  * blow-up:
  *  - `events`: event_id and user_id offset per copy — per-user event
  *    counts and per-type value distributions are preserved exactly;
  *  - `lineitem`/`orders`: orderkey offset per copy, dimension keys
  *    (part/supplier/customer) unchanged — join fan-in to the dims grows
  *    Nx, exactly how a growing fact table behaves against slowly-growing
  *    dimensions;
  *  - `documents`: doc_id offset; copies i>0 get a per-copy suffix token,
  *    so each document family is a 10-member NEAR-duplicate cluster (high
  *    jaccard, not exact) — the heaviest realistic dedup workload;
  *  - `embeddings`: vec_id offset; per-copy, per-dimension deterministic
  *    jitter breaks exact equality while keeping copies near-duplicates
  *    in cosine.
  * Small dims (region/nation/customer/supplier/part) copy verbatim.
  *
  * Usage: runMain graft.tools.ScaleData <srcSfDir> <outDir> [factor]
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val (src, out, n) = args match {
      case Array(s, o)    => (s, o, 10)
      case Array(s, o, f) => (s, o, f.toInt)
      case _ => sys.error("usage: ScaleData <srcSfDir> <outDir> [factor]")
    }
    val spark = graft.core.Sessions.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val copies = spark.range(0, n).select(col("id").cast("int").as("cp"))
    def replicate(df: DataFrame): DataFrame = df.crossJoin(copies)
    val OFF = 1000000000L

    def write(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scale] $t: ${spark.read.parquet(s"$out/$t.parquet").count()}")
    }

    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    }

    val ev = spark.read.parquet(s"$src/events.parquet")
    write(replicate(ev)
      .withColumn("event_id", col("event_id") + col("cp") * OFF)
      .withColumn("user_id", col("user_id") + col("cp") * OFF)
      .drop("cp"), "events")

    val orders = spark.read.parquet(s"$src/orders.parquet")
    write(replicate(orders)
      .withColumn("o_orderkey", col("o_orderkey") + col("cp") * OFF)
      .drop("cp"), "orders")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    write(replicate(li)
      .withColumn("l_orderkey", col("l_orderkey") + col("cp") * OFF)
      .drop("cp"), "lineitem")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    write(replicate(docs)
      .withColumn("doc_id", col("doc_id") + col("cp") * OFF)
      .withColumn("text",
        when(col("cp") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" copytoken"), col("cp"))))
      .drop("cp"), "documents")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    write(replicate(emb)
      .withColumn("vec_id", col("vec_id") + col("cp") * OFF)
      .withColumn("embedding",
        expr("transform(embedding, (x, i) -> " +
          "x + cast(cp as float) * cast(((i * 31 + cp * 7) % 11 - 5) " +
          "as float) * cast(0.002 as float))"))
      .drop("cp"), "embeddings")

    spark.stop()
  }
}
