package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of the driver fixture tables (/root/repo/TESTDATA.md).
  *
  * One parquet file per table under `\$dir/`. All readers go through here so
  * scan-level concerns (schema, pruning) live in one place. At cluster scale
  * these would be catalog tables (partitioned/bucketed); on the fixture
  * layout each table is a single parquet file and Spark's vectorized reader +
  * predicate pushdown do the heavy lifting.
  */
object Tables {
  val fixtureNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one fixture table. Filters/projections applied by callers are
    * pushed into the parquet scan by Catalyst (PushedFilters / ReadSchema).
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions.tune]]) so
    * it surfaces as a nanos BIGINT, converted here to a microsecond
    * timestamp (the fixture carries no sub-microsecond payload).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events"
        && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
