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

  /** Inferred parquet schema per (dir, table): schema inference launches
    * a Spark JOB per `spark.read.parquet` call (footer read in a task —
    * measured ~30-50 ms of scheduling per query in the bench probe), so
    * every read after the first goes through `.schema(...)` instead.
    * This is the catalog-table shape a 100 TB deployment reads through
    * anyway: the schema is pinned once at registration, never re-inferred
    * per query. Fixture files are immutable for a JVM's lifetime. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), org.apache.spark.sql.types.StructType]()

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
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent((dir, name),
      _ => spark.read.parquet(path).schema)
    val df = spark.read.schema(schema).parquet(path)
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
