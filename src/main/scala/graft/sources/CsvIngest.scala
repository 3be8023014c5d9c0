package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Q, Tables}

/** [EXT] CSV ingestion with corrupt-record quarantine — the other common
  * landing format ([[JsonlIngest]] is the JSONL half). The fixture is
  * staged ONCE as a real CSV dataset (`to_csv` per line through the text
  * sink) with four lines injected by hand: two GOOD lines exercising the
  * quote parser (embedded commas, RFC-4180 doubled quotes) — the fixture
  * corpus itself contains no commas or quotes, so without them the
  * quoting path would go untested — and two CORRUPT lines (non-numeric
  * values in typed columns), which a PERMISSIVE schema'd read must
  * quarantine via `_corrupt_record`, not kill the job or silently null.
  *
  * The oracle replays the contract from the parquet fixture plus the two
  * injected good rows: count + id checksum + payload volume prove
  * field-level fidelity through the serialize→parse round trip, and
  * exactly the two corrupt lines are quarantined.
  *
  * Scale shape: line-parallel text stage; splittable schema'd CSV read
  * (no inference pass, no multiLine), corrupt-row split on the same
  * projection, one final 1-row aggregate.
  */
object CsvIngest {

  /** Hand-written CSV exercising quoting: embedded commas and a doubled
    * (escaped) quote, per RFC 4180. */
  private val QuotedGood = Seq(
    """777777771,"a, quoted, text",en,web,14""",
    """777777772,"she said ""hi"", twice",en,web,20""")

  private val BadLines = Seq(
    """not_a_number,plain text,en,web,5""",
    """999999998,text,en,web,not_a_count""")

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  private val prepared = new graft.ext.PreparedTables(
    Seq("documents.parquet"), Seq("graft_docs_csv"),
    (s, d) => {
      import s.implicits._
      val lines = Tables.documents(s, d)
        .select(to_csv(struct(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))).as("value"))
        .union(QuotedGood.toDF("value"))
        .union(BadLines.toDF("value"))
      lines.write.mode("overwrite").format("text")
        .saveAsTable("graft_docs_csv")
    })

  def ensurePrepared(s: SparkSession, d: String): Unit =
    prepared.ensurePrepared(s, d)

  def ingest(s: SparkSession, d: String): DataFrame = {
    ensurePrepared(s, d)
    val warehouse = s.conf.get("spark.sql.warehouse.dir")
    val dir = java.nio.file.Paths.get(
      new java.net.URI(warehouse).getPath, "graft_docs_csv").toString
    val parsed = s.read.schema(docsSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      // RFC 4180 doubled-quote escaping (Spark defaults to backslash)
      .option("escape", "\"")
      .csv(dir)
    // the aggregate references EVERY data column on purpose: Spark's CSV
    // column pruning parses only the referenced fields, so a conversion
    // failure in an unreferenced column would not be quarantined — the
    // quarantine contract is only whole-record under a full-record parse
    parsed.agg(
      count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
      count(col("_corrupt_record")).as("n_corrupt"),
      sum(when(col("_corrupt_record").isNull, col("doc_id")))
        .as("id_checksum"),
      sum(when(col("_corrupt_record").isNull, length(col("text"))
        .cast("long"))).as("total_chars"),
      sum(when(col("_corrupt_record").isNull, col("n_chars")))
        .as("nchars_checksum"),
      sum(when(col("_corrupt_record").isNull,
        (length(col("lang")) + length(col("source"))).cast("long")))
        .as("meta_chars"))
  }

  val ingestCsv: Q = Q(
    "ext_ingest_csv",
    s"""SELECT COUNT(*) + 2 AS n_good,
       |CAST(${BadLines.size} AS BIGINT) AS n_corrupt,
       |CAST(SUM(doc_id) + 777777771 + 777777772 AS BIGINT) AS id_checksum,
       |CAST(SUM(length(text))
       |  + length('a, quoted, text')
       |  + length('she said "hi", twice') AS BIGINT) AS total_chars,
       |CAST(SUM(n_chars) + 14 + 20 AS BIGINT) AS nchars_checksum,
       |CAST(SUM(length(lang) + length(source)) + 5 + 5 AS BIGINT)
       |  AS meta_chars
       |FROM documents""".stripMargin
  ) { (s, d) => ingest(s, d) }
    .copy(setup = Some(ensurePrepared _))

  val all: Seq[Q] = Seq(ingestCsv)
}
