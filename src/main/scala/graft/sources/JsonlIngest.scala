package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Q, Tables}

/** [EXT] JSONL ingestion with corrupt-record quarantine — the landing
  * format of most LLM training corpora. The fixture is staged ONCE as a
  * real JSONL dataset (one `to_json` document per line, written by
  * Spark's text sink) with two deliberately malformed lines injected;
  * the operator then does what a production ingest job does: a SCHEMA'D
  * json read in PERMISSIVE mode with a `_corrupt_record` column, so bad
  * lines land in quarantine instead of killing the job or silently
  * vanishing — and the gate counts them.
  *
  * The oracle never sees the staged JSONL; it replays the contract from
  * the parquet fixture: every good line survives with its fields intact
  * (count + doc_id checksum + total text length re-prove field-level
  * fidelity through the serialize→parse round trip), and exactly the
  * two injected lines are quarantined.
  *
  * Scale shape: the stage is a line-parallel text write; the read is
  * Spark's splittable line-based json source — per-line parsing with an
  * explicit schema (no schema-inference pass over 100 TB of text), and
  * the corrupt-row split rides the same projection. No shuffle until
  * the final 1-row aggregate.
  */
object JsonlIngest {

  private val BadLines = Seq(
    """{"doc_id": 999999999, "text": "truncated""",
    """not json at all - a stray log line""")

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  private val prepared = new graft.ext.PreparedTables(
    Seq("documents.parquet"), Seq("graft_docs_jsonl"),
    (s, d) => {
      import s.implicits._
      val lines = Tables.documents(s, d)
        .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))).as("value"))
        .union(BadLines.toDF("value"))
      lines.write.mode("overwrite").format("text")
        .saveAsTable("graft_docs_jsonl")
    })

  def ensurePrepared(s: SparkSession, d: String): Unit =
    prepared.ensurePrepared(s, d)

  /** The ingest job: schema'd PERMISSIVE json parse over the staged
    * lines, corrupt rows quarantined and counted, good rows checked by
    * count + key checksum + payload volume. */
  def ingest(s: SparkSession, d: String): DataFrame = {
    ensurePrepared(s, d)
    val warehouse = s.conf.get("spark.sql.warehouse.dir")
    val dir = java.nio.file.Paths.get(
      new java.net.URI(warehouse).getPath, "graft_docs_jsonl").toString
    val parsed = s.read.schema(docsSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
    parsed.agg(
      count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
      count(col("_corrupt_record")).as("n_corrupt"),
      sum(when(col("_corrupt_record").isNull, col("doc_id")))
        .as("id_checksum"),
      sum(when(col("_corrupt_record").isNull, length(col("text"))
        .cast("long"))).as("total_chars"))
  }

  val ingestJsonl: Q = Q(
    "ext_ingest_jsonl",
    s"""SELECT COUNT(*) AS n_good, CAST(${BadLines.size} AS BIGINT)
       |  AS n_corrupt,
       |CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       |CAST(SUM(length(text)) AS BIGINT) AS total_chars
       |FROM documents""".stripMargin
  ) { (s, d) => ingest(s, d) }
    .copy(setup = Some(ensurePrepared _))

  val all: Seq[Q] = Seq(ingestJsonl)
}
