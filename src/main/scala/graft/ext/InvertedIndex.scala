package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] positional inverted index + exact phrase search.
  *
  * BM25 ([[TextAnalysis.bm25]]) ranks by bag-of-words; a phrase query
  * ("data window", adjacent, in order) additionally needs token
  * POSITIONS. The search-engine shape is a positional postings table
  * `(token, doc_id, pos)` built once at ingest ([[PreparedTables]]
  * memo), laid out so a token lookup reads only that token's slice —
  * here `partitionBy(token)` over the fixture's small closed vocabulary;
  * at 100 TB the same table is bucketed by token hash with sorted
  * buckets (a vocabulary is heavy-tailed; one directory per token stops
  * scaling, one bucket per hash range doesn't).
  *
  * The query then never touches `documents`: it reads the two query
  * tokens' postings (partition pruning — the spec pins scanned
  * partitions), joins them on `(doc_id, pos+1 = pos)` and counts matches
  * per doc. Both join inputs are already restricted to the query tokens,
  * so the join is proportional to the PHRASE's postings, not the corpus
  * — the entire reason inverted indexes exist. The oracle has no index:
  * DuckDB re-derives the same matches by scanning every document's token
  * list, which is exactly the full-scan plan the index avoids.
  */
object InvertedIndex {

  /** Fixed 2-token phrase; fixture vocabulary gives it ~5 % doc
    * frequency (26 matching docs at sf0.01). */
  private val TokA = "data"
  private val TokB = "window"

  private def toks(text: org.apache.spark.sql.Column) =
    filter(split(text, "\\s+"), t => t =!= "")

  private val prepared = new PreparedTables(
    Seq("documents.parquet"), Seq("graft_postings"), write,
    // token-partitioned index: adoption must declare the partitioning
    // and recover the per-token directories, or the pruned postings
    // read serves nothing
    adoptDdl = (s, t, loc) => Seq(
      s"CREATE TABLE $t (${s.table(t).schema.toDDL}) USING parquet " +
        s"PARTITIONED BY (token) LOCATION '$loc'",
      s"MSCK REPAIR TABLE $t"))

  def ensurePrepared(s: SparkSession, d: String): Unit =
    prepared.ensurePrepared(s, d)

  private def write(s: SparkSession, d: String): Unit =
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(toks(col("text"))).as(Seq("pos", "token")))
      .write.mode("overwrite").format("parquet")
      .partitionBy("token")
      .saveAsTable("graft_postings")

  /** Postings for one token: a partition-pruned slice of the index. */
  private def postings(s: SparkSession, token: String): DataFrame =
    s.table("graft_postings")
      .filter(col("token") === token)
      .select(col("doc_id"), col("pos"))

  val phraseSearch: Q = Q(
    "ext_text_phrase",
    s"""WITH t AS (SELECT doc_id,
       |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       |hits AS (SELECT doc_id
       |  FROM t, LATERAL unnest(generate_series(1, len(w) - 1)) AS u(i)
       |  WHERE w[i] = '$TokA' AND w[i+1] = '$TokB')
       |SELECT doc_id, COUNT(*) AS n_matches FROM hits
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    ensurePrepared(s, d)
    // adjacency: an occurrence of TokA at pos p matches TokB at p+1;
    // shifting the B side makes it a plain equi-join on (doc_id, pos)
    val pa = postings(s, TokA)
    val pb = postings(s, TokB)
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    pa.join(pb, Seq("doc_id", "pos"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"))
      .orderBy("doc_id")
  }.copy(setup = Some(ensurePrepared _))

  val all: Seq[Q] = Seq(phraseSearch)
}
