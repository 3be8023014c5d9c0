package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] deduplication family over `documents` / `embeddings`:
  * exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard set-similarity
  * join, and embedding-cosine near-dup.
  *
  * Scale design: nothing here is O(n^2) on the full corpus. Candidate
  * generation is always a key-equality shuffle (digest, LSH band, shared
  * shingle, sign-bucket) and only candidates pay the verification cost.
  * All hashing is md5-based so the DuckDB oracle reproduces it exactly
  * (minhash = lexicographic min over hex digests — order statistics on a
  * uniform hash, the textbook construction with strings for portability).
  */
object Dedup {

  /** Tokens; mirror of `list_filter(string_split_regex(...))` (see
    * TextAnalysis.toks). */
  private def toks(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  private val toksSql =
    """list_filter(string_split_regex(text, '\s+'), t -> t <> '')"""

  /** Distinct 3-word shingles per document (docs with < 3 tokens drop out,
    * same as the oracle's len(w) >= 3 guard). */
  private def shingleDf(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("w")) - 2),
          i => concat_ws(" ", slice(col("w"), i, lit(3)))))).as("sh"))

  private val shingleSql =
    s"""SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, len(w) - 2),
       |    i -> array_to_string(w[i:i+2], ' ')))) AS sh
       |  FROM (SELECT doc_id, $toksSql AS w FROM documents) tokd
       |  WHERE len(w) >= 3""".stripMargin

  /** Exact dedup: group by content digest (never by the full text — the
    * shuffle key must stay narrow at 100 TB), keep the smallest doc_id. */
  val exact: Q = Q(
    "ext_dedup_exact",
    """SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")
  }

  private val NumHashes = 16
  private val BandSize = 4 // 4 bands x 4 rows

  /** MinHash signatures + LSH banding + Jaccard verification.
    * Pipeline: shingle -> 16 seeded-md5 minhashes (one shuffle) -> band
    * keys -> bucket self-join for candidates -> shingle-join Jaccard
    * verify at >= 0.6. Output: verified near-dup pairs. */
  val minhashLsh: Q = Q(
    "ext_dedup_minhash",
    s"""WITH sh AS ($shingleSql),
       |sig AS (
       |  SELECT doc_id,
       |${(0 until NumHashes).map(j =>
        s"    MIN(md5('$j:' || sh)) AS m$j").mkString(",\n")}
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |${(0 until NumHashes / BandSize).map(b =>
        s"  SELECT doc_id, md5('$b:' || ${(0 until BandSize).map(r =>
          s"m${b * BandSize + r}").mkString(" || ")}) AS band_key FROM sig")
        .mkString("\n  UNION ALL\n")}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_int
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
       |  GROUP BY c.doc_a, c.doc_b)
       |SELECT i.doc_a, i.doc_b,
       |  ROUND(i.n_int * 1.0 / (za.n_sh + zb.n_sh - i.n_int), 4) AS jaccard
       |FROM inter i
       |JOIN sizes za ON za.doc_id = i.doc_a
       |JOIN sizes zb ON zb.doc_id = i.doc_b
       |WHERE i.n_int * 1.0 / (za.n_sh + zb.n_sh - i.n_int) >= 0.6
       |ORDER BY doc_a, doc_b""".stripMargin
  ) { (s, d) =>
    val sh = shingleDf(s, d).cache()
    val sig = sh.groupBy("doc_id")
      .agg(
        min(md5(concat(lit("0:"), col("sh")))).as("m0"),
        (1 until NumHashes).map(j =>
          min(md5(concat(lit(s"$j:"), col("sh")))).as(s"m$j")): _*)
    // one signature pass -> explode the 4 band keys; cache both sides of
    // the self-join (the signature agg is the expensive stage — without
    // the cache each UNION branch and join side would recompute it)
    val bands = sig.select(col("doc_id"),
      explode(array((0 until NumHashes / BandSize).map { b =>
        md5(concat((lit(s"$b:") +: (0 until BandSize)
          .map(r => col(s"m${b * BandSize + r}"))): _*))
      }: _*)).as("band_key")).cache()
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_key") === col("b.band_key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(sh.as("sa"), col("sa.doc_id") === col("doc_a"))
      .join(sh.as("sb"),
        col("sb.doc_id") === col("doc_b") && col("sb.sh") === col("sa.sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_int"))
    val jac = col("n_int") * lit(1.0) /
      (col("za.n_sh") + col("zb.n_sh") - col("n_int"))
    inter
      .join(sizes.as("za"), col("za.doc_id") === col("doc_a"))
      .join(sizes.as("zb"), col("zb.doc_id") === col("doc_b"))
      .filter(jac >= 0.6)
      .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash: 64-bit signature from per-token md5 bits (bit b set iff the
    * weighted token-bit sum is positive), emitted as a 64-char bitstring.
    * Grouping is (doc, hex-position); the 4 bits of each hex digit are
    * summed with conditional aggregates — 16x explode, not 64x. */
  val simhash: Q = Q(
    "ext_dedup_simhash",
    s"""WITH tok AS (
       |  SELECT doc_id, md5(t) AS h
       |  FROM (SELECT doc_id, unnest($toksSql) AS t FROM documents) u),
       |digit AS (
       |  SELECT doc_id, p,
       |    strpos('0123456789abcdef', substr(h, p, 1)) - 1 AS v
       |  FROM tok CROSS JOIN (SELECT unnest(generate_series(1, 16)) AS p) ps),
       |sums AS (
       |  SELECT doc_id, p,
       |    SUM(CASE WHEN (v >> 3) & 1 = 1 THEN 1 ELSE -1 END) AS s0,
       |    SUM(CASE WHEN (v >> 2) & 1 = 1 THEN 1 ELSE -1 END) AS s1,
       |    SUM(CASE WHEN (v >> 1) & 1 = 1 THEN 1 ELSE -1 END) AS s2,
       |    SUM(CASE WHEN v & 1 = 1 THEN 1 ELSE -1 END) AS s3
       |  FROM digit GROUP BY doc_id, p)
       |SELECT doc_id, string_agg(
       |  (CASE WHEN s0 > 0 THEN '1' ELSE '0' END) ||
       |  (CASE WHEN s1 > 0 THEN '1' ELSE '0' END) ||
       |  (CASE WHEN s2 > 0 THEN '1' ELSE '0' END) ||
       |  (CASE WHEN s3 > 0 THEN '1' ELSE '0' END), '' ORDER BY p) AS simhash
       |FROM sums GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
      .select(col("doc_id"), md5(col("t")).as("h"))
    val digit = tok
      .select(col("doc_id"), explode(sequence(lit(1), lit(16))).as("p"),
        col("h"))
      .select(col("doc_id"), col("p"),
        expr("instr('0123456789abcdef', substr(h, p, 1)) - 1").as("v"))
    def bitSum(shift: Int): Column =
      sum(when(shiftright(col("v"), shift).bitwiseAND(1) === 1, 1)
        .otherwise(-1))
    val sums = digit.groupBy("doc_id", "p")
      .agg(bitSum(3).as("s0"), bitSum(2).as("s1"),
        bitSum(1).as("s2"), bitSum(0).as("s3"))
    def bitChar(c: String): Column =
      when(col(c) > 0, "1").otherwise("0")
    val perPos = sums.select(col("doc_id"), col("p"),
      concat(bitChar("s0"), bitChar("s1"), bitChar("s2"), bitChar("s3"))
        .as("nib"))
    perPos.groupBy("doc_id")
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("p"), col("nib")))),
        x => x.getField("nib"))).as("simhash"))
      .orderBy("doc_id")
  }

  /** n-gram Jaccard set-similarity join: candidates = pairs sharing at
    * least one 3-shingle (a key-equality shuffle, NOT a cross join);
    * verified at Jaccard >= 0.5. */
  val ngramJaccard: Q = Q(
    "ext_dedup_ngram_jaccard",
    s"""WITH sh AS ($shingleSql),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_int
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT i.doc_a, i.doc_b,
       |  ROUND(i.n_int * 1.0 / (za.n_sh + zb.n_sh - i.n_int), 4) AS jaccard
       |FROM inter i
       |JOIN sizes za ON za.doc_id = i.doc_a
       |JOIN sizes zb ON zb.doc_id = i.doc_b
       |WHERE i.n_int * 1.0 / (za.n_sh + zb.n_sh - i.n_int) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
  ) { (s, d) =>
    val sh = shingleDf(s, d).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_int"))
    val jac = col("n_int") * lit(1.0) /
      (col("za.n_sh") + col("zb.n_sh") - col("n_int"))
    inter
      .join(sizes.as("za"), col("za.doc_id") === col("doc_a"))
      .join(sizes.as("zb"), col("zb.doc_id") === col("doc_b"))
      .filter(jac >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val all: Seq[Q] = Seq(exact, minhashLsh, simhash, ngramJaccard)
}
