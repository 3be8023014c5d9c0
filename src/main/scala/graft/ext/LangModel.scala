package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import graft.functions.FastMd5.fast_md5

/** [EXT] statistical-LM corpus operators: bigram conditional
  * probabilities, NLL-ordered curriculum bucketing, and weighted
  * document sampling — the selection/ordering layer a training-data
  * pipeline runs between cleaning and packing.
  */
object LangModel {

  /** Top-100 bigram conditional probabilities P(w2 | w1) = c(w1,w2) /
    * c(w1,·) over whitespace tokens.
    *
    * Scale shape: bigram pairs are formed ARRAY-LOCALLY (zip of the
    * token list with its own tail via `transform(sequence(...))`) — no
    * posexplode+window shuffle per document; rows first shuffle at the
    * (w1,w2) count aggregate, which map-side combines to vocabulary²
    * scale. The denominator is a w1-partition window over the already
    * aggregated counts (vocabulary-sized input, not corpus-sized). The
    * conditional probability is one IEEE division of two exact integers
    * — bit-identical cross-engine with no rounding needed.
    */
  val bigramLm: Q = Q(
    "ext_text_bigram_lm",
    s"""WITH tok AS (SELECT ${TextAnalysis.toksSql} AS ts FROM documents),
       |bg AS (
       |  SELECT unnest(ts[1:len(ts)-1]) AS w1, unnest(ts[2:len(ts)]) AS w2
       |  FROM tok WHERE len(ts) >= 2),
       |cnt AS (
       |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg
       |  GROUP BY w1, w2),
       |tot AS (
       |  SELECT w1, w2, c2,
       |    SUM(c2) OVER (PARTITION BY w1) AS ct FROM cnt)
       |SELECT w1, w2, c2, c2 / CAST(ct AS DOUBLE) AS cond_prob
       |FROM tot ORDER BY c2 DESC, w1, w2 LIMIT 100""".stripMargin
  ) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window.partitionBy("w1")
    Tables.documents(s, d)
      .select(TextAnalysis.toks(col("text")).as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ts)-2)," +
          " i -> struct(ts[i] AS w1, ts[i+1] AS w2))")).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).cast("long").as("c2"))
      .withColumn("ct", sum(col("c2")).over(w))
      .select(col("w1"), col("w2"), col("c2"),
        (col("c2") / col("ct").cast("double")).as("cond_prob"))
      .orderBy(col("c2").desc, col("w1"), col("w2"))
      .limit(100)
  }

  /** NLL-ordered curriculum: decile-bucket every document by unigram
    * NLL (easy→hard), emitting per-bucket census rows a curriculum
    * sampler consumes. Reuses [[TextAnalysis.nllPerDoc]]; the only new
    * cost is one ntile window over the per-DOC frame (corpus-count rows,
    * already thousands of times smaller than the token stream) and a
    * 10-key aggregate. Ties order by (nll, doc_id) — total, so the
    * bucketing is deterministic cross-engine.
    */
  val curriculumBuckets: Q = Q(
    "ext_text_curriculum",
    s"""WITH ${TextAnalysis.nllPerDocSql},
       |bucketed AS (
       |  SELECT doc_id, n_tokens, nll,
       |    CAST(ntile(10) OVER (ORDER BY nll, doc_id) AS BIGINT) AS bucket
       |  FROM nlls)
       |SELECT bucket, COUNT(*) AS n_docs, MIN(nll) AS min_nll,
       |  MAX(nll) AS max_nll, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
       |FROM bucketed GROUP BY bucket ORDER BY bucket""".stripMargin
  ) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("nll", "doc_id")
    TextAnalysis.nllPerDoc(s, d)
      .withColumn("bucket", ntile(10).over(w).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), min(col("nll")).as("min_nll"),
        max(col("nll")).as("max_nll"),
        sum(col("n_tokens")).as("sum_tokens"))
      .orderBy("bucket")
  }

  /** Weighted top-k document sample — priority sampling (Duffield, Lund
    * & Thorup, "Priority sampling for estimation of arbitrary subset
    * sums", JACM'07): priority q_i = w_i / u_i with u_i a uniform in
    * (0,1]; the k largest priorities form a weighted-without-replacement
    * sample. u_i derives from md5(doc_id) (row-local, engine-stable,
    * retry-safe — same rationale as [[Profiling.splitAssign]]); w_i is
    * the document's character mass. All arithmetic is exact-integer
    * products under 2^53 followed by one IEEE division, so priorities
    * are bit-identical cross-engine. Top-k plans as
    * TakeOrderedAndProject: each partition keeps k rows, no global sort.
    */
  val weightedSample: Q = Q(
    "ext_sample_weighted",
    """WITH pri AS (
      |  SELECT doc_id, source, n_chars,
      |    CAST(n_chars AS DOUBLE) * 4294967296.0
      |      / (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |              AS UBIGINT) + 1) AS priority
      |  FROM documents)
      |SELECT doc_id, source, n_chars, priority FROM pri
      |ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin
  ) { (s, d) =>
    val u32 = conv(substring(fast_md5(s, col("doc_id").cast("string")),
      1, 8), 16, 10).cast("long")
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"),
        ((col("n_chars").cast("double") * lit(4294967296.0))
          / (u32 + lit(1L)).cast("double")).as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(100)
  }

  /** Interpolated Kneser-Ney bigram probabilities (Kneser & Ney,
    * ICASSP'95; Chen & Goodman '98 eq. 4.26, fixed discount D = 0.75):
    * `P(w2|w1) = max(c12 - D, 0)/c1 + (D·N1+(w1,·)/c1) · N1+(·,w2)/N1+(··)`
    * — the smoothing that separates a usable n-gram LM from the MLE
    * bigram row (`ext_text_bigram_lm` assigns zero to anything unseen
    * in context; KN backs off to CONTINUATION counts, "how many contexts
    * does w2 complete", the famous San-Francisco correction).
    *
    * Everything derives from four vocabulary-sized integer aggregates
    * (bigram counts, left totals, distinct-successor and
    * distinct-predecessor type counts, one global type total) — the
    * shuffles are vocabulary-bounded, never token-stream-bounded. The
    * discount 0.75 is DYADIC, so `c12 - 0.75` is exact and every term is
    * a fixed chain of correctly-rounded IEEE ops over exact integers —
    * bit-identical cross-engine with NO output rounding at all.
    */
  val kneserNey: Q = {
    val pkn = "(GREATEST(c2 - 0.75, 0) / CAST(ct AS DOUBLE))" +
      " + ((0.75 * n1fw) / CAST(ct AS DOUBLE))" +
      " * (CAST(n1bw AS DOUBLE) / ntypes)"
    Q(
      "ext_text_kneser_ney",
      s"""WITH tok AS (SELECT ${TextAnalysis.toksSql} AS ts FROM documents),
         |bg AS (
         |  SELECT unnest(ts[1:len(ts)-1]) AS w1, unnest(ts[2:len(ts)]) AS w2
         |  FROM tok WHERE len(ts) >= 2),
         |cnt AS (
         |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg
         |  GROUP BY w1, w2),
         |fw AS (
         |  SELECT w1, CAST(SUM(c2) AS BIGINT) AS ct,
         |    CAST(COUNT(*) AS BIGINT) AS n1fw
         |  FROM cnt GROUP BY w1),
         |bw AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1bw FROM cnt
         |  GROUP BY w2),
         |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntypes FROM cnt)
         |SELECT w1, w2, c2, $pkn AS p_kn
         |FROM cnt JOIN fw USING (w1) JOIN bw USING (w2) CROSS JOIN nt
         |ORDER BY c2 DESC, w1, w2 LIMIT 100""".stripMargin
    ) { (s, d) =>
      val cnt = Tables.documents(s, d)
        .select(TextAnalysis.toks(col("text")).as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ts)-2)," +
            " i -> struct(ts[i] AS w1, ts[i+1] AS w2))")).as("bg"))
        .select(col("bg.w1"), col("bg.w2"))
        .groupBy("w1", "w2")
        .agg(count(lit(1)).cast("long").as("c2"))
      val fw = cnt.groupBy("w1")
        .agg(sum(col("c2")).as("ct"), count(lit(1)).as("n1fw"))
      val bw = cnt.groupBy("w2").agg(count(lit(1)).as("n1bw"))
      val nt = cnt.agg(count(lit(1)).as("ntypes"))
      cnt.join(fw, Seq("w1")).join(bw, Seq("w2"))
        .crossJoin(broadcast(nt))
        .select(col("w1"), col("w2"), col("c2"),
          (greatest(col("c2") - lit(0.75), lit(0)) / col("ct").cast("double")
            + (lit(0.75) * col("n1fw")) / col("ct").cast("double")
              * (col("n1bw").cast("double") / col("ntypes")))
            .as("p_kn"))
        .orderBy(col("c2").desc, col("w1"), col("w2"))
        .limit(100)
    }
  }

  def all: Seq[Q] = Seq(bigramLm, curriculumBuckets, weightedSample,
    kneserNey)
}
