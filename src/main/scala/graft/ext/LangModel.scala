package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import graft.core.Eager.EagerCheckpoint
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
      // cnt SIZE-GATED (round 20; the round-19 unconditional checkpoint
      // was rejected — the fw/bw/nt/probe replans of a fixture-scale
      // subtree are cheaper than the barrier, A/B ~flat here and 2x
      // SLOWER on ext_lm_kn_heldout — but each replan re-tokenizes the
      // corpus, which dominates at 100 TB; see eagerCheckpointAtScale)
      val cntM = cnt.eagerCheckpointAtScale()
      val fw = cntM.groupBy("w1")
        .agg(sum(col("c2")).as("ct"), count(lit(1)).as("n1fw"))
      val bw = cntM.groupBy("w2").agg(count(lit(1)).as("n1bw"))
      val nt = cntM.agg(count(lit(1)).as("ntypes"))
      cntM.join(fw, Seq("w1")).join(bw, Seq("w2"))
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

  /** Held-out perplexity under the Kneser-Ney bigram model — the CCNet
    * quality-filter shape (Wenzek et al. LREC'20 §4.3: train an LM on
    * reference text, score candidate documents by perplexity, drop the
    * tail). Unlike [[kneserNey]] (which scores the training corpus
    * itself, so every bigram is seen), this row TRAINS on the `train`
    * side of the [[Profiling.splitAssign]] md5-prefix split and scores
    * the held-out ~12 % — so the backoff paths a deployed filter actually
    * exercises (unseen pair / unseen context / unseen continuation) all
    * fire and are separately counted per document.
    *
    * Model: interpolated KN with D = 0.75 for a seen context
    * (`max(c12-D,0)/c1 + D·N1+(w1,·)/c1 · pc(w2)`), pure continuation
    * probability for an unseen one, where the continuation distribution
    * is add-one smoothed over continuation TYPE counts —
    * `pc(w2) = (N1+(·,w2)+1) / (N1+(··) + |conts| + 1)` — so an
    * out-of-vocabulary continuation still gets the strictly positive
    * floor `1/(N1+(··)+|conts|+1)` and `ln(p)` is always finite.
    *
    * Scale shape: train counts aggregate to vocabulary² scale with
    * map-side combine; held-out bigram tf is ~12 % of the corpus at
    * (doc, pair) grain. The scoring joins key on pair/context/
    * continuation — all vocabulary-bounded build sides, left to AQE
    * (at 100 TB the vocab tables may exceed broadcast size; nothing is
    * pinned). Only the 2-row constants frame is broadcast. The per-doc
    * reduce is one map-side-combined aggregate; no windows anywhere.
    * Output nll uses the engine-wide FLOOR(x·1e4+0.5)/1e4 half-up (the
    * [[TextAnalysis.unigramNll]] precedent: ln's last-ulp and per-doc
    * float-sum order noise sit orders of magnitude below the grain).
    */
  val knHeldout: Q = {
    val pcSql = "((COALESCE(bw.n1bw, 0) + 1.0) / (ntypes + nconts + 1.0))"
    Q(
      "ext_lm_kn_heldout",
      s"""WITH tok AS (
         |  SELECT doc_id,
         |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1eb8' AS held,
         |    ${TextAnalysis.toksSql} AS ts
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id, held,
         |    unnest(ts[1:len(ts)-1]) AS w1, unnest(ts[2:len(ts)]) AS w2
         |  FROM tok WHERE len(ts) >= 2),
         |cnt AS (
         |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg
         |  WHERE NOT held GROUP BY w1, w2),
         |fw AS (
         |  SELECT w1, CAST(SUM(c2) AS BIGINT) AS ct,
         |    CAST(COUNT(*) AS BIGINT) AS n1fw
         |  FROM cnt GROUP BY w1),
         |bw AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1bw FROM cnt
         |  GROUP BY w2),
         |nt AS (SELECT
         |  CAST((SELECT COUNT(*) FROM cnt) AS BIGINT) AS ntypes,
         |  CAST((SELECT COUNT(*) FROM bw) AS BIGINT) AS nconts),
         |ho AS (
         |  SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS htf FROM bg
         |  WHERE held GROUP BY doc_id, w1, w2),
         |sc AS (
         |  SELECT ho.doc_id, ho.htf,
         |    CASE WHEN fw.w1 IS NULL THEN 1 ELSE 0 END AS octx,
         |    CASE WHEN bw.w2 IS NULL THEN 1 ELSE 0 END AS ocnt,
         |    CASE WHEN fw.w1 IS NULL THEN $pcSql
         |      ELSE (GREATEST(COALESCE(cnt.c2, 0) - 0.75, 0)
         |          / CAST(fw.ct AS DOUBLE))
         |        + ((0.75 * fw.n1fw) / CAST(fw.ct AS DOUBLE)) * $pcSql
         |    END AS p
         |  FROM ho
         |  LEFT JOIN cnt ON cnt.w1 = ho.w1 AND cnt.w2 = ho.w2
         |  LEFT JOIN fw ON fw.w1 = ho.w1
         |  LEFT JOIN bw ON bw.w2 = ho.w2
         |  CROSS JOIN nt)
         |SELECT doc_id, CAST(SUM(htf) AS BIGINT) AS n_bigrams,
         |  CAST(SUM(htf * octx) AS BIGINT) AS oov_ctx,
         |  CAST(SUM(htf * ocnt) AS BIGINT) AS oov_cont,
         |  FLOOR(-SUM(htf * ln(p)) / SUM(htf) * 10000 + 0.5) / 10000.0
         |    AS nll
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val bg = Tables.documents(s, d)
        .select(col("doc_id"),
          (substring(fast_md5(s, col("doc_id").cast("string")), 1, 4)
            < "1eb8").as("held"),
          TextAnalysis.toks(col("text")).as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(col("doc_id"), col("held"), explode(expr(
          "transform(sequence(0, size(ts)-2)," +
            " i -> struct(ts[i] AS w1, ts[i+1] AS w2))")).as("b"))
        .select(col("doc_id"), col("held"), col("b.w1"), col("b.w2"))
        // bg/cnt SIZE-GATED (round 20; the round-19 unconditional
        // checkpoints were rejected — 0.54 -> 1.10 s at the bench
        // protocol, the replanned explode+agg over a fixture-scale base
        // is cheaper than two barriers — but each bg replan re-tokenizes
        // the whole corpus, the dominant term at 100 TB; see
        // eagerCheckpointAtScale)
        .eagerCheckpointAtScale()
      val cnt = bg.filter(!col("held")).groupBy("w1", "w2")
        .agg(count(lit(1)).cast("long").as("c2"))
        .eagerCheckpointAtScale()
      val fw = cnt.groupBy("w1")
        .agg(sum(col("c2")).as("ct"), count(lit(1)).as("n1fw"))
      val bw = cnt.groupBy("w2").agg(count(lit(1)).as("n1bw"))
      val nt = cnt.agg(count(lit(1)).as("ntypes"))
        .crossJoin(bw.agg(count(lit(1)).as("nconts")))
      val ho = bg.filter(col("held")).groupBy("doc_id", "w1", "w2")
        .agg(count(lit(1)).cast("long").as("htf"))
      val pc = (coalesce(col("n1bw"), lit(0L)) + lit(1.0)) /
        (col("ntypes") + col("nconts") + lit(1.0))
      val p = when(col("ct").isNull, pc)
        .otherwise(
          (greatest(coalesce(col("c2"), lit(0L)) - lit(0.75), lit(0.0))
            / col("ct").cast("double"))
            + ((lit(0.75) * col("n1fw")) / col("ct").cast("double")) * pc)
      ho.join(cnt, Seq("w1", "w2"), "left")
        .join(fw, Seq("w1"), "left")
        .join(bw, Seq("w2"), "left")
        .crossJoin(broadcast(nt))
        .select(col("doc_id"), col("htf"),
          when(col("ct").isNull, 1L).otherwise(0L).as("octx"),
          when(col("n1bw").isNull, 1L).otherwise(0L).as("ocnt"),
          p.as("p"))
        .groupBy("doc_id")
        .agg(sum(col("htf")).cast("long").as("n_bigrams"),
          sum(col("htf") * col("octx")).cast("long").as("oov_ctx"),
          sum(col("htf") * col("ocnt")).cast("long").as("oov_cont"),
          (floor(-sum(col("htf") * log(col("p"))) / sum(col("htf"))
            * 10000 + 0.5) / 10000.0).as("nll"))
        .orderBy("doc_id")
    }
  }

  def all: Seq[Q] = Seq(bigramLm, curriculumBuckets, weightedSample,
    kneserNey, knHeldout)
}
