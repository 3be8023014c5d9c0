package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] classifier calibration audit (reliability diagram + per-bin
  * calibration gap — Guo et al., "On calibration of modern neural
  * networks", ICML'17 §2): before a pipeline TRUSTS a quality/language
  * scorer enough to filter 100 TB on it, it must know whether score 0.8
  * actually means "right 80% of the time". The declared scorer under
  * audit is the en-marker heuristic: p = min(1, 5 * marker_ratio) (the
  * [[TextAnalysis]] stopword feature, rescaled to [0,1]); ground truth is
  * the fixture `lang` label.
  *
  * Ten equal-width score bins; per bin: support, positives, mean score,
  * empirical positive rate, |gap| — the reliability curve an ECE sums.
  *
  * Determinism: EVERYTHING is integer arithmetic until one final exact
  * division by 10^4 — per-doc scores become scaled ints via the
  * [[TextAnalysis.r4]] construction done wholly in BIGINT division
  * (`(2*num*10^4 + den) // (2*den)`), bins come from integer division of
  * the unrounded ratio, and bin means/rates re-apply the same integer
  * half-up form to integer sums. No double ROUND anywhere, so the
  * shortest-decimal-vs-binary tie class is structurally absent.
  *
  * Scale shape: one projection over documents, one map-side-combined
  * 10-row aggregate. Nothing else.
  */
object ModelEval {

  val calibration: Q = {
    import TextAnalysis.{countInSql, en, toksSql}
    Q(
      "ext_eval_calibration",
      s"""WITH f AS (
         |  SELECT lang, len($toksSql) AS nt, ${countInSql(en)} AS ne
         |  FROM documents),
         |s AS (
         |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |    LEAST((10 * LEAST(5 * ne, nt)) // nt, 9) AS bin,
         |    (2 * LEAST(5 * ne, nt) * 10000 + nt) // (2 * nt) AS k
         |  FROM f WHERE nt > 0),
         |b AS (
         |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(y) AS BIGINT) AS n_pos,
         |    CAST(SUM(k) AS BIGINT) AS sk
         |  FROM s GROUP BY bin),
         |g AS (
         |  SELECT bin, n, n_pos,
         |    (2 * sk + n) // (2 * n) AS km,
         |    (2 * n_pos * 10000 + n) // (2 * n) AS kf
         |  FROM b)
         |SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
         |  km / 10000.0 AS mean_score, kf / 10000.0 AS frac_pos,
         |  ABS(kf - km) / 10000.0 AS abs_gap
         |FROM g ORDER BY bin""".stripMargin
    ) { (s, d) =>
      val f = Tables.documents(s, d)
        .select(col("lang"),
          size(TextAnalysis.toks(col("text"))).cast("long").as("nt"),
          TextAnalysis.countIn(TextAnalysis.toks(col("text")), en).as("ne"))
        .filter(col("nt") > 0)
        .select(
          when(col("lang") === "en", lit(1L)).otherwise(lit(0L)).as("y"),
          least(expr("(10 * least(5 * ne, nt)) div nt"), lit(9L)).as("bin"),
          expr("(2 * least(5 * ne, nt) * 10000 + nt) div (2 * nt)").as("k"))
      f.groupBy("bin")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
          sum(col("k")).as("sk"))
        .select(col("bin").cast("long").as("bin"), col("n"), col("n_pos"),
          expr("(2 * sk + n) div (2 * n)").as("km"),
          expr("(2 * n_pos * 10000 + n) div (2 * n)").as("kf"))
        .select(col("bin"), col("n"), col("n_pos"),
          (col("km") / lit(10000.0)).as("mean_score"),
          (col("kf") / lit(10000.0)).as("frac_pos"),
          (abs(col("kf") - col("km")) / lit(10000.0)).as("abs_gap"))
        .orderBy("bin")
    }
  }

  val all: Seq[Q] = Seq(calibration)
}
