package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import graft.core.Eager.EagerCheckpoint

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

  private[ext] val GdRounds = 12
  private val GdLr = 4.0
  private val Dim = 64

  /** In-engine logistic-regression LINEAR PROBE over the embedding
    * corpus (batch gradient descent, lr = [[GdLr]], [[GdRounds]] rounds):
    * 64 vector dimensions + bias, target = the macro-class split
    * `label < 5`. This is the probe/quality-classifier loop a pipeline
    * runs ON the engine (fastText-style filters; GPT-3 §A's quality
    * classifier; "linear probing" evals) instead of exporting 100 TB to
    * a trainer: each round is ONE map-side-combined aggregate producing
    * a 65-number gradient; only the weight vector leaves the engine.
    * (A text-feature variant was tried first and learned nothing — the
    * fixture's lang labels are independent of surface features; the
    * embedding space genuinely separates this target, and the spec pins
    * accuracy above the majority baseline.)
    *
    * Determinism for an iterative float trainer (the [[Clustering]]
    * discipline): z is bias + a strictly sequential 64-dim fold
    * ([[graft.functions.VecDot]] vs the same `list_reduce`), so scores
    * and the z >= 0 decision match bit-for-bit given identical weights;
    * the only order-dependent step — gradient sums (whose sigmoid inputs
    * may also differ in EXP's last ulp) — is snapped to ROUND(.,6) at
    * every update; the oracle re-derives all rounds as chained
    * MATERIALIZED CTEs from its own weights. Accuracy is an exact
    * integer r4 ratio.
    */
  val embedLogreg: Q = {
    import Similarity.dotSql
    val lrLit = "4" // integer literal: exact in both engines
    val rounds = (1 to GdRounds).map { r =>
      val p = s"w${r - 1}"
      s"""g$r AS MATERIALIZED (
         |  SELECT y, e, 1 / (1 + EXP(-(pw.wb
         |    + ${dotSql("pw.wv", "e")}))) AS s
         |  FROM f CROSS JOIN $p pw),
         |d$r AS MATERIALIZED (
         |  SELECT i, SUM(e[i] * (y - s)) AS gi
         |  FROM g$r CROSS JOIN
         |    (SELECT unnest(generate_series(1, $Dim)) AS i) ii
         |  GROUP BY i),
         |w$r AS MATERIALIZED (
         |  SELECT
         |    (SELECT ROUND((SELECT wb FROM $p)
         |      + $lrLit * SUM(y - s) / (SELECT n FROM nn), 6) FROM g$r)
         |      AS wb,
         |    (SELECT list(ROUND(pw.wv[d.i]
         |        + $lrLit * d.gi / (SELECT n FROM nn), 6) ORDER BY d.i)
         |      FROM d$r d CROSS JOIN $p pw) AS wv)""".stripMargin
    }.mkString(",\n")
    val wf = s"w$GdRounds"
    Q(
      "ext_embed_logreg",
      s"""WITH f AS MATERIALIZED (
         |  SELECT CASE WHEN label < 5 THEN 1 ELSE 0 END AS y,
         |    embedding::DOUBLE[] AS e
         |  FROM embeddings),
         |nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),
         |w0 AS MATERIALIZED (SELECT 0.0 AS wb,
         |  list_transform(generate_series(1, $Dim), i -> 0.0) AS wv),
         |$rounds,
         |fin AS MATERIALIZED (
         |  SELECT y, CASE WHEN (pw.wb
         |    + ${dotSql("pw.wv", "e")}) >= 0
         |    THEN 1 ELSE 0 END AS yh
         |  FROM f CROSS JOIN $wf pw),
         |acc AS (
         |  SELECT ${TextAnalysis.r4Sql(
           "COUNT(CASE WHEN yh = y THEN 1 END)", "COUNT(*)")} AS train_acc
         |  FROM fin)
         |SELECT idx, weight, (SELECT train_acc FROM acc) AS train_acc
         |FROM (
         |  SELECT CAST(0 AS BIGINT) AS idx, (SELECT wb FROM $wf) AS weight
         |  UNION ALL
         |  SELECT CAST(i AS BIGINT), (SELECT wv FROM $wf)[i]
         |  FROM (SELECT unnest(generate_series(1, $Dim)) AS i) ii)
         |ORDER BY idx""".stripMargin
    ) { (s, d) =>
      import graft.functions.VecDot.vec_dot
      val f = Tables.embeddings(s, d)
        .select(
          when(col("label") < 5, lit(1L)).otherwise(lit(0L)).as("y"),
          col("embedding").cast("array<double>").as("e"))
        .eagerCheckpoint()
      def z(wb: Double, wv: Array[Double]) =
        lit(wb) + vec_dot(s, typedLit(wv.toSeq), col("e"))
      var wb = 0.0
      var wv = Array.fill(Dim)(0.0)
      def snap(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      // Round fusion (round 17, the ext_embed_logreg weak-row fix).
      // The frame is 2,000 rows x 65 dims at sf0.1 — each round's
      // actual arithmetic is microseconds, and profiling showed the
      // per-round cost was Catalyst re-ANALYZING and re-optimizing a
      // 65-aggregate plan 12 times (literal weights made every round a
      // new plan; even with weights as a broadcast relation, each
      // round is a fresh QueryExecution through the full rule
      // pipeline). The gradient is a fixed 65-number sufficient
      // statistic over a cached frame — genuinely imperative
      // per-partition work — so the inner loop runs as mapPartitions
      // over the ONE converted-and-cached RDD with the weights in a
      // broadcast: one job per round, no per-round analysis, no
      // exchange. This is the documented last-resort mapPartitions
      // case (the DataFrame form re-plans 12x for zero optimizer
      // benefit — there is nothing to push down or reorder in a full
      // fold), and the driver still only ever sees O(dims x
      // partitions) numbers per round.
      //
      // Bit-exactness to the retired DataFrame form: the fold applies
      // the SAME ops in the SAME order — z = wb + a strictly
      // sequential dot (the VecDot order), sig via java.lang.Math.exp
      // (what Catalyst's EXP codegen calls), per-column accumulators
      // added in row order within a partition, partitions merged in
      // partition-index order (the old final-agg merge order was
      // ARRIVAL order, so any cross-partition last-ulp wiggle was
      // already absorbed by the ROUND(6) snap both engines share).
      val data = {
        import s.implicits._
        f.as[(Long, Array[Double])].rdd
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      data.count() // materialize once, outside the round loop
      (1 to GdRounds).foreach { _ =>
        val bcW = s.sparkContext.broadcast((wb, wv))
        val partials = data.mapPartitionsWithIndex { (pi, it) =>
          val (wbL, wvL) = bcW.value
          val acc = new Array[Double](Dim + 1)
          var n = 0L
          it.foreach { case (y, e) =>
            var z = wbL
            var i = 0
            while (i < Dim) { z += wvL(i) * e(i); i += 1 }
            val d = y.toDouble - 1.0 / (1.0 + java.lang.Math.exp(-z))
            acc(0) += d
            i = 0
            while (i < Dim) { acc(i + 1) += e(i) * d; i += 1 }
            n += 1
          }
          Iterator((pi, n, acc))
        }.collect().sortBy(_._1)
        bcW.destroy()
        val n = partials.map(_._2).sum.toDouble
        def tot(j: Int): Double = {
          // partition-index-order merge: deterministic run over run
          var t = 0.0
          partials.foreach { case (_, _, a) => t += a(j) }
          t
        }
        wb = snap(wb + GdLr * tot(0) / n)
        wv = Array.tabulate(Dim)(j => snap(wv(j) + GdLr * tot(j + 1) / n))
      }
      data.unpersist(false)
      val acc = f.agg(TextAnalysis.r4(
        count(when((when(z(wb, wv) >= 0, lit(1L)).otherwise(lit(0L)))
          === col("y"), lit(1))),
        count(lit(1))).as("train_acc"))
      import s.implicits._
      val rows = (0L, wb) +: (0 until Dim).map(j => ((j + 1).toLong, wv(j)))
      rows.toDF("idx", "weight")
        .crossJoin(broadcast(acc))
        .orderBy("idx")
    }
  }

  val all: Seq[Q] = Seq(calibration, embedLogreg)
}
