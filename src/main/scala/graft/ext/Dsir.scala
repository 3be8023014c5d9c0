package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import graft.core.Eager.EagerCheckpoint
import graft.ext.TextAnalysis.{countIn, countInSql, en, toks, toksSql}

/** Data Selection with Importance Resampling (DSIR, Xie et al.
  * NeurIPS'23): score every document by how much more likely its hashed
  * n-gram profile is under a target (reference-quality) distribution than
  * under the raw-source distribution — `log w(d) = sum_ngram
  * [ln p_T(h(g)) - ln p_S(h(g))]` — then resample by weight. This row
  * computes the weights; the resampling half is [[Corpus.weightedSample]]'s
  * md5-priority idiom applied to any weight column.
  *
  * Target distribution stand-in: stopword-dense documents
  * (`n_stop * 10 >= n_tokens`, a pure integer predicate so both engines
  * split identically) — the paper's target is a curated corpus like
  * Wikipedia; stopword density is this fixture's deterministic proxy for
  * "natural English".
  *
  * Hashed features are BIGRAMS (the paper's choice) bucketed to B = 256
  * via the engine-paired md5 idiom (`conv(substr(md5(w1 ' ' w2),1,12))
  * % B` == DuckDB `('0x' || substr(md5(..),1,12))::UBIGINT::BIGINT % B`).
  * Both bucket LMs are add-one smoothed over the B buckets.
  *
  * Scale shape: bucket-count table is <= B rows -> broadcast; totals are
  * a broadcast 1-row frame; the per-doc reduce is one map-side-combined
  * aggregate over (doc, bucket) tf rows. The corpus is scanned once —
  * the (doc,tgt,bucket) grain feeds both the bucket counts and the
  * per-doc term sum. ln noise sits ~1e-13 below the engine-wide
  * FLOOR(x*1e4+0.5)/1e4 half-up grain.
  */
object Dsir {
  private val B = 256

  val dsirWeights: Q = Q(
    "ext_dsir_weights",
    s"""WITH tok AS (
       |  SELECT doc_id, $toksSql AS ts, ${countInSql(en)} AS n_stop
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, ts, (n_stop * 10 >= len(ts)) AS tgt
       |  FROM tok WHERE len(ts) >= 2),
       |bg AS (
       |  SELECT doc_id, tgt,
       |    ('0x' || substr(md5(w1 || ' ' || w2), 1, 12))::UBIGINT::BIGINT
       |      % $B AS bucket
       |  FROM (SELECT doc_id, tgt, unnest(ts[1:len(ts)-1]) AS w1,
       |          unnest(ts[2:len(ts)]) AS w2 FROM base)),
       |bk AS (
       |  SELECT bucket,
       |    CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |    CAST(SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS cs
       |  FROM bg GROUP BY bucket),
       |tot AS (
       |  SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cs) AS BIGINT)
       |    AS ns FROM bk),
       |dtf AS (
       |  SELECT doc_id, tgt, bucket, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM bg GROUP BY doc_id, tgt, bucket)
       |SELECT doc_id, tgt AS is_target,
       |  CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       |  FLOOR(SUM(tf * (ln((ct + 1.0) / (nt + $B.0))
       |                - ln((cs + 1.0) / (ns + $B.0)))) * 10000 + 0.5)
       |    / 10000.0 AS log_w
       |FROM dtf JOIN bk USING (bucket) CROSS JOIN tot
       |GROUP BY doc_id, tgt ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val base = Tables.documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("ts"),
        countIn(toks(col("text")), en).as("n_stop"))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), col("ts"),
        (col("n_stop") * 10 >= size(col("ts"))).as("tgt"))
    val bg = base
      .select(col("doc_id"), col("tgt"), explode(expr(
        "transform(sequence(0, size(ts)-2)," +
          " i -> concat(ts[i], ' ', ts[i+1]))")).as("g"))
      .select(col("doc_id"), col("tgt"),
        expr(s"cast(conv(substring(md5(g), 1, 12), 16, 10) as bigint)" +
          s" % $B").as("bucket"))
    // ONE pass over the hashed-bigram stream (round 19, guide §1/§5):
    // dtf is the finest aggregate, so the bucket censuses derive from
    // IT (sum of tf == row count per bucket, exactly) instead of from
    // bg — previously bg's scan+explode+md5 subtree was planned three
    // times (bk, tot-via-bk, dtf). dtf is checkpointed once (per-doc
    // hashed-vocabulary frame, thousands of times smaller than the
    // bigram stream) and bk/tot/probe all read the materialized blocks.
    val dtf = bg.groupBy("doc_id", "tgt", "bucket")
      .agg(count(lit(1)).as("tf"))
      .eagerCheckpoint()
    val bk = dtf.groupBy("bucket").agg(
      sum(when(col("tgt"), col("tf")).otherwise(0L)).as("ct"),
      sum(when(col("tgt"), 0L).otherwise(col("tf"))).as("cs"))
    val tot = bk.agg(sum("ct").as("nt"), sum("cs").as("ns"))
    dtf.join(broadcast(bk), Seq("bucket"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"), col("tgt").as("is_target"))
      .agg(sum("tf").cast("long").as("n_bigrams"),
        (floor(sum(col("tf") *
          (log((col("ct") + 1.0) / (col("nt") + B.toDouble))
            - log((col("cs") + 1.0) / (col("ns") + B.toDouble))))
          * 10000 + 0.5) / 10000.0).as("log_w"))
      .orderBy("doc_id")
  }

  def all: Seq[Q] = Seq(dsirWeights)
}
