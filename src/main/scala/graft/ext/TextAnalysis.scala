package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import graft.core.Eager.EagerCheckpoint
import graft.functions.RollingHash.rolling_hash

/** [EXT] text-analysis operators over the `documents` fixture: language ID
  * (stopword-marker heuristic), quality scoring, token counting, and
  * document fingerprinting.
  *
  * Everything is per-row and codegen-friendly (built-in higher-order
  * functions + one native Expression) — at 100 TB these run as a single
  * scan-project with no shuffle at all; the only shuffle in each query
  * below is the final presentation ORDER BY, which real pipelines omit.
  */
object TextAnalysis {

  /** Whitespace tokens with empties dropped; oracle mirror:
    * `list_filter(string_split_regex(text, '\s+'), t -> t <> '')`. */
  private[ext] def toks(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  private[ext] val toksSql =
    """list_filter(string_split_regex(text, '\s+'), t -> t <> '')"""

  private[ext] def countIn(ts: Column, words: Seq[String]): Column =
    size(filter(ts, t => t.isin(words.map(lit): _*))).cast("long")

  private[ext] def countInSql(words: Seq[String]): String =
    s"""len(list_filter($toksSql, t -> t IN (${words.mkString("'", "', '", "'")})))"""

  /** `ROUND(num/den, 4)` (half-up) computed exactly in integer arithmetic,
    * for `num/den` already scaled by 10^4: `floor((2*num + den) / (2*den))`.
    * Spark's `round` on doubles goes through the shortest-decimal string
    * (`BigDecimal.valueOf`) while DuckDB rounds the raw binary double, so a
    * quotient landing on a `...5` boundary rounds differently per engine —
    * observed at sf0.1 (0.5338 vs 0.5337). With every intermediate an exact
    * integer well under 2^53 and the final division correctly rounded, both
    * engines produce bit-identical doubles at any scale. */
  private[ext] def r4frac(num: Column, den: Column): Column =
    floor((lit(2L) * num + den) / (lit(2.0) * den)) / lit(10000.0)

  private[ext] def r4fracSql(num: String, den: String): String =
    s"floor((2*($num) + ($den)) / (2.0*($den))) / 10000.0"

  /** `ROUND(p/q, 4)` exact-integer form (see [[r4frac]]). */
  private[ext] def r4(p: Column, q: Column): Column =
    r4frac(p * lit(10000L), q)

  private[ext] def r4Sql(p: String, q: String): String =
    r4fracSql(s"($p) * 10000", q)

  /** The quality linear score scaled by 10^4, as an exact integer fraction
    * over token/punctuation counts (pair with [[r4frac]] and denominator
    * `n_tokens * n_len`):
    * `0.5*(ns/nt) + 0.3*min(1, nt/20) + 0.2*(1 - np/len)`. */
  private[ext] def scoreNum(ns: Column, nt: Column, np: Column,
      ln: Column): Column =
    lit(5000L) * ns * ln + lit(150L) * least(nt, lit(20L)) * nt * ln +
      lit(2000L) * (ln - np) * nt

  private[ext] def scoreNumSql(ns: String, nt: String, np: String,
      ln: String): String =
    s"(5000*$ns*$ln + 150*LEAST($nt, 20)*$nt*$ln + 2000*($ln - $np)*$nt)"

  // Marker (stopword) sets per language — tiny n-gram-free heuristic.
  private[ext] val en = Seq("the", "a", "and", "of", "to", "in", "is")
  private val es = Seq("el", "la", "de", "que", "y", "un", "es")
  private val de = Seq("der", "die", "das", "und", "ist", "ein")
  private val fr = Seq("le", "les", "et", "des", "une", "est")

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation). */
  val tokens: Q = Q(
    "ext_text_tokens",
    s"""SELECT doc_id, len($toksSql) AS n_tokens,
       |len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
       |  AS n_bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_tokens"),
        regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"))
          .cast("long").as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Quality scoring: length / punctuation / stopword-ratio features and a
    * linear score. Every rounded ratio goes through the exact-integer
    * half-up form ([[r4]]/[[r4frac]]) so Spark and the oracle are
    * bit-identical at any scale. */
  val quality: Q = Q(
    "ext_text_quality",
    s"""SELECT doc_id, n_tokens,
       |${r4Sql("n_stop", "n_tokens")} AS stopword_ratio,
       |${r4Sql("n_punct", "len(text)")} AS punct_ratio,
       |${r4Sql("len(replace(text, ' ', ''))", "n_tokens")} AS avg_word_len,
       |${r4fracSql(scoreNumSql("n_stop", "n_tokens", "n_punct", "len(text)"),
                    "n_tokens * len(text)")} AS quality_score
       |FROM (
       |  SELECT doc_id, text, len($toksSql) AS n_tokens,
       |    ${countInSql(en)} AS n_stop,
       |    len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct
       |  FROM documents) f
       |WHERE n_tokens > 0 ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val f = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        size(toks(col("text"))).cast("long").as("n_tokens"),
        countIn(toks(col("text")), en).as("n_stop"),
        regexp_count(col("text"), lit("[^a-zA-Z0-9\\s]")).cast("long")
          .as("n_punct"))
      .filter(col("n_tokens") > 0)
    val ln = length(col("text")).cast("long")
    f.select(
      col("doc_id"), col("n_tokens"),
      r4(col("n_stop"), col("n_tokens")).as("stopword_ratio"),
      r4(col("n_punct"), ln).as("punct_ratio"),
      r4(length(regexp_replace(col("text"), " ", "")).cast("long"),
        col("n_tokens")).as("avg_word_len"),
      r4frac(scoreNum(col("n_stop"), col("n_tokens"), col("n_punct"), ln),
        col("n_tokens") * ln).as("quality_score"))
      .orderBy("doc_id")
  }

  /** The language decision as a reusable expression over `text` (used by
    * [[langId]] and [[Corpus.pipelineCleanse]]): argmax of the marker
    * counts with a fixed preference chain (en > es > de > fr), 'und' when
    * nothing matches. */
  private[ext] def langPred(text: Column): Column = {
    val Seq(sEn, sEs, sDe, sFr) =
      Seq(en, es, de, fr).map(ws => countIn(toks(text), ws))
    when(sEn === 0 && sEs === 0 && sDe === 0 && sFr === 0, "und")
      .when(sEn >= sEs && sEn >= sDe && sEn >= sFr, "en")
      .when(sEs >= sDe && sEs >= sFr, "es")
      .when(sDe >= sFr, "de")
      .otherwise("fr")
  }

  private[ext] val langPredSql: String =
    s"""CASE
       |  WHEN ${countInSql(en)} = 0 AND ${countInSql(es)} = 0
       |    AND ${countInSql(de)} = 0 AND ${countInSql(fr)} = 0 THEN 'und'
       |  WHEN ${countInSql(en)} >= ${countInSql(es)}
       |    AND ${countInSql(en)} >= ${countInSql(de)}
       |    AND ${countInSql(en)} >= ${countInSql(fr)} THEN 'en'
       |  WHEN ${countInSql(es)} >= ${countInSql(de)}
       |    AND ${countInSql(es)} >= ${countInSql(fr)} THEN 'es'
       |  WHEN ${countInSql(de)} >= ${countInSql(fr)} THEN 'de'
       |  ELSE 'fr' END""".stripMargin

  /** Language ID: per-language marker counts, argmax with a fixed
    * preference chain (en > es > de > fr), 'und' when nothing matches. */
  val langId: Q = Q(
    "ext_text_langid",
    s"""SELECT doc_id, s_en, s_es, s_de, s_fr,
       |CASE
       |  WHEN s_en = 0 AND s_es = 0 AND s_de = 0 AND s_fr = 0 THEN 'und'
       |  WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |  WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
       |  WHEN s_de >= s_fr THEN 'de'
       |  ELSE 'fr' END AS lang_pred
       |FROM (
       |  SELECT doc_id,
       |    ${countInSql(en)} AS s_en, ${countInSql(es)} AS s_es,
       |    ${countInSql(de)} AS s_de, ${countInSql(fr)} AS s_fr
       |  FROM documents) scores
       |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val scored = Tables.documents(s, d).select(
      col("doc_id"),
      countIn(toks(col("text")), en).as("s_en"),
      countIn(toks(col("text")), es).as("s_es"),
      countIn(toks(col("text")), de).as("s_de"),
      countIn(toks(col("text")), fr).as("s_fr"))
    scored.select(col("doc_id"), col("s_en"), col("s_es"), col("s_de"),
      col("s_fr"),
      when(col("s_en") === 0 && col("s_es") === 0 && col("s_de") === 0
        && col("s_fr") === 0, "und")
        .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de")
          && col("s_en") >= col("s_fr"), "en")
        .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
        .when(col("s_de") >= col("s_fr"), "de")
        .otherwise("fr").as("lang_pred"))
      .orderBy("doc_id")
  }

  /** Language-ID CONFUSION MATRIX — the estimator-quality row for
    * [[langId]] (the `ext_eval_ann_recall` discipline applied to a
    * classifier): predictions joined to the fixture's ground-truth
    * `lang` column, rolled up per (true, predicted) class. The fixture
    * contains `zh` documents the stopword heuristic has no class for —
    * those rows land off-diagonal by construction, which is exactly the
    * honesty this row exists to keep visible (a production pipeline
    * gates classifier upgrades on this matrix).
    *
    * Scale shape: per-doc scoring is row-local ([[langId]]); the join
    * key is doc_id (narrow, high-cardinality) and the rollup keys on a
    * (langs+1)^2 class space — one corpus scan, one tiny aggregate. */
  val langIdConfusion: Q = Q(
    "ext_langid_confusion",
    s"""WITH preds AS (
       |${langId.oracle.get})
       |SELECT d.lang AS lang_true, p.lang_pred,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM preds p JOIN documents d ON d.doc_id = p.doc_id
       |GROUP BY 1, 2 ORDER BY lang_true, lang_pred""".stripMargin
  ) { (s, d) =>
    langId.fn(s, d)
      .join(Tables.documents(s, d).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .groupBy(col("lang").as("lang_true"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang_true", "lang_pred")
  }

  /** Fingerprints: (a) md5 of the whitespace-normalized text, (b) md5 of
    * the sorted token bag (order-insensitive), (c) the Karp-Rabin rolling
    * hash — a native codegen Expression ([[graft.functions.RollingHash]]),
    * oracle-mirrored as a list_reduce over code points. */
  val fingerprint: Q = Q(
    "ext_text_fingerprint",
    s"""SELECT doc_id,
       |md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp_norm,
       |md5(array_to_string(list_sort($toksSql), ' ')) AS fp_bow,
       |list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split(text, ''),
       |    c -> CAST(unicode(c) AS BIGINT))),
       |  (acc, x) -> (acc * 31 + x) % 1000000007) AS fp_roll
       |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
          .as("fp_norm"),
        md5(concat_ws(" ", array_sort(toks(col("text"))))).as("fp_bow"),
        rolling_hash(s, col("text")).as("fp_roll"))
      .orderBy("doc_id")
  }

  /** Repetition signals (the Gopher/MassiveText quality-filter family —
    * Rae et al., "Scaling Language Models: Methods, Analysis & Insights
    * from Training Gopher", arXiv:2112.11446 §A1.1): fraction of token
    * mass in the single most frequent token, in the most frequent word
    * 2-gram, and in 2-grams occurring more than once. High values mark
    * boilerplate / templated / degenerate documents that pretraining
    * corpora drop.
    *
    * Scale shape: one token explode and one 2-gram explode, each
    * aggregated with (doc_id, gram) then doc_id keys — both shuffles are
    * per-document, so the plan partitions by corpus slice and survives
    * any corpus width. Map-side partial aggregation collapses the
    * per-doc gram counts before the exchange; the final join is
    * doc_id-equality between two already-aggregated (narrow) sides. All
    * ratios go through the exact-integer [[r4]] so both engines emit
    * bit-identical doubles. */
  val repetition: Q = Q(
    "ext_text_repetition",
    s"""WITH t1 AS (
       |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       |c1 AS (
       |  SELECT doc_id, tok, COUNT(*) AS c FROM t1 GROUP BY doc_id, tok),
       |u AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |    CAST(MAX(c) AS BIGINT) AS top_tok
       |  FROM c1 GROUP BY doc_id),
       |g2 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
       |    i -> tk[i] || ' ' || tk[i+1])) AS gram
       |  FROM (SELECT doc_id, $toksSql AS tk FROM documents)
       |  WHERE len(tk) >= 2),
       |c2 AS (
       |  SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram),
       |b AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_2grams,
       |    CAST(MAX(c) AS BIGINT) AS top_2gram,
       |    CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_2gram
       |  FROM c2 GROUP BY doc_id)
       |SELECT u.doc_id, u.n_tokens,
       |  ${r4Sql("u.top_tok", "u.n_tokens")} AS top_token_frac,
       |  ${r4Sql("b.top_2gram", "b.n_2grams")} AS top_2gram_frac,
       |  ${r4Sql("b.dup_2gram", "b.n_2grams")} AS dup_2gram_frac
       |FROM u JOIN b ON u.doc_id = b.doc_id
       |ORDER BY u.doc_id""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val uni = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), max("c").as("top_tok"))
    val tk = toks(col("text"))
    val bi = docs
      .select(col("doc_id"), tk.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_2grams"), max("c").as("top_2gram"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_2gram"))
    uni.join(bi, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        r4(col("top_tok"), col("n_tokens")).as("top_token_frac"),
        r4(col("top_2gram"), col("n_2grams")).as("top_2gram_frac"),
        r4(col("dup_2gram"), col("n_2grams")).as("dup_2gram_frac"))
      .orderBy("doc_id")
  }

  /** C4-style line-level dedup audit (Raffel et al., "Exploring the
    * Limits of Transfer Learning", JMLR'20 §2.2 — public methodology):
    * a sentence repeated anywhere in the corpus is kept only at its
    * first occurrence (smallest doc_id, then position) and counted as
    * removed everywhere else. The global coordination is ONE shuffle on
    * the line fingerprint — narrow, high-cardinality md5 — and the
    * per-doc report is a second narrow shuffle on doc_id; the full text
    * of a line never leaves the scan. Emits per-doc kept/removed counts
    * (the writer applies them; raw integers, engine-exact). */
  val lineDedup: Q = Q(
    "ext_text_line_dedup",
    """WITH l AS (
      |  SELECT doc_id,
      |    unnest(generate_series(1, len(parts))) AS pos,
      |    unnest(list_transform(parts, p -> trim(p))) AS line
      |  FROM (SELECT doc_id, string_split_regex(text, '\. ') AS parts
      |        FROM documents) t),
      |k AS (
      |  SELECT doc_id,
      |    row_number() OVER (PARTITION BY md5(line)
      |      ORDER BY doc_id, pos) AS rn
      |  FROM l WHERE line <> '')
      |SELECT doc_id, COUNT(*) AS n_lines,
      |COUNT(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
      |COUNT(CASE WHEN rn > 1 THEN 1 END) AS n_removed
      |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val lines = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(split(col("text"), "\\. ")).as(Seq("pos0", "seg")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"),
        trim(col("seg")).as("line"))
      .filter(col("line") =!= "")
    lines
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(graft.functions.FastMd5.fast_md5(s, col("line")))
          .orderBy("doc_id", "pos")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("rn") === 1, 1)).as("n_kept"),
        count(when(col("rn") > 1, 1)).as("n_removed"))
      .orderBy("doc_id")
  }

  /** Fixed keyword query for [[bm25]] — one rare term (df ~5% of docs on
    * the fixture) and two common ones, so idf spread actually orders the
    * results. */
  private val Bm25Terms = Seq("dup", "spark", "query")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  /** BM25 top-20 retrieval (Robertson-Spärck Jones; the Okapi BM25
    * formula as given in Robertson & Zaragoza, "The Probabilistic
    * Relevance Framework: BM25 and Beyond", FnTIR'09 §3.3) for a fixed
    * keyword query — the retrieval primitive a curation pipeline runs
    * for targeted decontamination / topic probes over a corpus.
    *
    * Scale shape: the token explode is filtered to the query's terms
    * BEFORE any aggregate (the exploded stream shrinks to ~|terms|
    * matches per doc immediately); per-doc tf is a map-side-combined
    * hash aggregate; df and N/avgdl are term-count-sized and 1-row
    * aggregates broadcast to the scoring join; doc length comes from a
    * scan-local `size(tokens)` projection, never a second explode. The
    * only corpus-wide shuffle is the tf aggregate on (doc_id, term).
    * Top-20 is a TakeOrderedAndProject, not a global sort.
    *
    * Determinism: every arithmetic step is IEEE-exact on identical
    * inputs except `ln` (libm last-ulp may differ across engines) and
    * the <=3-term sum (order-dependent in the last ulp); both are
    * buried by a 4-decimal half-up computed as FLOOR(x*1e4 + 0.5)/1e4 —
    * pure IEEE multiply/add/floor/divide, bit-identical in both engines
    * on identical inputs, unlike ROUND(double, n), whose shortest-
    * decimal (Spark) vs binary (DuckDB) semantics diverge on ...5
    * boundaries (the documented r4frac hazard). The rank ORDER uses the
    * rounded score with a doc_id tiebreak so ordering cannot straddle
    * an ulp. */
  val bm25: Q = Q(
    "ext_text_bm25",
    s"""WITH dl AS (
       |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS dl
       |  FROM documents),
       |stats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
       |tok AS (
       |  SELECT doc_id, unnest($toksSql) AS t FROM documents),
       |tf AS (
       |  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
       |  WHERE t IN (${Bm25Terms.mkString("'", "', '", "'")})
       |  GROUP BY doc_id, t),
       |df AS (
       |  SELECT t, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM tok WHERE t IN (${Bm25Terms.mkString("'", "', '", "'")})
       |  GROUP BY t),
       |scored AS (
       |  SELECT tf.doc_id,
       |    FLOOR(SUM(
       |      ln((n - df + 0.5) / (df + 0.5) + 1.0)
       |        * tf * ($Bm25K1 + 1.0)
       |        / (tf + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * dl / avgdl))
       |    ) * 10000 + 0.5) / 10000.0 AS bm25
       |  FROM tf JOIN df ON tf.t = df.t
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats
       |  GROUP BY tf.doc_id)
       |SELECT doc_id, bm25 FROM scored
       |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
  ) { (s, d) =>
    val dl = Tables.documents(s, d)
      .select(col("doc_id"), size(toks(col("text"))).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("long").as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val qtok = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
      .filter(col("t").isin(Bm25Terms: _*))
    val tf = qtok.groupBy("doc_id", "t")
      .agg(count(lit(1)).cast("long").as("tf"))
    val df = qtok.groupBy("t")
      .agg(countDistinct(col("doc_id")).cast("long").as("df"))
    val contrib =
      log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
        col("tf") * (lit(Bm25K1) + 1.0) /
        (col("tf") + lit(Bm25K1) *
          (lit(1.0) - Bm25B + lit(Bm25B) * col("dl") / col("avgdl")))
    tf.join(broadcast(df), Seq("t"))
      .join(dl, Seq("doc_id"))
      .join(broadcast(stats))
      .groupBy("doc_id")
      .agg((floor(sum(contrib) * 10000 + 0.5) / 10000.0).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  /** Per-document mean unigram negative log-likelihood under the
    * corpus's own token distribution — the deterministic cousin of the
    * LM-perplexity quality filter (CCNet, Wenzek et al. LREC'20 §4.3:
    * score text by LM NLL, drop the tail). Low = typical text; high =
    * rare-token / degenerate documents. A unigram model keeps the score
    * a pure function of the table (no trained weights), so the oracle
    * replays it bit-for-bit modulo ln's last ulp, buried by the same
    * FLOOR(x*1e4 + 0.5)/1e4 half-up as [[bm25]] (pure IEEE ops — never
    * ROUND(double, n), whose engines' semantics diverge on ...5
    * boundaries; the per-doc sum runs over DISTINCT terms
    * tf-weighted, ~vocabulary-sized, so float-sum order noise stays
    * orders of magnitude below the rounding grain).
    *
    * Scale shape: ONE token explode feeding the per-(doc, term) tf
    * aggregate (map-side combine); the corpus distribution is a
    * vocabulary-sized aggregate broadcast to the scoring join; the
    * per-doc reduce shuffles (doc_id, term-count) rows only. */
  val unigramNll: Q = Q(
    "ext_text_unigram_nll",
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($toksSql) AS t FROM documents),
       |tf AS (
       |  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
       |  GROUP BY doc_id, t),
       |vocab AS (
       |  SELECT t, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY t),
       |total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vocab)
       |SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
       |  FLOOR(-SUM(tf.tf * ln(vocab.cnt / CAST(total.n AS DOUBLE)))
       |    / SUM(tf.tf) * 10000 + 0.5) / 10000.0 AS nll
       |FROM tf JOIN vocab ON vocab.t = tf.t CROSS JOIN total
       |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin
  ) { (s, d) => nllPerDoc(s, d).orderBy("doc_id") }

  /** (doc_id, n_tokens, nll) frame behind [[unigramNll]] — shared with
    * [[LangModel.curriculumBuckets]]'s difficulty ordering. */
  private[ext] def nllPerDoc(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    // SIZE-GATED checkpoint (round 20): tf feeds vocab, total and the
    // probe — three plans of the tokenize+explode+agg subtree. The
    // round-19 unconditional checkpoint measured SLOWER at fixture
    // scale (ext_text_unigram_nll 0.67 -> 0.92 s; the barrier +
    // materialization jobs cost more than the replans of a small scan),
    // but at 100 TB three corpus-scale tokenize passes dwarf one
    // vocabulary-frame materialization. eagerCheckpointAtScale encodes
    // exactly that flip: no-op below
    // spark.graft.checkpoint.minInputBytes, checkpoint above.
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
      .groupBy("doc_id", "t")
      .agg(count(lit(1)).cast("long").as("tf"))
      .eagerCheckpointAtScale()
    val vocab = tf.groupBy("t").agg(sum(col("tf")).cast("long").as("cnt"))
    val total = vocab.agg(sum(col("cnt")).cast("long").as("n"))
    tf.join(broadcast(vocab), Seq("t"))
      .join(broadcast(total))
      .groupBy("doc_id")
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        (floor(-sum(col("tf") * log(col("cnt") / col("n").cast("double")))
          / sum(col("tf")) * 10000 + 0.5) / 10000.0).as("nll"))
  }

  /** The oracle CTE computing (doc_id, n_tokens, nll) — [[nllPerDoc]]'s
    * SQL mirror, shared with the curriculum oracle. */
  private[ext] val nllPerDocSql: String =
    s"""tok AS (
       |  SELECT doc_id, unnest($toksSql) AS t FROM documents),
       |tf AS (
       |  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
       |  GROUP BY doc_id, t),
       |vocab AS (
       |  SELECT t, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY t),
       |total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vocab),
       |nlls AS (
       |  SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
       |    FLOOR(-SUM(tf.tf * ln(vocab.cnt / CAST(total.n AS DOUBLE)))
       |      / SUM(tf.tf) * 10000 + 0.5) / 10000.0 AS nll
       |  FROM tf JOIN vocab ON vocab.t = tf.t CROSS JOIN total
       |  GROUP BY tf.doc_id)""".stripMargin

  /** Hybrid retrieval: reciprocal-rank fusion (Cormack, Clarke &
    * Buettcher, "Reciprocal Rank Fusion outperforms Condorcet and
    * individual rank learning methods", SIGIR'09 — the standard RAG
    * two-ranker fuse) of the [[bm25]] lexical top-20 and a cosine
    * semantic top-20 against probe vector 0. RRF(d) = Σ 1/(60 + rank_d);
    * with exactly two rankers the sum has at most two addends, so the
    * double arithmetic is order-independent and the gate hash-matches
    * without rounding.
    *
    * Scale shape: each ranker is independently scale-safe (BM25 =
    * aggregate-compressed term join + TakeOrdered; cosine = broadcast
    * probe + TakeOrdered); the fusion joins two CONSTANT-size (≤20 row)
    * lists — the rank windows run over top-k output, never corpus rows. */
  val hybridRetrieval: Q = Q(
    "ext_hybrid_retrieval",
    s"""WITH dl AS (
       |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS dl
       |  FROM documents),
       |stats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
       |tok AS (
       |  SELECT doc_id, unnest($toksSql) AS t FROM documents),
       |tf AS (
       |  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
       |  WHERE t IN (${Bm25Terms.mkString("'", "', '", "'")})
       |  GROUP BY doc_id, t),
       |df AS (
       |  SELECT t, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM tok WHERE t IN (${Bm25Terms.mkString("'", "', '", "'")})
       |  GROUP BY t),
       |scored AS (
       |  SELECT tf.doc_id,
       |    FLOOR(SUM(
       |      ln((n - df + 0.5) / (df + 0.5) + 1.0)
       |        * tf * ($Bm25K1 + 1.0)
       |        / (tf + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * dl / avgdl))
       |    ) * 10000 + 0.5) / 10000.0 AS bm25
       |  FROM tf JOIN df ON tf.t = df.t
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats
       |  GROUP BY tf.doc_id),
       |lex AS (SELECT doc_id, bm25 FROM scored
       |  ORDER BY bm25 DESC, doc_id LIMIT 20),
       |lexr AS (SELECT doc_id,
       |  ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM lex),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |p AS (SELECT e AS pe FROM v WHERE vec_id = 0),
       |semt AS (SELECT vec_id AS doc_id,
       |    round(${Similarity.dotSql("e", "pe")}
       |      / (${Similarity.normSql("e")} * ${Similarity.normSql("pe")}),
       |      6) AS cos
       |  FROM v CROSS JOIN p WHERE vec_id <> 0),
       |sem AS (SELECT doc_id, cos FROM semt
       |  ORDER BY cos DESC, doc_id LIMIT 20),
       |semr AS (SELECT doc_id,
       |  ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS r FROM sem),
       |fused AS (
       |  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
       |    COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.r), 0)
       |      + COALESCE(CAST(1.0 AS DOUBLE) / (60 + s.r), 0) AS rrf
       |  FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id)
       |SELECT doc_id, rrf FROM fused
       |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VecDot.vec_dot
    val lex = bm25.fn(s, d) // (doc_id, bm25) top-20, already ordered
    val lexr = lex
      .withColumn("r",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("doc_id"), col("r").as("rl"))
    val v = Similarity.vecs(s, d)
    val probe = v.filter(col("vec_id") === 0)
      .select(col("e").as("pe"), col("nrm").as("pn"))
    val sem = v.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id").as("doc_id"),
        round(vec_dot(s, col("e"), col("pe")) / (col("nrm") * col("pn")), 6)
          .as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(20)
    val semr = sem
      .withColumn("r",
        row_number().over(Window.orderBy(col("cos").desc, col("doc_id"))))
      .select(col("doc_id"), col("r").as("rs"))
    lexr.join(semr, Seq("doc_id"), "outer")
      .select(col("doc_id"),
        (coalesce(lit(1.0) / (lit(60) + col("rl")), lit(0.0))
          + coalesce(lit(1.0) / (lit(60) + col("rs")), lit(0.0))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  /** Subword tokenization — greedy longest-match vocabulary encode (the
    * MaxMatch/WordPiece apply step; the learn step is `ext_bpe_pair
    * _counts`) via the codegen'd [[graft.functions.SubwordEncode]]
    * expression, gate-checked on the corpus-wide token histogram (top
    * 100 by frequency), which pins the exact token STREAM, not just
    * counts. The oracle replays the same greedy loop as a recursive CTE
    * over per-DISTINCT-word states, weighting by word frequency — an
    * optimization the Spark side doesn't need: encode is a pre-shuffle
    * codegen'd projection, and the only exchange is the token-count
    * partial aggregate feeding a TakeOrderedAndProject. The single
    * source for the vocabulary is [[graft.functions.SubwordEncode.
    * Vocab]], interpolated into this SQL. */
  val subwordTokenize: Q = Q(
    "ext_tokenize_subword",
    s"""WITH RECURSIVE vocab(v) AS (
       |  SELECT unnest([${graft.functions.SubwordEncode.Vocab
            .map(v => s"'$v'").mkString(", ")}])),
       |words AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
       |    AS w FROM documents),
       |dw AS (SELECT w, COUNT(*) AS wn FROM words GROUP BY w),
       |steps(w, rem, tok) AS (
       |  SELECT w, w, CAST(NULL AS VARCHAR) FROM dw
       |  UNION ALL
       |  SELECT w, substr(rem, length(tok2) + 1), tok2 FROM (
       |    SELECT w, rem, (SELECT max_by(v, length(v)) FROM vocab
       |      WHERE starts_with(rem, v)) AS tok2
       |    FROM steps WHERE rem <> '') s
       |  WHERE tok2 IS NOT NULL),
       |toks AS (SELECT w, tok FROM steps WHERE tok IS NOT NULL)
       |SELECT t.tok AS token, CAST(SUM(dw.wn) AS BIGINT) AS n
       |FROM toks t JOIN dw USING (w)
       |GROUP BY t.tok ORDER BY n DESC, token LIMIT 100""".stripMargin
  ) { (s, d) =>
    val enc = (c: Column) =>
      graft.functions.SubwordEncode.subword_encode(s, c)
    // row-parallel fan-out (same rule as ext_dedup_substring): the word
    // explode + encode must not ride a single file split's partition
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .repartition(col("doc_id"))
      .select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .select(explode(enc(col("w"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(100)
  }

  /** Tokenizer fertility per language — the census a multilingual
    * pipeline runs when sizing/choosing a tokenizer (fertility =
    * subwords per word; high fertility on a language means the vocab
    * under-serves it — Conneau & Lample '19 report exactly this table
    * for XLM). Composes two verified signals: [[langPred]] (the
    * ext_text_langid estimator) labels each document; the codegen'd
    * [[graft.functions.SubwordEncode]] greedy encode (the
    * ext_tokenize_subword apply step) counts subwords per word.
    *
    * Scale shape: language label is a pre-shuffle projection; the word
    * explode is row-parallel after the doc_id repartition (the
    * ext_tokenize_subword rule); the only exchange is the 5-group
    * partial aggregate. The oracle replays the greedy encode as the
    * same recursive CTE over DISTINCT words, then joins word
    * occurrences — fertility ratios in exact integer arithmetic
    * ([[r4]]). Docs with no `[a-z]+` word carry no tokenizer signal and
    * are absent from every column (n_docs counts scored docs). */
  val tokFertility: Q = Q(
    "ext_tok_fertility",
    s"""WITH RECURSIVE vocab(v) AS (
       |  SELECT unnest([${graft.functions.SubwordEncode.Vocab
            .map(v => s"'$v'").mkString(", ")}])),
       |d AS (SELECT doc_id, $langPredSql AS lang,
       |    regexp_extract_all(lower(text), '[a-z]+') AS ws
       |  FROM documents),
       |w AS (SELECT doc_id, lang, unnest(ws) AS w FROM d),
       |dw AS (SELECT w FROM w GROUP BY w),
       |steps(w, rem, tok) AS (
       |  SELECT w, w, CAST(NULL AS VARCHAR) FROM dw
       |  UNION ALL
       |  SELECT w, substr(rem, length(tok2) + 1), tok2 FROM (
       |    SELECT w, rem, (SELECT max_by(v, length(v)) FROM vocab
       |      WHERE starts_with(rem, v)) AS tok2
       |    FROM steps WHERE rem <> '') s
       |  WHERE tok2 IS NOT NULL),
       |nsub AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS ns FROM steps
       |  WHERE tok IS NOT NULL GROUP BY w)
       |SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(length(w.w)) AS BIGINT) AS n_chars,
       |  CAST(SUM(ns) AS BIGINT) AS n_subwords,
       |  ${r4Sql("SUM(ns)", "COUNT(*)")} AS fertility,
       |  ${r4Sql("SUM(length(w.w))", "SUM(ns)")} AS chars_per_subword
       |FROM w JOIN nsub USING (w)
       |GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, d) =>
    val enc = (c: Column) =>
      graft.functions.SubwordEncode.subword_encode(s, c)
    Tables.documents(s, d)
      .select(col("doc_id"), langPred(col("text")).as("lang"),
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("ws"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), col("lang"), explode(col("ws")).as("w"))
      .select(col("doc_id"), col("lang"), length(col("w")).cast("long")
        .as("nc"), size(enc(col("w"))).cast("long").as("ns"))
      .groupBy("lang")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_words"),
        sum("nc").as("n_chars"),
        sum("ns").as("n_subwords"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_chars"),
        col("n_subwords"),
        r4(col("n_subwords"), col("n_words")).as("fertility"),
        r4(col("n_chars"), col("n_subwords")).as("chars_per_subword"))
      .orderBy("lang")
  }

  val all: Seq[Q] =
    Seq(tokens, quality, langId, langIdConfusion, fingerprint, repetition,
      lineDedup, bm25, unigramNll, hybridRetrieval, subwordTokenize,
      tokFertility)
}
