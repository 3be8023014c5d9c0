package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
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
    * linear score. All ratios are per-row IEEE arithmetic + scale-4 rounds,
    * so they are bit-identical across engines. */
  val quality: Q = Q(
    "ext_text_quality",
    s"""SELECT doc_id, n_tokens,
       |ROUND(n_stop * 1.0 / n_tokens, 4) AS stopword_ratio,
       |ROUND(n_punct * 1.0 / len(text), 4) AS punct_ratio,
       |ROUND(len(replace(text, ' ', '')) * 1.0 / n_tokens, 4) AS avg_word_len,
       |ROUND(0.5 * (n_stop * 1.0 / n_tokens)
       |  + 0.3 * (CASE WHEN n_tokens >= 20 THEN 1.0 ELSE n_tokens / 20.0 END)
       |  + 0.2 * (1.0 - n_punct * 1.0 / len(text)), 4) AS quality_score
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
    val stopRatio = col("n_stop") * lit(1.0) / col("n_tokens")
    val punctRatio = col("n_punct") * lit(1.0) / length(col("text"))
    f.select(
      col("doc_id"), col("n_tokens"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(punctRatio, 4).as("punct_ratio"),
      round(length(regexp_replace(col("text"), " ", "")) * lit(1.0)
        / col("n_tokens"), 4).as("avg_word_len"),
      round(lit(0.5) * stopRatio
        + lit(0.3) * when(col("n_tokens") >= 20, 1.0)
          .otherwise(col("n_tokens") / lit(20.0))
        + lit(0.2) * (lit(1.0) - punctRatio), 4).as("quality_score"))
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

  val all: Seq[Q] = Seq(tokens, quality, langId, fingerprint)
}
