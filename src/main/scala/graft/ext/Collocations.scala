package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import TextAnalysis.{toks, toksSql}

/** [EXT] corpus-level lexical statistics: collocation mining (PMI-lift
  * term pairs) and the vocabulary growth curve (Heaps' law) — the two
  * curves a tokenizer/vocab-budget decision reads off a new corpus.
  *
  * Both ops keep every count exact-integer and express the one ratio
  * each needs in parts-per-million integer arithmetic, so the rows are
  * BIGINT-exact across engines (the [[SkewAudit]] discipline).
  */
object Collocations {

  private val TopVocab = 50
  private val MinCodocs = 5

  /** Top-20 within-document collocations among the TopVocab most
    * frequent terms, ranked by PMI-lift in ppm:
    * lift = P(a,b) / (P(a) P(b)) = c_ab * n_docs / (df_a * df_b).
    *
    * Scale shape: the candidate vocabulary is capped (top-50 by df,
    * term-asc tiebreak) and BROADCAST, so the per-doc pair expansion is
    * bounded by C(50,2) regardless of corpus size; document bodies
    * never ride a shuffle (the doc->term frame is terms only). This is
    * the standard collocation-mining shape (Manning & Schuetze ch. 5)
    * with the df cap making it corpus-scale-safe.
    */
  val collocations: Q = Q(
    "ext_text_collocations",
    s"""WITH tokd AS (
       |  SELECT DISTINCT doc_id, unnest($toksSql) AS t FROM documents),
       |df AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tokd
       |       GROUP BY t),
       |top AS (SELECT t, df FROM df ORDER BY df DESC, t LIMIT $TopVocab),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
       |dt AS (SELECT tokd.doc_id, tokd.t, top.df FROM tokd
       |       JOIN top ON top.t = tokd.t),
       |pairs AS (
       |  SELECT x.t AS a, y.t AS b, x.df AS df_a, y.df AS df_b,
       |    CAST(COUNT(*) AS BIGINT) AS c_ab
       |  FROM dt x JOIN dt y ON x.doc_id = y.doc_id AND x.t < y.t
       |  GROUP BY 1, 2, 3, 4)
       |SELECT a, b, df_a, df_b, c_ab,
       |  CAST(c_ab * n_docs * 1000000 // (df_a * df_b) AS BIGINT)
       |    AS lift_ppm
       |FROM pairs CROSS JOIN n
       |WHERE c_ab >= $MinCodocs
       |ORDER BY lift_ppm DESC, a, b LIMIT 20""".stripMargin
  ) { (s, d) =>
    val tokd = Tables.documents(s, d)
      .select(col("doc_id"), explode(array_distinct(toks(col("text"))))
        .as("t"))
    val df = tokd.groupBy("t").agg(count(lit(1)).as("df"))
    val top = df.orderBy(col("df").desc, col("t")).limit(TopVocab)
    val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val dt = tokd.join(broadcast(top), Seq("t"))
    val pairs = dt.as("x").join(dt.as("y"),
        col("x.doc_id") === col("y.doc_id") && col("x.t") < col("y.t"))
      .groupBy(col("x.t").as("a"), col("y.t").as("b"),
        col("x.df").as("df_a"), col("y.df").as("df_b"))
      .agg(count(lit(1)).as("c_ab"))
    pairs.filter(col("c_ab") >= MinCodocs)
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("df_a"), col("df_b"), col("c_ab"),
        expr("c_ab * n_docs * 1000000 div (df_a * df_b)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("a"), col("b")).limit(20)
  }

  /** Vocabulary growth (Heaps' law) curve, sampled at 10 equal
    * doc-id-RANGE checkpoints: d_k = min + (max - min) * k / 10. Using
    * the value range instead of rank deciles keeps the op window-free —
    * each checkpoint is three conditional aggregates (docs, tokens,
    * first-occurrence terms <= d_k), so nothing ranks or sorts the doc
    * frame at any scale. vocab_k counts terms whose FIRST occurrence
    * (min doc_id) is within the prefix — exactly the "new types seen so
    * far" census Heaps' law describes.
    */
  val vocabGrowth: Q = Q(
    "ext_vocab_growth",
    s"""WITH docs AS (
       |  SELECT doc_id, len($toksSql) AS n_toks FROM documents),
       |ft AS (
       |  SELECT t, MIN(doc_id) AS first_doc FROM (
       |    SELECT doc_id, unnest($toksSql) AS t FROM documents) x
       |  GROUP BY t),
       |span AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM docs),
       |ck AS (
       |  SELECT k, lo + (hi - lo) * k // 10 AS cut
       |  FROM span CROSS JOIN
       |    (SELECT unnest(generate_series(1, 10)) AS k))
       |SELECT CAST(ck.k AS BIGINT) AS k, ck.cut AS cutoff_doc_id,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM docs
       |     WHERE doc_id <= ck.cut) AS docs_k,
       |  (SELECT CAST(SUM(n_toks) AS BIGINT) FROM docs
       |     WHERE doc_id <= ck.cut) AS tokens_k,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ft
       |     WHERE first_doc <= ck.cut) AS vocab_k
       |FROM ck ORDER BY k""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), size(toks(col("text"))).cast("long")
        .as("n_toks"))
    val ft = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
      .groupBy("t").agg(min(col("doc_id")).as("first_doc"))
    val span = docs.agg(min(col("doc_id")).as("lo"),
      max(col("doc_id")).as("hi"))
    val ck = span.select(explode(sequence(lit(1L), lit(10L))).as("k"),
        col("lo"), col("hi"))
      .select(col("k"), expr("lo + (hi - lo) * k div 10").as("cut"))
    val byCut = docs.crossJoin(broadcast(ck))
      .filter(col("doc_id") <= col("cut"))
      .groupBy("k", "cut")
      .agg(count(lit(1)).as("docs_k"), sum(col("n_toks")).as("tokens_k"))
    val vocab = ft.crossJoin(broadcast(ck))
      .filter(col("first_doc") <= col("cut"))
      .groupBy("k").agg(count(lit(1)).as("vocab_k"))
    byCut.join(vocab, Seq("k"))
      .select(col("k"), col("cut").as("cutoff_doc_id"), col("docs_k"),
        col("tokens_k"), col("vocab_k"))
      .orderBy("k")
  }

  /** Zipf's-law fit over the top-100 vocabulary: OLS slope/intercept/r²
    * of ln(freq) on ln(rank) — the companion diagnostic to
    * [[vocabGrowth]] (Heaps up, Zipf down: together they size a
    * tokenizer's vocabulary budget). Counts and ranks are exact
    * integers with a deterministic (cnt DESC, term) tiebreak; the five
    * regression sums fold in rank order with identical IEEE chains both
    * engines (the [[Stats]] chi2 discipline — ln is the established
    * cross-engine-exact transcendental, the `ext_text_bm25` precedent).
    */
  val zipfFit: Q = Q(
    "ext_vocab_zipf",
    s"""WITH cnts AS (
       |  SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM (
       |    SELECT unnest($toksSql) AS t FROM documents) x
       |  GROUP BY t),
       |ranked AS (
       |  SELECT row_number() OVER (ORDER BY c DESC, t) AS r, c
       |  FROM cnts ORDER BY c DESC, t LIMIT 100),
       |pts AS (
       |  SELECT list(ln(CAST(r AS DOUBLE)) ORDER BY r) AS xs,
       |    list(ln(CAST(c AS DOUBLE)) ORDER BY r) AS ys,
       |    CAST(COUNT(*) AS BIGINT) AS m
       |  FROM ranked),
       |sums AS (
       |  SELECT m, xs, ys,
       |    list_reduce(list_prepend(0.0, xs), (a, x) -> a + x) AS sx,
       |    list_reduce(list_prepend(0.0, ys), (a, x) -> a + x) AS sy,
       |    list_reduce(list_prepend(0.0, list_transform(
       |      generate_series(1, CAST(m AS INTEGER)),
       |      i -> xs[i] * ys[i])), (a, x) -> a + x) AS sxy,
       |    list_reduce(list_prepend(0.0, list_transform(
       |      generate_series(1, CAST(m AS INTEGER)),
       |      i -> xs[i] * xs[i])), (a, x) -> a + x) AS sxx,
       |    list_reduce(list_prepend(0.0, list_transform(
       |      generate_series(1, CAST(m AS INTEGER)),
       |      i -> ys[i] * ys[i])), (a, x) -> a + x) AS syy
       |  FROM pts)
       |SELECT m AS n_terms_fit,
       |  ROUND((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS slope,
       |  ROUND((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m,
       |    6) AS intercept,
       |  ROUND(((m * sxy - sx * sy) * (m * sxy - sx * sy))
       |    / ((m * sxx - sx * sx) * (m * syy - sy * sy)), 6) AS r2
       |FROM sums""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val cnts = Tables.documents(s, d)
      .select(explode(toks(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    // top-100 FIRST (TakeOrderedAndProject — distributed), then rank
    // inside the 100-row frame: ranking before the limit would sort the
    // whole vocabulary through one window task for the same 100 ranks
    val ranked = cnts.orderBy(col("c").desc, col("t")).limit(100)
      .withColumn("r", row_number().over(
        Window.orderBy(col("c").desc, col("t"))))
    val pts = ranked.agg(
      transform(array_sort(collect_list(struct(col("r"), col("c")))),
        st => log(st("r").cast("double"))).as("xs"),
      transform(array_sort(collect_list(struct(col("r"), col("c")))),
        st => log(st("c").cast("double"))).as("ys"),
      count(lit(1)).as("m"))
    def fold(c: org.apache.spark.sql.Column) =
      aggregate(c, lit(0.0), (a, x) => a + x)
    val sums = pts.select(col("m"), col("xs"), col("ys"),
      fold(col("xs")).as("sx"), fold(col("ys")).as("sy"),
      fold(expr("transform(sequence(1, cast(m as int)), " +
        "i -> element_at(xs, i) * element_at(ys, i))")).as("sxy"),
      fold(expr("transform(sequence(1, cast(m as int)), " +
        "i -> element_at(xs, i) * element_at(xs, i))")).as("sxx"),
      fold(expr("transform(sequence(1, cast(m as int)), " +
        "i -> element_at(ys, i) * element_at(ys, i))")).as("syy"))
    // ROUND(.,6) at the boundary: DuckDB's ln and Java's Math.log differ
    // in the last ulp for some inputs (measured 2.7e-15 relative on this
    // fixture) — the annLsh cosine precedent absorbs it
    sums.select(col("m").as("n_terms_fit"),
      round((col("m") * col("sxy") - col("sx") * col("sy"))
        / (col("m") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
      round((col("sy") - (col("m") * col("sxy") - col("sx") * col("sy"))
        / (col("m") * col("sxx") - col("sx") * col("sx")) * col("sx"))
        / col("m"), 6).as("intercept"),
      round(((col("m") * col("sxy") - col("sx") * col("sy"))
        * (col("m") * col("sxy") - col("sx") * col("sy")))
        / ((col("m") * col("sxx") - col("sx") * col("sx"))
          * (col("m") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
  }

  /** Gini coefficient of document lengths — the corpus-inequality
    * number a mixing/packing decision reads (0 = uniform lengths,
    * -> 1 = a few giant docs dominate). Exact integer arithmetic on the
    * COMPRESSED (length, count) frame (the mann-whitney shape): with
    * cumBefore docs shorter than a length v held by c docs,
    * num = SUM v·(2·c·cumBefore + c·(c+1) − c·(n+1)) and
    * den = n·SUM(v·c) give G = num/den exactly; emitted as integer ppm
    * with the final multiply in DECIMAL(38,0)/HUGEINT (num·10⁶ grazes
    * i64 at fixture scale already). The rank window walks distinct
    * length values, never the doc frame.
    */
  val lengthGini: Q = Q(
    "ext_corpus_len_gini",
    """WITH lc AS (
      |  SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1),
      |cum AS (
      |  SELECT v, c,
      |    COALESCE(SUM(c) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cum_before
      |  FROM lc),
      |tot AS (
      |  SELECT CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(SUM(v * c) AS BIGINT) AS s FROM lc),
      |g AS (
      |  SELECT CAST(SUM(v * (2 * c * cum_before + c * (c + 1)
      |      - c * (n + 1))) AS BIGINT) AS num,
      |    MAX(n) AS n, MAX(s) AS s
      |  FROM cum CROSS JOIN tot)
      |SELECT n AS n_docs, s AS total_chars,
      |  CAST(num::HUGEINT * 1000000 // (n::HUGEINT * s) AS BIGINT)
      |    AS gini_ppm
      |FROM g""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val lc = Tables.documents(s, d)
      .groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("c"))
    val cum = lc.withColumn("cum_before",
      coalesce(sum(col("c")).over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val tot = lc.agg(sum(col("c")).cast("long").as("n"),
      sum(col("v") * col("c")).cast("long").as("s"))
    cum.crossJoin(broadcast(tot))
      .agg(
        sum(col("v") * (lit(2) * col("c") * col("cum_before")
          + col("c") * (col("c") + 1) - col("c") * (col("n") + 1)))
          .cast("long").as("num"),
        max(col("n")).as("n"), max(col("s")).as("s"))
      .select(col("n").as("n_docs"), col("s").as("total_chars"),
        expr("cast(cast(num as decimal(38,0)) * 1000000 div " +
          "(cast(n as decimal(38,0)) * s) as bigint)").as("gini_ppm"))
  }

  def all: Seq[Q] = Seq(collocations, vocabGrowth, zipfFit, lengthGini)
}
