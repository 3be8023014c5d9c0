package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] dataset profiling and split assignment — the audit surface a
  * training-data pipeline runs before anything trains on a corpus.
  *
  * `ext_profile_table` is the classic "profile every column in one pass"
  * op (null counts, exact distinct cardinality, canonical min/max) over
  * `orders`. `ext_split_assign` is the deterministic train/val/test
  * assignment + distribution audit over `documents`.
  */
object Profiling {

  /** (column, canonical string renderer for its min/max). Renderers run
    * AFTER the typed min/max (min of the value, then render — not min of
    * the rendering, which would be lexicographic for numerics). Each
    * rendering is chosen to be bit-identical cross-engine:
    * integers/strings verbatim, timestamps via a fixed format, and the
    * 2-decimal money column as integer cents (a double's decimal
    * formatting is NOT engine-stable; its rounded cents are — see
    * [[graft.core.Determinism]]).
    */
  private val profSpecs: Seq[(String, Column => Column)] = Seq(
    ("o_orderkey", (c: Column) => c.cast("string")),
    ("o_custkey", (c: Column) => c.cast("string")),
    ("o_orderstatus", (c: Column) => c),
    ("o_orderpriority", (c: Column) => c),
    ("o_orderdate", (c: Column) => date_format(c, "yyyy-MM-dd HH:mm:ss")),
    ("o_totalprice",
      (c: Column) => round(c * 100).cast("long").cast("string")))

  /** Single-pass table profile: one row per column with null count, exact
    * distinct count, canonical min/max. ONE aggregate over the table
    * computes all 6 columns' stats: Catalyst plans the multi
    * `count(distinct)` via Expand — a single scan whose shuffle carries
    * ~6x (column-tagged) rows, all map-side partially aggregated. At
    * 100 TB that is the profile you can afford: one pass, no per-column
    * re-scan; if even the 6x expansion is too hot, the same plan swaps
    * `count_distinct` for `approx_count_distinct` (the tier
    * `ext_approx_distinct` demonstrates) and the expansion disappears.
    * The 6-stat row -> 6 rows explode runs on a 1-row input: free.
    */
  val profileTable: Q = Q(
    "ext_profile_table",
    """WITH a AS (SELECT COUNT(*) AS n_rows,
      |  COUNT(o_orderkey) AS c1, COUNT(DISTINCT o_orderkey) AS d1,
      |    MIN(o_orderkey) AS mn1, MAX(o_orderkey) AS mx1,
      |  COUNT(o_custkey) AS c2, COUNT(DISTINCT o_custkey) AS d2,
      |    MIN(o_custkey) AS mn2, MAX(o_custkey) AS mx2,
      |  COUNT(o_orderstatus) AS c3, COUNT(DISTINCT o_orderstatus) AS d3,
      |    MIN(o_orderstatus) AS mn3, MAX(o_orderstatus) AS mx3,
      |  COUNT(o_orderpriority) AS c4, COUNT(DISTINCT o_orderpriority) AS d4,
      |    MIN(o_orderpriority) AS mn4, MAX(o_orderpriority) AS mx4,
      |  COUNT(o_orderdate) AS c5, COUNT(DISTINCT o_orderdate) AS d5,
      |    MIN(o_orderdate) AS mn5, MAX(o_orderdate) AS mx5,
      |  COUNT(o_totalprice) AS c6, COUNT(DISTINCT o_totalprice) AS d6,
      |    MIN(o_totalprice) AS mn6, MAX(o_totalprice) AS mx6
      |  FROM orders)
      |SELECT * FROM (
      |  SELECT 'o_orderkey' AS col_name, n_rows, n_rows - c1 AS n_nulls,
      |    d1 AS n_distinct, CAST(mn1 AS VARCHAR) AS min_str,
      |    CAST(mx1 AS VARCHAR) AS max_str FROM a
      |  UNION ALL SELECT 'o_custkey', n_rows, n_rows - c2, d2,
      |    CAST(mn2 AS VARCHAR), CAST(mx2 AS VARCHAR) FROM a
      |  UNION ALL SELECT 'o_orderstatus', n_rows, n_rows - c3, d3,
      |    mn3, mx3 FROM a
      |  UNION ALL SELECT 'o_orderpriority', n_rows, n_rows - c4, d4,
      |    mn4, mx4 FROM a
      |  UNION ALL SELECT 'o_orderdate', n_rows, n_rows - c5, d5,
      |    strftime(mn5, '%Y-%m-%d %H:%M:%S'),
      |    strftime(mx5, '%Y-%m-%d %H:%M:%S') FROM a
      |  UNION ALL SELECT 'o_totalprice', n_rows, n_rows - c6, d6,
      |    CAST(CAST(round(mn6 * 100) AS BIGINT) AS VARCHAR),
      |    CAST(CAST(round(mx6 * 100) AS BIGINT) AS VARCHAR) FROM a) p
      |ORDER BY col_name""".stripMargin
  ) { (s, d) =>
    val aggs = count(lit(1)).as("n_rows") +: profSpecs.flatMap {
      case (n, _) => Seq(
        count(col(n)).as(s"c_$n"),
        count_distinct(col(n)).as(s"d_$n"),
        min(col(n)).as(s"mn_$n"),
        max(col(n)).as(s"mx_$n"))
    }
    val one = Tables.orders(s, d).agg(aggs.head, aggs.tail: _*)
    val rows = profSpecs.map { case (n, render) =>
      struct(
        lit(n).as("col_name"),
        (col("n_rows") - col(s"c_$n")).as("n_nulls"),
        col(s"d_$n").as("n_distinct"),
        render(col(s"mn_$n")).as("min_str"),
        render(col(s"mx_$n")).as("max_str"))
    }
    one.select(col("n_rows"), explode(array(rows: _*)).as("p"))
      .select(col("p.col_name"), col("n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_str"), col("p.max_str"))
      .orderBy("col_name")
  }

  /** Hex-prefix split bounds over md5(doc_id): '028f'/0x10000 ~ 1 % test,
    * the next ~1 % val, the rest train. Same row-local determinism
    * rationale as [[Corpus.sampleStratified]]'s sampling predicate — but
    * where sampling FILTERS, this ASSIGNS: every row gets exactly one of
    * three disjoint, exhaustive labels, stable across engines, retries
    * and repartitioning (a `rand()` split would leak val docs into train
    * on task retry — the exact leakage a held-out split exists to
    * prevent). */
  private val testBound = "028f"
  private val valBound = "051e"

  /** Deterministic train/val/test assignment + the distribution audit a
    * pipeline ships with it: per (source, split) document counts and
    * character mass. The assignment itself is a zero-shuffle
    * scan-project; the audit is one tiny aggregate on a 3x|sources| key
    * space. At 100 TB the labeled scan-project writes the three output
    * corpora partition-locally; only the audit counts move. */
  val splitAssign: Q = Q(
    "ext_split_assign",
    s"""SELECT source,
       |  CASE WHEN k < '$testBound' THEN 'test'
       |       WHEN k < '$valBound' THEN 'val'
       |       ELSE 'train' END AS split,
       |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM (SELECT source, n_chars,
       |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS k
       |      FROM documents) t
       |GROUP BY 1, 2 ORDER BY source, split""".stripMargin
  ) { (s, d) =>
    val k = substring(
      graft.functions.FastMd5.fast_md5(s, col("doc_id").cast("string")), 1, 4)
    Tables.documents(s, d)
      .select(col("source"), col("n_chars"),
        when(k < testBound, "test")
          .when(k < valBound, "val")
          .otherwise("train").as("split"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("source", "split")
  }

  /** Per-source quantile-transform table over document length — the
    * cross-source score calibration a curation pipeline needs before it
    * can compare quality/length scores between corpora with different
    * scales (arXiv abstracts vs web pages): each raw value maps to its
    * within-source CDF position, so a downstream filter like "keep the
    * top 30% of EACH source" is one broadcast-join against this table.
    *
    * Emitted at (source, raw value) grain: count, within-source
    * cumulative count, and the CDF position in permille
    * (floor(1000 * cum / n) — integer-exact, hash-stable). This IS the
    * normalization artifact: O(sources x value domain) rows, built to be
    * broadcast.
    *
    * Scale shape: ONE map-side-combined aggregate reduces the corpus to
    * (source, value) cells; the cumulative window orders each source's
    * cells — a frame bounded by sources x the length domain (hundreds),
    * never by document count. No per-document window anywhere.
    */
  val quantileNormalize: Q = Q(
    "ext_quantile_normalize",
    """WITH cells AS (
      |  SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2),
      |cum AS (
      |  SELECT source, v, c,
      |    CAST(SUM(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT)
      |      AS cum
      |  FROM cells),
      |n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cells
      |  GROUP BY 1)
      |SELECT cum.source, cum.v, cum.c, cum.cum,
      |  (cum.cum * 1000) // n.n AS pct_permille
      |FROM cum JOIN n ON n.source = cum.source
      |ORDER BY cum.source, cum.v""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.documents(s, d)
      .groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = cells.withColumn("cum",
      sum(col("c")).over(Window.partitionBy("source").orderBy("v")))
    val n = cells.groupBy("source").agg(sum(col("c")).cast("long").as("n"))
    cum.join(broadcast(n), Seq("source"))
      .select(col("source"), col("v"), col("c"), col("cum"),
        expr("(cum * 1000) div n").as("pct_permille"))
      .orderBy("source", "v")
  }

  val all: Seq[Q] = Seq(profileTable, splitAssign, quantileNormalize)
}
