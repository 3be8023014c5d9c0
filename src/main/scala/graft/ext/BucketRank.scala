package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact lower-percentile (percentile_disc) summaries over a BIGINT value
  * column WITHOUT ever materializing the value multiset in one aggregation
  * buffer — the shared two-pass bucket-rank plan first built for
  * `ext_value_quantiles` ([[EventsOps]]), factored out so every percentile
  * consumer (`ext_orders_interarrival`, `ext_funnel_latency`) runs the
  * same scale-safe shape instead of `sort_array(collect_list(...))`
  * (which is O(row count) memory in a SINGLE task and OOMs at 100 TB).
  *
  * Plan shape — every full-data operation is a key-equality hash aggregate
  * with map-side combine; every sort/window touches only aggregated
  * bucket/value tables:
  *
  *   1. pass 1: per-bucket (count, sum, max) — the histogram primitive.
  *      The caller picks `bucketOf` so the bucket DOMAIN is bounded by a
  *      fixed attribute of the data (calendar span in days, latency span
  *      in hours), never by row count;
  *   2. cumulative counts over that tiny bucket frame (a global-order
  *      window, but over the bucket domain, not the corpus);
  *   3. per requested rank r = f(n): the single candidate bucket =
  *      smallest bucket whose cumulative count reaches r;
  *   4. pass 2 restricted to candidate-bucket rows (broadcast semi
  *      filter): distinct-value counts within each candidate bucket,
  *      within-bucket cumulate, answer = smallest value with
  *      bucket_offset + within_cum >= r.
  *
  * Identity to the sorted-array formulation (what the DuckDB oracles
  * keep): element_at(sorted values, r) is the smallest value v with
  * count(values <= v) >= r, and count(values <= v) decomposes exactly as
  * bucket_offset(bucket(v)) + within_bucket_cum(v).
  *
  * Rank expressions are SQL strings over the count column `n` (e.g.
  * `"(n + 1) div 2"` for the lower median) so the integer-division
  * semantics stay pinned to the oracle's `//` on positive BIGINTs.
  */
object BucketRank {

  /** @param vals     input frame; only `valueCol` is read
    * @param valueCol long-valued column to summarize
    * @param bucketOf value -> bucket id; bucket domain must be bounded by
    *                 a data attribute (time span), not by row count
    * @param ranks    (outputColumn, rankExprOverN) pairs; each expression
    *                 is SQL over the BIGINT row count `n` yielding a
    *                 1-based target rank
    * @param identityBuckets true when `bucketOf` is the identity (the
    *                 value domain itself is bounded): the candidate
    *                 bucket IS the answer, so the second input pass is
    *                 skipped entirely — one scan total
    * @return one row: `n`, `tot` (sum), `max_v`, plus one BIGINT column
    *         per requested rank holding the exact lower-percentile value.
    *         EMPTY input raises (`raise_error`) instead of returning an
    *         all-NULL row callers would silently propagate.
    */
  def lowerPercentiles(
      vals: DataFrame,
      valueCol: String,
      bucketOf: Column => Column,
      ranks: Seq[(String, String)],
      identityBuckets: Boolean = false): DataFrame = {
    val base = vals.select(col(valueCol).as("v"),
      bucketOf(col(valueCol)).cast("long").as("bkt"))

    // pass 1: per-bucket histogram — map-side combine, bucket-domain-sized
    val bCounts = base.groupBy("bkt")
      .agg(count(lit(1)).as("c"), sum(col("v")).cast("long").as("sv"),
        max(col("v")).as("mx"))
    val bc = bCounts
      .withColumn("cum", sum(col("c")).over(Window.orderBy("bkt")))
      .withColumn("off", col("cum") - col("c"))
    // empty-input guard: SUM/MAX over zero buckets yield one all-NULL row
    // that callers would silently propagate through `tot div n`-style
    // expressions (the retired sort_array form failed loudly via
    // element_at) — keep the failure attributable instead
    val nGuarded = when(sum(col("c")).isNotNull, sum(col("c")))
      .otherwise(expr("cast(raise_error('BucketRank.lowerPercentiles: " +
        "empty input — no rows to rank (a degenerate fixture upstream?)')" +
        " as bigint)"))
    val totals = bCounts.agg(nGuarded.cast("long").as("n"),
      sum(col("sv")).cast("long").as("tot"), max(col("mx")).as("max_v"))

    // one (rank-name, target-rank) row per requested percentile
    val targets = totals.select(col("n"),
        explode(array(ranks.map { case (nm, re) =>
          struct(lit(nm).as("rname"), expr(re).cast("long").as("r"))
        }: _*)).as("t"))
      .select(col("t.rname").as("rname"), col("t.r").as("r"))

    // candidate bucket per rank: smallest bucket whose cum reaches r.
    // Non-equi join, but both sides are aggregate-compressed (|ranks| x
    // bucket domain) — a broadcast nested loop over tiny frames.
    val cand = broadcast(targets)
      .join(bc.select(col("bkt"), col("cum"), col("off")),
        col("cum") >= col("r"))
      .groupBy("rname", "r")
      .agg(min(col("bkt")).as("cand_bkt"),
        min_by(col("off"), col("bkt")).as("cand_off"))

    // pass 2: only candidate-bucket rows survive the broadcast semi
    // filter. With identity buckets (bucket == value) the candidate
    // bucket already IS the smallest qualifying value — no second pass.
    val picked =
      if (identityBuckets)
        cand.select(col("rname"), col("cand_bkt").as("pv"))
      else {
        val candB = cand.select(col("cand_bkt").as("bkt")).distinct()
        val inCand = base
          .join(broadcast(candB), Seq("bkt"), "left_semi")
          .groupBy("bkt", "v").agg(count(lit(1)).as("vc"))
          .withColumn("wcum", sum(col("vc")).over(
            Window.partitionBy("bkt").orderBy("v")))
        val candR = cand.select(col("rname"), col("r"),
          col("cand_bkt"), col("cand_off"))
        inCand
          .join(broadcast(candR), col("bkt") === col("cand_bkt"))
          .filter(col("cand_off") + col("wcum") >= col("r"))
          .groupBy("rname").agg(min(col("v")).as("pv"))
      }

    // pivot the |ranks| answer rows onto the 1-row totals frame
    val pivotCols = ranks.map { case (nm, _) =>
      min(when(col("rname") === nm, col("pv"))).as(nm)
    }
    val pivoted = picked.agg(pivotCols.head, pivotCols.tail: _*)
    totals.crossJoin(broadcast(pivoted))
  }

  /** Global row rank (and optional exclusive running weight sum) over a
    * total order WITHOUT a single-task window — the distributed form of
    * `row_number().over(Window.orderBy(...))` / cumulative sums, for
    * frames that are aggregate-compressed but still grow with an entity
    * count (per-customer scores at 100 TB).
    *
    * Plan: rows bucket on `(b1, b2)` — `b1` a monotone coarsening of
    * the leading order value (the value itself when its domain is
    * bounded; a fixed-width money bucket otherwise), `b2` an optional
    * monotone split of the tie-breaker to spread heavy ties. Per-bucket
    * counts/weights aggregate first; ONE window over that
    * bucket-domain-bounded frame yields each bucket's rank/sum offset;
    * a broadcast join puts offsets back on the rows, and the per-row
    * rank/sum finishes with a window PARTITIONED by bucket — every sort
    * touches one bucket's rows, never the whole frame.
    *
    * Exactness: rank = offset(count) + within-bucket row_number is the
    * global rank by construction (buckets tile the order); decimal
    * window sums are exact, and the bucket-offset sum is
    * order-independent (decimal addition is associative-exact), so the
    * exclusive running sum is bit-equal to the single-window form.
    *
    * @param df      input frame
    * @param b1      bucket column (monotone in the leading order value)
    * @param b1Desc  direction of the leading order (and of b1)
    * @param b2      secondary monotone tie split (lit(0L) when unused)
    * @param order   full within-bucket order (the global tie-break)
    * @param weight  when Some(w): emit `excl` = exclusive running sum
    *                of w in the global order
    * @return df plus `rk` (1-based global BIGINT rank) and, with
    *         `weight`, `excl`
    */
  def rankAndExclSum(
      df: DataFrame,
      b1: Column,
      b1Desc: Boolean,
      b2: Column,
      order: Seq[Column],
      weight: Option[Column]): DataFrame = {
    val w = weight.getOrElse(lit(0L))
    val base = df.withColumn("_b1", b1).withColumn("_b2", b2)
      .withColumn("_w", w)
    val grp = base.groupBy("_b1", "_b2")
      .agg(count(lit(1)).as("_c"), sum(col("_w")).as("_s"))
    val dirB1 = if (b1Desc) col("_b1").desc else col("_b1").asc
    val wOff = Window.orderBy(dirB1, col("_b2").asc) // bucket frame only
    val offs = grp
      .withColumn("_coff", sum(col("_c")).over(wOff) - col("_c"))
      .withColumn("_soff", sum(col("_s")).over(wOff) - col("_s"))
      .select("_b1", "_b2", "_coff", "_soff")
    val wIn = Window.partitionBy("_b1", "_b2").orderBy(order: _*)
    val ranked = base
      .join(broadcast(offs), Seq("_b1", "_b2"))
      .withColumn("rk", col("_coff") + row_number().over(wIn))
    val out =
      if (weight.isDefined)
        ranked.withColumn("excl",
          col("_soff") + sum(col("_w")).over(
            Window.partitionBy("_b1", "_b2").orderBy(order: _*)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            - col("_w"))
      else ranked
    out.drop("_b1", "_b2", "_w", "_coff", "_soff")
  }

  /** ANSI `ntile(k)` from a 1-based global row rank: the first
    * `n mod k` groups take `n div k + 1` rows, the rest `n div k` —
    * identical to the window function, computed arithmetically so no
    * single-task window is needed. (For n < k the formula degenerates
    * to score = rank, matching ntile.) Integer division is exact for
    * counts below 2^53 (the double-mantissa bound — any real entity
    * count). */
  def ntileFromRank(rk: Column, n: Column, k: Int): Column = {
    def idiv(a: Column, b: Column) =
      ((a - pmod(a, b)) / b).cast("long")
    val kk = lit(k.toLong)
    val q = idiv(n, kk)
    val rem = pmod(n, kk)
    val cut = rem * (q + 1)
    when(rk <= cut, idiv(rk - 1, q + 1) + 1)
      .otherwise(rem + idiv(rk - cut - 1, q) + 1)
  }
}
