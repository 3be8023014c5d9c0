package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] exact-boundary range layout — the planning half of a globally
  * sorted export (`repartitionByRange` + `sortWithinPartitions`, the
  * standard 100 TB "write the fact table ordered by key" shape). Spark's
  * own `RangePartitioner` samples, so its split points are
  * seed-dependent; a RESTARTABLE pipeline computes exact quantile
  * boundaries once, stores them, and assigns partitions
  * deterministically — identical file boundaries on every rerun, which
  * is what makes incremental re-export and cross-run diffing possible.
  *
  * `ext_range_layout` builds that plan for `orders.o_totalprice` split
  * into [[RangeLayout.NumRanges]] ranges: boundaries are EXACT lower
  * octiles (the engine-wide convention: boundary i = smallest cent value
  * whose cumulative count reaches ceil(i*n/8)), computed by the shared
  * two-pass [[BucketRank]] histogram plan (never a full sort); each row
  * then buckets by counting boundaries below its value, and the output
  * is the per-range audit (count, min, max) that PROVES the ranges tile
  * the domain disjointly with balanced populations — the file-boundary
  * manifest a sorted-export job would write next to the data.
  *
  * Scale shape: two aggregate passes over the fact column (BucketRank's
  * histogram + candidate-bucket refinement), a 7-value broadcast, one
  * map-side-combined final aggregate. No global sort, no single-task
  * window; the only ordered window runs over the $10k-bucket histogram
  * frame (price-domain-bounded, ~5k cells at any corpus scale).
  * RangeLayoutSpec pins the physical half: range-partitioned +
  * within-partition-sorted output is globally ordered across partition
  * ids.
  */
object RangeLayout {

  private[ext] val NumRanges = 8

  val rangeLayout: Q = {
    val k = NumRanges
    val bndNames = (1 until k).map(i => s"b$i")
    Q(
      "ext_range_layout",
      s"""WITH v AS (
         |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
         |  FROM orders),
         |cells AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM v
         |  GROUP BY 1),
         |cum AS (SELECT v, c, SUM(c) OVER (ORDER BY v) AS cum FROM cells),
         |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
         |bnd AS (
         |  SELECT i, MIN(v) AS b
         |  FROM (SELECT unnest(generate_series(1, ${k - 1})) AS i) ii
         |  JOIN cum ON cum >= (i * (SELECT n FROM n) + ${k - 1}) // $k
         |  GROUP BY i),
         |assigned AS (
         |  SELECT c.v, c.c,
         |    1 + SUM(CASE WHEN c.v > bnd.b THEN 1 ELSE 0 END) AS bucket
         |  FROM cells c CROSS JOIN bnd GROUP BY c.v, c.c)
         |SELECT CAST(bucket AS BIGINT) AS bucket,
         |  CAST(SUM(c) AS BIGINT) AS n_rows,
         |  MIN(v) AS min_v, MAX(v) AS max_v
         |FROM assigned GROUP BY bucket ORDER BY bucket""".stripMargin
    ) { (s, d) =>
      val vals = Tables.orders(s, d)
        .select(round(col("o_totalprice") * 100).cast("long").as("v"))
      // exact octile boundaries via the shared two-pass histogram plan;
      // $10k cent buckets — price-domain-bounded, never row-bounded
      val ranks = bndNames.zipWithIndex.map { case (nm, i0) =>
        nm -> s"((${i0 + 1} * n + ${k - 1}) div $k)"
      }
      val bounds = BucketRank.lowerPercentiles(
        vals, "v", v => v.divide(lit(1000000L)).cast("long"), ranks)
        .select(bndNames.map(col): _*)
      val bucketExpr = bndNames
        .map(b => s"(case when v > $b then 1 else 0 end)")
        .mkString("1 + ", " + ", "")
      vals.crossJoin(broadcast(bounds))
        .select(col("v"), expr(bucketExpr).cast("long").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"), min(col("v")).as("min_v"),
          max(col("v")).as("max_v"))
        .orderBy("bucket")
    }
  }

  val all: Seq[Q] = Seq(rangeLayout)
}
