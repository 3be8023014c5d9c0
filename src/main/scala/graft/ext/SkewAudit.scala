package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] shuffle-skew audit: the group-size distribution of the join/agg
  * keys this warehouse actually shuffles on. At 100 TB the difference
  * between a 2-minute and a 2-hour stage is usually ONE skewed key; this
  * op is the diagnostic you run before choosing salting/AQE-skew-join
  * settings (the `ext_skew_salted_*` ops are the cure; this is the
  * thermometer).
  *
  * Per audited key: distinct key count, total rows, max group size,
  * exact p99 group size, and skew_ratio_ppm = max/avg in
  * parts-per-million by pure integer arithmetic
  * (max * n_keys * 1e6 // rows), so the whole row is BIGINT-exact.
  *
  * Scale shape (round-10 rewrite): the per-key count frame is
  * entity-sized (users/orders/customers — it GROWS at 100 TB), so the
  * p99 never ranks it directly; the frame compresses to the COUNT
  * HISTOGRAM (c -> how many keys have count c, bounded by the max
  * group size — a data attribute), and the rank thresholds evaluate on
  * its cumulative sums. Provably identical to the oracle's
  * row_number() form: ranks of the (c, k)-ordered rows depend only on
  * c (the k tiebreak never crosses a c boundary), a c-group spans
  * ranks (cum-kc, cum], and the p99_below / p99_cnt CASEs reduce to
  * boundary tests on those spans. */
object SkewAudit {

  private case class KeyAudit(table: String, column: String)

  private val Audited = Seq(
    KeyAudit("events", "user_id"),
    KeyAudit("lineitem", "l_orderkey"),
    KeyAudit("lineitem", "l_partkey"),
    KeyAudit("orders", "o_custkey"))

  private def auditSql(k: KeyAudit): String =
    s"""SELECT '${k.table}.${k.column}' AS key_name,
       |  CAST(COUNT(*) AS BIGINT) AS n_keys,
       |  CAST(SUM(c) AS BIGINT) AS n_rows,
       |  CAST(MAX(c) AS BIGINT) AS max_cnt,
       |  CAST(MAX(CASE WHEN rnk * 100 >= n_k * 99 THEN NULL ELSE c END)
       |    AS BIGINT) AS p99_below,
       |  CAST(MIN(CASE WHEN rnk * 100 >= n_k * 99 THEN c END)
       |    AS BIGINT) AS p99_cnt,
       |  CAST(MAX(c) * CAST(COUNT(*) AS BIGINT) * 1000000
       |    // CAST(SUM(c) AS BIGINT) AS BIGINT) AS skew_ratio_ppm
       |FROM (
       |  SELECT c, row_number() OVER (ORDER BY c, k) AS rnk,
       |    COUNT(*) OVER () AS n_k
       |  FROM (SELECT ${k.column} AS k, CAST(COUNT(*) AS BIGINT) AS c
       |        FROM ${k.table} GROUP BY 1) g) r""".stripMargin

  private def auditDf(s: SparkSession, d: String, k: KeyAudit): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = Tables.load(s, d, k.table)
      .groupBy(col(k.column).as("k")).agg(count(lit(1)).as("c"))
    // count histogram: bounded by the max group size, never entity count
    val hist = per.groupBy("c").agg(count(lit(1)).as("kc"))
    val cum = hist.withColumn("cum",
      sum(col("kc")).over(Window.orderBy("c")))
    val tot = hist.agg(sum(col("kc")).cast("long").as("n_keys"),
      sum(col("c") * col("kc")).cast("long").as("n_rows"),
      max(col("c")).cast("long").as("max_cnt"))
    cum.crossJoin(broadcast(tot))
      .agg(
        max(col("n_keys")).as("n_keys"),
        max(col("n_rows")).as("n_rows"),
        max(col("max_cnt")).as("max_cnt"),
        // a c-group spans ranks (cum-kc, cum]; it holds a sub-p99 row
        // iff its first rank is below the threshold, and reaches the
        // p99 rank iff its last rank does
        max(when((col("cum") - col("kc") + 1) * 100 < col("n_keys") * 99,
          col("c"))).cast("long").as("p99_below"),
        min(when(col("cum") * 100 >= col("n_keys") * 99, col("c")))
          .cast("long").as("p99_cnt"))
      .select(lit(s"${k.table}.${k.column}").as("key_name"),
        col("n_keys"), col("n_rows"), col("max_cnt"), col("p99_below"),
        col("p99_cnt"),
        expr("max_cnt * n_keys * 1000000 div n_rows")
          .as("skew_ratio_ppm"))
  }

  val skewAudit: Q = Q(
    "ext_skew_audit",
    Audited.map(auditSql).mkString(
      "SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY key_name")
  ) { (s, d) =>
    Audited.map(auditDf(s, d, _)).reduce(_ unionAll _)
      .orderBy("key_name")
  }

  def all: Seq[Q] = Seq(skewAudit)
}
