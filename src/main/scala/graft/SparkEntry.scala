package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every gate-registered query from the operator modules. Each
  * module owns its Spark plans and the colocated DuckDB oracle SQL.
  */
object SparkEntry {

  /** Every registered query, in module order. */
  def registry: Seq[Q] =
    ops.Relational.all ++ ops.TpchStyle.all ++ ops.WindowFuncs.all ++
      ops.ScalarFuncs.all ++ ext.Registry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.TpchStyle.q3.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Bench-only entries: timed, never gate-checked. The trained-quantizer
    * ANN paths ("the index you'd ship") involve k-means double means whose
    * partial-merge order is not bit-reproducible across engines, so they
    * carry recall SPECS (IvfSpec/PqSpec) instead of oracle rows — but the
    * at-scale latency story must time the trained index, not only the
    * seed-quantizer gate ops. Training and corpus encoding are INGEST
    * work: both run in `setup` (PreparedTables staging, outside the
    * timed window), so the timed number is the query-only path a shipped
    * index serves — the same convention as `ext_sim_ivfpq`. */
  def benchOnly: Seq[Q] = Seq(
    Q.noOracle("ext_sim_ivf_trained") { (s, d) =>
      ext.IvfSearch.searchTrainedIndexed(s, d) }
      .copy(setup = Some(ext.IvfSearch.ensureTrained _)),
    Q.noOracle("ext_sim_pq_trained") { (s, d) =>
      ext.PqSearch.searchTrainedIndexed(s, d) }
      .copy(setup = Some(ext.PqSearch.ensureTrainedPq _)))

  /** Queries flagged for the sf0.1 bench headline run. */
  def benchQueries: Seq[Q] = registry.filter(_.bench) ++ benchOnly
}
