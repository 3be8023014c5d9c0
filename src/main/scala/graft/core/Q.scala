package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gate-registered query: a Spark implementation plus (when the
  * semantics are ANSI-expressible) the equivalent DuckDB oracle SQL run by
  * the driver on the same parquet tables. `oracle = None` downgrades the
  * check to rows-only (used for approximate / RNG-free-but-hash-heavy ops
  * whose SQL mirror would be unreliable across engines).
  *
  * Contract (driver): result columns are sorted by name before hashing, so
  * Spark aliases and SQL `AS` names must match exactly; row values must be
  * bit-identical (see [[Determinism]]).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** include in the sf0.1 Bench headline run (false for O(n^2) checks
      * that exist for oracle-correctness, not the scale path). */
    bench: Boolean = true,
    /** one-time amortized preparation (e.g. writing bucketed table
      * copies) — run by Bench OUTSIDE the timed window and by Verify
      * before `fn`. The 100 TB analogue is work paid at ingest time, not
      * per query, so it must not be attributed to query latency. */
    setup: Option[(SparkSession, String) => Unit] = None)

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  def noOracle(name: String, bench: Boolean = true)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None, bench)
}
