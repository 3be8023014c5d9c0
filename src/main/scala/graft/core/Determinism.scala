package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers.
  *
  * The correctness gate hash-compares our results against DuckDB running
  * ANSI SQL on the same parquet. Doubles are exact across engines only when
  * every arithmetic step is order-independent and tie-free:
  *
  *  1. Never emit a raw `SUM(double)` — summation order differs between
  *     engines/partitions.
  *  2. Never `CAST(<computed double> AS DECIMAL)` — engines scale by 10^s in
  *     double arithmetic, which can land exactly on a rounding tie that
  *     Java (HALF_UP) and C (half-even) resolve differently.
  *  3. Safe pattern: cast the RAW columns to decimal first (fixture money
  *     columns carry clean 2-decimal payloads, so the scaled value is within
  *     1e-9 of an integer — never near a tie), do ALL arithmetic in decimal
  *     (exact, any order), and cast the final aggregate back to DOUBLE (a
  *     single correctly-rounded conversion, identical in both engines).
  *
  * Decimal widths are chosen so neither engine overflows 38 digits through
  * a two-multiplication chain: (10,2) x (11,2) x (11,2) -> at most (34,6).
  */
object Determinism {
  /** Raw money/measure column (clean 2-decimal payload) -> exact decimal. */
  def m(c: Column): Column = c.cast(DecimalType(10, 2))

  /** Engine-exact sum of a raw 2-decimal double column, output as DOUBLE.
    * Oracle mirror: `CAST(SUM(CAST(x AS DECIMAL(10,2))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(m(c)).cast("double")

  /** Engine-exact `SUM(price * (1 - disc))`, output as DOUBLE. */
  def revenueSum(price: Column, disc: Column): Column =
    revenueDec(price, disc).cast("double")

  /** Engine-exact `SUM(price * (1 - disc))` kept as DECIMAL — for
    * consumers that need exact comparisons on the aggregate (e.g. a
    * max-equality filter) before the single final cast to double. */
  def revenueDec(price: Column, disc: Column): Column =
    sum(m(price) * (lit(1) - m(disc)))

  /** Cross-engine average with a scale-safe round. Oracle mirror:
    * `ROUND(CAST(SUM(CAST(x AS DECIMAL(10,2))) AS DOUBLE)/COUNT(*), s)`. */
  def davg(c: Column, scale: Int = 4): Column =
    round(dsum(c) / count(lit(1)), scale)
}
