package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] higher-order array-function family over the embedding column —
  * the declarative per-element surface (`transform`/`filter`/`aggregate`)
  * a vector pipeline uses for feature hygiene before any index touches
  * the data. Complements the codegen'd [[graft.functions.VecDot]] hot
  * path: these are the built-in lambda functions, exercised end-to-end
  * against DuckDB's list functions.
  *
  * Determinism: floats are cast to double first (exact), `aggregate` is a
  * strictly sequential left fold and DuckDB's `list_reduce` walks the
  * same order, IEEE add/multiply/sqrt are correctly rounded — so the
  * norms match
  * bit-for-bit with no rounding crutch. Scale shape: pure per-row
  * projection, zero shuffles besides the final presentation sort; at
  * 100 TB this pipelines inside whole-stage codegen over the scan.
  */
object VecFuncs {

  val arrayFuncs: Q = Q(
    "ext_vec_array_funcs",
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
      |SELECT vec_id,
      |  sqrt(list_reduce(list_prepend(0.0,
      |    list_transform(e, x -> x * x)), (acc, x) -> acc + x)) AS l2_norm,
      |  CAST(len(list_filter(e, x -> x > 0)) AS BIGINT) AS n_pos,
      |  list_max(list_transform(e, x -> abs(x))) AS max_abs
      |FROM v ORDER BY vec_id""".stripMargin
  ) { (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .select(col("vec_id"),
        sqrt(aggregate(col("e"), lit(0.0),
          (acc, x) => acc + x * x)).as("l2_norm"),
        size(filter(col("e"), x => x > 0)).cast("long").as("n_pos"),
        array_max(transform(col("e"), x => abs(x))).as("max_abs"))
      .orderBy("vec_id")
  }

  def all: Seq[Q] = Seq(arrayFuncs)
}
