package graft.ext

import org.apache.spark.sql.functions._

import graft.core.Q

/** [EXT] uint8 embedding quantization — the storage/serving compression
  * step an embedding pipeline runs after training-data curation: each
  * float vector becomes 64 one-byte codes under a per-vector affine map
  * (code = round((x - min) * 255 / (max - min))), a 4× cut against
  * float32 (8× against float64) that brute-force and IVF scans then
  * consume with integer arithmetic. Per-vector (not per-dimension)
  * ranges keep the op embarrassingly parallel — no corpus-wide
  * statistics pass, no shuffle at all: one projection over the
  * embeddings scan.
  *
  * == Determinism / oracle ==
  *
  * Codes are `floor(t + 0.5)` of a double `t` built by the IDENTICAL
  * expression tree in both engines — `(x - mn) * 255.0 / (mx - mn)` —
  * so the IEEE-754 bits of `t` match and the floor is exact; the
  * constant-vector edge (mx = mn) pins code 0 explicitly. The gate row
  * hashes the quantization summary (code sum/min/max — a checksum of
  * all 64 codes) plus the round-trip mean absolute error under the
  * same sequential-fold rules as the rest of the similarity family
  * ([[graft.core.Determinism]]). The spec pins the error bound a
  * correct uint8 quantizer must meet (MAE ≤ half a quantization step).
  */
object Quantize {

  private val Levels = 255.0

  val quantize: Q = Q(
    "ext_embed_quantize",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |r AS (SELECT vec_id, e, list_min(e) AS mn, list_max(e) AS mx
       |  FROM v),
       |q AS (SELECT vec_id, e, mn, mx,
       |    list_transform(e, x -> CASE WHEN mx = mn THEN 0
       |      ELSE CAST(floor((x - mn) * $Levels / (mx - mn) + 0.5) AS INT)
       |      END) AS qc
       |  FROM r)
       |SELECT vec_id, len(e)::INT AS n_dims,
       |  ROUND(mn, 6) AS vmin, ROUND(mx, 6) AS vmax,
       |  CAST(list_sum(qc) AS BIGINT) AS q_sum,
       |  CAST(list_min(qc) AS INT) AS q_min,
       |  CAST(list_max(qc) AS INT) AS q_max,
       |  ROUND(list_reduce(list_prepend(0.0,
       |      list_transform(generate_series(1, len(e)),
       |        i -> abs(e[i] - (mn + qc[i] * (mx - mn) / $Levels)))),
       |    (acc, x) -> acc + x) / len(e), 6) AS mae
       |FROM q ORDER BY vec_id""".stripMargin
  ) { (s, d) =>
    val v = Similarity.vecs(s, d)
    val r = v.select(col("vec_id"), col("e"),
      array_min(col("e")).as("mn"), array_max(col("e")).as("mx"))
    val q = r.withColumn("qc",
      transform(col("e"), x => when(col("mx") === col("mn"), lit(0))
        .otherwise(floor((x - col("mn")) * lit(Levels)
          / (col("mx") - col("mn")) + lit(0.5)).cast("int"))))
    q.select(col("vec_id"),
      size(col("e")).as("n_dims"),
      round(col("mn"), 6).as("vmin"),
      round(col("mx"), 6).as("vmax"),
      aggregate(col("qc"), lit(0L), (acc, x) => acc + x).as("q_sum"),
      array_min(col("qc")).as("q_min"),
      array_max(col("qc")).as("q_max"),
      round(aggregate(
        zip_with(col("e"), col("qc"), (x, c) =>
          abs(x - (col("mn") + c * (col("mx") - col("mn")) / lit(Levels)))),
        lit(0.0), (acc, x) => acc + x) / size(col("e")), 6).as("mae"))
      .orderBy("vec_id")
  }

  val all: Seq[Q] = Seq(quantize)
}
