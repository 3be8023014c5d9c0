package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import graft.functions.VecDot.vec_dot

/** [EXT] similarity search over the `embeddings` fixture (64-dim float
  * vectors).
  *
  * Brute-force cosine is the exactness baseline (probes broadcast against
  * the corpus — at 100 TB the corpus side streams, only probes are
  * replicated). The scale path is `annLsh`: random-hyperplane LSH buckets
  * the corpus by sign signature so each probe only scores its bucket.
  *
  * Determinism: dot products are a strictly sequential left-fold over the
  * 64 dimensions in BOTH engines ([[graft.functions.VecDot]] in Spark,
  * `list_reduce` in DuckDB), so the doubles are bit-identical and the
  * ranking (rounded cosine, then vec_id) is engine-independent. Norms are
  * computed ONCE per vector, not per pair — same arithmetic, linear cost.
  */
object Similarity {

  private def asD(c: Column): Column = c.cast("array<double>")

  /** vectors with their norms precomputed (norm = sqrt(dot(e,e)), IEEE
    * sqrt is correctly rounded — engine-independent). */
  private def vecs(s: SparkSession, d: String): DataFrame = {
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), asD(col("embedding")).as("e"))
    v.withColumn("nrm", sqrt(vec_dot(s, col("e"), col("e"))))
  }

  /** DuckDB mirror: strictly sequential fold, same order as VecDot. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(generate_series(1, 64),
       |    i -> $a[i] * $b[i])), (acc, x) -> acc + x)""".stripMargin

  private def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  /** Brute-force cosine top-k: probes (vec_id < 5) x corpus, rank by
    * (rounded cosine desc, vec_id) per probe, keep top 10. */
  val topkBrute: Q = Q(
    "ext_sim_topk_brute",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |probes AS (SELECT vec_id AS probe_id, e AS pe FROM v WHERE vec_id < 5),
       |scored AS (
       |  SELECT probe_id, vec_id AS neighbor_id,
       |    ROUND(${dotSql("pe", "e")} / (${normSql("pe")} * ${normSql("e")}), 6)
       |      AS cosine
       |  FROM probes JOIN v ON vec_id <> probe_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT probe_id, neighbor_id, rank, cosine FROM ranked
       |WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin
  ) { (s, d) =>
    val v = vecs(s, d)
    val probes = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("e").as("pe"),
        col("nrm").as("pnrm"))
    val scored = broadcast(probes)
      .join(v, col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        round(vec_dot(s, col("pe"), col("e")) / (col("pnrm") * col("nrm")), 6)
          .as("cosine"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= 10)
      .select("probe_id", "neighbor_id", "rank", "cosine")
      .orderBy("probe_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: label as a cheap blocking key,
    * threshold on the ROUNDED cosine (both engines see identical rounded
    * values, so the boundary is exact). */
  val nearDupPairs: Q = Q(
    "ext_embed_neardup",
    s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e
       |  FROM embeddings),
       |scored AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    ROUND(${dotSql("a.e", "b.e")}
       |      / (${normSql("a.e")} * ${normSql("b.e")}), 6) AS cosine
       |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.9
       |ORDER BY id_a, id_b""".stripMargin
  ) { (s, d) =>
    val v = vecs(s, d)
    val a = v.select(col("vec_id").as("id_a"), col("label"),
      col("e").as("ea"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("id_b"), col("label").as("label_b"),
      col("e").as("eb"), col("nrm").as("nb"))
    a.join(b, col("label") === col("label_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(vec_dot(s, col("ea"), col("eb")) / (col("na") * col("nb")), 6)
          .as("cosine"))
      .filter(col("cosine") >= 0.9)
      .orderBy("id_a", "id_b")
  }

  private val NumPlanes = 12

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * +-1 from a bit of md5 — reproducible with no RNG state. */
  private def planeSign(p: Int, dim: Column): Column =
    when(conv(substring(md5(concat(lit(s"$p:"), dim.cast("string"))), 1, 1),
      16, 10).cast("int") % 2 === 1, lit(1.0)).otherwise(lit(-1.0))

  /** ANN via random-hyperplane LSH: 12-bit sign signature buckets the
    * corpus; probes scan only their bucket, then exact-cosine rank inside
    * it. Rows-only check (recall vs brute force is asserted in the
    * ScalaTest spec, not by the SQL oracle). */
  val annLsh: Q = Q.noOracle("ext_sim_ann_lsh") { (s, d) =>
    // hyperplane sign vectors are literals folded at plan time
    val planes = (0 until NumPlanes).map { p =>
      array((0 until 64).map(i => planeSign(p, lit(i))): _*)
    }
    val v = vecs(s, d)
    val sig = planes.map(pl =>
      when(vec_dot(s, col("e"), pl) > 0, "1").otherwise("0"))
      .reduce(concat(_, _))
    val bucketed = v.withColumn("bucket", sig)
    val probes = bucketed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("e").as("pe"),
        col("nrm").as("pnrm"), col("bucket"))
    val scored = broadcast(probes)
      .join(bucketed, Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        round(vec_dot(s, col("pe"), col("e")) / (col("pnrm") * col("nrm")), 6)
          .as("cosine"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= 10)
      .select("probe_id", "neighbor_id", "rank", "cosine")
      .orderBy("probe_id", "rank")
  }

  val all: Seq[Q] = Seq(topkBrute, nearDupPairs, annLsh)
}
