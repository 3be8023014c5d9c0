package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Q, Tables}
import graft.core.Eager.EagerCheckpoint
import graft.functions.VecDot.vec_dot

/** [EXT] k-means clustering census over the embedding corpus (Lloyd '57):
  * the unsupervised structure pass a training pipeline runs before
  * IVF index construction, data-mix design, or SemDeDup-style pruning —
  * "how does the corpus cluster, how big is each cell, how tight?".
  *
  * [[K]] centroids, deterministic seeding (the [[K]] vectors with the
  * smallest `md5('km:'||vec_id)` — a pseudo-random but engine-independent
  * draw), [[Rounds]] synchronous Lloyd rounds, then the per-cluster
  * census (size + exact-decimal inertia).
  *
  * Scale shape: centroids are a K x 64 driver literal (collected once per
  * round — the BPE-trainer precedent), so ASSIGNMENT is a pure projection:
  * every vector computes its K distances and takes `array_min` over
  * (dist, cid) structs in one codegen'd pass — no K-way explode, no
  * shuffle. The only shuffle per round is the map-side-combined
  * per-cluster dimension-mean aggregate (64 avg columns, K-row result).
  * At 100 TB the same plan holds: rounds cost one narrow aggregate each,
  * and K scales to thousands before the driver literal matters.
  *
  * Determinism (the interesting part — this is an ITERATIVE float
  * pipeline checked value-exact across engines): distances are sequential
  * folds ([[graft.functions.VecDot]] vs `list_reduce`) over IDENTICAL
  * centroid arrays, with the identical IEEE association
  * `(ee - 2*dot) + cc`, so argmin assignment matches exactly (ties break
  * on cid in both engines). Centroid updates are per-dimension means
  * ROUND(.,6) — the one place summation order differs; round-6 snaps both
  * engines to the same value (the module's cosine contract). The oracle
  * replays every round as chained CTEs deriving ITS OWN centroids — one
  * drifted assignment anywhere and the gate goes hash-red. Inertia sums
  * round-6 distances in DECIMAL(18,6), so the final reduce is exact in
  * any order. Empty clusters drop out of the centroid table identically
  * in both engines (no AVG row -> no centroid).
  */
object Clustering {

  private[ext] val K = 8
  private[ext] val Rounds = 3

  import Similarity.{dotSql, normSql => _}

  private def distSql(e: String, c: String): String =
    s"(($e.ee - 2 * ${dotSql(s"$e.e", s"$c.c")}) + ${dotSql(s"$c.c", s"$c.c")})"

  private def oracleSql: String = {
    val rounds = (1 to Rounds).map { r =>
      s"""a$r AS (
         |  SELECT vec_id, e, ee, cid FROM (
         |    SELECT t.vec_id, t.e, t.ee, c.cid,
         |      row_number() OVER (PARTITION BY t.vec_id
         |        ORDER BY ${distSql("t", "c")}, c.cid) AS rn
         |    FROM ee t CROSS JOIN c${r - 1} c) s$r WHERE rn = 1),
         |c$r AS (
         |  SELECT cid, list(mv ORDER BY j) AS c FROM (
         |    SELECT cid, j, ROUND(AVG(e[j]), 6) AS mv
         |    FROM a$r CROSS JOIN
         |      (SELECT unnest(generate_series(1, 64)) AS j) js
         |    GROUP BY cid, j) g$r GROUP BY cid)""".stripMargin
    }.mkString(",\n")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |ee AS (SELECT vec_id, e, ${dotSql("e", "e")} AS ee FROM v),
       |c0 AS (
       |  SELECT row_number() OVER (
       |      ORDER BY md5('km:' || vec_id::VARCHAR), vec_id) AS cid,
       |    e AS c
       |  FROM v QUALIFY cid <= $K),
       |$rounds,
       |fin AS (
       |  SELECT cid, dist FROM (
       |    SELECT c.cid, ${distSql("t", "c")} AS dist,
       |      row_number() OVER (PARTITION BY t.vec_id
       |        ORDER BY ${distSql("t", "c")}, c.cid) AS rn
       |    FROM ee t CROSS JOIN c$Rounds c) f WHERE rn = 1)
       |SELECT CAST(cid AS BIGINT) AS cid,
       |  CAST(COUNT(*) AS BIGINT) AS n_members,
       |  CAST(SUM(CAST(ROUND(dist, 6) AS DECIMAL(18,6))) AS DOUBLE)
       |    AS inertia
       |FROM fin GROUP BY cid ORDER BY cid""".stripMargin
  }

  /** Base frame: vec_id, e (array<double>), ee = dot(e,e). */
  private def base(s: SparkSession, d: String): DataFrame = {
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    v.withColumn("ee", vec_dot(s, col("e"), col("e")))
  }

  /** Assignment as a pure projection against driver-literal centroids:
    * min over (dist, cid) structs — lexicographic array_min is exactly
    * the oracle's (dist, cid) rank-1. */
  private def assign(s: SparkSession, df: DataFrame,
      cents: Seq[(Long, Array[Double])]): DataFrame = {
    val structs = cents.map { case (cid, c) =>
      // driver-side fold in VecDot order: ((0 + c0*c0) + c1*c1) + ...
      val cc = c.foldLeft(0.0)((acc, x) => acc + x * x)
      struct(
        ((col("ee") - lit(2) * vec_dot(s, col("e"), typedLit(c.toSeq)))
          + lit(cc)).as("d"),
        lit(cid).as("cid"))
    }
    df.withColumn("asg", array_min(array(structs: _*)))
      .withColumn("cid", col("asg.cid"))
      .withColumn("dist", col("asg.d"))
      .drop("asg")
  }

  /** One centroid update: per-dimension means, round-6. */
  private def update(df: DataFrame): Seq[(Long, Array[Double])] =
    df.groupBy("cid")
      .agg(round(avg(col("e").getItem(0)), 6).as("m0"),
        (1 until 64).map(j =>
          round(avg(col("e").getItem(j)), 6).as(s"m$j")): _*)
      .collect()
      .map(r => (r.getLong(0), (0 until 64).map(j =>
        r.getDouble(j + 1)).toArray))
      .sortBy(_._1).toSeq

  /** Run the trainer; returns the final assigned frame (vec_id, cid,
    * dist) — shared by the gate query and the spec's per-round probes. */
  private[graft] def lloyd(s: SparkSession, d: String,
      rounds: Int): DataFrame = {
    val b = base(s, d).eagerCheckpoint()
    val init = b
      .withColumn("mk", md5(concat(lit("km:"), col("vec_id").cast("string"))))
      .orderBy("mk", "vec_id").limit(K)
      .select("e").collect().zipWithIndex
      .map { case (r, i) =>
        ((i + 1).toLong, r.getSeq[Double](0).toArray) }
      .toSeq
    var cents = init
    (1 to rounds).foreach { _ =>
      cents = update(assign(s, b, cents))
    }
    assign(s, b, cents)
  }

  val embedKmeans: Q = Q("ext_embed_kmeans", oracleSql) { (s, d) =>
    lloyd(s, d, Rounds)
      .groupBy("cid")
      .agg(count(lit(1)).as("n_members"),
        sum(round(col("dist"), 6).cast(DecimalType(18, 6))).as("si"))
      .select(col("cid").cast("long").as("cid"), col("n_members"),
        col("si").cast("double").as("inertia"))
      .orderBy("cid")
  }

  val all: Seq[Q] = Seq(embedKmeans)
}
