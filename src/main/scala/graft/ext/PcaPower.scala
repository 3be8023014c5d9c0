package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] deterministic PCA: the top principal component of the embedding
  * corpus by fixed-point power iteration — the "what single direction
  * explains this embedding space" diagnostic (drift monitoring,
  * whitening decisions, anisotropy checks a la Ethayarajh EMNLP'19).
  *
  * Exactness strategy (why this hash-checks across engines when
  * textbook PCA cannot): components quantize to integers
  * (q = round(e*1000)), so the scatter sufficient statistics
  * n, s_i = SUM q_i, P_ij = SUM q_i q_j are EXACT BIGINTs and
  * order-independent; the centered scatter matrix C = n*P - s s^T is
  * exact; and the power iteration (24 rounds) runs in 128-bit integer arithmetic
  * (HUGEINT in the oracle, BigInt on the Spark driver) with an explicit
  * truncate-toward-zero rescale sign(w)*(|w|*1e6 // max|w|) each round
  * — DuckDB's // FLOORS negatives while Spark's div truncates, so the
  * rescale factors through |.| to make both engines identical. A fixed
  * round count is the declared contract (no convergence test); the sign
  * convention fixes the first nonzero component positive.
  *
  * Scale shape: the ONLY corpus-size-dependent work is the sufficient-
  * statistics pass — an array-local 64x64 outer-product expansion into
  * a map-side-combined (i, j) aggregate (shuffle = 4096 rows x
  * partitions, independent of corpus size). The iteration itself is
  * O(d^2) per round on a 64x64 matrix — driver-scale by construction,
  * the same tier as connected components' convergence scalar.
  */
object PcaPower {

  private val Dims = 64
  private val QScale = 1000L // component quantization
  private val VScale = 1000000L // eigenvector fixed-point scale
  // 24 rounds: the fixture's embeddings are isotropic noise, so the top
  // eigengap is Marchenko-Pastur-small and 12 rounds left the direction
  // at cos ~0.9986 from its own power step; 24 lands > 0.999 (spec).
  // Real embedding corpora are strongly anisotropic (one dominant mean/
  // frequency direction) and converge far faster.
  private val Iters = 24

  val pcaTop: Q = Q(
    "ext_embed_pca_power",
    {
      // every per-round CTE is MATERIALIZED: v_k references w_k twice
      // (value + max), so inlining would expand the chain 2^Iters-fold
      val iters = (1 to Iters).map { k =>
        s"""w$k AS MATERIALIZED (
           |  SELECT i, SUM(c::HUGEINT * v) AS w
           |  FROM cmat JOIN v${k - 1} ON j = v${k - 1}.i2 GROUP BY i),
           |m$k AS MATERIALIZED (SELECT MAX(abs(w)) AS m FROM w$k),
           |v$k AS MATERIALIZED (
           |  SELECT i AS i2,
           |    CASE WHEN w < 0 THEN -((-w) * $VScale // m)
           |         ELSE w * $VScale // m END AS v
           |  FROM w$k CROSS JOIN m$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS e
         |           FROM embeddings),
         |q AS MATERIALIZED (
         |  SELECT vec_id, i,
         |    CAST(round(e[i] * $QScale) AS BIGINT) AS qv
         |  FROM e CROSS JOIN generate_series(1, $Dims) AS t(i)),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
         |s AS (SELECT i, CAST(SUM(qv) AS BIGINT) AS s FROM q GROUP BY i),
         |p AS (
         |  SELECT a.i AS i, b.i AS j,
         |    CAST(SUM(a.qv * b.qv) AS BIGINT) AS p
         |  FROM q a JOIN q b ON a.vec_id = b.vec_id
         |  GROUP BY 1, 2),
         |cmat AS MATERIALIZED (
         |  SELECT p.i, p.j, n.n * p.p - sa.s * sb.s AS c
         |  FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j
         |  CROSS JOIN n),
         |v0 AS (SELECT i AS i2, ${VScale}::HUGEINT AS v
         |       FROM generate_series(1, $Dims) AS t(i)),
         |$iters,
         |sgn AS (
         |  SELECT CASE WHEN (SELECT v FROM v$Iters
         |    WHERE v <> 0 ORDER BY i2 LIMIT 1) < 0
         |    THEN -1 ELSE 1 END AS sg)
         |SELECT CAST(i2 AS BIGINT) AS dim,
         |  CAST(v * sg AS BIGINT) AS v_e6
         |FROM v$Iters CROSS JOIN sgn ORDER BY dim""".stripMargin
    }
  ) { (s, d) =>
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    // array-local outer product -> (i, j, qi*qj) -> map-side-combined agg
    val q = e.select(col("vec_id"),
      expr(s"transform(e, x -> cast(round(x * $QScale) as bigint))")
        .as("q"))
    val prods = q.select(posexplode(col("q")).as(Seq("i0", "qi")),
        col("q"))
      .select(col("i0"), col("qi"), posexplode(col("q")).as(Seq("j0", "qj")))
      .groupBy((col("i0") + 1).cast("long").as("i"),
        (col("j0") + 1).cast("long").as("j"))
      .agg(sum(col("qi") * col("qj")).as("p"))
    val sums = q.select(posexplode(col("q")).as(Seq("i0", "qv")))
      .groupBy((col("i0") + 1).cast("long").as("i"))
      .agg(sum(col("qv")).as("s"))
    val n = e.count()
    // C = n*P - s s^T, collected: 4096 longs — driver-scale by design
    val sMap = sums.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cMat = prods.collect().map { r =>
      val (i, j, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
      ((i.toInt, j.toInt), BigInt(n) * p - BigInt(sMap(i)) * sMap(j))
    }.toMap
    var v = Array.fill(Dims)(BigInt(VScale))
    for (_ <- 1 to Iters) {
      val w = Array.tabulate(Dims) { i0 =>
        (0 until Dims).map(j0 =>
          cMat.getOrElse((i0 + 1, j0 + 1), BigInt(0)) * v(j0)).sum
      }
      val m = w.map(_.abs).max
      v = w.map(x =>
        if (x < 0) -((-x) * VScale / m) else x * VScale / m)
    }
    val sg = v.find(_ != 0).map(x => if (x < 0) -1 else 1).getOrElse(1)
    import s.implicits._
    v.zipWithIndex
      .map { case (x, i0) => ((i0 + 1).toLong, (x * sg).toLong) }.toSeq
      .toDF("dim", "v_e6").orderBy("dim")
  }

  def all: Seq[Q] = Seq(pcaTop)
}
