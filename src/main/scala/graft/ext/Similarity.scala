package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import graft.core.Eager.EagerCheckpoint
import graft.functions.VecDot.vec_dot

/** [EXT] similarity search over the `embeddings` fixture (64-dim float
  * vectors).
  *
  * Brute-force cosine is the exactness baseline (probes broadcast against
  * the corpus — at 100 TB the corpus side streams, only probes are
  * replicated). The scale path is `annLsh`: random-hyperplane LSH
  * (Charikar, STOC'02) with OR-amplification — [[LshPlanes.NumTables]]
  * independent signature tables, candidates unioned across tables — so a neighbor is found if it
  * matches the probe's bucket in ANY table. A single wide signature (the
  * classic one-table mistake) has multiplicative per-bit recall decay;
  * the multi-table union turns that into an OR, which is what makes the
  * recall@10 >= 0.8 contract (asserted in ExtSpec vs `topkBrute`)
  * achievable.
  *
  * Determinism: hyperplanes are fixed +-1 vectors derived from md5 parity,
  * computed ONCE on the driver ([[LshPlanes.planes]]) and embedded as
  * array literals in both engines' plans — the DuckDB oracle receives the
  * same values as literal lists, so bucket assignment, candidate sets and
  * cosines are all engine-independent and the LSH operators are fully
  * oracle-checked (round 1 left ANN as a rows-only gate). Dot products are
  * a strictly sequential left-fold over the 64 dimensions in BOTH engines
  * ([[graft.functions.VecDot]] in Spark, `list_reduce` in DuckDB), so the
  * doubles are bit-identical and sign/threshold comparisons agree exactly.
  * Norms are computed ONCE per vector, not per pair.
  */
object Similarity {

  private def asD(c: Column): Column = c.cast("array<double>")

  /** vectors with their norms precomputed (norm = sqrt(dot(e,e)), IEEE
    * sqrt is correctly rounded — engine-independent). */
  private[ext] def vecs(s: SparkSession, d: String): DataFrame = {
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), asD(col("embedding")).as("e"))
    v.withColumn("nrm", sqrt(vec_dot(s, col("e"), col("e"))))
  }

  /** DuckDB mirror: strictly sequential fold, same order as VecDot. */
  private[ext] def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(generate_series(1, 64),
       |    i -> $a[i] * $b[i])), (acc, x) -> acc + x)""".stripMargin

  private[ext] def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

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

  /** Corpus rows exploded to one row per (vec_id, table, bucket): the
    * vector's 4-bit sign signature in each of the 16 tables. One narrow
    * projection + posexplode — no shuffle; ALL 64 plane dots happen in a
    * single compact codegen'd expression ([[graft.functions.LshBuckets]]).
    * Rounds 2-4 spelled this as 64 `vec_dot(e, typedLit(plane))` columns
    * (4096 literal doubles per plan), whose analysis + oversized generated
    * projection caused multi-second intermittent bench stalls. */
  private def bucketed(s: SparkSession, v: DataFrame): DataFrame =
    v.select(col("vec_id"),
      posexplode(graft.functions.LshBuckets.lsh_buckets(s, col("e"))))
      .select(col("vec_id"), col("pos").cast("int").as("t"),
        col("col").as("bucket"))

  /** The same 64 planes regrouped as 8 tables x 8-bit signatures (pair
    * of consecutive 4-bit buckets: low nibble + high nibble * 16) — the
    * BLOCKING family for the near-dup pair join. Blocking quality is a
    * bucket-occupancy question: with 4-bit tables there are only 16
    * buckets, so occupancy — and the candidate pair count — grows
    * quadratically with the corpus (measured: 10x corpus -> 113x
    * runtime). 8-bit tables give 256x more buckets; for genuine
    * near-duplicates (cosine >= 0.9) per-table match probability is
    * (1-theta/pi)^8 ~ 0.29, so 8 OR'd tables still catch >= 93% of true
    * pairs (~1.0 at the 0.999 planted-duplicate grade), while noise
    * collisions drop 16-fold. annLsh keeps the 16x4 family — top-k
    * retrieval on an isotropic fixture needs the wider OR. */
  private def bucketedWide(s: SparkSession, v: DataFrame): DataFrame =
    v.select(col("vec_id"),
      graft.functions.LshBuckets.lsh_buckets(s, col("e")).as("lb"))
      .select(col("vec_id"), posexplode(expr(
        "transform(sequence(0, 7), " +
          "i -> element_at(lb, 2*i+1) + element_at(lb, 2*i+2) * 16)")))
      .select(col("vec_id"), col("pos").cast("int").as("t"),
        col("col").as("bucket"))

  /** DuckDB mirror of [[bucketed]]: planes as literal lists (same driver-
    * computed values), dot via the sequential fold, bucket = sum of sign
    * bits per 4-plane group. */
  private def bucketedSql: String = {
    val planeRows = LshPlanes.planes.zipWithIndex.map { case (pv, p) =>
      s"($p, [${pv.mkString(", ")}])"
    }.mkString(",\n    ")
    s"""planes(p, pv) AS (VALUES
       |    $planeRows),
       |bits AS (
       |  SELECT vec_id, p // ${LshPlanes.BitsPerTable} AS t,
       |    CASE WHEN ${dotSql("e", "pv")} > 0
       |      THEN (1 << (p % ${LshPlanes.BitsPerTable}))::BIGINT
       |      ELSE 0::BIGINT END AS bit
       |  FROM v CROSS JOIN planes),
       |buckets AS (
       |  SELECT vec_id, t, SUM(bit)::BIGINT AS bucket
       |  FROM bits GROUP BY vec_id, t)""".stripMargin
  }

  /** DuckDB mirror of [[bucketedWide]]: pairs of consecutive 4-bit
    * buckets regrouped into 8-bit signatures (even t = low nibble, odd t
    * = high nibble * 16). Appended after [[bucketedSql]]'s CTEs. */
  private def bucketedWideSql: String =
    """wbuckets AS (
      |  SELECT vec_id, t // 2 AS t,
      |    SUM(CASE WHEN t % 2 = 0 THEN bucket ELSE bucket * 16 END)::BIGINT
      |      AS bucket
      |  FROM buckets GROUP BY vec_id, t // 2)""".stripMargin

  /** ANN via OR-amplified random-hyperplane LSH: a probe's candidates are
    * every vector sharing its bucket in >= 1 of the 16 tables; candidates
    * are then exact-cosine ranked (so returned cosines are identical to
    * brute force — only recall, never precision, is approximate). Fully
    * deterministic, hence fully oracle-checked. */
  val annLsh: Q = Q(
    "ext_sim_ann_lsh",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |${bucketedSql},
       |probes AS (SELECT vec_id AS probe_id FROM v WHERE vec_id < 5),
       |cand AS (
       |  SELECT DISTINCT p.probe_id, c.vec_id AS neighbor_id
       |  FROM probes p
       |  JOIN buckets pb ON pb.vec_id = p.probe_id
       |  JOIN buckets c ON c.t = pb.t AND c.bucket = pb.bucket
       |    AND c.vec_id <> p.probe_id),
       |scored AS (
       |  SELECT cand.probe_id, cand.neighbor_id,
       |    ROUND(${dotSql("pe.e", "ne.e")}
       |      / (${normSql("pe.e")} * ${normSql("ne.e")}), 6) AS cosine
       |  FROM cand
       |  JOIN v pe ON pe.vec_id = cand.probe_id
       |  JOIN v ne ON ne.vec_id = cand.neighbor_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT probe_id, neighbor_id, rank, cosine FROM ranked
       |WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin
  ) { (s, d) =>
    // eager for the same AQE-concurrent-recompute reason as nearDupPairsAt;
    // buckets too: it feeds BOTH the probe lookup and the candidate join,
    // and the 64-plane projection is the op's only expensive subtree — at
    // scale this materialization is the ingest-time LSH index itself
    val v = vecs(s, d).eagerCheckpoint()
    val buckets = bucketed(s, v).eagerCheckpoint()
    val probeBuckets = buckets.join(
      v.filter(col("vec_id") < 5).select(col("vec_id").as("probe_id")),
      col("vec_id") === col("probe_id"))
      .select(col("probe_id"), col("t"), col("bucket"))
    // candidate ids first (narrow distinct), arrays re-attached after —
    // at scale the dedup shuffle must not carry the embedding payload
    val cand = broadcast(probeBuckets)
      .join(buckets, Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val probeVecs = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("e").as("pe"),
        col("nrm").as("pnrm"))
    val scored = cand
      .join(broadcast(probeVecs), Seq("probe_id"))
      .join(v, col("vec_id") === col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(vec_dot(s, col("pe"), col("e")) / (col("pnrm") * col("nrm")), 6)
          .as("cosine"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= 10)
      .select("probe_id", "neighbor_id", "rank", "cosine")
      .orderBy("probe_id", "rank")
  }

  /** Cosine threshold for the near-duplicate pair join. 0.9 is the
    * real-corpus setting; the fixture's vectors are isotropic noise, so
    * the registered operator runs low enough that pairs SURVIVE the
    * 8-bit blocking at sf0.01 to keep the gate NON-vacuous (round 1
    * passed with 0 rows on both engines, which verifies nothing; the
    * round-8 move to 8-bit blocking dropped the old 0.5 gate back to 0
    * rows — the densest pair passing the wide blocking sits at 0.4597).
    * See ExtSpec's planted-fixture test for the 0.9-grade behavior. */
  private val NearDupThreshold = 0.4

  /** Embedding-cosine near-duplicate pairs, LSH-blocked: candidates are
    * pairs sharing >= 1 bucket in the 8-table x 8-bit family
    * ([[bucketedWide]] — NOT the round-1 label blocking, which was a
    * disguised per-label cross join, and NOT annLsh's 16x4 family, whose
    * 16-bucket tables fill linearly with the corpus and made the pair
    * join quadratic: measured 113x runtime at 10x rows). The blocking is
    * part of the declared semantics and mirrored in the oracle, so the
    * gate checks the exact candidate rule. */
  def nearDupPairsAt(s: SparkSession, d: String,
      threshold: Double): DataFrame = {
    // eager materialization: v feeds four subtrees; a lazy .cache() under
    // AQE gives no ordering guarantee and concurrent stages re-derive it
    // (the round-3 dedup finding — same fix here)
    val v = vecs(s, d).eagerCheckpoint()
    // the self-join below consumes buckets TWICE — without eager
    // materialization each side re-derives the 64-plane projection
    val buckets = bucketedWide(s, v).eagerCheckpoint()
    val pairs = buckets.as("a")
      .join(buckets.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    // No explicit pair repartition: round 5 added one here to spread the
    // narrow candidate set before compute-heavy scoring, but the round-6
    // re-measure (min-of-3, fresh JVMs, after the serialized-checkpoint
    // and fast-md5 fixes) shows the op consistently FASTER without it —
    // AQE's post-shuffle width no longer single-threads the verification.
    // At real scale the scoring join shuffles on id_a/id_b anyway, which
    // spreads candidates by itself.
    pairs
      .join(v.select(col("vec_id").as("id_a"), col("e").as("ea"),
        col("nrm").as("na")), Seq("id_a"))
      .join(v.select(col("vec_id").as("id_b"), col("e").as("eb"),
        col("nrm").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(vec_dot(s, col("ea"), col("eb")) / (col("na") * col("nb")), 6)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("id_a", "id_b")
  }

  val nearDupPairs: Q = Q(
    "ext_embed_neardup",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |${bucketedSql},
       |${bucketedWideSql},
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM wbuckets a
       |  JOIN wbuckets b ON b.t = a.t AND b.bucket = a.bucket
       |    AND a.vec_id < b.vec_id),
       |scored AS (
       |  SELECT cand.id_a, cand.id_b,
       |    ROUND(${dotSql("va.e", "vb.e")}
       |      / (${normSql("va.e")} * ${normSql("vb.e")}), 6) AS cosine
       |  FROM cand
       |  JOIN v va ON va.vec_id = cand.id_a
       |  JOIN v vb ON vb.vec_id = cand.id_b)
       |SELECT id_a, id_b, cosine FROM scored
       |WHERE cosine >= $NearDupThreshold
       |ORDER BY id_a, id_b""".stripMargin
  ) { (s, d) => nearDupPairsAt(s, d, NearDupThreshold) }

  /** Embedding-sanity outlier filter: the 20 vectors least aligned with
    * the corpus centroid (SemDeDup/DataComp-style embedding triage —
    * degenerate or off-distribution vectors rank first). Cosine to the
    * centroid equals cosine to the component-wise SUM (same direction),
    * so no division by n ever happens; and the sum is computed over
    * integer-quantized components (`round(e_i * 1e6)` as BIGINT), making
    * it EXACT and order-independent — a float sum over rows would differ
    * between engines and between partitionings (the Determinism rule).
    *
    * Scale shape: one map-side-combined 64-key aggregate (shuffle is 64
    * rows x partitions, whatever the corpus size), the 1-row centroid
    * broadcast back, scoring inside codegen, TakeOrdered top-20. */
  val embedOutliers: Q = Q(
    "ext_embed_outliers",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |q AS (SELECT i, SUM(CAST(round(e[i] * 1e6) AS BIGINT)) AS s
       |      FROM v CROSS JOIN generate_series(1, 64) AS t(i) GROUP BY i),
       |cv AS (SELECT list(CAST(s AS DOUBLE) ORDER BY i) AS c FROM q),
       |scored AS (
       |  SELECT vec_id,
       |    round(${dotSql("e", "c")}
       |      / (${normSql("e")} * ${normSql("c")}), 6) AS cos_centroid
       |  FROM v CROSS JOIN cv)
       |SELECT vec_id, cos_centroid FROM scored
       |ORDER BY cos_centroid, vec_id LIMIT 20""".stripMargin
  ) { (s, d) =>
    val v = vecs(s, d)
    val cv = v
      .select(posexplode(col("e")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(sum(round(col("x") * 1e6, 0).cast("long")).as("sv"))
      .agg(sort_array(collect_list(struct(col("i"), col("sv")))).as("ps"))
      .select(transform(col("ps"), p => p.getField("sv").cast("double"))
        .as("c"))
    v.crossJoin(broadcast(cv))
      .select(col("vec_id"),
        round(vec_dot(s, col("e"), col("c")) /
          (col("nrm") * sqrt(vec_dot(s, col("c"), col("c")))), 6)
          .as("cos_centroid"))
      .orderBy(col("cos_centroid"), col("vec_id"))
      .limit(20)
  }

  private val PrefixDims = 16

  /** Prefix-dim sequential-fold dot (the first [[PrefixDims]] of 64) —
    * the DuckDB mirror of `vec_dot(slice(e, 1, 16), ...)`. */
  private def pdotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(
       |    generate_series(1, $PrefixDims), i -> $a[i] * $b[i])),
       |    (acc, x) -> acc + x)""".stripMargin
  private def pnormSql(a: String): String = s"sqrt(${pdotSql(a, a)})"

  /** Two-stage coarse-to-fine retrieval on PREFIX dimensions
    * (Matryoshka-style, Kusupati et al. NeurIPS'22): stage 1 scores the
    * whole corpus with only the first 16 of 64 dims — a quarter of the
    * FLOPs and, with the prefix slice materialized as its own column (as
    * a real deployment would), a quarter of the bytes streamed — keeping
    * 32 candidates per probe; stage 2 re-ranks only those candidates
    * with the exact full-dim cosine. In a production vector store stage
    * 2 is id-keyed point access; the fixture plan streams the corpus
    * once more but hash-joins it against the broadcast 160-row candidate
    * set, so nothing re-materializes or shuffles. Candidate and
    * final ranks both break ties by id over 6-rounded scores, and every
    * float reduction is the same sequential fold in both engines, so the
    * full two-stage pipeline hash-matches. */
  val prefixRerank: Q = Q(
    "ext_sim_prefix_rerank",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |probes AS (SELECT vec_id AS probe_id, e AS pe FROM v
       |  WHERE vec_id < 5),
       |coarse AS (
       |  SELECT probe_id, vec_id AS neighbor_id,
       |    ROUND(${pdotSql("pe", "e")}
       |      / (${pnormSql("pe")} * ${pnormSql("e")}), 6) AS pcos
       |  FROM probes JOIN v ON vec_id <> probe_id),
       |cand AS (SELECT probe_id, neighbor_id FROM (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY pcos DESC, neighbor_id) AS prank FROM coarse) c
       |  WHERE prank <= 32),
       |exact AS (
       |  SELECT c.probe_id, c.neighbor_id,
       |    ROUND(${dotSql("p.pe", "n.e")}
       |      / (${normSql("p.pe")} * ${normSql("n.e")}), 6) AS cosine
       |  FROM cand c
       |  JOIN probes p ON p.probe_id = c.probe_id
       |  JOIN v n ON n.vec_id = c.neighbor_id)
       |SELECT probe_id, neighbor_id, rank, cosine FROM (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY cosine DESC, neighbor_id) AS rank FROM exact) r
       |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin
  ) { (s, d) =>
    val p16 = (c: Column) => slice(c, 1, PrefixDims)
    val v = vecs(s, d)
    val probes = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("e").as("pe"),
        col("nrm").as("pnrm"), p16(col("e")).as("pe16"))
      .withColumn("pnrm16", sqrt(vec_dot(s, col("pe16"), col("pe16"))))
    // the ONLY corpus-wide pass: prefix slice + prefix norm per vector
    val corpus16 = v.select(col("vec_id"), p16(col("e")).as("e16"))
      .withColumn("nrm16", sqrt(vec_dot(s, col("e16"), col("e16"))))
    val coarse = broadcast(
        probes.select("probe_id", "pe16", "pnrm16"))
      .join(corpus16, col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        round(vec_dot(s, col("pe16"), col("e16"))
          / (col("pnrm16") * col("nrm16")), 6).as("pcos"))
    val cand = coarse
      .withColumn("prank", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("pcos").desc, col("neighbor_id"))))
      .filter(col("prank") <= 32)
      .select("probe_id", "neighbor_id")
    val exact = cand
      .join(broadcast(probes.select("probe_id", "pe", "pnrm")),
        Seq("probe_id"))
      .join(v.select(col("vec_id").as("neighbor_id"), col("e"),
        col("nrm")), Seq("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(vec_dot(s, col("pe"), col("e"))
          / (col("pnrm") * col("nrm")), 6).as("cosine"))
    exact
      .withColumn("rank", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= 5)
      .select("probe_id", "neighbor_id", "rank", "cosine")
      .orderBy("probe_id", "rank")
  }

  /** Index-quality evaluation as a first-class query: recall@10 of the
    * LSH index ([[annLsh]]) against brute-force ground truth
    * ([[topkBrute]]), per probe. This is the metric a vector-index
    * deployment monitors continuously — both sides are deterministic
    * pipelines already mirrored in SQL, so the evaluation itself is
    * oracle-checked end-to-end (the oracle literally re-runs both
    * pipelines as nested CTEs and intersects them). recall_pct is
    * integer (hits * 100 / truth_k) so the hash contract is float-free.
    *
    * Scale shape: the eval joins two top-k result sets (probes x k rows
    * each), so its cost is the two underlying searches; the intersection
    * is a key-equality join on (probe, neighbor) over k-bounded rows. */
  val evalRecall: Q = Q(
    "ext_eval_ann_recall",
    s"""WITH brute AS (${topkBrute.oracle.get}),
       |lsh AS (${annLsh.oracle.get}),
       |hits AS (
       |  SELECT b.probe_id,
       |    CAST(COUNT(*) AS BIGINT) AS truth_k,
       |    CAST(COUNT(l.neighbor_id) AS BIGINT) AS hits
       |  FROM brute b
       |  LEFT JOIN lsh l ON l.probe_id = b.probe_id
       |    AND l.neighbor_id = b.neighbor_id
       |  GROUP BY b.probe_id)
       |SELECT probe_id, truth_k, hits,
       |  hits * 100 // truth_k AS recall_pct
       |FROM hits ORDER BY probe_id""".stripMargin
  ) { (s, d) =>
    val brute = topkBrute.fn(s, d).select("probe_id", "neighbor_id")
    val lshHit = annLsh.fn(s, d)
      .select(col("probe_id"), col("neighbor_id"), lit(1L).as("hit"))
    brute
      .join(lshHit, Seq("probe_id", "neighbor_id"), "left")
      .groupBy("probe_id")
      .agg(count(lit(1)).as("truth_k"), count(col("hit")).as("hits"))
      .select(col("probe_id"), col("truth_k"), col("hits"),
        expr("hits * 100 div truth_k").as("recall_pct"))
      .orderBy("probe_id")
  }

  /** Margin-based bitext mining (Artetxe & Schwenk, "Margin-based
    * Parallel Corpus Mining", ACL 2019 — absolute-margin variant): for
    * each non-English probe document, the best English document by
    * embedding cosine, scored by the margin over the runner-up
    * (cos1 - cos2) — the standard signal for mining translation pairs
    * from comparable corpora; high margin = the match is uniquely good,
    * not just the nearest of a dense blob.
    *
    * Scale shape (the [[topkBrute]] discipline): probes are the bounded
    * broadcast side, the English corpus STREAMS — no per-probe window
    * ever sees corpus-sized rows and nothing collects: best and
    * runner-up come from two map-side-combined max-of-struct aggregates
    * ((cos, -en_id) lexicographic max = the (cos DESC, en_id) window's
    * rank-1 row; excluding it and re-maxing = rank 2). The production
    * path swaps the brute scorer for the [[annLsh]] candidate
    * generator and computes the margin over the candidate set. */
  val bitextMine: Q = Q(
    "ext_bitext_mine",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |dl AS (SELECT doc_id, lang FROM documents),
       |src AS (
       |  SELECT vec_id AS src_id, lang AS src_lang, e AS pe
       |  FROM v JOIN dl ON dl.doc_id = v.vec_id
       |  WHERE lang <> 'en' AND vec_id < 100),
       |en AS (
       |  SELECT vec_id AS en_id, e
       |  FROM v JOIN dl ON dl.doc_id = v.vec_id WHERE lang = 'en'),
       |scored AS (
       |  SELECT src_id, src_lang, en_id,
       |    ROUND(${dotSql("pe", "e")} / (${normSql("pe")} * ${normSql("e")}),
       |      6) AS cos
       |  FROM src CROSS JOIN en),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY src_id
       |    ORDER BY cos DESC, en_id) AS rn FROM scored),
       |b1 AS (SELECT src_id, src_lang, en_id, cos FROM ranked WHERE rn = 1),
       |b2 AS (SELECT src_id, cos AS cos2 FROM ranked WHERE rn = 2)
       |SELECT b1.src_id, b1.src_lang, b1.en_id, b1.cos AS cos_best,
       |  ROUND(b1.cos - b2.cos2, 6) AS margin
       |FROM b1 JOIN b2 ON b2.src_id = b1.src_id
       |ORDER BY margin DESC, b1.src_id LIMIT 20""".stripMargin
  ) { (s, d) =>
    val dl = Tables.documents(s, d).select(col("doc_id"), col("lang"))
    val v = vecs(s, d)
    val src = v.join(dl, col("vec_id") === col("doc_id"))
      .filter(col("lang") =!= "en" && col("vec_id") < 100)
      .select(col("vec_id").as("src_id"), col("lang").as("src_lang"),
        col("e").as("pe"), col("nrm").as("pn"))
    val en = v.join(dl, col("vec_id") === col("doc_id"))
      .filter(col("lang") === "en")
      .select(col("vec_id").as("en_id"), col("e"), col("nrm"))
    val scored = broadcast(src).join(en)
      .select(col("src_id"), col("src_lang"), col("en_id"),
        round(vec_dot(s, col("pe"), col("e")) / (col("pn") * col("nrm")), 6)
          .as("cos"))
      .eagerCheckpoint() // read twice: best pass + runner-up pass
    val best = scored.groupBy("src_id", "src_lang")
      .agg(max(struct(col("cos").as("c"), (-col("en_id")).as("ni")))
        .as("b"))
      .select(col("src_id"), col("src_lang"),
        col("b.c").as("cos_best"), (-col("b.ni")).as("en_id"))
    val second = scored
      .join(broadcast(best.select(col("src_id"),
        col("cos_best").as("bc"), col("en_id").as("bi"))), Seq("src_id"))
      .filter(!(col("cos") === col("bc") && col("en_id") === col("bi")))
      .groupBy("src_id")
      .agg(max(struct(col("cos").as("c"), (-col("en_id")).as("ni")))
        .as("b2"))
      .select(col("src_id"), col("b2.c").as("cos2"))
    best.join(second, Seq("src_id"))
      .select(col("src_id"), col("src_lang"), col("en_id"),
        col("cos_best"), round(col("cos_best") - col("cos2"), 6)
          .as("margin"))
      .orderBy(col("margin").desc, col("src_id")).limit(20)
  }

  private val MmrK = 20
  private val MmrPicks = 5

  /** Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein,
    * SIGIR'98): after relevance retrieval, greedily pick the candidate
    * maximizing `0.7 * rel - 0.3 * max-sim-to-already-picked` — the
    * rerank every retrieval pipeline runs when the raw top-k is five
    * near-copies of the same document and the consumer (a RAG context
    * window) wants coverage, not redundancy.
    *
    * Both engines run the SAME unrolled greedy: per probe, the
    * [[MmrK]]-candidate relevance list (the [[topkBrute]] discipline),
    * pairwise candidate cosines rounded once at the boundary, then
    * [[MmrPicks]] relational rounds — remaining = anti-join vs picked,
    * penalty = max sim to the picked set, argmax per probe by
    * (score desc, id). Selection runs for ALL probes simultaneously
    * (windows partition by probe) — the per-probe work is O(picks * k^2)
    * on k-bounded frames, so the rerank cost is fixed per probe
    * regardless of corpus size; candidate generation is the part an
    * index (IVF/LSH) serves at scale.
    *
    * Determinism: rel and pairwise sims are sequential-fold cosines
    * ROUND(.,6) (the module contract); the greedy score is computed in
    * EXACT decimal — the round-6 doubles sit within 1e-16 of a 6-decimal
    * value, so the DECIMAL(9,6) cast is tie-free, and `0.7*rel - 0.3*mx`
    * in decimal is exact in both engines (a double-arithmetic score
    * followed by ROUND(.,6) hit a real half-up/half-even tie at sf0.01 —
    * 0.2600395 — the Determinism rule-2 case). One final cast to double;
    * ties in the argmax break on the identical decimal, then id.
    */
  val mmrRerank: Q = {
    val score = "0.7 * CAST(rel AS DECIMAL(9,6)) - 0.3 * CAST(mx AS DECIMAL(9,6))"
    val rounds = (2 to MmrPicks).map { k =>
      s"""mx$k AS (
         |  SELECT c.probe_id, c.id, c.rel, MAX(p.sim) AS mx
         |  FROM cands c
         |  JOIN selu${k - 1} s ON s.probe_id = c.probe_id
         |  JOIN ps p ON p.a = c.id AND p.b = s.id
         |  WHERE NOT EXISTS (SELECT 1 FROM selu${k - 1} x
         |    WHERE x.probe_id = c.probe_id AND x.id = c.id)
         |  GROUP BY 1, 2, 3),
         |sel$k AS (
         |  SELECT probe_id, id, rel, $score AS sc, $k AS pick
         |  FROM (SELECT probe_id, id, rel, mx,
         |      row_number() OVER (PARTITION BY probe_id
         |        ORDER BY ($score) DESC, id) AS rn
         |    FROM mx$k) WHERE rn = 1),
         |selu$k AS (SELECT * FROM selu${k - 1}
         |  UNION ALL SELECT * FROM sel$k)""".stripMargin
    }.mkString(",\n")
    Q(
      "ext_sim_mmr",
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |probes AS (SELECT vec_id AS probe_id, e AS pe FROM v
         |  WHERE vec_id < 5),
         |scored0 AS (
         |  SELECT probe_id, vec_id AS id,
         |    ROUND(${dotSql("pe", "e")}
         |      / (${normSql("pe")} * ${normSql("e")}), 6) AS rel
         |  FROM probes JOIN v ON vec_id <> probe_id),
         |cands AS (
         |  SELECT probe_id, id, rel FROM (
         |    SELECT *, row_number() OVER (PARTITION BY probe_id
         |      ORDER BY rel DESC, id) AS rn FROM scored0)
         |  WHERE rn <= $MmrK),
         |ids AS (SELECT DISTINCT id FROM cands),
         |cv AS (SELECT vec_id AS cid, e FROM v
         |  JOIN ids ON ids.id = v.vec_id),
         |ps AS (
         |  SELECT a.cid AS a, b.cid AS b,
         |    ROUND(${dotSql("a.e", "b.e")}
         |      / (${normSql("a.e")} * ${normSql("b.e")}), 6) AS sim
         |  FROM cv a JOIN cv b ON a.cid <> b.cid),
         |sel1 AS (
         |  SELECT probe_id, id, rel, $score AS sc, 1 AS pick
         |  FROM (SELECT probe_id, id, rel, 0.0 AS mx,
         |      row_number() OVER (PARTITION BY probe_id
         |        ORDER BY ($score) DESC, id) AS rn FROM cands)
         |  WHERE rn = 1),
         |selu1 AS (SELECT * FROM sel1),
         |$rounds
         |SELECT probe_id, CAST(pick AS BIGINT) AS pick,
         |  id AS neighbor_id, rel, CAST(sc AS DOUBLE) AS mmr_score
         |FROM selu$MmrPicks ORDER BY probe_id, pick""".stripMargin
    ) { (s, d) =>
      val v = vecs(s, d)
      val probes = v.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("e").as("pe"),
          col("nrm").as("pnrm"))
      val cands = broadcast(probes)
        .join(v, col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("id"),
          round(vec_dot(s, col("pe"), col("e"))
            / (col("pnrm") * col("nrm")), 6).as("rel"))
        .withColumn("rn", row_number().over(Window.partitionBy("probe_id")
          .orderBy(col("rel").desc, col("id"))))
        .filter(col("rn") <= MmrK).drop("rn")
        .eagerCheckpoint()
      val ids = cands.select(col("id")).distinct()
      val cv = v.join(ids, col("vec_id") === col("id"), "left_semi")
      val pa = cv.select(col("vec_id").as("a"), col("e").as("ae"),
        col("nrm").as("an"))
      val pb = cv.select(col("vec_id").as("b"), col("e").as("be"),
        col("nrm").as("bn"))
      val ps = broadcast(pa).join(pb, col("a") =!= col("b"))
        .select(col("a"), col("b"),
          round(vec_dot(s, col("ae"), col("be"))
            / (col("an") * col("bn")), 6).as("sim"))
        .eagerCheckpoint()
      def pickOf(scored: DataFrame, k: Int): DataFrame = scored
        .withColumn("sc", expr(score))
        .withColumn("rn", row_number().over(Window.partitionBy("probe_id")
          .orderBy(col("sc").desc, col("id"))))
        .filter(col("rn") === 1)
        .select(col("probe_id"), col("id"), col("rel"), col("sc"),
          lit(k).as("pick"))
      var selected = pickOf(cands.withColumn("mx", lit(0.0)), 1)
        .eagerCheckpoint()
      (2 to MmrPicks).foreach { k =>
        val remaining = cands.join(selected.select("probe_id", "id"),
          Seq("probe_id", "id"), "left_anti")
        val mx = remaining
          .join(selected.select(col("probe_id"), col("id").as("sid")),
            Seq("probe_id"))
          .join(ps, col("a") === col("id") && col("b") === col("sid"))
          .groupBy("probe_id", "id")
          .agg(first(col("rel")).as("rel"), max(col("sim")).as("mx"))
        selected = selected.union(pickOf(mx, k)).eagerCheckpoint()
      }
      selected
        .select(col("probe_id"), col("pick").cast("long").as("pick"),
          col("id").as("neighbor_id"), col("rel"),
          col("sc").cast("double").as("mmr_score"))
        .orderBy("probe_id", "pick")
    }
  }

  /** Label-noise audit (confident-learning / cleanlab shape, Northcutt
    * JAIR'21): for every vector, how many of its 10 nearest neighbors by
    * cosine share its label. Low agreement flags likely mislabeled
    * examples — the data-quality pass a training pipeline runs before
    * trusting labels. Pure integers end-to-end (n_same in 0..10), rank
    * ties broken (rounded-cosine desc, vec_id) exactly as
    * [[topkBrute]], so both engines walk identical neighbor lists.
    *
    * Scale shape: the audit runs on a bounded COHORT (vec_id < 200 — a
    * rolling sample in production) against the full corpus: the cohort
    * side broadcasts, every corpus vector scores against it map-side,
    * and the only shuffle is (cohort x corpus) pair rows into the
    * per-cohort rank — linear in corpus size, never all-pairs (an
    * all-pairs draft of this row went 6x slower at 4x vectors; the
    * cohort bound is the fix, same discipline as [[topkBrute]]'s probe
    * bound). A 100 TB corpus additionally swaps candidate generation to
    * the IVF/LSH index families and keeps this row as the exactness
    * oracle on the sample. */
  val labelNoise: Q = Q(
    "ext_label_noise",
    s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e
       |  FROM embeddings),
       |scored AS (
       |  SELECT a.vec_id, a.label,
       |    CAST(b.label = a.label AS INT) AS same,
       |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |      ROUND(${dotSql("a.e", "b.e")}
       |        / (${normSql("a.e")} * ${normSql("b.e")}), 6) DESC,
       |      b.vec_id) AS rank
       |  FROM v a JOIN v b ON a.vec_id <> b.vec_id
       |  WHERE a.vec_id < 200)
       |SELECT vec_id, label, CAST(SUM(same) AS BIGINT) AS n_same,
       |  (SUM(same) <= 3) AS suspect
       |FROM scored WHERE rank <= 10
       |GROUP BY vec_id, label ORDER BY vec_id""".stripMargin
  ) { (s, d) =>
    val v = vecs(s, d)
    val a = v.filter(col("vec_id") < 200)
      .select(col("vec_id"), col("label"), col("e"), col("nrm"))
    val b = v.select(col("vec_id").as("bid"), col("label").as("bl"),
      col("e").as("be"), col("nrm").as("bnrm"))
    broadcast(a).join(b, col("vec_id") =!= col("bid"))
      .select(col("vec_id"), col("label"),
        (col("bl") === col("label")).cast("int").as("same"),
        round(vec_dot(s, col("e"), col("be"))
          / (col("nrm") * col("bnrm")), 6).as("cos"),
        col("bid"))
      .withColumn("rank", row_number().over(Window.partitionBy("vec_id")
        .orderBy(col("cos").desc, col("bid"))))
      .filter(col("rank") <= 10)
      .groupBy("vec_id", "label")
      .agg(sum("same").cast("long").as("n_same"))
      .select(col("vec_id"), col("label"), col("n_same"),
        (col("n_same") <= 3).as("suspect"))
      .orderBy("vec_id")
  }

  val all: Seq[Q] = Seq(topkBrute, nearDupPairs, annLsh, embedOutliers,
    prefixRerank, evalRecall, bitextMine, mmrRerank, labelNoise)
}

/** Fixed random-hyperplane family shared by [[Similarity.annLsh]] and
  * [[Similarity.nearDupPairs]]: NumTables independent tables of
  * BitsPerTable sign bits each. Components are +-1 from md5 parity of
  * "plane:dim" — reproducible with no RNG state, and computed ONCE here on
  * the driver (round 1 built them as per-row md5 expression trees, which
  * bloated the plan and the runtime).
  *
  * Sizing: 16 x 4-bit tables. The fixture's embeddings are isotropic
  * noise (10th-nearest-neighbor cosine ~0.25-0.4), where LSH provably
  * cannot have both high recall and a small candidate set; 16x4 holds
  * recall@10 >= 0.85 at every fixture scale. On a real near-duplicate
  * corpus (neighbors at cosine >= 0.9) the same family prunes hard:
  * P(4-bit match) = (1 - theta/pi)^4 ~ 0.54 per table for cosine-0.9
  * pairs vs (1/2)^4 = 0.0625 for noise pairs.
  */
private[graft] object LshPlanes {
  val NumTables = 16
  val BitsPerTable = 4
  val Dims = 64

  /** planes(p)(i): the i-th component of hyperplane p. */
  val planes: IndexedSeq[Array[Double]] =
    (0 until NumTables * BitsPerTable).map { p =>
      Array.tabulate(Dims) { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(s"$p:$i".getBytes("UTF-8"))
        // parity of the first hex digit = parity of byte 0's high nibble
        if (((h(0) >> 4) & 0x1) == 1) 1.0 else -1.0
      }
    }
}
