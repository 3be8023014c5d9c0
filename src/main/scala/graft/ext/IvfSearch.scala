package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Q
import graft.core.Eager.EagerCheckpoint
import graft.functions.VecDot.vec_dot

/** [EXT] IVF (inverted-file) approximate nearest neighbor (the coarse
  * quantizer of Jegou/Douze/Schmid, "Product quantization for nearest
  * neighbor search", TPAMI 2011) — the second scale path next to
  * [[Similarity.annLsh]], and the standard shape for
  * embedding retrieval at corpus scale: partition the corpus into K cells
  * around centroids at INGEST time, then search only the `NProbe` cells
  * closest to each probe. Cost per probe drops from O(corpus) to
  * O(corpus * NProbe / K) while the per-candidate scoring stays exact
  * cosine (precision is exact on the candidate set; only recall is
  * approximate — same contract as annLsh).
  *
  * Centroids here are the deterministic seed set (the K lowest vec_ids) —
  * a 0-iteration k-means. That keeps the whole operator a pure function of
  * the table, so the DuckDB oracle computes the identical centroids,
  * assignments, candidate sets and cosines, and the gate hash-checks the
  * full pipeline (k-means means are parallel float sums, not bit-
  * reproducible across engines; the trained path exists as
  * [[trainedCentroids]]/[[searchTrained]] with a recall spec, and the
  * query shape is identical under either quantizer). Cell assignment is a broadcast
  * join (corpus x K tiny centroid rows) + one max_by per vector — no
  * driver-side loop, no collect.
  *
  * All dot products are the strictly sequential [[graft.functions.VecDot]]
  * fold in Spark and the equivalent `list_reduce` fold in DuckDB, so
  * doubles are bit-identical across engines (see [[Similarity]]).
  */
object IvfSearch {

  private[ext] val K = 32
  private[ext] val NProbe = 4
  private val TopK = 10

  private[ext] def cents(v: DataFrame): DataFrame =
    v.filter(col("vec_id") < K)
      .select(col("vec_id").as("cent_id"), col("e").as("ce"),
        col("nrm").as("cnrm"))

  /** corpus assigned to cells: (vec_id, cell). Broadcast cross product
    * against the K tiny centroid rows, then ONE partial-aggregating
    * max_by per vector — the shuffle carries (vec_id, cell) only, never
    * the embedding payload. Ties on equal cosine break toward the lower
    * centroid id in BOTH engines. */
  private[ext] def assigned(s: SparkSession, v: DataFrame,
      c: DataFrame): DataFrame =
    v.crossJoin(broadcast(c))
      .select(col("vec_id"), col("cent_id"),
        (vec_dot(s, col("e"), col("ce")) / (col("nrm") * col("cnrm")))
          .as("ccos"))
      .groupBy("vec_id")
      .agg(max_by(col("cent_id"), struct(col("ccos"), -col("cent_id")))
        .as("cell"))

  /** A probe's NProbe closest cells (by cosine to the centroid, ties to
    * the lower centroid id). */
  private[ext] def probeCells(s: SparkSession, v: DataFrame,
      c: DataFrame): DataFrame = {
    val probes = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("e").as("pe"),
        col("nrm").as("pnrm"))
    probes.crossJoin(broadcast(c))
      .select(col("probe_id"),
        col("cent_id"),
        (vec_dot(s, col("pe"), col("ce")) / (col("pnrm") * col("cnrm")))
          .as("ccos"))
      .withColumn("crank", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("ccos").desc, col("cent_id"))))
      .filter(col("crank") <= NProbe)
      .select(col("probe_id"), col("cent_id").as("cell"))
  }

  /** Offline-trained coarse quantizer: Lloyd's k-means over the corpus,
    * run entirely as DataFrame aggregates — no collect, no RNG. Init is
    * the deterministic seed set (the same K lowest vec_ids the gate op
    * uses), iteration count is fixed ([[TrainIters]]), and each round
    * is: assign every vector to its max-cosine centroid (broadcast
    * cross product + one max_by, the [[assigned]] shape), then
    * recompute each cell's mean per dimension (posexplode →
    * per-(cell, dim) avg → re-form the array ordered by dim), SNAPPED
    * to ROUND(.,6). A cell that loses all members keeps its previous
    * centroid, so K never shrinks. Per-round state is K tiny rows,
    * eagerly checkpointed to cut the iterative lineage — the exact shape
    * an offline 100 TB centroid-training job has (the corpus is scanned
    * `iters` times; centroids live in a broadcast).
    *
    * The round-6 snap (round 18, the [[Clustering]] recipe) is what
    * makes this iterative float trainer cross-engine VALUE-EXACT:
    * per-dimension means are the one parallel float reduction whose
    * summation order differs between engines, and rounding each round's
    * centroids re-synchronizes both before the next assignment — so
    * the DuckDB oracle replays the whole training as chained CTEs and
    * [[ivfTrained]] hash-checks the trained index end to end (until
    * round 17 these rows were benched-only with recall specs; the
    * specs remain). Cosines, norms, and the tie-breaks were already
    * engine-exact (sequential folds + IEEE division). */
  def trainedCentroids(s: SparkSession, v: DataFrame,
      iters: Int = TrainIters): DataFrame = {
    var c = cents(v).eagerCheckpoint()
    for (_ <- 1 to iters) {
      val assign = assigned(s, v, c)
      val means = v.join(assign, Seq("vec_id"))
        .select(col("cell"), posexplode(col("e")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(round(avg(col("x")), 6).as("mx"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"),
          col("mx")))), st => st("mx")).as("me"))
      c = c.join(means, c("cent_id") === means("cell"), "left")
        .select(col("cent_id"),
          coalesce(col("me"), col("ce")).as("ce"))
        .withColumn("cnrm", sqrt(vec_dot(s, col("ce"), col("ce"))))
        .eagerCheckpoint()
    }
    c
  }

  private[ext] val TrainIters = 3

  /** DuckDB replay of [[trainedCentroids]]: `c0` is the seed set; each
    * round assigns every vector to its max-cosine centroid of the
    * previous round's table (ties to the lower cent_id —
    * `max_by(struct(ccos, -cent_id))` ↔ `ORDER BY ccos DESC, cent_id`)
    * and re-forms each cell's per-dimension ROUND(AVG, 6); an emptied
    * cell keeps its previous centroid (LEFT JOIN + COALESCE in both
    * engines). Ends by aliasing the final table as `cents`, so the
    * search tail is the `ext_sim_ivf` oracle's verbatim. */
  private def trainedCentsCtes: String = {
    val rounds = (1 to TrainIters).map { r =>
      s"""a$r AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT v.vec_id, c.cent_id AS cell,
         |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |        ${Similarity.dotSql("v.e", "c.ce")}
         |          / (${Similarity.normSql("v.e")} * ${Similarity.normSql("c.ce")})
         |          DESC, c.cent_id) AS arank
         |    FROM v CROSS JOIN c${r - 1} c) s$r WHERE arank = 1),
         |c$r AS (
         |  SELECT p.cent_id, COALESCE(m.me, p.ce) AS ce
         |  FROM c${r - 1} p LEFT JOIN (
         |    SELECT cell AS cent_id, list(mv ORDER BY j) AS me FROM (
         |      SELECT a$r.cell, j, ROUND(AVG(vv.e[j]), 6) AS mv
         |      FROM a$r JOIN v vv USING (vec_id) CROSS JOIN
         |        (SELECT unnest(generate_series(1, 64)) AS j) js
         |      GROUP BY a$r.cell, j) g$r GROUP BY cent_id) m
         |    USING (cent_id))""".stripMargin
    }.mkString(",\n")
    s"""c0 AS (SELECT vec_id AS cent_id, e AS ce FROM v WHERE vec_id < $K),
       |$rounds,
       |cents AS (SELECT cent_id, ce FROM c$TrainIters)""".stripMargin
  }

  val ivf: Q = Q(
    "ext_sim_ivf",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, e AS ce FROM v WHERE vec_id < $K),
       |assigned AS (
       |  SELECT vec_id, cent_id AS cell FROM (
       |    SELECT v.vec_id, c.cent_id,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |        ${Similarity.dotSql("v.e", "c.ce")}
       |          / (${Similarity.normSql("v.e")} * ${Similarity.normSql("c.ce")})
       |          DESC, c.cent_id) AS arank
       |    FROM v CROSS JOIN cents c) s
       |  WHERE arank = 1),
       |pcells AS (
       |  SELECT probe_id, cent_id AS cell FROM (
       |    SELECT p.vec_id AS probe_id, c.cent_id,
       |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |        ${Similarity.dotSql("p.e", "c.ce")}
       |          / (${Similarity.normSql("p.e")} * ${Similarity.normSql("c.ce")})
       |          DESC, c.cent_id) AS crank
       |    FROM v p CROSS JOIN cents c WHERE p.vec_id < 5) r
       |  WHERE crank <= $NProbe),
       |cand AS (
       |  SELECT pc.probe_id, a.vec_id AS neighbor_id
       |  FROM pcells pc JOIN assigned a ON a.cell = pc.cell
       |  WHERE a.vec_id <> pc.probe_id),
       |scored AS (
       |  SELECT cand.probe_id, cand.neighbor_id,
       |    ROUND(${Similarity.dotSql("pe.e", "ne.e")}
       |      / (${Similarity.normSql("pe.e")} * ${Similarity.normSql("ne.e")}),
       |      6) AS cosine
       |  FROM cand
       |  JOIN v pe ON pe.vec_id = cand.probe_id
       |  JOIN v ne ON ne.vec_id = cand.neighbor_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT probe_id, neighbor_id, rank, cosine FROM ranked
       |WHERE rank <= $TopK ORDER BY probe_id, rank""".stripMargin
  ) { (s, d) => searchAt(s, d) }

  /** Gate row for the TRAINED IVF index (round 18 — the registry's last
    * benched-only rows become oracle rows): the full production path —
    * Lloyd's-trained coarse quantizer, ingest-staged centroid + cell
    * tables, query-time probe ranking + candidate join + exact rerank —
    * hash-checked against a DuckDB oracle that REPLAYS THE TRAINING
    * ITSELF as chained CTEs ([[trainedCentsCtes]]; the round-6
    * mean snap is what makes the iterative trainer cross-engine
    * value-exact — the [[Clustering]] recipe). The search tail below
    * `cents` is the `ext_sim_ivf` oracle's verbatim, so the two rows
    * differ in exactly one thing: which quantizer defines the cells.
    * Training + corpus assignment stay INGEST work (`setup` stages
    * them outside Bench's timed window); the recall spec (IvfSpec)
    * still pins trained recall >= seed recall. */
  val ivfTrained: Q = Q(
    "ext_sim_ivf_trained",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |$trainedCentsCtes,
       |assigned AS (
       |  SELECT vec_id, cent_id AS cell FROM (
       |    SELECT v.vec_id, c.cent_id,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |        ${Similarity.dotSql("v.e", "c.ce")}
       |          / (${Similarity.normSql("v.e")} * ${Similarity.normSql("c.ce")})
       |          DESC, c.cent_id) AS arank
       |    FROM v CROSS JOIN cents c) s
       |  WHERE arank = 1),
       |pcells AS (
       |  SELECT probe_id, cent_id AS cell FROM (
       |    SELECT p.vec_id AS probe_id, c.cent_id,
       |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |        ${Similarity.dotSql("p.e", "c.ce")}
       |          / (${Similarity.normSql("p.e")} * ${Similarity.normSql("c.ce")})
       |          DESC, c.cent_id) AS crank
       |    FROM v p CROSS JOIN cents c WHERE p.vec_id < 5) r
       |  WHERE crank <= $NProbe),
       |cand AS (
       |  SELECT pc.probe_id, a.vec_id AS neighbor_id
       |  FROM pcells pc JOIN assigned a ON a.cell = pc.cell
       |  WHERE a.vec_id <> pc.probe_id),
       |scored AS (
       |  SELECT cand.probe_id, cand.neighbor_id,
       |    ROUND(${Similarity.dotSql("pe.e", "ne.e")}
       |      / (${Similarity.normSql("pe.e")} * ${Similarity.normSql("ne.e")}),
       |      6) AS cosine
       |  FROM cand
       |  JOIN v pe ON pe.vec_id = cand.probe_id
       |  JOIN v ne ON ne.vec_id = cand.neighbor_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT probe_id, neighbor_id, rank, cosine FROM ranked
       |WHERE rank <= $TopK ORDER BY probe_id, rank""".stripMargin
  ) { (s, d) => searchTrainedIndexed(s, d) }
    .copy(setup = Some(ensureTrained _))

  /** The IVF search pipeline (exposed for the recall spec). */
  def searchAt(s: SparkSession, d: String): DataFrame = {
    val v = Similarity.vecs(s, d).eagerCheckpoint()
    searchWith(s, v, cents(v))
  }

  /** IVF search with the trained quantizer (the production path). */
  def searchTrained(s: SparkSession, d: String, iters: Int = 3): DataFrame = {
    val v = Similarity.vecs(s, d).eagerCheckpoint()
    searchWith(s, v, trainedCentroids(s, v, iters))
  }

  // ------------------------------------------ ingest-staged trained index

  /** Ingest-time staging of the TRAINED quantizer ([[PreparedTables]]
    * memo): Lloyd's training and the corpus cell assignment both happen
    * when the index is built, not when a query runs — the cost model
    * every production vector index has. The staged tables are the K tiny
    * trained centroids and the (vec_id, cell) assignment. */
  private val preparedTrained = new PreparedTables(
    Seq("embeddings.parquet"),
    Seq("graft_ivf_trained_cents", "graft_ivf_trained_cells"),
    writeTrained,
    // r18: the trainer snaps means round-6 — a warehouse staged by the
    // unsnapped trainer must restage, not serve the old centroids
    version = "r18-snap6")

  def ensureTrained(s: SparkSession, d: String): Unit =
    preparedTrained.ensurePrepared(s, d)

  private def writeTrained(s: SparkSession, d: String): Unit = {
    val v = Similarity.vecs(s, d).eagerCheckpoint()
    val c = trainedCentroids(s, v, 3)
    c.write.mode("overwrite").format("parquet")
      .saveAsTable("graft_ivf_trained_cents")
    assigned(s, v, c).write.mode("overwrite").format("parquet")
      .saveAsTable("graft_ivf_trained_cells")
  }

  /** Query against the staged trained index: query-time work is the
    * probe-to-centroid ranking (probes × K tiny staged rows), the
    * candidate join against the staged cell assignment, and the exact
    * rerank of the candidate-bounded corpus reads. Results are
    * IDENTICAL to [[searchTrained]] (double arrays round-trip parquet
    * bit-exactly; every downstream step is shared) — spec-pinned. */
  def searchTrainedIndexed(s: SparkSession, d: String): DataFrame = {
    ensureTrained(s, d)
    val v = Similarity.vecs(s, d)
    val c = s.table("graft_ivf_trained_cents")
    val cand = probeCells(s, v, c)
      .join(s.table("graft_ivf_trained_cells")
        .select(col("vec_id").as("neighbor_id"), col("cell")), Seq("cell"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select("probe_id", "neighbor_id")
    scoreCandidates(s, v, cand)
  }

  /** Each probe's candidate set under quantizer `c`: the residents of
    * its NProbe closest cells, self excluded — the coarse-pruning stage
    * shared by IVF exact scoring and the IVF-PQ composition. */
  private[ext] def candidates(s: SparkSession, v: DataFrame,
      c: DataFrame): DataFrame =
    probeCells(s, v, c)
      .join(assigned(s, v, c).select(col("vec_id").as("neighbor_id"),
        col("cell")), Seq("cell"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select("probe_id", "neighbor_id")

  /** Candidates under the seed quantizer. */
  private[ext] def candidates(s: SparkSession, v: DataFrame): DataFrame =
    candidates(s, v, cents(v))

  private def searchWith(s: SparkSession, v: DataFrame,
      c: DataFrame): DataFrame =
    scoreCandidates(s, v, candidates(s, v, c))

  /** Exact-cosine rerank of an externally-derived candidate set — the
    * scoring tail shared by the inline and ingest-staged IVF paths. */
  private def scoreCandidates(s: SparkSession, v: DataFrame,
      cand: DataFrame): DataFrame = {
    val probeVecs = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("e").as("pe"),
        col("nrm").as("pnrm"))
    cand
      .join(broadcast(probeVecs), Seq("probe_id"))
      .join(v.select(col("vec_id").as("neighbor_id"), col("e"), col("nrm")),
        Seq("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(vec_dot(s, col("pe"), col("e")) / (col("pnrm") * col("nrm")), 6)
          .as("cosine"))
      .withColumn("rank", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= TopK)
      .select("probe_id", "neighbor_id", "rank", "cosine")
      .orderBy("probe_id", "rank")
  }

  /** Cosine threshold for [[semDedup]]'s within-cell duplicate rule. The
    * real-corpus setting is ~0.9 (SemDeDup's epsilon); the fixture's
    * isotropic vectors top out near 0.51 before blocking, so the gate
    * runs low enough that the DROP side is non-vacuous after cell
    * blocking (see the planted ExtSpec test for 0.9-grade behavior). */
  private val SemDedupEps = 0.4

  /** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540): block by k-means cell (the SAME
    * coarse quantizer as [[ivf]]), compare pairs only within a cell, and
    * drop every vector that has a more-senior (lower vec_id) neighbor at
    * cosine >= eps in its cell. Emits one verdict row per vector.
    *
    * This is the third blocking scheme in the similarity family — LSH
    * buckets ([[Similarity.nearDupPairs]]) block by signature; cells
    * block by learned geometry, which is what SemDeDup showed matters
    * for semantic (not lexical) duplicates. Cell size is the scale knob:
    * cells hold ~n/K vectors, so K grows with the corpus (100k+ cells at
    * web scale per the paper) and the within-cell pair join stays
    * O(n^2/K) TOTAL, distributed by cell. Plan shape: assignment is a
    * broadcast-K cross + one max_by (no payload in the shuffle); the
    * pair join carries narrow (vec_id, cell) rows and re-attaches
    * embeddings only for the qualifying candidates' exact scoring.
    * Seed-quantizer centroids keep the whole op a pure function of the
    * table, so the oracle replays it exactly (same reasoning as [[ivf]];
    * the trained path composes via [[trainedCentroids]]). */
  val semDedup: Q = Q(
    "ext_sim_semdedup",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, e AS ce FROM v WHERE vec_id < $K),
       |assigned AS (
       |  SELECT vec_id, cent_id AS cell FROM (
       |    SELECT v.vec_id, c.cent_id,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |        ${Similarity.dotSql("v.e", "c.ce")}
       |          / (${Similarity.normSql("v.e")} * ${Similarity.normSql("c.ce")})
       |          DESC, c.cent_id) AS arank
       |    FROM v CROSS JOIN cents c) s
       |  WHERE arank = 1),
       |dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM assigned a JOIN assigned b
       |    ON b.cell = a.cell AND a.vec_id < b.vec_id
       |  JOIN v va ON va.vec_id = a.vec_id
       |  JOIN v vb ON vb.vec_id = b.vec_id
       |  WHERE ROUND(${Similarity.dotSql("va.e", "vb.e")}
       |    / (${Similarity.normSql("va.e")} * ${Similarity.normSql("vb.e")}),
       |    6) >= $SemDedupEps)
       |SELECT asg.vec_id, asg.cell, (d.vec_id IS NULL) AS kept
       |FROM assigned asg LEFT JOIN dropped d ON d.vec_id = asg.vec_id
       |ORDER BY asg.vec_id""".stripMargin
  ) { (s, d) => semDedupAt(s, d, SemDedupEps) }

  /** The semantic-dedup pipeline at an explicit threshold (exposed for
    * the planted 0.9-grade spec). */
  def semDedupAt(s: SparkSession, d: String, eps: Double): DataFrame = {
    val v = Similarity.vecs(s, d).eagerCheckpoint()
    // assignment feeds the pair join twice and the verdict join once
    val asg = assigned(s, v, cents(v)).eagerCheckpoint()
    val dropped = asg.as("a")
      .join(asg.as("b"),
        col("b.cell") === col("a.cell")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .join(v.select(col("vec_id").as("id_a"), col("e").as("ea"),
        col("nrm").as("na")), Seq("id_a"))
      .join(v.select(col("vec_id").as("id_b"), col("e").as("eb"),
        col("nrm").as("nb")), Seq("id_b"))
      .filter(round(vec_dot(s, col("ea"), col("eb"))
        / (col("na") * col("nb")), 6) >= eps)
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("hit", lit(true))
    asg.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("hit").isNull.as("kept"))
      .orderBy("vec_id")
  }

  /** IVF index-quality evaluation — recall@10 vs brute-force truth, the
    * [[Similarity.evalRecall]] contract applied to the inverted-file
    * index: both pipelines are deterministic and SQL-mirrored, so the
    * oracle re-runs them as nested CTEs and intersects. Together with
    * the LSH row this makes every gate-checked ANN family carry an
    * oracle-checked quality metric, not just a spec. */
  val evalRecall: Q = Q(
    "ext_eval_ivf_recall",
    s"""WITH brute AS (${Similarity.topkBrute.oracle.get}),
       |ivfq AS (${ivf.oracle.get}),
       |hits AS (
       |  SELECT b.probe_id,
       |    CAST(COUNT(*) AS BIGINT) AS truth_k,
       |    CAST(COUNT(l.neighbor_id) AS BIGINT) AS hits
       |  FROM brute b
       |  LEFT JOIN ivfq l ON l.probe_id = b.probe_id
       |    AND l.neighbor_id = b.neighbor_id
       |  GROUP BY b.probe_id)
       |SELECT probe_id, truth_k, hits,
       |  hits * 100 // truth_k AS recall_pct
       |FROM hits ORDER BY probe_id""".stripMargin
  ) { (s, d) =>
    val brute = Similarity.topkBrute.fn(s, d)
      .select("probe_id", "neighbor_id")
    val ivfHit = ivf.fn(s, d)
      .select(col("probe_id"), col("neighbor_id"), lit(1L).as("hit"))
    brute
      .join(ivfHit, Seq("probe_id", "neighbor_id"), "left")
      .groupBy("probe_id")
      .agg(count(lit(1)).as("truth_k"), count(col("hit")).as("hits"))
      .select(col("probe_id"), col("truth_k"), col("hits"),
        expr("hits * 100 div truth_k").as("recall_pct"))
      .orderBy("probe_id")
  }

  /** IVF index-health audit — the cell-occupancy histogram a vector-DB
    * operator reads before tuning K/NProbe: one row per used cell with
    * its member count and corpus share in ppm (exact integer division).
    * Occupancy skew is THE operational failure mode of an IVF index (a
    * hot cell makes every probe of it scan a disproportionate slice and
    * starves recall in the cold cells); this is the [[SkewAudit]]
    * thermometer applied to the index structure itself. Scale shape:
    * the assignment is the ingest artifact ([[assigned]] — broadcast
    * centroids, the shuffle carries (vec_id, cell) only); the audit is
    * one map-side-combined count over it plus a broadcast 1-row total. */
  val ivfStats: Q = Q(
    "ext_sim_ivf_stats",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, e AS ce FROM v WHERE vec_id < $K),
       |assigned AS (
       |  SELECT vec_id, cent_id AS cell FROM (
       |    SELECT v.vec_id, c.cent_id,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |        ${Similarity.dotSql("v.e", "c.ce")}
       |          / (${Similarity.normSql("v.e")} * ${Similarity.normSql("c.ce")})
       |          DESC, c.cent_id) AS arank
       |    FROM v CROSS JOIN cents c) s
       |  WHERE arank = 1),
       |occ AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors
       |  FROM assigned GROUP BY cell),
       |tot AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS n FROM occ)
       |SELECT cell, n_vectors,
       |  CAST(n_vectors * 1000000 // n AS BIGINT) AS share_ppm
       |FROM occ CROSS JOIN tot ORDER BY cell""".stripMargin
  ) { (s, d) =>
    val v = Similarity.vecs(s, d).eagerCheckpoint()
    val occ = assigned(s, v, cents(v))
      .groupBy("cell").agg(count(lit(1)).as("n_vectors"))
    val tot = occ.agg(sum(col("n_vectors")).cast("long").as("n"))
    occ.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_vectors"),
        expr("cast(n_vectors * 1000000 div n as bigint)").as("share_ppm"))
      .orderBy("cell")
  }

  val all: Seq[Q] = Seq(ivf, ivfTrained, semDedup, evalRecall, ivfStats)
}
