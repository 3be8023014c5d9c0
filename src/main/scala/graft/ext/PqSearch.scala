package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Q
import graft.core.Eager.EagerCheckpoint

/** [EXT] product-quantized ANN (PQ/ADC — Jegou/Douze/Schmid, "Product
  * quantization for nearest neighbor search", TPAMI 2011, §II-III): the
  * memory-scale path of the similarity family. The 64-dim embedding is
  * split into M=8 subspaces of 8 dims; each subspace has its own
  * Ks=16-codeword codebook; a vector is stored as 8 codes (4 bits each —
  * 4 bytes against 256 bytes of float32, a 64x compression). Query-time
  * scoring is ASYMMETRIC distance computation: the probe builds an
  * M x Ks table of exact subspace dot products once, and every
  * candidate's approximate cosine is M table lookups summed — the
  * candidate's float vector is never read.
  *
  * == Plan shape / 100 TB ==
  *
  * Encoding is ingest-time work: one broadcast join of the corpus
  * subvectors against the M x Ks codebook and a min_by per (vector,
  * subspace) — the shuffle carries (vec_id, m, code), never floats.
  * At query time the ADC table (M x Ks = 128 tiny rows) broadcasts; the
  * per-candidate sum is a map-side partial aggregate over 8 narrow rows
  * per candidate. On a real cluster the codes column lives NEXT to the
  * corpus row (4 bytes), the table lookup is partition-local, and the
  * only wide state is the top-k per probe. [[IvfSearch]] composes in
  * front as the candidate generator (IVF-PQ); here the full corpus is
  * scored so the gate pins the quantizer's own quality.
  *
  * == Determinism / oracle ==
  *
  * Codebooks are the deterministic seed set (codeword j of subspace m =
  * subvector m of vec_id j) — the same oracle-parity tradeoff as
  * [[IvfSearch]]'s gate op, and every float reduction (unit-normalize,
  * sub-L2, sub-dot, the M-term ADC sum) is a strictly SEQUENTIAL fold in
  * both engines, so assignments, scores, and ranks hash-match. A trained
  * codebook (per-subspace Lloyd's, the [[IvfSearch.trainedCentroids]]
  * shape run M times) slots in without changing the query plan; the
  * spec pins planted-duplicate retrieval under either codebook and that
  * training does not collapse recall (a small tolerance absorbs
  * double-mean nondeterminism near ranking ties).
  */
object PqSearch {

  private val M = 8
  private val SubD = 8
  private val Ks = 16
  private val NProbes = 5
  private val TopK = 10

  /** Strictly sequential fold of `f` over the zip of two SubD-dim
    * subvectors (bit-identical to the DuckDB list_reduce mirror). */
  private def zfold(a: Column, b: Column,
      f: (Column, Column) => Column): Column =
    aggregate(zip_with(a, b, f), lit(0.0), (acc, x) => acc + x)

  private def l2(a: Column, b: Column): Column =
    zfold(a, b, (x, y) => (x - y) * (x - y))

  private def dot(a: Column, b: Column): Column =
    zfold(a, b, (x, y) => x * y)

  /** (vec_id, m, sv): unit-normalized subvectors, m in 0..M-1. Unit
    * normalization first makes the ADC sum approximate COSINE directly. */
  private def subvecs(s: SparkSession, d: String): DataFrame =
    subvecsOf(Similarity.vecs(s, d))

  private def subvecsOf(v: DataFrame): DataFrame =
    v
      .select(col("vec_id"),
        transform(col("e"), x => x / col("nrm")).as("ue"))
      .select(col("vec_id"), col("ue"),
        explode(sequence(lit(0), lit(M - 1))).as("m"))
      .select(col("vec_id"), col("m"),
        slice(col("ue"), col("m") * SubD + 1, lit(SubD)).as("sv"))

  /** DuckDB mirrors of the sequential folds over SubD elements. */
  private def foldSql(expr: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(
       |      generate_series(1, $SubD), i -> $expr)),
       |      (acc, x) -> acc + x)""".stripMargin
  private def l2Sql(a: String, b: String): String =
    foldSql(s"($a[i] - $b[i]) * ($a[i] - $b[i])")
  private def dotSql(a: String, b: String): String =
    foldSql(s"$a[i] * $b[i]")

  val pq: Q = Q(
    "ext_sim_pq",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |u AS (SELECT vec_id, list_transform(e, x ->
       |    x / ${Similarity.normSql("e")}) AS ue FROM v),
       |sub AS (SELECT vec_id, m, ue[$SubD*m+1 : $SubD*m+$SubD] AS sv
       |  FROM u CROSS JOIN (SELECT unnest(generate_series(0, ${M - 1}))
       |    AS m) ms),
       |cb AS (SELECT m, vec_id AS code, sv AS cw FROM sub
       |  WHERE vec_id < $Ks),
       |enc AS (SELECT vec_id, m, code FROM (
       |    SELECT s.vec_id, s.m, c.code, row_number() OVER (
       |      PARTITION BY s.vec_id, s.m
       |      ORDER BY ${l2Sql("s.sv", "c.cw")}, c.code) AS r
       |    FROM sub s JOIN cb c ON c.m = s.m) q WHERE r = 1),
       |tab AS (SELECT p.vec_id AS probe_id, c.m, c.code,
       |    ${dotSql("p.sv", "c.cw")} AS part
       |  FROM sub p JOIN cb c ON c.m = p.m WHERE p.vec_id < $NProbes),
       |scored AS (SELECT t.probe_id, e.vec_id AS neighbor_id,
       |    ROUND(list_reduce(list_prepend(0.0, list(t.part ORDER BY e.m)),
       |      (acc, x) -> acc + x), 6) AS adc
       |  FROM enc e JOIN tab t ON t.m = e.m AND t.code = e.code
       |  WHERE e.vec_id <> t.probe_id
       |  GROUP BY t.probe_id, e.vec_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY adc DESC, neighbor_id) AS rank FROM scored)
       |SELECT probe_id, neighbor_id, rank, adc FROM ranked
       |WHERE rank <= $TopK ORDER BY probe_id, rank""".stripMargin
  ) { (s, d) => searchAt(s, d) }

  /** IVF-PQ: the production composition — [[IvfSearch]]'s coarse
    * quantizer generates each probe's candidate set (NProbe closest
    * cells), and ADC scores ONLY those candidates from their stored
    * codes. Per-query cost is O(corpus * NProbe / K) table lookups with
    * no float vector reads at all: the two index structures the paper
    * composes (IVF prunes candidates, PQ compresses residents). One
    * shared [[searchWith]] pipeline serves both paths (the composition
    * passes the IVF candidate set; the gate op scores the full corpus),
    * so a scoring or tie-break fix cannot diverge between them. This IS
    * the plan a 100 TB vector index runs, so it carries its own gate row
    * (`ext_sim_ivfpq`) whose oracle replays BOTH stages — coarse cell
    * assignment → NProbe candidate pruning → ADC table → top-k — not
    * just each stage in isolation. */
  def searchIvfPq(s: SparkSession, d: String): DataFrame = {
    val v = Similarity.vecs(s, d).eagerCheckpoint()
    val subs = subvecsOf(v).eagerCheckpoint()
    searchWith(s, subs, seedCodebook(subs),
      candidates = Some(IvfSearch.candidates(s, v)))
  }

  // -------------------------------------------- ingest-staged index path

  /** Ingest-time index build ([[PreparedTables]] memo): the PQ code
    * table (vec_id, m, code — 4 bits of payload per row) and the IVF
    * cell assignment (vec_id, cell), both pure functions of the corpus
    * under the seed quantizers. This is the "codes live NEXT to the
    * corpus row" layout the scaladoc above describes: at 100 TB both
    * tables are columns written at ingest, and a query never reads a
    * float vector except its own probe's. */
  private val preparedIndex = new PreparedTables(
    Seq("embeddings.parquet"), Seq("graft_pq_codes", "graft_ivf_cells"),
    writeIndex)

  def ensureIndexed(s: SparkSession, d: String): Unit =
    preparedIndex.ensurePrepared(s, d)

  private def writeIndex(s: SparkSession, d: String): Unit = {
    val v = Similarity.vecs(s, d).eagerCheckpoint()
    val subs = subvecsOf(v).eagerCheckpoint()
    encode(subs, seedCodebook(subs))
      .write.mode("overwrite").format("parquet")
      .saveAsTable("graft_pq_codes")
    IvfSearch.assigned(s, v, IvfSearch.cents(v))
      .write.mode("overwrite").format("parquet")
      .saveAsTable("graft_ivf_cells")
  }

  /** The PRODUCTION query shape: both index structures come from the
    * staged tables; query-time work is the probe's own cell ranking
    * (probe × K tiny centroid rows), the candidate join against the
    * staged cell assignment, and ADC lookups against the staged codes.
    * The only embedding reads are `vec_id < K` (probes + centroids +
    * codebook rows — a pushed-down point slice of the corpus).
    * Results are IDENTICAL to [[searchIvfPq]] (same quantizers, same
    * scoring tail — shared [[searchWith]]); a spec pins the
    * equivalence, and the gate oracle replays the same two stages. */
  def searchIvfPqIndexed(s: SparkSession, d: String): DataFrame = {
    ensureIndexed(s, d)
    val v = Similarity.vecs(s, d)
    // probes (< NProbes=5), codebook rows (< Ks=16) and centroids
    // (< K=32) all sit inside the vec_id < K slice: one pushed-down
    // point read of the corpus serves every query-time float need
    val smallSubs = subvecsOf(v.filter(col("vec_id") < IvfSearch.K))
      .eagerCheckpoint()
    val cand = IvfSearch.probeCells(s, v, IvfSearch.cents(v))
      .join(s.table("graft_ivf_cells")
        .select(col("vec_id").as("neighbor_id"), col("cell")), Seq("cell"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select("probe_id", "neighbor_id")
    searchWith(s, smallSubs, seedCodebook(smallSubs),
      candidates = Some(cand), encOpt = Some(s.table("graft_pq_codes")))
  }

  /** Gate row for the COMPOSED index ([[searchIvfPq]]) — the at-scale
    * query plan. The oracle replays the full two-stage pipeline: the IVF
    * stage (cell assignment + NProbe probe cells + candidate set, the
    * `ext_sim_ivf` CTEs verbatim) feeds the PQ stage (encode + ADC table
    * + per-candidate sum, the `ext_sim_pq` CTEs restricted to the
    * candidate pairs). Every float reduction stays a sequential fold in
    * both engines, so the composition hash-matches end to end. */
  val ivfpq: Q = Q(
    "ext_sim_ivfpq",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |cents AS (SELECT vec_id AS cent_id, e AS ce FROM v
       |  WHERE vec_id < ${IvfSearch.K}),
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
       |    FROM v p CROSS JOIN cents c WHERE p.vec_id < $NProbes) r
       |  WHERE crank <= ${IvfSearch.NProbe}),
       |cand AS (
       |  SELECT pc.probe_id, a.vec_id AS neighbor_id
       |  FROM pcells pc JOIN assigned a ON a.cell = pc.cell
       |  WHERE a.vec_id <> pc.probe_id),
       |u AS (SELECT vec_id, list_transform(e, x ->
       |    x / ${Similarity.normSql("e")}) AS ue FROM v),
       |sub AS (SELECT vec_id, m, ue[$SubD*m+1 : $SubD*m+$SubD] AS sv
       |  FROM u CROSS JOIN (SELECT unnest(generate_series(0, ${M - 1}))
       |    AS m) ms),
       |cb AS (SELECT m, vec_id AS code, sv AS cw FROM sub
       |  WHERE vec_id < $Ks),
       |enc AS (SELECT vec_id, m, code FROM (
       |    SELECT s.vec_id, s.m, c.code, row_number() OVER (
       |      PARTITION BY s.vec_id, s.m
       |      ORDER BY ${l2Sql("s.sv", "c.cw")}, c.code) AS r
       |    FROM sub s JOIN cb c ON c.m = s.m) q WHERE r = 1),
       |tab AS (SELECT p.vec_id AS probe_id, c.m, c.code,
       |    ${dotSql("p.sv", "c.cw")} AS part
       |  FROM sub p JOIN cb c ON c.m = p.m WHERE p.vec_id < $NProbes),
       |scored AS (SELECT cd.probe_id, cd.neighbor_id,
       |    ROUND(list_reduce(list_prepend(0.0, list(t.part ORDER BY e.m)),
       |      (acc, x) -> acc + x), 6) AS adc
       |  FROM cand cd
       |  JOIN enc e ON e.vec_id = cd.neighbor_id
       |  JOIN tab t ON t.probe_id = cd.probe_id
       |    AND t.m = e.m AND t.code = e.code
       |  GROUP BY cd.probe_id, cd.neighbor_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY adc DESC, neighbor_id) AS rank FROM scored)
       |SELECT probe_id, neighbor_id, rank, adc FROM ranked
       |WHERE rank <= $TopK ORDER BY probe_id, rank""".stripMargin
  ) { (s, d) => searchIvfPqIndexed(s, d) }
    .copy(setup = Some(ensureIndexed _))

  /** Seed codebook: codeword j of subspace m = subvector m of vec_id j
    * (the oracle-parity quantizer). */
  private def seedCodebook(subs: DataFrame): DataFrame =
    subs.filter(col("vec_id") < Ks)
      .select(col("m"), col("vec_id").as("code"), col("sv").as("cw"))

  /** Offline-trained codebooks: per-subspace Lloyd's k-means run as
    * DataFrame aggregates across ALL M subspaces at once — each round is
    * one broadcast assignment join and one per-(m, code, dim) mean
    * (SNAPPED to ROUND(.,6) — round 18, the [[Clustering]] recipe that
    * makes the iterative trainer cross-engine value-exact, so
    * [[pqTrained]] hash-checks training against a DuckDB CTE replay),
    * and the corpus is scanned `iters` times total, not `iters * M`
    * times. Init is the seed codebook; a codeword that loses all
    * members keeps its previous value (Ks never shrinks); fixed
    * iteration count ([[TrainIters]]), no RNG. The training analogue of
    * [[IvfSearch.trainedCentroids]], one level down the quantization
    * hierarchy. Query plan is unchanged — only the broadcast codebook
    * rows differ (the spec pins that training does not collapse recall
    * vs the seed quantizer). */
  def trainedCodebook(s: SparkSession, subs: DataFrame,
      iters: Int = TrainIters): DataFrame = {
    var cb = seedCodebook(subs).eagerCheckpoint()
    for (_ <- 1 to iters) {
      val assign = subs.join(broadcast(cb), Seq("m"))
        .groupBy("vec_id", "m")
        .agg(min_by(col("code"),
          struct(l2(col("sv"), col("cw")), col("code"))).as("code"))
      val means = subs.join(assign, Seq("vec_id", "m"))
        .select(col("m"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("m", "code", "pos").agg(round(avg(col("x")), 6).as("mx"))
        .groupBy("m", "code")
        .agg(transform(array_sort(collect_list(struct(col("pos"),
          col("mx")))), st => st("mx")).as("mw"))
      cb = cb.join(means, Seq("m", "code"), "left")
        .select(col("m"), col("code"),
          coalesce(col("mw"), col("cw")).as("cw"))
        .eagerCheckpoint()
    }
    cb
  }

  private[ext] val TrainIters = 3

  /** DuckDB replay of [[trainedCodebook]] (the [[IvfSearch]] trained
    * oracle one level down): each round re-encodes every (vector,
    * subspace) to its min-L2 codeword of the previous round's codebook
    * (ties to the lower code — `min_by(struct(l2, code))` ↔ `ORDER BY
    * l2, code`) and re-forms each codeword's per-dimension
    * ROUND(AVG, 6); an emptied codeword keeps its previous value. Ends
    * by aliasing the final table as `cb`, so the ADC tail is the
    * `ext_sim_pq` oracle's verbatim. */
  private def trainedCbCtes: String = {
    val rounds = (1 to TrainIters).map { r =>
      s"""e$r AS (SELECT vec_id, m, code FROM (
         |    SELECT s.vec_id, s.m, c.code, row_number() OVER (
         |      PARTITION BY s.vec_id, s.m
         |      ORDER BY ${l2Sql("s.sv", "c.cw")}, c.code) AS rn
         |    FROM sub s JOIN cb${r - 1} c ON c.m = s.m) q$r WHERE rn = 1),
         |cb$r AS (
         |  SELECT p.m, p.code, COALESCE(mm.mw, p.cw) AS cw
         |  FROM cb${r - 1} p LEFT JOIN (
         |    SELECT m, code, list(mv ORDER BY j) AS mw FROM (
         |      SELECT e.m, e.code, j, ROUND(AVG(s.sv[j]), 6) AS mv
         |      FROM e$r e JOIN sub s ON s.vec_id = e.vec_id AND s.m = e.m
         |      CROSS JOIN (SELECT unnest(generate_series(1, $SubD)) AS j) js
         |      GROUP BY e.m, e.code, j) g$r GROUP BY m, code) mm
         |    ON mm.m = p.m AND mm.code = p.code)""".stripMargin
    }.mkString(",\n")
    s"""cb0 AS (SELECT m, vec_id AS code, sv AS cw FROM sub
       |  WHERE vec_id < $Ks),
       |$rounds,
       |cb AS (SELECT m, code, cw FROM cb$TrainIters)""".stripMargin
  }

  /** Gate row for the TRAINED product quantizer (round 18, twin of
    * [[IvfSearch.ivfTrained]]): trained codebooks + ingest-staged code
    * table + query-time ADC, oracle-replayed end to end — the training
    * CTE chain feeds the `ext_sim_pq` oracle's encode/table/score tail
    * verbatim. `setup` stages training + corpus encoding outside the
    * timed window; PqSpec's recall assertions remain. */
  val pqTrained: Q = Q(
    "ext_sim_pq_trained",
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |u AS (SELECT vec_id, list_transform(e, x ->
       |    x / ${Similarity.normSql("e")}) AS ue FROM v),
       |sub AS (SELECT vec_id, m, ue[$SubD*m+1 : $SubD*m+$SubD] AS sv
       |  FROM u CROSS JOIN (SELECT unnest(generate_series(0, ${M - 1}))
       |    AS m) ms),
       |$trainedCbCtes,
       |enc AS (SELECT vec_id, m, code FROM (
       |    SELECT s.vec_id, s.m, c.code, row_number() OVER (
       |      PARTITION BY s.vec_id, s.m
       |      ORDER BY ${l2Sql("s.sv", "c.cw")}, c.code) AS r
       |    FROM sub s JOIN cb c ON c.m = s.m) q WHERE r = 1),
       |tab AS (SELECT p.vec_id AS probe_id, c.m, c.code,
       |    ${dotSql("p.sv", "c.cw")} AS part
       |  FROM sub p JOIN cb c ON c.m = p.m WHERE p.vec_id < $NProbes),
       |scored AS (SELECT t.probe_id, e.vec_id AS neighbor_id,
       |    ROUND(list_reduce(list_prepend(0.0, list(t.part ORDER BY e.m)),
       |      (acc, x) -> acc + x), 6) AS adc
       |  FROM enc e JOIN tab t ON t.m = e.m AND t.code = e.code
       |  WHERE e.vec_id <> t.probe_id
       |  GROUP BY t.probe_id, e.vec_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY adc DESC, neighbor_id) AS rank FROM scored)
       |SELECT probe_id, neighbor_id, rank, adc FROM ranked
       |WHERE rank <= $TopK ORDER BY probe_id, rank""".stripMargin
  ) { (s, d) => searchTrainedIndexed(s, d) }
    .copy(setup = Some(ensureTrainedPq _))

  /** The PQ/ADC pipeline (exposed for the planted-duplicate spec). */
  def searchAt(s: SparkSession, d: String): DataFrame = {
    val subs = subvecs(s, d).eagerCheckpoint()
    searchWith(s, subs, seedCodebook(subs))
  }

  /** PQ search with trained codebooks (the index you'd ship). */
  def searchTrained(s: SparkSession, d: String, iters: Int = 3): DataFrame = {
    val subs = subvecs(s, d).eagerCheckpoint()
    searchWith(s, subs, trainedCodebook(s, subs, iters))
  }

  /** Ingest-time staging of the TRAINED product quantizer: codebook
    * training (k-means per subspace) and corpus encoding both happen at
    * index build — the staged tables are the M×Ks trained codewords and
    * the narrow (vec_id, m, code) code table. Mirrors [[preparedIndex]]
    * for the seed-quantizer composition. */
  private val preparedTrainedPq = new PreparedTables(
    Seq("embeddings.parquet"),
    Seq("graft_pq_trained_cb", "graft_pq_trained_codes"),
    writeTrainedPq,
    // r18: the trainer snaps means round-6 — a warehouse staged by the
    // unsnapped trainer must restage, not serve the old codebook
    version = "r18-snap6")

  def ensureTrainedPq(s: SparkSession, d: String): Unit =
    preparedTrainedPq.ensurePrepared(s, d)

  private def writeTrainedPq(s: SparkSession, d: String): Unit = {
    val subs = subvecs(s, d).eagerCheckpoint()
    val cb = trainedCodebook(s, subs, 3)
    cb.write.mode("overwrite").format("parquet")
      .saveAsTable("graft_pq_trained_cb")
    encode(subs, cb).write.mode("overwrite").format("parquet")
      .saveAsTable("graft_pq_trained_codes")
  }

  /** Query against the staged trained PQ index: query-time work is the
    * probe ADC table (probe subvectors × the staged broadcast codebook)
    * plus the code-table scoring sum — no training, no corpus encode,
    * no corpus float reads beyond the probes' own rows. Results are
    * IDENTICAL to [[searchTrained]] (shared [[searchWith]] tail; double
    * arrays round-trip parquet bit-exactly) — spec-pinned. */
  def searchTrainedIndexed(s: SparkSession, d: String): DataFrame = {
    ensureTrainedPq(s, d)
    val probeSubs = subvecsOf(
      Similarity.vecs(s, d).filter(col("vec_id") < NProbes))
    searchWith(s, probeSubs, s.table("graft_pq_trained_cb"),
      encOpt = Some(s.table("graft_pq_trained_codes")))
  }

  /** Ingest-time encoding: each (vector, subspace) takes its min-L2
    * codeword — narrow (vec_id, m, code) rows only. */
  private def encode(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.join(broadcast(cb), Seq("m"))
      .groupBy("vec_id", "m")
      .agg(min_by(col("code"),
        struct(l2(col("sv"), col("cw")), col("code"))).as("code"))

  /** Shared ADC pipeline; `candidates` restricts scoring to an
    * externally-pruned (probe_id, neighbor_id) set (the IVF-PQ
    * composition) — None scores the full corpus. `encOpt` supplies a
    * pre-staged code table (the indexed path); None encodes `subs`
    * inline. */
  private def searchWith(s: SparkSession, subs: DataFrame,
      cb: DataFrame,
      candidates: Option[DataFrame] = None,
      encOpt: Option[DataFrame] = None): DataFrame = {
    val enc = encOpt.getOrElse(encode(subs, cb))
    // query-time ADC table: M x Ks exact subspace dots per probe
    val tab = subs.filter(col("vec_id") < NProbes)
      .select(col("vec_id").as("probe_id"), col("m"), col("sv"))
      .join(broadcast(cb), Seq("m"))
      .select(col("probe_id"), col("m"), col("code"),
        dot(col("sv"), col("cw")).as("part"))
    val scored = candidates match {
      case Some(cand) => cand
        .join(enc.withColumnRenamed("vec_id", "neighbor_id"),
          Seq("neighbor_id"))
        .join(broadcast(tab), Seq("probe_id", "m", "code"))
        .select(col("probe_id"), col("neighbor_id"), col("m"), col("part"))
        .groupBy(col("probe_id"), col("neighbor_id"))
        .agg(round(aggregate(
          transform(array_sort(collect_list(struct(col("m"), col("part")))),
            st => st("part")),
          lit(0.0), (acc, x) => acc + x), 6).as("adc"))
      case None =>
        // Full-corpus ADC in the layout the paper actually runs: the M
        // codes ride TOGETHER as one per-vector array (one groupBy over
        // the narrow code rows — at a real ingest they are written wide),
        // the probe's M x Ks table becomes one flat lookup array indexed
        // m*Ks+code, and scoring is M element_at lookups folded in m
        // order — bit-identical to the sorted-collect fold (same parts,
        // same ascending-m addition order), but with NO code-to-table
        // join and NO per-(probe,neighbor) groupBy shuffle: the only
        // shuffles left are the per-vector code widening and the top-k.
        val wide = enc.groupBy("vec_id")
          .agg(transform(
            array_sort(collect_list(struct(col("m"), col("code")))),
            st => st("code")).as("codes"))
        val adcArr = tab.groupBy("probe_id")
          .agg(transform(
            array_sort(collect_list(
              struct(col("m"), col("code"), col("part")))),
            st => st("part")).as("adc_tab"))
        val fold = aggregate(
          transform(sequence(lit(0), lit(M - 1)), mm =>
            element_at(col("adc_tab"),
              (mm * Ks + element_at(col("codes"), mm + 1) + 1)
                .cast("int"))),
          lit(0.0), (acc, x) => acc + x)
        wide.join(broadcast(adcArr), col("vec_id") =!= col("probe_id"))
          .select(col("probe_id"), col("vec_id").as("neighbor_id"),
            round(fold, 6).as("adc"))
    }
    scored
      .withColumn("rank", row_number().over(Window.partitionBy("probe_id")
        .orderBy(col("adc").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= TopK)
      .select("probe_id", "neighbor_id", "rank", "adc")
      .orderBy("probe_id", "rank")
  }

  val all: Seq[Q] = Seq(pq, ivfpq, pqTrained)
}
