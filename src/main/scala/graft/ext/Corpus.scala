package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import graft.core.Eager.EagerCheckpoint

/** [EXT] corpus-preparation operators — the steps a training-data pipeline
  * runs AROUND dedup/similarity: duplicate-cluster assignment (connected
  * components over the near-dup pair graph), deterministic stratified
  * sampling, vocabulary statistics, and a composed cleanse pipeline
  * (language gate -> quality gate -> dedup) as one declarative plan.
  *
  * Scale notes per operator are on each member; the common rule is the one
  * the dedup family follows: candidate generation by key-equality shuffle,
  * per-row work inside whole-stage codegen, and `ORDER BY` only as final
  * presentation.
  */
object Corpus {

  import TextAnalysis.{toks, toksSql, countIn, countInSql, en, r4frac,
    r4fracSql, scoreNum, scoreNumSql}

  /** Minimum-label propagation to a fixpoint: every node's label becomes
    * the smallest doc_id reachable in the pair graph. One key-equality
    * shuffle per round; rounds = eccentricity of each component's minimum
    * node (near-dup clusters are shallow — boilerplate families converge
    * in 2-3 rounds). Each round's result is checkpointed eagerly so the
    * loop's lineage stays flat and AQE never re-derives a prior round.
    *
    * At 100 TB the same loop holds (labels are (long, long) rows — the
    * shuffle is narrow no matter how wide the corpus); for graphs with
    * deep chains swap in the large-star/small-star rounds of
    * Kiveris et al., "Connected Components in MapReduce and Beyond"
    * (SOCC'14) — same driver loop, different per-round join shape.
    *
    * Convergence within `maxRounds` is ASSERTED, not assumed: a graph
    * whose diameter exceeds the cap (a chain longer than the round
    * budget) throws instead of silently returning labels that are still
    * mid-propagation — a wrong answer that would poison every downstream
    * dedup decision. The error names the deep-chain remediation. */
  private[graft] def propagateMinLabel(edges: DataFrame,
      maxRounds: Int = 64): DataFrame = {
    val sym = edges
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .eagerCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .eagerCheckpoint()
    // labels only ever decrease, so sum(label) strictly decreases until
    // the fixpoint — a single scalar action per round decides convergence
    var prevSum = labels.agg(sum("label")).head().getLong(0)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val viaNeighbor = sym
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("label"))
      val next = labels.union(viaNeighbor)
        .groupBy("id").agg(min("label").as("label"))
        .eagerCheckpoint()
      val nextSum = next.agg(sum("label")).head().getLong(0)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
      rounds += 1
    }
    if (!converged) throw new IllegalStateException(
      s"propagateMinLabel did not converge within $maxRounds rounds: " +
        "the pair graph has a component whose min-node eccentricity " +
        "exceeds the round budget. Raise maxRounds, or use " +
        "starContractLabels (large-star/small-star, Kiveris et al. " +
        "SOCC'14) built for deep chains — returning mid-propagation " +
        "labels would silently mis-cluster documents.")
    labels
  }

  /** Connected components via alternating large-star/small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SOCC'14) — the DEEP-CHAIN path next to [[propagateMinLabel]].
    * Min-label propagation advances one hop per round (a d-diameter
    * component needs d rounds); star contraction halves chain depth
    * roughly every alternation, converging in O(log^2 n) rounds w.h.p.
    * regardless of diameter.
    *
    *  - large-star (per node u over its full neighborhood): connect every
    *    STRICTLY LARGER neighbor to m = min of the neighborhood incl. u;
    *  - small-star (per node u over edges directed larger -> smaller):
    *    connect u and all its smaller neighbors to that minimum.
    *
    * Each round is two key-equality shuffles over (long, long) edge rows
    * (the same narrow-shuffle property as min-label propagation), each
    * checkpointed; convergence = the small-star edge set is stable,
    * checked with one O(1)-row (count, xxhash-sum) action, at which
    * point components are stars centered on their minimum node. */
  private[graft] def starContractLabels(edges: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    // strip self loops, normalize to larger -> smaller
    var cur = edges
      .select(col("doc_a").cast("long").as("a"),
        col("doc_b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .distinct()
      .eagerCheckpoint()
    val nodes = cur.select(col("u").as("id"))
      .union(cur.select(col("v").as("id"))).distinct()
      .eagerCheckpoint()
    // O(1)-row convergence fingerprint: (count, XOR of 64-bit edge
    // hashes) — XOR is commutative and cannot overflow (rows are
    // distinct, so no pair cancels)
    def chk(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prev = chk(cur)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      // large-star over the symmetric neighborhood
      val sym = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("nmin"))
        .select(col("u"), least(col("nmin"), col("u")).as("m"))
      val large = sym.filter(col("v") > col("u"))
        .join(mins, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .eagerCheckpoint()
      // small-star over larger -> smaller edges: connect u AND each of
      // its smaller neighbors to the neighborhood minimum m = min(Γ⁻(u))
      val sMins = large.groupBy("u").agg(min(col("v")).as("m"))
      val small = sMins.select(col("u"), col("m").as("v")) // (u, m)
        .union(large.join(sMins, Seq("u"))
          .filter(col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v"))) // (neighbor, m)
        .distinct()
        .eagerCheckpoint()
      val next = chk(small)
      converged = next == prev
      prev = next
      cur = small
      rounds += 1
    }
    if (!converged) throw new IllegalStateException(
      s"starContractLabels did not converge within $maxRounds rounds " +
        "(expected O(log^2 n)); refusing to return a partially " +
        "contracted graph.")
    // fixpoint edges form stars centered on each component minimum:
    // label(u) = its center; centers and isolated inputs label themselves
    nodes
      .join(cur.groupBy("u").agg(min(col("v")).as("lbl"))
        .withColumnRenamed("u", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("label"))
  }

  /** Duplicate-cluster assignment: connected components over the
    * `ext_dedup_minhash` pair graph. Emits one row per document that
    * appears in at least one near-dup pair: its cluster id (= smallest
    * doc_id in the component) and the component's width. The oracle
    * computes the identical fixpoint as a recursive transitive closure —
    * fine at fixture scale, impossible at 100 TB, which is exactly why
    * the Spark side is the iterative narrow-shuffle loop instead. */
  /** The recursive-closure cluster labeling as a reusable CTE prefix
    * (pairs → symmetric edges → reachability fixpoint → min-label), so
    * [[dedupClusters]] and [[dedupKeepBest]] share one oracle body. */
  private val clustersBodySql: String =
    s"""WITH RECURSIVE pairs AS (
       |${Dedup.minhashPairsSqlBody}),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst),
       |labels AS (
       |  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)""".stripMargin

  private val clustersSql: String =
    s"""$clustersBodySql
       |SELECT doc_id, cluster_id,
       |  COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
       |FROM labels ORDER BY doc_id""".stripMargin

  val dedupClusters: Q = Q(
    "ext_dedup_clusters", clustersSql
  ) { (s, d) => clustersWith(s, d, propagateMinLabel(_)) }

  /** Same operator, same oracle, deep-chain solver: the component labels
    * come from [[starContractLabels]] instead of one-hop min-label
    * propagation. Registered as its own gate row so the SOCC'14 path is
    * hash-checked against the recursive-closure oracle (not only
    * spec-checked on planted graphs); excluded from the bench headline
    * set — the shared minhash pipeline dominates its runtime and is
    * already timed under ext_dedup_clusters. */
  val dedupClustersStar: Q = Q(
    "ext_dedup_clusters_star",
    (s, d) => clustersWith(s, d, starContractLabels(_)),
    Some(clustersSql), bench = false)

  /** The dedup pipeline's actual FILTERING decision: within each
    * near-dup cluster keep exactly one document — the highest
    * quality-scored member, ties to the lowest doc_id (Lee et al.
    * ACL'22 keep the canonical member, scored here with
    * `ext_text_quality`'s exact-integer linear score rather than
    * arbitrary first-seen). Composes the two audited pipelines into the
    * decision a 100 TB run executes: clusters from the LSH candidate
    * graph, scores from the quality pass, one rank window over the
    * CLUSTER-MEMBER frame only (bounded by near-dup mass, never corpus
    * size — non-clustered docs are implicitly kept and never enter the
    * window). Tokenless members coalesce to score −1 so they never win
    * over a scored member, deterministically in both engines. */
  val dedupKeepBest: Q = Q(
    "ext_dedup_keep_best",
    s"""$clustersBodySql,
       |cl AS (
       |  SELECT doc_id, cluster_id,
       |    COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
       |  FROM labels),
       |q AS (
       |  SELECT doc_id,
       |    ${r4fracSql(
             scoreNumSql("n_stop", "n_tokens", "n_punct", "len(text)"),
             "n_tokens * len(text)")} AS quality_score
       |  FROM (
       |    SELECT doc_id, text, len($toksSql) AS n_tokens,
       |      ${countInSql(en)} AS n_stop,
       |      len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct
       |    FROM documents) f
       |  WHERE n_tokens > 0),
       |j AS (
       |  SELECT cl.doc_id, cl.cluster_id, cl.n_members,
       |    COALESCE(q.quality_score, -1.0) AS quality_score
       |  FROM cl LEFT JOIN q USING (doc_id)),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY cluster_id
       |    ORDER BY quality_score DESC, doc_id) AS rk FROM j)
       |SELECT doc_id, cluster_id, n_members, quality_score,
       |  (rk = 1) AS kept
       |FROM r ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val cl = clustersWith(s, d, propagateMinLabel(_))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        size(toks(col("text"))).cast("long").as("n_tokens"),
        countIn(toks(col("text")), en).as("n_stop"),
        regexp_count(col("text"), lit("[^a-zA-Z0-9\\s]")).cast("long")
          .as("n_punct"))
      .filter(col("n_tokens") > 0)
    val ln = length(col("text")).cast("long")
    val scored = docs.select(col("doc_id"),
      r4frac(scoreNum(col("n_stop"), col("n_tokens"), col("n_punct"), ln),
        col("n_tokens") * ln).as("quality_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col("quality_score").desc, col("doc_id"))
    cl.join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster_id"), col("n_members"),
        coalesce(col("quality_score"), lit(-1.0)).as("quality_score"))
      .withColumn("kept", row_number().over(w) === 1)
      .orderBy("doc_id")
  }

  /** Frontier BFS to the fixpoint over a symmetric edge list
    * (`a` -> `b` string columns): returns (id, hops) minimum distances
    * from `src`. One narrow key-equality shuffle per round; distances
    * only ever decrease, so an O(1)-row (count, sum) action decides
    * convergence; exceeding the round budget THROWS (same contract as
    * [[propagateMinLabel]] — mid-propagation distances are wrong
    * answers). */
  private[graft] def bfsDistances(s: SparkSession, sym: DataFrame,
      src: String, maxRounds: Int = 64): DataFrame = {
    import s.implicits._
    var dist = Seq((src, 0L)).toDF("id", "hops").eagerCheckpoint()
    var prev = (0L, -1L) // (count, sum-of-hops) fingerprint
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val viaEdge = dist
        .join(sym.withColumnRenamed("a", "id"), Seq("id"))
        .select(col("b").as("id"), (col("hops") + 1).as("hops"))
      val next = dist.union(viaEdge)
        .groupBy("id").agg(min("hops").as("hops"))
        .eagerCheckpoint()
      val r = next.agg(count(lit(1)), sum("hops")).head()
      val cur = (r.getLong(0), r.getLong(1))
      converged = cur == prev
      prev = cur
      dist = next
      rounds += 1
    }
    if (!converged) throw new IllegalStateException(
      s"bfsDistances did not converge within $maxRounds rounds: the " +
        "source's eccentricity exceeds the round budget; raise it — " +
        "mid-propagation distances are wrong answers")
    dist
  }

  /** Single-source BFS hop distances over the token-adjacency graph
    * (tokens linked when adjacent in any document — the word graph of
    * the corpus), seeded at the most frequent token ((tf DESC, token) —
    * deterministic). The fixture's ~31-word vocabulary makes its word
    * graph near-complete (every real distance is 0/1), so the gate row
    * pins cross-engine equality while DEPTH is proven on planted chain
    * graphs in the spec — the same division of labor as the CC rows
    * over the (equally shallow) fixture pair graph. The third
    * member of the iterative-graph tier (min-label CC, star
    * contraction, now distances): each round is one narrow key-equality
    * shuffle expanding the frontier by a hop; distances only ever
    * decrease, so an O(1)-row (count, sum) action decides convergence,
    * and exceeding the round budget THROWS (mid-propagation distances
    * are wrong answers, same contract as [[propagateMinLabel]]). The
    * gate compares distances up to hop 32; the oracle replays the
    * fixpoint as a bounded recursive walk — feasible at fixture scale,
    * hopeless at 100 TB, which is exactly why the Spark side is the
    * frontier loop. Edge building is array-local (the bigram zip of
    * `ext_text_bigram_lm`); nothing touches the token stream after the
    * distinct-edge aggregate. */
  val graphBfs: Q = Q(
    "ext_graph_bfs",
    (s, d) => {
      val HopCap = 32
      val tokDf = Tables.documents(s, d)
        .select(toks(col("text")).as("ts"))
      val edges = tokDf.filter(size(col("ts")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ts)-2)," +
            " i -> struct(ts[i] AS w1, ts[i+1] AS w2))")).as("bg"))
        .select(col("bg.w1").as("a"), col("bg.w2").as("b"))
      val sym = edges
        .union(edges.select(col("b").as("a"), col("a").as("b")))
        .distinct().eagerCheckpoint()
      val src = tokDf.select(explode(col("ts")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("t")).limit(1)
        .head().getString(0)
      bfsDistances(s, sym, src)
        .filter(col("hops") <= HopCap)
        .select(col("id").as("token"), col("hops")).orderBy("token")
    },
    Some(s"""WITH RECURSIVE tok AS (
       |  SELECT $toksSql AS ts FROM documents),
       |bg AS (
       |  SELECT unnest(ts[1:len(ts)-1]) AS w1, unnest(ts[2:len(ts)]) AS w2
       |  FROM tok WHERE len(ts) >= 2),
       |edges AS (
       |  SELECT DISTINCT w1 AS src, w2 AS dst FROM bg
       |  UNION
       |  SELECT DISTINCT w2, w1 FROM bg),
       |s0 AS (
       |  SELECT t AS src FROM (SELECT unnest($toksSql) AS t FROM documents)
       |  GROUP BY t ORDER BY COUNT(*) DESC, t LIMIT 1),
       |walk(id, hops) AS (
       |  SELECT src, 0 FROM s0
       |  UNION
       |  SELECT e.dst, w.hops + 1 FROM walk w
       |  JOIN edges e ON e.src = w.id WHERE w.hops < 32)
       |SELECT id AS token, CAST(MIN(hops) AS BIGINT) AS hops
       |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin),
    bench = false)

  private def clustersWith(s: SparkSession, d: String,
      solver: DataFrame => DataFrame): DataFrame = {
    // CC runs over REPRESENTATIVE pairs only — the expanded member pairs
    // are O(k^2) per k-duplicate cluster (pure output materialization for
    // ext_dedup_minhash, but poison as a CC edge list). Member docs then
    // inherit their rep's component label: rep = min(member ids) and
    // component label = min(rep ids), so the min over the expanded
    // component is exactly the rep-level label.
    val p = Dedup.minhashRepPipeline(s, d)
    // materialize the verified pair set ONCE (round 19, guide §1/§5):
    // repPairs is the pipeline's most expensive unmaterialized subtree
    // (candidate self-join + two shingle-intersection joins + two size
    // joins) and was re-planned up to 4x below — under the solver, twice
    // under crossReps' union, and under members. The checkpoint is
    // pair-set-sized (bounded by near-dup mass, never corpus size).
    val repPairs = p.repPairs.eagerCheckpoint()
    val repLabels = solver(repPairs
      .select(col("rep_a").as("doc_a"), col("rep_b").as("doc_b")))
    // docs in the pair graph: members of a rep with a cross pair, plus
    // members of surviving multi-member exact clusters (within pairs)
    val crossReps = repPairs.select(col("rep_a").as("rep_id"))
      .union(repPairs.select(col("rep_b").as("rep_id"))).distinct()
    val qual = crossReps.union(p.survivors).distinct()
    // labeled is REP-level (one row per rep in the pair graph) and read
    // twice below — checkpoint it so neither consumer replans the
    // survivors/qual chain; the barrier is over a frame bounded by the
    // pair graph's rep count, never corpus size
    val labeled = qual
      .join(repLabels.withColumnRenamed("id", "rep_id"), Seq("rep_id"), "left")
      .select(col("rep_id"), coalesce(col("label"), col("rep_id"))
        .as("cluster_id"))
      .eagerCheckpoint()
    val members = p.mem.select(col("doc_id"), col("rep_id"))
      .join(labeled, Seq("rep_id"))
    // cluster widths at the REP level (round 20, guide §2.5): a member's
    // count per cluster equals sum(csize) over the cluster's reps, so the
    // aggregate runs over the tiny labeled frame with map-side partials —
    // never over the member expansion. The round-19 window
    // (count(*) over (partition by cluster_id)) materialized each
    // cluster's full member list in ONE window task, a single-task
    // hotspot under a giant near-dup cluster at 100 TB (unlike q17/q21's
    // bounded per-part/per-order groups). The widths frame is one row
    // per cluster; AQE broadcasts the join back — skew-immune.
    val repSizes = p.mem.filter(col("doc_id") === col("rep_id"))
      .select(col("doc_id").as("rep_id"), col("csize"))
    val widths = labeled.join(repSizes, Seq("rep_id"))
      .groupBy("cluster_id").agg(sum(col("csize")).as("n_members"))
    members.join(widths, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("n_members"))
      .orderBy("doc_id")
  }

  /** Per-stratum sampling rates as hex-prefix bounds: a document is kept
    * iff the first 4 hex digits of md5(doc_id) sort below the stratum's
    * bound — '1999'/0x10000 ~ 10 % for English, '8000' = 50 % for the
    * rest. Lexicographic compare of fixed-width hex IS numeric compare,
    * and both engines hash the same decimal string, so membership is a
    * pure row-local predicate: no shuffle, no RNG state, reproducible
    * across engines, partitionings and retries (`rand()` sampling is none
    * of those — a retried task would resample). */
  private val enBound = "1999"
  private val restBound = "8000"

  /** Deterministic stratified sample over `documents`, stratified by
    * `lang`. At 100 TB this is the standard "decimate the over-represented
    * language" knob: a scan-project with a row-local predicate that
    * pushes the `lang` filter into the parquet scan and never shuffles. */
  val sampleStratified: Q = Q(
    "ext_sample_stratified",
    s"""SELECT doc_id, lang, source,
       |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS sample_key
       |FROM documents
       |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
       |  CASE WHEN lang = 'en' THEN '$enBound' ELSE '$restBound' END
       |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val key = substring(
      graft.functions.FastMd5.fast_md5(s, col("doc_id").cast("string")), 1, 4)
    Tables.documents(s, d)
      .filter(key < when(col("lang") === "en", enBound).otherwise(restBound))
      .select(col("doc_id"), col("lang"), col("source"),
        key.as("sample_key"))
      .orderBy("doc_id")
  }

  /** Corpus vocabulary: top-100 whitespace tokens by total frequency with
    * document frequency. The aggregate is hash-based with map-side
    * partial aggregation, so a boilerplate token appearing everywhere
    * arrives at the reducer as one partial row per map partition, never
    * as raw occurrences. `count_distinct(doc_id)` is exact for oracle
    * parity; the 100 TB variant swaps it for approx_count_distinct and
    * keeps the identical plan shape (`ext_approx_distinct` demonstrates
    * that tier). Top-k is a TakeOrderedAndProject over the aggregate,
    * not a global sort. */
  val vocabTopK: Q = Q(
    "ext_vocab_topk",
    s"""SELECT t AS token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
       |FROM (SELECT doc_id, unnest($toksSql) AS t FROM documents) u
       |GROUP BY t ORDER BY tf DESC, token LIMIT 100""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(100)
  }

  /** The hashing trick (Weinberger et al., "Feature Hashing for Large
    * Scale Multitask Learning", ICML 2009): tokens mapped into a fixed
    * B-dimensional space by a deterministic hash, with the signed
    * variant's ±1 second hash so collisions cancel in expectation — the
    * feature extraction a linear model or hashed embedding table uses
    * when the vocabulary is unbounded. Output is the FEATURE-SPACE
    * census a practitioner audits before choosing B: per bucket, the
    * distinct tokens colliding there, signed and absolute term-mass.
    * Shape: the token stream reduces to the (token, tf) vocabulary
    * frame map-side first; hashing and the bucket rollup run on that
    * frame (cost ∝ |vocab|, never corpus tokens), exact integers
    * throughout, md5-derived buckets identical in both engines. B is a
    * parameter (production uses 2^18..2^22); the gate pins B=16 so the
    * fixture's ~31-token vocabulary actually COLLIDES — with B >> vocab
    * the census is the identity and proves nothing. */
  val featHash: Q = {
    val B = 16
    Q(
      "ext_feat_hash",
      s"""WITH v AS (
         |  SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM (SELECT unnest($toksSql) AS t FROM documents) u
         |  GROUP BY t),
         |h AS (
         |  SELECT token, tf,
         |    ('0x' || substr(md5(token), 1, 12))::UBIGINT::BIGINT % $B
         |      AS bucket,
         |    CASE WHEN ('0x' || substr(md5(token), 13, 1))::UBIGINT % 2
         |      = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM v)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(sgn * tf) AS BIGINT) AS tf_signed,
         |  CAST(SUM(tf) AS BIGINT) AS tf_abs
         |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin
    ) { (s, d) =>
      val v = Tables.documents(s, d)
        .select(explode(toks(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("tf"))
      v.select(col("token"), col("tf"),
        expr(s"cast(conv(substring(md5(token), 1, 12), 16, 10) as bigint)" +
          s" % $B").as("bucket"),
        expr("case when cast(conv(substring(md5(token), 13, 1), 16, 10)" +
          " as bigint) % 2 = 0 then 1 else -1 end").as("sgn"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("sgn") * col("tf")).cast("long").as("tf_signed"),
          sum(col("tf")).cast("long").as("tf_abs"))
        .orderBy("bucket")
    }
  }

  /** Per-document vocabulary coverage (OOV-rate audit): how many of each
    * doc's tokens fall inside the top-100 corpus vocabulary — the
    * tokenizer-fit signal a training pipeline tracks when choosing vocab
    * size. The vocab is the same deterministic (tf DESC, token ASC)
    * top-k as [[vocabTopK]]; it then BROADCASTS (a vocabulary is small by
    * construction), so the coverage pass is a map-side membership probe
    * so the coverage pass is a map-side membership probe against the
    * vocab ARRAY carried on a broadcast 1-row frame — the probe scan
    * never explodes (per-doc counts come from `size`/`filter` over the
    * token array in place), never joins per-token rows, and never
    * shuffles except the vocab aggregate itself. The corpus is scanned
    * exactly twice (vocab build + probe), the minimum for this op, with
    * nothing materialized in between — an earlier variant checkpointed
    * the exploded token rows to deduplicate the scan, which traded one
    * scan for serializing the full token table and lost. Counts are raw
    * integers — exact in any engine; the OOV ratio is the caller's one
    * division. */
  val vocabCoverage: Q = Q(
    "ext_vocab_coverage",
    s"""WITH u AS (SELECT doc_id, unnest($toksSql) AS t FROM documents),
       |v AS (SELECT t AS vtok FROM (
       |  SELECT t, COUNT(*) AS tf FROM u GROUP BY t
       |  ORDER BY tf DESC, t LIMIT 100) top)
       |SELECT doc_id, COUNT(*) AS n_tokens, COUNT(vtok) AS n_in_vocab
       |FROM u LEFT JOIN v ON t = vtok
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("ts"))
    val vocabArr = docs.select(explode(col("ts")).as("t"))
      .groupBy("t")
      .agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("t"))
      .limit(100)
      .agg(collect_list(col("t")).as("vt")) // 1 row: the vocab array
    docs
      .filter(size(col("ts")) > 0) // explode-parity: tokenless docs drop
      .crossJoin(broadcast(vocabArr))
      .select(col("doc_id"),
        size(col("ts")).cast("long").as("n_tokens"),
        size(filter(col("ts"),
          t => array_contains(col("vt"), t))).cast("long").as("n_in_vocab"))
      .orderBy("doc_id")
  }

  /** Sequence packing: assign documents to fixed-token-budget training
    * sequences (budget 512) by running token count in deterministic
    * doc_id order — the step that turns a cleaned corpus into trainer
    * input. Packing is PER SHARD (doc_id mod 32): a global greedy pack
    * would be a single-partition window, the classic scale killer, while
    * per-shard packing is embarrassingly parallel and is how real
    * pipelines shard anyway (each worker packs its own slice). One
    * shard-keyed window cumsum + one grouped aggregate; a doc whose
    * tokens straddle a boundary starts in the sequence its PRECEDING
    * cumulative count selects (the simple deterministic rule, mirrored
    * exactly by the oracle's integer arithmetic). */
  val corpusPack: Q = Q(
    "ext_corpus_pack",
    s"""WITH t AS (
       |  SELECT doc_id, doc_id % 32 AS shard,
       |    CAST(len($toksSql) AS BIGINT) AS n_tok
       |  FROM documents),
       |c AS (
       |  SELECT shard, n_tok,
       |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
       |      AS prev_cum
       |  FROM t)
       |SELECT shard, CAST(prev_cum // 512 AS BIGINT) AS seq_id,
       |COUNT(*) AS n_docs,
       |CAST(SUM(n_tok) AS BIGINT) AS n_tokens
       |FROM c GROUP BY shard, seq_id ORDER BY shard, seq_id""".stripMargin
  ) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), (col("doc_id") % 32).as("shard"),
        size(toks(col("text"))).cast("long").as("n_tok"))
      .withColumn("prev_cum",
        sum(col("n_tok")).over(w) - col("n_tok"))
      .groupBy(col("shard"), expr("prev_cum div 512").as("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy("shard", "seq_id")
  }

  /** The composed cleanse pipeline every pretraining corpus runs, as ONE
    * declarative plan: token gate (>= 5 tokens) -> language gate
    * (predicted English, same marker heuristic as `ext_text_langid`) ->
    * quality gate (same linear score as `ext_text_quality`, >= 0.5) ->
    * exact dedup on the normalized fingerprint (keep the smallest
    * doc_id). Composing existing operators instead of re-running them as
    * separate jobs is the point: Catalyst fuses all four gates into one
    * scan-project-filter, and the only shuffle is the fingerprint
    * dedup — at 100 TB this runs as one pass over the corpus.
    *
    * The dedup is a `min(struct(doc_id, ...))` hash aggregate keyed on
    * the fingerprint (struct ordering = doc_id ordering, its first and
    * unique field), NOT a `MIN OVER (PARTITION BY fp)` window: the
    * window formulation needs the full text column as input to its
    * partition expression, so every document body rides the exchange
    * and the per-partition sort — measured 23.7x at 10x corpus (spill).
    * The aggregate shuffles only (fp, 3 small columns) after map-side
    * combine; 10x re-measures linear. The oracle keeps the window SQL —
    * same rows, and it pins the two formulations' equivalence. */
  val pipelineCleanse: Q = Q(
    "ext_pipeline_cleanse",
    s"""WITH f AS (
       |  SELECT doc_id, text, len($toksSql) AS n_tokens,
       |    ${countInSql(en)} AS n_stop,
       |    len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct,
       |    ${TextAnalysis.langPredSql} AS lang_pred
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, text, n_tokens, lang_pred,
       |    ${r4fracSql(scoreNumSql("n_stop", "n_tokens", "n_punct",
                          "len(text)"), "n_tokens * len(text)")}
       |      AS quality_score
       |  FROM f WHERE n_tokens >= 5),
       |kept AS (
       |  SELECT doc_id, n_tokens, quality_score,
       |    MIN(doc_id) OVER (PARTITION BY
       |      md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS rep
       |  FROM scored
       |  WHERE lang_pred = 'en' AND quality_score >= 0.5)
       |SELECT doc_id, n_tokens, quality_score FROM kept
       |WHERE doc_id = rep ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val ts = toks(col("text"))
    val f = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        size(ts).cast("long").as("n_tokens"),
        countIn(ts, en).as("n_stop"),
        regexp_count(col("text"), lit("[^a-zA-Z0-9\\s]")).cast("long")
          .as("n_punct"),
        TextAnalysis.langPred(col("text")).as("lang_pred"))
      .filter(col("n_tokens") >= 5)
    val ln = length(col("text")).cast("long")
    val scored = f.select(col("doc_id"), col("text"), col("n_tokens"),
      col("lang_pred"),
      r4frac(scoreNum(col("n_stop"), col("n_tokens"), col("n_punct"), ln),
        col("n_tokens") * ln).as("quality_score"))
    scored
      .filter(col("lang_pred") === "en" && col("quality_score") >= 0.5)
      .select(graft.functions.FastMd5.fast_md5(s,
          lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("fp"),
        col("doc_id"), col("n_tokens"), col("quality_score"))
      .groupBy("fp")
      .agg(min(struct(col("doc_id"), col("n_tokens"),
        col("quality_score"))).as("r"))
      .select(col("r.doc_id").as("doc_id"),
        col("r.n_tokens").as("n_tokens"),
        col("r.quality_score").as("quality_score"))
      .orderBy("doc_id")
  }

  /** Salt width for the skewed aggregation below: enough splits that one
    * hot key spreads over the cluster, few enough that the second-stage
    * input stays tiny (keys x SaltBuckets rows). */
  private val SaltBuckets = 16

  /** Two-stage salted aggregation over a LOW-CARDINALITY skewed key
    * (`events.event_type`, a handful of values for 10^5..10^9 rows): stage
    * 1 aggregates on (key, salt) so no single reducer owns a hot key's
    * full row set; stage 2 folds the SaltBuckets partials per key. The
    * salt is derived from event_id, not rand() — deterministic under
    * retries. Decimal partial sums re-aggregate associatively, so the
    * result is bit-identical to the unsalted plan, which is exactly what
    * the oracle computes (the plain GROUP BY — salting is an execution
    * strategy, not a semantic). Spark's own partial aggregation covers
    * mild skew; explicit salting is the declarative form of the fix when
    * one key dominates entire partitions. */
  val skewSaltedAgg: Q = Q(
    "ext_skew_salted_agg",
    """SELECT event_type, COUNT(*) AS n,
      |CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    import graft.core.Determinism.m
    val partial = Tables.events(s, d)
      .groupBy(col("event_type"), (col("event_id") % SaltBuckets).as("salt"))
      .agg(count(lit(1)).as("pn"), sum(m(col("value"))).as("pt"))
    partial.groupBy("event_type")
      .agg(sum(col("pn")).as("n"), sum(col("pt")).cast("double").as("total"))
      .orderBy("event_type")
  }

  /** Two-stage salted JOIN over the same low-cardinality skewed key: the
    * dimension side is replicated once per salt bucket and the fact side
    * salts deterministically on event_id, so the join exchange hashes on
    * (event_type, salt) — SaltBuckets x the key domain — instead of
    * funnelling each hot key through one task. A `merge` hint keeps the
    * plan a real shuffle join (at fixture scale AQE would broadcast the
    * 5-row dim and hide the exchange this op exists to demonstrate; at
    * 100 TB the dim that needs this is the one too big to broadcast).
    * Replication x salting never changes the join result — each fact row
    * still meets each matching dim row exactly once — which is exactly
    * what the plain-join oracle checks. */
  val skewSaltedJoin: Q = Q(
    "ext_skew_salted_join",
    """WITH wt(w_type, w) AS (VALUES
      |  ('click', 1.0), ('error', 5.0), ('purchase', 10.0),
      |  ('signup', 2.0), ('view', 0.5))
      |SELECT event_type, COUNT(*) AS n,
      |CAST(SUM(CAST(value AS DECIMAL(10,2)) * CAST(w AS DECIMAL(10,2)))
      |  AS DOUBLE) AS weighted_total
      |FROM events JOIN wt ON event_type = w_type
      |GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.core.Determinism.m
    val dim = Seq(("click", 1.0), ("error", 5.0), ("purchase", 10.0),
      ("signup", 2.0), ("view", 0.5)).toDF("w_type", "w")
      .withColumn("w_salt",
        explode(sequence(lit(0), lit(SaltBuckets - 1))))
    Tables.events(s, d)
      .withColumn("salt", (col("event_id") % SaltBuckets).cast("int"))
      .join(dim.hint("merge"),
        col("event_type") === col("w_type") && col("salt") === col("w_salt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(m(col("value")) * m(col("w"))).cast("double")
          .as("weighted_total"))
      .orderBy("event_type")
  }

  /** Domain-mixture weights: target epoch composition per `source`.
    * > 1 upsamples (the doc repeats floor(w) times plus one more for a
    * deterministic md5-chosen fraction), < 1 decimates. The tiers are
    * explicit lists so the oracle mirrors them verbatim. */
  private val MixUp = Seq("src0", "src1") // books-like: 2.25 copies
  private val MixKeep = Seq("src2", "src3", "src4") // curated: 1.0
  // weights: up = 2.25 copies, keep = 1, everything else (web-like)
  // decimates to 0.4 — encoded below as integer+md5-fraction bounds
  // md5-prefix thresholds for the fractional parts (0.25 / 0.4 of 0x10000)
  private val UpFracBound = "4000" // 0x4000/0x10000 = 0.25
  private val DownFracBound = "6666" // 0x6666/0x10000 ~ 0.39999 ~ 0.4

  /** Deterministic domain-mixture curation (the "data recipe" step of a
    * training run: set each source's epoch weight, e.g. books x2.25,
    * curated x1, web x0.4). Emits one row per kept doc with `n_copies`
    * (>= 1) — the materialized repeat count a writer would expand at
    * ingest. Pure row-local arithmetic on md5(doc_id): no shuffle, no
    * RNG, identical under retries and across engines — at 100 TB this is
    * a scan-project whose output feeds the epoch writer directly.
    * Fractional copies use the SAME fixed-width-hex trick as
    * [[sampleStratified]] (lexicographic compare of 4 hex digits is
    * numeric compare of the hash fraction). */
  val corpusMix: Q = Q(
    "ext_corpus_mix",
    s"""SELECT * FROM (
       |  SELECT doc_id, source,
       |    CASE
       |      WHEN source IN (${MixUp.map("'" + _ + "'").mkString(",")})
       |        THEN 2 + CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
       |          < '$UpFracBound' THEN 1 ELSE 0 END
       |      WHEN source IN (${MixKeep.map("'" + _ + "'").mkString(",")})
       |        THEN 1
       |      ELSE CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
       |        < '$DownFracBound' THEN 1 ELSE 0 END
       |    END AS n_copies
       |  FROM documents) m
       |WHERE n_copies > 0
       |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val key = substring(
      graft.functions.FastMd5.fast_md5(s, col("doc_id").cast("string")), 1, 4)
    val copies = when(col("source").isin(MixUp: _*),
        lit(2) + when(key < UpFracBound, 1).otherwise(0))
      .when(col("source").isin(MixKeep: _*), lit(1))
      .otherwise(when(key < DownFracBound, 1).otherwise(0))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), copies.as("n_copies"))
      .filter(col("n_copies") > 0)
      .orderBy("doc_id")
  }

  /** Distinctive key-terms per document: the top-3 tokens ranked rarest-
    * in-corpus first (df ASC), then most-frequent-in-doc (tf DESC), then
    * token — keyword extraction with EXACT integer ordering (tf-idf's
    * ranking without its float logs, so the oracle hash-matches). Plan
    * shape at 100 TB: one token explode feeding two hash aggregates (per-
    * doc tf; corpus df with map-side combine), a term-keyed join only
    * AFTER both sides are aggregate-compressed (df is vocabulary-sized,
    * tf is per-doc-distinct-term-sized — both orders of magnitude below
    * the raw token stream), and a per-doc top-k window — no global sort
    * until the final presentation ORDER BY. */
  val docKeyTerms: Q = Q(
    "ext_doc_keyterms",
    s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS t FROM documents),
       |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
       |ranked AS (
       |  SELECT tf.doc_id, tf.t AS term, tf.tf, df.df,
       |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
       |      ORDER BY df.df ASC, tf.tf DESC, tf.t) AS rk
       |  FROM tf JOIN df ON df.t = tf.t)
       |SELECT doc_id, term, tf, df, rk FROM ranked WHERE rk <= 3
       |ORDER BY doc_id, rk""".stripMargin
  ) { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
    val tf = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val df = tok.groupBy("t")
      .agg(countDistinct(col("doc_id")).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("df").asc, col("tf").desc, col("t").asc)
    tf.join(df, "t")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("t").as("term"), col("tf"), col("df"),
        col("rk"))
      .orderBy("doc_id", "rk")
  }

  /** Heavy-hitter tokens (true count > n/32) with the Misra-Gries
    * sketch's guarantee surfaced as a gate-checkable flag — the
    * `ext_approx_distinct` discipline: the oracle computes the EXACT
    * heavy-hitter rows (term, count, found=true), and the sketch's
    * mergeable-summaries bound (undercount <= n/65 at capacity 64, any
    * merge order — [[graft.functions.MisraGries]]) makes `found` TRUE
    * deterministically for every such term, whatever the partitioning.
    * The candidate set BEYOND the guarantee is partitioning-dependent
    * and is deliberately not emitted. At scale the sketch side shuffles
    * 64 counters per partition instead of the token stream; the exact
    * side exists for the gate (and is itself one map-side-combined
    * aggregate). */
  val vocabHeavyHitters: Q = Q(
    "ext_vocab_heavy_hitters",
    s"""WITH u AS (SELECT unnest($toksSql) AS t FROM documents),
       |cnt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS tf FROM u GROUP BY t),
       |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS n FROM cnt)
       |SELECT t AS token, tf, TRUE AS found
       |FROM cnt CROSS JOIN tot WHERE tf * 32 > n
       |ORDER BY tf DESC, token""".stripMargin
  ) { (s, d) =>
    val toksDf = Tables.documents(s, d)
      .select(explode(toks(col("text"))).as("t"))
    val cnt = toksDf.groupBy("t").agg(count(lit(1)).as("tf"))
    val tot = cnt.agg(sum(col("tf")).as("n"))
    val sketch = toksDf
      .agg(graft.functions.MisraGries.misra_gries(s, col("t"))
        .as("candidates"))
    cnt.join(broadcast(tot), col("tf") * 32 > col("n"))
      .join(broadcast(sketch))
      .select(col("t").as("token"), col("tf"),
        array_contains(col("candidates"), col("t")).as("found"))
      .orderBy(col("tf").desc, col("token"))
  }

  /** BPE merge-pair counting — the inner loop of byte-pair-encoding
    * tokenizer training (Gage, "A New Algorithm for Data Compression",
    * C Users Journal 1994; Sennrich et al., "Neural Machine Translation
    * of Rare Words with Subword Units", ACL 2016): count adjacent
    * symbol-pair frequencies corpus-wide and rank the merge candidates.
    *
    * The plan uses the compression trick every real BPE trainer uses:
    * aggregate the token stream to (distinct word, frequency) FIRST —
    * map-side-combined, output is vocabulary-sized regardless of corpus
    * size — then explode character pairs over the distinct-word table
    * only, weighting each pair by the word's frequency. At 100 TB the
    * pair explode touches ~1e6 vocabulary rows, not ~1e12 token
    * occurrences; the only corpus-sized shuffle is the initial word
    * count, and the final agg keys on 2-char pairs (alphabet²-bounded)
    * feeding a TakeOrdered top-50 — no global sort. */
  val bpePairCounts: Q = Q(
    "ext_bpe_pair_counts",
    s"""WITH u AS (SELECT unnest($toksSql) AS w FROM documents),
       |words AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM u GROUP BY w),
       |pairs AS (
       |  SELECT unnest(list_transform(range(1, length(w)),
       |    i -> substr(w, CAST(i AS INTEGER), 2))) AS pair, freq
       |  FROM words),
       |agg AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM pairs GROUP BY pair)
       |SELECT pair, cnt FROM agg ORDER BY cnt DESC, pair LIMIT 50""".stripMargin
  ) { (s, d) =>
    val words = Tables.documents(s, d)
      .select(explode(toks(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    words
      // Spark's sequence(1, 0) counts DOWN instead of returning empty,
      // so 1-char words (pairless) must be excluded before the explode
      .filter(length(col("w")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(50)
  }

  private val BpeRounds = 12

  /** Iterative BPE TRAINER — the k-round merge loop on top of
    * [[bpePairCounts]]'s single-round ranking (Sennrich et al. ACL 2016
    * training loop): each round picks the corpus-wide most frequent
    * adjacent symbol pair (ties broken lexicographically) and merges it
    * greedily left-to-right in every word's symbol sequence; the output
    * is the learned merge list (round, lhs, rhs, cnt) — the artifact a
    * tokenizer ships.
    *
    * Scale shape: the corpus is compressed to (distinct word, freq)
    * ONCE (the only corpus-sized shuffle); every round then runs over
    * the VOCABULARY table — a pair count + argmax (alphabet²-bounded
    * aggregate, 1-row collect) and one array-local fold rewriting the
    * symbol arrays — so k rounds cost k vocabulary passes, never k
    * token-stream passes. The greedy merge is a left fold: `x` joins
    * the accumulator's last symbol iff (last, x) = (lhs, rhs); the
    * merged symbol lhs||rhs can never equal lhs (rhs nonempty), so the
    * fold cannot cascade — it is exactly the non-overlapping
    * left-to-right merge. The oracle replays the identical k rounds as
    * chained MATERIALIZED CTEs (the fixed-point PageRank discipline)
    * with the same fold via list_reduce. */
  /** The k-round CTE chain shared by the trainer and vocab oracles:
    * rounds 1..k of (pair count, argmax, fold-merge), ending at v$k. */
  private def bpeRoundsSql: String = {
    val rounds = (1 to BpeRounds).map { r =>
      s"""p$r AS (
         |  SELECT u.p.a AS a, u.p.b AS b, CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(list_transform(range(1, len(syms)),
         |      i -> {'a': syms[CAST(i AS INTEGER)],
         |            'b': syms[CAST(i AS INTEGER) + 1]})) AS p, freq
         |    FROM v${r - 1} WHERE len(syms) >= 2) u
         |  GROUP BY 1, 2),
         |best$r AS MATERIALIZED (SELECT a, b, cnt FROM p$r
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |v$r AS MATERIALIZED (
         |  SELECT freq, list_reduce(
         |    list_prepend(CAST([] AS VARCHAR[]),
         |      list_transform(syms, s -> [s])),
         |    (acc, x) -> CASE WHEN len(acc) > 0
         |        AND acc[-1] = ba$r AND x[1] = bb$r
         |      THEN list_append(acc[1:len(acc)-1], ba$r || bb$r)
         |      ELSE list_append(acc, x[1]) END) AS syms
         |  FROM v${r - 1} CROSS JOIN
         |    (SELECT a AS ba$r, b AS bb$r FROM best$r) j$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH u0 AS (SELECT unnest($toksSql) AS w FROM documents),
       |words AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM u0 GROUP BY w),
       |v0 AS MATERIALIZED (SELECT freq,
       |  list_transform(range(1, length(w) + 1),
       |    i -> substr(w, CAST(i AS INTEGER), 1)) AS syms FROM words),
       |$rounds""".stripMargin
  }

  /** The k-round training loop shared by [[bpeTrain]] and [[bpeVocab]]:
    * returns the learned merge list and the post-merge vocabulary
    * (freq, syms) frame. */
  /** One greedy left-to-right merge pass over a symbol sequence —
    * byte-for-byte the retired Catalyst fold's semantics: `x` joins the
    * accumulator's last symbol iff (last, x) = (a, b); the merged
    * symbol a||b can never equal a (b nonempty), so the fold cannot
    * cascade. Pure string equality — no floating point anywhere in the
    * BPE loop, so the imperative form is EXACTLY the declarative one. */
  /** The (a, b) merge pairs learned so far, applied oldest-first — the
    * same left-to-right greedy sequence the per-round materialized
    * vocabulary walked, one word at a time. A MEMBER method, not a
    * local def: executor closures call it through the object's static
    * MODULE$ reference; a local def would lift with a captured outer
    * and fail closure serialization. */
  private def applyMerges(syms0: Array[String],
      ms: Array[(String, String)]): Array[String] = {
    var syms = syms0
    var k = 0
    while (k < ms.length) {
      syms = mergeSyms(syms, ms(k)._1, ms(k)._2, ms(k)._1 + ms(k)._2)
      k += 1
    }
    syms
  }

  private def mergeSyms(syms: Array[String], a: String, b: String,
      ab: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out(out.length - 1) == a && syms(i) == b)
        out(out.length - 1) = ab
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  private def bpeLoop(s: SparkSession, d: String)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    // the only corpus-sized work: compress the token stream to
    // (distinct word, freq) — map-side-combined, vocabulary-sized
    // output regardless of corpus size. This stays declarative; the
    // 100 TB cost model lives HERE.
    val words = Tables.documents(s, d)
      .select(explode(toks(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // The k-round loop itself runs over the cached VOCABULARY RDD
    // (round 17, the ext_bpe_* weak-row fix): per-round work is a
    // fixed pair-count + argmax + array-local merge over a ~50k-row
    // frame — work Catalyst can neither push down nor reorder, while a
    // DataFrame loop re-analyzed and re-optimized a fresh plan every
    // round (the dominant cost by 10x at this scale; measured
    // bpe_train 7.5 -> 3.6 s via plan identity alone).
    //
    // Round 18 (the remaining job-floor cut, 2 jobs/round -> 1): each
    // round is now ONE shuffle-free job — per-partition pair-count
    // HASH MAPS over the cached base vocabulary (the merges learned so
    // far re-applied in-flight; array-local string work, O(rounds ×
    // vocab) total) merged by treeReduce, argmax on the driver. No
    // per-round persist/count job, no reduceByKey shuffle: the pair
    // domain is vocabulary-bounded (tens of KB as a map), which is
    // exactly the size class treeReduce is for. Determinism is EXACT,
    // not tolerance-based: counts are integer sums merged
    // associatively/commutatively across partition maps, and the
    // argmax applies the total order (cnt DESC, a ASC, b ASC) in
    // UTF8String binary order — the same order Spark's orderBy and the
    // DuckDB oracle's ORDER BY use — over the ONE final map, so hash
    // iteration order cannot matter. Driver traffic per round is one
    // pair-domain map.
    import s.implicits._
    val base: org.apache.spark.rdd.RDD[(Long, Array[String])] = words
      .select(col("freq"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms"))
      .as[(Long, Array[String])].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count() // materialize outside the timed rounds' lineage
    val merges = scala.collection.mutable
      .ArrayBuffer.empty[(Long, String, String, Long)]
    def utf8Lt(x: String, y: String): Boolean =
      org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)) < 0
    for (r <- 1 to BpeRounds) {
      val soFar = merges.toArray.map(m => (m._2, m._3))
      val counts = base.mapPartitions { it =>
        val m = scala.collection.mutable.HashMap
          .empty[(String, String), Long]
        it.foreach { case (freq, syms0) =>
          val syms = applyMerges(syms0, soFar)
          var i = 0
          while (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            m.update(k, m.getOrElse(k, 0L) + freq)
            i += 1
          }
        }
        Iterator.single(m)
      }.treeReduce { (x, y) =>
        y.foreach { case (k, v) => x.update(k, x.getOrElse(k, 0L) + v) }
        x
      }
      val ((a, b), cnt) = counts.iterator
        .reduce { (x, y) => // max under (cnt DESC, a ASC, b ASC)
          val ((xa, xb), xc) = x
          val ((ya, yb), yc) = y
          if (xc > yc) x
          else if (yc > xc) y
          else if (utf8Lt(xa, ya)) x
          else if (utf8Lt(ya, xa)) y
          else if (utf8Lt(yb, xb)) y else x
        }
      merges += ((r.toLong, a, b, cnt))
    }
    val all = merges.toArray.map(m => (m._2, m._3))
    val vocab = base.map { case (freq, syms) =>
      (freq, applyMerges(syms, all))
    }
    (merges.toSeq, vocab.toDF("freq", "syms"))
  }

  val bpeTrain: Q = Q(
    "ext_bpe_train",
    s"""$bpeRoundsSql
       |${(1 to BpeRounds).map(r =>
          s"SELECT CAST($r AS BIGINT) AS round, a AS lhs, b AS rhs, " +
            s"cnt FROM best$r").mkString("\nUNION ALL\n")}
       |ORDER BY round""".stripMargin
  ) { (s, d) =>
    val (merges, _) = bpeLoop(s, d)
    import s.implicits._
    merges.toDF("round", "lhs", "rhs", "cnt").orderBy("round")
  }

  /** The ENCODE half of tokenizer training — apply the learned merges
    * and emit the resulting subword vocabulary: every symbol of the
    * post-merge word table weighted by word frequency, top 30 by corpus
    * frequency. Closes the train -> encode loop ([[bpeTrain]] learns
    * the merge list; this is what shipping it does to the corpus).
    * Same scale shape: the encode "pass" IS the trainer's final
    * vocabulary state — symbol emission is an array-local explode over
    * the (word, freq) table, never the token stream. */
  val bpeVocab: Q = Q(
    "ext_bpe_vocab",
    s"""$bpeRoundsSql
       |SELECT u.s AS symbol, CAST(SUM(freq) AS BIGINT) AS freq
       |FROM (SELECT unnest(syms) AS s, freq FROM v$BpeRounds) u
       |GROUP BY 1 ORDER BY freq DESC, symbol LIMIT 30""".stripMargin
  ) { (s, d) =>
    val (_, vocab) = bpeLoop(s, d)
    vocab.select(col("freq"), explode(col("syms")).as("symbol"))
      .groupBy("symbol").agg(sum(col("freq")).as("freq"))
      .orderBy(col("freq").desc, col("symbol")).limit(30)
  }

  /** Deterministic k-per-group sample: the 8 docs per source whose
    * md5(doc_id) hashes are smallest — a per-group bottom-k sketch
    * ([[graft.functions.BoundedMinK]]), the "give me k example docs from
    * every source/domain" audit step of a corpus pipeline. Hash-ordered
    * selection makes the sample stable across runs, retries, and cluster
    * sizes (the `ext_sample_stratified` discipline, per-group exact-k
    * instead of per-row Bernoulli).
    *
    * Scale shape: the naive plan is `row_number().over(partitionBy
    * (source))` — a funnel that sorts each source's entire row set in
    * one task (sources are few; the round-7 quantile critique). The
    * bottom-k aggregate replaces it with O(k) state per partition per
    * group and map-side combine: each partition ships at most k
    * (hash, id) pairs per source, never the row stream. */
  val samplePerSource: Q = Q(
    "ext_sample_per_source",
    """WITH ranked AS (
      |  SELECT source, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |SELECT source, doc_id FROM ranked WHERE rn <= 8
      |ORDER BY source, doc_id""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("source"),
        graft.functions.FastMd5.fast_md5(s, col("doc_id").cast("string"))
          .as("skey"),
        col("doc_id"))
      .groupBy("source")
      .agg(graft.functions.BoundedMinK.bounded_min_k(
        s, col("skey"), col("doc_id"), 8).as("ids"))
      .select(col("source"), explode(col("ids")).as("doc_id"))
      .orderBy("source", "doc_id")
  }

  /** Sliding-window document chunking (64-token windows, stride 48 — the
    * retrieval-indexing / context-length-split precursor to
    * `ext_corpus_pack`): every token lands in at least one chunk, chunk
    * count per doc is ceil((n-64)/48)+1 (floor-of-nonneg arithmetic so
    * both engines agree without integer-division sign rules), and each
    * chunk is emitted as (doc_id, chunk_id, token count, content
    * fingerprint) — the fingerprint stands in for chunk text so the gate
    * checks content equality without shipping the corpus through the
    * compare.
    *
    * Scale shape: pure scan -> generate -> project, NO shuffle anywhere
    * but the presentation sort; fan-out is bounded by n/stride per doc.
    * At 100 TB this is the op you want embarrassingly parallel, and it
    * is. */
  val docChunk: Q = Q(
    "ext_doc_chunk",
    s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |ch AS (SELECT doc_id, tk,
       |    unnest(range(0, CAST(floor(GREATEST(len(tk) - 17, 0) / 48.0)
       |      AS BIGINT) + 1)) AS chunk_id
       |  FROM t),
       |s AS (SELECT doc_id, chunk_id,
       |    tk[chunk_id * 48 + 1 : chunk_id * 48 + 64] AS ck
       |  FROM ch)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(len(ck) AS BIGINT) AS n_tok,
       |  md5(array_to_string(ck, ' ')) AS fp
       |FROM s ORDER BY doc_id, chunk_id""".stripMargin
  ) { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("tk"))
    val nchunks =
      (floor(greatest(size(col("tk")) - 17, lit(0)) / 48.0) + 1).cast("long")
    t.select(col("doc_id"), col("tk"),
        explode(sequence(lit(0L), nchunks - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("tk"), (col("chunk_id") * 48 + 1).cast("int"), lit(64))
          .as("ck"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ck")).cast("long").as("n_tok"),
        graft.functions.FastMd5.fast_md5(s, concat_ws(" ", col("ck")))
          .as("fp"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Temperature-based mixture reweighting (T=2, the multilingual/
    * multi-source balancing rule of Conneau & Lample NeurIPS'19 and
    * Arivazhagan et al. '19): per-source sampling weight ∝ p^(1/T) =
    * sqrt(p), flattening the size distribution so small sources are
    * upsampled relative to their raw share. p is the source's CHARACTER
    * share (token-budget proxy), not doc count. T=2 keeps every float
    * step engine-exact: IEEE sqrt and division are correctly rounded,
    * the normalization denominator sums 6-rounded weights as exact
    * decimals, and each output rounds once ([[graft.core.Determinism]]
    * rule 3 applied to a non-money pipeline). One map-side-combined
    * groupBy(source); every later frame is sources-sized — the schedule
    * feeds `ext_corpus_mix`'s per-doc up/downsampling at any corpus
    * scale. */
  val mixTemperature: Q = Q(
    "ext_corpus_mix_temperature",
    """WITH s AS (SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(length(text)) AS BIGINT) AS n_chars
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS tot FROM s),
      |w AS (SELECT source, n_docs, n_chars,
      |    ROUND(SQRT(CAST(n_chars AS DOUBLE) / CAST(tot AS DOUBLE)), 6)
      |      AS w_temp
      |  FROM s CROSS JOIN t),
      |d AS (SELECT CAST(SUM(CAST(w_temp AS DECIMAL(12,6))) AS DOUBLE)
      |    AS denom FROM w)
      |SELECT source, n_docs, n_chars, w_temp,
      |ROUND(w_temp / denom, 6) AS share_temp
      |FROM w CROSS JOIN d ORDER BY source""".stripMargin
  ) { (s, d) =>
    val bySource = Tables.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"))
    val tot = bySource.agg(sum(col("n_chars")).as("tot"))
    val w = bySource.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_chars"),
        round(sqrt(col("n_chars").cast("double")
          / col("tot").cast("double")), 6).as("w_temp"))
    val denom = w.agg(
      sum(col("w_temp").cast(org.apache.spark.sql.types.DecimalType(12, 6)))
        .cast("double").as("denom"))
    w.crossJoin(broadcast(denom))
      .select(col("source"), col("n_docs"), col("n_chars"), col("w_temp"),
        round(col("w_temp") / col("denom"), 6).as("share_temp"))
      .orderBy("source")
  }

  /** Count-Min point-frequency estimates audited against exact counts:
    * the 30 most frequent tokens (deterministic (tf DESC, token) order)
    * each carry a `within_bound` flag — estimate >= exact (CMS never
    * undercounts; a hard guarantee) and overshoot <= 4N/width (the
    * eps-N band; probabilistic per the sketch literature, deterministic
    * here because sketch, seeds, and fixture are all fixed). The oracle
    * recomputes the exact counts and pins the flag TRUE, the same
    * exact-vs-sketch gate contract as `ext_approx_distinct`.
    *
    * Scale shape: the sketch build is ONE mergeable aggregate
    * ([[graft.functions.CountMinAgg]]) — each partition ships a
    * depth x width counter matrix, never tokens; the estimate probe is
    * 30 report rows against the broadcast 1-row sketch. N comes from
    * summing one sketch row (every token lands exactly once per row), so
    * no extra corpus pass. */
  val vocabCms: Q = Q(
    "ext_vocab_cms",
    s"""WITH tok AS (SELECT unnest($toksSql) AS t FROM documents),
       |top AS (SELECT t AS token, COUNT(*) AS exact FROM tok
       |  GROUP BY 1 ORDER BY exact DESC, token LIMIT 30)
       |SELECT token, exact, TRUE AS within_bound
       |FROM top ORDER BY exact DESC, token""".stripMargin
  ) { (s, d) =>
    import graft.functions.CountMin
    val W = CountMin.DefaultWidth
    val toksDf = Tables.documents(s, d)
      .select(explode(toks(col("text"))).as("t"))
    val sk = toksDf.agg(CountMin.count_min(s, col("t")).as("cms"))
    val top = toksDf.groupBy(col("t")).agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("t")).limit(30)
    top.crossJoin(broadcast(sk))
      .withColumn("est", CountMin.cms_estimate(s, col("cms"), col("t")))
      .withColumn("n_total",
        aggregate(slice(col("cms"), 1, W), lit(0L), (a, x) => a + x))
      .select(col("t").as("token"), col("exact"),
        (col("est") >= col("exact") &&
          (col("est") - col("exact")) * W <= col("n_total") * 4)
          .as("within_bound"))
      .orderBy(col("exact").desc, col("token"))
  }

  val all: Seq[Q] =
    Seq(dedupClusters, dedupClustersStar, dedupKeepBest, sampleStratified,
      vocabTopK, featHash,
      vocabCoverage, pipelineCleanse, skewSaltedAgg, skewSaltedJoin,
      corpusMix, corpusPack, docKeyTerms, vocabHeavyHitters,
      bpePairCounts, bpeTrain, bpeVocab, samplePerSource, docChunk,
      mixTemperature, vocabCms, graphBfs)
}
