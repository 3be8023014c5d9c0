package graft.ext

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] statistical-test operators — the experiment-analysis queries an
  * event warehouse serves (is event mix independent of time of day? did
  * variant A out-earn variant B?), computed with cross-engine-exact
  * arithmetic: every aggregate is integer/decimal (order-independent),
  * and every IEEE double step runs in ONE fixed evaluation order per
  * cell plus a single explicitly-ordered fold — so the test statistics
  * hash-match DuckDB bit-for-bit with no rounding crutch.
  *
  * Scale shape: both tests reduce the fact table to a tiny
  * sufficient-statistics frame FIRST (a map-side-combined aggregate:
  * 5x24 contingency cells, or 2 group-moment rows); all double math
  * happens on that frame. At 100 TB the scan cost is one aggregate
  * pass; the statistics are O(cells), never O(rows).
  */
object Stats {

  /** Pearson chi-square test of independence between event_type and
    * hour-of-day. Cells, row/column totals, and N are exact integers;
    * each cell's expected count and term are fixed-order IEEE doubles;
    * the 120-term sum is a sequential fold in (event_type, hour) order —
    * `list_reduce` mirrors it exactly. */
  val chi2: Q = Q(
    "ext_stats_chi2",
    """WITH cells AS (
      |  SELECT event_type AS et, CAST(hour(ts) AS BIGINT) AS hr,
      |    CAST(COUNT(*) AS BIGINT) AS o
      |  FROM events GROUP BY 1, 2),
      |rt AS (SELECT et, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
      |ct AS (SELECT hr, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
      |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
      |terms AS (
      |  SELECT cells.et, cells.hr,
      |    (o - CAST(r * c AS DOUBLE) / n) * (o - CAST(r * c AS DOUBLE) / n)
      |      / (CAST(r * c AS DOUBLE) / n) AS term
      |  FROM cells JOIN rt USING (et) JOIN ct USING (hr) CROSS JOIN n)
      |SELECT
      |  list_reduce(list_prepend(0.0, list(term ORDER BY et, hr)),
      |    (acc, x) -> acc + x) AS chi2,
      |  (SELECT CAST((COUNT(DISTINCT et) - 1) * (COUNT(DISTINCT hr) - 1)
      |     AS BIGINT) FROM cells) AS dof,
      |  (SELECT n FROM n) AS n_obs
      |FROM terms""".stripMargin
  ) { (s, d) =>
    val cells = Tables.events(s, d)
      .groupBy(col("event_type").as("et"),
        hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("o"))
    val rt = cells.groupBy("et").agg(sum(col("o")).as("r"))
    val ct = cells.groupBy("hr").agg(sum(col("o")).as("c"))
    val n = cells.agg(sum(col("o")).as("n"),
      ((count_distinct(col("et")) - 1) *
        (count_distinct(col("hr")) - 1)).as("dof"))
    val e = (col("r") * col("c")).cast("double") / col("n")
    val terms = cells
      .join(broadcast(rt), Seq("et")).join(broadcast(ct), Seq("hr"))
      .crossJoin(broadcast(n))
      .select(col("et"), col("hr"), col("dof"), col("n"),
        ((col("o") - e) * (col("o") - e) / e).as("term"))
    terms.groupBy(col("dof"), col("n").as("n_obs"))
      .agg(aggregate(
        transform(
          array_sort(collect_list(struct(col("et"), col("hr"),
            col("term")))),
          st => st("term")),
        lit(0.0), (acc, x) => acc + x).as("chi2"))
      .select(col("chi2"), col("dof"), col("n_obs"))
  }

  /** Welch's unequal-variance t-test: purchase vs click event values.
    * Group moments (n, sum, sum of squares) are exact decimals — the
    * fixture's 2-decimal payloads square to exact (20,4) decimals, so
    * the moment aggregates are order-independent; the mean/variance/t
    * chain is then a fixed sequence of scalar IEEE ops both engines
    * evaluate identically. Emits the Welch-Satterthwaite df too. */
  val welch: Q = Q(
    "ext_stats_welch",
    """WITH g AS (
      |  SELECT event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS s,
      |    CAST(SUM(CAST(value AS DECIMAL(10,2)) *
      |             CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS ss
      |  FROM events WHERE event_type IN ('purchase', 'click')
      |  GROUP BY 1),
      |w AS (
      |  SELECT
      |    a.n AS n_a, b.n AS n_b,
      |    a.s / a.n AS mean_a, b.s / b.n AS mean_b,
      |    (a.ss - (a.s / a.n) * a.s) / (a.n - 1) AS var_a,
      |    (b.ss - (b.s / b.n) * b.s) / (b.n - 1) AS var_b
      |  FROM g a CROSS JOIN g b
      |  WHERE a.event_type = 'purchase' AND b.event_type = 'click')
      |SELECT n_a, n_b, mean_a, mean_b,
      |  (mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b) AS t_stat,
      |  (var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b) /
      |    ((var_a / n_a) * (var_a / n_a) / (n_a - 1) +
      |     (var_b / n_b) * (var_b / n_b) / (n_b - 1)) AS welch_df
      |FROM w""".stripMargin
  ) { (s, d) =>
    val dec = col("value").cast("decimal(10,2)")
    val g = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(dec).cast("double").as("s"),
        sum(dec * dec).cast("double").as("ss"))
    val a = g.filter(col("event_type") === "purchase")
      .select(col("n").as("n_a"), col("s").as("s_a"), col("ss").as("ss_a"))
    val b = g.filter(col("event_type") === "click")
      .select(col("n").as("n_b"), col("s").as("s_b"), col("ss").as("ss_b"))
    val meanA = col("s_a") / col("n_a")
    val meanB = col("s_b") / col("n_b")
    val varA = (col("ss_a") - meanA * col("s_a")) / (col("n_a") - 1)
    val varB = (col("ss_b") - meanB * col("s_b")) / (col("n_b") - 1)
    val seA = varA / col("n_a")
    val seB = varB / col("n_b")
    a.crossJoin(broadcast(b))
      .select(col("n_a"), col("n_b"),
        meanA.as("mean_a"), meanB.as("mean_b"),
        ((meanA - meanB) / sqrt(seA + seB)).as("t_stat"),
        ((seA + seB) * (seA + seB) /
          (seA * seA / (col("n_a") - 1) +
            seB * seB / (col("n_b") - 1))).as("welch_df"))
  }

  /** Pearson correlation matrix over the lineitem measures (quantity,
    * extendedprice, discount, tax): ALL sufficient statistics — n, four
    * sums, four sums of squares, six cross-products — come from ONE
    * map-side-combined aggregate pass in exact decimal (order-independent
    * however the scan is partitioned); each of the six correlations is
    * then a fixed scalar IEEE chain over singly-cast doubles. The
    * profiling companion to `ext_profile_table`: O(rows) scan, O(1)
    * math, six output rows. */
  val corr: Q = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    def dsumSql(x: String) =
      s"CAST(SUM(CAST($x AS DECIMAL(10,2))) AS DOUBLE) AS s_$x"
    def dssSql(x: String) =
      s"CAST(SUM(CAST($x AS DECIMAL(10,2)) * CAST($x AS DECIMAL(10,2)))" +
        s" AS DOUBLE) AS ss_$x"
    def dxySql(x: String, y: String) =
      s"CAST(SUM(CAST($x AS DECIMAL(10,2)) * CAST($y AS DECIMAL(10,2)))" +
        s" AS DOUBLE) AS sp_${x}_$y"
    def corrSql(x: String, y: String) =
      s"(n * sp_${x}_$y - s_$x * s_$y) / " +
        s"(sqrt(n * ss_$x - s_$x * s_$x) * sqrt(n * ss_$y - s_$y * s_$y))"
    Q(
      "ext_stats_corr",
      s"""WITH m AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${cols.map(dsumSql).mkString(",\n    ")},
         |    ${cols.map(dssSql).mkString(",\n    ")},
         |    ${pairs.map { case (x, y) => dxySql(x, y) }
        .mkString(",\n    ")}
         |  FROM lineitem)
         |${pairs.map { case (x, y) =>
        s"SELECT '$x' AS col_x, '$y' AS col_y, ${corrSql(x, y)} AS corr " +
          "FROM m" }.mkString("\nUNION ALL\n")}
         |ORDER BY col_x, col_y""".stripMargin
    ) { (s, d) =>
      def dec(x: String) = col(x).cast("decimal(10,2)")
      val aggs =
        Seq(count(lit(1)).cast("double").as("n")) ++
          cols.map(x => sum(dec(x)).cast("double").as(s"s_$x")) ++
          cols.map(x => sum(dec(x) * dec(x)).cast("double").as(s"ss_$x")) ++
          pairs.map { case (x, y) =>
            sum(dec(x) * dec(y)).cast("double").as(s"sp_${x}_$y") }
      val m = Tables.lineitem(s, d).agg(aggs.head, aggs.tail: _*)
      val rows = pairs.map { case (x, y) =>
        m.select(lit(x).as("col_x"), lit(y).as("col_y"),
          ((col("n") * col(s"sp_${x}_$y") - col(s"s_$x") * col(s"s_$y")) /
            (sqrt(col("n") * col(s"ss_$x") - col(s"s_$x") * col(s"s_$x")) *
              sqrt(col("n") * col(s"ss_$y") - col(s"s_$y") * col(s"s_$y"))))
            .as("corr"))
      }
      rows.reduce(_.unionByName(_)).orderBy("col_x", "col_y")
    }
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) test, purchase vs click values —
    * the nonparametric companion to [[welch]]. The fixture's 2-decimal
    * values tie heavily, so ranks are computed on the COMPRESSED
    * distinct-value frame: per-value group counts (one aggregate over
    * the scan), a running cumulative count ordered by value (window
    * over |distinct values| rows, never the fact table), and average
    * ranks via the doubled integer 2*avgrank = 2*cumBefore + c + 1 — so
    * the rank sum is a pure BIGINT aggregate (order-independent), and
    * the z statistic (with the standard tie correction) is one fixed
    * scalar IEEE chain at the end. */
  val mannWhitney: Q = Q(
    "ext_stats_mannwhitney",
    """WITH vals AS (
      |  SELECT CAST(value AS DECIMAL(10,2)) AS v,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |pv AS (
      |  SELECT v, CAST(SUM(g1) AS BIGINT) AS c1,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM vals GROUP BY 1),
      |rk AS (
      |  SELECT c1, c,
      |    COALESCE(SUM(c) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      |  FROM pv),
      |agg AS (
      |  SELECT
      |    CAST(SUM(c1) AS BIGINT) AS n1,
      |    CAST(SUM(c - c1) AS BIGINT) AS n2,
      |    CAST(SUM(c1 * (2 * cb + c + 1)) AS BIGINT) AS r1x2,
      |    CAST(SUM(c * c * c - c) AS BIGINT) AS ties
      |  FROM rk)
      |SELECT n1, n2,
      |  CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2 AS u_stat,
      |  (CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2
      |    - CAST(n1 * n2 AS DOUBLE) / 2) /
      |  sqrt(CAST(n1 * n2 AS DOUBLE) / 12 *
      |    (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(ties AS DOUBLE) /
      |      (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))) AS z_stat
      |FROM agg""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val vals = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("value").cast("decimal(10,2)").as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("g1"))
    val pv = vals.groupBy("v")
      .agg(sum(col("g1")).as("c1"), count(lit(1)).as("c"))
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val rk = pv.withColumn("cb", coalesce(sum(col("c")).over(wCum), lit(0L)))
    val agg = rk.agg(
      sum(col("c1")).as("n1"),
      sum(col("c") - col("c1")).as("n2"),
      sum(col("c1") * (lit(2) * col("cb") + col("c") + 1)).as("r1x2"),
      sum(col("c") * col("c") * col("c") - col("c")).as("ties"))
    val u = (col("r1x2") - col("n1") * (col("n1") + 1)).cast("double") / 2
    val mu = (col("n1") * col("n2")).cast("double") / 2
    val n = col("n1") + col("n2")
    val variance = (col("n1") * col("n2")).cast("double") / 12 *
      ((n + 1).cast("double") -
        col("ties").cast("double") / (n.cast("double") * (n - 1)))
    agg.select(col("n1"), col("n2"), u.as("u_stat"),
      ((u - mu) / sqrt(variance)).as("z_stat"))
  }

  /** Interpolated percentiles (ANSI PERCENTILE_CONT p=0.5/0.9/0.99 of
    * event value per event_type) — the continuous companion to the
    * discrete `ext_value_quantiles`, same two-pass bucket-rank scale
    * shape: per-(type, value) counts compress the scan, cumulative
    * ranks run over the distinct-value frame (never a per-type global
    * sort), and each target h=(n-1)p resolves its two bracketing values
    * by a range probe of the compressed frame against 3 broadcast
    * target rows per type. The interpolation v_lo + frac·(v_hi - v_lo)
    * is a fixed IEEE chain over singly-cast decimals, mirrored verbatim
    * in the oracle (NOT DuckDB's quantile_cont — the explicit SQL runs
    * the identical arithmetic, so results hash-match bit-for-bit). */
  val percentileCont: Q = Q(
    "ext_value_percentile_cont",
    """WITH pv AS (
      |  SELECT event_type, CAST(value AS DECIMAL(10,2)) AS v,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |rk AS (
      |  SELECT event_type, v, c,
      |    COALESCE(SUM(c) OVER (PARTITION BY event_type ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
      |    SUM(c) OVER (PARTITION BY event_type ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
      |  FROM pv),
      |nn AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM pv
      |  GROUP BY 1),
      |tgt AS (
      |  SELECT event_type, n, p,
      |    CAST(n - 1 AS DOUBLE) * p AS h,
      |    CAST(floor(CAST(n - 1 AS DOUBLE) * p) AS BIGINT) AS ilo,
      |    LEAST(CAST(floor(CAST(n - 1 AS DOUBLE) * p) AS BIGINT) + 1,
      |      n - 1) AS ihi
      |  FROM nn CROSS JOIN (SELECT unnest([0.5, 0.9, 0.99]) AS p)),
      |vlo AS (
      |  SELECT t.event_type, t.p, t.h, t.ilo, t.ihi, r.v AS v_lo
      |  FROM tgt t JOIN rk r ON r.event_type = t.event_type
      |    AND t.ilo >= r.lo AND t.ilo < r.hi),
      |vhi AS (
      |  SELECT t.event_type, t.p, r.v AS v_hi
      |  FROM tgt t JOIN rk r ON r.event_type = t.event_type
      |    AND t.ihi >= r.lo AND t.ihi < r.hi)
      |SELECT l.event_type, l.p,
      |  CAST(l.v_lo AS DOUBLE) + (l.h - l.ilo) *
      |    (CAST(h2.v_hi AS DOUBLE) - CAST(l.v_lo AS DOUBLE)) AS pct
      |FROM vlo l JOIN vhi h2
      |  ON h2.event_type = l.event_type AND h2.p = l.p
      |ORDER BY l.event_type, l.p""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val pv = Tables.events(s, d)
      .groupBy(col("event_type"), col("value").cast("decimal(10,2)").as("v"))
      .agg(count(lit(1)).as("c"))
    val wPrev = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCur = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rk = pv
      .withColumn("lo", coalesce(sum(col("c")).over(wPrev), lit(0L)))
      .withColumn("hi", sum(col("c")).over(wCur))
    val nn = pv.groupBy("event_type").agg(sum(col("c")).as("n"))
    val h = (col("n") - 1).cast("double") * col("p")
    val ps = s.range(1)
      .select(explode(array(lit(0.5), lit(0.9), lit(0.99))).as("p"))
    val tgt = nn.crossJoin(broadcast(ps))
      .withColumn("h", h)
      .withColumn("ilo", floor(h).cast("long"))
      .withColumn("ihi", least(floor(h).cast("long") + 1, col("n") - 1))
    val vlo = rk.join(broadcast(tgt), Seq("event_type"))
      .filter(col("ilo") >= col("lo") && col("ilo") < col("hi"))
      .select(col("event_type"), col("p"), col("h"), col("ilo"),
        col("ihi"), col("v").as("v_lo"))
    val vhi = rk.join(broadcast(tgt.select("event_type", "p", "ihi")),
        Seq("event_type"))
      .filter(col("ihi") >= col("lo") && col("ihi") < col("hi"))
      .select(col("event_type"), col("p"), col("v").as("v_hi"))
    vlo.join(vhi, Seq("event_type", "p"))
      .select(col("event_type"), col("p"),
        (col("v_lo").cast("double") + (col("h") - col("ilo")) *
          (col("v_hi").cast("double") - col("v_lo").cast("double")))
          .as("pct"))
      .orderBy("event_type", "p")
  }

  /** q-digest sketched quantiles per event_type, audited against exact
    * ranks: the DETERMINISTIC-bound member of the quantile family
    * (exact two-pass, approx_percentile, interpolated — and now a
    * custom mergeable summary whose rank error <= (log2 U / k) n is a
    * worst-case theorem, so the oracle pins `within_bound` TRUE
    * unconditionally). Build is ONE mergeable aggregate
    * ([[graft.functions.QDigestAgg]]) — each partition ships O(k)
    * (node, count) longs, never values; the driver touches only the
    * per-type summary payloads (the sketch IS the broadcast-scale
    * artifact), and the bound audit is a second map-side-combined pass
    * over the compressed (type, cents) frame. */
  val qdigestQuantiles: Q = Q(
    "ext_value_qdigest",
    """WITH qs AS (SELECT unnest([0.5, 0.9]) AS q),
      |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1)
      |SELECT event_type, q, n, TRUE AS within_bound
      |FROM n CROSS JOIN qs ORDER BY event_type, q""".stripMargin
  ) { (s, d) =>
    import graft.functions.QDigest
    // domain guard at the CALLER (ADVICE round 9): the q-digest universe
    // is [0, 2^logU) and the aggregate's own require() would kill the
    // job mid-task with an unattributable message; failing here names
    // the op and the offending value before the sketch ever sees it
    val rawCents = (col("value").cast("decimal(10,2)") * 100).cast("long")
    val cents = when(
      rawCents >= 0L && rawCents < (1L << QDigest.DefaultLogU), rawCents)
      .otherwise(expr("cast(raise_error(concat('ext_value_qdigest: " +
        "event value out of the sketch universe [0, 2^" +
        s"${QDigest.DefaultLogU}) cents: ', cast(value as string))) " +
        "as bigint)"))
    val ev = Tables.events(s, d).select(col("event_type"), cents.as("c"))
    val sketches = ev.groupBy("event_type")
      .agg(QDigest.qdigest(s, col("c")).as("sk"))
      .collect()
      .map(r => r.getString(0) -> QDigest.flatOf(r.get(1)))
    import s.implicits._
    val targets = sketches.flatMap { case (t, flat) =>
      Seq(0.5, 0.9).map(q =>
        (t, q, QDigest.estimate(flat, q, QDigest.DefaultLogU)))
    }.toSeq.toDF("event_type", "q", "est")
    val pv = ev.groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("cnt"))
    val epsN = lit(QDigest.DefaultLogU.toDouble / QDigest.DefaultK) *
      col("n")
    val target = ceil(col("q") * col("n"))
    pv.join(broadcast(targets), Seq("event_type"))
      .groupBy(col("event_type"), col("q"))
      .agg(
        sum(when(col("c") < col("est"), col("cnt")).otherwise(0L))
          .as("lo"),
        sum(when(col("c") <= col("est"), col("cnt")).otherwise(0L))
          .as("hi"),
        sum(col("cnt")).as("n"))
      .select(col("event_type"), col("q"), col("n"),
        (greatest(lit(0.0),
          greatest(col("lo") + 1 - target, target - col("hi"))) <= epsN)
          .as("within_bound"))
      .orderBy("event_type", "q")
  }

  /** Kolmogorov-Smirnov two-sample test (purchase vs click values) with
    * the statistic kept EXACT: D = max |F1(v) - F2(v)| over the pooled
    * support equals max |c1(v)·n2 − c2(v)·n1| / (n1·n2), and the
    * numerator/denominator are pure BIGINTs — no doubles anywhere, no
    * rank windows over raw rows. The cumulative counts run over the
    * COMPRESSED distinct-value frame (the [[mannWhitney]] shape): values
    * aggregate to (value, c1, c2) first, one ordered window walks
    * |distinct values| rows, and the max is an integer aggregate. The
    * op emits D in exact ppm plus the raw fraction, and the classic
    * large-sample 5% rejection rule D >= 1.358·sqrt((n1+n2)/(n1·n2))
    * squared and cross-multiplied into the integer inequality
    * dnum² · 10⁶ >= 1358² · (n1+n2) · n1 · n2 — evaluated in
    * DECIMAL(38,0)/HUGEINT because dnum²·10⁶ exceeds i64 beyond the
    * fixture scale.
    */
  val ksTest: Q = Q(
    "ext_stats_ks",
    """WITH vals AS (
      |  SELECT CAST(value AS DECIMAL(10,2)) AS v,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c2
      |  FROM events WHERE event_type IN ('purchase', 'click')
      |  GROUP BY 1),
      |cum AS (
      |  SELECT v,
      |    SUM(c1) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
      |    SUM(c2) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2
      |  FROM vals),
      |tot AS (
      |  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
      |    CAST(SUM(c2) AS BIGINT) AS n2 FROM vals),
      |d AS (
      |  SELECT MAX(abs(CAST(f1 AS BIGINT) * n2
      |    - CAST(f2 AS BIGINT) * n1)) AS dnum
      |  FROM cum CROSS JOIN tot)
      |SELECT n1, n2, dnum AS d_num, n1 * n2 AS d_den,
      |  CAST(dnum * 1000000 // (n1 * n2) AS BIGINT) AS d_ppm,
      |  CAST(CASE WHEN dnum::HUGEINT * dnum * 1000000 >=
      |    1844164::HUGEINT * (n1 + n2) * n1 * n2 THEN 1 ELSE 0 END
      |    AS BIGINT) AS reject_5pct
      |FROM d CROSS JOIN tot""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val vals = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .groupBy(col("value").cast("decimal(10,2)").as("v"))
      .agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("c1"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("c2"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals
      .withColumn("f1", sum(col("c1")).over(w))
      .withColumn("f2", sum(col("c2")).over(w))
    val tot = vals.agg(sum(col("c1")).cast("long").as("n1"),
      sum(col("c2")).cast("long").as("n2"))
    val dnum = cum.crossJoin(broadcast(tot))
      .agg(max(abs(col("f1") * col("n2") - col("f2") * col("n1")))
        .cast("long").as("dnum"))
    dnum.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"), col("dnum").as("d_num"),
        (col("n1") * col("n2")).as("d_den"),
        expr("cast(dnum * 1000000 div (n1 * n2) as bigint)").as("d_ppm"),
        // the squared critical-value comparison exceeds i64 at 10x the
        // fixture (dnum^2 * 1e6 ~ 1.6e23): exact DECIMAL(38,0) on the
        // Spark side, HUGEINT in the oracle. Past n1*n2 ~ 1e16 even
        // DECIMAL(38,0) overflows — and non-ANSI Spark would then yield
        // NULL and silently report reject=0 while DuckDB errors. Guard
        // the bound LOUDLY so both engines fail the same way; a corpus
        // that big should use the asymptotic form, not exact integers.
        expr("cast(case when cast(n1 as decimal(38,0)) * n2 > " +
          "cast(10000000000000000 as decimal(38,0)) then " +
          "cast(raise_error('ks reject_5pct: n1*n2 > 1e16 overflows the " +
          "exact DECIMAL(38,0) critical-value comparison; use the " +
          "asymptotic form at this scale') as bigint) " +
          "when cast(dnum as decimal(38,0)) * dnum * 1000000" +
          " >= cast(1844164 as decimal(38,0)) * (n1 + n2) * n1 * n2 " +
          "then 1 else 0 end as bigint)").as("reject_5pct"))
  }

  /** Ordinary least squares: l_extendedprice regressed on (l_quantity,
    * l_discount) with intercept, solved in CLOSED FORM via the normal
    * equations over sufficient statistics — the distributed-regression
    * shape (one map-side-combined aggregate, no gradient loop, no
    * per-row residual pass): n plus nine exact-decimal sums (Σx₁, Σx₂,
    * Σy, Σx₁², Σx₂², Σx₁x₂, Σx₁y, Σx₂y, Σy²) reduce the fact table to
    * ONE row however the scan is partitioned; the 2×2 solve, R², and
    * coefficient standard errors are then fixed scalar IEEE chains over
    * singly-cast doubles — the same formula TEXT evaluates in both
    * engines (the `ext_stats_welch`/`ext_stats_corr` determinism
    * pattern), and the n-scaled centered cross-moments (cᵢⱼ = n·Σxᵢxⱼ −
    * Σxᵢ·Σxⱼ) keep the chain division-free until the final
    * coefficients. At 100 TB this is the ONLY sane OLS plan: the
    * shuffle carries ten numbers per partition, never a row. */
  val ols: Q = {
    def dec(x: String) = s"CAST($x AS DECIMAL(10,2))"
    def dsum(e: String, a: String) = s"CAST(SUM($e) AS DOUBLE) AS $a"
    val q = dec("l_quantity"); val d = dec("l_discount")
    val y = dec("l_extendedprice")
    val mSql =
      s"""SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${dsum(q, "s1")}, ${dsum(d, "s2")}, ${dsum(y, "sy")},
         |    ${dsum(s"$q * $q", "s11")}, ${dsum(s"$d * $d", "s22")},
         |    ${dsum(s"$q * $d", "s12")}, ${dsum(s"$q * $y", "s1y")},
         |    ${dsum(s"$d * $y", "s2y")}, ${dsum(s"$y * $y", "syy")}
         |  FROM lineitem""".stripMargin
    val cCols = Seq(
      "n", "s1", "s2", "sy",
      "n * s11 - s1 * s1 AS c11", "n * s22 - s2 * s2 AS c22",
      "n * s12 - s1 * s2 AS c12", "n * s1y - s1 * sy AS c1y",
      "n * s2y - s2 * sy AS c2y", "n * syy - sy * sy AS cyy",
      "(n * s11 - s1 * s1) * (n * s22 - s2 * s2) - " +
        "(n * s12 - s1 * s2) * (n * s12 - s1 * s2) AS det")
    val bCols = Seq(
      "n", "s1", "s2", "sy", "c11", "c22", "c1y", "c2y", "cyy", "det",
      "(c22 * c1y - c12 * c2y) / det AS b1",
      "(c11 * c2y - c12 * c1y) / det AS b2")
    val outCols = Seq(
      "CAST(n AS BIGINT) AS n_obs",
      "(sy - b1 * s1 - b2 * s2) / n AS b0", "b1", "b2",
      "(b1 * c1y + b2 * c2y) / cyy AS r2",
      "sqrt((cyy - b1 * c1y - b2 * c2y) / (n * (n - 3)) * n * c22 / det)" +
        " AS se_b1",
      "sqrt((cyy - b1 * c1y - b2 * c2y) / (n * (n - 3)) * n * c11 / det)" +
        " AS se_b2")
    Q(
      "ext_stats_ols",
      s"""WITH m AS ($mSql),
         |c AS (SELECT ${cCols.mkString(",\n  ")} FROM m),
         |b AS (SELECT ${bCols.mkString(",\n  ")} FROM c)
         |SELECT ${outCols.mkString(",\n  ")} FROM b""".stripMargin
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .agg(expr("CAST(COUNT(*) AS DOUBLE)").as("n"),
          expr(s"CAST(SUM($q) AS DOUBLE)").as("s1"),
          expr(s"CAST(SUM($d) AS DOUBLE)").as("s2"),
          expr(s"CAST(SUM($y) AS DOUBLE)").as("sy"),
          expr(s"CAST(SUM($q * $q) AS DOUBLE)").as("s11"),
          expr(s"CAST(SUM($d * $d) AS DOUBLE)").as("s22"),
          expr(s"CAST(SUM($q * $d) AS DOUBLE)").as("s12"),
          expr(s"CAST(SUM($q * $y) AS DOUBLE)").as("s1y"),
          expr(s"CAST(SUM($d * $y) AS DOUBLE)").as("s2y"),
          expr(s"CAST(SUM($y * $y) AS DOUBLE)").as("syy"))
        .selectExpr(cCols: _*)
        .selectExpr(bCols: _*)
        .selectExpr(outCols: _*)
    }
  }

  /** CUPED variance-reduced A/B comparison (Deng, Xu, Kohavi & Walker,
    * WSDM'13): the adjusted metric y' = y - theta (x - xbar) with x a
    * PRE-experiment covariate and theta = cov(x,y)/var(x) keeps the
    * treatment-effect estimate unbiased while shrinking its variance by
    * the squared correlation — the standard trick that makes experiment
    * readouts converge weeks faster. Here: users split 50/50 by md5
    * prefix (the `ext_split_assign` determinism convention), covariate =
    * a user's purchase revenue in the first half of the fixture window
    * (before 2024-01-16, a fixture constant like the split bounds), metric
    * = revenue in the second half.
    *
    * Cross-engine exactness (the [[ols]] discipline end to end): per-user
    * period sums reduce in exact DECIMAL; per-arm AND pooled sufficient
    * statistics (n, sums, squares, cross-products) stay DECIMAL — so every
    * reduction is order-independent — and are cast to DOUBLE once; theta,
    * means, and variances are then fixed scalar IEEE chains with identical
    * formula text in both engines.
    *
    * Scale shape: one map-side-combined aggregate to the per-user frame
    * (the natural experiment grain), one to the 2-arm sufficient-stats
    * frame, pooled stats by exact decimal addition over 2 rows; O(1)
    * scalar math after. No window, no collect.
    */
  val cuped: Q = {
    val adjCols = Seq(
      "arm", "n_users",
      "sy / n AS mean_y",
      "sy / n - theta * (sx / n - xbar) AS mean_adj",
      "(syy - sy * sy / n) / (n - 1) AS var_y",
      "(syy - sy * sy / n) / (n - 1) " +
        "- 2 * theta * ((sxy - sx * sy / n) / (n - 1)) " +
        "+ theta * theta * ((sxx - sx * sx / n) / (n - 1)) AS var_adj")
    Q(
      "ext_stats_cuped",
      s"""WITH u AS (
         |  SELECT user_id,
         |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
         |      THEN 'treat' ELSE 'control' END AS arm,
         |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
         |      THEN CAST(value AS DECIMAL(10,2)) ELSE 0 END)
         |      AS DECIMAL(14,2)) AS x,
         |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
         |      THEN CAST(value AS DECIMAL(10,2)) ELSE 0 END)
         |      AS DECIMAL(14,2)) AS y
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |a AS (
         |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
         |    SUM(x) AS dsx, SUM(y) AS dsy,
         |    SUM(x * x) AS dsxx, SUM(x * y) AS dsxy, SUM(y * y) AS dsyy
         |  FROM u GROUP BY 1),
         |p AS (
         |  SELECT CAST(SUM(n_users) AS DOUBLE) AS pn,
         |    CAST(SUM(dsx) AS DOUBLE) AS psx, CAST(SUM(dsy) AS DOUBLE) AS psy,
         |    CAST(SUM(dsxx) AS DOUBLE) AS psxx, CAST(SUM(dsxy) AS DOUBLE) AS psxy
         |  FROM a),
         |t AS (
         |  SELECT (pn * psxy - psx * psy) / (pn * psxx - psx * psx) AS theta,
         |    psx / pn AS xbar
         |  FROM p),
         |ad AS (
         |  SELECT arm, n_users, CAST(n_users AS DOUBLE) AS n,
         |    CAST(dsx AS DOUBLE) AS sx, CAST(dsy AS DOUBLE) AS sy,
         |    CAST(dsxx AS DOUBLE) AS sxx, CAST(dsxy AS DOUBLE) AS sxy,
         |    CAST(dsyy AS DOUBLE) AS syy, theta, xbar
         |  FROM a CROSS JOIN t)
         |SELECT ${adjCols.mkString(",\n  ")}
         |FROM ad ORDER BY arm""".stripMargin
    ) { (s, d) =>
      val dec = col("value").cast("decimal(10,2)")
      val pre = col("ts") < expr("TIMESTAMP '2024-01-16'")
      val u = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(
          sum(when(pre, dec).otherwise(lit(0))).cast("decimal(14,2)").as("x"),
          sum(when(!pre, dec).otherwise(lit(0))).cast("decimal(14,2)").as("y"))
        .withColumn("arm",
          when(substring(graft.functions.FastMd5.fast_md5(s,
            col("user_id").cast("string")), 1, 1) < "8", "treat")
            .otherwise("control"))
      val a = u.groupBy("arm")
        .agg(count(lit(1)).as("n_users"),
          sum(col("x")).as("dsx"), sum(col("y")).as("dsy"),
          sum(col("x") * col("x")).as("dsxx"),
          sum(col("x") * col("y")).as("dsxy"),
          sum(col("y") * col("y")).as("dsyy"))
      val p = a.agg(
        sum(col("n_users")).cast("double").as("pn"),
        sum(col("dsx")).cast("double").as("psx"),
        sum(col("dsy")).cast("double").as("psy"),
        sum(col("dsxx")).cast("double").as("psxx"),
        sum(col("dsxy")).cast("double").as("psxy"))
      val t = p.selectExpr(
        "(pn * psxy - psx * psy) / (pn * psxx - psx * psx) AS theta",
        "psx / pn AS xbar")
      a.crossJoin(broadcast(t))
        .selectExpr("arm", "n_users", "CAST(n_users AS DOUBLE) AS n",
          "CAST(dsx AS DOUBLE) AS sx", "CAST(dsy AS DOUBLE) AS sy",
          "CAST(dsxx AS DOUBLE) AS sxx", "CAST(dsxy AS DOUBLE) AS sxy",
          "CAST(dsyy AS DOUBLE) AS syy", "theta", "xbar")
        .selectExpr(adjCols: _*)
        .orderBy("arm")
    }
  }

  def all: Seq[Q] =
    Seq(chi2, welch, corr, mannWhitney, percentileCont, qdigestQuantiles,
      ksTest, ols, cuped)
}
