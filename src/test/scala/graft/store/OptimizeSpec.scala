package graft.store

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, FileScan}
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** `Catalog.optimize` (clustered Z-order compaction) — the layout
  * claims the invariance gate row cannot see: per-file stats tight on
  * BOTH cluster dimensions, file skipping on 2-D boxes through the SQL
  * door, deletion vectors folded, ids preserved, and the loud
  * preconditions. */
class OptimizeSpec extends SparkSuite {

  private var n = 0

  /** Fresh root: one append of the orders slice, point-update DV on
    * id 77, id-clustered 8-file compact (the baseline layout). */
  private def freshRoot(): (String, String, Catalog) = {
    n += 1
    val catName = s"gopt$n"
    val dir = Files.createTempDirectory(s"graft-opt$n").toString
    val cat = new Catalog(spark, dir)
    val src = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    // six range-appends = six files, each an o_orderkey range with the
    // FULL o_custkey span — the id/orderkey-clustered baseline layout
    (1 to 6).foreach { i =>
      cat.append("orders_ingest",
        src.filter(col("o_orderkey") > (i - 1) * 200 &&
          col("o_orderkey") <= i * 200),
        orderBy = Seq("o_orderkey"))
    }
    cat.update("orders_ingest", col("ingest_id") === 77L,
      Map("o_orderstatus" -> lit("X")))
    spark.conf.set(s"spark.sql.catalog.$catName",
      classOf[graft.store.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.root", dir)
    (dir, catName, cat)
  }

  private def deepCollect[T](p: SparkPlan)(
      f: PartialFunction[SparkPlan, T]): Seq[T] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    f.lift(p).toSeq ++ kids.flatMap(deepCollect(_)(f))
  }

  private def filesRead(df: DataFrame): Int = {
    df.collect()
    deepCollect(df.queryExecution.executedPlan) {
      case b: BatchScanExec => b.scan
    }.map {
      case dv: graft.store.sql.DvMaskedScan => dv.inner
      case s => s
    }.collect { case fs: FileScan => fs.fileIndex.inputFiles.length }.sum
  }

  // the 2-D probe: every orderkey, a narrow custkey window — the shape
  // a single-key (id/orderkey) clustering cannot prune
  private def boxSql(c: String): String =
    s"SELECT COUNT(*) AS n, CAST(SUM(o_totalprice) AS DOUBLE) AS s " +
      s"FROM $c.orders_ingest WHERE o_custkey BETWEEN 10 AND 19"

  test("content is invariant (ids included), deletion vectors fold " +
    "away, and the update survives with its patch image exactly once") {
    val (_, _, cat) = freshRoot()
    val before = cat.read("orders_ingest").orderBy("ingest_id")
      .collect().map(_.toString).toSeq
    cat.optimize("orders_ingest", Seq("o_orderkey", "o_custkey"),
      numFiles = 8)
    val after = cat.read("orders_ingest").orderBy("ingest_id")
      .collect().map(_.toString).toSeq
    assert(after == before, "optimize changed table content")
    assert(after.count(_.contains(",X,")) == 1)
    val snap = cat.sqlSnapshot("orders_ingest", None).get._1
    assert(snap.forall(_.dv.isEmpty),
      "optimize left deletion vectors in the manifest")
  }

  test("after optimize on (o_orderkey, o_custkey), a custkey-window " +
    "box prunes files the id-clustered layout cannot, with identical " +
    "results") {
    val (_, c, cat) = freshRoot()
    val total = cat.sqlSnapshot("orders_ingest", None).get._1.size
    val beforeFiles = filesRead(spark.sql(boxSql(c)))
    val beforeRows = spark.sql(boxSql(c)).collect()(0).toString
    // the 1-row DV patch file's point custkey window may legitimately
    // prune; the six RANGE files (full custkey span each) cannot
    assert(beforeFiles >= total - 1,
      s"id-clustered layout unexpectedly pruned the custkey box " +
        s"($beforeFiles of $total)")
    cat.optimize("orders_ingest", Seq("o_orderkey", "o_custkey"),
      numFiles = 8)
    val totalOpt = cat.sqlSnapshot("orders_ingest", None).get._1.size
    val afterFiles = filesRead(spark.sql(boxSql(c)))
    assert(afterFiles < totalOpt,
      s"z-ordered layout pruned nothing ($afterFiles of $totalOpt)")
    assert(spark.sql(boxSql(c)).collect()(0).toString == beforeRows,
      "pruning changed results")
  }

  test("single-column optimize clusters the merge key: a key-window " +
    "readRange reads a strict subset of files") {
    val (_, _, cat) = freshRoot()
    cat.optimize("orders_ingest", Seq("o_custkey"), numFiles = 8)
    val snap = cat.sqlSnapshot("orders_ingest", None).get._1
    // stats windows on the cluster column must be near-disjoint: each
    // file's custkey window should cover a fraction of the domain
    val windows = snap.flatMap(_.cols.get("o_custkey"))
    assert(windows.size == snap.size, "missing custkey stats")
    val domain = (windows.map(_._1).min, windows.map(_._2).max)
    val avgSpan = windows.map(w => w._2 - w._1).sum.toDouble / windows.size
    assert(avgSpan < (domain._2 - domain._1) / 2.0,
      s"cluster windows not tight: avg $avgSpan over $domain")
    assert(cat.readRange("orders_ingest", "o_custkey",
      domain._1, domain._1).count() > 0)
  }

  test("preconditions fail loudly: unknown column, the surrogate id, " +
    "a column without file stats, >2 columns") {
    val (_, _, cat) = freshRoot()
    def msg(body: => Unit): String =
      intercept[Exception](body).getMessage
    assert(msg(cat.optimize("orders_ingest", Seq("nope")))
      .contains("no column"))
    assert(msg(cat.optimize("orders_ingest", Seq("ingest_id")))
      .contains("compact"))
    assert(msg(cat.optimize("orders_ingest", Seq("o_orderstatus")))
      .contains("no file stats"))
    assert(msg(cat.optimize("orders_ingest",
      Seq("o_orderkey", "o_custkey", "o_orderkey")))
      .contains("one or two"))
  }

  test("optimize is OCC-safe against a concurrent append: both land, " +
    "no row lost (conflict-retried like compact)") {
    val (dir, _, cat) = freshRoot()
    val nBefore = cat.read("orders_ingest").count()
    val extra = graft.core.Tables.orders(spark, sf)
      .filter(col("o_orderkey") > 1200 && col("o_orderkey") <= 1300)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    val other = new Catalog(spark, dir)
    val t = new Thread(() =>
      cat.optimize("orders_ingest", Seq("o_orderkey", "o_custkey"), 8))
    t.start()
    other.append("orders_ingest", extra, orderBy = Seq("o_orderkey"))
    t.join()
    val got = cat.read("orders_ingest").count()
    assert(got == nBefore + extra.count(),
      s"rows lost under concurrent optimize+append: $got")
  }
}
