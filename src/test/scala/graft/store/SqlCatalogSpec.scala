package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, FileScan}
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The DSv2 SQL front door ([[graft.store.sql.GraftTableCatalog]]):
  * pure `spark.sql` text must reach the store with the Scala API's exact
  * semantics — current reads, `VERSION AS OF` / `TIMESTAMP AS OF`
  * equal to [[Catalog.readAt]]/[[Catalog.readAsOf]], manifest-stats
  * file pruning visible in the physical scan's file list, parquet
  * `PushedFilters`/`ReadSchema` intact through the wrapper, and the
  * read-only contract failing loudly for DML. */
class SqlCatalogSpec extends SparkSuite {

  private val CatName = "gspec"

  private lazy val root: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlspec")
      .toString
    val cat = new Catalog(spark, root = dir)
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    // three appends with DISJOINT dense-id ranges (ids continue from the
    // high-water mark), so id predicates can prove whole files dead
    cat.append("events_ingest", ev.filter(col("event_id") <= 100),
      orderBy = Seq("event_id"))
    cat.append("events_ingest",
      ev.filter(col("event_id") > 100 && col("event_id") <= 200),
      orderBy = Seq("event_id"))
    cat.append("events_ingest",
      ev.filter(col("event_id") > 200 && col("event_id") <= 300),
      orderBy = Seq("event_id"))
    spark.conf.set(s"spark.sql.catalog.$CatName",
      classOf[graft.store.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$CatName.root", dir)
    dir
  }

  private def cat = new Catalog(spark, root)

  /** Force the staging + catalog registration before any SQL text. */
  private def sqlq(q: String): DataFrame = { root; spark.sql(q) }

  private def sorted(df: DataFrame): Seq[String] =
    df.orderBy("ingest_id").collect().map(_.toString).toSeq

  private def deepCollect[T](p: SparkPlan)(
      f: PartialFunction[SparkPlan, T]): Seq[T] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    f.lift(p).toSeq ++ kids.flatMap(deepCollect(_)(f))
  }

  private def scannedFiles(df: DataFrame): Seq[String] =
    deepCollect(df.queryExecution.executedPlan) {
      case b: BatchScanExec => b.scan
    }.collect { case fs: FileScan => fs.fileIndex.inputFiles.toSeq }.flatten

  test("pure SQL SELECT equals Catalog.read") {
    val viaSql = sqlq(s"SELECT * FROM $CatName.events_ingest")
    assert(sorted(viaSql) == sorted(cat.read("events_ingest")))
    assert(viaSql.count() == cat.read("events_ingest").count())
  }

  test("VERSION AS OF equals readAt — including a version that is NOT " +
    "current — and an unknown version fails loudly") {
    val v1sql = sqlq(
      s"SELECT * FROM $CatName.events_ingest VERSION AS OF 1")
    assert(sorted(v1sql) == sorted(cat.readAt("events_ingest", 1L)))
    assert(v1sql.count() < cat.read("events_ingest").count())
    val e = intercept[Exception] {
      sqlq(s"SELECT * FROM $CatName.events_ingest VERSION AS OF 99")
        .collect()
    }
    assert(e.getMessage.contains("not available"), e.getMessage)
  }

  test("TIMESTAMP AS OF resolves through versionAsOf (a future instant " +
    "reads the current snapshot; a pre-store instant fails loudly)") {
    val now = sqlq(
      s"SELECT * FROM $CatName.events_ingest TIMESTAMP AS OF '2099-01-01'")
    assert(sorted(now) == sorted(cat.read("events_ingest")))
    val e = intercept[Exception] {
      sqlq(
        s"SELECT * FROM $CatName.events_ingest TIMESTAMP AS OF '1990-01-01'")
        .collect()
    }
    assert(e.getMessage.contains("no snapshot"), e.getMessage)
  }

  test("an id predicate prunes provably-dead files OUT OF THE SCAN " +
    "(manifest stats, not parquet footers) and results stay exact") {
    val total = cat.liveFiles("events_ingest").size
    assert(total >= 3, s"fixture staged $total files; need >= 3 appends")
    val q = sqlq(s"SELECT ingest_id, event_type " +
      s"FROM $CatName.events_ingest WHERE ingest_id <= 50")
    val expected = cat.read("events_ingest")
      .filter(col("ingest_id") <= 50).select("ingest_id", "event_type")
    assert(sorted(q) == sorted(expected))
    val scanned = scannedFiles(q)
    assert(scanned.nonEmpty && scanned.size < total,
      s"expected a pruned scan (< $total files), got ${scanned.size}")
    // exactly the files whose id range can hold ingest_id <= 50
    val expectedFiles = cat.liveFiles("events_ingest")
      .filter(_._2 <= 50).map(_._1).toSet
    assert(scanned.map(p => p.substring(p.indexOf("events_ingest"))).toSet
      == expectedFiles)
  }

  test("parquet pushdown and column pruning survive the wrapper: " +
    "PushedFilters carries the predicate, ReadSchema only the projection") {
    val q = sqlq(s"SELECT event_type FROM $CatName.events_ingest " +
      s"WHERE ingest_id = 7")
    assert(q.collect().length == 1)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.replaceAll("\\s", "").contains("EqualTo(ingest_id,7)"),
      s"parquet pushdown lost:\n$plan")
    val read = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("ingest_id") && read.contains("event_type") &&
      !read.contains("props"), s"projection not pruned: $read")
  }

  test("out-of-contract DDL through SQL fails loudly (registry-table " +
    "DROP, RENAME); INSERT INTO routes through the transactional " +
    "append (dense ids, NULL-id contract enforced)") {
    // round 15: CREATE/DROP/ALTER are supported for DYNAMIC tables
    // (StoreDdlSpec); round 16 added RENAME COLUMN (RenameColumnSpec).
    // What stays loud is the shapes the engine cannot honor — dropping
    // a registry table (identity lives in code, it would respawn) and
    // RENAME TABLE (the manifest key IS the identity)
    Seq(
      s"DROP TABLE $CatName.events_ingest",
      s"ALTER TABLE $CatName.events_ingest RENAME TO events2")
      .foreach { stmt =>
        val e = intercept[Throwable] { sqlq(stmt).collect() }
        def chain(t: Throwable): Seq[Throwable] =
          if (t == null) Nil else t +: chain(t.getCause)
        assert(chain(e).exists(c =>
            Option(c.getMessage).exists(m => m.contains("registry") ||
              m.toLowerCase.contains("not supported")) ||
            c.isInstanceOf[UnsupportedOperationException]),
          s"$stmt -> ${e.getMessage}")
      }
    // INSERT INTO: a NULL surrogate id lands through Catalog.append —
    // the engine assigns the next dense id and the row is readable via
    // both doors
    val before = cat.maxId("events_ingest")
    sqlq(s"INSERT INTO $CatName.events_ingest VALUES " +
      "(NULL, 999001, TIMESTAMP'2020-01-01', 7, 'sqlins', 1.5, 'p')")
    assert(cat.maxId("events_ingest") == before + 1)
    val got = sqlq(s"SELECT ingest_id, event_type FROM " +
      s"$CatName.events_ingest WHERE event_id = 999001").collect()
    assert(got.length == 1 && got(0).getLong(0) == before + 1 &&
      got(0).getString(1) == "sqlins")
    // a caller-supplied id fails loudly (ids are engine-assigned)
    val e2 = intercept[Throwable] {
      sqlq(s"INSERT INTO $CatName.events_ingest VALUES " +
        "(123456, 999002, TIMESTAMP'2020-01-01', 7, 'x', 1.0, 'p')")
    }
    def chain2(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain2(t.getCause)
    assert(chain2(e2).exists(c => Option(c.getMessage)
        .exists(_.contains("engine-assigned"))), e2.getMessage)
  }

  test("SHOW TABLES lists manifest tables plus registered-but-empty " +
    "ones; an unknown table is a clean not-found") {
    val names = sqlq(s"SHOW TABLES IN $CatName")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(names.contains("events_ingest") && names.contains("users"))
    val e = intercept[Exception] {
      sqlq(s"SELECT * FROM $CatName.no_such_table").collect()
    }
    assert(e.getMessage.toLowerCase.contains("not"), e.getMessage)
  }
}
