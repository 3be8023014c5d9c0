package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** `OPTIMIZE` / `VACUUM` as SQL statements
  * ([[graft.store.sql.GraftSqlParser]]): the delegating parser must
  * route exactly those two shapes into the engine's maintenance ops —
  * content invariant, layout changed, retention honored — and leave
  * every other statement (and unknown catalogs) untouched/loud. */
class MaintenanceSqlSpec extends SparkSuite {

  private var n = 0

  private def fresh(): (Catalog, String) = {
    n += 1
    val dir = Files.createTempDirectory(s"graft-maint$n").toString
    val catName = s"gmnt$n"
    spark.conf.set(s"spark.sql.catalog.$catName",
      classOf[graft.store.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.root", dir)
    val cat = new Catalog(spark, dir)
    val src = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    (1 to 4).foreach { i =>
      cat.append("orders_ingest",
        src.filter(col("o_orderkey") > (i - 1) * 300 &&
          col("o_orderkey") <= i * 300),
        orderBy = Seq("o_orderkey"))
    }
    (cat, catName)
  }

  private def nFiles(cat: Catalog): Int =
    cat.sqlSnapshot("orders_ingest", None).get._1.size

  private def content(cat: Catalog): Seq[String] =
    cat.read("orders_ingest").orderBy("ingest_id")
      .collect().map(_.toString).toSeq

  test("OPTIMIZE compacts (INTO n FILES), OPTIMIZE ZORDER BY clusters, " +
    "both content-invariant; VACUUM RETAIN 0 HOURS reclaims the " +
    "pre-rewrite files and reports the count") {
    val (cat, c) = fresh()
    val before = content(cat)
    assert(nFiles(cat) >= 4)
    spark.sql(s"OPTIMIZE $c.orders_ingest INTO 2 FILES")
    assert(nFiles(cat) == 2)
    assert(content(cat) == before)
    spark.sql(s"OPTIMIZE $c.orders_ingest ZORDER BY " +
      "(o_orderkey, o_custkey) INTO 4 FILES")
    assert(nFiles(cat) == 4)
    assert(content(cat) == before)
    val snap = cat.sqlSnapshot("orders_ingest", None).get._1
    assert(snap.forall(_.cols.contains("o_custkey")),
      "z-ordered files missing cluster-column stats")
    val reclaimed = spark.sql(s"VACUUM $c.orders_ingest RETAIN 0 HOURS")
      .collect()(0).getInt(0)
    assert(reclaimed > 0, "vacuum reclaimed nothing after two rewrites")
    assert(content(cat) == before, "vacuum touched live data")
  }

  test("OPTIMIZE ... SMALL FILES folds only sub-threshold files, " +
    "reports the fold count (0 on re-run — scheduler-safe), honors " +
    "clause defaults, and rejects contradictory shapes loudly") {
    val (cat, c) = fresh()
    val src = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    (1 to 3).foreach { i =>
      cat.append("orders_ingest",
        src.filter(col("o_orderkey") === 1200 + i),
        orderBy = Seq("o_orderkey"))
    }
    val before = content(cat)
    val filesBefore = nFiles(cat)
    assert(filesBefore >= 7)
    val folded = spark.sql(s"OPTIMIZE $c.orders_ingest SMALL FILES " +
      "BELOW 100 ROWS TARGET 300 ROWS").collect()(0).getInt(0)
    assert(folded == 3, s"expected the 3 one-row files folded: $folded")
    assert(nFiles(cat) == filesBefore - 2, // 3 folded into 1 bin
      s"files: $filesBefore -> ${nFiles(cat)}")
    assert(content(cat) == before, "selective fold changed content")
    // idempotent re-run: nothing small remains below 100 rows
    assert(spark.sql(s"OPTIMIZE $c.orders_ingest SMALL FILES " +
      "BELOW 100 ROWS TARGET 300 ROWS").collect()(0).getInt(0) == 0)
    // engine defaults (BELOW 100000 ROWS): every remaining file is
    // sub-threshold at this fixture scale — one bin results
    assert(spark.sql(s"OPTIMIZE $c.orders_ingest SMALL FILES")
      .collect()(0).getInt(0) == filesBefore - 2)
    assert(nFiles(cat) == 1)
    assert(content(cat) == before, "default fold changed content")
    // contradictions are loud, with pointed routes
    assert(intercept[Exception] {
      spark.sql(s"OPTIMIZE $c.orders_ingest ZORDER BY (o_orderkey) " +
        "SMALL FILES")
    }.getMessage.contains("separate statements"))
    assert(intercept[Exception] {
      spark.sql(s"OPTIMIZE $c.orders_ingest SMALL FILES INTO 2 FILES")
    }.getMessage.contains("TARGET n ROWS"))
  }

  test("only OUR catalogs' maintenance shapes are intercepted: ordinary " +
    "SQL and foreign/unknown catalogs go to the delegate, and a " +
    "no-stats ZORDER column keeps the engine's loud error") {
    val (_, c) = fresh()
    // delegate statements still work (incl. ones CONTAINING keywords)
    assert(spark.sql("SELECT 'OPTIMIZE x.y' AS s").collect()(0)
      .getString(0) == "OPTIMIZE x.y")
    // an UNREGISTERED catalog name is not ours to claim: the statement
    // falls through to the delegate chain (where a coexisting
    // extension, e.g. Delta, would see it) and dies as a plain Spark
    // parse error — NOT our "register the store" execution error
    val e1 = intercept[Exception] {
      spark.sql("OPTIMIZE nosuchcat.t")
    }
    assert(!e1.getMessage.contains("register the store"), e1.getMessage)
    // same for a catalog registered to a DIFFERENT implementation —
    // its OPTIMIZE belongs to that extension's parser, never hijacked
    spark.conf.set("spark.sql.catalog.foreigncat",
      "org.example.SomeOtherCatalog")
    try {
      val ef = intercept[Exception] { spark.sql("OPTIMIZE foreigncat.t") }
      assert(!ef.getMessage.contains("register the store"), ef.getMessage)
      assert(!ef.getMessage.contains("graft"), ef.getMessage)
    } finally spark.conf.unset("spark.sql.catalog.foreigncat")
    val e2 = intercept[Exception] {
      spark.sql(s"OPTIMIZE $c.orders_ingest ZORDER BY (o_orderstatus)")
    }
    assert(e2.getMessage.contains("no file stats"), e2.getMessage)
    val e3 = intercept[Exception] { spark.sql("VACUUM lone_name") }
    assert(e3 != null) // one-part names go to the delegate -> parse error
  }
}
