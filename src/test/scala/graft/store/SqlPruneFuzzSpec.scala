package graft.store

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Differential fuzz of the SQL front door's pruning stack: random
  * predicates over a store carrying every round-15 stat kind (id
  * ranges, Long/timestamp stats, null counts, deletion vectors, an
  * evolved column) must return EXACTLY what the Scala API's full-scan
  * filter returns. Pruning is only allowed to skip IO — a single
  * wrongly-skipped file shows up as missing rows here. Seeded; failures
  * print the predicate. */
class SqlPruneFuzzSpec extends SparkSuite {

  private val CatName = "gfuzz"

  private lazy val cat: Catalog = {
    val c = new Catalog(spark,
      Files.createTempDirectory("graft_sqlfuzz").toString)
    val sp = spark
    import sp.implicits._
    def slice(ids: Range, nullEvery: Int): DataFrame =
      ids.map(i => (i.toLong, new java.sql.Timestamp(i * 100000L),
        i.toLong % 7,
        s"t${i % 5}", i.toDouble / 3.0,
        if (nullEvery > 0 && i % nullEvery == 0) null else s"p$i"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    c.append("events_ingest", slice(1 to 40, 0), orderBy = Seq("event_id"))
    c.append("events_ingest", slice(41 to 80, 2), orderBy = Seq("event_id"))
    c.append("events_ingest", slice(81 to 120, 1), orderBy = Seq("event_id"))
    // merge-on-read churn: point update + stacked point deletes
    c.update("events_ingest", col("ingest_id") === 55L,
      Map("value" -> lit(-9.5), "props" -> lit("patched")))
    c.delete("events_ingest", col("ingest_id") === 7L)
    c.delete("events_ingest", col("ingest_id") === 90L)
    // schema evolution: quality exists only on the last slice
    c.transaction { tx =>
      tx.addColumn("events_ingest", org.apache.spark.sql.types.StructField(
        "quality", org.apache.spark.sql.types.IntegerType, nullable = true))
    }
    c.append("events_ingest",
      slice(121 to 160, 3).withColumn("quality",
        when(col("event_id") % 4 === 0, lit(null))
          .otherwise(pmod(col("event_id"), lit(13)).cast("int"))),
      orderBy = Seq("event_id"))
    spark.conf.set(s"spark.sql.catalog.$CatName",
      classOf[graft.store.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$CatName.root", c.root)
    c
  }

  test("random predicates: SQL-door results equal the Scala full-scan " +
    "filter exactly (id/ts windows, IN lists, null probes, DV-masked " +
    "files, the evolved column)") {
    val rnd = new Random(
      sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong + 15).getOrElse(1515151L))
    val maxId = cat.maxId("events_ingest")
    def idBound() = 1 + rnd.nextInt(maxId.toInt + 10)
    def tsLit(i: Int) =
      s"TIMESTAMP'${new java.sql.Timestamp(i * 100000L)}'"
    def predicate(): String = {
      val atoms = Vector(
        () => { val a = idBound(); val b = idBound()
          s"ingest_id BETWEEN ${math.min(a, b)} AND ${math.max(a, b)}" },
        () => s"ingest_id = ${idBound()}",
        () => s"ingest_id >= ${idBound()}",
        () => s"ingest_id < ${idBound()}",
        () => s"ingest_id IN (${Seq.fill(3)(idBound()).mkString(", ")})",
        () => { val a = idBound(); s"ts >= ${tsLit(a)}" },
        () => { val a = idBound(); val b = idBound()
          s"ts BETWEEN ${tsLit(math.min(a, b))} AND ${tsLit(math.max(a, b))}" },
        () => "props IS NULL",
        () => "props IS NOT NULL",
        () => "quality IS NULL",
        () => "quality IS NOT NULL",
        () => s"event_type = 't${rnd.nextInt(6)}'",
        () => s"event_type IN ('t1', 't${rnd.nextInt(6)}')",
        () => s"value > ${rnd.nextInt(40)}")
      val n = 1 + rnd.nextInt(3)
      val parts = Seq.fill(n)(atoms(rnd.nextInt(atoms.size))())
      val op = if (rnd.nextInt(4) == 0) " OR " else " AND "
      parts.mkString(op)
    }
    (1 to 40).foreach { i =>
      val p = predicate()
      val viaSql = spark.sql(
        s"SELECT * FROM $CatName.events_ingest WHERE $p")
        .collect().map(_.toString).sorted.toSeq
      val viaScan = cat.read("events_ingest").filter(expr(p))
        .collect().map(_.toString).sorted.toSeq
      assert(viaSql == viaScan,
        s"fuzz #$i diverged on predicate: $p\n" +
          s"sql-only=${(viaSql.toSet -- viaScan).take(3)}\n" +
          s"scan-only=${(viaScan.toSet -- viaSql).take(3)}")
    }
    // and once with no predicate at all (pure masked scan)
    assert(spark.sql(s"SELECT * FROM $CatName.events_ingest").count()
      == cat.read("events_ingest").count())
  }

  private val RenCatName = "gfuzzren"

  /** A store whose live files span THREE rename epochs (k -> key on a
    * Long stats column, tag -> label on a String one), with DV churn,
    * schema evolution, and genuine NULLs — the round-17 coalescing-scan
    * surface. Old files carry stats under their prior names; the SQL
    * door must prune by them and evaluate renamed-column predicates
    * against coalesced values, never against parquet's by-name NULLs. */
  private lazy val renCat: Catalog = {
    val c = new Catalog(spark,
      Files.createTempDirectory("graft_sqlfuzz_ren").toString)
    import org.apache.spark.sql.types._
    c.createTable("m", StructType(Seq(
      StructField("m_id", LongType, nullable = false),
      StructField("k", LongType),
      StructField("tag", StringType),
      StructField("v", DoubleType))), "m_id",
      statsColumns = Seq("k", "tag"))
    val sp = spark
    import sp.implicits._
    def slice(ids: Range, keyName: String, tagName: String,
        nullEvery: Int): DataFrame =
      ids.map(i => (i.toLong,
        if (nullEvery > 0 && i % nullEvery == 0) null
        else s"t${i % 5}", i.toDouble / 3.0))
        .toDF(keyName, tagName, "v")
        .select(col(keyName), col(tagName), col("v"))
    c.append("m", slice(1 to 40, "k", "tag", 0), orderBy = Seq("k"))
    c.append("m", slice(41 to 80, "k", "tag", 2), orderBy = Seq("k"))
    c.renameColumn("m", "k", "key") // epoch 2: files still carry 'k'
    c.append("m", slice(81 to 120, "key", "tag", 3), orderBy = Seq("key"))
    // merge-on-read churn across epochs, keyed by the RENAMED column
    c.update("m", col("m_id") === 55L, Map("v" -> lit(-9.5)))
    c.delete("m", col("m_id") === 7L)
    c.renameColumn("m", "tag", "label") // epoch 3: string column renames
    c.append("m", slice(121 to 160, "key", "label", 4),
      orderBy = Seq("key"))
    c.transaction { tx =>
      tx.addColumn("m", org.apache.spark.sql.types.StructField(
        "quality", org.apache.spark.sql.types.IntegerType,
        nullable = true))
    }
    c.append("m", slice(161 to 200, "key", "label", 0)
      .withColumn("quality",
        when(col("key") % 4 === 0, lit(null))
          .otherwise(pmod(col("key"), lit(13)).cast("int"))),
      orderBy = Seq("key"))
    spark.conf.set(s"spark.sql.catalog.$RenCatName",
      classOf[graft.store.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$RenCatName.root", c.root)
    c
  }

  test("random predicates across RENAME epochs: SQL-door results equal " +
    "the Scala coalescing read exactly — prior-name stats prune, " +
    "renamed-column filters stay residual, DV masks and the evolved " +
    "column compose, genuine NULLs survive") {
    val rnd = new Random(
      sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong + 17).getOrElse(171717L))
    renCat.version // force the lazy fixture (registers the catalog)
    def kBound() = 1 + rnd.nextInt(210)
    def predicate(): String = {
      val atoms = Vector(
        () => { val a = kBound(); val b = kBound()
          s"key BETWEEN ${math.min(a, b)} AND ${math.max(a, b)}" },
        () => s"key = ${kBound()}",
        () => s"key >= ${kBound()}",
        () => s"key < ${kBound()}",
        () => s"key IN (${Seq.fill(3)(kBound()).mkString(", ")})",
        () => s"label = 't${rnd.nextInt(6)}'",
        () => s"label IN ('t1', 't${rnd.nextInt(6)}')",
        () => "label IS NULL",
        () => "label IS NOT NULL",
        () => "quality IS NULL",
        () => "quality IS NOT NULL",
        () => s"m_id <= ${kBound()}",
        () => s"v > ${rnd.nextInt(60)}")
      val n = 1 + rnd.nextInt(3)
      val parts = Seq.fill(n)(atoms(rnd.nextInt(atoms.size))())
      val op = if (rnd.nextInt(4) == 0) " OR " else " AND "
      parts.mkString(op)
    }
    (1 to 40).foreach { i =>
      val p = predicate()
      val viaSql = spark.sql(s"SELECT * FROM $RenCatName.m WHERE $p")
        .collect().map(_.toString).sorted.toSeq
      val viaScan = renCat.read("m").filter(expr(p))
        .collect().map(_.toString).sorted.toSeq
      assert(viaSql == viaScan,
        s"rename fuzz #$i diverged on predicate: $p\n" +
          s"sql-only=${(viaSql.toSet -- viaScan).take(3)}\n" +
          s"scan-only=${(viaScan.toSet -- viaSql).take(3)}")
    }
    // full scan + projections that include/exclude the renamed columns
    assert(spark.sql(s"SELECT * FROM $RenCatName.m").count()
      == renCat.read("m").count())
    assert(spark.sql(s"SELECT key FROM $RenCatName.m").count() == 199)
    assert(spark.sql(
      s"SELECT sum(key) AS s FROM $RenCatName.m").collect()(0).getLong(0)
      == renCat.read("m").agg(sum(col("key"))).collect()(0).getLong(0))
    // after compaction migrates the layout, answers are unchanged and
    // the fast path serves (no prior-name twins left)
    val before = spark.sql(s"SELECT * FROM $RenCatName.m")
      .collect().map(_.toString).sorted.toSeq
    renCat.compact("m")
    val after = spark.sql(s"SELECT * FROM $RenCatName.m")
      .collect().map(_.toString).sorted.toSeq
    assert(before == after, "compaction changed the served rows")
  }
}
