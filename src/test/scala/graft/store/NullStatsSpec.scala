package graft.store

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Per-file null-count stats (round 15): every staged file records its
  * physical row count and one null count per column-it-was-staged-with,
  * so `IS NULL` probes skip files that never saw a null and
  * `IS NOT NULL` probes skip all-null files — the J3 left-join-probe
  * shape pruned at the manifest. Pins the keep rule as a pure unit, the
  * files-read behavior on both the Scala and SQL read paths, the
  * schema-evolution guard (a column the file predates never prunes),
  * and fsck's witness of the claims. */
class NullStatsSpec extends SparkSuite {

  private def freshCat(): Catalog =
    new Catalog(spark, Files.createTempDirectory("graft_nulls").toString)

  /** events rows with a controlled `props` null pattern. */
  private def ev(ids: Range, props: Long => Option[String]): DataFrame = {
    val sp = spark
    import sp.implicits._
    ids.map(i => (i.toLong, new java.sql.Timestamp(i * 1000L), i.toLong,
      "view", i.toDouble, props(i.toLong).orNull))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("nullProbeKeeps: zero-null files skip IS NULL, all-null files " +
    "skip IS NOT NULL, absent stats and unknown row counts always keep") {
    // (rows, nullCount) cases
    assert(!Catalog.nullProbeKeeps(10L, Some(0L), isNull = true))
    assert(Catalog.nullProbeKeeps(10L, Some(1L), isNull = true))
    assert(Catalog.nullProbeKeeps(10L, Some(10L), isNull = true))
    assert(!Catalog.nullProbeKeeps(10L, Some(10L), isNull = false))
    assert(Catalog.nullProbeKeeps(10L, Some(9L), isNull = false))
    assert(Catalog.nullProbeKeeps(10L, Some(0L), isNull = false))
    // absent stat: keep both ways
    assert(Catalog.nullProbeKeeps(10L, None, isNull = true))
    assert(Catalog.nullProbeKeeps(10L, None, isNull = false))
    // legacy file (rows unknown): an all-null claim cannot be proven
    assert(Catalog.nullProbeKeeps(-1L, Some(5L), isNull = false))
    assert(!Catalog.nullProbeKeeps(-1L, Some(0L), isNull = true),
      "zero nulls is provable without a row count")
  }

  test("IS NULL / IS NOT NULL probes open only the provably-relevant " +
    "files, and results equal the full-scan filter") {
    val cat = freshCat()
    cat.append("events_ingest", ev(1 to 10, _ => Some("p")),
      orderBy = Seq("event_id"))                      // file A: no nulls
    cat.append("events_ingest", ev(11 to 20, _ => None),
      orderBy = Seq("event_id"))                      // file B: all null
    cat.append("events_ingest",
      ev(21 to 30, i => if (i % 2 == 0) None else Some("p")),
      orderBy = Seq("event_id"))                      // file C: mixed
    assert(cat.liveFiles("events_ingest").size == 3)
    val (nullFiles, total) =
      cat.nullProbeFiles("events_ingest", "props", isNull = true)
    assert(total == 3 && nullFiles.size == 2,
      s"IS NULL must skip the no-null file: $nullFiles")
    val (notNullFiles, _) =
      cat.nullProbeFiles("events_ingest", "props", isNull = false)
    assert(notNullFiles.size == 2,
      s"IS NOT NULL must skip the all-null file: $notNullFiles")
    // correctness identity on both probes
    val viaProbe = cat.readWhereNull("events_ingest", "props",
      isNull = true).select("ingest_id").collect().map(_.getLong(0)).sorted
    val viaScan = cat.read("events_ingest").filter(col("props").isNull)
      .select("ingest_id").collect().map(_.getLong(0)).sorted
    assert(viaProbe.toSeq == viaScan.toSeq && viaProbe.length == 15)
    assert(cat.readWhereNull("events_ingest", "props", isNull = false)
      .count() == 15)
  }

  test("the SQL front door prunes null probes out of the physical scan") {
    val cat = freshCat()
    cat.append("events_ingest", ev(1 to 10, _ => Some("p")),
      orderBy = Seq("event_id"))
    cat.append("events_ingest", ev(11 to 20, _ => None),
      orderBy = Seq("event_id"))
    spark.conf.set("spark.sql.catalog.gnull",
      classOf[graft.store.sql.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnull.root", cat.root)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, FileScan}
    def deepCollect[T](p: SparkPlan)(
        f: PartialFunction[SparkPlan, T]): Seq[T] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      f.lift(p).toSeq ++ kids.flatMap(deepCollect(_)(f))
    }
    def scanFiles(df: DataFrame): Int =
      deepCollect(df.queryExecution.executedPlan) {
        case b: BatchScanExec => b.scan
      }.collect { case fs: FileScan => fs.fileIndex.inputFiles.length }.sum
    val q = spark.sql(
      "SELECT ingest_id FROM gnull.events_ingest WHERE props IS NULL")
    assert(q.count() == 10)
    assert(scanFiles(q) == 1, "IS NULL must scan only the null-bearing file")
    val q2 = spark.sql(
      "SELECT ingest_id FROM gnull.events_ingest WHERE props IS NOT NULL")
    assert(q2.count() == 10)
    assert(scanFiles(q2) == 1,
      "IS NOT NULL must scan only the value-bearing file")
  }

  test("schema evolution guard: a file staged before the column existed " +
    "makes no null claim and is always kept") {
    val cat = freshCat()
    cat.append("events_ingest", ev(1 to 10, _ => Some("p")),
      orderBy = Seq("event_id"))
    cat.transaction { tx =>
      tx.addColumn("events_ingest", org.apache.spark.sql.types.StructField(
        "quality", org.apache.spark.sql.types.IntegerType, nullable = true))
    }
    cat.append("events_ingest",
      ev(11 to 20, _ => Some("p")).withColumn("quality", lit(7)),
      orderBy = Seq("event_id"))
    // the old file reads back all-NULL quality; pruning must KEEP it for
    // IS NULL (no claim) and the new file (zero nulls recorded) is
    // skippable — so the probe returns exactly the old rows
    val (kept, total) =
      cat.nullProbeFiles("events_ingest", "quality", isNull = true)
    assert(total == 2 && kept.size == 1)
    assert(cat.readWhereNull("events_ingest", "quality", isNull = true)
      .count() == 10)
    assert(cat.readWhereNull("events_ingest", "quality", isNull = false)
      .count() == 10)
  }

  test("fsck witnesses the new claims: a tampered row count and a " +
    "tampered null count are each diagnosed") {
    val cat = freshCat()
    cat.append("events_ingest", ev(1 to 10, _ => Some("p")),
      orderBy = Seq("event_id"))
    assert(cat.fsck("events_ingest").collect().forall(_.getBoolean(2)))
    val delta = java.nio.file.Paths.get(cat.root, "_log", "v1.json")
    val json = new String(Files.readAllBytes(delta), "UTF-8")
    val t1 = json.replaceFirst("\"rows\":10", "\"rows\":7777")
    assert(t1 != json, "rows tamper target not found")
    Files.write(delta, t1.getBytes("UTF-8"))
    val f1 = new Catalog(spark, cat.root).fsck("events_ingest").collect()
      .filter(!_.getBoolean(2))
    assert(f1.exists(_.getString(3).contains("claims 7777 rows")),
      f1.mkString(", "))
    val t2 = json.replaceFirst("\"props\":0", "\"props\":3")
    assert(t2 != json, "null tamper target not found")
    Files.write(delta, t2.getBytes("UTF-8"))
    val f2 = new Catalog(spark, cat.root).fsck("events_ingest").collect()
      .filter(!_.getBoolean(2))
    assert(f2.exists(_.getString(3).contains("null count")),
      f2.mkString(", "))
  }
}
