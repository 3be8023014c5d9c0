package graft.store

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Round 18: DV-masked and rename-epoch SQL scans stay VECTORIZED.
  * Until round 17 both wrappers forced `supportColumnarReads = false`,
  * so a merge-on-read-heavy table lost whole-scan vectorization on
  * every read between OPTIMIZE runs; the selection-vector /
  * coalesce-vector views ([[graft.store.sql.SelectedColumnVector]],
  * [[graft.store.sql.CoalescedColumnVector]]) keep the parquet reader
  * columnar. These tests pin BOTH properties per shape: the scan
  * reports columnar AND the masked/coalesced results stay exactly
  * right (correctness never rests on the fast path — SqlPruneFuzzSpec
  * differentially fuzzes the same read shapes). */
class ColumnarScanSpec extends SparkSuite {

  private var n = 0

  private def fresh(): (Catalog, String) = {
    n += 1
    val dir = Files.createTempDirectory(s"graft-colscan$n").toString
    val catName = s"gcol$n"
    spark.conf.set(s"spark.sql.catalog.$catName",
      classOf[graft.store.sql.GraftTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.root", dir)
    (new Catalog(spark, dir), catName)
  }

  private val shape = StructType(Seq(
    StructField("m_id", LongType, nullable = false),
    StructField("k", LongType),
    StructField("tag", StringType)))

  private def rows(lo: Long, hi: Long) = {
    import org.apache.spark.sql.Row
    spark.createDataFrame(
      spark.sparkContext.parallelize((lo to hi).map(i =>
        Row(i, if (i % 10 == 0) null else s"t$i")), 2),
      StructType(Seq(
        StructField("k", LongType),
        StructField("tag", StringType))))
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

  /** Every graft BatchScan in the plan reports columnar execution. */
  private def assertColumnar(df: DataFrame, what: String): Unit = {
    df.collect() // materialize so AQE finalizes the plan
    val scans = deepCollect(df.queryExecution.executedPlan) {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, s"$what: no BatchScanExec in plan")
    scans.foreach(b => assert(b.supportsColumnar,
      s"$what: scan dropped to row-based reads (${b.scan.description()})"))
  }

  test("DV-masked scan is columnar and masks exactly (selection " +
    "vectors): point UPDATE and DELETE land as deletion vectors, the " +
    "SQL read stays vectorized, dead rows never surface") {
    val (cat, c) = fresh()
    cat.createTable("t", shape, "m_id", statsColumns = Seq("k"))
    cat.append("t", rows(1, 500))
    // point ops by surrogate id take the merge-on-read path (DV + patch)
    cat.update("t", col("m_id") === 7L, Map("tag" -> lit("patched")))
    cat.delete("t", col("m_id") === 13L)
    assert(cat.liveFiles("t").nonEmpty)
    val all = spark.sql(s"SELECT m_id, k, tag FROM $c.t")
    assertColumnar(all, "DV-masked full scan")
    assert(all.count() == 499, "deleted row must not surface")
    assert(all.filter(col("m_id") === 13L).isEmpty)
    assert(all.filter(col("m_id") === 7L).select("tag")
      .collect()(0).getString(0) == "patched")
    // projection WITHOUT the id column still masks (id is force-read)
    val proj = spark.sql(s"SELECT k FROM $c.t WHERE k IS NOT NULL")
    assertColumnar(proj, "DV-masked projected scan")
    assert(proj.count() == 499) // 500 non-null k minus deleted id 13
    assert(spark.sql(s"SELECT sum(k) AS s FROM $c.t")
      .collect()(0).getLong(0) == (1L to 500L).sum - 13L)
  }

  test("rename-epoch scan is columnar and coalesces exactly " +
    "(per-batch pick vectors): pre-rename files serve under the new " +
    "name, genuine NULLs stay NULL, vectorization survives") {
    val (cat, c) = fresh()
    cat.createTable("t", shape, "m_id", statsColumns = Seq("k"))
    cat.append("t", rows(1, 300)) // epoch 1: files carry 'k'
    cat.renameColumn("t", "k", "key")
    val q = spark.sql(s"SELECT m_id, key, tag FROM $c.t")
    assertColumnar(q, "rename-epoch scan")
    assert(q.count() == 300)
    assert(q.filter(col("key").isNull).count() == 0)
    assert(q.filter(col("tag").isNull).count() == 30, "genuine NULLs")
    assert(spark.sql(s"SELECT sum(key) AS s FROM $c.t")
      .collect()(0).getLong(0) == (1L to 300L).sum)
  }

  test("composition: DV mask under a rename epoch — one scan, both " +
    "wrappers, still columnar, still exact") {
    val (cat, c) = fresh()
    cat.createTable("t", shape, "m_id", statsColumns = Seq("k"))
    cat.append("t", rows(1, 200))
    cat.renameColumn("t", "k", "key")
    cat.update("t", col("m_id") === 42L, Map("tag" -> lit("x")))
    cat.delete("t", col("m_id") === 99L)
    val q = spark.sql(s"SELECT m_id, key, tag FROM $c.t")
    assertColumnar(q, "rename+DV composed scan")
    assert(q.count() == 199)
    assert(q.filter(col("m_id") === 99L).isEmpty)
    assert(q.filter(col("m_id") === 42L).select("tag")
      .collect()(0).getString(0) == "x")
    assert(q.filter(col("key").isNull).count() == 0)
    // the Scala read path must agree exactly (differential check)
    val scalaSide = cat.read("t").select("m_id", "key", "tag")
      .orderBy("m_id").collect().map(_.toString).toSeq
    val sqlSide = q.orderBy("m_id").collect().map(_.toString).toSeq
    assert(scalaSide == sqlSide)
  }
}
