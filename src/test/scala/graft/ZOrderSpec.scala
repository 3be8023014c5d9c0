package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import graft.ext.ZOrderLayout

/** The z-order layout's whole point is footer-time pruning: a 2-D box
  * predicate must intersect FEW row groups' [min,max] envelopes. Checked
  * directly against the written parquet footers, not reader metrics —
  * the layout property holds for any engine that reads the files.
  */
class ZOrderSpec extends SparkSuite {

  /** (min, max) of a long column per row group across the table dir. */
  private def rowGroupBounds(dir: java.io.File,
      column: String): Seq[(Long, Long)] = {
    val files = dir.listFiles().filter(f =>
      f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    files.toSeq.flatMap { f =>
      val in = HadoopInputFile.fromPath(
        new Path(f.getAbsolutePath), new Configuration())
      val r = ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        r.getFooter.getBlocks.asScala.toSeq.map { b =>
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(sys.error(s"no column $column in ${f.getName}"))
          val st = c.getStatistics
          (st.genericGetMin.asInstanceOf[Number].longValue(),
            st.genericGetMax.asInstanceOf[Number].longValue())
        }
      } finally r.close()
    }
  }

  test("z-ordered layout: the 2-D box intersects a small fraction of " +
    "row-group envelopes, and results match the raw table exactly") {
    val out = ZOrderLayout.zorderScan.fn(spark, sf)
    val got = out.collect()
    assert(got.nonEmpty, "box query must be non-vacuous")
    // result parity vs the raw table (layout must not change semantics)
    val (pl, ph, sl, sh) = ZOrderLayout.box
    import org.apache.spark.sql.functions._
    val raw = graft.core.Tables.lineitem(spark, sf)
      .filter(col("l_partkey").between(pl, ph)
        && col("l_suppkey").between(sl, sh))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        graft.core.Determinism.revenueSum(
          col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("l_returnflag").collect()
    assert(got.map(_.toString).sameElements(raw.map(_.toString)))
    // footer check: row groups whose [min,max] intersect the box on BOTH
    // dims — with the Morton sort this must be a strict minority; an
    // unsorted layout leaves nearly every row group intersecting
    val dir = new java.io.File(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath,
      "graft_zorder_lineitem")
    val pb = rowGroupBounds(dir, "l_partkey")
    val sb = rowGroupBounds(dir, "l_suppkey")
    assert(pb.size == sb.size && pb.size >= 16,
      s"expected >= 16 row groups, got ${pb.size}")
    val hit = pb.zip(sb).count { case ((pmin, pmax), (smin, smax)) =>
      pmax >= pl && pmin <= ph && smax >= sl && smin <= sh
    }
    val frac = hit.toDouble / pb.size
    assert(frac <= 0.5,
      s"box intersects $hit of ${pb.size} row groups ($frac) — the " +
        "Morton sort is not clustering both dimensions")
  }
}
