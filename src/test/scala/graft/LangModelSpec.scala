package graft

import org.apache.spark.sql.functions._

import graft.ext.LangModel

/** Invariant pins for the LM-corpus ops (bigram LM, curriculum,
  * weighted sampling). */
class LangModelSpec extends SparkSuite {

  test("bigram LM: probabilities are valid and consistent with counts") {
    val rows = LangModel.bigramLm.fn(spark, sf).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val p = r.getAs[Double]("cond_prob")
      assert(p > 0.0 && p <= 1.0, s"P out of range: $p")
    }
    // counts are ranked descending with deterministic tiebreak
    val counts = rows.map(_.getAs[Long]("c2"))
    assert(counts.sliding(2).forall { case Array(a, b) => a >= b })
    // a certainty bigram: P = 1 means its w1 is always followed by w2 —
    // spot-check one against a direct recount
    val r0 = rows.head
    val bg = graft.core.Tables.documents(spark, sf)
      .select(explode(expr(
        """transform(
          |  sequence(0, size(filter(split(text, '\\s+'), t -> t != '')) - 2),
          |  i -> struct(filter(split(text, '\\s+'), t -> t != '')[i] AS w1,
          |              filter(split(text, '\\s+'), t -> t != '')[i+1] AS w2)
          |)""".stripMargin)).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
    val c2 = bg.filter(col("w1") === r0.getAs[String]("w1")
      && col("w2") === r0.getAs[String]("w2")).count()
    assert(c2 == r0.getAs[Long]("c2"), s"top bigram recount: $c2 vs $r0")
  }

  test("curriculum: ten buckets partition the corpus, ordered by NLL") {
    val rows = LangModel.curriculumBuckets.fn(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == (1L to 10L))
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // difficulty is monotone: bucket i's max NLL <= bucket i+1's min NLL
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("max_nll") <= b.getAs[Double]("min_nll") + 1e-9,
        s"bucket overlap: $a vs $b")
    }
  }

  test("weighted sample: deterministic, length-biased toward long docs") {
    val s1 = LangModel.weightedSample.fn(spark, sf).collect()
    val s2 = LangModel.weightedSample.fn(spark, sf).collect()
    assert(s1.map(_.toString).toSeq == s2.map(_.toString).toSeq,
      "sample must be replay-stable")
    assert(s1.length == 100)
    val pris = s1.map(_.getAs[Double]("priority"))
    assert(pris.sliding(2).forall { case Array(a, b) => a >= b })
    // length bias: the weighted sample's mean doc length exceeds the
    // corpus mean (w = n_chars)
    val meanSample = s1.map(_.getAs[Long]("n_chars")).sum.toDouble / 100
    val meanCorpus = graft.core.Tables.documents(spark, sf)
      .agg(avg("n_chars")).head.getDouble(0)
    assert(meanSample > meanCorpus,
      s"weighted sample not length-biased: $meanSample vs $meanCorpus")
  }
}
