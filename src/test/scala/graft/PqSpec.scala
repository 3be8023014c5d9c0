package graft

import org.apache.spark.sql.functions._

import graft.ext.{PqSearch, Similarity}

/** PQ/ADC quality pins the oracle can't see: planted-duplicate
  * retrieval and recall@10 against exact brute-force cosine.
  */
class PqSpec extends SparkSuite {
  import spark.implicits._

  test("pq: a planted near-copy of each probe is its ADC top-1 " +
    "(near-identical vectors share codes, so ADC ranks them first)") {
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0L until 60L).map(i => (i, vec(), 0))
    // plant: vec 60+i = probe i + tiny noise
    val planted = (0L until 5L).map { i =>
      (60L + i,
        base(i.toInt)._2.map(x => x + 0.001f * rnd.nextGaussian().toFloat),
        0)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_test_pq").toString
    (base ++ planted).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val top1 = PqSearch.searchAt(spark, dir)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach { i =>
      assert(top1(i) == 60L + i,
        s"planted duplicate ${60 + i} must be probe $i's ADC top-1; " +
          s"got ${top1(i)}")
    }
  }

  test("pq: recall@10 vs exact brute-force cosine clears the floor a " +
    "16-codeword 8-subspace quantizer delivers on the isotropic fixture") {
    val d = "/root/testdata/sf0.01"
    def tops(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = tops(PqSearch.searchAt(spark, d))
    val brute = tops(Similarity.topkBrute.fn(spark, d))
    val recalls = pq.keys.toSeq.sorted
      .map(p => pq(p).intersect(brute(p)).size / 10.0)
    val mean = recalls.sum / recalls.size
    info(s"per-probe recall@10: $recalls, mean $mean")
    // isotropic noise is PQ's worst case: every cosine is near zero, so
    // ranking among near-ties is quantization-noise-bound (measured 0.32
    // mean here). Real corpora cluster, and near-duplicates — the case
    // retrieval actually serves — are pinned exactly by the planted test
    // above. The floor guards against regressions (a broken encoder or
    // ADC sum scores ~0.1 = random overlap).
    assert(mean >= 0.25, s"recall floor: $recalls")
  }

  test("ivf-pq composition: the planted near-copy survives the coarse " +
    "candidate pruning (same cell) and ADC still ranks it top-1") {
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0L until 60L).map(i => (i, vec(), 0))
    val planted = (0L until 5L).map { i =>
      (60L + i,
        base(i.toInt)._2.map(x => x + 0.001f * rnd.nextGaussian().toFloat),
        0)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_test_ivfpq").toString
    (base ++ planted).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val top1 = PqSearch.searchIvfPq(spark, dir)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach { i =>
      assert(top1.get(i).contains(60L + i),
        s"planted duplicate ${60 + i} must survive IVF pruning and be " +
          s"probe $i's ADC top-1; got ${top1.get(i)}")
    }
  }

  test("ivf-pq: the ingest-staged index path returns exactly the inline " +
    "composition's rows (shared quantizers and scoring tail)") {
    val d = "/root/testdata/sf0.01"
    val inlineRows = PqSearch.searchIvfPq(spark, d)
      .collect().map(_.toString).sorted
    val indexedRows = PqSearch.searchIvfPqIndexed(spark, d)
      .collect().map(_.toString).sorted
    assert(indexedRows.length == inlineRows.length
      && indexedRows.sameElements(inlineRows),
      s"indexed (${indexedRows.length}) vs inline (${inlineRows.length})")
  }

  test("pq: trained codebooks (per-subspace Lloyd's) must not collapse " +
    "recall@10 vs the seed quantizer (tolerance for double-mean " +
    "nondeterminism near ties)") {
    val d = "/root/testdata/sf0.01"
    def tops(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = tops(Similarity.topkBrute.fn(spark, d))
    def recall(pq: Map[Long, Set[Long]]): Double = {
      val rs = pq.keys.toSeq.sorted
        .map(p => pq(p).intersect(brute(p)).size / 10.0)
      rs.sum / rs.size
    }
    val seed = recall(tops(PqSearch.searchAt(spark, d)))
    val trained = recall(tops(PqSearch.searchTrained(spark, d)))
    info(s"recall@10: seed $seed, trained $trained")
    // small tolerance: Lloyd's minimizes subspace MSE, not recall, and
    // the mean aggregation is double arithmetic whose partial-merge
    // order can shift near-tie rankings; on this fixture training
    // measures +0.06 (0.32 -> 0.38), but the pinned contract is
    // "training must not collapse recall", not strict improvement
    assert(trained >= seed - 0.1 && trained >= 0.25,
      s"training must not lose recall: seed $seed, trained $trained")
  }

  test("pq: ingest-staged trained index returns exactly the inline " +
    "trained results (benched path = spec'd path)") {
    val d = "/root/testdata/sf0.001"
    val inline = PqSearch.searchTrained(spark, d).collect().map(_.toString)
    val staged = PqSearch.searchTrainedIndexed(spark, d).collect()
      .map(_.toString)
    assert(staged.sameElements(inline),
      s"staged (${staged.length}) vs inline (${inline.length})")
  }
}
