package graft

import org.apache.spark.sql.functions._

/** The BPE trainer's merge list must equal a straight-line scalar
  * replay of Sennrich-style training (greedy left-to-right merges over
  * the frequency-compressed vocabulary, lexicographic tie-break).
  */
class BpeTrainSpec extends SparkSuite {

  test("learned merge list equals a local scalar training replay") {
    val words = graft.core.Tables.documents(spark, sf)
      .select(explode(filter(split(col("text"), "\\s+"), t => t =!= ""))
        .as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var vocab: Seq[(Vector[String], Long)] =
      words.map { case (w, f) => (w.map(_.toString).toVector, f) }.toSeq
    def mergeGreedy(syms: Vector[String], a: String,
        b: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b)
          acc.init :+ (a + b)
        else acc :+ x
      }
    val expected = (1 to 12).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val ((a, b), cnt) = counts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }
      vocab = vocab.map { case (syms, f) => (mergeGreedy(syms, a, b), f) }
      (r.toLong, a, b, cnt)
    }
    val got = graft.ext.Corpus.bpeTrain.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got == expected, s"spark $got vs local $expected")
    // sanity: counts are non-increasing is NOT guaranteed by BPE, but
    // every merged pair must have been the round's max -> cnt positive,
    // and later rounds may merge multi-char symbols
    assert(got.forall(_._4 > 0))
    assert(got.map(m => (m._2, m._3)).distinct.size == got.size,
      "a pair must never be learned twice: once merged it cannot recur")

    // the encode half: the emitted subword vocabulary must equal the
    // local replay's post-merge symbol census
    val localVocab = vocab.flatMap { case (syms, f) => syms.map(_ -> f) }
      .groupBy(_._1).map { case (sym, xs) => (sym, xs.map(_._2).sum) }
      .toSeq.sortBy { case (sym, f) => (-f, sym) }.take(30)
    val gotVocab = graft.ext.Corpus.bpeVocab.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(gotVocab == localVocab, s"spark $gotVocab vs local $localVocab")
    assert(gotVocab.exists(_._1.length > 1),
      "top subwords must include at least one learned multi-char unit")
  }
}
