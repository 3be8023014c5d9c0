package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench output-contract unit tests (no SparkSession needed): a failed
  * query must surface in `failed` and never as a timing, the compact
  * contract line must stay inside the driver's ~2000-char tail capture,
  * and the family partition must cover every registered bench query. */
class BenchSpec extends AnyFunSuite {

  test("failed queries are reported in failed[], never as timings") {
    val ok = Seq("q_ok" -> 1.234)
    val line = Bench.fmtJson(ok, Seq("q_broken"), "/sf", 2, full = true)
    assert(line.contains(""""failed":["q_broken"]"""))
    assert(!line.contains("q_broken\":"), "a failed query must have no time")
    assert(line.contains(""""q_ok":1.234"""))
    // total excludes nothing that passed, includes nothing that failed
    assert(line.contains(""""value":1.234"""))
  }

  test("compact contract line fits the driver tail capture (< 1900 chars)") {
    // worst case: every headline query present with a 3-digit-seconds time
    val results = SparkEntry.benchQueries.map(_.name -> 999.999)
    val line = Bench.fmtJson(
      results.filter(r => Bench.headlineNames(r._1)),
      Nil, "/root/testdata/sf0.1", 2, full = false)
    assert(line.length < 1900, s"contract line ${line.length} chars")
    assert(line.startsWith("""{"metric":"total""""))
  }

  test("every bench query belongs to exactly one family, and headline " +
    "names are real queries") {
    val names = SparkEntry.benchQueries.map(_.name)
    names.foreach(n => assert(Bench.family(n).nonEmpty))
    val all = names.toSet
    Bench.headlineNames.foreach(h =>
      assert(all(h), s"headline '$h' is not a registered bench query"))
  }
}
