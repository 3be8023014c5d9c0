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

  test("drift guard: rows above 1.5x their reference AND +0.15s are " +
    "flagged; sub-threshold jitter and missing references are not") {
    val ref = Map("a" -> 1.0, "b" -> 0.05, "c" -> 2.0)
    val results = Seq(
      "a" -> 1.9,   // 1.9x, +0.9s        -> flagged
      "b" -> 0.12,  // 2.4x but +0.07s    -> noise floor, not flagged
      "c" -> 2.6,   // 1.3x               -> inside band, not flagged
      "d" -> 9.0)   // no reference       -> not flagged
    val drift = Bench.driftOf(results, ref)
    assert(drift.map(_._1) == Seq("a"), drift.toString)
    // the JSON carries the flagged rows and the count; a clean run's
    // drift object is empty
    val line = Bench.fmtJson(Seq("a" -> 1.9), Nil, "/sf", 2, full = true)
    assert(line.contains("\"drift_n\":"))
    assert(Bench.driftOf(Seq("a" -> 1.0), ref).isEmpty)
  }

  test("a pathological all-drifted run still fits the contract line: " +
    "the compact drift object is capped at the 5 worst rows") {
    val results = SparkEntry.benchQueries.map(_.name -> 999.999)
    val ref = results.map { case (n, _) => n -> 0.5 }.toMap
    val drift = Bench.driftOf(results, ref)
    assert(drift.size == results.size)
    // cap check via string shape: at most 5 "name":"v/r" entries after
    // "drift": in the compact form
    val headline = results.filter(r => Bench.headlineNames(r._1))
    val line = Bench.fmtJson(headline, Nil, "/root/testdata/sf0.1", 2,
      full = false)
    assert(line.length < 1900, s"contract line ${line.length} chars")
  }

  test("loadReference parses the shipped reference's rows object: only " +
    "per-query numeric rows enter the drift map, never metadata keys") {
    val ref = Bench.loadReference()
    assert(ref.nonEmpty, "shipped bench/BENCH_REFERENCE.json unreadable")
    assert(ref.keys.forall(!_.startsWith("_")),
      s"metadata leaked into the drift map: ${ref.keys.filter(_.startsWith("_"))}")
    assert(ref.values.forall(_ > 0.0))
    assert(ref.contains("q1_pricing_summary"), "a known row is missing")
    // every reference row names a registered bench query — a renamed
    // or dropped query must re-anchor the reference, not silently
    // stop being drift-guarded
    val known = SparkEntry.benchQueries.map(_.name).toSet
    val unknown = ref.keySet -- known
    assert(unknown.isEmpty, s"reference rows for unknown queries: $unknown")
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
