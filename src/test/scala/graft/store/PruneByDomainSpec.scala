package graft.store

import org.scalatest.funsuite.AnyFunSuite

/** Boundary conditions of the keyed-upsert stats pre-prune
  * ([[Catalog.pruneByDomain]]) — the filter merge/SCD2 use to turn the
  * hit-file scan from table-sized to touched-range-sized. Wrong
  * exclusivity here silently drops matched rows, so the inclusive
  * bounds and the no-stats conservatism are pinned as a pure unit. */
class PruneByDomainSpec extends AnyFunSuite {
  private case class E(path: String, cols: Map[String, (Long, Long)])
  private def fe(path: String, range: Option[(Long, Long)]) =
    E(path, range.map(r => Map("k" -> r)).getOrElse(Map.empty))

  private val files = Vector(
    fe("low", Some((1L, 10L))),
    fe("mid", Some((10L, 20L))),   // touches a [10, x] domain only at lo
    fe("high", Some((21L, 30L))),
    fe("point", Some((15L, 15L))),
    fe("nostats", None))           // cannot be ruled out

  private def prune(lo: Long, hi: Long): Set[String] =
    Catalog.pruneByDomain[E](files, _.cols, "k", Some((lo, hi)))
      .map(_.path).toSet

  test("inclusive on both ends: a file touching the domain boundary " +
    "stays; disjoint ranges go; no-stats files always stay") {
    assert(prune(10L, 15L) == Set("low", "mid", "point", "nostats"))
    assert(prune(11L, 14L) == Set("mid", "nostats"))
    assert(prune(30L, 40L) == Set("high", "nostats"))
    assert(prune(31L, 40L) == Set("nostats"))
    // single-point domain on a single-point file
    assert(prune(15L, 15L) == Set("mid", "point", "nostats"))
  }

  test("no domain = no pruning (strict/non-stats merges scan everything)") {
    assert(Catalog.pruneByDomain[E](files, _.cols, "k", None) == files)
  }

  test("a stats entry for a DIFFERENT column never prunes") {
    val other = Vector(E("o", Map("j" -> (1L, 2L))))
    assert(Catalog.pruneByDomain[E](other, _.cols, "k",
      Some((100L, 200L))) == other)
  }
}
