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

  // ---- string stats (round 14) -------------------------------------------

  private case class S(path: String, scols: Map[String, (String, String)])
  private val sfiles = Vector(
    S("ae", Map("k" -> ("alpha", "echo"))),
    S("mp", Map("k" -> ("mike", "papa"))),
    S("rz", Map("k" -> ("romeo", "zulu"))),
    S("nostats", Map.empty))

  private def sprune(lo: String, hi: String): Set[String] =
    Catalog.pruneByDomainStr[S](sfiles, _.scols, "k", lo, hi)
      .map(_.path).toSet

  test("string pruning: inclusive boundary semantics in binary order; " +
    "no-stats files always stay") {
    assert(sprune("a", "l") == Set("ae", "nostats"))
    assert(sprune("echo", "mike") == Set("ae", "mp", "nostats"))
    assert(sprune("q", "q") == Set("nostats"))
    assert(sprune("zulu", "zzz") == Set("rz", "nostats"))
  }

  test("string stat bounds are OUTER bounds in UTF-8 binary order for " +
    "any value: short exact, long truncated, supplementary chars, " +
    "randomized") {
    def ok(mn: String, mx: String): Unit =
      Catalog.strStatBounds(mn, mx) match {
        case Some((lo, hi)) =>
          assert(Catalog.utf8Compare(lo, mn) <= 0,
            s"lo bound above min for '$mn'")
          assert(Catalog.utf8Compare(hi, mx) >= 0,
            s"hi bound below max for '$mx'")
        case None => // no stats recorded: conservative, always sound
      }
    ok("a", "b")
    ok("", "")
    val long = "z" * 40
    ok(long, long)
    // exact for short values
    assert(Catalog.strStatBounds("abc", "xyz").contains(("abc", "xyz")))
    // long values truncate: lo is a prefix (<=), hi is bumped (>)
    val (lo, hi) = Catalog.strStatBounds(long, long).get
    assert(lo == "z" * 32 && Catalog.utf8Compare(hi, long) > 0)
    // supplementary characters (surrogate pairs) and chars around the
    // surrogate range stay sound
    val emoji = "\uD83D\uDE00" // U+1F600
    ok(emoji * 20, emoji * 20)
    ok("x" * 31 + emoji, "x" * 31 + emoji)
    ok("\uD7FE" * 40, "\uD7FE" * 40)
    ok("\uFFFE" * 40, "\uFFFE" * 40)
    // ill-formed UTF-16 (lone surrogate) records no stats, never a bound
    assert(Catalog.strStatBounds("\uD83D" + "x" * 40, "y").isEmpty)
    // randomized sweep over a mixed alphabet (fixed seed)
    val rnd = new scala.util.Random(14)
    val alphabet = "ab\u00E9\u4E2D\uFFFD" + "\uD83D\uDE00"
    (1 to 500).foreach { _ =>
      val n = rnd.nextInt(60)
      val sb = new StringBuilder
      while (sb.length < n) sb.append(alphabet.charAt(
        rnd.nextInt(alphabet.length)))
      // drop a split pair at the end if any
      val s0 = sb.toString
      val s = if (s0.nonEmpty && Character.isHighSurrogate(s0.last))
        s0.dropRight(1) else s0
      ok(s, s)
    }
  }
}
