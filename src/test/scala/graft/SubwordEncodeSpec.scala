package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SubwordEncode

/** Pins [[SubwordEncode]] to the greedy longest-match (MaxMatch)
  * definition the recursive-CTE oracle replays: at every position the
  * longest vocabulary piece wins, and the concatenation of the emitted
  * pieces reconstructs the word exactly.
  */
class SubwordEncodeSpec extends AnyFunSuite {

  private def enc(w: String): Seq[String] =
    SubwordEncode.encode(UTF8String.fromString(w))
      .toArray[UTF8String](org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq

  test("greedy longest-match picks the longest piece at each position") {
    assert(enc("testing") == Seq("te", "st", "ing"))
    // "the" (3) beats "te" (2) at position 0
    assert(enc("then") == Seq("the", "n"))
    // "ati" (3) beats "at" (2) after the leading "n" ("na" not in vocab)
    assert(enc("nation") == Seq("n", "ati", "on"))
    // "tion" (4) is reachable when the boundary lands on it
    assert(enc("tion") == Seq("tion"))
  }

  test("every [a-z]+ word round-trips: pieces concatenate to the word") {
    val words = Seq("a", "zz", "querying", "aggregation", "xylophone",
      "spark", "throughput", "qqq", "entanglement")
    words.foreach { w =>
      val pieces = enc(w)
      assert(pieces.mkString("") == w, s"$w -> $pieces")
      assert(pieces.forall(SubwordEncode.Vocab.contains),
        s"$w emitted a non-vocab piece: $pieces")
    }
  }

  test("greedy is well-defined: single deterministic result per word") {
    assert(enc("entanglement") == enc("entanglement"))
    assert(enc("") == Seq.empty)
  }
}
