package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization (the MaxMatch step of
  * WordPiece, Wu et al. 2016 — the apply-a-vocabulary half of a
  * tokenizer, vocab learning being BPE pair counting, which the [EXT]
  * pipeline covers separately): one lowercase word in, the sequence of
  * longest-prefix vocabulary pieces out.
  *
  * The vocabulary is a FIXED literal ([[SubwordEncode.Vocab]]): all 26
  * single letters (so every `[a-z]+` word encodes — no UNK path) plus
  * common English bigrams/trigrams/quadgrams. The oracle replays the
  * same greedy loop as a recursive CTE over the same literal vocabulary,
  * longest match via `max_by(v, length(v))` (unique: two same-length
  * prefixes of one string are equal), so the token streams are
  * bit-identical across engines.
  *
  * A native Catalyst expression with `doGenCode`, so encoding runs
  * inside whole-stage codegen right after the word split — zero
  * serialization, no UDF boxing, and the per-word work is a char-indexed
  * hash probe per position over at most 4 candidate lengths.
  */
case class SubwordEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "subword_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument")

  override protected def nullSafeEval(input: Any): Any =
    SubwordEncode.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SubwordEncode.encode($c)")

  override protected def withNewChildInternal(
      newChild: Expression): SubwordEncode = copy(child = newChild)
}

object SubwordEncode {

  /** The shared literal vocabulary — the ONLY definition; the oracle SQL
    * interpolates this same list, so the two engines cannot drift. */
  val Vocab: Seq[String] =
    ('a' to 'z').map(_.toString) ++ Seq(
      "the", "and", "ing", "ion", "ent", "ati", "tion", "er", "in", "re",
      "on", "at", "en", "ed", "es", "or", "te", "of", "an", "ar", "al",
      "st", "to", "nt", "is", "le", "ve", "se", "ce", "me", "de", "ta",
      "co", "ra", "et", "ri", "ro", "li", "ne", "ma", "un", "la", "el",
      "di", "us", "mo", "qu", "ut")

  private val maxLen = Vocab.map(_.length).max
  private val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](Vocab.size * 2)
    Vocab.foreach(s.add)
    s
  }

  /** Shared by interpreted eval and generated code. Greedy: at each
    * position take the longest vocabulary piece that prefixes the rest.
    * A position with no match (impossible for `[a-z]+` input — the
    * vocabulary contains every letter) stops the word, mirroring the
    * oracle recursion's termination. */
  def encode(word: UTF8String): ArrayData = {
    val s = word.toString
    val n = s.length
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      var l = math.min(maxLen, n - i)
      var matched: String = null
      while (l > 0 && matched == null) {
        val cand = s.substring(i, i + l)
        if (vocabSet.contains(cand)) matched = cand else l -= 1
      }
      if (matched == null) i = n // non-vocab char: stop (unreachable for a-z)
      else {
        out.add(UTF8String.fromString(matched))
        i += matched.length
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Idempotently register with the session, then build a call (same
    * public-API construction path as [[RollingHash.rolling_hash]]). */
  def subword_encode(spark: SparkSession, c: Column): Column = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(
        "subword_encode", exprs => SubwordEncode(exprs.head), "built-in")
    call_function("subword_encode", c)
  }
}
