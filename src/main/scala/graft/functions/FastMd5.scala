package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5(string)` with a THREAD-REUSED digest instance — bit-identical
  * output to Spark's built-in `md5` (lowercase hex over the UTF-8 bytes),
  * radically cheaper per call.
  *
  * Why this exists (round-6 measured attribution, bench/r6_evidence/):
  * Spark's `Md5` expression calls commons-codec `DigestUtils.md5Hex`,
  * which runs `MessageDigest.getInstance("MD5")` PER ROW — a JCA provider
  * lookup plus a reflective `Constructor.newInstance` every call. 1 Hz
  * stack sampling of the dedup family's slow runs shows the 32 task
  * threads pinned in `Provider$Service.newInstance` / `GetInstance
  * .getInstance` / `Hex.encodeHex`: the minhash pipeline issues ~20 md5
  * calls per shingle, i.e. hundreds of millions of reflective
  * instantiations per corpus pass — the dominant CPU term and, through
  * the JCA/reflection machinery's inflation-and-cache behavior, the main
  * source of the family's 1-10x run-to-run variance. A thread-local
  * `MessageDigest` (reset on every `digest()`) plus a table-driven hex
  * encode removes all of it: no allocation, no reflection, no lookup.
  *
  * Semantics contract pinned by the oracle: DuckDB `md5()` must equal
  * this for every shingle/band string (LshBucketsSpec-style identity spec
  * in ExtSpec ensures `fast_md5 == md5` on fixture text).
  */
case class FastMd5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "fast_md5"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument")

  override protected def nullSafeEval(input: Any): Any =
    FastMd5.hex(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastMd5.hex($c)")

  override protected def withNewChildInternal(newChild: Expression): FastMd5 =
    copy(child = newChild)
}

/** Binary-output variant of [[FastMd5]]: the raw 16-byte digest.
  *
  * Spark orders `BinaryType` by UNSIGNED lexicographic byte comparison,
  * which ranks digests exactly like their lowercase-hex strings (each
  * byte's order equals its two hex digits' order) — so `MIN(fast_md5_bin
  * (x))` equals `unhex(MIN(md5(x)))`. The minhash signature aggregate
  * exploits this: 16 `min` buffers carry 16-byte binaries instead of
  * 32-char strings (half the compare/copy traffic in the hottest
  * aggregate) and hex encoding happens once per doc-signature instead of
  * once per shingle-hash. An ExtSpec identity test pins the ordering
  * equivalence against the string path on fixture data. */
case class FastMd5Bin(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "fast_md5_bin"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument")

  override protected def nullSafeEval(input: Any): Any =
    FastMd5.digest(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastMd5.digest($c)")

  override protected def withNewChildInternal(newChild: Expression): FastMd5Bin =
    copy(child = newChild)
}

object FastMd5 {

  private val tl: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".getBytes

  /** Shared by interpreted eval and generated code. `MessageDigest.digest`
    * resets the instance, so thread-local reuse is safe. */
  def digest(s: UTF8String): Array[Byte] = tl.get().digest(s.getBytes)

  def hex(s: UTF8String): UTF8String = {
    val d = digest(s)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Idempotently register with the session, then build a call (same
    * public-API construction path as [[RollingHash.rolling_hash]]). */
  def fast_md5(spark: SparkSession, c: Column): Column = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(
        "fast_md5", exprs => FastMd5(exprs.head), "built-in")
    call_function("fast_md5", c)
  }

  def fast_md5_bin(spark: SparkSession, c: Column): Column = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(
        "fast_md5_bin", exprs => FastMd5Bin(exprs.head), "built-in")
    call_function("fast_md5_bin", c)
  }
}
