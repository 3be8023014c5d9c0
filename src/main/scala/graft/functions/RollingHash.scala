package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (Karp-Rabin) over a string's code points:
  * `h_i = (h_{i-1} * 31 + cp_i) mod 1_000_000_007`, `h_{-1} = 0`.
  *
  * Document fingerprinting primitive for the [EXT] text pipeline. A native
  * Catalyst expression with `doGenCode` so it participates in whole-stage
  * codegen (no UDF serialization / boxing on the 100 TB path). The oracle
  * mirrors it as a `list_reduce` over `unicode()` code points.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument")

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Mod = 1000000007L

  /** Shared by interpreted eval and generated code. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Idempotently register with the session, then build a call. Column
    * construction from a raw Expression is session-private in Spark 4, so
    * the public path is registry + call_function. */
  def rolling_hash(spark: SparkSession, c: Column): Column = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(
        "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
    call_function("rolling_hash", c)
  }
}
