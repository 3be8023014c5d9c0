package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All LSH bucket ids of one embedding in a single call:
  * `lsh_buckets(e)[t] = sum_j (dot(e, plane[t*B+j]) > 0) << j`.
  *
  * Round 2..4 built this as 64 separate `vec_dot(e, typedLit(plane))`
  * column expressions — 4096 literal doubles in every similarity plan.
  * That bloats analysis/optimization on the driver for every run AND
  * produces oversized generated projections whose Janino/C2 compilation
  * showed up as multi-second intermittent stalls in the bench (e.g.
  * ext_sim_ann_lsh 1.2 s..19 s across identical runs, jit=+12 s spikes).
  * One compact expression calling a static tight loop keeps the plan
  * literal-free and the generated code a few lines, so the JIT compiles
  * one hot method once.
  *
  * The plane family itself is unchanged (md5-parity +-1 components,
  * [[graft.ext.LshPlanes]]) and the DuckDB oracle still receives the same
  * values as literal lists, so bucket assignment stays engine-identical
  * and fully oracle-checked.
  */
case class LshBuckets(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument")
  }

  override protected def nullSafeEval(e: Any): Any =
    LshBuckets.buckets(e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, e => s"graft.functions.LshBuckets.buckets($e)")

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {

  /** Plane matrix flattened row-major at class-load: planes(p)(i) =
    * flat(p * dims + i). Static so the generated code shares one copy. */
  private val dims = graft.ext.LshPlanes.Dims
  private val bits = graft.ext.LshPlanes.BitsPerTable
  private val tables = graft.ext.LshPlanes.NumTables
  private val flat: Array[Double] = {
    val ps = graft.ext.LshPlanes.planes
    val out = new Array[Double](ps.length * dims)
    var p = 0
    while (p < ps.length) {
      System.arraycopy(ps(p), 0, out, p * dims, dims); p += 1
    }
    out
  }

  /** One pass over the planes: same left-to-right dot fold as
    * [[VecDot.dot]], same `> 0` sign rule, grouped into `bits`-wide
    * bucket ids. */
  def buckets(e: ArrayData): ArrayData = {
    val n = math.min(e.numElements(), dims)
    val out = new Array[Long](tables)
    var p = 0
    while (p < tables * bits) {
      var acc = 0.0
      val base = p * dims
      var i = 0
      while (i < n) { acc += e.getDouble(i) * flat(base + i); i += 1 }
      if (acc > 0) out(p / bits) |= (1L << (p % bits))
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Idempotently register and call (same session-private pattern as
    * [[VecDot.vec_dot]]). */
  def lsh_buckets(spark: SparkSession, e: Column): Column = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(
        "lsh_buckets", exprs => LshBuckets(exprs(0)), "built-in")
    call_function("lsh_buckets", e)
  }
}
