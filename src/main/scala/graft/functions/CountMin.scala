package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005) as a native Spark aggregate + lookup pair — the
  * point-frequency-estimate sketch next to [[MisraGries]]'s
  * candidate-set sketch: MG answers "which terms are heavy", CMS answers
  * "about how often does THIS term occur" for any term, in
  * depth x width x 8 bytes regardless of vocabulary size.
  *
  * The buffer is a flat depth x width counter matrix. Update hashes the
  * term once per row d with xxhash64 seeded by d (the same XXH64 the
  * engine's `xxhash64` built-in uses) and bumps one cell per row. Merge
  * is elementwise addition — commutative, associative, insertion-order
  * free, so the finished matrix is a pure function of the input multiset
  * however it is partitioned (the property the gate's partition-
  * invariance spec pins). Estimates take the MIN cell across rows:
  * always >= the true count (cells only overcount), and over by more
  * than eps*N (eps = e/width) with probability at most (1/e)^depth per
  * query.
  *
  * At 100 TB: the explode feeding the aggregate shuffles depth x width
  * counters per partition, never the token stream; the finished sketch
  * is a ~64 KB broadcast payload any probe row can interrogate.
  * [[CountMinEstimate]] is a scalar lookup over the materialized array
  * ([[CodegenFallback]] — it runs on probe rows, bounded by the report
  * size, never on the corpus hot path).
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val u = v.asInstanceOf[UTF8String]
      var d = 0
      while (d < depth) {
        buf(d * width + CountMin.cell(u, d, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

/** `cms_estimate(sketch, term)`: MIN over the depth rows of the term's
  * cell — shares [[CountMin.cell]] with the build aggregate so the two
  * sides cannot drift. Runs on probe/report rows only (CodegenFallback
  * is fine off the hot path). */
case class CountMinEstimate(
    left: Expression, right: Expression, depth: Int, width: Int)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }) && right.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, string), got " +
        s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(sk: Any, term: Any): Any = {
    val arr = sk.asInstanceOf[ArrayData]
    // geometry guard: a sketch built with a different (depth, width)
    // would otherwise be probed at silently wrong cells (or bounds-throw
    // mid-query with no indication of the cause)
    require(arr.numElements() == depth * width,
      s"$prettyName geometry mismatch: sketch has ${arr.numElements()} " +
        s"cells, expected depth*width = ${depth * width} " +
        s"($depth x $width) — probe and build must share one geometry")
    val u = term.asInstanceOf[UTF8String]
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = arr.getLong(d * width + CountMin.cell(u, d, width))
      if (c < est) est = c
      d += 1
    }
    est
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}

object CountMin {
  /** Default geometry: 4 x 2048 (64 KB) — eps = e/2048 ~ 0.13% of N per
    * estimate at depth-4 confidence 1 - e^-4. */
  val DefaultDepth = 4
  val DefaultWidth = 2048

  /** Row-d cell for a term: xxhash64 of the term's UTF-8 bytes with
    * seed d, floor-mod width. Shared by build and estimate. */
  private[functions] def cell(u: UTF8String, d: Int, width: Int): Int =
    java.lang.Math.floorMod(
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes, d.toLong),
      width.toLong).toInt

  def count_min(spark: SparkSession, c: Column,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): Column = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(s"count_min_${depth}_$width",
        exprs => CountMinAgg(exprs.head, depth, width), "built-in")
    call_function(s"count_min_${depth}_$width", c)
  }

  def cms_estimate(spark: SparkSession, sketch: Column, term: Column,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): Column = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(s"cms_estimate_${depth}_$width",
        exprs => CountMinEstimate(exprs(0), exprs(1), depth, width),
        "built-in")
    call_function(s"cms_estimate_${depth}_$width", sketch, term)
  }
}
