package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct sketch (Bar-Yossef et al. RANDOM'02;
  * Beyer et al. SIGMOD'07): keep the k smallest DISTINCT hash values seen.
  * The estimator (k-1) * R / h_(k) (R = hash range) is unbiased; the
  * state is O(k) longs; merge = set-union + trim, which commutes and is
  * associative, so partial sketches combined in any partition/merge order
  * yield exactly the global bottom-k distinct set.
  *
  * Why this exists next to the HLL row (`ext_approx_distinct`): with a
  * DETERMINISTIC hash both engines can compute, the KMV estimate itself
  * is exactly reproducible — the DuckDB oracle recomputes the k smallest
  * distinct hashes and the same integer-division estimate, so the gate
  * hash-checks the sketch arithmetic, not just an error bound. (HLL's
  * register layout is engine-private; its row can only pin a bound.)
  *
  * Distinctness lives INSIDE the state (a bounded TreeSet), so the
  * aggregate runs directly over the raw row stream with map-side partial
  * sketches — no global distinct shuffle at any scale.
  */
case class KmvSketch(
    hash: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash child, got ${hash.dataType}")

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def admit(buf: mutable.TreeSet[Long], h: Long): Unit =
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) { buf -= buf.last; buf += h }

  override def update(buf: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val hv = hash.eval(input)
    if (hv != null) admit(buf, hv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long],
      other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(admit(buf, _))
    buf
  }

  /** The (up to) k smallest distinct hashes, ascending. */
  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(hash = newChildren(0))
}

object KmvSketch {
  def kmv_sketch(spark: SparkSession, hash: Column, k: Int): Column = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(
        s"kmv_sketch_$k", exprs => KmvSketch(exprs(0), k), "built-in")
    call_function(s"kmv_sketch_$k", hash)
  }
}
