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
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native Spark aggregate
  * (Misra & Gries, "Finding repeated elements", Sci. Comp. Prog. 1982;
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012
  * §3.1). A summary of capacity k over n items undercounts any term by
  * at most n/(k+1), and the PODS'12 merge (sum counters, then subtract
  * the (k+1)-th largest and drop non-positives) preserves that bound
  * under ARBITRARY merge trees — exactly the property a distributed
  * aggregate needs: partial sketches per partition, any combine order,
  * same guarantee. Hence the contract: every term with true count
  * > n/(k+1) is present in the final summary, regardless of
  * partitioning. The candidate SET beyond that guarantee is
  * partitioning-dependent (like any sketch); gates must only assert the
  * guaranteed superset, never the exact set.
  *
  * This is a [[TypedImperativeAggregate]] — the buffer is a real
  * hash map, serialized compactly between partial and final aggregation
  * — complementing the repo's codegen'd scalar expressions as the
  * custom-AGGREGATE tier of SURVEY §2.10. At 100 TB the explode feeding
  * it shuffles k counters per partition instead of the token stream:
  * the sketch is the scale path next to the exact `ext_vocab_topk`.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      buf.get(t) match {
        case Some(c) => buf.update(t, c + 1)
        case None if buf.size < k => buf.update(t, 1L)
        case None =>
          // classic MG decrement-all: every tracked counter pays 1
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (key, c) => if (c <= 0) dead += key }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c)
    }
    if (buf.size > k) {
      // PODS'12: subtract the (k+1)-th largest counter, drop <= 0
      val sorted = buf.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(sorted.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(buf.remove)
    }
    buf
  }

  /** Candidate terms, sorted for a stable presentation (the SET is the
    * sketch's output; order carries no meaning). */
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keys.toArray.sorted.map(UTF8String.fromString(_)))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  /** Default sketch capacity: error bound n/65 — 2x headroom under the
    * n/32 heavy-hitter threshold the gate op uses. */
  val DefaultK = 64

  def misra_gries(spark: SparkSession, c: Column,
      k: Int = DefaultK): Column = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(
        s"misra_gries_$k", exprs => MisraGries(exprs.head, k), "built-in")
    call_function(s"misra_gries_$k", c)
  }
}
