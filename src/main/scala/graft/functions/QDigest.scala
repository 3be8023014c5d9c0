package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** q-digest quantile sketch (Shrivastava, Buragohain, Agrawal, Suri,
  * "Medians and beyond: new aggregation techniques for sensor
  * networks", SenSys 2004) as a native Spark aggregate — the QUANTILE
  * member of the repo's mergeable-sketch tier ([[MisraGries]] heavy
  * hitters, [[CountMin]] point frequencies, [[BloomBuildAgg]]
  * membership, [[BoundedMinK]] bottom-k). Unlike sampling sketches its
  * rank-error bound is DETERMINISTIC, worst case, under arbitrary merge
  * trees: any reported q-quantile's true rank differs from q*n by at
  * most eps*n with eps = log2(U)/k — a theorem, not a probability — so
  * a correctness gate can pin the bound flag TRUE unconditionally.
  *
  * The summary is a count map over the complete binary tree on the
  * integer universe [0, U) (heap numbering: root 1, leaf for value v =
  * U + v). Insert bumps the value's leaf; COMPRESS walks levels
  * bottom-up (canonical ascending-id order) folding any family whose
  * count (node + sibling + parent) is below n/k into the parent —
  * bounding the map at O(k) entries regardless of n. MERGE sums the
  * two maps and compresses: fully mergeable (PODS'12 sense), each
  * partition ships O(k) longs, never values.
  *
  * Query: nodes sorted by (range max, range size) ascending — the
  * canonical post-order — accumulate counts until q*n is covered and
  * report the node's max value. The sketch STATE can differ across
  * merge trees (any mergeable summary's does); the BOUND cannot, which
  * is what the gate asserts (the exact-vs-sketch contract of
  * `ext_approx_distinct`/`ext_vocab_cms`).
  */
case class QDigestAgg(
    child: Expression,
    logU: Int,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  private val U: Long = 1L << logU

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  // flattened (nodeId, count) pairs
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "qdigest"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint column in [0, 2^$logU), got " +
        s"${child.dataType}")

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty

  override def update(buf: mutable.LongMap[Long],
      input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      require(x >= 0 && x < U, s"qdigest value $x outside [0, $U)")
      val leaf = U + x
      buf.update(leaf, buf.getOrElse(leaf, 0L) + 1L)
      // amortized compression keeps the buffer O(k) during the scan
      if (buf.size > 6 * k) QDigest.compress(buf, logU, k)
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Long],
      other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreach { case (id, c) =>
      buf.update(id, buf.getOrElse(id, 0L) + c)
    }
    QDigest.compress(buf, logU, k)
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    QDigest.compress(buf, logU, k)
    val ids = buf.keys.toArray.sorted
    val flat = new Array[Long](ids.length * 2)
    var i = 0
    ids.foreach { id =>
      flat(i) = id; flat(i + 1) = buf(id); i += 2
    }
    new GenericArrayData(flat)
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (id, c) => out.writeLong(id); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { buf.update(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QDigestAgg =
    copy(child = newChildren.head)
}

object QDigest {
  /** Default geometry: 16-bit universe (integer cents of the fixture's
    * 2-decimal values), k=1024 -> deterministic rank error
    * <= (16/1024) n ~ 1.6% of n, summary <= ~3k entries. */
  val DefaultLogU = 16
  val DefaultK = 1024

  /** Canonical bottom-up compression: levels deepest-first, node ids
    * ascending within a level; a family (node, sibling, parent) with
    * total count < floor(n/k) folds into the parent. Canonical order
    * makes compress a pure function of the map it is given. */
  private[functions] def compress(buf: mutable.LongMap[Long], logU: Int,
      k: Int): Unit = {
    val n = buf.values.sum
    val threshold = n / k
    if (threshold <= 0) return
    var level = logU // leaves live at depth logU
    while (level >= 1) {
      val ids = buf.keys.filter(id =>
        java.lang.Long.numberOfTrailingZeros(
          java.lang.Long.highestOneBit(id)) == level).toArray.sorted
      ids.foreach { id =>
        if (buf.contains(id)) {
          val sib = id ^ 1L
          val parent = id >> 1
          val fam = buf.getOrElse(id, 0L) + buf.getOrElse(sib, 0L) +
            buf.getOrElse(parent, 0L)
          if (fam < threshold) {
            buf.update(parent, fam)
            buf.remove(id)
            buf.remove(sib)
          }
        }
      }
      level -= 1
    }
  }

  /** Quantile estimate from a flattened (id, count) sketch array:
    * canonical post-order walk (range max asc, range size asc),
    * accumulate until q*n is covered, report the node's range max
    * (clamped to U-1). */
  def estimate(flat: Array[Long], q: Double, logU: Int): Long = {
    val U = 1L << logU
    val nodes = flat.grouped(2).map { p =>
      val id = p(0)
      val depth = 63 - java.lang.Long.numberOfLeadingZeros(id)
      val span = 1L << (logU - depth)
      val lo = (id - (1L << depth)) * span
      (lo + span - 1, span, p(1)) // (max, size, count)
    }.toArray.sortBy(t => (t._1, t._2))
    val n = nodes.map(_._3).sum
    val target = math.ceil(q * n).max(1.0)
    var acc = 0L
    var i = 0
    while (i < nodes.length) {
      acc += nodes(i)._3
      if (acc >= target) return math.min(nodes(i)._1, U - 1)
      i += 1
    }
    U - 1
  }

  def qdigest(spark: SparkSession, c: Column,
      logU: Int = DefaultLogU, k: Int = DefaultK): Column = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(s"qdigest_${logU}_$k",
        exprs => QDigestAgg(exprs.head, logU, k), "built-in")
    call_function(s"qdigest_${logU}_$k", c)
  }

  /** Build a sketch from raw values without a session — the exact
    * update/compress path the aggregate runs, exposed for property
    * tests that exercise the deterministic bound on arbitrary inputs
    * and merge trees. */
  def sketchOf(values: Seq[Long], logU: Int = DefaultLogU,
      k: Int = DefaultK): mutable.LongMap[Long] = {
    val U = 1L << logU
    val buf = mutable.LongMap.empty[Long]
    values.foreach { x =>
      require(x >= 0 && x < U)
      val leaf = U + x
      buf.update(leaf, buf.getOrElse(leaf, 0L) + 1L)
      if (buf.size > 6 * k) compress(buf, logU, k)
    }
    compress(buf, logU, k)
    buf
  }

  /** Merge two sketches (count-sum + compress) — the aggregate's merge. */
  def mergeSketch(a: mutable.LongMap[Long], b: mutable.LongMap[Long],
      logU: Int = DefaultLogU, k: Int = DefaultK): mutable.LongMap[Long] = {
    b.foreach { case (id, c) => a.update(id, a.getOrElse(id, 0L) + c) }
    compress(a, logU, k)
    a
  }

  /** Flatten a sketch map to the aggregate's (id, count) array form. */
  def flatten(buf: mutable.LongMap[Long]): Array[Long] = {
    val ids = buf.keys.toArray.sorted
    val flat = new Array[Long](ids.length * 2)
    var i = 0
    ids.foreach { id => flat(i) = id; flat(i + 1) = buf(id); i += 2 }
    flat
  }

  /** Decode a sketch column collected to the driver. */
  def flatOf(a: Any): Array[Long] = a match {
    case s: scala.collection.Seq[_] => s.map(_.asInstanceOf[Long]).toArray
    case ad: ArrayData => ad.toLongArray()
    case arr: Array[Long] => arr
  }
}
