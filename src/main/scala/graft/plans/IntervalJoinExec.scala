package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{DateType, IntegerType}

/** Physical keyed interval-overlap join: co-partitioned plane sweep.
  *
  * Both children are clustered on their equi-keys and sorted by
  * (keys..., start). The two sorted streams are merged in global
  * (key, start) order; each side keeps a buffer of its ACTIVE intervals
  * (those that can still overlap something arriving later). Processing a
  * row at start s first drops the other side's entries with end <= s —
  * later rows have start' >= s, so a dropped entry can never overlap
  * anything again — then every survivor overlaps the new row by
  * construction (survivor.start <= s from merge order, survivor.end > s
  * from the drop, s < new.end from interval validity), so the pairs are
  * emitted without any per-pair predicate. The new row then joins its own
  * side's buffer. Each overlapping pair is emitted exactly once: by
  * whichever row the merge processes second (ties go left-first, so the
  * right row emits the pair).
  *
  * Memory per partition = the two active sets — the maximum overlap
  * concurrency of the data, NOT the per-key row count; work is
  * O(n log n + output). The declarative equivalent (equi-join then
  * overlap filter) materializes the per-key cross product first.
  */
case class IntervalJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftStart: Expression,
    leftEnd: Expression,
    rightStart: Expression,
    rightEnd: Expression,
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftStart).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightStart).map(SortOrder(_, Ascending)))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    // loud memory guard (the dedup round-budget convention): the active
    // sets are bounded by the data's max overlap concurrency, which is a
    // *property of the data*, not of the plan — a pathological pileup
    // (thousands of concurrently-open intervals on one key) should fail
    // attributably, not OOM an executor. 0 disables.
    val bufferCap = org.apache.spark.sql.internal.SQLConf.get
      .getConfString("graft.interval.buffer.cap", "1000000").toInt
    val lKeyExprs = leftKeys; val rKeyExprs = rightKeys
    val lB = Seq(leftStart, leftEnd); val rB = Seq(rightStart, rightEnd)
    val lAttrs = left.output; val rAttrs = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val boundsAreInt = leftStart.dataType match {
      case IntegerType | DateType => true
      case _ => false
    }
    val out = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lAttrs)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rAttrs)
      val lBoundProj = UnsafeProjection.create(lB, lAttrs)
      val rBoundProj = UnsafeProjection.create(rB, rAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      def bound(r: InternalRow, i: Int): Long =
        if (boundsAreInt) r.getInt(i).toLong else r.getLong(i)

      // one side of the merge: lookahead row + its key/bounds, skipping
      // rows that can never match (null key/bounds). Degenerate rows
      // (start >= end) are KEPT: under the raw predicate a zero-length
      // interval still matches intervals strictly containing its point —
      // they just never enter a buffer (nothing arriving later can
      // satisfy later.start < this.end).
      final class Side(it: Iterator[InternalRow],
          keyProj: UnsafeProjection, boundProj: UnsafeProjection) {
        var row: InternalRow = _
        var key: UnsafeRow = _
        var st: Long = 0L
        var en: Long = 0L
        advance()
        def advance(): Unit = {
          row = null
          while (row == null && it.hasNext) {
            val c = it.next()
            val k = keyProj(c)
            if (!k.anyNull) {
              val b = boundProj(c)
              if (!b.isNullAt(0) && !b.isNullAt(1)) {
                row = c; key = k.copy(); st = bound(b, 0); en = bound(b, 1)
              }
            }
          }
        }
      }
      val ls = new Side(lIter, lKeyProj, lBoundProj)
      val rs = new Side(rIter, rKeyProj, rBoundProj)

      // active sets for the current key group: (start, end, row copy)
      val lBuf = new ArrayBuffer[(Long, Long, InternalRow)]
      val rBuf = new ArrayBuffer[(Long, Long, InternalRow)]
      var curKey: UnsafeRow = null
      val pending = new java.util.ArrayDeque[InternalRow]

      def enterKey(k: UnsafeRow): Unit =
        if (curKey == null || keyOrd.compare(k, curKey) != 0) {
          lBuf.clear(); rBuf.clear(); curKey = k
        }

      def checkCap(): Unit =
        if (bufferCap > 0 &&
          (lBuf.length > bufferCap || rBuf.length > bufferCap))
          throw new IllegalStateException(
            s"interval join active set exceeded " +
              s"graft.interval.buffer.cap=$bufferCap concurrently-open " +
              s"intervals on one key — pathological overlap pileup; " +
              s"split the hot key or raise the cap")

      def processLeft(): Unit = {
        enterKey(ls.key)
        rBuf.filterInPlace(_._2 > ls.st)
        var i = 0
        while (i < rBuf.length) {
          // survivors have start <= ls.st and end > ls.st; the start <
          // ls.en check matters only for degenerate lefts (else implied)
          if (rBuf(i)._1 < ls.en)
            pending.add(resultProj(joined(ls.row, rBuf(i)._3)).copy())
          i += 1
        }
        // buffering is useful only while the other side can still arrive,
        // and never for degenerate intervals (nothing later matches them)
        if (rs.row != null && ls.st < ls.en) {
          lBuf += ((ls.st, ls.en, ls.row.copy())); checkCap()
        }
        ls.advance()
      }

      def processRight(): Unit = {
        enterKey(rs.key)
        lBuf.filterInPlace(_._2 > rs.st)
        var i = 0
        while (i < lBuf.length) {
          if (lBuf(i)._1 < rs.en)
            pending.add(resultProj(joined(lBuf(i)._3, rs.row)).copy())
          i += 1
        }
        if (ls.row != null && rs.st < rs.en) {
          rBuf += ((rs.st, rs.en, rs.row.copy())); checkCap()
        }
        rs.advance()
      }

      new Iterator[InternalRow] {
        override def hasNext: Boolean = {
          while (pending.isEmpty && (ls.row != null || rs.row != null)) {
            if (rs.row == null) processLeft()
            else if (ls.row == null) processRight()
            else {
              val c = keyOrd.compare(ls.key, rs.key)
              // ties on (key, start) go left-first so the later-processed
              // right row emits the pair exactly once
              if (c < 0 || (c == 0 && ls.st <= rs.st)) processLeft()
              else processRight()
            }
          }
          !pending.isEmpty
        }
        override def next(): InternalRow = {
          numOutputRows += 1
          pending.poll()
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}
