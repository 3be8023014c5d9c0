package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{DateType, IntegerType}

/** Broadcast interval-overlap join: the no-shuffle variant for the
  * small-right-side asymmetry (a calendar of campaign/maintenance
  * windows against a 100 TB interval fact table). The right side
  * broadcasts; each executor builds a per-key start-sorted window list;
  * every left interval resolves map-side — binary search bounds the
  * candidate prefix (windows starting before the probe's end), a linear
  * scan of that prefix keeps the true overlaps. The left side is never
  * shuffled or sorted; partitioning and ordering pass through.
  *
  * Prefix-scan cost is bounded by the per-key size of the BROADCAST
  * side (dimension-sized by the planner's own threshold decision), so
  * per-left work is O(log m + m_key) worst case, never corpus-shaped.
  * Same half-open `[start, end)` semantics as [[IntervalJoinExec]].
  */
case class BroadcastIntervalJoinExec(
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
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) ::
      Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    val lKeyExprs = leftKeys; val rKeyExprs = rightKeys
    val lB = Seq(leftStart, leftEnd); val rB = Seq(rightStart, rightEnd)
    val lAttrs = left.output; val rAttrs = right.output
    val boundsAreInt = leftStart.dataType match {
      case IntegerType | DateType => true
      case _ => false
    }
    val out = output
    val planId = id

    left.execute().mapPartitions { lIter =>
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rAttrs)
      val rBoundProj = UnsafeProjection.create(rB, rAttrs)
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lAttrs)
      val lBoundProj = UnsafeProjection.create(lB, lAttrs)
      def bound(r: InternalRow, i: Int): Long =
        if (boundsAreInt) r.getInt(i).toLong else r.getLong(i)

      // per-key (starts sorted asc, ends, rows) over the broadcast side,
      // built ONCE PER EXECUTOR via the soft cache — not per partition
      val index = BroadcastIndexCache.getOrBuild(broadcastRows.id, planId,
        () => {
        val built = new java.util.HashMap[UnsafeRow,
          (Array[Long], Array[Long], Array[InternalRow])]()
        val grouped = new java.util.HashMap[UnsafeRow,
          scala.collection.mutable.ArrayBuffer[(Long, Long, InternalRow)]]()
        broadcastRows.value.foreach { row =>
          val k = rKeyProj(row)
          if (!k.anyNull) {
            val b = rBoundProj(row)
            if (!b.isNullAt(0) && !b.isNullAt(1)) {
              // degenerate rows kept: the raw predicate lets a
              // zero-length window match intervals containing its point
              var buf = grouped.get(k)
              if (buf == null) {
                buf = new scala.collection.mutable.ArrayBuffer[
                  (Long, Long, InternalRow)]()
                grouped.put(k.copy(), buf)
              }
              buf += ((bound(b, 0), bound(b, 1), row))
            }
          }
        }
        grouped.forEach { (k, buf) =>
          val s = buf.sortBy(_._1)
          built.put(k, (s.map(_._1).toArray, s.map(_._2).toArray,
            s.map(_._3).toArray))
        }
        built
      })

      val resultProj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow

      lIter.flatMap { l =>
        val lk = lKeyProj(l)
        val entry = if (lk.anyNull) null else index.get(lk)
        if (entry == null) Iterator.empty
        else {
          val lb = lBoundProj(l)
          if (lb.isNullAt(0) || lb.isNullAt(1)) Iterator.empty
          else {
            val ls = bound(lb, 0); val le = bound(lb, 1)
            val (starts, ends, rows) = entry
            // candidate prefix: windows with start < le (the raw
            // predicate's first half; degenerate lefts get an empty
            // prefix only when nothing starts before their point)
            var lo = 0; var hi = starts.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (starts(mid) < le) lo = mid + 1 else hi = mid
            }
            val lim = lo
            // left row must be copied: flatMap may buffer the iterator
            // past the input row's reuse window
            val lCopy = if (lim > 0) l.copy() else null
            (0 until lim).iterator
              .filter(i => ends(i) > ls)
              .map { i =>
                numOutputRows += 1
                resultProj(joined(lCopy, rows(i))).copy()
              }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastIntervalJoinExec =
    copy(left = newLeft, right = newRight)
}
