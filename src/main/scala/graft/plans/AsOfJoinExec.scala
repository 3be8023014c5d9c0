package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType}

/** Physical as-of join: co-partitioned, sort-merged, single-pass.
  *
  * Requirements handed to EnsureRequirements: both children clustered on
  * their equi-keys (compatible hash partitionings -> ONE exchange per
  * side, co-partitioned; AQE coalesces the two shuffles identically, the
  * same contract sort-merge join relies on) and sorted by (keys..., time).
  * `doExecute` then zips partition pairs and resolves every left row with
  * a forward-only two-pointer walk:
  *
  *  - backward (`forward = false`): consume right rows while their key is
  *    <= the current left key and time <= the left time, remembering the
  *    last key-equal row seen — that row IS the latest-at-or-before match
  *    (one candidate row of state; each right row is copied at most once,
  *    when it becomes the candidate).
  *  - forward: consume right rows strictly behind (key, time); the
  *    lookahead row is the earliest-at-or-after match if its key is equal.
  *
  * Memory is O(1) rows per partition beyond the sort buffers — no
  * hash table, no per-key group materialization, no window state. Rows
  * stream out in left (key, time) order, which `outputOrdering` declares
  * so a downstream sort on the same prefix is elided.
  *
  * Known scale limitation: AQE's skew-join rescue pattern-matches
  * SortMergeJoin/ShuffledHashJoin and will NOT split a skewed partition
  * of this operator — a hot as-of key behaves like a skewed SMJ key on
  * Spark versions without AQE. Rescues at 100 TB: (a) the planner
  * routes through [[BroadcastAsOfJoinExec]] when the right side is
  * dimension-sized (no left shuffle at all); (b) the [[SkewSalt]]
  * salted-replicate rewrite — `skewSalt = Some(s)` on [[AsOf.join]] or
  * the `spark.graft.join.skewSalt` session conf — splits every hot
  * key's left rows across `s` buckets with the full right history
  * replicated per bucket, bounding per-task rows at ~1/s
  * (fuzz-verified against brute force; planted-hot-key bound pinned in
  * PlansSpec).
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  private def leftOrder: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(leftOrder, (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = leftOrder

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext,
      "number of matched left rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lKeyExprs = leftKeys; val rKeyExprs = rightKeys
    val lTimeExpr = leftTime; val rTimeExpr = rightTime
    val lAttrs = left.output; val rAttrs = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeIsInt = lTimeExpr.dataType match {
      case IntegerType | DateType => true
      case LongType | _ => false
    }
    val tol = tolerance
    val fwd = forward
    val out = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lAttrs)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rAttrs)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lAttrs)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRight = new GenericInternalRow(rAttrs.size)
      val resultProj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      def timeOf(r: InternalRow): Long =
        if (timeIsInt) r.getInt(0).toLong else r.getLong(0)

      new Iterator[InternalRow] {
        // lookahead right row: valid until the next rIter.next(); its key
        // is copied (survives lookahead replacement), the row itself is
        // copied only if it becomes the backward candidate.
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTime: Long = 0L
        private def advanceRight(): Unit = {
          rRow = null
          while (rRow == null && rIter.hasNext) {
            val c = rIter.next()
            val k = rKeyProj(c)
            if (!k.anyNull) {
              val t = rTimeProj(c)
              if (!t.isNullAt(0)) {
                rRow = c; rKey = k.copy(); rTime = timeOf(t)
              }
            }
          }
        }
        advanceRight()

        // backward candidate: latest key-equal right row at-or-before the
        // current left time (stale candidates from earlier keys fail the
        // key-equality check, no explicit invalidation needed)
        private var candKey: UnsafeRow = _
        private var candTime: Long = 0L
        private var cand: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          var m: InternalRow = null
          val lk = lKeyProj(l)
          if (!lk.anyNull) {
            val ltr = lTimeProj(l)
            if (!ltr.isNullAt(0)) {
              val lt = timeOf(ltr)
              if (!fwd) {
                var go = rRow != null
                while (go) {
                  val c = keyOrd.compare(rKey, lk)
                  if (c < 0) { advanceRight(); go = rRow != null }
                  else if (c == 0 && rTime <= lt) {
                    candKey = rKey; candTime = rTime; cand = rRow.copy()
                    advanceRight(); go = rRow != null
                  } else go = false
                }
                if (cand != null && keyOrd.compare(candKey, lk) == 0 &&
                  tol.forall(lt - candTime <= _)) m = cand
              } else {
                var go = rRow != null
                while (go) {
                  val c = keyOrd.compare(rKey, lk)
                  if (c < 0 || (c == 0 && rTime < lt)) {
                    advanceRight(); go = rRow != null
                  } else go = false
                }
                if (rRow != null && keyOrd.compare(rKey, lk) == 0 &&
                  tol.forall(rTime - lt <= _)) m = rRow
              }
            }
          }
          numOutputRows += 1
          if (m != null) {
            numMatched += 1
            resultProj(joined(l, m))
          } else resultProj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
