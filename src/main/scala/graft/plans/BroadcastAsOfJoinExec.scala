package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{DateType, IntegerType}

/** Broadcast as-of join: the no-shuffle variant [[GraftStrategy]] picks
  * when the right side fits under `spark.sql.autoBroadcastJoinThreshold`
  * (the SMJ-vs-BHJ decision, applied to the as-of shape).
  *
  * The point-in-time-features workload is exactly this asymmetry: a
  * 100 TB fact stream as-of-joining a small dimension snapshot table. The
  * co-partitioned [[AsOfJoinExec]] would shuffle AND sort the fact side;
  * this operator instead broadcasts the right side once, builds a
  * per-key time-sorted index on each executor, and resolves every left
  * row map-side with a binary search — the left side keeps its
  * partitioning AND ordering (both are passed through), so downstream
  * stages lose nothing.
  *
  * Tie semantics match [[AsOfJoinExec]]: equal (key, time) right rows
  * resolve arbitrarily — callers dedup the right side to unique
  * (key, time) first.
  */
case class BroadcastAsOfJoinExec(
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

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) ::
      Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext,
      "number of matched left rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    val lKeyExprs = leftKeys; val rKeyExprs = rightKeys
    val lTimeExpr = leftTime; val rTimeExpr = rightTime
    val lAttrs = left.output; val rAttrs = right.output
    val timeIsInt = lTimeExpr.dataType match {
      case IntegerType | DateType => true
      case _ => false
    }
    val tol = tolerance
    val fwd = forward
    val out = output
    val planId = id

    left.execute().mapPartitions { lIter =>
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rAttrs)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rAttrs)
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lAttrs)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lAttrs)
      def timeOf(r: InternalRow): Long =
        if (timeIsInt) r.getInt(0).toLong else r.getLong(0)

      // per-key time-sorted index over the broadcast rows (safe copies),
      // built ONCE PER EXECUTOR via the soft cache — not per partition
      val index = BroadcastIndexCache.getOrBuild(broadcastRows.id, planId,
        () => {
        val built = new java.util.HashMap[UnsafeRow,
          (Array[Long], Array[InternalRow])]()
        val grouped = new java.util.HashMap[UnsafeRow,
          scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
        broadcastRows.value.foreach { row =>
          val k = rKeyProj(row)
          if (!k.anyNull) {
            val t = rTimeProj(row)
            if (!t.isNullAt(0)) {
              var buf = grouped.get(k)
              if (buf == null) {
                buf = new scala.collection.mutable.ArrayBuffer[
                  (Long, InternalRow)]()
                grouped.put(k.copy(), buf)
              }
              buf += ((timeOf(t), row))
            }
          }
        }
        grouped.forEach { (k, buf) =>
          val sorted = buf.sortBy(_._1)
          built.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
        }
        built
      })

      val nullRight = new GenericInternalRow(rAttrs.size)
      val resultProj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow

      lIter.map { l =>
        var m: InternalRow = null
        val lk = lKeyProj(l)
        if (!lk.anyNull) {
          val entry = index.get(lk)
          if (entry != null) {
            val ltr = lTimeProj(l)
            if (!ltr.isNullAt(0)) {
              val lt = timeOf(ltr)
              val (times, rows) = entry
              if (!fwd) {
                // largest i with times(i) <= lt
                var lo = 0; var hi = times.length - 1; var ans = -1
                while (lo <= hi) {
                  val mid = (lo + hi) >>> 1
                  if (times(mid) <= lt) { ans = mid; lo = mid + 1 }
                  else hi = mid - 1
                }
                if (ans >= 0 && tol.forall(lt - times(ans) <= _))
                  m = rows(ans)
              } else {
                // smallest i with times(i) >= lt
                var lo = 0; var hi = times.length - 1; var ans = -1
                while (lo <= hi) {
                  val mid = (lo + hi) >>> 1
                  if (times(mid) >= lt) { ans = mid; hi = mid - 1 }
                  else lo = mid + 1
                }
                if (ans >= 0 && tol.forall(times(ans) - lt <= _))
                  m = rows(ans)
              }
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

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
