package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical keyed interval-overlap join (INNER): emit every (left, right)
  * pair with equal keys whose half-open intervals overlap —
  * `l.start < r.end AND r.start < l.end`.
  *
  * Spark has no physical operator for this shape: the declarative
  * encodings are an equi-join on the key followed by the overlap filter
  * (materializes n_l x n_r pairs PER KEY before filtering — quadratic for
  * power keys) or, keyless, a BroadcastNestedLoopJoin. [[IntervalJoinExec]]
  * instead runs the classic plane sweep: co-partition on the keys, sort
  * both sides by (keys, start), merge the two streams in global start
  * order keeping a buffer of only the ACTIVE intervals per side — memory
  * is the maximum overlap concurrency, work is O(n log n + output), never
  * per-key quadratic.
  *
  * Semantics are EXACTLY the raw predicate — including degenerate rows:
  * a zero-length interval [p, p) still matches intervals strictly
  * containing p (`l.start < p AND p < l.end`), which is what the SQL
  * predicate evaluates to, so the operator is a drop-in for the
  * declarative form on arbitrary data (fuzz-pinned against the
  * brute-force reference). NULL keys or bounds never match (inner join:
  * such rows produce no output).
  */
case class IntervalJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftStart: Expression,
    leftEnd: Expression,
    rightStart: Expression,
    rightEnd: Expression,
    /** Some(true)/Some(false) pins the broadcast/co-partitioned variant;
      * None lets the planner decide from right-side stats vs
      * `spark.sql.autoBroadcastJoinThreshold`. */
    broadcastRight: Option[Boolean] = None) extends BinaryNode {

  require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty,
    "interval join needs at least one equi-key pair")

  override def output: Seq[Attribute] = left.output ++ right.output

  /** Columns the join itself consumes (kept by column pruning). */
  def joinReferences: AttributeSet =
    AttributeSet((leftKeys ++ rightKeys ++
      Seq(leftStart, leftEnd, rightStart, rightEnd)).flatMap(_.references))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Public construction API — column names resolve per side. */
object IntervalJoin {
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      broadcastRight: Option[Boolean] = None,
      /** Hot-key rescue (see [[SkewSalt]]): split every left key across
        * `s` salt buckets (right side replicated `s`x) — each (l, r)
        * overlap pair still appears exactly once, in l's bucket. The
        * join is symmetric: to rescue a hot RIGHT side, swap the sides.
        * Defaults to the `spark.graft.join.skewSalt` session conf
        * (absent = `auto`: census-driven detection, round 14); ignored
        * when the caller pinned the broadcast variant. */
      skewSalt: Option[Int] = None): DataFrame = {
    // see AsOf.join: never salt (nor census) a join the planner would
    // broadcast — there is no shuffle to rescue there
    val saltable = !broadcastRight.contains(true) &&
      !(broadcastRight.isEmpty && SkewSalt.plannerWouldBroadcast(right))
    val salt =
      if (saltable) SkewSalt.resolve(skewSalt, left, keys.map(_._1))
      else None
    salt match {
      case Some(s) =>
        joinUnsalted(
          SkewSalt.saltLeft(left, leftStart, s),
          SkewSalt.replicateRight(right, s),
          keys :+ (SkewSalt.LeftCol -> SkewSalt.RightCol),
          leftStart, leftEnd, rightStart, rightEnd,
          broadcastRight = Some(false))
          .drop(SkewSalt.LeftCol, SkewSalt.RightCol)
      case None => joinUnsalted(left, right, keys, leftStart, leftEnd,
        rightStart, rightEnd, broadcastRight)
    }
  }

  private def joinUnsalted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      broadcastRight: Option[Boolean]): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def resolve(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"interval join: no column '$n' on the $side side " +
          s"(have: ${p.output.map(_.name).mkString(", ")})"))
    val bounds = Seq(
      resolve(lp, leftStart, "left"), resolve(lp, leftEnd, "left"),
      resolve(rp, rightStart, "right"), resolve(rp, rightEnd, "right"))
    require(bounds.forall(b => AsOfJoinPlan.supportedTimeType(b.dataType) &&
      b.dataType == bounds.head.dataType),
      s"interval bounds must share a supported type " +
        s"(timestamp/date/long/int); got ${bounds.map(_.dataType).distinct}")
    val (lks, rks) = keys.map { case (ln, rn) =>
      val lk = resolve(lp, ln, "left"); val rk = resolve(rp, rn, "right")
      require(lk.dataType == rk.dataType,
        s"interval key type mismatch: $ln ${lk.dataType} vs $rn ${rk.dataType}")
      (lk, rk)
    }.unzip
    val plan = IntervalJoinPlan(lp, rp, lks, rks,
      bounds(0), bounds(1), bounds(2), bounds(3), broadcastRight)
    org.apache.spark.sql.GraftSqlShim.ofRows(left.sparkSession, plan)
  }
}
