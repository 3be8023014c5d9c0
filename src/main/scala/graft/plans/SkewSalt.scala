package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Hot-key rescue for the co-partitioned custom joins ([[AsOfJoinExec]],
  * [[IntervalJoinExec]]).
  *
  * AQE's skew-join splitter pattern-matches SortMergeJoin /
  * ShuffledHashJoin and will NOT split a skewed partition of a custom
  * exec — a hot equi-key is one straggler task at 100 TB (the known
  * limitation documented on AsOfJoinExec). The rescue is the classic
  * salted-replicate rewrite, applied at the LOGICAL level so the
  * existing physical operators run unchanged:
  *
  *  - every LEFT row gains a deterministic salt in `[0, s)` (hash of all
  *    hashable columns — full-row identical duplicates co-locate, all
  *    other rows spread);
  *  - every RIGHT row is replicated into ALL `s` buckets;
  *  - the salt pair joins as one more equi-key, so the per-task left
  *    row count for a hot key drops by ~`s` while each bucket still
  *    sees the complete right history for the key — per-left-row
  *    semantics (as-of match, interval pairs) are untouched, and each
  *    left row lands in exactly ONE bucket so no post-merge or dedup
  *    is needed.
  *
  * Cost model: right-side work and shuffle volume multiply by `s`; left
  * side (the big, skewed side — the reason to salt) is untouched. To
  * rescue a hot RIGHT side instead, swap the sides (interval join is
  * symmetric) or dedup the right to unique (key, time) first — an as-of
  * right side is dimension-history-sized by construction.
  *
  * Activation: per-call `skewSalt = Some(s)` on [[AsOf.join]] /
  * [[IntervalJoin.join]], or session-wide via
  * `spark.conf.set("spark.graft.join.skewSalt", s)` (per-call wins).
  * Salting forces the co-partitioned variant — the broadcast variants
  * have no left shuffle and therefore no skew problem to rescue.
  */
private[plans] object SkewSalt {
  /** Session conf: default salt factor for every salted-capable join
    * (0/absent = off). The 100 TB knob — set it once for a pipeline
    * whose key distribution is known to be hot. */
  val ConfKey = "spark.graft.join.skewSalt"

  val LeftCol = "__graft_salt_l"
  val RightCol = "__graft_salt_r"

  private def hasMap(t: DataType): Boolean = t match {
    case _: MapType => true
    case a: ArrayType => hasMap(a.elementType)
    case s: StructType => s.fields.exists(f => hasMap(f.dataType))
    case _ => false
  }

  /** Effective salt factor: the per-call request, else the session conf,
    * kept only when it actually splits (`s > 1`). */
  def resolve(requested: Option[Int], df: DataFrame): Option[Int] =
    requested
      .orElse(df.sparkSession.conf.getOption(ConfKey).map(_.trim.toInt))
      .filter(_ > 1)

  /** True when the planner's stats rule would pick the BROADCAST variant
    * anyway (right side under `autoBroadcastJoinThreshold`): such a join
    * has no left shuffle and therefore no skewed partition to rescue —
    * salting it would only pay the s-times right replication AND force
    * the slower co-partitioned path. The session-wide conf knob must not
    * defeat the broadcast fast path, so conf-driven (and unpinned
    * per-call) salting yields to this check; pinning
    * `broadcastRight = Some(false)` overrides it (the caller knows the
    * runtime right side outgrows the estimate). */
  def plannerWouldBroadcast(right: DataFrame): Boolean = {
    val thr = right.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val sz = right.queryExecution.optimizedPlan.stats.sizeInBytes
    thr > 0 && sz >= 0 && sz <= thr
  }

  private def requireNoSaltCols(df: DataFrame, side: String): Unit =
    Seq(LeftCol, RightCol).foreach { c =>
      require(!df.columns.contains(c),
        s"skew salt: $side side already has a '$c' column — the salted " +
          "rewrite reserves both salt names on both sides (the post-join " +
          "drop removes them by name from the whole output)")
    }

  /** Left side: deterministic per-row salt in `[0, s)` — a hash of every
    * hashable column (maps are excluded; Spark's `hash` rejects them),
    * falling back to `fallbackCol` for an all-map schema. */
  def saltLeft(left: DataFrame, fallbackCol: String, s: Int): DataFrame = {
    requireNoSaltCols(left, "left")
    val basis = left.schema.fields.filterNot(f => hasMap(f.dataType))
      .map(f => col(f.name)).toSeq
    val salt = pmod(hash((if (basis.nonEmpty) basis
      else Seq(col(fallbackCol))): _*), lit(s))
    left.withColumn(LeftCol, salt)
  }

  /** Right side: replicate every row into all `s` buckets. */
  def replicateRight(right: DataFrame, s: Int): DataFrame = {
    requireNoSaltCols(right, "right")
    right.withColumn(RightCol, explode(sequence(lit(0), lit(s - 1))))
  }
}
