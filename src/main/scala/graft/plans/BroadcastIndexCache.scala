package graft.plans

import java.lang.ref.SoftReference
import java.util.concurrent.ConcurrentHashMap

/** Executor-side build-once cache for the broadcast join variants'
  * per-key indexes ([[BroadcastAsOfJoinExec]], [[BroadcastIntervalJoinExec]]).
  *
  * `BroadcastHashJoinExec` ships a pre-built `HashedRelation`, so every
  * task shares one build per executor. These operators broadcast raw
  * rows (`IdentityBroadcastMode`) and build their sorted per-key index
  * executor-side — without a cache that build repeats PER PARTITION,
  * which at 100 TB task counts multiplies a dimension-sized sort by the
  * task count. The cache keys on (broadcast id, plan id) — the same
  * broadcast variable could feed two different joins with different key
  * expressions — and holds soft references so memory pressure can
  * reclaim idle indexes (a reclaimed entry just rebuilds).
  */
private[plans] object BroadcastIndexCache {
  private val cache =
    new ConcurrentHashMap[(Long, Int), SoftReference[AnyRef]]()

  def getOrBuild[T <: AnyRef](broadcastId: Long, planId: Int,
      build: () => T): T = {
    val key = (broadcastId, planId)
    val ref = cache.get(key)
    val cached = if (ref == null) null else ref.get()
    if (cached != null) cached.asInstanceOf[T]
    else {
      // racing tasks may build twice; both results are identical and the
      // last write wins — cheaper than locking every lookup
      val built = build()
      cache.put(key, new SoftReference[AnyRef](built))
      built
    }
  }
}
