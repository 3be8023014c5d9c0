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
  *
  * Exactly ONE build runs per (broadcast, plan) even under a parallel
  * cold start: the value is a memoizing thunk installed atomically via
  * `computeIfAbsent`, so racing first-touch tasks converge on a single
  * `lazy val` build while later tasks read the finished index. Entries
  * whose referent was GC-cleared are purged on the next lookup (the
  * whole map is swept, not just the touched key), so dead
  * (broadcastId, planId) keys — unique per query — cannot accumulate
  * as tombstones over an executor's lifetime.
  */
private[graft] object BroadcastIndexCache {
  /** Memoizes `build()` exactly once across racing callers (lazy val's
    * JVM-guaranteed single evaluation) while staying reclaimable: the
    * cache map soft-references the ENTRY, and the entry holds the built
    * index strongly only through the lazy slot. */
  private final class Entry(build: () => AnyRef) {
    lazy val value: AnyRef = build()
  }

  private val cache =
    new ConcurrentHashMap[(Long, Int), SoftReference[Entry]]()

  def getOrBuild[T <: AnyRef](broadcastId: Long, planId: Int,
      build: () => T): T = {
    // sweep cleared referents: keys are unique per (broadcast, query
    // plan), so a cleared entry is garbage forever — removing it here
    // bounds the map at the number of LIVE indexes
    cache.forEach { (k, ref) =>
      if (ref.get() == null) cache.remove(k, ref)
    }
    val key = (broadcastId, planId)
    var result: AnyRef = null
    while (result == null) {
      val ref = cache.computeIfAbsent(key,
        _ => new SoftReference(new Entry(build.asInstanceOf[() => AnyRef])))
      val entry = ref.get()
      if (entry != null) result = entry.value
      else cache.remove(key, ref) // cleared between install and read: retry
    }
    result.asInstanceOf[T]
  }

  /** Test hook: live entry count after a sweep. */
  private[graft] def liveEntries: Int = {
    cache.forEach { (k, ref) => if (ref.get() == null) cache.remove(k, ref) }
    cache.size()
  }

  /** Test hook: raw entry count, cleared referents included. */
  private[graft] def rawEntries: Int = cache.size()

  /** Test hook: simulate the GC clearing one entry's referent. */
  private[graft] def clearReferentForTest(broadcastId: Long,
      planId: Int): Unit = {
    val ref = cache.get((broadcastId, planId))
    if (ref != null) ref.clear()
  }

  /** Test hook: drop everything (isolates cache-behavior specs). */
  private[graft] def clear(): Unit = cache.clear()
}
