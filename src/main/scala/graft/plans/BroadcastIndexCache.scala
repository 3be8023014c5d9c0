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
    * index strongly only through the lazy slot — the build closure
    * (which captures the broadcast handle and projections) is released
    * once the build succeeds, and kept only if it threw (so a transient
    * failure retries on the next access). A null build result fails
    * loudly instead of spinning the caller's retry loop. */
  private final class Entry(b: () => AnyRef) {
    private var builder: () => AnyRef = b
    lazy val value: AnyRef = {
      val v = builder()
      if (v == null)
        throw new IllegalStateException(
          "broadcast index build returned null")
      builder = null
      v
    }
  }

  private val cache =
    new ConcurrentHashMap[(Long, Int), SoftReference[Entry]]()

  private def sweep(): Unit =
    cache.forEach { (k, ref) => if (ref.get() == null) cache.remove(k, ref) }

  def getOrBuild[T <: AnyRef](broadcastId: Long, planId: Int,
      build: () => T): T = {
    val key = (broadcastId, planId)
    var result: AnyRef = null
    while (result == null) {
      val ref = cache.get(key)
      val entry = if (ref == null) null else ref.get()
      if (entry != null) result = entry.value // hot path: one map read
      else {
        // miss or GC-cleared: sweep tombstones here, OFF the hit path —
        // keys are unique per (broadcast, query plan), so a cleared
        // entry is garbage forever and the map stays bounded at the
        // number of LIVE indexes
        sweep()
        val nref = cache.computeIfAbsent(key,
          _ => new SoftReference(new Entry(build.asInstanceOf[() => AnyRef])))
        val ne = nref.get()
        if (ne != null) result = ne.value
        else cache.remove(key, nref) // cleared between install and read
      }
    }
    result.asInstanceOf[T]
  }

  /** Test hook: live entry count after a sweep. */
  private[graft] def liveEntries: Int = { sweep(); cache.size() }

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
