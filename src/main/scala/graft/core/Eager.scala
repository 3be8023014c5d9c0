package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Eager local checkpointing with SERIALIZED block storage.
  *
  * `df.localCheckpoint(true)` stores blocks MEMORY_AND_DISK *deserialized*,
  * and putting a deserialized block makes the executor estimate its size by
  * walking the object graph (`SizeEstimator.visitSingleObject` +
  * an IdentityHashMap over every reachable object). For the dedup/corpus
  * working sets — millions of small UTF8String shingles per partition —
  * that walk was THE measured source of the bench's residual run-to-run
  * lottery: 1 Hz stack sampling over 8 minhash repetitions (committed in
  * bench/r6_evidence/) shows slow runs pinned in SizeEstimator /
  * IdentityHashMap.resize inside otherwise-cheap 1-2-task stages, with
  * gc=0 and jit=0; runs whose estimator sampling got lucky finish 3-4x
  * faster on identical data.
  *
  * Serialized storage removes the estimator from the loop entirely — the
  * block's size IS the byte buffer's length — at the price of one
  * serialization pass (UnsafeRow payloads copy as bytes) and per-read
  * deserialization. For checkpoint-once / read-2-3-times intermediates
  * that trade wins at any scale, and block sizes become exact instead of
  * estimated (safer memory accounting on real executors, where an
  * under-ESTIMATED deserialized block is how storage OOMs happen).
  */
object Eager {
  implicit class EagerCheckpoint[T](private val ds: Dataset[T])
      extends AnyVal {
    /** Eager serialized local checkpoint — use instead of
      * `localCheckpoint(true)` for every pipeline intermediate. */
    def eagerCheckpoint(): Dataset[T] =
      ds.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
  }
}
