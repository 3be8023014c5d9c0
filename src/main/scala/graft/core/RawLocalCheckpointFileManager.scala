package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.checkpointing.FileContextBasedCheckpointFileManager

/** Streaming [[org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager]]
  * that drops Hadoop's client-side CRC mirror for `file:` checkpoints
  * (round 20, guide §1/§6 — measure the machinery, then remove the part
  * that does no work).
  *
  * Structured Streaming writes its WAL (offsets/commits), the file-source
  * log and every HDFSBackedStateStore delta/snapshot through a
  * CheckpointFileManager; the default FileContext binding for `file:` is
  * `LocalFs`, a [[org.apache.hadoop.fs.ChecksumFs]] that shadows every
  * checkpoint file with a `.crc` sibling — doubling the create+rename
  * count and re-reading data on open to verify. That CRC mirror emulates
  * HDFS's integrity layer for plain local disks; on a real deployment the
  * checkpoint lives on HDFS / an object store whose OWN integrity layer
  * does this job (and whose AbstractFileSystem binding this class does not
  * touch — the override below keys only the `file:` scheme), so the local
  * mirror is pure per-micro-batch overhead: measured on the 23-row
  * streaming gate family it is 2 file ops per WAL entry and 2 per state
  * store partition per batch.
  *
  * Wiring: `spark.sql.streaming.checkpointFileManagerClass` (set in
  * [[Sessions.tune]]) — per-path construction, so any checkpoint that is
  * NOT on `file:` resolves through its scheme's unmodified binding.
  * Rename-based atomic create semantics are unchanged:
  * [[FileContextBasedCheckpointFileManager]] does the temp-file + rename
  * dance, and `RawLocalFs.rename` is the same POSIX rename(2) that
  * `LocalFs` ultimately issues.
  */
class RawLocalCheckpointFileManager(path: Path, conf: Configuration)
  extends FileContextBasedCheckpointFileManager(
    path, RawLocalCheckpointFileManager.withRawLocalFs(conf))

object RawLocalCheckpointFileManager {
  /** A copy of `conf` whose `file:` AbstractFileSystem binding is the
    * checksum-free [[org.apache.hadoop.fs.local.RawLocalFs]]. Copying
    * keeps the override out of the session-wide Configuration (parquet
    * and store I/O keep their defaults). */
  private def withRawLocalFs(conf: Configuration): Configuration = {
    val c = new Configuration(conf)
    c.set("fs.AbstractFileSystem.file.impl",
      "org.apache.hadoop.fs.local.RawLocalFs")
    c
  }
}
