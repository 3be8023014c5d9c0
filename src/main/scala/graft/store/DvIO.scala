package graft.store

import java.io.{DataInputStream, DataOutputStream}

/** Deletion-vector sidecar IO (round 15 merge-on-read): one immutable
  * file under `_dv/` per (data file, commit) listing the surrogate ids
  * a commit marked dead in that data file — the Delta deletion-vector
  * idea with the id domain graft already has (dense, unique,
  * never-reused surrogate ids; a sorted long list IS the bitmap).
  *
  * Why sidecars and not inline manifest entries: a DV can carry up to a
  * file's whole row count (~10⁶ ids at 128 MB files); inline it would
  * bloat every delta and checkpoint row touching the file, while a
  * sidecar costs the manifest 1 path + 1 count and the log stays
  * delta-proportional. Sidecars are immutable and content-addressed by
  * UUID — a later delete on the same file writes a NEW sidecar carrying
  * the union, old snapshots keep referencing the old one (time travel),
  * and vacuum retires unreferenced sidecars by the same age rules as
  * data files.
  *
  * IO goes through the [[StoreIO]] SPI (round 18) — sidecars live
  * beside the data on whatever filesystem the root is on. Content is
  * bounded (changed-rows-sized by the merge-on-read contract, and the
  * driver materializes the id array either way), so whole-buffer
  * read/write is the right shape on every FS.
  *
  * Format: magic `GDV1`, int count, count longs ascending. Read is a
  * single buffered driver-side pass; [[read]] validates magic and
  * sortedness so fsck can diagnose corruption precisely. */
private[store] object DvIO {

  val DirName = "_dv"
  private val Magic = 0x47445631 // "GDV1"

  /** Write `ids` (deduped, sorted here) as a new sidecar (tmp + atomic
    * rename, same protocol as every log file); returns (root-relative
    * path, dead count) for the manifest entry. */
  def write(io: StoreIO, root: String,
      ids: Iterable[Long]): (String, Long) = {
    val sorted = ids.toArray.distinct.sorted
    require(sorted.nonEmpty, "deletion vector must carry at least one id")
    val dir = io.resolve(root, DirName)
    io.mkdirs(dir)
    val name = s"${java.util.UUID.randomUUID().toString}.dv"
    val buf = new java.io.ByteArrayOutputStream(8 + sorted.length * 8)
    val out = new DataOutputStream(buf)
    out.writeInt(Magic)
    out.writeInt(sorted.length)
    sorted.foreach(out.writeLong)
    out.flush()
    val tmp = io.resolve(dir, name + ".tmp")
    io.write(tmp, buf.toByteArray)
    io.rename(tmp, io.resolve(dir, name))
    (s"$DirName/$name", sorted.length.toLong)
  }

  def read(io: StoreIO, root: String, rel: String): Array[Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(
      io.readAllBytes(io.resolve(root, rel))))
    try {
      val m = in.readInt()
      if (m != Magic) throw new IllegalStateException(
        s"deletion vector '$rel' has bad magic 0x${m.toHexString}")
      val n = in.readInt()
      val out = new Array[Long](n)
      var i = 0
      var prev = Long.MinValue
      while (i < n) {
        val v = in.readLong()
        if (v <= prev) throw new IllegalStateException(
          s"deletion vector '$rel' ids not strictly ascending at #$i")
        out(i) = v; prev = v; i += 1
      }
      out
    } finally in.close()
  }
}
