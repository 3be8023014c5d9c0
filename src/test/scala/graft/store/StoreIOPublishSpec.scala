package graft.store

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkSuite

/** The conditional-publish contract (round 19, ADVICE r18 high): for
  * EVERY StoreIO binding, `renameIfAbsent` onto an existing destination
  * must return false and must NOT clobber the destination's bytes — the
  * store-side commit fence rests on exactly this refusal. The r18 gap:
  * `RawLocalFileSystem.rename` delegates to `File.renameTo` (POSIX
  * rename(2)), which silently REPLACES the destination and returns
  * true, so the Hadoop binding's fence was a no-op on local paths; the
  * local binding's exists-then-ATOMIC_MOVE had a narrower race of the
  * same shape (now a genuinely atomic hard-link publish).
  */
class StoreIOPublishSpec extends SparkSuite {

  private def bindings: Seq[(String, StoreIO)] = Seq(
    "local" -> new LocalStoreIO,
    "hadoop" -> StoreIO.hadoop(spark),
    "objectstore" -> new ObjectStoreSemanticsIO)

  for ((name, io) <- bindings) {
    test(s"$name: renameIfAbsent refuses an existing destination " +
      "and preserves its bytes") {
      val dir = Files.createTempDirectory("graft_io_pub").toString
      val dst = io.resolve(dir, "v1.json")
      val tmp = io.resolve(dir, "v1.json.stage.tmp")
      io.write(dst, "WINNER".getBytes(UTF_8))
      io.write(tmp, "LOSER".getBytes(UTF_8))
      assert(!io.renameIfAbsent(tmp, dst),
        s"$name renameIfAbsent must refuse an existing destination")
      assert(new String(io.readAllBytes(dst), UTF_8) == "WINNER",
        s"$name renameIfAbsent clobbered a landed commit")
    }

    test(s"$name: renameIfAbsent publishes onto a fresh destination " +
      "and consumes the source") {
      val dir = Files.createTempDirectory("graft_io_pub").toString
      val dst = io.resolve(dir, "v2.json")
      val tmp = io.resolve(dir, "v2.json.stage.tmp")
      io.write(tmp, "BYTES".getBytes(UTF_8))
      assert(io.renameIfAbsent(tmp, dst))
      assert(new String(io.readAllBytes(dst), UTF_8) == "BYTES")
      assert(!io.exists(tmp), s"$name renameIfAbsent left the source")
    }
  }
}
