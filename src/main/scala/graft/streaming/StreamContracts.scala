package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Shared ingestion-contract assertions for the streaming operators.
  *
  * The fixture-replay oracles (closed-session rule in [[StatefulSessions]],
  * whole-corpus dedup horizon in [[StreamDedup]]) are only exact when the
  * entire fixture arrives as ONE micro-batch. Two layouts satisfy that:
  * a single parquet FILE of the given name (the driver fixtures), or a
  * DIRECTORY of part files all present before the stream starts — the
  * file source puts every available file in batch 0 because
  * [[StreamSource]] never sets `maxFilesPerTrigger` (if that option is
  * ever introduced, this contract must grow a per-batch file budget).
  * Fail loudly on anything else instead of letting intermediate
  * watermarks silently diverge from the batch oracles.
  */
private[streaming] object StreamContracts {

  def requireSingleBatch(dir: String, fileName: String): Unit = {
    val path = Paths.get(dir, fileName)
    require(Files.exists(path),
      s"single-batch ingestion contract: $fileName not found in $dir")
    if (Files.isDirectory(path)) {
      val listing = Files.list(path)
      val parts =
        try listing.iterator().asScala
          .count(_.getFileName.toString.endsWith(".parquet"))
        finally listing.close()
      require(parts >= 1,
        s"single-batch ingestion contract: directory $fileName in $dir " +
          s"holds no parquet part files — the stream would read nothing " +
          "and 'succeed'")
    }
  }
}
