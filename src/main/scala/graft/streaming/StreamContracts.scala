package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Shared ingestion-contract assertions for the streaming operators.
  *
  * The fixture-replay oracles (closed-session rule in [[StatefulSessions]],
  * whole-corpus dedup horizon in [[StreamDedup]]) are only exact when the
  * entire fixture arrives as ONE micro-batch, i.e. the source directory
  * holds exactly one file of the given name. If the fixture is ever split,
  * intermediate watermarks change what is emitted and the batch oracles no
  * longer describe the stream — so fail loudly instead of diverging.
  */
private[streaming] object StreamContracts {

  def requireSingleFile(dir: String, fileName: String): Unit = {
    val listing = Files.list(Paths.get(dir))
    val n =
      try listing.iterator().asScala.count(_.getFileName.toString == fileName)
      finally listing.close()
    require(n == 1,
      s"single-batch ingestion contract: expected exactly one $fileName in $dir, found $n")
  }
}
