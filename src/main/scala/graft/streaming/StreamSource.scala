package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Streaming read of one fixture table, robust to BOTH on-disk layouts:
  * a single parquet FILE named `<name>.parquet` (the driver fixtures) or
  * a DIRECTORY of part files under that name (any Spark-written table —
  * the production layout). The old `pathGlobFilter = <name>.parquet`
  * approach matched no LEAF file under the directory layout, so the
  * stream started, read zero rows, and "succeeded" — found by the 10x
  * scale sweep, where every streaming op ran suspiciously fast against
  * a ScaleData-written (directory) fixture.
  *
  * Either way, every file present at start lands in the FIRST micro-batch
  * (the file source has no maxFilesPerTrigger set), so single-batch
  * ingestion contracts hold under both layouts.
  */
private[streaming] object StreamSource {

  /** `schema` comes from the caller's batch read of the same table (every
    * streaming op already does one for ts-type detection) — passing it in
    * avoids a second footer-listing job per op. */
  def table(spark: SparkSession, dir: String, name: String,
      schema: StructType): DataFrame = {
    val path = java.nio.file.Paths.get(dir, s"$name.parquet")
    if (java.nio.file.Files.isDirectory(path))
      spark.readStream.schema(schema).parquet(path.toString)
    else
      spark.readStream.schema(schema)
        .option("pathGlobFilter", s"$name.parquet").parquet(dir)
  }
}
