package graft.store.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.StructType

/** Merge-on-read masking for the SQL front door: wraps the parquet scan
  * so rows a deletion vector marked dead never surface through
  * `spark.sql`, Delta-DV-style.
  *
  * Mechanics: input partitions are re-planned ONE FILE PER PARTITION
  * whenever the snapshot carries any DV (per-row file attribution is
  * what makes per-file masks applicable — a packed multi-file partition
  * doesn't delimit files in its row stream), then each partition whose
  * file has a DV reads through a row filter on the surrogate-id column
  * (binary search in the sorted dead-id array). A DV-carrying scan runs
  * row-based end to end (Spark forbids mixing row and columnar
  * partitions in one scan) — the price of pending merge-on-read churn,
  * paid until compaction folds the DVs; clean snapshots never construct
  * this wrapper and keep full vectorization. The id column is forced
  * into the read schema by
  * [[GraftScanBuilder]] when DVs exist; Spark's projection above the
  * scan restores the user's column list. */
private[store] final class DvMaskedScan(
    private[store] val inner: Scan,
    dvByAbsPath: Map[String, Array[Long]], idCol: String)
    extends Scan with Batch {

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String =
    s"${inner.description()} [graft: ${dvByAbsPath.size} deletion-" +
      "vector-masked file(s)]"
  override def toBatch: Batch = this

  private def innerBatch: Batch = inner.toBatch

  override def planInputPartitions(): Array[InputPartition] =
    innerBatch.planInputPartitions().flatMap {
      case fp: FilePartition if fp.files.length > 1 =>
        // split so each partition is attributable to one file
        fp.files.zipWithIndex.map { case (f, i) =>
          FilePartition(fp.index * 4096 + i, Array(f))
        }.toSeq
      case p => Seq(p)
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new DvMaskedReaderFactory(innerBatch.createReaderFactory(),
      dvByAbsPath, readSchema().fieldIndex(idCol))
}

private[sql] final class DvMaskedReaderFactory(
    inner: PartitionReaderFactory, dvByAbsPath: Map[String, Array[Long]],
    idOrdinal: Int) extends PartitionReaderFactory {

  private def deadFor(p: InputPartition): Option[Array[Long]] = p match {
    case fp: FilePartition =>
      // single-file partitions by construction (see planInputPartitions)
      fp.files.headOption.flatMap { f =>
        val abs = f.toPath.toUri.getPath
        dvByAbsPath.get(abs)
      }
    case _ => None
  }

  // Spark requires every partition of one scan to agree row-vs-columnar
  // ("Cannot mix row-based and columnar input partitions"), so a
  // DV-carrying snapshot reads the WHOLE scan row-based — the price of
  // pending merge-on-read churn, paid until compaction folds the DVs
  // (clean snapshots never reach this factory and keep vectorization)
  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val r = inner.createReader(p)
    deadFor(p) match {
      case None => r
      case Some(dead) => new PartitionReader[InternalRow] {
        private var cur: InternalRow = _
        override def next(): Boolean = {
          while (r.next()) {
            val row = r.get()
            if (java.util.Arrays.binarySearch(dead,
                row.getLong(idOrdinal)) < 0) {
              cur = row
              return true
            }
          }
          false
        }
        override def get(): InternalRow = cur
        override def close(): Unit = r.close()
      }
    }
  }
}
