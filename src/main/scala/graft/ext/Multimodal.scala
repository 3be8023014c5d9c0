package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.types._

import graft.core.{Q, Tables}

/** [EXT] multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata alongside.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`fakeDecode`) — what is real and
  * tested is the Spark-side shape: binary columns, per-partition batched
  * processing (`mapPartitions`, the Scala analogue of `mapInPandas`
  * batching), a stable metadata schema, and partition-count-independent
  * results. Swapping `fakeDecode` for a real codec is a one-function
  * change.
  */
object Multimodal {

  /** Byte-level metadata over a binary column — fully oracle-checked
    * (blob length, sha256, first-8-bytes hex). The binary column is
    * manufactured from `text` since fixtures carry no media; the plumbing
    * is representation-agnostic. */
  val binaryMeta: Q = Q(
    "ext_mm_binary_meta",
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |sha256(text) AS content_sha,
      |lower(substr(hex(encode(text)), 1, 16)) AS magic
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .select(col("doc_id"),
        length(col("blob")).cast("long").as("n_bytes"),
        sha2(col("blob"), 256).as("content_sha"),
        lower(hex(substring(col("blob"), 1, 8))).as("magic"))
      .orderBy("doc_id")
  }

  /** One decoded media item (stub features) + its resize plan: target
    * dims aspect-fit into [[FitBox]] x [[FitBox]] (the standard model-
    * input preprocessing step), computed with integer arithmetic so the
    * plan is deterministic. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int,
      dominant: Double, target_w: Int, target_h: Int)

  private val FitBox = 224

  /** Aspect-preserving fit of (w, h) into FitBox x FitBox — the longer
    * side becomes FitBox, the shorter scales by the same integer-rounded
    * factor (never upscaled past the box). */
  private[ext] def fitDims(w: Int, h: Int): (Int, Int) =
    if (w >= h) (FitBox, math.max(1, (h.toLong * FitBox / w).toInt))
    else (math.max(1, (w.toLong * FitBox / h).toInt), FitBox)

  /** STUB decoder — stands in for an image/audio codec. Deterministic pure
    * function of the bytes so tests are stable; a real implementation
    * would decode `bytes` here (batch-at-a-time, inside a partition). */
  private[ext] def fakeDecode(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    var h = 1125899906842597L // deterministic FNV-ish fold, NOT a codec
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val pos = math.abs(h)
    val w = 64 + (pos % 512).toInt
    val ht = 64 + ((pos >> 9) % 512).toInt
    val (tw, th) = fitDims(w, ht)
    MediaFeatures(
      doc_id = docId,
      n_bytes = bytes.length,
      width = w,
      height = ht,
      n_frames = 1 + (bytes.length / 1024),
      dominant = (pos % 1000) / 1000.0,
      target_w = tw,
      target_h = th)
  }

  /** Decode / feature-extract pipeline: binary column in, typed features
    * out, batched per partition. Rows-only gate; the spec asserts values
    * and partition-invariance. */
  val decodeFeatures: Q = Q.noOracle("ext_mm_decode_features") { (s, d) =>
    val src = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    implicit val enc = Encoders.product[MediaFeatures]
    src.mapPartitions { rows =>
      // real codecs amortize setup per batch here (open decoder once)
      rows.map(r => fakeDecode(r.getLong(0), r.getAs[Array[Byte]](1)))
    }.toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling shape: explode a per-item frame index range (stub
    * frame ids; a real pipeline replaces the id with decoded frame bytes).
    * Demonstrates fan-out of one media row into N frame rows without
    * skew (frames of one item stay in one partition). The frame count is
    * pure arithmetic on byte length, so it is fully oracle-checked. */
  val frameSample: Q = Q(
    "ext_mm_frame_sample",
    """SELECT doc_id, frame_idx, doc_id || ':' || frame_idx AS frame_key
      |FROM (
      |  SELECT doc_id, unnest(generate_series(0, n_frames - 1)) AS frame_idx
      |  FROM (SELECT doc_id,
      |          least(8, octet_length(encode(text)) // 256 + 1) AS n_frames
      |        FROM documents))
      |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .select(col("doc_id"), length(col("blob")).as("n_bytes"))
      // sample every ~256 bytes as a stand-in frame cadence, cap 8
      .select(col("doc_id"),
        least(lit(8), (col("n_bytes") / 256) + 1).cast("int").as("n_frames"))
    src.select(col("doc_id"),
      explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_key",
        concat(col("doc_id"), lit(":"), col("frame_idx")))
      .orderBy("doc_id", "frame_idx")
  }

  val all: Seq[Q] = Seq(binaryMeta, decodeFeatures, frameSample)
}
