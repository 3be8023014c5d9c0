package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) bit interleaving ("A computer oriented geodetic
  * data base and a new technique in file sequencing", Morton, IBM
  * 1966) — the multi-dimensional clustering curve lakehouse formats
  * ship as `OPTIMIZE ... ZORDER BY`. Shared by the parquet-layout op
  * ([[graft.ext.ZOrderLayout]]) and the store's clustered compaction
  * ([[graft.store.Catalog]] `optimize`). Pure codegen'd bit ops —
  * no UDF, no shuffle of its own. */
object Morton {

  /** Bits per dimension: 21 keeps a 2-D interleave inside a 42-bit
    * long with domain headroom of ~2M distinct scaled values. */
  val Bits = 21

  /** Interleave of two non-negative int-scaled keys: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. */
  def interleave(a: Column, b: Column): Column =
    (0 until Bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(
          shiftright(a.cast("long"), i).bitwiseAND(1), 2 * i))
        .bitwiseOR(shiftleft(
          shiftright(b.cast("long"), i).bitwiseAND(1), 2 * i + 1))
    }
}
