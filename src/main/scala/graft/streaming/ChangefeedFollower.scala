package graft.streaming

import org.apache.spark.sql.functions._

import graft.store.Catalog

/** [EXT] a stateful incremental CONSUMER of the store's changefeed —
  * the Delta "CDF as a streaming source" pattern without a long-running
  * query: each tick processes every root version committed past the
  * consumer's ledger watermark, folds the row-level feed into a derived
  * summary table, and advances the watermark — all in ONE transaction,
  * so the summary and the ledger move together (exactly-once under
  * crash/replay: a tick that dies before commit left nothing, a
  * replayed tick sees the advanced watermark and no-ops).
  *
  * The derived state is `events_type_summary`: per event type, row
  * count and exact integer cents. The feed's algebra is the
  * `ext_store_cdc_view` delta application (+1/+cents per insert,
  * −1/−cents per delete; COW-update pairs contribute both sides), so
  * the maintained table equals a from-scratch aggregate of the current
  * snapshot at every watermark — the invariant the gate row
  * `ext_store_cdc_follow` hash-checks and StoreSpec pins per tick.
  *
  * Scale shape: a tick reads the CHANGE-proportional feed (the
  * changefeed opens only files added/removed between the manifests),
  * the ledger probe is a few rows, and the merge rewrites only the
  * summary files hit by changed types — nothing rescans the fact
  * table. Concurrency: the ledger read is in the transaction's read
  * set, so two followers racing the same query name conflict at commit
  * (OCC read-set validation) instead of double-applying a feed; the
  * archived manifests the feed reads are immutable history.
  */
object ChangefeedFollower {

  /** Fold versions `(watermark, cat.version]` of `table`'s changefeed
    * into `events_type_summary`, exactly once. Returns the number of
    * versions advanced (0 when already caught up or the feed slice is
    * empty — an empty feed does NOT commit, so follower self-commits
    * never ratchet the version forever). */
  def tick(cat: Catalog, table: String, query: String): Long = {
    val cur = cat.version
    cat.transaction { tx =>
      import cat.spark.implicits._
      val last = tx.read("stream_offsets")
        .filter(col("query") === query)
        .agg(coalesce(max(col("batch_id")), lit(0L)))
        .head().getLong(0)
      if (last >= cur) 0L
      else {
        val feed = cat.changesBetween(table, last, cur)
        val sign = when(col("_change_type") === "insert", lit(1L))
          .otherwise(lit(-1L))
        val cents = round(col("value") * 100).cast("long")
        val deltas = feed.groupBy("event_type")
          .agg(sum(sign).as("dn"), sum(sign * cents).as("dc"))
        if (deltas.isEmpty) 0L
        else {
          val curSum = tx.read("events_type_summary")
            .select(col("event_type"), col("n_rows"), col("total_cents"))
          val merged = curSum.join(deltas, Seq("event_type"), "full_outer")
            .select(col("event_type"),
              (coalesce(col("n_rows"), lit(0L)) +
                coalesce(col("dn"), lit(0L))).as("n_rows"),
              (coalesce(col("total_cents"), lit(0L)) +
                coalesce(col("dc"), lit(0L))).as("total_cents"))
          tx.merge("events_type_summary", merged, "event_type")
          tx.append("stream_offsets",
            Seq((query, cur)).toDF("query", "batch_id"))
          cur - last
        }
      }
    }
  }
}
