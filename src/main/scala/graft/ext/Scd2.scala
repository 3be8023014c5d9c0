package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] SCD Type-2 history derivation — the dimensional-ETL operator a
  * warehouse builds its slowly-changing dimensions with (Kimball SCD2:
  * one row per VALUE EPISODE of a tracked attribute, with
  * effective_from / effective_to validity interval and an is_current
  * flag).
  *
  * The fixture's change stream is `events`: per user, the event_type
  * sequence ordered by (ts, event_id) is treated as observations of a
  * tracked attribute. Consecutive equal observations do NOT open a new
  * version (SCD2 only versions on CHANGE), so the operator is: detect
  * change points with `lag`, then close each episode with the next
  * change point's timestamp via `lead` — two window passes over the
  * same (user_id, ts, event_id) sort, which Spark executes as ONE
  * shuffle + sort reused by both window frames (the second Window has
  * the identical partitioning/ordering, so no extra exchange).
  *
  * At 100 TB this is the shape that matters: per-key windows over a
  * keyed sort, no self-join (the naive interval build joins the change
  * table to itself per key), no driver-side state. The tie order inside
  * equal timestamps is pinned by event_id in BOTH engines, so the
  * derived intervals hash-match. The STORE-side path — maintaining such
  * a dimension incrementally under upsert batches — is
  * [[graft.store.Catalog.Tx.scd2Merge]], spec-verified in StoreSpec;
  * this gate row pins the semantics both must agree on.
  */
object Scd2 {

  val history: Q = Q(
    "ext_scd2_history",
    """WITH obs AS (
      |  SELECT user_id, ts, event_id, event_type FROM events),
      |marked AS (
      |  SELECT *, lag(event_type) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM obs),
      |changes AS (
      |  SELECT user_id, ts, event_id, event_type FROM marked
      |  WHERE prev IS NULL OR prev <> event_type),
      |seg AS (
      |  SELECT user_id,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS version,
      |    event_type AS state, ts AS effective_from,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS effective_to
      |  FROM changes)
      |SELECT user_id, version, state, effective_from, effective_to,
      |  (effective_to IS NULL) AS is_current
      |FROM seg ORDER BY user_id, version""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(col("user_id"),
        row_number().over(w).cast("long").as("version"),
        col("event_type").as("state"),
        col("ts").as("effective_from"),
        lead(col("ts"), 1).over(w).as("effective_to"))
      .withColumn("is_current", col("effective_to").isNull)
      .orderBy("user_id", "version")
  }

  val all: Seq[Q] = Seq(history)
}
