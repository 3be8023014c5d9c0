package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}
import graft.store.Catalog

/** [EXT] gate-visible row-level changefeed over the COW store
  * ([[Catalog.changesBetween]] — the Delta CDF / Iceberg changelog
  * analogue).
  *
  * Fixture prep stages a THREE-version store root ([[PreparedTables]]
  * memo): version 1 appends the events fixture's `event_id <= V1Max`
  * slice into `events_ingest` (dense ingest ids assigned in event_id
  * order), version 2 is ONE transaction that hard-deletes every
  * 'error' row and appends the `(V1Max, V2Max]` slice, and version 3
  * is a COW UPDATE doubling every click's value (feeding
  * [[timetravel]] and [[updatePairs]]). The [[changefeed]] gate query
  * reads the v1→v2 changefeed; because COW carries untouched rows
  * through both manifests, the file-level diff equals the full multiset
  * difference of the two snapshots, which the DuckDB oracle — blind to
  * the store — recomputes from the raw fixture with the same
  * `EXCEPT ALL` semantics after replaying the id assignment
  * (`row_number` in event_id order = the store's range-partitioned
  * zipWithIndex order).
  *
  * At 100 TB a CDC tick's changefeed reads only the files added/removed
  * between the versions (see [[Catalog.changesBetween]]); the staged
  * fixture keeps that property observable at test scale — the carried
  * rows cancel, the feed is exactly the delete set + the insert set.
  */
object StoreFeed {

  private val V1Max = 2000L
  private val V2Max = 3000L

  private def ingestCols(df: DataFrame): DataFrame =
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")

  private def rootDir(s: SparkSession): String =
    new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
      .stripSuffix("/") + "/graft_cdc_root"

  private val prepared = new PreparedTables(
    Seq("events.parquet"), Seq("graft_cdc_root"), write)

  def ensurePrepared(s: SparkSession, d: String): Unit =
    prepared.ensurePrepared(s, d)

  /** Build the three committed versions on a fresh root (PreparedTables
    * has already cleared the directory, so versions are exactly 1, 2,
    * 3): v1 = base slice append; v2 = delete errors + append the next
    * slice (the changefeed tick); v3 = an in-place UPDATE doubling
    * every click's value (the update-pairing tick — COW rewrites the
    * files, untouched residents cancel in the feed). */
  private def write(s: SparkSession, d: String): Unit = {
    val cat = new Catalog(s, rootDir(s))
    require(cat.version == 0L,
      s"stale graft_cdc_root (v${cat.version}) survived fixture prep")
    val ev = ingestCols(Tables.events(s, d))
    cat.append("events_ingest", ev.filter(col("event_id") <= V1Max),
      orderBy = Seq("event_id"))
    cat.transaction { tx =>
      tx.delete("events_ingest", col("event_type") === "error")
      tx.append("events_ingest",
        ev.filter(col("event_id") > V1Max && col("event_id") <= V2Max),
        orderBy = Seq("event_id"))
    }
    cat.update("events_ingest", col("event_type") === "click",
      Map("value" -> (col("value") * 2)))
  }

  val changefeed: Q = Q(
    "ext_store_changefeed",
    s"""WITH f AS (SELECT event_id, ts, user_id, event_type, value, props
       |  FROM events),
       |v1 AS (SELECT row_number() OVER (ORDER BY event_id) AS ingest_id, *
       |  FROM f WHERE event_id <= $V1Max),
       |b2 AS (SELECT (SELECT COALESCE(MAX(ingest_id), 0) FROM v1)
       |    + row_number() OVER (ORDER BY event_id) AS ingest_id, *
       |  FROM f WHERE event_id > $V1Max AND event_id <= $V2Max),
       |v2 AS (SELECT * FROM v1 WHERE event_type <> 'error'
       |  UNION ALL SELECT * FROM b2),
       |ins AS (SELECT *, 'insert' AS _change_type FROM
       |  (SELECT * FROM v2 EXCEPT ALL SELECT * FROM v1)),
       |del AS (SELECT *, 'delete' AS _change_type FROM
       |  (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v2))
       |SELECT ingest_id, event_id, ts, user_id, event_type, value, props,
       |  _change_type
       |FROM (SELECT * FROM ins UNION ALL SELECT * FROM del)
       |ORDER BY _change_type, ingest_id""".stripMargin
  ) { (s, d) =>
    ensurePrepared(s, d)
    new Catalog(s, rootDir(s))
      .changesBetween("events_ingest", 1L, 2L)
      .orderBy("_change_type", "ingest_id")
  }.copy(setup = Some(ensurePrepared _))

  /** Time travel (`VERSION AS OF` analogue): the table exactly as
    * commit v1 left it, read AFTER two further commits (a delete+append
    * tick and a COW update) have rewritten the current state — the
    * oracle replays v1 from the raw fixture with the same dense-id
    * assignment, so a single leaked later-version row or a missing
    * original goes hash-red. Snapshot isolation made observable: COW
    * never mutates a committed file, the v1 manifest still references
    * the original bytes. */
  val timetravel: Q = Q(
    "ext_store_timetravel",
    s"""WITH f AS (SELECT event_id, ts, user_id, event_type, value, props
       |  FROM events),
       |v1 AS (SELECT row_number() OVER (ORDER BY event_id) AS ingest_id, *
       |  FROM f WHERE event_id <= $V1Max)
       |SELECT ingest_id, event_id, ts, user_id, event_type, value, props
       |FROM v1 ORDER BY ingest_id""".stripMargin
  ) { (s, d) =>
    ensurePrepared(s, d)
    new Catalog(s, rootDir(s))
      .readAt("events_ingest", 1L)
      .orderBy("ingest_id")
  }.copy(setup = Some(ensurePrepared _))

  /** Update pairing (the Delta CDF `update_preimage`/`update_postimage`
    * shape, [[Catalog.changesWithUpdates]]): the v2→v3 feed is a pure
    * COW UPDATE (clicks' value doubled), so every changed ingest_id
    * appears on BOTH sides and must be tagged as one logical update —
    * its delete row the preimage, its insert row the postimage — while
    * the rewrite's untouched residents cancel entirely. The oracle
    * recomputes the same multiset difference and pairing from the raw
    * fixture. */
  val updatePairs: Q = Q(
    "ext_store_update_pairs",
    s"""WITH f AS (SELECT event_id, ts, user_id, event_type, value, props
       |  FROM events),
       |v1 AS (SELECT row_number() OVER (ORDER BY event_id) AS ingest_id, *
       |  FROM f WHERE event_id <= $V1Max),
       |b2 AS (SELECT (SELECT COALESCE(MAX(ingest_id), 0) FROM v1)
       |    + row_number() OVER (ORDER BY event_id) AS ingest_id, *
       |  FROM f WHERE event_id > $V1Max AND event_id <= $V2Max),
       |v2 AS (SELECT * FROM v1 WHERE event_type <> 'error'
       |  UNION ALL SELECT * FROM b2),
       |v3 AS (SELECT ingest_id, event_id, ts, user_id, event_type,
       |  CASE WHEN event_type = 'click' THEN value * 2 ELSE value END
       |    AS value, props FROM v2),
       |ch AS (
       |  SELECT *, 'insert' AS ct FROM
       |    (SELECT * FROM v3 EXCEPT ALL SELECT * FROM v2)
       |  UNION ALL
       |  SELECT *, 'delete' AS ct FROM
       |    (SELECT * FROM v2 EXCEPT ALL SELECT * FROM v3)),
       |u AS (SELECT ingest_id FROM ch
       |  GROUP BY ingest_id HAVING COUNT(DISTINCT ct) = 2)
       |SELECT ingest_id, event_id, ts, user_id, event_type, value, props,
       |  CASE WHEN u.ingest_id IS NOT NULL AND ct = 'delete'
       |         THEN 'update_preimage'
       |       WHEN u.ingest_id IS NOT NULL AND ct = 'insert'
       |         THEN 'update_postimage'
       |       ELSE ct END AS _change_type
       |FROM ch LEFT JOIN u USING (ingest_id)
       |ORDER BY ingest_id, _change_type""".stripMargin
  ) { (s, d) =>
    ensurePrepared(s, d)
    new Catalog(s, rootDir(s))
      .changesWithUpdates("events_ingest", 2L, 3L)
      .orderBy("ingest_id", "_change_type")
  }.copy(setup = Some(ensurePrepared _))

  val all: Seq[Q] = Seq(changefeed, timetravel, updatePairs)
}
