package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Copy-on-write table store over parquet with a single atomic manifest
  * (SURVEY §7.3).
  *
  * The reference needs mutability (soft delete db.py:327, status flip
  * db.py:459-463) and a two-statement payment write whose intended
  * atomicity it does not actually achieve (autocommit on, SURVEY §0.1.9).
  * Here every commit — single- or multi-table — is one atomic manifest
  * swap: writers stage new snapshot directories, then `mv` a tmp manifest
  * over `_manifest.json`. Readers only ever see a complete manifest, so
  * the payment INSERT and the registration UPDATE become visible together.
  *
  * Scale notes: `update` rewrites only the target table's snapshot (Delta
  * would rewrite matching files only; on the driver image there is no
  * Delta, and the fixture-scale tables are single-snapshot). Surrogate ids
  * are assigned as maxId + dense row_number over a caller-supplied stable
  * order — never `monotonically_increasing_id`, which is partition-
  * dependent and sparse (SURVEY §7.4).
  */
final class Catalog(val spark: SparkSession, val root: String) {

  private val rootPath = Paths.get(root)
  private val manifestPath = rootPath.resolve("_manifest.json")
  Files.createDirectories(rootPath)

  // ---- manifest ----------------------------------------------------------

  /** table -> (snapshot dir name or "" for empty, max assigned id) */
  private type Manifest = Map[String, (String, Long)]

  private def readManifest(): Manifest =
    if (!Files.exists(manifestPath)) Map.empty
    else {
      // minimal flat JSON: {"tbl":["snap-3","17"], ...}
      val txt = new String(Files.readAllBytes(manifestPath),
        StandardCharsets.UTF_8)
      """"([^"]+)":\["([^"]*)","(-?\d+)"\]""".r
        .findAllMatchIn(txt)
        .map(m => m.group(1) -> (m.group(2), m.group(3).toLong))
        .toMap
    }

  private def writeManifest(m: Manifest): Unit = {
    val txt = m.toSeq.sortBy(_._1)
      .map { case (t, (s, id)) => s""""$t":["$s","$id"]""" }
      .mkString("{", ",", "}")
    val tmp = rootPath.resolve(s"_manifest.tmp")
    Files.write(tmp, txt.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- reads -------------------------------------------------------------

  def read(table: String): DataFrame = {
    val (schema, _) = Schemas.registry(table)
    readManifest().get(table) match {
      case Some((snap, _)) if snap.nonEmpty =>
        spark.read.schema(schema).parquet(s"$root/$table/$snap")
      case _ =>
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[Row], schema)
    }
  }

  def maxId(table: String): Long =
    readManifest().get(table).map(_._2).getOrElse(0L)

  // ---- writes ------------------------------------------------------------

  /** One staged write: the new snapshot is on disk but not yet visible. */
  private case class Staged(table: String, snap: String, newMaxId: Long,
      lastId: Long)

  private var snapCounter = System.currentTimeMillis()

  private def stageSnapshot(table: String, df: DataFrame,
      newMaxId: Long, lastId: Long): Staged = {
    snapCounter += 1
    val snap = s"snap-$snapCounter"
    df.write.mode("overwrite").parquet(s"$root/$table/$snap")
    Staged(table, snap, newMaxId, lastId)
  }

  private def commit(staged: Seq[Staged]): Unit = {
    val m = readManifest()
    writeManifest(m ++ staged.map(s =>
      s.table -> (s.snap, s.newMaxId)).toMap)
  }

  /** Multi-statement transaction (S7): stage every write, swap once. */
  final class Tx private[Catalog] () {
    private[Catalog] var staged: Vector[Staged] = Vector.empty
    /** current in-tx view of a table (staged writes visible). */
    def read(table: String): DataFrame =
      staged.reverse.find(_.table == table) match {
        case Some(s) =>
          spark.read.schema(Schemas.registry(table)._1)
            .parquet(s"$root/$table/${s.snap}")
        case None => Catalog.this.read(table)
      }
    private def curMaxId(table: String): Long =
      staged.reverse.find(_.table == table).map(_.newMaxId)
        .getOrElse(maxId(table))

    /** Append rows, assigning dense surrogate ids; returns the LAST id
      * (lastrowid parity, db.py:213/345/466). `orderBy` fixes the id
      * order for multi-row appends. */
    def append(table: String, rows: DataFrame,
        orderBy: Seq[String] = Nil): Long = {
      val (schema, idCol) = Schemas.registry(table)
      val base = curMaxId(table)
      val ord = if (orderBy.nonEmpty) orderBy.map(col)
        else rows.columns.map(col).toSeq
      val withIds = rows
        .withColumn(idCol,
          lit(base) + row_number().over(Window.orderBy(ord: _*)))
        .select(schema.fieldNames.map(col): _*)
      val n = rows.count()
      val newMax = base + n
      val merged = Tx.this.read(table).unionByName(withIds)
      staged :+= stageSnapshot(table, merged, newMax, newMax)
      newMax
    }

    /** COW update: predicate + per-column assignments (S6). */
    def update(table: String, predicate: Column,
        assignments: Map[String, Column]): Unit = {
      val cur = Tx.this.read(table)
      val updated = assignments.foldLeft(cur) { case (df, (c, v)) =>
        df.withColumn(c, when(predicate, v).otherwise(col(c)))
      }
      staged :+= stageSnapshot(table, updated, curMaxId(table),
        curMaxId(table))
    }
  }

  /** Run `body` against a transaction; all staged writes become visible
    * atomically at the end (or not at all if body throws). */
  def transaction[A](body: Tx => A): A = synchronized {
    val tx = new Tx
    val out = body(tx)
    commit(tx.staged)
    out
  }

  /** Single-statement conveniences. */
  def append(table: String, rows: DataFrame,
      orderBy: Seq[String] = Nil): Long =
    transaction(_.append(table, rows, orderBy))

  def update(table: String, predicate: Column,
      assignments: Map[String, Column]): Unit =
    transaction(_.update(table, predicate, assignments))
}
