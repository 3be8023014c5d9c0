package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.Catalog

/** Scratch probe (not a suite): what does Spark 4.1 do TODAY with
  * UPDATE / DELETE / MERGE SQL against the graft DSv2 catalog?
  * Prints the analyzed plan (or the failure point) for each shape so
  * the SQL-DML router can be built against observed behavior, not
  * guessed behavior. Run: sbt "Test/runMain graft.SqlDmlProbe". */
object SqlDmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.tune(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    val root = java.nio.file.Files
      .createTempDirectory("graft_dml_probe").toString
    val cat = new Catalog(spark, root)
    import spark.implicits._
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("event_id", "event_type", "value")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("user_id", col("event_id") * 10)
      .withColumn("props", lit("{}"))
    cat.append("events_ingest", df)
    spark.conf.set("spark.sql.catalog.probe",
      classOf[graft.store.sql.GraftTableCatalog].getName)
    spark.conf.set("spark.sql.catalog.probe.root", root)

    def attempt(label: String, sql: String): Unit = {
      println(s"\n========== $label\n$sql")
      try {
        val qe = spark.sessionState.executePlan(
          spark.sessionState.sqlParser.parsePlan(sql))
        println("---- analyzed:")
        println(qe.analyzed.treeString)
        try {
          println("---- executing:")
          spark.sql(sql).show()
          println("OK")
        } catch {
          case e: Throwable =>
            println(s"EXEC FAIL ${e.getClass.getName}: ${e.getMessage}")
        }
      } catch {
        case e: Throwable =>
          println(s"ANALYSIS FAIL ${e.getClass.getName}: " +
            s"${String.valueOf(e.getMessage).take(500)}")
      }
    }

    attempt("UPDATE point",
      "UPDATE probe.events_ingest SET value = value * 2, event_type = 'x' " +
        "WHERE ingest_id = 2")
    attempt("DELETE point", "DELETE FROM probe.events_ingest WHERE ingest_id = 3")
    attempt("DELETE expr",
      "DELETE FROM probe.events_ingest WHERE substr(event_type, 1, 1) = 'a'")

    Seq((2L, "bb", 200.0), (4L, "d", 40.0)).toDF(
      "event_id", "event_type", "value")
      .withColumn("ts",
        lit(java.sql.Timestamp.valueOf("2024-02-02 00:00:00")))
      .withColumn("user_id", col("event_id") * 100)
      .withColumn("props", lit("{\"v\":2}"))
      .createOrReplaceTempView("src")
    attempt("MERGE star (source without id col)",
      """MERGE INTO probe.events_ingest t USING src s ON t.event_id = s.event_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    spark.sql("SELECT CAST(NULL AS BIGINT) AS ingest_id, * FROM src")
      .createOrReplaceTempView("src_id")
    attempt("MERGE star (source with NULL id col)",
      """MERGE INTO probe.events_ingest t USING src_id s ON t.event_id = s.event_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    attempt("MERGE explicit assignments",
      """MERGE INTO probe.events_ingest t USING src s ON t.event_id = s.event_id
        |WHEN MATCHED THEN UPDATE SET value = s.value
        |WHEN NOT MATCHED THEN INSERT (event_id, event_type, value)
        |  VALUES (s.event_id, s.event_type, s.value)""".stripMargin)

    println("\nfinal state:")
    cat.read("events_ingest").orderBy("ingest_id").show()
    spark.stop()
  }
}
