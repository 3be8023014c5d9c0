package graft.ops

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** [EXT] scalar-function families beyond the reference's F1-F11: string,
  * date/time, math (libm-free — only IEEE-exact operations so results are
  * engine-identical), and conditional/predicate forms. All per-row, all
  * codegen'd, zero shuffles except the presentation sort.
  */
object ScalarFuncs {

  /** String function family over part names. */
  val stringFuncs: Q = Q(
    "q_f_string_funcs",
    """SELECT p_partkey,
      |upper(p_name) AS up, lower(p_brand) AS lo,
      |replace(p_name, ' ', '_') AS repl,
      |lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
      |split_part(p_brand, '#', 2) AS brand_no,
      |reverse(p_type) AS rev,
      |substr(p_name, 1, 3) AS pre,
      |length(p_name) AS len,
      |concat_ws('|', p_brand, p_type) AS joined,
      |translate(p_name, 'aeiou', 'AEIOU') AS tr,
      |repeat('*', p_size % 5) AS stars,
      |contains(p_name, 'red') AS has_red,
      |starts_with(p_name, 'red') AS pre_red,
      |ends_with(p_name, 'bolt') AS suf_bolt
      |FROM part ORDER BY p_partkey""".stripMargin
  ) { (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("up"), lower(col("p_brand")).as("lo"),
      regexp_replace(col("p_name"), " ", "_").as("repl"),
      lpad(col("p_size").cast("string"), 4, "0").as("padded"),
      expr("split_part(p_brand, '#', 2)").as("brand_no"),
      reverse(col("p_type")).as("rev"),
      substring(col("p_name"), 1, 3).as("pre"),
      length(col("p_name")).cast("long").as("len"),
      concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
      translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
      repeat(lit("*"), (col("p_size") % 5).cast("int")).as("stars"),
      col("p_name").contains("red").as("has_red"),
      col("p_name").startsWith("red").as("pre_red"),
      col("p_name").endsWith("bolt").as("suf_bolt"))
      .orderBy("p_partkey")
  }

  /** Date/time family. dayofweek is aligned to DuckDB's Sunday=0; DATE
    * results are cast to TIMESTAMP on both sides (Spark's date_trunc
    * returns timestamp, DuckDB's returns date). */
  val dateFuncs: Q = Q(
    "q_f_date_funcs",
    """SELECT o_orderkey,
      |CAST(year(o_orderdate) AS BIGINT) AS y,
      |CAST(month(o_orderdate) AS BIGINT) AS mo,
      |CAST(day(o_orderdate) AS BIGINT) AS dom,
      |CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
      |CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
      |o_orderdate + INTERVAL 30 DAY AS plus30,
      |CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
      |  AS BIGINT) AS days_since,
      |CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
      |CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
      |FROM orders ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("y"),
      month(col("o_orderdate")).cast("long").as("mo"),
      dayofmonth(col("o_orderdate")).cast("long").as("dom"),
      (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
      quarter(col("o_orderdate")).cast("long").as("qtr"),
      (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("plus30"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01"))
        .cast("long").as("days_since"),
      last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
      date_trunc("month", col("o_orderdate")).as("month_start"))
      .orderBy("o_orderkey")
  }

  /** Math family, libm-free (abs/ceil/floor/sign/mod/greatest/least/sqrt
    * are IEEE-exact; pow/exp/log are NOT and stay out of oracle-checked
    * paths). */
  val mathFuncs: Q = Q(
    "q_f_math_funcs",
    """SELECT l_orderkey, l_linenumber, l_extendedprice,
      |abs(l_extendedprice - 50000.0) AS dist,
      |CAST(ceil(l_extendedprice) AS BIGINT) AS c,
      |CAST(floor(l_extendedprice) AS BIGINT) AS f,
      |ROUND(l_extendedprice, 1) AS r1,
      |CAST(sign(l_extendedprice - 50000.0) AS INT) AS sgn,
      |CAST(l_orderkey % 7 AS BIGINT) AS m7,
      |greatest(l_quantity, l_discount * 100) AS g,
      |least(l_quantity, l_discount * 100) AS l,
      |sqrt(l_quantity) AS sq
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
      abs(col("l_extendedprice") - 50000.0).as("dist"),
      ceil(col("l_extendedprice")).as("c"),
      floor(col("l_extendedprice")).as("f"),
      round(col("l_extendedprice"), 1).as("r1"),
      signum(col("l_extendedprice") - 50000.0).cast("int").as("sgn"),
      (col("l_orderkey") % 7).as("m7"),
      greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
      least(col("l_quantity"), col("l_discount") * 100).as("l"),
      sqrt(col("l_quantity")).as("sq"))
      .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
  }

  /** Conditional / predicate family: CASE chains, IN lists, BETWEEN,
    * NULLIF/IFNULL, LIKE. */
  val condFuncs: Q = Q(
    "q_f_cond_funcs",
    """SELECT o_orderkey,
      |CASE WHEN o_totalprice >= 200000 THEN 'high'
      |     WHEN o_totalprice >= 100000 THEN 'mid'
      |     ELSE 'low' END AS bucket,
      |o_orderstatus IN ('F', 'P') AS closedish,
      |o_totalprice BETWEEN 50000 AND 150000 AS midband,
      |ifnull(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
      |o_orderpriority LIKE '%URGENT%' AS urgent
      |FROM orders ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      when(col("o_totalprice") >= 200000, "high")
        .when(col("o_totalprice") >= 100000, "mid")
        .otherwise("low").as("bucket"),
      col("o_orderstatus").isin("F", "P").as("closedish"),
      col("o_totalprice").between(50000, 150000).as("midband"),
      coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
        .as("status_or_open"),
      col("o_orderpriority").like("%URGENT%").as("urgent"))
      .orderBy("o_orderkey")
  }

  val all: Seq[Q] = Seq(stringFuncs, dateFuncs, mathFuncs, condFuncs)
}
