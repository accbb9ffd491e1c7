package graft.queries

import graft.Present._

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface audit (SURVEY.md §2.10; ref:
  * ql/exec/FunctionRegistry.java:193-533 — 285 registrations). Nearly all
  * map to `org.apache.spark.sql.functions` builtins (codegen'd); these
  * sweeps pin the exact semantics against the oracle per category. The
  * few Hive-only stragglers live in graft.functions.GapFunctions and get
  * their own sweep (q_fn_mask).
  */
object FunctionSweeps {

  private def t(spark: SparkSession, dir: String): Map[String, DataFrame] =
    Engine.tables(spark, dir)

  /** String family (FunctionRegistry.java:193-284). */
  def q_fn_string(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir)("customer")
    c.select(col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_name")).as("lo"),
        length(col("c_name")).as("len"),
        octet_length(col("c_name")).as("olen"),
        substring(col("c_name"), 10, 5).as("sub"),
        concat_ws("-", col("c_name"), col("c_mktsegment")).as("cw"),
        lpad(col("c_mktsegment"), 12, "*").as("lp"),
        rpad(col("c_mktsegment"), 12, "*").as("rp"),
        reverse(col("c_name")).as("rev"),
        instr(col("c_name"), "mer").as("ins"),
        substring_index(col("c_name"), "#", 1).as("si"),
        translate(col("c_name"), "Custo", "KUSTO").as("tr"),
        expr("replace(c_name, 'Customer', 'Cust')").as("repl"),
        repeat(col("c_mktsegment"), 2).as("rep"),
        ascii(col("c_name")).as("asc"),
        array_join(split(col("c_name"), "#"), "|").as("sp"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("rre"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("rex"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).as("lev"),
        trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trm"))
      .presentSorted("c_custkey")
  }

  val q_fn_string_sql: String = """
    SELECT c_custkey,
           upper(c_name) AS up, lower(c_name) AS lo,
           CAST(length(c_name) AS INT) AS len,
           CAST(octet_length(c_name::BLOB) AS INT) AS olen,
           substr(c_name, 10, 5) AS sub,
           concat_ws('-', c_name, c_mktsegment) AS cw,
           lpad(c_mktsegment, 12, '*') AS lp,
           rpad(c_mktsegment, 12, '*') AS rp,
           reverse(c_name) AS rev,
           CAST(strpos(c_name, 'mer') AS INT) AS ins,
           split_part(c_name, '#', 1) AS si,
           translate(c_name, 'Custo', 'KUSTO') AS tr,
           replace(c_name, 'Customer', 'Cust') AS repl,
           repeat(c_mktsegment, 2) AS rep,
           CAST(ascii(c_name) AS INT) AS asc,
           array_to_string(string_split(c_name, '#'), '|') AS sp,
           regexp_replace(c_name, '[0-9]+', '#', 'g') AS rre,
           regexp_extract(c_name, '([0-9]+)', 1) AS rex,
           CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS lev,
           trim('  ' || c_mktsegment || '  ') AS trm
    FROM customer ORDER BY c_custkey"""

  /** Math family (FunctionRegistry.java:207-253). Transcendentals are
    * rounded to 6 digits — libm vs java.lang.Math differ in the last ulp. */
  def q_fn_math(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir)("part")
    p.select(col("p_partkey"),
        abs(col("p_size") - 25).as("ab"),
        floor(col("p_retailprice")).as("fl"),
        ceil(col("p_retailprice")).as("ce"),
        round(sqrt(col("p_size")), 6).as("sq"),
        pow(col("p_size"), 2).as("pw"),
        round(log(col("p_retailprice")), 6).as("lg"),
        round(log10(col("p_retailprice")), 6).as("l10"),
        round(log2(col("p_size")), 6).as("l2"),
        signum(col("p_size") - 25).cast("int").as("sg"),
        pmod(col("p_partkey") + 3, lit(7)).as("pm"),
        greatest(col("p_size"), lit(25)).as("gr"),
        least(col("p_size"), lit(25)).as("le"),
        hex(col("p_size")).as("hx"),
        round(atan2(col("p_size"), lit(7)), 6).as("at2"),
        round(sin(col("p_size")), 6).as("sn"),
        round(cos(col("p_size")), 6).as("cs"))
      .presentSorted("p_partkey")
  }

  val q_fn_math_sql: String = """
    SELECT p_partkey,
           abs(p_size - 25) AS ab,
           CAST(floor(p_retailprice) AS BIGINT) AS fl,
           CAST(ceil(p_retailprice) AS BIGINT) AS ce,
           round(sqrt(p_size), 6) AS sq,
           CAST(pow(p_size, 2) AS DOUBLE) AS pw,
           round(ln(p_retailprice), 6) AS lg,
           round(log10(p_retailprice), 6) AS l10,
           round(log2(p_size), 6) AS l2,
           CAST(sign(p_size - 25) AS INT) AS sg,
           CAST(((p_partkey + 3) % 7 + 7) % 7 AS BIGINT) AS pm,
           greatest(p_size, 25) AS gr,
           least(p_size, 25) AS le,
           to_hex(p_size) AS hx,
           round(atan2(CAST(p_size AS DOUBLE), 7), 6) AS at2,
           round(sin(p_size), 6) AS sn,
           round(cos(p_size), 6) AS cs
    FROM part ORDER BY p_partkey"""

  /** Date/time family (FunctionRegistry.java:289-320). */
  def q_fn_datetime(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir)("orders")
    o.select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        dayofweek(col("o_orderdate")).as("dw"),
        weekofyear(col("o_orderdate")).as("wy"),
        dayofyear(col("o_orderdate")).as("dy"),
        date_add(col("o_orderdate"), 30).cast("timestamp").as("da"),
        add_months(col("o_orderdate"), 2).cast("timestamp").as("am"),
        last_day(col("o_orderdate")).cast("timestamp").as("ld"),
        date_trunc("month", col("o_orderdate")).as("dt"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("dd"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        unix_timestamp(col("o_orderdate")).as("ue"),
        from_unixtime(unix_timestamp(col("o_orderdate"))).as("fu"),
        to_date(col("o_orderdate")).cast("timestamp").as("dto"))
      .presentSorted("o_orderkey")
  }

  val q_fn_datetime_sql: String = """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dw,
           CAST(weekofyear(o_orderdate) AS INT) AS wy,
           CAST(dayofyear(o_orderdate) AS INT) AS dy,
           (o_orderdate + INTERVAL 30 DAY)::DATE::TIMESTAMP AS da,
           (o_orderdate + INTERVAL 2 MONTH)::DATE::TIMESTAMP AS am,
           last_day(o_orderdate::DATE)::TIMESTAMP AS ld,
           date_trunc('month', o_orderdate) AS dt,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate::DATE)
                AS INT) AS dd,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(epoch(o_orderdate) AS BIGINT) AS ue,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS fu,
           o_orderdate::DATE::TIMESTAMP AS dto
    FROM orders ORDER BY o_orderkey"""

  /** Conditionals / predicates (FunctionRegistry.java:334-377). */
  def q_fn_cond(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir)("customer")
    c.select(col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bucket"),
        expr("if(c_acctbal > 0, 'pos', 'nonpos')").as("posneg"),
        expr("nullif(c_nationkey, 10)").as("nn"),
        coalesce(expr("nullif(c_nationkey, 10)"), lit(-1)).as("co"),
        expr("nvl(nullif(c_nationkey, 10), -2)").as("nv"),
        greatest(col("c_acctbal"), lit(0d)).as("gr"),
        least(col("c_acctbal"), lit(0d)).as("le"),
        col("c_mktsegment").isin("BUILDING", "AUTOMOBILE").as("inb"),
        col("c_acctbal").between(0, 1000).as("btw"),
        expr("nullif(c_nationkey, 10) IS NULL").as("isn"))
      .presentSorted("c_custkey")
  }

  val q_fn_cond_sql: String = """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bucket,
           CASE WHEN c_acctbal > 0 THEN 'pos' ELSE 'nonpos' END AS posneg,
           nullif(c_nationkey, 10) AS nn,
           coalesce(nullif(c_nationkey, 10), -1) AS co,
           coalesce(nullif(c_nationkey, 10), -2) AS nv,
           greatest(c_acctbal, 0) AS gr,
           least(c_acctbal, 0) AS le,
           c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AS inb,
           c_acctbal BETWEEN 0 AND 1000 AS btw,
           nullif(c_nationkey, 10) IS NULL AS isn
    FROM customer ORDER BY c_custkey"""

  /** Hash / encoding family (FunctionRegistry.java:246-253 md5/sha/
    * base64/hex). */
  def q_fn_hash(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir)("customer")
    c.filter(col("c_custkey") < 200)
      .select(col("c_custkey"),
        md5(col("c_name")).as("m5"),
        sha2(col("c_name"), 256).as("s256"),
        hex(col("c_custkey")).as("hx"),
        base64(col("c_name").cast("binary")).as("b64"),
        expr("cast(unbase64(base64(cast(c_name as binary))) as string)")
          .as("rt"))
      .presentSorted("c_custkey")
  }

  val q_fn_hash_sql: String = """
    SELECT c_custkey,
           md5(c_name) AS m5,
           sha256(c_name) AS s256,
           to_hex(c_custkey) AS hx,
           base64(c_name::BLOB) AS b64,
           c_name AS rt
    FROM customer WHERE c_custkey < 200 ORDER BY c_custkey"""

  /** Hive data-masking + field() — graft's gap functions
    * (GapFunctions.scala; ref: FunctionRegistry.java:525-531). */
  def q_fn_mask(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      SELECT c_custkey,
             mask(c_name) AS mk,
             mask_all(c_name) AS ma,
             mask_first_n(c_name, 4) AS mf,
             mask_last_n(c_name, 3) AS ml,
             mask_show_first_n(c_name, 4) AS msf,
             mask_show_last_n(c_name, 4) AS msl,
             field(c_mktsegment, 'BUILDING', 'AUTOMOBILE', 'MACHINERY',
                   'HOUSEHOLD', 'FURNITURE') AS fd
      FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""")
  }

  val q_fn_mask_sql: String = """
    WITH m AS (SELECT c_custkey, c_name, c_mktsegment,
      regexp_replace(regexp_replace(regexp_replace(c_name,
        '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS full_m
      FROM customer WHERE c_custkey < 200)
    SELECT c_custkey,
           full_m AS mk,
           full_m AS ma,
           regexp_replace(regexp_replace(regexp_replace(substr(c_name, 1, 4),
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             || substr(c_name, 5) AS mf,
           substr(c_name, 1, length(c_name) - 3) ||
             regexp_replace(regexp_replace(regexp_replace(
               substr(c_name, length(c_name) - 2),
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS ml,
           substr(c_name, 1, 4) ||
             regexp_replace(regexp_replace(regexp_replace(substr(c_name, 5),
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS msf,
           regexp_replace(regexp_replace(regexp_replace(
             substr(c_name, 1, length(c_name) - 4),
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             || substr(c_name, length(c_name) - 3) AS msl,
           CASE c_mktsegment WHEN 'BUILDING' THEN 1 WHEN 'AUTOMOBILE' THEN 2
             WHEN 'MACHINERY' THEN 3 WHEN 'HOUSEHOLD' THEN 4
             WHEN 'FURNITURE' THEN 5 ELSE 0 END AS fd
    FROM m ORDER BY c_custkey"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fn_string" -> (q_fn_string _),
    "q_fn_math" -> (q_fn_math _),
    "q_fn_datetime" -> (q_fn_datetime _),
    "q_fn_cond" -> (q_fn_cond _),
    "q_fn_hash" -> (q_fn_hash _),
    "q_fn_mask" -> (q_fn_mask _))

  def oracleSql: Map[String, String] = Map(
    "q_fn_string" -> q_fn_string_sql,
    "q_fn_math" -> q_fn_math_sql,
    "q_fn_datetime" -> q_fn_datetime_sql,
    "q_fn_cond" -> q_fn_cond_sql,
    "q_fn_hash" -> q_fn_hash_sql,
    "q_fn_mask" -> q_fn_mask_sql)
}
