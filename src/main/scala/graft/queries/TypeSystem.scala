package graft.queries

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Type-system dialect coverage: decimal(p,s) arithmetic and rounding,
  * char(n)/varchar(n) pad/truncate semantics, year-month and day-time
  * interval arithmetic (SURVEY.md §1.2; ref:
  * serde2/typeinfo/DecimalTypeInfo.java, HiveDecimalUtils.java,
  * CharTypeInfo.java + BaseCharUtils.java, serdeConstants.java:95-111).
  *
  * Parity strategy: the testdata money columns are doubles, and
  * double->decimal conversion is engine-dependent at .xx5 boundaries, so
  * every decimal is constructed from EXACT integer cents
  * (round(x*100)::BIGINT) first; from there all decimal arithmetic is
  * exact and a final CAST to DOUBLE is bit-identical on any engine. The
  * rounding-mode oracle derives half-up/half-even from integer math so
  * it is ground truth, not another engine's rounding.
  */
object TypeSystem {

  private def t(spark: SparkSession, dir: String): Map[String, DataFrame] =
    Engine.tables(spark, dir)

  /** Decimal aggregation: exact sums at working and boundary(38,10)
    * precision, scale-coerced product DECIMAL(12,2)*DECIMAL(5,2),
    * decimal-exact average via sum/count (ref:
    * HiveDecimalUtils.java precision/scale derivation). */
  def q_dec_agg(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql(TypeSystem.q_dec_agg_sql)
  }

  val q_dec_agg_sql: String = """
    WITH cents AS (
      SELECT l_returnflag, l_quantity,
        CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(14,0))
          AS pc,
        CAST(CAST(round(l_discount * 100) AS BIGINT) AS DECIMAL(4,0)) AS dc
      FROM lineitem),
    d AS (
      SELECT l_returnflag, l_quantity,
        CAST(pc * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(12,2)) AS price,
        CAST(dc * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(4,2)) AS disc
      FROM cents)
    SELECT l_returnflag,
      CAST(sum(price) AS DOUBLE) AS sum_price,
      CAST(CAST(sum(CAST(price AS DECIMAL(38,10))) AS DECIMAL(18,2))
        AS DOUBLE) AS sum_price_p38,
      CAST(sum(price * (CAST(1 AS DECIMAL(3,2)) - disc)) AS DOUBLE)
        AS sum_revenue,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        AS avg_qty
    FROM d GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** round (half-up) vs bround (half-even) on decimals — THE Hive
    * rounding dialect pair (ql/udf/generic/GenericUDFRound.java,
    * GenericUDFBRound.java). Spark evaluates the real DECIMAL round /
    * bround; the oracle derives both modes from integer cent math. */
  def q_dec_round(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      WITH d AS (
        SELECT CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                 AS DECIMAL(14,0)) * CAST(0.01 AS DECIMAL(3,2)) AS p
        FROM lineitem),
      x AS (SELECT CAST(p AS DECIMAL(12,2)) AS price FROM d)
      SELECT
        CAST(sum(round(price, 1)) AS DOUBLE) AS sum_half_up,
        CAST(sum(bround(price, 1)) AS DOUBLE) AS sum_half_even,
        CAST(sum(CASE WHEN round(price, 1) <> bround(price, 1)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_mode_sensitive
      FROM x""")
  }

  val q_dec_round_sql: String = """
    WITH d AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
               FROM lineitem),
    r AS (SELECT c // 10 AS t, c % 10 AS rem FROM d)
    SELECT
      CAST(sum(CASE WHEN rem >= 5 THEN t + 1 ELSE t END) AS DOUBLE) / 10
        AS sum_half_up,
      CAST(sum(CASE WHEN rem > 5 THEN t + 1 WHEN rem < 5 THEN t
               WHEN t % 2 = 1 THEN t + 1 ELSE t END) AS DOUBLE) / 10
        AS sum_half_even,
      CAST(sum(CASE WHEN rem = 5 AND t % 2 = 0 THEN 1 ELSE 0 END)
        AS BIGINT) AS n_mode_sensitive
    FROM r"""

  /** char(n) pads on cast and comparison (CharTypeInfo.java,
    * BaseCharUtils.java); varchar(n) truncates (Hive CAST..VARCHAR) —
    * Spark's VARCHAR(n) cast errors on overflow instead, so the
    * truncating cast is the registered dialect function hive_varchar.
    * The oracle states the same semantics as rpad/substr. */
  def q_char_varchar(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      SELECT c_custkey,
        CAST(c_mktsegment AS CHAR(12)) AS seg_char,
        -- Hive length() on CHAR counts the pad-STRIPPED value
        -- (UDFLength reads HiveChar.getStrippedValue)
        length(CAST(c_mktsegment AS CHAR(12))) AS seg_char_len,
        hive_varchar(c_name, 12) AS name_vc,
        length(hive_varchar(c_name, 12)) AS name_vc_len,
        (CAST(c_mktsegment AS CHAR(12)) =
         CAST(concat(c_mktsegment, ' ') AS CHAR(12))) AS pad_blind_eq
      FROM customer ORDER BY c_custkey""")
  }

  val q_char_varchar_sql: String = """
    SELECT c_custkey,
      rpad(c_mktsegment, 12, ' ') AS seg_char,
      CAST(length(rtrim(c_mktsegment)) AS INT) AS seg_char_len,
      substr(c_name, 1, 12) AS name_vc,
      CAST(least(length(c_name), 12) AS INT) AS name_vc_len,
      (rpad(c_mktsegment, 12, ' ') =
       rpad(c_mktsegment || ' ', 12, ' ')) AS pad_blind_eq
    FROM customer ORDER BY c_custkey"""

  /** Year-month + day-time interval arithmetic
    * (serdeConstants.java:109-111; Hive interval literals in
    * ql/parse/IdentifiersParser.g). Dates surface as timestamps for
    * cross-engine parity; the shift width is pinned with a day diff
    * (months_between is non-integral when end-of-month capping kicks
    * in, so it is not a stable cross-engine oracle). */
  def q_interval(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      SELECT o_orderkey,
        CAST(o_orderdate AS TIMESTAMP) AS d0,
        CAST(o_orderdate + INTERVAL '1-2' YEAR TO MONTH AS TIMESTAMP)
          AS plus_ym,
        CAST(o_orderdate - INTERVAL '3' MONTH AS TIMESTAMP) AS minus_m,
        CAST(CAST(o_orderdate AS TIMESTAMP) +
             INTERVAL '1 12:30:15' DAY TO SECOND AS TIMESTAMP) AS plus_dt,
        datediff(o_orderdate + INTERVAL '1-2' YEAR TO MONTH, o_orderdate)
          AS shift_days
      FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""")
  }

  val q_interval_sql: String = """
    SELECT o_orderkey,
      CAST(o_orderdate AS TIMESTAMP) AS d0,
      CAST(o_orderdate + INTERVAL 14 MONTH AS TIMESTAMP) AS plus_ym,
      CAST(o_orderdate - INTERVAL 3 MONTH AS TIMESTAMP) AS minus_m,
      CAST(o_orderdate AS TIMESTAMP) + INTERVAL '1 day 12:30:15' AS plus_dt,
      CAST(date_diff('day', o_orderdate,
        CAST(o_orderdate + INTERVAL 14 MONTH AS DATE)) AS INT) AS shift_days
    FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey"""

  /** Schema evolution through the PUBLIC HiveStatements entry point:
    * narrow part to (int, float, string), REPLACE COLUMNS onto
    * (bigint, double, string, extra int). Leaves convert value-wise —
    * the float widens in BINARY (0.3f -> 0.30000001192092896), NOT by
    * text re-parse — surplus-free, added column reads null (ref
    * ql/io/parquet/read/DataWritableReadSupport.java; SURVEY §2.13).
    * The oracle replays the same widening with explicit casts. */
  def q_ddl_evolve(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    t(spark, dir)
    spark.table("part")
      .select(col("p_partkey").cast("int").as("k"),
        col("p_retailprice").cast("float").as("price"),
        col("p_name").as("name"))
      .createOrReplaceTempView("evolve_part")
    new graft.HiveStatements(spark).sql(
      "ALTER TABLE evolve_part REPLACE COLUMNS (" +
        "k bigint, price double, name string, extra int)")
    spark.table("evolve_part").orderBy("k").limit(200)
  }

  val q_ddl_evolve_sql: String = """
    SELECT CAST(p_partkey AS BIGINT) AS k,
      CAST(CAST(p_retailprice AS FLOAT) AS DOUBLE) AS price,
      p_name AS name, CAST(NULL AS INT) AS extra
    FROM part ORDER BY k LIMIT 200"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dec_agg" -> (q_dec_agg _),
    "q_dec_round" -> (q_dec_round _),
    "q_char_varchar" -> (q_char_varchar _),
    "q_interval" -> (q_interval _),
    "q_ddl_evolve" -> (q_ddl_evolve _))

  def oracleSql: Map[String, String] = Map(
    "q_dec_agg" -> q_dec_agg_sql,
    "q_dec_round" -> q_dec_round_sql,
    "q_char_varchar" -> q_char_varchar_sql,
    "q_interval" -> q_interval_sql,
    "q_ddl_evolve" -> q_ddl_evolve_sql)
}
