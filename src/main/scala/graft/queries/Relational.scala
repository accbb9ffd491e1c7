package graft.queries

import graft.Engine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational-core query inventory (SURVEY.md §2.3–§2.8): every join
  * variant, multi-phase aggregation, grouping sets/cube/rollup, window
  * functions, set operations, sort/limit/top-k — each as an idiomatic
  * DataFrame/Dataset plan (Catalyst picks SMJ/BHJ/partial-agg physical
  * strategies; the Hive operators they re-express are cited per query).
  *
  * Oracle-parity discipline: double-typed money columns are rescaled to
  * exact integer cents (`round(x*100) -> bigint`) before aggregation so
  * every SUM is order-independent integer arithmetic — bit-identical
  * whatever the partitioning/shuffle order, at any scale, and in DuckDB.
  */
object Relational {

  private def t(spark: SparkSession, dir: String): Map[String, DataFrame] =
    Engine.tables(spark, dir)

  /** round(x*100) as exact integer cents. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  // --------------------------------------------------------------------
  // Aggregation (ref: ql/exec/GroupByOperator.java:732 — hash+sort agg,
  // PARTIAL1/FINAL two-phase; Spark HashAggregate partial/final is the
  // direct equivalent and is chosen automatically).
  // --------------------------------------------------------------------

  /** TPC-H Q1 shape: the canonical two-phase aggregation. */
  def q1_agg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir)("lineitem")
    li.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        cents(col("l_quantity")).as("qc"),
        cents(col("l_extendedprice")).as("epc"),
        cents(col("l_discount")).as("dc"),
        cents(col("l_tax")).as("tc"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(col("qc")).cast("double") / 100).as("sum_qty"),
        (sum(col("epc")).cast("double") / 100).as("sum_base_price"),
        (sum(col("epc") * (lit(100) - col("dc"))).cast("double") / 10000)
          .as("sum_disc_price"),
        (sum(col("epc") * (lit(100) - col("dc")) * (lit(100) + col("tc")))
          .cast("double") / 1000000).as("sum_charge"),
        (sum(col("qc")).cast("double") / 100 / count(lit(1))).as("avg_qty"),
        (sum(col("epc")).cast("double") / 100 / count(lit(1))).as("avg_price"),
        (sum(col("dc")).cast("double") / 100 / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1_agg_sql: String = """
    WITH l AS (
      SELECT l_returnflag, l_linestatus,
             CAST(round(l_quantity*100) AS BIGINT) AS qc,
             CAST(round(l_extendedprice*100) AS BIGINT) AS epc,
             CAST(round(l_discount*100) AS BIGINT) AS dc,
             CAST(round(l_tax*100) AS BIGINT) AS tc
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00')
    SELECT l_returnflag, l_linestatus,
           CAST(sum(qc) AS DOUBLE)/100 AS sum_qty,
           CAST(sum(epc) AS DOUBLE)/100 AS sum_base_price,
           CAST(sum(epc*(100-dc)) AS DOUBLE)/10000 AS sum_disc_price,
           CAST(sum(epc*(100-dc)*(100+tc)) AS DOUBLE)/1000000 AS sum_charge,
           CAST(sum(qc) AS DOUBLE)/100/count(*) AS avg_qty,
           CAST(sum(epc) AS DOUBLE)/100/count(*) AS avg_price,
           CAST(sum(dc) AS DOUBLE)/100/count(*) AS avg_disc,
           count(*) AS count_order
    FROM l GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** TPC-H Q3 shape: 3-way join + agg + top-k — the flagship. The nation-
    * sized side of nothing here is broadcastable, but orders⋈lineitem is a
    * co-partitioned shuffle join on l_orderkey; at 100 TB both sides
    * shuffle once on the join key and AQE handles skew.
    */
  def q3_topk(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir)
    val cutoff = lit("1998-06-01").cast("timestamp")
    m("customer").filter(col("c_mktsegment") === "BUILDING")
      .join(m("orders"), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < cutoff)
      .join(m("lineitem"), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > cutoff)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          .as("rev"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg((sum(col("rev")).cast("double") / 10000).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3_topk_sql: String = """
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
             / 10000 AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 10"""

  // --------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1_agg _),
    "q3_topk" -> (q3_topk _))

  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> q1_agg_sql,
    "q3_topk" -> q3_topk_sql)
}
