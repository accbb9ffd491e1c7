package graft.queries

import graft.Present._
import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subqueries, CTEs and multi-join analytics shapes.
  *
  * The reference rewrites subqueries via Calcite: HiveSubQueryRemoveRule +
  * HiveRelDecorrelator (ql/parse/CalcitePlanner.java:1503-1510); Catalyst's
  * RewritePredicateSubquery / RewriteCorrelatedScalarSubquery are the
  * direct equivalents, exercised here through spark.sql. Numeric-dialect
  * edges (`div`, `%`, string->numeric implicit casts) follow Hive 2.x
  * non-ANSI semantics (ql/exec/FunctionRegistry.java:334-341).
  */
object Subqueries {

  private def t(spark: SparkSession, dir: String): Unit =
    Engine.tables(spark, dir)

  /** Uncorrelated scalar subquery in a predicate. */
  def q_subquery_scalar(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.5 FROM customer)
      ORDER BY c_custkey""")
  }

  val q_subquery_scalar_sql: String = """
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.5 FROM customer)
    ORDER BY c_custkey"""

  /** IN subquery (-> left semi after rewrite). */
  def q_subquery_in(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      SELECT s_suppkey, s_name FROM supplier
      WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                            WHERE n_regionkey = 2)
      ORDER BY s_suppkey""")
  }

  val q_subquery_in_sql: String = """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_regionkey = 2)
    ORDER BY s_suppkey"""

  /** NOT IN three-valued-logic edge (clientpositive/subquery_notin.q):
    * one NULL anywhere in the subquery empties a NOT IN result — the
    * classic warehouse-migration trap — while the same predicate over a
    * null-free subquery behaves like an anti-join. Both variants in one
    * result so the oracle pins both sides of the rule. */
  def q_subquery_notin(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql(q_subquery_notin_sql)
  }

  val q_subquery_notin_sql: String = """
    SELECT 'no_nulls' AS variant, count(*) AS n FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 400000)
    UNION ALL
    SELECT 'with_null' AS variant, count(*) AS n FROM customer
    WHERE c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 1000 = 0
                                        THEN NULL ELSE o_custkey END
                            FROM orders)
    ORDER BY variant"""

  /** Correlated EXISTS with an inner aggregate guard (decorrelation). */
  def q_subquery_corr(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      SELECT c_custkey FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                    GROUP BY o.o_custkey
                    HAVING count(*) > 12)
      ORDER BY c_custkey""")
  }

  val q_subquery_corr_sql: String = """
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  GROUP BY o.o_custkey
                  HAVING count(*) > 12)
    ORDER BY c_custkey"""

  /** Chained CTEs feeding a join. */
  def q_cte(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      WITH big_orders AS (
        SELECT o_custkey, count(*) AS n_big FROM orders
        WHERE o_totalprice > 200000 GROUP BY o_custkey),
      rich AS (
        SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000)
      SELECT r.c_custkey, r.c_name, coalesce(b.n_big, 0) AS n_big
      FROM rich r LEFT JOIN big_orders b ON r.c_custkey = b.o_custkey
      ORDER BY r.c_custkey""")
  }

  val q_cte_sql: String = """
    WITH big_orders AS (
      SELECT o_custkey, count(*) AS n_big FROM orders
      WHERE o_totalprice > 200000 GROUP BY o_custkey),
    rich AS (
      SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000)
    SELECT r.c_custkey, r.c_name, coalesce(b.n_big, 0) AS n_big
    FROM rich r LEFT JOIN big_orders b ON r.c_custkey = b.o_custkey
    ORDER BY r.c_custkey"""

  /** Hive numeric-dialect edges: `/` always-double, `div` integer
    * division, `%` sign-of-dividend, string->numeric implicit cast. */
  def q_fn_numeric_edge(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      SELECT p_partkey,
             p_size / 7 AS div_double,
             p_size div 7 AS div_int,
             (p_size - 25) % 7 AS mod_sign,
             CAST(substr(p_name, 0, 0) AS INT) AS bad_cast_null,
             '42' + p_size AS str_plus
      FROM part ORDER BY p_partkey""")
  }

  val q_fn_numeric_edge_sql: String = """
    SELECT p_partkey,
           p_size / 7.0::DOUBLE AS div_double,
           CAST(p_size // 7 AS BIGINT) AS div_int,
           CAST((p_size - 25) % 7 AS INT) AS mod_sign,
           CAST(NULL AS INT) AS bad_cast_null,
           42.0::DOUBLE + p_size AS str_plus
    FROM part ORDER BY p_partkey"""

  /** TPC-H Q5 shape: 6-way star join with region filter. */
  def q5_local_supplier(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      SELECT n_name,
             CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                      * (100 - CAST(round(l_discount*100) AS BIGINT)))
                  AS DOUBLE) / 10000 AS revenue
      FROM customer JOIN orders   ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey
                                 AND c_nationkey = s_nationkey
                    JOIN nation   ON s_nationkey = n_nationkey
                    JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue DESC, n_name""")
  }

  val q5_local_supplier_sql: String = """
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT)))
                AS DOUBLE) / 10000 AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                               AND c_nationkey = s_nationkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name ORDER BY revenue DESC, n_name"""

  /** TPC-H Q13 shape: outer-join distribution (customers by order count). */
  def q13_custdist(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")
  }

  val q13_custdist_sql: String = """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""

  /** TPC-H Q2 shape: correlated scalar-min subquery over a join. */
  def q2_min_cost(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      SELECT s_suppkey, s_name, s_acctbal FROM supplier s
      WHERE s_acctbal = (SELECT min(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = s.s_nationkey)
      ORDER BY s_suppkey""")
  }

  val q2_min_cost_sql: String = """
    SELECT s_suppkey, s_name, s_acctbal FROM supplier s
    WHERE s_acctbal = (SELECT min(s2.s_acctbal) FROM supplier s2
                       WHERE s2.s_nationkey = s.s_nationkey)
    ORDER BY s_suppkey"""

  /** TPC-H Q18 shape: IN over a grouped HAVING subquery. */
  def q18_big_orders(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      SELECT c_custkey, o_orderkey,
             CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100
               AS total_qty
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150)
      GROUP BY c_custkey, o_orderkey
      ORDER BY c_custkey, o_orderkey""")
  }

  val q18_big_orders_sql: String = """
    SELECT c_custkey, o_orderkey,
           CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100
             AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150)
    GROUP BY c_custkey, o_orderkey
    ORDER BY c_custkey, o_orderkey"""

  /** TPC-H Q22 shape: substring buckets + scalar-avg subquery + NOT
    * EXISTS anti-join. */
  def q22_global_sales(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      SELECT seg, count(*) AS numcust,
             CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE)/100
               AS totacctbal
      FROM (SELECT substr(c_name, 10, 2) AS seg, c_acctbal FROM customer c
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c.c_custkey
                                AND o_orderstatus = 'P'))
      GROUP BY seg ORDER BY seg""")
  }

  val q22_global_sales_sql: String = """
    SELECT seg, count(*) AS numcust,
           CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE)/100
             AS totacctbal
    FROM (SELECT substr(c_name, 10, 2) AS seg, c_acctbal FROM customer c
          WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                             WHERE c_acctbal > 0)
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c.c_custkey
                              AND o_orderstatus = 'P'))
    GROUP BY seg ORDER BY seg"""

  /** Theta (non-equi) join — Hive plans the equi part at the join and
    * theta residuals as post-join filters (SURVEY.md §2.3); here the
    * whole predicate is non-equi -> BroadcastNestedLoopJoin. */
  def q_join_theta(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir)
    spark.sql("""
      SELECT a.s_suppkey AS sk_a, b.s_suppkey AS sk_b
      FROM supplier a JOIN supplier b
        ON a.s_nationkey = b.s_nationkey
       AND a.s_suppkey < b.s_suppkey
       AND abs(a.s_acctbal - b.s_acctbal) < 100
      ORDER BY sk_a, sk_b""")
  }

  val q_join_theta_sql: String = """
    SELECT a.s_suppkey AS sk_a, b.s_suppkey AS sk_b
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey
     AND a.s_suppkey < b.s_suppkey
     AND abs(a.s_acctbal - b.s_acctbal) < 100
    ORDER BY sk_a, sk_b"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost" -> (q2_min_cost _),
    "q18_big_orders" -> (q18_big_orders _),
    "q22_global_sales" -> (q22_global_sales _),
    "q_join_theta" -> (q_join_theta _),
    "q_subquery_scalar" -> (q_subquery_scalar _),
    "q_subquery_in" -> (q_subquery_in _),
    "q_subquery_notin" -> (q_subquery_notin _),
    "q_subquery_corr" -> (q_subquery_corr _),
    "q_cte" -> (q_cte _),
    "q_fn_numeric_edge" -> (q_fn_numeric_edge _),
    "q5_local_supplier" -> (q5_local_supplier _),
    "q13_custdist" -> (q13_custdist _))

  def oracleSql: Map[String, String] = Map(
    "q2_min_cost" -> q2_min_cost_sql,
    "q18_big_orders" -> q18_big_orders_sql,
    "q22_global_sales" -> q22_global_sales_sql,
    "q_join_theta" -> q_join_theta_sql,
    "q_subquery_scalar" -> q_subquery_scalar_sql,
    "q_subquery_in" -> q_subquery_in_sql,
    "q_subquery_notin" -> q_subquery_notin_sql,
    "q_subquery_corr" -> q_subquery_corr_sql,
    "q_cte" -> q_cte_sql,
    "q_fn_numeric_edge" -> q_fn_numeric_edge_sql,
    "q5_local_supplier" -> q5_local_supplier_sql,
    "q13_custdist" -> q13_custdist_sql)
}
