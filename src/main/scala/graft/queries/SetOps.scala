package graft.queries

import graft.Present._

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2.8). Hive rewrites UNION DISTINCT /
  * INTERSECT [ALL] / EXCEPT [ALL] into union+group-by plans during
  * analysis (ql/optimizer/unionproc/UnionProcessor.java, the
  * `replicate_rows` trick FunctionRegistry.java:494); Spark has native
  * operators for all of them. ALL-variant outputs are re-aggregated to
  * (key, multiplicity) so results are deterministic under any row order.
  */
object SetOps {

  private def sides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val m = Engine.tables(spark, dir)
    val a = m("customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_nationkey").as("k"))
    val b = m("customer").filter(col("c_acctbal") > 9500)
      .select(col("c_nationkey").as("k"))
    (a, b)
  }

  private val aSql = "SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'"
  private val bSql = "SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9500"

  def q_setop_union_all(spark: SparkSession, dir: String): DataFrame = {
    val (a, b) = sides(spark, dir)
    a.union(b).groupBy("k").agg(count(lit(1)).as("n")).presentSorted("k")
  }

  val q_setop_union_all_sql: String =
    s"SELECT k, count(*) AS n FROM ($aSql UNION ALL $bSql) GROUP BY k ORDER BY k"

  def q_setop_union_distinct(spark: SparkSession, dir: String): DataFrame = {
    val (a, b) = sides(spark, dir)
    a.union(b).distinct().presentSorted("k")
  }

  val q_setop_union_distinct_sql: String =
    s"SELECT k FROM ($aSql UNION $bSql) ORDER BY k"

  def q_setop_intersect(spark: SparkSession, dir: String): DataFrame = {
    val (a, b) = sides(spark, dir)
    a.intersect(b).presentSorted("k")
  }

  val q_setop_intersect_sql: String =
    s"($aSql INTERSECT $bSql) ORDER BY k"

  def q_setop_except(spark: SparkSession, dir: String): DataFrame = {
    val (a, b) = sides(spark, dir)
    a.except(b).presentSorted("k")
  }

  val q_setop_except_sql: String =
    s"($aSql EXCEPT $bSql) ORDER BY k"

  def q_setop_intersect_all(spark: SparkSession, dir: String): DataFrame = {
    val (a, b) = sides(spark, dir)
    a.intersectAll(b).groupBy("k").agg(count(lit(1)).as("n")).presentSorted("k")
  }

  val q_setop_intersect_all_sql: String =
    s"SELECT k, count(*) AS n FROM ($aSql INTERSECT ALL $bSql) GROUP BY k ORDER BY k"

  def q_setop_except_all(spark: SparkSession, dir: String): DataFrame = {
    val (a, b) = sides(spark, dir)
    a.exceptAll(b).groupBy("k").agg(count(lit(1)).as("n")).presentSorted("k")
  }

  val q_setop_except_all_sql: String =
    s"SELECT k, count(*) AS n FROM ($aSql EXCEPT ALL $bSql) GROUP BY k ORDER BY k"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_setop_union_all" -> (q_setop_union_all _),
    "q_setop_union_distinct" -> (q_setop_union_distinct _),
    "q_setop_intersect" -> (q_setop_intersect _),
    "q_setop_except" -> (q_setop_except _),
    "q_setop_intersect_all" -> (q_setop_intersect_all _),
    "q_setop_except_all" -> (q_setop_except_all _))

  def oracleSql: Map[String, String] = Map(
    "q_setop_union_all" -> q_setop_union_all_sql,
    "q_setop_union_distinct" -> q_setop_union_distinct_sql,
    "q_setop_intersect" -> q_setop_intersect_sql,
    "q_setop_except" -> q_setop_except_sql,
    "q_setop_intersect_all" -> q_setop_intersect_all_sql,
    "q_setop_except_all" -> q_setop_except_all_sql)
}
