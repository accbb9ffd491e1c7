package graft

import org.apache.spark.sql.functions._

/** HiveQL-dialect surface checks (SURVEY.md §2.13/§3.5): the DDL/DML and
  * dialect constructs the reference's users write must parse and run on
  * the Spark dialect as-is.
  */
class DialectSpec extends SparkSpec {

  private lazy val views = Engine.tables(spark, sfDir)

  test("CREATE TABLE / INSERT / CREATE VIEW / DROP lifecycle") {
    views
    spark.sql("DROP TABLE IF EXISTS ddl_t")
    spark.sql("CREATE TABLE ddl_t (k INT, v STRING) USING parquet")
    spark.sql("INSERT INTO ddl_t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE TABLE ddl_t VALUES (3, 'c')")
    assert(spark.table("ddl_t").count() === 1)
    spark.sql("CREATE OR REPLACE VIEW ddl_v AS SELECT k * 2 AS k2 FROM ddl_t")
    assert(spark.sql("SELECT k2 FROM ddl_v").head().getInt(0) === 6)
    spark.sql("DROP VIEW ddl_v")
    spark.sql("DROP TABLE ddl_t")
  }

  test("CREATE TEMPORARY MACRO equivalent: SQL scalar function") {
    // Hive macros (CREATE TEMPORARY MACRO sigmoid(x DOUBLE) 1.0/(1.0+
    // exp(-x)), ql/ddl CreateMacroDesc) map to Spark SQL UDFs — a named
    // SQL expression usable anywhere a function is
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION sigmoid_m(x DOUBLE)
      RETURNS DOUBLE RETURN 1.0 / (1.0 + exp(-x))""")
    assert(spark.sql("SELECT sigmoid_m(0.0d) AS s").head().getDouble(0)
      === 0.5)
    assert(spark.sql(
      "SELECT sum(CASE WHEN sigmoid_m(CAST(id AS DOUBLE)) > 0.5 THEN 1 " +
        "ELSE 0 END) AS n FROM range(5)").head().getLong(0) === 4L)
  }

  test("CTAS with partitioning") {
    views
    spark.sql("DROP TABLE IF EXISTS ddl_ctas")
    spark.sql("""CREATE TABLE ddl_ctas USING parquet
                 PARTITIONED BY (y)
                 AS SELECT o_orderkey, year(o_orderdate) AS y FROM orders""")
    assert(spark.table("ddl_ctas").count() ===
      spark.table("orders").count())
    spark.sql("DROP TABLE ddl_ctas")
  }

  test("DISTRIBUTE BY / SORT BY / CLUSTER BY parse and execute") {
    views
    val d = spark.sql(
      "SELECT l_orderkey FROM lineitem DISTRIBUTE BY l_orderkey SORT BY l_orderkey")
    assert(d.count() > 0)
    val c = spark.sql("SELECT l_orderkey FROM lineitem CLUSTER BY l_orderkey")
    assert(c.count() > 0)
    // sortWithinPartitions invariant: each partition is sorted
    val parts = spark.table("lineitem").repartition(4, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .select("l_orderkey").rdd
      .mapPartitions { it =>
        val a = it.map(_.getLong(0)).toArray
        Iterator.single(a.zip(a.drop(1)).forall { case (x, y) => x <= y })
      }.collect()
    assert(parts.forall(identity))
  }

  test("TABLESAMPLE syntax") {
    views
    val n = spark.sql(
      "SELECT count(*) AS n FROM lineitem TABLESAMPLE (10 PERCENT)")
      .head().getLong(0)
    assert(n > 0 && n < spark.table("lineitem").count())
  }

  test("TRANSFORM ... USING pipes rows through an external script") {
    views
    val out = spark.sql(
      """SELECT TRANSFORM(l_orderkey) USING 'cat' AS (k STRING)
         FROM (SELECT l_orderkey FROM lineitem LIMIT 5)""")
    assert(out.count() === 5)
  }

  test("external partitioned table + partition recovery (MSCK)") {
    views
    val base = java.nio.file.Files.createTempDirectory("graft_msck").toString
    val o = spark.table("orders")
      .withColumn("y", year(col("o_orderdate")))
    graft.operators.Writes.writePartitioned(o, base, Seq("y"))
    spark.sql("DROP TABLE IF EXISTS msck_t")
    spark.sql(s"""CREATE TABLE msck_t (o_orderkey BIGINT, o_custkey BIGINT,
      o_orderstatus STRING, o_totalprice DOUBLE, o_orderdate TIMESTAMP,
      o_orderpriority STRING) USING parquet PARTITIONED BY (y INT)
      LOCATION '$base'""")
    spark.sql("MSCK REPAIR TABLE msck_t")
    assert(spark.table("msck_t").count() === o.count())
    // partition pruning against the recovered partitions
    val one = spark.table("msck_t").filter(col("y") === 1995)
    assert(one.count() === o.filter(col("y") === 1995).count())
    spark.sql("DROP TABLE msck_t")
  }

  test("EXPLAIN and ANALYZE TABLE run") {
    views
    assert(spark.sql("EXPLAIN FORMATTED SELECT count(*) FROM orders")
      .head().getString(0).contains("Physical Plan"))
    spark.sql("DROP TABLE IF EXISTS stats_t")
    spark.sql("CREATE TABLE stats_t USING parquet AS SELECT * FROM nation")
    spark.sql("ANALYZE TABLE stats_t COMPUTE STATISTICS FOR ALL COLUMNS")
    val desc = spark.sql("DESCRIBE EXTENDED stats_t").collect().mkString
    assert(desc.contains("Statistics"))
    spark.sql("DROP TABLE stats_t")
  }

  test("broadcast and skew-handling knobs are live (AQE)") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
    // a dimension join actually plans as broadcast
    val m = views
    val j = m("orders").join(m("customer"),
      col("o_custkey") === col("c_custkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }
}
