package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsAnswerRuleSpec extends SparkSpec {

  private def setup(): Long = {
    spark.sql("DROP TABLE IF EXISTS stats_answer_t")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(wh, "stats_answer_t"))
    graft.Engine.tables(spark, sfDir)
    spark.sql(
      "CREATE TABLE stats_answer_t USING parquet AS SELECT * FROM orders")
    spark.sql("ANALYZE TABLE stats_answer_t COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.table("orders").count()
  }

  test("count/min/max answered from catalog stats when enabled") {
    val expected = setup()
    try {
      spark.conf.set("spark.graft.statsAnswer.enabled", "true")
      val q = spark.sql(
        """SELECT count(*) AS n, min(o_totalprice) AS mn,
                  max(o_totalprice) AS mx FROM stats_answer_t""")
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("LocalRelation"), plan)
      assert(!plan.contains("Relation [") || !plan.contains("parquet"), plan)
      val r = q.head()
      assert(r.getLong(0) === expected)
      val real = spark.table("orders")
        .agg(min("o_totalprice"), max("o_totalprice")).head()
      assert(r.getDouble(1) === real.getDouble(0))
      assert(r.getDouble(2) === real.getDouble(1))
    } finally spark.conf.set("spark.graft.statsAnswer.enabled", "false")
  }

  test("disabled by default: plan scans the table") {
    setup()
    val plan = spark.sql("SELECT count(*) FROM stats_answer_t")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("LocalRelation"), plan)
  }

  test("filters disqualify the rewrite (stats can't answer them)") {
    setup()
    try {
      spark.conf.set("spark.graft.statsAnswer.enabled", "true")
      val q = spark.sql(
        "SELECT count(*) FROM stats_answer_t WHERE o_totalprice > 100")
      assert(!q.queryExecution.optimizedPlan.toString
        .contains("LocalRelation"))
      assert(q.head().getLong(0) ===
        spark.table("orders").filter(col("o_totalprice") > 100).count())
    } finally spark.conf.set("spark.graft.statsAnswer.enabled", "false")
  }

  test("tables without stats are untouched") {
    spark.sql("DROP TABLE IF EXISTS nostats_t")
    spark.sql("CREATE TABLE nostats_t USING parquet AS SELECT * FROM nation")
    try {
      spark.conf.set("spark.graft.statsAnswer.enabled", "true")
      val q = spark.sql("SELECT count(*) FROM nostats_t")
      assert(q.head().getLong(0) === 25)
    } finally {
      spark.conf.set("spark.graft.statsAnswer.enabled", "false")
      spark.sql("DROP TABLE nostats_t")
    }
  }
}
