package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 re-expressed
  * Spark-first; `oracleSql` carries a DuckDB-runnable equivalent for each
  * SQL-expressible entry (column names aligned on both sides — the driver
  * sorts columns by name and hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_topk")(Engine.prepare(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Windows.queries ++
      graft.queries.SetOps.queries ++
      graft.queries.Generators.queries ++
      graft.queries.FunctionSweeps.queries ++
      graft.queries.Pipeline.queries ++
      graft.queries.Curation.queries ++
      graft.queries.Subqueries.queries ++
      graft.queries.TypeSystem.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.Windows.oracleSql ++
      graft.queries.SetOps.oracleSql ++
      graft.queries.Generators.oracleSql ++
      graft.queries.FunctionSweeps.oracleSql ++
      graft.queries.Pipeline.oracleSql ++
      graft.queries.Curation.oracleSql ++
      graft.queries.Subqueries.oracleSql ++
      graft.queries.TypeSystem.oracleSql
}
