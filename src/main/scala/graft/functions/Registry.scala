package graft.functions

import org.apache.spark.sql.SparkSession

/** Registration point for the function tail Hive has and Spark lacks
  * (SURVEY.md §2.10/§7.2-3; ref: ql/exec/FunctionRegistry.java:193-533).
  * Grown incrementally; each function lives in its own object with tests.
  */
object Registry {
  @volatile private var registered: Set[SparkSession] = Set.empty

  def registerAll(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      GapFunctions.register(spark)
      TableFunctions.register(spark)
      Aggregators.register(spark)
      BitmapAgg.register(spark)
      ComputeStats.register(spark)
      registered += spark
    }
  }
}
