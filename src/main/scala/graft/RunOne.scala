package graft

/** Dev utility: materialize one named query N times and print timings +
  * the formatted physical plan. Usage: runMain graft.RunOne <name> <sfDir> [reps]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Engine.session(appName = "graft-runone")
    val fn = SparkEntry.queries(name)
    println(fn(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[runone] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
