package graft

/** Dev utility: dump `.explain("formatted")` for named queries to files.
  * Usage: runMain graft.PlanDump <outDir> <suffix> <q1,q2,...|all> [sfDir]
  * Writes <outDir>/<query>_<suffix>.txt for each query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = new java.io.File(args(0)); outDir.mkdirs()
    val suffix = args(1)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = Engine.session(appName = "graft-plandump")
    val names =
      if (args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    names.foreach { n =>
      val txt = SparkEntry.queries(n)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      val pw = new java.io.PrintWriter(
        new java.io.File(outDir, s"${n}_$suffix.txt"), "UTF-8")
      try pw.println(txt) finally pw.close()
      println(s"[plandump] $n -> ${n}_$suffix.txt")
    }
    spark.stop()
  }
}
