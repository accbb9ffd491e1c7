package graft

/** Debug: replay named `.q.out` files and print the full stack on
  * failure. `sbt "Test/runMain graft.GoldenOne file1.q.out ..."` */
object GoldenOne {
  def main(args: Array[String]): Unit = {
    val root = Engine.session(appName = "golden-one",
      master = "local[8]", shufflePartitions = 4)
    root.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("--replay-sql")) {
      // debug: replay args(1) (failures tolerated), then run the SQL
      // in args(2) against the same session
      val spark = Engine.prepare(root.newSession())
      val h = new GoldenHarness(spark)
      h.loadAll()
      try h.replay(args(1), skip = GoldenSweep.autoSkip)
      catch { case e: Throwable => println(s"[replay-failed] $e") }
      val sql = scala.io.Source.fromFile(args(2)).mkString
      spark.sql(sql).show(30, truncate = false)
      root.stop(); return
    }
    if (args.headOption.contains("--sql")) {
      // args(1) is a FILE holding the SQL (shell quoting is hopeless)
      val spark = Engine.prepare(root.newSession())
      new GoldenHarness(spark).loadAll()
      val sql = scala.io.Source.fromFile(args(1)).mkString
      spark.sql(sql).show(30, truncate = false)
      root.stop(); return
    }
    var pass = 0; var fail = 0
    args.foreach { f =>
      val spark = Engine.prepare(root.newSession())
      val h = new GoldenHarness(spark)
      h.loadAll()
      try {
        val n = h.replay(f, skip = GoldenSweep.autoSkip)
        pass += 1
        println(s"PASS\t$f\t$n asserts")
      } catch {
        case e: Throwable =>
          fail += 1
          println(s"FAIL\t$f")
          e.printStackTrace(System.out)
      }
    }
    println(s"=== GOLDENONE DONE: $pass pass / $fail fail ===")
    root.stop()
  }
}
