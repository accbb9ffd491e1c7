package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the full declared query set against
  * SPARK_GRAFT_SF_DIR, prints one JSON line.
  *
  * A warmup pass at sf0.001 amortizes JVM/codegen compilation (each
  * distinct plan shape costs Janino/JIT once per process — a cluster
  * deployment pays it once per executor lifetime, not per query), then
  * each query is timed materializing every output row through the noop
  * sink (no collect, no count-shortcut that would let Catalyst prune
  * the projections being measured).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(appName = "graft-bench")

    def materialize(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // dead localCheckpoint blocks from finished queries are reclaimed
    // by the ContextCleaner only after a driver GC; force one between
    // phases so earlier reps' state never squeezes later ones
    def drainDeadBlocks(): Unit = { System.gc(); Thread.sleep(500) }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(materialize(_, "/root/testdata/sf0.001")) // warmup
    drainDeadBlocks()
    // two timed reps, report the min — steady-state per-query cost,
    // insulated from one-off GC/scheduler noise on a shared box
    val rep1 = names.map(n => n -> materialize(n, sfDir)).toMap
    drainDeadBlocks()
    val results = names.map { n =>
      val t2 = materialize(n, sfDir)
      val t1 = rep1(n)
      n -> (if (t1 < 0) t2 else if (t2 < 0) t1 else math.min(t1, t2))
    }
    drainDeadBlocks()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // secondary throughput metric: wall-clock to drain the whole set
    // with 4 concurrent submitters on the same session — overlapping
    // per-query scheduling gaps the way a real engine serves concurrent
    // clients. Sequential min-of-2 stays the primary (baseline-
    // comparable) number.
    def concurrentDrain(): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val w0 = System.nanoTime()
      val futs = names.map(n => scala.concurrent.Future(materialize(n, sfDir)))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration.Inf)
      pool.shutdown()
      (System.nanoTime() - w0) / 1e9
    }
    // min of two reps, like the sequential metric — a single drain is
    // hostage to one bad GC pause on a shared box
    val wall1 = concurrentDrain()
    drainDeadBlocks()
    val wall = math.min(wall1, concurrentDrain())
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"concurrent_wall":$wall,"concurrent_threads":4,"sf":"$sfDir"}""")
    spark.stop()
  }
}
