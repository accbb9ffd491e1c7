package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev utility (optimization guide §1): materialize one named query and
  * print a per-job / per-stage breakdown — wall time, task count, shuffle
  * read/write bytes, input bytes — so optimization targets the stage that
  * actually costs, not the one that looks suspicious.
  *
  * Usage: runMain graft.Profile <name> [sfDir] [reps]
  */
object Profile {
  private case class StageRow(id: Int, name: String, tasks: Int,
                              ms: Long, inputMB: Double,
                              shufReadMB: Double, shufWriteMB: Double)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = Engine.session(appName = "graft-profile")

    val jobs = mutable.LinkedHashMap[Int, (Long, Long, Seq[Int])]() // id -> (t0, t1, stages)
    val stages = mutable.LinkedHashMap[Int, StageRow]()
    val listener = new SparkListener {
      private val jobStart = mutable.Map[Int, Long]()
      private val jobStages = mutable.Map[Int, Seq[Int]]()
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobStart(e.jobId) = System.nanoTime()
        jobStages(e.jobId) = e.stageIds
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs(e.jobId) = (jobStart.getOrElse(e.jobId, 0L), System.nanoTime(),
          jobStages.getOrElse(e.jobId, Nil))
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages(si.stageId) = StageRow(si.stageId, si.name.takeWhile(_ != '\n'),
          si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          m.inputMetrics.bytesRead / 1e6,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6)
      }
    }

    val fn = SparkEntry.queries(name)
    // warmup (codegen/JIT) on the small sf, like the bench
    fn(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    System.gc(); Thread.sleep(300)

    spark.sparkContext.addSparkListener(listener)
    var best = Double.MaxValue
    (1 to reps).foreach { i =>
      jobs.clear(); stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name rep $i: $sec%.3f s, ${jobs.size} jobs, ${stages.size} stages")
      if (sec < best) best = sec
      if (i == reps) { // print the last rep's breakdown
        spark.sparkContext.removeSparkListener(listener)
        Thread.sleep(200) // let final events drain
        println(f"[profile] ---- jobs (last rep) ----")
        var acct = 0.0
        jobs.foreach { case (id, (s, e, st)) =>
          val sec = (e - s) / 1e9; acct += sec
          println(f"[profile] job $id%3d ${sec}%7.3f s  stages=${st.mkString(",")}")
        }
        println(f"[profile] jobs account for $acct%.3f s of $sec%.3f s wall")
        println(f"[profile] ---- stages (last rep) ----")
        stages.toSeq.sortBy(-_._2.ms).foreach { case (_, r) =>
          println(f"[profile] stage ${r.id}%3d ${r.ms / 1e3}%7.3f s  tasks=${r.tasks}%3d in=${r.inputMB}%8.1fMB sr=${r.shufReadMB}%8.2fMB sw=${r.shufWriteMB}%8.2fMB  ${r.name.take(90)}")
        }
      }
    }
    println(f"[profile] $name best: $best%.3f s")
    spark.stop()
  }
}
