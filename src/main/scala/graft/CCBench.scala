package graft

import org.apache.spark.sql.functions._

/** Dev utility: time connectedComponents alone on the sf0.1 pair graph
  * (pairs materialized once, eagerly, outside the timed region).
  * Usage: runMain graft.CCBench [sfDir] [reps]
  */
object CCBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Engine.session(appName = "graft-ccbench")
    val docs = Engine.tables(spark, sfDir)("documents")
    val pairs = operators.Dedup
      .jaccardPairs(docs, threshold = 0.05, maxShingleFreq = Some(1000))
      .select("doc_a", "doc_b").localCheckpoint()
    println(s"[ccbench] pairs = ${pairs.count()}")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val out = operators.Dedup.connectedComponents(pairs)
      val n = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ccbench] rep $i: $sec%.3f s ($n nodes)")
    }
    // correctness vs a driver-side union-find ground truth (test-only)
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val truth = parent.keys.map(k => k -> find(k)).toMap
    val got = operators.Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bad = truth.filter { case (k, v) => got.get(k) != Some(v) }
    println(s"[ccbench] ground-truth check: ${if (bad.isEmpty) "OK"
      else s"MISMATCH ${bad.take(5)}"} (${truth.size} nodes)")
    spark.stop()
  }
}
