package graft

import java.util.concurrent.{Executors, TimeUnit}

/** Replays the swept golden corpus: every clientpositive `.q.out` file
  * that [[GoldenSweep]] verified end-to-end (list committed at
  * src/test/resources/golden_corpus.txt as `file<TAB>asserts`). Each
  * file runs in its own child session with the full qtest fixture set,
  * exactly as the sweep ran it — a fresh temp-view catalog per file, so
  * a script that mutates `src` or creates scratch tables can't leak
  * into the next file. Assert counts are pinned: a count drop means a
  * statement stopped replaying (harness or engine regression).
  */
class GoldenCorpusSpec extends SparkSpec {

  private lazy val corpus: Seq[(String, Int)] = {
    val in = getClass.getResourceAsStream("/golden_corpus.txt")
    assert(in != null, "golden_corpus.txt resource missing")
    val s = scala.io.Source.fromInputStream(in)
    try s.getLines().filterNot(l =>
        l.trim.isEmpty || l.startsWith("#")).map { l =>
      val a = l.split("\t")
      a(0) -> a(1).toInt
    }.toVector finally s.close()
  }

  test("golden corpus replay (swept clientpositive files, pinned " +
      "assert counts)") {
    val root = spark // shared context; fresh session per file below
    val failures =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val pool = Executors.newFixedThreadPool(6)
    corpus.foreach { case (f, want) =>
      pool.execute { () =>
        try {
          val s = Engine.prepare(root.newSession())
          val h = new GoldenHarness(s)
          h.loadAll()
          val got = h.replay(f, skip = GoldenSweep.autoSkip)
          if (got != want)
            failures.add(f -> s"asserted $got blocks, pinned $want")
        } catch {
          case e: Throwable => failures.add(f ->
            Option(e.getMessage).getOrElse(e.getClass.getName).take(250))
        }
      }
    }
    pool.shutdown()
    assert(pool.awaitTermination(40, TimeUnit.MINUTES),
      "corpus replay timed out")
    import scala.jdk.CollectionConverters._
    assert(failures.isEmpty,
      s"${failures.size} of ${corpus.size} corpus files failed:\n" +
        failures.asScala.map { case (f, m) => s"$f: $m" }.mkString("\n\n"))
  }
}
