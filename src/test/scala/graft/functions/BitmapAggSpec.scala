package graft.functions

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

class BitmapAggSpec extends SparkSpec {
  import spark.implicits._

  test("bitmap_agg collects positions; count/and/or/empty have set semantics") {
    Seq(1L, 3L, 64L, 200L).toDF("pos").createOrReplaceTempView("bm_a")
    Seq(3L, 64L, 999L).toDF("pos").createOrReplaceTempView("bm_b")
    val r = spark.sql("""
      WITH a AS (SELECT bitmap_agg(pos) AS bm FROM bm_a),
           b AS (SELECT bitmap_agg(pos) AS bm FROM bm_b)
      SELECT bitmap_count(a.bm) AS ca, bitmap_count(b.bm) AS cb,
             bitmap_count(bitmap_and(a.bm, b.bm)) AS cand,
             bitmap_count(bitmap_or(a.bm, b.bm)) AS cor,
             bitmap_empty(bitmap_and(a.bm, b.bm)) AS e1
      FROM a, b""").head()
    assert(r.getAs[Long]("ca") === 4)
    assert(r.getAs[Long]("cb") === 3)
    assert(r.getAs[Long]("cand") === 2)  // {3, 64}
    assert(r.getAs[Long]("cor") === 5)   // {1,3,64,200,999}
    assert(r.getAs[Boolean]("e1") === false)
  }

  test("bitmap output is deterministic regardless of partitioning") {
    val a = spark.range(0, 1000, 1, 7).select(col("id") * 3)
      .toDF("pos").selectExpr("bitmap_agg(pos) AS bm").head().getSeq[Long](0)
    val b = spark.range(0, 1000, 1, 2).select(col("id") * 3)
      .toDF("pos").selectExpr("bitmap_agg(pos) AS bm").head().getSeq[Long](0)
    assert(a === b)
  }

  test("EWAH64 known word values from the published format") {
    // bits {0, 1, 65}: chunk0 literal 3, chunk1 literal 2 — one RLW
    // (runlen 0, 2 literals) then the two literal words
    val (w1, rlw1, bits1) = Ewah.encodeWords(Seq(0L, 3L, 1L, 2L))
    assert(w1 === Array(2L << 33, 3L, 2L))
    assert(rlw1 === 0 && bits1 === 128L)
    // bit 640 only: a 10-word zero run folds into the literal's RLW
    val (w2, _, _) = Ewah.encodeWords(Seq(10L, 1L))
    assert(w2 === Array((1L << 33) | (10L << 1), 1L))
    // chunks 2..4 all ones: zero-run RLW then a 1-run RLW
    val allOnes = Seq(2L, -1L, 3L, -1L, 4L, -1L)
    val (w3, rlw3, _) = Ewah.encodeWords(allOnes)
    assert(w3 === Array(2L << 1, (3L << 1) | 1L))
    assert(rlw3 === 1)
    // empty bitmap: a single empty RLW
    assert(Ewah.encodeWords(Nil)._1 === Array(0L))
  }

  test("EWAH encode/decode round-trips sparse bitmaps exactly") {
    val cases = Seq(
      Seq.empty[Long],
      Seq(0L, 1L),
      Seq(0L, -1L),
      Seq(5L, 123L, 6L, -1L, 7L, -1L, 9L, 42L),
      Seq(0L, 7L, 1000000L, Long.MinValue, 1000001L, -1L))
    cases.foreach { sparse =>
      val back = Ewah.decode(Ewah.encode(sparse))
      assert(back.toSeq === sparse,
        s"roundtrip mismatch for $sparse")
    }
  }

  test("EWAH compresses runs: huge gaps cost O(1) words") {
    val sparse = Seq(0L, 1L, 10000000L, 1L)
    val bytes = Ewah.encode(sparse)
    assert(bytes.length < 100, s"gap should compress, got ${bytes.length}B")
    assert(Ewah.decode(bytes).toSeq === sparse)
  }

  test("ewah_encode/ewah_decode round-trip through SQL") {
    Seq(1L, 3L, 64L, 200L).toDF("pos").createOrReplaceTempView("bm_sql")
    val r = spark.sql("""
      SELECT bitmap_count(ewah_decode(ewah_encode(bitmap_agg(pos)))) AS c
      FROM bm_sql""").head()
    assert(r.getAs[Long]("c") === 4)
  }

  test("in_file matches whole lines, caches per JVM") {
    val f = Files.createTempFile("graft_infile", ".txt")
    Files.writeString(f, "alpha\nbeta\ngamma")
    val rows = Seq("alpha", "alp", "gamma").toDF("s")
      .selectExpr(s"in_file(s, '${f.toString}') AS hit")
      .as[Boolean].collect().toSeq
    assert(rows === Seq(true, false, true))
  }
}
