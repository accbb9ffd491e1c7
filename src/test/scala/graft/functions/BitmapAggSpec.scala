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

  test("in_file matches whole lines, caches per JVM") {
    val f = Files.createTempFile("graft_infile", ".txt")
    Files.writeString(f, "alpha\nbeta\ngamma")
    val rows = Seq("alpha", "alp", "gamma").toDF("s")
      .selectExpr(s"in_file(s, '${f.toString}') AS hit")
      .as[Boolean].collect().toSeq
    assert(rows === Seq(true, false, true))
  }
}
