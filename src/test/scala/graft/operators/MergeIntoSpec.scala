package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val p = s"${Files.createTempDirectory("graft_merge")}/t"
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "amount").write.parquet(p)
    p
  }

  test("UPDATE rewrites matching rows only") {
    val p = freshTable()
    MergeInto.update(spark, p, col("id") === 2,
      Map("amount" -> lit(99.0), "name" -> lit("B")))
    val got = spark.read.parquet(p).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0)))
  }

  test("DELETE removes matching rows; null predicate keeps row") {
    val p = freshTable()
    MergeInto.delete(spark, p, col("amount") > 15)
    val got = spark.read.parquet(p).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a", 10.0)))
  }

  test("MERGE updates matched and inserts unmatched") {
    val p = freshTable()
    val src = Seq((2L, "b2", 200.0), (4L, "d", 40.0))
      .toDF("id", "name", "amount")
    MergeInto.merge(spark, p, src, "id")
    val got = spark.read.parquet(p).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a", 10.0), (2L, "b2", 200.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("MERGE with deleteMatched removes source keys") {
    val p = freshTable()
    val src = Seq((1L, "x", 0.0), (3L, "y", 0.0)).toDF("id", "name", "amount")
    MergeInto.merge(spark, p, src, "id", deleteMatched = true)
    val got = spark.read.parquet(p).select("id").as[Long].collect().toSeq
    assert(got === Seq(2L))
  }
}
