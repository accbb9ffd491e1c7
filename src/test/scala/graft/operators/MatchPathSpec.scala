package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class MatchPathSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("c+p pattern finds non-overlapping click-streak funnels") {
    // user 1: c c p c p  -> matches (ccp)(cp); user 2: p c -> no match
    val evs = Seq(
      (1L, 1L, ts(0), "click"), (1L, 2L, ts(1), "click"),
      (1L, 3L, ts(2), "purchase"), (1L, 4L, ts(3), "click"),
      (1L, 5L, ts(4), "purchase"),
      (2L, 6L, ts(0), "purchase"), (2L, 7L, ts(1), "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = MatchPath.matchPath(evs,
        partitionCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
        symbols = Seq('c' -> (col("event_type") === "click"),
          'p' -> (col("event_type") === "purchase")),
        pattern = "c+p",
        keep = Seq("user_id", "event_id"))
      .orderBy("user_id", "match_id", "match_pos")
      .as[(Long, Long, Int, Int)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 0, 0), (1L, 2L, 0, 1), (1L, 3L, 0, 2),
      (1L, 4L, 1, 0), (1L, 5L, 1, 1)))
  }

  test("rows matching no symbol break the path") {
    val evs = Seq(
      (1L, 1L, ts(0), "click"), (1L, 2L, ts(1), "view"),
      (1L, 3L, ts(2), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = MatchPath.matchPath(evs, Seq("user_id"), Seq("ts", "event_id"),
      Seq('c' -> (col("event_type") === "click"),
        'p' -> (col("event_type") === "purchase")),
      "c+p", Seq("event_id"))
    assert(got.count() === 0) // 'view' interrupts c+p
  }

  test("runs on the real events table") {
    val e = Engine.tables(spark, sfDir)("events")
    val m = MatchPath.matchPath(e, Seq("user_id"), Seq("ts", "event_id"),
      Seq('c' -> (col("event_type") === "click"),
        'p' -> (col("event_type") === "purchase")),
      "c+p", Seq("user_id", "event_id", "event_type"))
    assert(m.count() > 0)
    // every match ends in a purchase: max match_pos row is 'p'
    val bad = m.withColumn("mx",
        max(col("match_pos")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "match_id")))
      .filter(col("match_pos") === col("mx") &&
        col("event_type") =!= "purchase")
    assert(bad.count() === 0)
  }

  private lazy val Engine = graft.Engine
}
