package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  private lazy val snapshots = Seq(
    (1L, ts(0), "A"), (1L, ts(100), "B"), (3L, ts(0), "Z"))
    .toDF("user_id", "ts", "label")

  private lazy val events = Seq(
    (1L, ts(50), 10.0),   // between snapshots -> A
    (1L, ts(100), 20.0),  // equal ts -> B (<= semantics)
    (1L, ts(150), 30.0),  // after last -> B
    (2L, ts(50), 40.0))   // no snapshot for this key -> null
    .toDF("user_id", "ts", "value")

  test("asof attaches the latest preceding snapshot per key") {
    val got = AsOfJoin.asof(events, snapshots, "user_id", "ts",
        payload = Seq("label"))
      .orderBy("user_id", "ts")
      .select("user_id", "value", "asof_label")
      .as[(Long, Double, Option[String])].collect().toSeq
    assert(got === Seq(
      (1L, 10.0, Some("A")), (1L, 20.0, Some("B")), (1L, 30.0, Some("B")),
      (2L, 40.0, None)))
  }

  test("tolerance nulls out stale matches (ASOF ... WITHIN)") {
    val got = AsOfJoin.asof(events, snapshots, "user_id", "ts",
        payload = Seq("label"), tolerance = Some(60L))
      .orderBy("user_id", "ts")
      .select("value", "asof_label")
      .as[(Double, Option[String])].collect().toSeq
    // t=50: age 50 <= 60 -> A; t=100: age 0 -> B; t=150: age 50 -> B
    assert(got === Seq((10.0, Some("A")), (20.0, Some("B")),
      (30.0, Some("B")), (40.0, None)))
  }

  test("NULL payload on the true match stays NULL (no stale fallback)") {
    // the latest preceding snapshot at t=100 carries a NULL label; the
    // join must NOT fall back to the older non-null 'A'
    val snaps = Seq((1L, ts(0), Some("A")), (1L, ts(100), None))
      .toDF("user_id", "ts", "label")
    val evs = Seq((1L, ts(150), 1.0)).toDF("user_id", "ts", "value")
    val got = AsOfJoin.asof(evs, snaps, "user_id", "ts", Seq("label"))
      .select("asof_label").as[Option[String]].collect().toSeq
    assert(got === Seq(None))
    // and the tolerance check must judge freshness on that SAME row:
    // the null-label row at t=100 is fresh (age 50 <= 60), so the match
    // is the null label — not the stale-but-nonnull t=0 row
    val tol = AsOfJoin.asof(evs, snaps, "user_id", "ts", Seq("label"),
        tolerance = Some(60L))
      .select("asof_label").as[Option[String]].collect().toSeq
    assert(tol === Seq(None))
  }

  test("one shuffle: plan has a single hashpartitioning exchange") {
    val q = AsOfJoin.asof(events, snapshots, "user_id", "ts", Seq("label"))
    val p = q.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p)
  }

  test("runs on real events: purchases as-of latest prior click per user") {
    val e = graft.Engine.tables(spark, sfDir)("events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val joined = AsOfJoin.asof(purchases, clicks, "user_id", "ts",
      payload = Seq("click_id"))
    assert(joined.count() === purchases.count()) // left rows preserved
    assert(joined.filter(col("asof_click_id").isNotNull).count() > 0)
  }
}
