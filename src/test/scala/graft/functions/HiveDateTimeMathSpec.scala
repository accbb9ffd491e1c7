package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Hive hybrid-calendar datetime arithmetic (HiveDateTimeMath +
  * the HiveCasts rewrites): values pinned from the reference's own
  * recordings (vector_interval_arithmetic.q.out,
  * vectorized_timestamp.q.out — qtest zone America/Los_Angeles). */
class HiveDateTimeMathSpec extends SparkSpec {

  private def one(sql: String): Row = {
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    spark.sql(sql).collect().head
  }

  test("date - date crosses a DST transition with the hour intact") {
    // 1999-06-07 is PDT, 1999-01-01 PST: Hive's millis difference
    // keeps the hour (DateTimeMath.subtract) — 156 days 23:00, not a
    // whole day count
    val r = one(
      "select date '1999-06-07' - date '1999-01-01' as iv")
    assert(r.getAs[java.time.Duration]("iv") ==
      java.time.Duration.ofDays(156).plusHours(23))
  }

  test("pre-Gregorian date difference runs on the hybrid calendar") {
    // vector_interval_arithmetic.q.out: 0004-09-22 - 1999-06-07 =
    // -(728552 days 23:00) — two extra Julian days plus the DST hour;
    // Spark's proleptic SubtractDates would say -728551 days
    val r = one(
      "select date '0004-09-22' - date '1999-06-07' as iv")
    assert(r.getAs[java.time.Duration]("iv") ==
      java.time.Duration.ofDays(-728552).plusHours(-23))
  }

  test("identical operands still difference to zero") {
    val r = one("select date '0004-09-22' - date '0004-09-22' as iv")
    assert(r.getAs[java.time.Duration]("iv") == java.time.Duration.ZERO)
  }

  test("ts + year-month interval does month arithmetic in UTC") {
    // vector_interval_arithmetic.q.out: 1973-04-17 06:30:38 (PST,
    // before 1973's late-April DST start) + 2-2 lands in PDT June
    // 1975 at 07:30:38 — "Oracle semantics" UTC month-add
    // (DateTimeMath.java:111-122)
    val r = one("select cast(timestamp '1973-04-17 06:30:38' + " +
      "interval '2-2' year to month as string) as t")
    assert(r.getString(0) == "1975-06-17 07:30:38")
  }

  test("pre-1970 timestamp difference keeps Hive's toward-zero second") {
    // MILLISECONDS.toSeconds truncates toward zero, so a negative-
    // epoch fractional timestamp reads one second high
    // (DateTimeMath.java:368-380): date - same-day ts records
    // -(18:26:30.519542), not the true -(18:26:29.519542)
    val r = one("select date '0004-09-22' - " +
      "timestamp '0004-09-22 18:26:29.519542' as iv")
    assert(r.getAs[java.time.Duration]("iv") ==
      java.time.Duration
        .parse("PT-18H-26M-30.519542S"))
  }

  test("decimal -> string renders the normalized HiveDecimal text") {
    val r = one("select cast(cast('90.00' as decimal(10,2)) as string)" +
      " as a, cast(cast('1000.8230' as decimal(20,4)) as string) as b")
    assert(r.getString(0) == "90" && r.getString(1) == "1000.823")
  }

  test("sqrt of a negative input is NULL; sign(decimal) is an int") {
    val r = one("select sqrt(-1.0) as s, " +
      "sign(cast('-119.46' as decimal(10,2))) as g")
    assert(r.isNullAt(0))
    assert(r.get(1) == -1)
  }

  test("boolean compared to a number falls back to double compare") {
    // GenericUDFBaseCompare.java:137-144: no common comparison class
    // -> both sides to DOUBLE, boolean as 1/0
    val r = one("select (true >= 1) as a, (false >= 1) as b, " +
      "(cast(null as boolean) >= 1) as c")
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.isNullAt(2))
  }

  test("lenient date roll is ANCHORED: trailing/leading garbage is NULL") {
    // java.sql.Date.valueOf ROLLS '1970-02-29' → 1970-03-01, but
    // THROWS on 'x2001-01-01' / '2001-01-01 junk' — those must not
    // substring-match the roll rule (they'd fold to a valid date)
    val r = one("select cast('1970-02-29' as date) as roll, " +
      "cast('x2001-01-01' as date) as pre, " +
      "cast('2001-01-01 junk' as date) as post")
    assert(r.getDate(0).toString == "1970-03-01")
    assert(r.isNullAt(1) && r.isNullAt(2))
  }
}
