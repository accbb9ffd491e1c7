package graft.functions

import java.util.{GregorianCalendar, TimeZone}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, TimeZoneAwareExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types._

/** Hive's datetime arithmetic runs on `java.sql.Date`/`Timestamp`
  * epoch MILLIS — local-midnight instants through the HYBRID
  * Julian/Gregorian calendar (java.util.GregorianCalendar, Julian
  * before 1582-10-15) — whereas Spark computes on proleptic-Gregorian
  * micros. The two agree for modern values but diverge for
  * pre-Gregorian dates (yr 4: two-day field shift, Julian leap years
  * like yr 100) and for date-date differences that straddle a DST
  * transition (Hive's millis difference keeps the hour:
  * GenericUDFOPDTIMinus + DateTimeMath.subtract,
  * ql/util/DateTimeMath.java:357-380).
  *
  * `toHybridMicros` maps a Spark value (the proleptic FIELDS, which
  * round-trip the original text) to Hive's epoch micros;
  * `fromHybridMicros` maps an arithmetic result back to the Spark
  * value whose proleptic fields equal Hive's rendered fields.
  */
object HiveDateTimeMath {

  private val cal = new ThreadLocal[GregorianCalendar]()

  private def calendar(zone: String): GregorianCalendar = {
    var c = cal.get()
    if (c == null) { c = new GregorianCalendar(); cal.set(c) }
    c.setTimeZone(TimeZone.getTimeZone(zone))
    c.clear()
    c
  }

  /** Hive epoch micros of a DateType value (local midnight of the
    * date's FIELDS through the hybrid calendar — java.sql.Date
    * .valueOf semantics). */
  def dateToHybridMicros(epochDay: Int, zone: String): Long = {
    val ld = java.time.LocalDate.ofEpochDay(epochDay.toLong)
    val c = calendar(zone)
    c.set(ld.getYear, ld.getMonthValue - 1, ld.getDayOfMonth, 0, 0, 0)
    c.getTimeInMillis * 1000L
  }

  /** Hive epoch micros of a TimestampType value: re-interpret the
    * session-zone FIELDS through the hybrid calendar
    * (java.sql.Timestamp.valueOf semantics). */
  def tsToHybridMicros(micros: Long, zone: String): Long = {
    val zid = java.time.ZoneId.of(zone)
    val ldt = java.time.Instant
      .ofEpochSecond(Math.floorDiv(micros, 1000000L),
        Math.floorMod(micros, 1000000L) * 1000L)
      .atZone(zid).toLocalDateTime
    val c = calendar(zone)
    c.set(ldt.getYear, ldt.getMonthValue - 1, ldt.getDayOfMonth,
      ldt.getHour, ldt.getMinute, ldt.getSecond)
    c.getTimeInMillis * 1000L + ldt.getNano / 1000L % 1000000L
  }

  /** Inverse of [[tsToHybridMicros]]: read the hybrid calendar's
    * FIELDS at the given Hive epoch micros and build the Spark
    * timestamp with those proleptic fields. */
  def fromHybridMicros(hybridMicros: Long, zone: String): Long = {
    val ms = Math.floorDiv(hybridMicros, 1000000L) * 1000L
    val c = calendar(zone)
    c.setTimeInMillis(ms)
    val ldt = java.time.LocalDateTime.of(
      c.get(java.util.Calendar.YEAR),
      c.get(java.util.Calendar.MONTH) + 1,
      c.get(java.util.Calendar.DAY_OF_MONTH),
      c.get(java.util.Calendar.HOUR_OF_DAY),
      c.get(java.util.Calendar.MINUTE),
      c.get(java.util.Calendar.SECOND),
      (Math.floorMod(hybridMicros, 1000000L) * 1000L).toInt)
    val zid = java.time.ZoneId.of(zone)
    val i = ldt.atZone(zid).toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  def hybridOf(value: Any, dt: DataType, zone: String): Long = dt match {
    case DateType => dateToHybridMicros(value.asInstanceOf[Int], zone)
    case _ => tsToHybridMicros(value.asInstanceOf[Long], zone)
  }

  /** Hive's Timestamp subtraction splits each side into
    * `MILLISECONDS.toSeconds(getTime())` — TOWARD-ZERO division, one
    * second high for pre-1970 instants with a fraction — plus the
    * POSITIVE sub-second nanos (DateTimeMath.java:368-380). The
    * difference therefore goes off by a full second when an operand
    * sits before the epoch; reproduced verbatim. */
  def hiveDiffMicros(hL: Long, hR: Long): Long = {
    def ms(h: Long): Long =
      Math.floorDiv(h, 1000000L) * 1000L + Math.floorMod(h, 1000000L) / 1000L
    def sec(h: Long): Long = ms(h) / 1000L // toward zero, like the ref
    def frac(h: Long): Long = Math.floorMod(h, 1000000L)
    (sec(hL) - sec(hR)) * 1000000L + (frac(hL) - frac(hR))
  }

  private val calUtc = new ThreadLocal[GregorianCalendar]()

  /** ts + interval year-month: Hive does the month arithmetic on the
    * epoch millis in a UTC (hybrid) calendar — "Oracle semantics ...
    * done in UTC, then converted back to local timezone" — and
    * carries the input's sub-second nanos over verbatim
    * (DateTimeMath.addMonthsToMillisUtc + Timestamp.setNanos,
    * ql/util/DateTimeMath.java:60-122). A timestamp on the other side
    * of a DST transition therefore shifts its local HOUR. */
  def tsAddMonths(micros: Long, months: Int, zone: String): Long = {
    var c = calUtc.get()
    if (c == null) {
      c = new GregorianCalendar(TimeZone.getTimeZone("UTC"))
      calUtc.set(c)
    }
    val hybrid = tsToHybridMicros(micros, zone)
    c.setTimeInMillis(Math.floorDiv(hybrid, 1000000L) * 1000L)
    c.add(java.util.Calendar.MONTH, months)
    fromHybridMicros(
      Math.floorDiv(c.getTimeInMillis, 1000L) * 1000000L +
        Math.floorMod(hybrid, 1000000L), zone)
  }
}

/** HiveDecimal's string form is the NORMALIZED value — trailing
  * fractional zeros trimmed, never exponent notation
  * (storage-api FastHiveDecimalImpl.fastToFormatString). */
object HiveDecimalText {
  def decimalString(d: org.apache.spark.sql.types.Decimal)
      : org.apache.spark.unsafe.types.UTF8String = {
    val s = d.toJavaBigDecimal.stripTrailingZeros()
    org.apache.spark.unsafe.types.UTF8String.fromString(
      (if (s.scale < 0) s.setScale(0) else s).toPlainString)
  }
}

/** `date - date`, `ts - ts`, `date - ts`, `ts - date` →
  * interval_day_time, computed as Hive's epoch-millis difference
  * (GenericUDFOPDTIMinus; DateTimeMath.subtract). Replaces Spark's
  * SubtractDates/SubtractTimestamps via [[graft.plans.HiveCasts]]. */
case class HiveDatetimeDiff(left: Expression, right: Expression,
    timeZoneId: Option[String] = None)
    extends BinaryExpression with TimeZoneAwareExpression {

  override def dataType: DataType =
    DayTimeIntervalType(DayTimeIntervalType.DAY, DayTimeIntervalType.SECOND)
  override def prettyName: String = "hive_datetime_diff"

  override def withTimeZone(tz: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(tz))

  protected override def nullSafeEval(a: Any, b: Any): Any =
    HiveDateTimeMath.hiveDiffMicros(
      HiveDateTimeMath.hybridOf(a, left.dataType, zoneId.getId),
      HiveDateTimeMath.hybridOf(b, right.dataType, zoneId.getId))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val z = ctx.addReferenceObj("zone", zoneId.getId, "java.lang.String")
    def conv(v: String, dt: DataType): String = dt match {
      case DateType =>
        s"graft.functions.HiveDateTimeMath.dateToHybridMicros($v, $z)"
      case _ =>
        s"graft.functions.HiveDateTimeMath.tsToHybridMicros($v, $z)"
    }
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HiveDateTimeMath.hiveDiffMicros(" +
        s"${conv(a, left.dataType)}, ${conv(b, right.dataType)})")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HiveDatetimeDiff =
    copy(left = newLeft, right = newRight)
}

/** `(date|ts) ± interval day-to-second` → timestamp through Hive's
  * epoch-millis arithmetic (DateTimeMath.add on java.sql types) —
  * hybrid-calendar in, hybrid-calendar out. `sign` is +1 or -1. */
case class HiveTimestampAddInterval(left: Expression, right: Expression,
    sign: Int, timeZoneId: Option[String] = None)
    extends BinaryExpression with TimeZoneAwareExpression {

  override def dataType: DataType = TimestampType
  override def prettyName: String = "hive_ts_add_interval"

  override def withTimeZone(tz: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(tz))

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val base = HiveDateTimeMath.hybridOf(a, left.dataType, zoneId.getId)
    HiveDateTimeMath.fromHybridMicros(
      base + sign * b.asInstanceOf[Long], zoneId.getId)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val z = ctx.addReferenceObj("zone", zoneId.getId, "java.lang.String")
    val conv = left.dataType match {
      case DateType => "dateToHybridMicros"
      case _ => "tsToHybridMicros"
    }
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HiveDateTimeMath.fromHybridMicros(" +
        s"graft.functions.HiveDateTimeMath.$conv($a, $z) " +
        s"${if (sign >= 0) "+" else "-"} $b, $z)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HiveTimestampAddInterval =
    copy(left = newLeft, right = newRight)
}

/** `ts ± interval year-month` → timestamp via Hive's UTC-calendar
  * month arithmetic ([[HiveDateTimeMath.tsAddMonths]]). */
case class HiveTimestampAddMonths(left: Expression, right: Expression,
    timeZoneId: Option[String] = None)
    extends BinaryExpression with TimeZoneAwareExpression {

  override def dataType: DataType = TimestampType
  override def prettyName: String = "hive_ts_add_months"

  override def withTimeZone(tz: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(tz))

  protected override def nullSafeEval(a: Any, b: Any): Any =
    HiveDateTimeMath.tsAddMonths(a.asInstanceOf[Long],
      b.asInstanceOf[Int], zoneId.getId)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val z = ctx.addReferenceObj("zone", zoneId.getId, "java.lang.String")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HiveDateTimeMath.tsAddMonths($a, $b, $z)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HiveTimestampAddMonths =
    copy(left = newLeft, right = newRight)
}
