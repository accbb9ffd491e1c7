package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Hive cast semantics Spark diverges from, restored at the analyzer's
  * Cast nodes (user-written or coercion-inserted — both flow through
  * here):
  *
  *  - string → boolean: ANY non-empty string is TRUE
  *    (serde2/lazy/LazyBoolean + udf/UDFToBoolean.java:47 — `'false'`
  *    and `'Foo'` are both true; only the empty string is false)
  *  - boolean → string: upper-case `TRUE`/`FALSE`
  *    (udf/UDFToString booleans render via BooleanWritable.toString →
  *    Hive upper-cases in LazyUtils.writePrimitiveUTF8)
  *  - decimal → integral: out-of-range yields NULL instead of
  *    two's-complement wrap (HiveDecimal.byteValue/shortValue/intValue
  *    checked conversions via GenericUDFToByte etc.)
  *
  * Pure expression rewrites — everything stays codegen'd.
  */
object HiveCasts extends Rule[LogicalPlan] {

  private def checkedDecimalCast: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("graft.hive.checkedDecimalCast", "true") == "true"

  /** hive.int.timestamp.conversion.in.seconds (HiveConf, default
    * FALSE): an integral (or boolean) cast to timestamp is epoch
    * MILLISECONDS in the reference unless the flag is flipped
    * (TimestampWritable.setFromLong path); double/float/decimal are
    * always seconds. Spark treats integrals as seconds, so the default
    * needs a rewrite. */
  private def intTimestampSeconds: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("graft.hive.intTimestampSeconds", "false") == "true"

  /** Hive hybrid-calendar datetime arithmetic (see
    * [[graft.functions.HiveDateTimeMath]]); on by default, a session
    * conf opts back into Spark's proleptic arithmetic. */
  private def hiveDatetimeArith: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("graft.hive.datetimeArith", "true") == "true"

  /** Hive's VECTORIZED string→date/timestamp parse is STRICT
    * (CastStringToDate/CastStringToTimestamp reject what the row
    * path's java.sql valueOf would roll) — sessions following a
    * vectorized recording set this to suppress the lenient-roll
    * literal rules below. */
  private def strictStringDates: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("graft.hive.strictStringDates", "false") == "true"

  /** decimal→string normalization (HiveDecimal.toString trims trailing
    * zeros); a session conf opts back into Spark's scale-preserving
    * rendering, consistent with the other divergence rules here. */
  private def hiveDecimalText: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("graft.hive.decimalText", "true") == "true"

  /** `yyyy-M-d` text parsed with Hive's lenient calendar (out-of-range
    * month/day ROLL forward, java.sql.Date.valueOf semantics). None
    * when the text isn't date-shaped (cast stays as written) —
    * ANCHORED: trailing/leading garbage ('x2001-01-01',
    * '2001-01-01 junk') throws in java.sql.Date.valueOf → stays with
    * Spark's strict cast (NULL), it must not substring-match here. */
  private[graft] def lenientDateRoll(s: String)
      : Option[java.time.LocalDate] = {
    val m = "^\\s*(\\d{1,4})-(\\d{1,2})-(\\d{1,2})\\s*$".r
      .findFirstMatchIn(s)
    m.flatMap { g =>
      scala.util.Try(
        java.time.LocalDate.of(g.group(1).toInt, 1, 1)
          .plusMonths(g.group(2).toLong - 1)
          .plusDays(g.group(3).toLong - 1)).toOption
    }
  }

  /** The reference's string→date conversion, whole
    * (PrimitiveObjectInspectorUtils.getDate:1059-1081): try
    * java.sql.Date.valueOf (anchored `y-m-d`, out-of-range fields
    * ROLL), else getTimestampFromString (no space → append
    * " 00:00:00"; Timestamp.valueOf shape, whose deprecated
    * constructor also rolls), else NULL. Notably NULLs
    * '2001-01-01 junk' where Spark's cast accepts a trailing
    * segment after the space. */
  private[graft] def refDateParse(s0: String)
      : Option[java.time.LocalDate] = {
    val s = s0.trim
    lenientDateRoll(s).orElse {
      val t = if (!s.contains(' ')) s + " 00:00:00" else s
      ("^(\\d{1,4})-(\\d{1,2})-(\\d{1,2}) " +
        "(\\d{1,2}):(\\d{1,2}):(\\d{1,2})(\\.\\d{1,9})?$").r
        .findFirstMatchIn(t).flatMap { g =>
          scala.util.Try(
            java.time.LocalDateTime
              .of(g.group(1).toInt, 1, 1, 0, 0, 0)
              .plusMonths(g.group(2).toLong - 1)
              .plusDays(g.group(3).toLong - 1)
              .plusHours(g.group(4).toLong)
              .plusMinutes(g.group(5).toLong)
              .plusSeconds(g.group(6).toLong)
              .toLocalDate).toOption
        }
    }
  }

  /** Is `e` a double-valued expression whose underlying value is of
    * type `src` (a bare value or coercion-inserted Cast to double)? */
  private def isDoubleOf(e: Expression, src: DataType): Boolean = e match {
    case Cast(c, DoubleType, _, _) => c.resolved && c.dataType == src
    case _ => e.resolved && e.dataType == src
  }

  private def decimalUnderDouble(e: Expression): Boolean = e match {
    case Cast(c, DoubleType, _, _) =>
      c.resolved && c.dataType.isInstanceOf[DecimalType]
    case _ => false
  }

  private def integralBound(dt: DataType): Option[(Long, Long)] = dt match {
    case ByteType => Some((Byte.MinValue.toLong, Byte.MaxValue.toLong))
    case ShortType => Some((Short.MinValue.toLong, Short.MaxValue.toLong))
    case IntegerType => Some((Int.MinValue.toLong, Int.MaxValue.toLong))
    case LongType => Some((Long.MinValue, Long.MaxValue))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveExpressionsUp {
      case Cast(child, BooleanType, tz, ansi)
          if child.resolved && child.dataType == StringType =>
        If(IsNull(child), Literal.create(null, BooleanType),
          GreaterThan(Length(child), Literal(0)))
      case Cast(child, StringType, _, _)
          if child.resolved && child.dataType == BooleanType =>
        If(IsNull(child), Literal.create(null, StringType),
          If(child, Literal("TRUE"), Literal("FALSE")))
      case c @ Cast(child, dt, _, EvalMode.LEGACY)
          if child.resolved && child.dataType.isInstanceOf[DecimalType] &&
            integralBound(dt).isDefined && checkedDecimalCast =>
        // TRY mode nulls on overflow — exactly the reference's checked
        // HiveDecimal conversions (GenericUDFToByte etc.); the
        // VECTORIZED reference path wraps two's-complement instead
        // (CastDecimalToLong) — a session conf picks, default checked.
        // Re-matching is impossible since the mode is no longer LEGACY.
        c.copy(evalMode = EvalMode.TRY)
      case Cast(child, TimestampType, tz, mode)
          if child.resolved && (child.dataType == BooleanType ||
            integralBound(child.dataType).isDefined) =>
        // integral/boolean → timestamp follows
        // hive.int.timestamp.conversion.in.seconds (default FALSE =
        // epoch millis; TimestampWritable.setFromLong path); Spark's
        // native cast is seconds (micros for boolean), so both modes
        // need explicit conversion
        val asLong = Cast(child, LongType, tz, mode)
        if (intTimestampSeconds) SecondsToTimestamp(asLong)
        else MillisToTimestamp(asLong)
      case Cast(Literal(s: org.apache.spark.unsafe.types.UTF8String,
            StringType), DateType, _, _)
          if s != null && !strictStringDates &&
            refDateParse(s.toString).map(_.toEpochDay.toInt) !=
              org.apache.spark.sql.catalyst.util.DateTimeUtils
                .stringToDate(s) =>
        // Hive parses date STRINGS through getDate (lenient roll:
        // '1970-02-29' → 1970-03-01, which Spark NULLs) but REJECTS a
        // trailing non-time segment ('2001-01-01 junk' → NULL, which
        // Spark accepts). Fold the reference value wherever the two
        // disagree. Literal-only: folded at analysis, nothing at
        // runtime.
        refDateParse(s.toString) match {
          case Some(d) => Literal(d.toEpochDay.toInt, DateType)
          case None => Literal.create(null, DateType)
        }
      case c @ Cast(Literal(s: org.apache.spark.unsafe.types.UTF8String,
            StringType), TimestampType, tz, _)
          if s != null && !strictStringDates && s.toString.matches(
            """\s*\d{1,4}-\d{1,2}-\d{1,2} \d{1,2}:\d{1,2}:\d{1,2}(\.\d+)?\s*""") && {
            val zid = java.time.ZoneId.of(tz.getOrElse(
              org.apache.spark.sql.internal.SQLConf.get
                .sessionLocalTimeZone))
            org.apache.spark.sql.catalyst.util.DateTimeUtils
              .stringToTimestamp(s, zid).isEmpty &&
              lenientDateRoll(s.toString.trim.takeWhile(_ != ' ')).isDefined
          } =>
        // full `y-m-d h:m:s` strings cast through java.sql.Timestamp
        // .valueOf in the reference, whose Date constructor ROLLS
        // out-of-range month/day ('2002-02-31 00:00:00' → Mar 3);
        // date-only strings (no time) are NULL there — valueOf
        // requires the time part — so they stay with Spark's cast
        val zid = java.time.ZoneId.of(tz.getOrElse(
          org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
        val str = s.toString.trim
        val rolled = lenientDateRoll(str.takeWhile(_ != ' ')).get.toString +
          str.dropWhile(_ != ' ')
        org.apache.spark.sql.catalyst.util.DateTimeUtils.stringToTimestamp(
          org.apache.spark.unsafe.types.UTF8String.fromString(rolled), zid)
          .map(m => Literal(m, TimestampType): Expression).getOrElse(c)
      // datetime arithmetic runs on Hive's epoch-millis (hybrid
      // Julian/Gregorian java.sql types — DateTimeMath.java:357-380):
      // date-date keeps DST hours, pre-Gregorian dates keep Julian
      // field arithmetic. Spark's proleptic micros diverge there.
      case SubtractDates(l, r, _)
          if l.resolved && r.resolved && hiveDatetimeArith =>
        graft.functions.HiveDatetimeDiff(l, r)
      case SubtractTimestamps(l, r, _, tz)
          if l.resolved && r.resolved &&
            l.dataType != TimestampNTZType &&
            r.dataType != TimestampNTZType && hiveDatetimeArith =>
        graft.functions.HiveDatetimeDiff(l, r, tz)
      case TimestampAddYMInterval(ts, iv, tz)
          if ts.resolved && iv.resolved && ts.dataType == TimestampType &&
            hiveDatetimeArith =>
        graft.functions.HiveTimestampAddMonths(ts, iv, tz)
      case ta @ TimestampAddInterval(l, r, tz)
          if l.resolved && r.resolved && ta.dataType == TimestampType &&
            r.dataType.isInstanceOf[DayTimeIntervalType] &&
            hiveDatetimeArith =>
        graft.functions.HiveTimestampAddInterval(l, r, 1, tz)
      // boolean <cmp> numeric: Spark rejects the comparison, but the
      // reference falls back to DOUBLE when no common comparison class
      // exists (GenericUDFBaseCompare.java:137-144 — null common class
      // → doubleTypeInfo; PrimitiveObjectInspectorUtils.getDouble maps
      // boolean → 1/0). `cboolean1 >= 1` is therefore a double compare.
      case cmp: BinaryComparison if !cmp.resolved &&
          cmp.left.resolved && cmp.right.resolved &&
          Seq(cmp.left, cmp.right).map(_.dataType).toSet.sizeIs == 2 &&
          Seq(cmp.left, cmp.right).exists(_.dataType == BooleanType) &&
          Seq(cmp.left, cmp.right).exists(
            _.dataType.isInstanceOf[NumericType]) =>
        cmp.withNewChildren(Seq(cmp.left, cmp.right).map {
          case b if b.dataType == BooleanType =>
            If(IsNull(b), Literal.create(null, DoubleType),
              If(b, Literal(1.0d), Literal(0.0d)))
          case n => Cast(n, DoubleType)
        })
      // decimal <cmp> float compares at FLOAT precision in the
      // reference (getCommonClassForComparison resolves decimal+float
      // to float), so `d = cast('0.22' as float)` matches decimal
      // 0.22; Spark widens both to double, where float 0.22f !=
      // 0.22d. Round the decimal side through float first.
      case cmp: BinaryComparison if cmp.resolved &&
          isDoubleOf(cmp.left, FloatType) !=
            isDoubleOf(cmp.right, FloatType) &&
          (decimalUnderDouble(cmp.left) || decimalUnderDouble(cmp.right))
          =>
        cmp.withNewChildren(Seq(cmp.left, cmp.right).map {
          case Cast(d, DoubleType, tz, mode)
              if d.resolved && d.dataType.isInstanceOf[DecimalType] =>
            Cast(Cast(d, FloatType, tz, mode), DoubleType, tz, mode)
          case other => other
        })
      // numeric IN (string literals): Spark coerces the whole IN to
      // STRING ("0.220" != "0.22"); the reference compares numerically
      // (common class numeric+string = double) — d in ('0.22') matches
      // decimal 0.220
      // the widened value may already be this rule's own decimal
      // rendering (the StaticInvoke form) — match either shape via
      // stringWidenedNumeric, else "146.0 IN ('146.0')" compares
      // "146" (normalized) to "146.0" and misses
      case In(v0, list)
          if HiveCasts.stringWidenedNumeric(v0).isDefined &&
            list.nonEmpty && list.forall(e =>
              e.foldable && e.dataType == StringType) =>
        In(Cast(HiveCasts.stringWidenedNumeric(v0).get, DoubleType),
          list.map(e => Cast(e, DoubleType)))
      // the mirror: STRING value IN (numeric operands) — Spark widens
      // the whole IN to string (and the decimal text rule below then
      // renders "146" for 146.0, so '146.0' IN (146.0) would miss);
      // the reference's comparison class is double here too. Only
      // ANALYZER-inserted string casts unwrap — a user's explicit
      // cast keeps the string compare, as in Hive.
      case In(v, list)
          if v.resolved && v.dataType == StringType &&
            list.nonEmpty && list.forall(e => e.resolved &&
              HiveCasts.stringWidenedNumeric(e).isDefined) =>
        In(Cast(v, DoubleType),
          list.map(e =>
            Cast(HiveCasts.stringWidenedNumeric(e).get, DoubleType)))
      // decimal → string renders the NORMALIZED value (HiveDecimal
      // .toString: trailing zeros trimmed, "100.00" -> "100");
      // Spark's cast keeps the declared scale
      case c0 @ Cast(child, StringType, _, _)
          if child.resolved &&
            child.dataType.isInstanceOf[DecimalType] &&
            child.dataType.asInstanceOf[DecimalType].scale > 0 &&
            hiveDecimalText =>
        val si = org.apache.spark.sql.catalyst.expressions.objects
          .StaticInvoke(
            graft.functions.HiveDecimalText.getClass,
            StringType, "decimalString", Seq(child),
            inputTypes = Seq(child.dataType),
            returnNullable = true)
        // a USER-written cast keeps its provenance (the IN coercion
        // rules above must not unwrap it back to a numeric compare)
        if (c0.getTagValue(Cast.USER_SPECIFIED_CAST).isDefined)
          si.setTagValue(HiveCasts.UserCastTag, ())
        si
      // char/varchar casts TRUNCATE on overflow
      // (serde2/typeinfo/BaseCharUtils.enforceMaxLength) — Spark
      // raises EXCEED_LIMIT_LENGTH instead; pre-truncating with
      // substring makes the cast total (and the cast then pads char)
      case c @ Cast(child, dt @ (_: CharType | _: VarcharType), _, _)
          if child.resolved && !truncGuard(child, dt) &&
            (child.dataType == StringType ||
              child.dataType.isInstanceOf[CharType] ||
              child.dataType.isInstanceOf[VarcharType]) =>
        val n = dt match {
          case CharType(x) => x
          case VarcharType(x) => x
        }
        c.copy(child = Substring(child, Literal(1), Literal(n)))
    }

  /** True when `child` already is the pre-truncation this rule
    * inserts (prevents fixpoint re-wrapping). */
  private def truncGuard(child: Expression, dt: DataType): Boolean = {
    val n = dt match {
      case CharType(x) => x
      case VarcharType(x) => x
      case _ => return true
    }
    child match {
      case Substring(_, Literal(1, _), Literal(`n`, _)) => true
      case _ => false
    }
  }

  /** Marks a HiveDecimalText rendering that replaced a USER-written
    * cast (vs an analyzer-inserted coercion cast). */
  val UserCastTag =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit](
      "graft.userSpecifiedCast")

  /** The numeric operand under an ANALYZER-inserted string widening:
    * a coercion `Cast(numeric → string)` (no USER_SPECIFIED_CAST
    * tag), or this rule's own HiveDecimalText rendering of one. */
  def stringWidenedNumeric(e: Expression): Option[Expression] =
    e match {
      case c @ Cast(child, StringType, _, _)
          if child.resolved &&
            child.dataType.isInstanceOf[NumericType] &&
            c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
        Some(child)
      case si: org.apache.spark.sql.catalyst.expressions.objects
            .StaticInvoke
          if si.functionName == "decimalString" &&
            si.getTagValue(UserCastTag).isEmpty &&
            si.arguments.length == 1 && si.arguments.head.resolved &&
            si.arguments.head.dataType.isInstanceOf[NumericType] =>
        Some(si.arguments.head)
      case _ => None
    }
}
