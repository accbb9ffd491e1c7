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
}
