package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression,
  StringTrimRight}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{CharType, StringType}

/** Hive reads a CHAR value through `HiveChar.getStrippedValue` whenever
  * it converts to another type (serde2 PrimitiveObjectInspectorConverter
  * — char→string, char→varchar, char→numeric all see the pad-stripped
  * text), and CHAR comparisons compare stripped values. Spark instead
  * casts the PADDED form, so `char(10) 'abc'` would not equal string
  * `'abc'`, and a union of char with string would keep the padding.
  *
  * This resolution rule restores Hive's contract at the one choke
  * point both cases go through: any `Cast(char → string-family)` the
  * analyzer inserts (type coercion for comparisons, unions, function
  * arguments) or the user writes strips the padding first. Pure
  * expression rewrite — stays codegen'd. */
object HiveCharCoercion extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveExpressionsUp {
      case c @ Cast(child, StringType, _, _)
          if child.resolved && child.dataType.isInstanceOf[CharType] &&
            !child.isInstanceOf[StringTrimRight] =>
        c.copy(child = StringTrimRight(child))
    }
}
