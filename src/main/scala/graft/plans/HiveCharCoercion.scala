package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression,
  StringTranslate,
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
/** Post-hoc companion to [[HiveCharCoercion]]: string functions whose
  * Hive twin reads char args through the stripped-value converter even
  * when the analyzer inserts NO cast (the argument type already
  * satisfies the function). Runs as a post-resolution rule because the
  * plan is fully resolved by the time these functions appear —
  * `resolveExpressionsUp` would skip them — and must run BEFORE the
  * optimizer's constant folding. */
object HiveCharArgStrip extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case t: StringTranslate if t.children.exists(c => c.resolved &&
          c.dataType.isInstanceOf[CharType] &&
          !c.isInstanceOf[StringTrimRight]) =>
        t.withNewChildren(t.children.map {
          case c if c.resolved && c.dataType.isInstanceOf[CharType] &&
              !c.isInstanceOf[StringTrimRight] =>
            // cast to STRING as well: otherwise the result type stays
            // char(n) and read-side padding re-pads the collect
            Cast(StringTrimRight(c), StringType)
          case c => c
        })
    }
}

object HiveCharCoercion extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveExpressionsUp {
      case c @ Cast(child, StringType, _, _)
          if child.resolved && child.dataType.isInstanceOf[CharType] &&
            !child.isInstanceOf[StringTrimRight] =>
        c.copy(child = StringTrimRight(child))
    }
}
