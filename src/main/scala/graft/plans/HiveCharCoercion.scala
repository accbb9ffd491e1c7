package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryComparison, Cast,
  Expression, In, StringTranslate,
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

  /** Does `e` read a CHAR value (directly or through the strip-cast
    * this rule inserts)? */
  private def charSide(e: Expression): Boolean = e match {
    case _ if !e.resolved => false
    case _ if e.dataType.isInstanceOf[CharType] => true
    case Cast(StringTrimRight(inner, _), StringType, _, _) =>
      inner.resolved && inner.dataType.isInstanceOf[CharType]
    case _ => false
  }

  /** A comparison against CHAR goes through Hive's char converter on
    * BOTH sides (getCommonClassForComparison char+string → char;
    * HiveChar compares stripped) — so the non-char STRING side strips
    * its trailing blanks too. */
  private def stripString(e: Expression): Expression = e match {
    case _ if !e.resolved || e.dataType != StringType => e
    case StringTrimRight(_, _) => e
    case Cast(StringTrimRight(_, _), StringType, _, _) => e
    case _ => StringTrimRight(e)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveExpressionsUp {
      case c @ Cast(child, StringType, _, _)
          if child.resolved && child.dataType.isInstanceOf[CharType] &&
            !child.isInstanceOf[StringTrimRight] =>
        c.copy(child = StringTrimRight(child))
      // only CONSTANT string sides: Hive folds a literal to the CHAR
      // type (stripped compare — `c = "apple "` matches), while a
      // string COLUMN keeps string semantics (char strips, the string
      // value's trailing blanks are significant — char_join1 golden)
      case cmp: BinaryComparison
          if cmp.resolved && cmp.children.exists(charSide) &&
            cmp.children.exists(c => !charSide(c) && c.foldable &&
              c.dataType == StringType &&
              !c.isInstanceOf[StringTrimRight]) =>
        cmp.withNewChildren(cmp.children.map(c =>
          if (charSide(c) || !c.foldable) c else stripString(c)))
      case in @ In(value, list)
          if in.resolved && charSide(value) &&
            list.exists(c => c.foldable && c.dataType == StringType &&
              !c.isInstanceOf[StringTrimRight]) =>
        in.copy(list = list.map(c =>
          if (c.foldable) stripString(c) else c))
    }
}
