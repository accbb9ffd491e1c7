package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Expression,
  InSubquery, ListQuery}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, NumericType, StringType}

/** Hive coerces string-vs-numeric COMPARISONS to double on both sides
  * (ref ql/exec/FunctionRegistry.java getCommonClassForComparison —
  * the lineage3 recording plans `UDFToDouble(src1.key) =
  * (UDFToDouble(key) + 18.0)`), and `IN (subquery)` is a comparison.
  * Spark's InConversion instead WIDENS string∪numeric to string, so
  * `'146' IN (select key+18 ...)` compares "146" against "146.0" and
  * misses rows Hive returns.
  *
  * This post-hoc rule undoes the string widening on single-column
  * IN-subqueries where exactly one side was numeric before coercion:
  * both sides re-coerce to double, Hive's comparison class. Only
  * ANALYZER-inserted casts (no USER_SPECIFIED_CAST tag) are undone —
  * a user's explicit `cast(x as string) IN (select s ...)` stays a
  * string compare, as it does in Hive. Pure expression rewrite: the
  * double casts stay codegen'd and the subquery still plans as a
  * semi/anti join. */
object HiveInSubqueryCoercion extends Rule[LogicalPlan] {

  private def coercionCastToString(e: Expression): Option[Expression] =
    e match {
      case c @ Cast(child, StringType, _, _)
          if child.resolved &&
            child.dataType.isInstanceOf[NumericType] &&
            c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
        Some(child)
      case _ => None
    }

  /** The list side re-projected to double: either the coercion cast
    * in its top Project flips to double, or (bare string output) a
    * new double-cast Project wraps the plan. */
  private def listToDouble(l: ListQuery): Option[ListQuery] =
    l.plan match {
      case Project(Seq(a @ Alias(c, name)), child)
          if coercionCastToString(c).isDefined =>
        val inner = coercionCastToString(c).get
        val re = Alias(Cast(inner, DoubleType), name)(exprId = a.exprId,
          qualifier = a.qualifier)
        Some(l.withNewPlan(Project(Seq(re), child)))
      case p if p.output.size == 1 &&
          p.output.head.dataType == StringType =>
        val out = p.output.head
        Some(l.withNewPlan(Project(
          Seq(Alias(Cast(out, DoubleType), out.name)()), p)))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // shape A: string value, numeric subquery — InConversion cast
      // the SUBQUERY output to string; flip both sides to double
      case InSubquery(Seq(v), l: ListQuery)
          if v.resolved && v.dataType == StringType &&
            coercionCastToString(v).isEmpty &&
            l.plan.resolved && (l.plan match {
              case Project(Seq(Alias(c, _)), _) =>
                coercionCastToString(c).isDefined
              case _ => false
            }) =>
        InSubquery(Seq(Cast(v, DoubleType)), listToDouble(l).get)
      // shape B: numeric value — InConversion cast the VALUE to
      // string against a string-typed subquery; flip both to double
      case InSubquery(Seq(v), l: ListQuery)
          if coercionCastToString(v).isDefined && l.plan.resolved &&
            l.plan.output.size == 1 &&
            l.plan.output.head.dataType == StringType =>
        InSubquery(Seq(Cast(coercionCastToString(v).get, DoubleType)),
          listToDouble(l).get)
    }
}
