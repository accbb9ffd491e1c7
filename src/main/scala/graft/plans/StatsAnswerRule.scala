package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Answer `SELECT count(*) / min(c) / max(c) FROM t` purely from catalog
  * statistics — the reference's StatsOptimizer
  * (ql/optimizer/StatsOptimizer.java, registered at Optimizer.java:227),
  * which Catalyst has no equivalent for (SURVEY.md §4.1).
  *
  * Opt-in via `spark.graft.statsAnswer.enabled` (default off), matching
  * Hive's `hive.compute.query.using.stats` guard: stats can be stale
  * after writes that bypass ANALYZE, so the user opts in knowingly.
  * Fires only on a bare unfiltered scan of an ANALYZEd catalog table —
  * any Filter/Project/join in between disqualifies the plan.
  *
  * Injected through SparkSessionExtensions (GraftExtensions), running in
  * the user-provided optimizer batch where subquery aliases are already
  * eliminated.
  */
case class StatsAnswerRule() extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.statsAnswer.enabled", "false")
        .toBoolean) {
      return plan
    }
    plan.transform {
      case agg @ Aggregate(Nil, aggExprs, child, _) =>
        // accept a column-pruning Project (pure attribute list) between
        // the aggregate and the relation — it changes nothing the stats
        // can't answer
        val relOpt = child match {
          case rel: LogicalRelation => Some(rel)
          case Project(pl, rel: LogicalRelation)
              if pl.forall(_.isInstanceOf[AttributeReference]) => Some(rel)
          case _ => None
        }
        relOpt.filter(_.catalogTable.flatMap(_.stats).isDefined) match {
          case Some(rel) =>
            answers(aggExprs, rel.catalogTable.get, rel.output) match {
              case Some(values) =>
                LocalRelation(agg.output.map(_.toAttribute),
                  Seq(InternalRow.fromSeq(values)))
              case None => agg
            }
          case None => agg
        }
    }
  }

  /** All aggregate expressions answerable from stats, or None. */
  private def answers(aggExprs: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression],
                      table: CatalogTable,
                      output: Seq[Attribute]): Option[Seq[Any]] = {
    val stats = table.stats.get
    val vals = aggExprs.map {
      case Alias(AggregateExpression(Count(Seq(Literal(1, _))), Complete,
          false, None, _), _) =>
        stats.rowCount.map(_.toLong)
      case Alias(AggregateExpression(Min(a: AttributeReference), Complete,
          false, None, _), _) =>
        colStat(stats, a).flatMap(_.min)
      case Alias(AggregateExpression(Max(a: AttributeReference), Complete,
          false, None, _), _) =>
        colStat(stats, a).flatMap(_.max)
      case _ => None
    }
    if (vals.forall(_.isDefined)) Some(vals.map(_.get)) else None
  }

  private def colStat(stats: org.apache.spark.sql.catalyst.catalog.CatalogStatistics,
                      a: AttributeReference) =
    stats.colStats.get(a.name).map(_.toPlanStat(a.name, a.dataType))
}
