package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  Generate, Join, LogicalPlan, Project, SubqueryAlias, Window}

/** Column-level lineage from the ANALYZED Catalyst plan — the engine's
  * equivalent of the reference's LineageLogger post-exec hook (ref
  * ql/src/java/org/apache/hadoop/hive/ql/hooks/LineageLogger.java):
  * one JSON document per statement with PROJECTION edges (each output
  * column ← the base-table columns it derives from) and PREDICATE
  * edges (filter/join conditions ← their referenced base columns,
  * targeting every output column).
  *
  * Provenance is pure plan metadata — zero data cost at any scale,
  * which is what makes it usable as the dataset-card/audit surface of
  * a 100 TB training-data pipeline: every derived corpus can carry
  * the exact source columns and conditions it was built from.
  *
  * Wire-format parity with the reference (verified bit-exact in
  * ColumnLineageSpec against a recorded lineage2.q.out line):
  *  - field order version/engine/database/hash/queryText/edges/
  *    vertices; edges emit sources/targets/[expression]/edgeType
  *    (LineageLogger.run + writeEdges/writeVertices)
  *  - `hash` = guava `Hashing.md5().putString(queryText)` = MD5 over
  *    the text's UTF-16LE code units (LineageLogger.getQueryHash)
  *  - vertex ids number targets first, then sources, in edge order
  *    (LineageLogger.getVertices)
  *  - edges with identical type+expression+sources merge their
  *    targets (LineageLogger.addEdge)
  * Expression strings render in Spark SQL (the reference renders its
  * own operator tree; engine-specific by nature, like `engine`). */
object ColumnLineage {

  case class Edge(sources: Seq[String], targets: Seq[String],
      expression: Option[String], edgeType: String)

  case class Lineage(database: String, hash: String, queryText: String,
      edges: Seq[Edge]) {
    /** Vertices in id order: targets first, then sources (the
      * reference's getVertices numbering). */
    lazy val vertices: Seq[String] = {
      val out = scala.collection.mutable.LinkedHashSet[String]()
      edges.foreach(e => out ++= e.targets)
      edges.foreach(e => out ++= e.sources)
      out.toSeq
    }
  }

  // ---------------------------------------------------------------
  // dependency walk
  // ---------------------------------------------------------------

  private case class Acc(deps: Map[Long, Seq[String]],
      computed: Map[Long, String],
      preds: Vector[(Seq[String], String)])

  /** Base columns an expression reads, in first-appearance order. */
  private def colsOf(e: Expression, deps: Map[Long, Seq[String]])
      : Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet[String]()
    e.foreach {
      case a: AttributeReference =>
        out ++= deps.getOrElse(a.exprId.id, Nil)
      case _ =>
    }
    out.toSeq
  }

  /** Is `alias` a catalog-visible table/view name (a base-table
    * boundary), as opposed to a subquery/CTE alias? The name check
    * alone is not enough: `FROM (SELECT ...) src` with a real table
    * named `src` must NOT attribute the derived columns to
    * default.src — the alias only binds a relation when its child is
    * a leaf relation (LogicalRelation/UnresolvedCatalogRelation) or
    * a resolved View, never an arbitrary subplan. */
  private def isTableBoundary(df: DataFrame, s: SubqueryAlias): Boolean =
    (s.child.children.isEmpty ||
      s.child.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.View] ||
      s.child.isInstanceOf[SubqueryAlias]) &&
      scala.util.Try(df.sparkSession.catalog.tableExists(s.alias))
        .getOrElse(false)

  private def walk(df: DataFrame, database: String,
      plan: LogicalPlan): Acc = plan match {
    case s: SubqueryAlias
        if isTableBoundary(df, s) &&
          // an alias OVER a catalog name keeps the inner table as
          // the base (`from src1 a` — sources stay default.src1.*)
          !(s.child.isInstanceOf[SubqueryAlias] && isTableBoundary(
            df, s.child.asInstanceOf[SubqueryAlias])) =>
      val qualifier = s.identifier.qualifier.lastOption
        .getOrElse(database)
      val tbl = s"$qualifier.${s.alias}"
      Acc(s.output.map(a =>
        a.exprId.id -> Seq(s"$tbl.${a.name}")).toMap,
        Map.empty, Vector.empty)
    case _ =>
      val kids = plan.children.map(walk(df, database, _))
      val merged = Acc(
        kids.flatMap(_.deps).toMap,
        kids.flatMap(_.computed).toMap,
        kids.toVector.flatMap(_.preds))
      def named(exprs: Seq[Expression]): Acc = {
        val add = exprs.collect {
          case al @ Alias(child, _) =>
            val dep = al.exprId.id -> colsOf(child, merged.deps)
            val comp: Option[(Long, String)] = child match {
              case _: AttributeReference => None // bare rename
              case c => Some(al.exprId.id -> render(c, merged.deps))
            }
            (dep, comp)
        }
        merged.copy(deps = merged.deps ++ add.map(_._1),
          computed = merged.computed ++ add.flatMap(_._2))
      }
      plan match {
        case p: Project => named(p.projectList)
        case a: Aggregate => named(a.aggregateExpressions)
        case w: Window => named(w.windowExpressions)
        case g: Generate =>
          val src = colsOf(g.generator, merged.deps)
          merged.copy(deps = merged.deps ++
            g.generatorOutput.map(_.exprId.id -> src))
        // conditions render HERE, against this node's own deps — a
        // union above may rebind an output exprId to multiple base
        // columns, which must not reach into an already-walked branch
        case f: Filter =>
          merged.copy(preds = merged.preds :+
            (colsOf(f.condition, merged.deps),
              render(f.condition, merged.deps)))
        case j: Join if j.condition.isDefined =>
          merged.copy(preds = merged.preds :+
            (colsOf(j.condition.get, merged.deps),
              render(j.condition.get, merged.deps)))
        case u if u.children.length > 1 &&
            u.children.forall(_.output.length == u.output.length) =>
          // union-like: each output column depends on every child's
          // column at that position
          merged.copy(deps = merged.deps ++
            u.output.zipWithIndex.map { case (o, i) =>
              o.exprId.id -> u.children.flatMap(c =>
                merged.deps.getOrElse(c.output(i).exprId.id, Nil))
                .distinct
            })
        case _ => merged
      }
  }

  /** Render `e` with base-column substitution: attributes print as
    * their (single) base column id when they have one. */
  private def render(e: Expression,
      deps: Map[Long, Seq[String]]): String = {
    val subbed = e.transform {
      case a: AttributeReference
          if deps.get(a.exprId.id).exists(_.length == 1) =>
        a.withName(deps(a.exprId.id).head).withQualifier(Nil)
    }
    var s = subbed.sql
    subbed.foreach {
      case a: AttributeReference => s = s.replace(s"`${a.name}`", a.name)
      case _ =>
    }
    s
  }

  // ---------------------------------------------------------------
  // public surface
  // ---------------------------------------------------------------

  /** Guava `Hashing.md5().putString(s)` — MD5 of the UTF-16LE code
    * units (LineageLogger.getQueryHash). */
  def queryHash(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
      .map("%02x".format(_)).mkString

  /** Extract the lineage graph of `df`. `destTable` names an INSERT/
    * CTAS destination: targets become `db.table.col` (the statement's
    * write side); absent, targets are the result schema's own names
    * (a plain SELECT). */
  def of(df: DataFrame, queryText: String,
      destTable: Option[String] = None,
      database: String = "default",
      destColumns: Option[Seq[String]] = None): Lineage = {
    val plan = df.queryExecution.analyzed
    val acc = walk(df, database, plan)
    val targetNames = destTable match {
      case Some(t) =>
        // INSERT targets name the DESTINATION table's columns, not
        // the select list's (LineageLogger reports write-side
        // FieldSchema names; lineage2's `insert into table dest1
        // select * from src2` targets dest1.key, not src2.key2)
        destColumns.getOrElse(df.schema.fieldNames.toSeq)
          .map(c => s"$t.$c")
      case None => df.schema.fieldNames.toSeq
    }
    // PROJECTION edges in output order, merged on (sources, expr)
    val edges = scala.collection.mutable.ArrayBuffer[Edge]()
    def addEdge(sources: Seq[String], target: Option[String],
        expr: Option[String], typ: String): Unit =
      edges.find(e => e.edgeType == typ && e.expression == expr &&
          e.sources.toSet == sources.toSet) match {
        case Some(e) =>
          edges(edges.indexOf(e)) =
            e.copy(targets = (e.targets ++ target).distinct)
        case None => edges += Edge(sources, target.toSeq, expr, typ)
      }
    plan.output.zip(targetNames).foreach { case (attr, tgt) =>
      val sources = acc.deps.getOrElse(attr.exprId.id, Nil)
      val expr = acc.computed.get(attr.exprId.id)
      addEdge(sources, Some(tgt), expr, "PROJECTION")
    }
    // PREDICATE edges target every output column
    acc.preds.foreach { case (sources, cond) =>
      val e = Some(cond)
      edges.find(x => x.edgeType == "PREDICATE" && x.expression == e &&
          x.sources.toSet == sources.toSet) match {
        case Some(_) => // identical condition recorded once
        case None =>
          edges += Edge(sources, targetNames, e, "PREDICATE")
      }
    }
    Lineage(database, queryHash(queryText.trim), queryText.trim,
      edges.toSeq)
  }

  /** The reference's wire format (LineageLogger.run field order). */
  def toJson(l: Lineage, engine: String = "spark"): String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    }
    val ids = l.vertices.zipWithIndex.toMap
    val sb = new StringBuilder
    sb.append("{\"version\":\"1.0\",\"engine\":\"").append(esc(engine))
      .append("\",\"database\":\"").append(esc(l.database))
      .append("\",\"hash\":\"").append(l.hash)
      .append("\",\"queryText\":\"").append(esc(l.queryText))
      .append("\",\"edges\":[")
    sb.append(l.edges.map { e =>
      val b = new StringBuilder("{\"sources\":[")
      b.append(e.sources.map(ids).mkString(","))
        .append("],\"targets\":[")
        .append(e.targets.map(ids).mkString(","))
        .append("]")
      e.expression.foreach(x =>
        b.append(",\"expression\":\"").append(esc(x)).append("\""))
      b.append(",\"edgeType\":\"").append(e.edgeType).append("\"}")
      b.result()
    }.mkString(","))
    sb.append("],\"vertices\":[")
    sb.append(l.vertices.zipWithIndex.map { case (v, i) =>
      s"""{"id":$i,"vertexType":"COLUMN","vertexId":"${esc(v)}"}"""
    }.mkString(","))
    sb.append("]}")
    sb.result()
  }
}
