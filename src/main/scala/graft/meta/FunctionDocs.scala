package graft.meta

import org.apache.spark.sql.SparkSession

/** One function's documentation as DESCRIBE FUNCTION renders it:
  * fully-qualified class name (null → no class line), @Description
  * value/extended text (value null → the no-documentation line),
  * synonyms in registration order, and the function type label. */
case class FnDoc(
    className: String,
    value: String,
    extended: String,
    synonyms: Seq[String] = Nil,
    ftype: String = "BUILTIN")

/** DESCRIBE FUNCTION [EXTENDED] rendering — the exact layout of
  * `ql/exec/DDLTask.java:3040-3092` (describeFunction), over any doc
  * source: the engine resolves through Spark's catalog
  * ([[sparkLookup]]); the golden-replay harness supplies docs parsed
  * from the reference's own `@Description` annotations. */
object FunctionDocs {

  /** Render the describe lines for `nameTyped` (the name AS TYPED:
    * `_FUNC_` substitution and synonym self-exclusion are
    * case-sensitive in the reference). `lookup` is by lowercase
    * name; None → Hive's does-not-exist line. */
  def render(nameTyped: String, extended: Boolean,
      lookup: String => Option[FnDoc]): Seq[String] = {
    val raw = nameTyped.trim
    // a BACKTICKED name reaches the registry with its backticks and
    // never resolves (udf_index: DESCRIBE FUNCTION `index`)
    if (raw.startsWith("`"))
      return Vector(s"Function '$raw' does not exist.")
    val n = raw
      .stripPrefix("'").stripSuffix("'")
      .stripPrefix("\"").stripSuffix("\"")
    lookup(n.toLowerCase) match {
      case None => Vector(s"Function '$n' does not exist.")
      case Some(d) =>
        val out = Vector.newBuilder[String]
        if (d.value == null) {
          out += s"There is no documentation for function '$n'"
        } else {
          out ++= d.value.replace("_FUNC_", n).split("\n", -1)
          if (extended) {
            // EXACT-name exclusion (DDLTask passes the typed name):
            // DESCRIBE FUNCTION E lists lowercase "e" as a synonym of
            // itself; internal window markers (@_) never list
            val syn = d.synonyms.filter(s => s != n && !s.contains("@_"))
            if (syn.nonEmpty) out += "Synonyms: " + syn.mkString(", ")
            if (d.extended != null && d.extended.nonEmpty)
              out ++= d.extended.replace("_FUNC_", n).split("\n", -1)
          }
        }
        if (extended && d.className != null) {
          out += s"Function class:${d.className}"
          out += s"Function type:${d.ftype}"
        }
        out.result()
    }
  }

  /** Engine doc source: Spark's own function catalog (ExpressionInfo
    * carries usage/extended/class for every builtin and registered
    * function — including this engine's [[graft.functions.Registry]]
    * registrations). Temp functions label TEMPORARY like Hive's
    * registry does for session-registered names. */
  def sparkLookup(spark: SparkSession): String => Option[FnDoc] = {
    nLc =>
      scala.util.Try {
        val ident =
          org.apache.spark.sql.catalyst.FunctionIdentifier(nLc)
        val catalog = spark.sessionState.catalog
        val info = catalog.lookupFunctionInfo(ident)
        val builtin = org.apache.spark.sql.catalyst.analysis
          .FunctionRegistry.functionSet
          .contains(ident)
        FnDoc(
          className = Option(info.getClassName).filter(_.nonEmpty).orNull,
          value = Option(info.getUsage).filter(_.nonEmpty)
            .map(_.trim).orNull,
          extended = Option(info.getExtended).filter(_.trim.nonEmpty)
            .map(_.trim).orNull,
          synonyms = Nil,
          ftype = if (builtin) "BUILTIN" else "TEMPORARY")
      }.toOption
  }
}
