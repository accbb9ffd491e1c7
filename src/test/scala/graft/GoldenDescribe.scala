package graft

import org.apache.spark.sql.types._

/** DESCRIBE replay support: Hive's DESCRIBE TABLE column-block
  * rendering (MetaDataFormatUtils.getAllColumnsInformation — %-20s
  * padded name/type/comment fields) and DESCRIBE FUNCTION docs
  * re-derived at test time from the reference's own `@Description`
  * annotations + FunctionRegistry registration order
  * (ql/exec/DDLTask.java:3040-3092 describeFunction;
  * ql/exec/Registry.java:428 getFunctionSynonyms iterates the
  * LinkedHashMap in registration order). Nothing is vendored: the
  * annotation text is parsed from /root/reference sources when the
  * suite runs, exactly like the golden files themselves.
  */
object GoldenDescribe {

  private val qlJava =
    "/root/reference/ql/src/java/org/apache/hadoop/hive/ql"

  // ---------------------------------------------------------------
  // column-block rendering
  // ---------------------------------------------------------------

  /** %-20s — pad to 20, never truncate (MetaDataFormatUtils.ALIGNMENT). */
  def pad(s: String): String = if (s.length >= 20) s else s + (" " * (20 - s.length))

  def colLine(name: String, typ: String, comment: String): String =
    s"${pad(name)}\t${pad(typ)}\t${pad(comment)}"

  /** A column row, with embedded-newline comments continuing on
    * blank-name/blank-type rows (describe_comment_indent.q). */
  def colLines(name: String, typ: String, comment: String): Seq[String] = {
    val segs = comment.split("\n", -1)
    colLine(name, typ, segs.head) +:
      segs.tail.toSeq.map(sg => colLine("", "", sg))
  }

  val sepLine = "\t \t "
  val partInfoHeader: Seq[String] = Seq(
    "# Partition Information\t \t ",
    s"# ${pad("col_name")}\t${pad("data_type")}\t${pad("comment")}",
    sepLine)

  /** Spark type → Hive type text (TypeInfo.getTypeName forms; struct
    * field names are lowercased like TypeInfoFactory parsing does). */
  def hiveTypeName(dt: DataType): String = dt match {
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "int"
    case LongType => "bigint"
    case FloatType => "float"
    case DoubleType => "double"
    case BooleanType => "boolean"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    case TimestampType | TimestampNTZType => "timestamp"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case c: CharType => s"char(${c.length})"
    case v: VarcharType => s"varchar(${v.length})"
    case ArrayType(e, _) => s"array<${hiveTypeName(e)}>"
    case MapType(k, v, _) => s"map<${hiveTypeName(k)},${hiveTypeName(v)}>"
    case s: StructType if s.fields.length >= 2 &&
        s.fields(0).name.equalsIgnoreCase("tag") &&
        s.fields(0).dataType == IntegerType &&
        s.fields.drop(1).zipWithIndex.forall { case (f, i) =>
          f.name.equalsIgnoreCase(s"field$i") } =>
      // the engine models Hive uniontype as struct<tag:int,field0..N>
      // (SURVEY §1.2); DESCRIBE renders the Hive type text
      "uniontype<" + s.fields.drop(1).map(f =>
        hiveTypeName(f.dataType)).mkString(",") + ">"
    case s: StructType =>
      // field names keep their AS-WRITTEN case (orc_create records
      // struct<A:string,B:string> verbatim; FieldSchema stores the
      // declared type text)
      "struct<" + s.fields.map(f =>
        s"${f.name}:${hiveTypeName(f.dataType)}").mkString(",") +
        ">"
    case NullType => "void"
    case DayTimeIntervalType(_, _) => "interval_day_time"
    case YearMonthIntervalType(_, _) => "interval_year_month"
    case other => other.simpleString
  }

  // ---------------------------------------------------------------
  // function docs
  // ---------------------------------------------------------------

  /** (nameLc, simpleClassName) in FunctionRegistry registration order. */
  lazy val registrations: Vector[(String, String)] = {
    val src = scala.io.Source.fromFile(
      s"$qlJava/exec/FunctionRegistry.java")
    try {
      ("register\\w*\\(\\s*\"([^\"]+)\"\\s*,\\s*(?:new\\s+)?" +
        "([A-Za-z0-9_]+)").r
        .findAllMatchIn(src.mkString)
        .map(m => (m.group(1).toLowerCase, m.group(2)))
        .toVector ++ constNamed
    } finally src.close()
  }

  /** Registrations whose NAME is a constant reference the literal
    * parse can't see (FunctionRegistry.java:165-177,286-287,503-535):
    * unary ops, lead/lag, the PTF resolvers, the mask family
    * (GenericUDFMask.UDF_NAME etc.). */
  private val constNamed: Vector[(String, String)] = Vector(
    "positive" -> "GenericUDFOPPositive",
    "negative" -> "GenericUDFOPNegative",
    "lead" -> "GenericUDFLead",
    "lag" -> "GenericUDFLag",
    "noop" -> "NoopResolver",
    "noopwithmap" -> "NoopWithMapResolver",
    "noopstreaming" -> "NoopStreamingResolver",
    "noopwithmapstreaming" -> "NoopWithMapStreamingResolver",
    "windowingtablefunction" -> "WindowingTableFunctionResolver",
    "matchpath" -> "MatchPathResolver",
    "mask" -> "GenericUDFMask",
    "mask_first_n" -> "GenericUDFMaskFirstN",
    "mask_last_n" -> "GenericUDFMaskLastN",
    "mask_show_first_n" -> "GenericUDFMaskShowFirstN",
    "mask_show_last_n" -> "GenericUDFMaskShowLastN",
    "mask_hash" -> "GenericUDFMaskHash")

  private lazy val byName: Map[String, String] = {
    // first registration wins (LinkedHashMap putIfAbsent-like: later
    // re-registrations of a name are rare and replace, but describe
    // targets are stable names)
    val m = scala.collection.mutable.LinkedHashMap[String, String]()
    registrations.foreach { case (n, c) => if (!m.contains(n)) m(n) = c }
    m.toMap
  }

  /** simple class name → (fully-qualified name, @Description value,
    * @Description extended) parsed from the reference source tree. */
  lazy val classDocs: Map[String, (String, String, String)] = {
    val idx = scala.collection.mutable.Map[String, java.io.File]()
    def walk(d: java.io.File): Unit =
      Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
        if (f.isDirectory) walk(f)
        else if (f.getName.endsWith(".java"))
          idx.getOrElseUpdate(f.getName.stripSuffix(".java"), f)
      }
    walk(new java.io.File(qlJava))
    val wanted = registrations.map(_._2).toSet
    wanted.flatMap { cls =>
      idx.get(cls).flatMap { f =>
        val txt = {
          val s = scala.io.Source.fromFile(f, "UTF-8")
          try s.mkString finally s.close()
        }
        val pkg = "package\\s+([\\w.]+)\\s*;".r
          .findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
        parseDescription(txt).map { case (v, e) =>
          cls -> (s"$pkg.$cls", v, e)
        }.orElse(Some(cls -> (s"$pkg.$cls", null, null)))
      }
    }.toMap
  }

  /** Extract (value, extended) from the first @Description annotation. */
  private def parseDescription(txt: String)
      : Option[(String, String)] = {
    val at = txt.indexOf("@Description")
    if (at < 0) return None
    val open = txt.indexOf('(', at)
    if (open < 0) return None
    // balanced scan, string-aware
    var i = open; var depth = 0; var end = -1; var inStr = false
    while (i < txt.length && end < 0) {
      val c = txt.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) end = i
        case _ =>
      }
      i += 1
    }
    if (end < 0) return None
    val body = txt.substring(open + 1, end)
    def field(name: String): String = {
      val m = (name + "\\s*=").r.findFirstMatchIn(body)
        .getOrElse(return "")
      // take string literals until the next field assignment or end
      var j = m.end
      val sb = new StringBuilder
      var stop = false
      while (j < body.length && !stop) {
        val c = body.charAt(j)
        if (c == '"') {
          var k = j + 1
          while (k < body.length && body.charAt(k) != '"') {
            if (body.charAt(k) == '\\') {
              body.charAt(k + 1) match {
                case 'n' => sb.append('\n')
                case 't' => sb.append('\t')
                case '"' => sb.append('"')
                case '\'' => sb.append('\'')
                case '\\' => sb.append('\\')
                case o => sb.append('\\').append(o)
              }
              k += 2
            } else { sb.append(body.charAt(k)); k += 1 }
          }
          j = k + 1
        } else if (c == ',' &&
            "\\s*\\w+\\s*=".r.findPrefixMatchOf(
              body.substring(j + 1)).isDefined) {
          stop = true
        } else j += 1
      }
      sb.toString
    }
    Some((field("value"), field("extended")))
  }

  /** Replay DDLTask.describeFunction: None = don't assert (name not a
    * parsed builtin — temp functions, macros). */
  /** Type-cast function names registered through serdeConstants
    * constants (FunctionRegistry.java:388-404) — the registration
    * regex below only sees string literals. All lack @Description:
    * DESCRIBE prints the no-documentation line. */
  private val typeCastFns: Map[String, String] = {
    val udf = "org.apache.hadoop.hive.ql.udf."
    Map(
      "boolean" -> s"${udf}UDFToBoolean",
      "tinyint" -> s"${udf}UDFToByte",
      "smallint" -> s"${udf}UDFToShort",
      "int" -> s"${udf}UDFToInteger",
      "bigint" -> s"${udf}UDFToLong",
      "float" -> s"${udf}UDFToFloat",
      "double" -> s"${udf}UDFToDouble",
      "string" -> s"${udf}UDFToString",
      "date" -> s"${udf}generic.GenericUDFToDate",
      "timestamp" -> s"${udf}generic.GenericUDFTimestamp",
      "interval_year_month" -> s"${udf}generic.GenericUDFToIntervalYearMonth",
      "interval_day_time" -> s"${udf}generic.GenericUDFToIntervalDayTime",
      "binary" -> s"${udf}generic.GenericUDFToBinary",
      "decimal" -> s"${udf}generic.GenericUDFToDecimal",
      "varchar" -> s"${udf}generic.GenericUDFToVarchar",
      "char" -> s"${udf}generic.GenericUDFToChar")
  }

  def describeFunction(nameTyped: String, extended: Boolean)
      : Option[Seq[String]] = {
    // registry lookup is case-insensitive, but _FUNC_ substitution
    // uses the name AS TYPED (DESCRIBE FUNCTION E → "E() - returns E")
    val raw = nameTyped.trim
    // a BACKTICKED name reaches the registry with its backticks and
    // never resolves (udf_index: DESCRIBE FUNCTION `index`)
    if (raw.startsWith("`"))
      return Some(Vector(s"Function '$raw' does not exist."))
    val n = raw
      .stripPrefix("'").stripSuffix("'")
      .stripPrefix("\"").stripSuffix("\"")
    typeCastFns.get(n.toLowerCase).foreach { fq =>
      val out = Vector.newBuilder[String]
      out += s"There is no documentation for function '$n'"
      if (extended) {
        out += s"Function class:$fq"
        out += "Function type:BUILTIN"
      }
      return Some(out.result())
    }
    byName.get(n.toLowerCase) match {
      case None =>
        // registered names all come from the parsed registry (plus
        // the constant-named entries above): anything else is Hive's
        // does-not-exist line (udf_stddev_pop describes a typo name)
        Some(Vector(s"Function '$n' does not exist."))
      case Some(cls) => classDocs.get(cls).orElse(
          // registered but undocumented (the Noop PTF resolvers)
          Some((null, null, null))).map { case (fq, v, e) =>
        val out = Vector.newBuilder[String]
        if (v == null) {
          out += s"There is no documentation for function '$n'"
        } else {
          out ++= v.replace("_FUNC_", n).split("\n", -1)
          if (extended) {
            val syn = {
              val seen = scala.collection.mutable.LinkedHashSet[String]()
              registrations.foreach { case (rn, rc) =>
                // EXACT-name exclusion (DDLTask passes the typed
                // name): DESCRIBE FUNCTION E lists lowercase "e" as
                // a synonym of itself
                if (rc == cls && rn != n && !rn.contains("@_"))
                  seen += rn
              }
              seen.toVector
            }
            if (syn.nonEmpty) out += "Synonyms: " + syn.mkString(", ")
            if (e != null && e.nonEmpty)
              out ++= e.replace("_FUNC_", n).split("\n", -1)
          }
        }
        if (extended && fq != null) {
          out += s"Function class:$fq"
          out += "Function type:BUILTIN"
        }
        out.result()
      }
    }
  }
}
