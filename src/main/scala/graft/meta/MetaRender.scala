package graft.meta

import org.apache.spark.sql.types._

/** Hive metadata-output rendering: the exact text layout of DESCRIBE
  * and SHOW statements (ref ql/metadata/formatting/
  * MetaDataFormatUtils.java — %-20s padded col_name/data_type/comment
  * fields; ql/exec/DDLTask.java DESCRIBE/SHOW handling) and Hive's
  * path-name escaping for partition names
  * (common FileUtils.java:225-295 escapePathName).
  *
  * Pure functions — the session-stateful side lives in
  * [[HiveMetaStore]].
  */
object MetaRender {

  /** %-20s — pad to 20, never truncate (MetaDataFormatUtils.ALIGNMENT). */
  def pad(s: String): String =
    if (s.length >= 20) s else s + (" " * (20 - s.length))

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

  val colHeader: String =
    s"# ${pad("col_name")}\t${pad("data_type")}\t${pad("comment")}"

  /** Spark type → Hive type text (TypeInfo.getTypeName forms; struct
    * field names keep their as-written case like FieldSchema stores
    * the declared type text). */
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
      "struct<" + s.fields.map(f =>
        s"${f.name}:${hiveTypeName(f.dataType)}").mkString(",") + ">"
    case NullType => "void"
    case DayTimeIntervalType(_, _) => "interval_day_time"
    case YearMonthIntervalType(_, _) => "interval_year_month"
    case other => other.simpleString
  }

  /** FileUtils.escapePathName: partition VALUES render with control
    * bytes and reserved chars %XX-escaped in partition NAMES
    * (SHOW PARTITIONS, path rendering). */
  def escapePathName(v: String): String = {
    val sb = new StringBuilder
    v.foreach { c =>
      if (c < ' ' || c == '\u007f' ||
          "\"#%'*/:=?\\{[]^".indexOf(c.toInt) >= 0)
        sb.append(f"%%${c.toInt}%02X")
      else sb.append(c)
    }
    sb.toString
  }

  /** FileUtils.unescapePathName: the inverse of [[escapePathName]] —
    * `%XX` sequences in a partition DIRECTORY name decode back to the
    * raw partition value (used when SHOW PARTITIONS answers from the
    * filesystem namespace instead of a data scan). */
  def unescapePathName(v: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '%' && i + 2 < v.length &&
          v.substring(i + 1, i + 3).forall(h =>
            h.isDigit || ('A' <= h && h <= 'F') ||
              ('a' <= h && h <= 'f'))) {
        sb.append(Integer.parseInt(v.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** MetaDataFormatUtils list rendering: `[a, b, c]`. */
  def jlist(xs: Seq[String]): String = xs.mkString("[", ", ", "]")
}
