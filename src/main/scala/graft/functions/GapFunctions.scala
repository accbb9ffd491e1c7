package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, EqualTo, Expression, Literal}
import org.apache.spark.sql.functions._

/** The scalar-function tail the reference registers
  * (`ql/exec/FunctionRegistry.java:193-533`) and Spark 4 lacks.
  *
  * Strategy (SURVEY.md §7.2 item 3): plain registrations first; the hot
  * string/hash path (`fingerprint64`) is a native Catalyst expression with
  * codegen (see [[Fingerprint64]]) so it stays inside whole-stage codegen
  * at 100 TB scan scale.
  */
/** Hive `length` (ql/udf/UDFLength.java): CHAR values measure their
  * pad-stripped form; everything else is Spark's Length. Resolves the
  * char-vs-string distinction AFTER analysis via RuntimeReplaceable,
  * so it stays codegen'd. */
case class HiveLength(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  import org.apache.spark.sql.catalyst.expressions.{Length, StringTrimRight}
  override lazy val replacement: Expression = child.dataType match {
    case _: org.apache.spark.sql.types.CharType =>
      Length(StringTrimRight(child))
    case _ => Length(child)
  }
  override protected def withNewChildInternal(c: Expression): HiveLength =
    copy(child = c)
}

/** Hive's data-masking family, full-fidelity
  * (ql/udf/generic/GenericUDFMask.java MaskTransformer + the
  * First/Last/ShowFirst/ShowLast N variants, BaseMaskUDF arg rules):
  * config args are constants — int literals pass through, string
  * literals contribute charAt(0) for char-configs and parseInt for
  * int-configs; -1 leaves the class unmasked. Strings mask per
  * character class; integral types rebuild digit-by-digit in their own
  * width (overflow wraps exactly like the reference's byte/short
  * arithmetic); dates mask year(1900-based)/month(0-based)/day.
  *
  * kind: 0=all, 1=first_n, 2=last_n, 3=show_first_n, 4=show_last_n.
  * Evaluated via CodegenFallback — masking is never a hot scan path. */
case class HiveMask(kind: Int, children: Seq[Expression])
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._

  override def nullable: Boolean = true
  override def dataType: DataType = children.head.dataType match {
    case _: CharType | _: VarcharType => StringType
    case dt => dt
  }
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  private lazy val cfgStart = if (kind == 0) 1 else 2
  private def evalArg(i: Int): Option[Any] =
    children.lift(i).map(_.eval(
      org.apache.spark.sql.catalyst.InternalRow.empty))
  private def charArg(off: Int, d: Int): Int = evalArg(cfgStart + off)
    .map {
      case null => d
      case s: org.apache.spark.unsafe.types.UTF8String =>
        val t = s.toString; if (t.isEmpty) d else t.charAt(0).toInt
      case n: java.lang.Number => n.intValue
      case _ => d
    }.getOrElse(d)
  private def intArg(off: Int, d: Int): Int = evalArg(cfgStart + off)
    .map {
      case null => d
      case s: org.apache.spark.unsafe.types.UTF8String =>
        val t = s.toString
        if (t.isEmpty) d
        else try t.toInt catch { case _: NumberFormatException => d }
      case n: java.lang.Number => n.intValue
      case _ => d
    }.getOrElse(d)
  private lazy val upperC = charArg(0, 'X')
  private lazy val lowerC = charArg(1, 'x')
  private lazy val digitC = charArg(2, 'n')
  private lazy val otherC = charArg(3, -1)
  private lazy val numberV = {
    val v = intArg(4, 1); if (v < 0 || v > 9) 1 else v }
  private lazy val dayV = {
    val v = intArg(5, 1)
    if (v != -1 && (v < 1 || v > 31)) 1 else v }
  private lazy val monthV = {
    val v = intArg(6, 0)
    if (v != -1 && (v < 0 || v > 11)) 0 else v }
  private lazy val yearV = intArg(7, 0)
  private lazy val charCount = {
    val v = children.lift(1).map(_.eval(
      org.apache.spark.sql.catalyst.InternalRow.empty)) match {
      case Some(n: java.lang.Number) => n.intValue
      case Some(s: org.apache.spark.unsafe.types.UTF8String) =>
        try s.toString.toInt catch { case _: NumberFormatException => 4 }
      case _ => 4
    }
    if (v < 0) 0 else v
  }

  private def maskChar(c: Char): Int = {
    import java.lang.Character._
    getType(c) match {
      case UPPERCASE_LETTER if upperC != -1 => upperC
      case LOWERCASE_LETTER if lowerC != -1 => lowerC
      case DECIMAL_DIGIT_NUMBER if digitC != -1 => digitC
      case t if t != UPPERCASE_LETTER && t != LOWERCASE_LETTER &&
        t != DECIMAL_DIGIT_NUMBER && otherC != -1 => otherC
      case _ => c.toInt
    }
  }

  private def maskString(s: String): String = {
    val len = s.length
    // [maskFrom, maskTo) is the masked index range per kind
    val (from, to) = kind match {
      case 0 => (0, len)
      case 1 => (0, math.min(charCount, len))
      case 2 => (math.max(0, len - charCount), len)
      case 3 => (math.min(charCount, len), len)
      case 4 => (0, math.max(0, len - charCount))
    }
    val b = new java.lang.StringBuilder(len)
    var i = 0
    while (i < len) {
      if (i >= from && i < to) b.appendCodePoint(maskChar(s.charAt(i)))
      else b.append(s.charAt(i))
      i += 1
    }
    b.toString
  }

  /** Digit rebuild in LONG, truncated to the input width by the
    * caller — the reference's per-width arithmetic wraps the same way
    * two's-complement truncation does. */
  private def maskLong(value: Long): Long = {
    var v = math.abs(value)
    var digitCount = 0
    var t = v
    while (t != 0) { digitCount += 1; t /= 10 }
    // digits masked per kind, counted from the LEAST significant end
    // (i >= retainCount masks — reference MaskFirstNTransformer)
    def maskedAt(i: Int): Boolean = kind match {
      case 0 => true
      case 1 => i >= (if (digitCount < charCount) 0
                      else digitCount - charCount)
      case 2 => i < math.min(charCount, digitCount)
      case 3 =>
        val maskCount = digitCount - charCount
        maskCount > 0 && i < maskCount
      case 4 =>
        val retain = math.min(charCount, digitCount)
        i >= retain
    }
    // show_first_n masks from the end: digits AFTER the first N; in
    // reference ShowFirstN, maskCount = digitCount - charCount low
    // digits are masked (i < maskCount)
    var ret = 0L
    var pos = 1L
    var i = 0
    while (v != 0) {
      ret += (if (maskedAt(i)) numberV * pos else (v % 10) * pos)
      v /= 10
      pos *= 10
      i += 1
    }
    if (value < 0) -ret else ret
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : Any = {
    val v = children.head.eval(input)
    if (v == null) return null
    children.head.dataType match {
      // CHAR masks its blank-PADDED value and Hive renders the result
      // as char(255) — the masking UDFs' output char length is the
      // type's maximum, not the input's (qtest udf_mask goldens)
      case CharType(n) =>
        val raw = v.toString
        val padded =
          if (raw.length < n) raw + (" " * (n - raw.length)) else raw
        val masked = maskString(padded)
        org.apache.spark.unsafe.types.UTF8String.fromString(
          if (masked.length < 255)
            masked + (" " * (255 - masked.length))
          else masked)
      case StringType | _: VarcharType =>
        org.apache.spark.unsafe.types.UTF8String.fromString(
          maskString(v.toString))
      case ByteType => maskLong(v.asInstanceOf[Byte].toLong).toByte
      case ShortType => maskLong(v.asInstanceOf[Short].toLong).toShort
      case IntegerType => maskLong(v.asInstanceOf[Int].toLong).toInt
      case LongType => maskLong(v.asInstanceOf[Long])
      case DateType =>
        val d = java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[Int].toLong)
        val y = if (yearV == -1) d.getYear - 1900 else yearV
        val m = if (monthV == -1) d.getMonthValue - 1 else monthV
        val day = if (dayV == -1) d.getDayOfMonth else dayV
        val c = new java.util.GregorianCalendar(1900 + y, m, day)
        java.time.LocalDate.of(c.get(java.util.Calendar.YEAR),
          c.get(java.util.Calendar.MONTH) + 1,
          c.get(java.util.Calendar.DAY_OF_MONTH)).toEpochDay.toInt
      case _ => null
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Hive `substr` (ql/udf/UDFSubstr.java makeIndex): a negative start
  * position beyond the value's length yields the EMPTY string —
  * Spark's Substring clamps to the start and returns the whole value.
  * Everything else (0 treated as 1, length clamp, negative length →
  * empty) already agrees, so the guard is one codegen'd If around
  * Spark's own Substring. */
case class HiveSubstr(str: Expression, pos: Expression, len: Expression)
  extends org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types._
  override def children: Seq[Expression] = Seq(str, pos, len)
  override lazy val replacement: Expression = str.dataType match {
    // untyped NULL anywhere: the whole call is NULL — Substring/If
    // over VOID breaks the replacement's type requirements
    case _ if str.dataType == NullType || pos.dataType == NullType ||
        len.dataType == NullType =>
      Literal.create(null,
        if (str.dataType == BinaryType) BinaryType else StringType)
    case dt =>
      // char/varchar operate on the (pad-stripped) STRING value, like
      // the reference's string converter hands UDFSubstr
      val strE: Expression = dt match {
        case BinaryType => str
        case StringType => str
        case _ => Cast(str, StringType)
      }
      val empty: Expression = dt match {
        case BinaryType => Literal(Array.emptyByteArray)
        case _ => Literal("")
      }
      If(And(LessThan(pos, Literal(0)),
          GreaterThan(UnaryMinus(pos), Length(strE))),
        empty, Substring(strE, pos, len))
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HiveSubstr =
    copy(str = c(0), pos = c(1), len = c(2))
}

/** Hive `mask_hash` (ql/udf/generic/GenericUDFMaskHash.java): md5 hex
  * of string-family values — char hashes its padded form and renders
  * char(255) — and NULL for every other input type. */
case class HiveMaskHash(child: Expression)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  import org.apache.spark.sql.types._
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : Any = {
    val v = child.eval(input)
    if (v == null) return null
    child.dataType match {
      case CharType(n) =>
        val raw = v.toString
        val padded =
          if (raw.length < n) raw + (" " * (n - raw.length)) else raw
        val h = org.apache.commons.codec.digest.DigestUtils.md5Hex(padded)
        org.apache.spark.unsafe.types.UTF8String.fromString(
          h + (" " * (255 - h.length)))
      case StringType | _: VarcharType =>
        org.apache.spark.unsafe.types.UTF8String.fromString(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(v.toString))
      case _ => null
    }
  }
  override protected def withNewChildInternal(c: Expression): HiveMaskHash =
    copy(child = c)
}

object GapFunctions {

  /** Hive `field(needle, v1, v2, ...)` -> 1-based index of the first match,
    * 0 if none (ref: ql/udf/generic/GenericUDFField.java). Built as a pure
    * Catalyst CaseWhen chain so it codegens like a hand-written CASE.
    */
  private def fieldBuilder(exprs: Seq[Expression]): Expression = {
    val needle = exprs.head
    val branches = exprs.tail.zipWithIndex.map { case (e, i) =>
      (EqualTo(needle, e), Literal(i + 1))
    }
    CaseWhen(branches, Some(Literal(0)))
  }

  // --- Hive data-masking family (ref: ql/exec/FunctionRegistry.java:525-531,
  // ql/udf/generic/GenericUDFMaskFirstN.java etc). Upper -> X, lower -> x,
  // digit -> n; other chars pass through. Spark 3.4+ has `mask` but not the
  // positional *_n variants.
  private def maskChar(c: Char): Char =
    if (c.isUpper) 'X' else if (c.isLower) 'x' else if (c.isDigit) 'n' else c

  def maskAll(s: String): String = if (s == null) null else s.map(maskChar)
  def maskFirstN(s: String, n: Int): String =
    if (s == null) null
    else {
      val k = math.max(0, math.min(n, s.length))
      s.substring(0, k).map(maskChar) + s.substring(k)
    }
  def maskLastN(s: String, n: Int): String =
    if (s == null) null
    else {
      val k = math.max(0, math.min(n, s.length))
      s.substring(0, s.length - k) + s.substring(s.length - k).map(maskChar)
    }
  def maskShowFirstN(s: String, n: Int): String =
    if (s == null) null
    else {
      val k = math.max(0, math.min(n, s.length))
      s.substring(0, k) + s.substring(k).map(maskChar)
    }
  def maskShowLastN(s: String, n: Int): String =
    if (s == null) null
    else {
      val k = math.max(0, math.min(n, s.length))
      s.substring(0, s.length - k).map(maskChar) + s.substring(s.length - k)
    }

  /** Hive `sort_array_by(arr_of_struct, 'fieldName')`
    * (ref: ql/udf/generic/GenericUDFSortArrayByField.java) as a Column
    * helper: delegates to Catalyst's higher-order `array_sort` with a field
    * comparator — fully codegen'd, no UDF.
    */
  def sortArrayBy(arr: Column, field: String, asc: Boolean = true): Column = {
    val sign = if (asc) 1 else -1
    array_sort(arr, (l, r) =>
      when(l.getField(field) < r.getField(field), -1 * sign)
        .when(l.getField(field) > r.getField(field), 1 * sign)
        .otherwise(0))
  }

  /** Hive `parse_url_tuple(url, 'HOST', 'PATH', ...)` UDTF
    * (ref: ql/udf/generic/GenericUDTFParseUrlTuple.java) re-expressed as a
    * struct of scalar `parse_url` calls (each codegen'd).
    */
  def parseUrlTuple(url: Column, parts: String*): Column =
    struct(parts.map(p => parse_url(url, lit(p)).as(p.toLowerCase)): _*)

  /** Hive `replicate_rows(n, ...)` UDTF
    * (ref: ql/exec/FunctionRegistry.java:494; used to expand
    * INTERSECT/EXCEPT ALL): emit each row n times. Distributed — the
    * expansion happens per-partition via explode, no driver loop.
    */
  def replicateRows(df: DataFrame, nCol: Column): DataFrame = {
    val cols = df.columns
    df.withColumn("__rep", explode(sequence(lit(1L), nCol.cast("long"))))
      .select(cols.head, cols.tail: _*)
  }

  /** Hive `uniontype<T0,T1,...>` (SURVEY.md §1.2) has no Spark type;
    * the engine's encoding is a tagged struct `struct<tag:int,
    * field0:T0, ...>`, mirroring how Hive itself only touches unions via
    * the create_union/extract_union UDFs
    * (ql/exec/FunctionRegistry.java:459-460, GenericUDFUnion). */
  def createUnion(tag: Column, values: Column*): Column =
    struct(tag.as("tag") +:
      values.zipWithIndex.map { case (v, i) => v.as(s"field$i") }: _*)

  /** extract_union(u) -> the full tagged struct (Hive returns the same
    * struct-of-all-alternatives view). */
  def extractUnion(u: Column): Column = u

  /** extract_union(u, tag) -> the value slot for that tag (NULL if the
    * union currently holds a different alternative is the caller's
    * responsibility, same as Hive). */
  def extractUnion(u: Column, tag: Int): Column = u.getField(s"field$tag")

  def fingerprint64(c: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      Fingerprint64(org.apache.spark.sql.GraftSqlShim.expression(c)))

  /** Hive `in_file(str, filename)` (ref: ql/udf/generic/GenericUDFInFile
    * .java): true iff `str` equals a full line of the file. Executors
    * cache file contents per JVM (Hive ships the file via distributed
    * cache; here any shared-FS path works). */
  private val inFileCache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  /** Hive ships in_file lookup files via distributed cache (small by
    * construction); cap what one executor JVM will pin in memory. */
  private val InFileMaxBytes = 64L << 20

  def inFile(s: String, path: String): java.lang.Boolean = {
    if (s == null || path == null) return null
    val lines = inFileCache.computeIfAbsent(path, { p =>
      val sz = new java.io.File(p).length()
      require(sz <= InFileMaxBytes,
        s"in_file: $p is $sz bytes (cap ${InFileMaxBytes}); " +
          "use a join against the file read as a table instead")
      scala.io.Source.fromFile(p).getLines().toSet
    })
    lines.contains(s)
  }

  /** Hive CAST(s AS VARCHAR(n)) TRUNCATES on overflow
    * (serde2/typeinfo/BaseCharUtils.java enforceMaxLength); Spark's
    * VARCHAR(n) cast raises EXCEED_LIMIT_LENGTH instead, so the
    * truncating dialect cast gets its own name. Pure Substring —
    * codegen'd. */
  private def hiveVarcharBuilder(exprs: Seq[Expression]): Expression =
    org.apache.spark.sql.catalyst.expressions.Substring(exprs(0),
      Literal(1), exprs(1))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("field", fieldBuilder, "built-in")
    // Hive length() on CHAR(n) counts the STRIPPED value
    // (UDFLength via HiveChar.getStrippedValue) — Spark's counts the
    // padding. Other types keep Spark's (= Hive's) semantics,
    // including trailing spaces in plain strings.
    reg.createOrReplaceTempFunction("length",
      exprs => HiveLength(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("character_length",
      exprs => HiveLength(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("char_length",
      exprs => HiveLength(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("hive_varchar", hiveVarcharBuilder,
      "built-in")
    // Hive virtual columns (ql/exec/TableScanOperator.java:110;
    // SURVEY.md §2.1) under their Hive names. BLOCK__OFFSET__INSIDE__FILE
    // maps to the split/block start offset (Spark tracks per-split, not
    // per-row, offsets — same granularity Hive reports for ORC/parquet).
    reg.createOrReplaceTempFunction("input__file__name",
      _ => org.apache.spark.sql.catalyst.expressions.InputFileName(),
      "built-in")
    reg.createOrReplaceTempFunction("block__offset__inside__file",
      _ => org.apache.spark.sql.catalyst.expressions.InputFileBlockStart(),
      "built-in")
    // ROW__ID (TableScanOperator.java:110; on ACID tables a struct of
    // writeid/bucketid/rowid). Copy-on-write tables have no write ids;
    // the stand-in mirrors the struct shape with the scan-unique
    // coordinates Spark has: task partition as the bucket, the
    // monotonic per-row counter as the row ordinal. Unique within a
    // scan — the same guarantee Hive gives outside ACID tables.
    reg.createOrReplaceTempFunction("row__id",
      _ => org.apache.spark.sql.catalyst.expressions.CreateNamedStruct(Seq(
        Literal("writeid"), Literal(0L),
        Literal("bucketid"),
        org.apache.spark.sql.catalyst.expressions.Cast(
          org.apache.spark.sql.catalyst.expressions.SparkPartitionID(),
          org.apache.spark.sql.types.LongType),
        Literal("rowid"),
        org.apache.spark.sql.catalyst.expressions.MonotonicallyIncreasingID())),
      "built-in")
    // Hive's FLOOR(ts TO unit) internals (FunctionRegistry.java:209-217,
    // GenericUDFFloorCeilBase) — each is date_trunc at that unit
    Seq("day", "hour", "minute", "month", "quarter", "second", "week",
      "year").foreach { unit =>
      reg.createOrReplaceTempFunction(s"floor_$unit",
        exprs => org.apache.spark.sql.catalyst.expressions.TruncTimestamp(
          Literal(unit.toUpperCase), exprs.head), "built-in")
    }
    // logged_in_user (FunctionRegistry.java:205) == session user
    reg.createOrReplaceTempFunction("logged_in_user",
      _ => org.apache.spark.sql.catalyst.expressions.CurrentUser(),
      "built-in")
    // Hive registers the bracket operator as function "index"
    // (FunctionRegistry.java:300): 0-based array element / map value —
    // exactly Spark's extract-value semantics
    reg.createOrReplaceTempFunction("index",
      exprs => org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(
        exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("fingerprint64",
      exprs => Fingerprint64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("hive_hash",
      exprs => HiveHash(exprs), "built-in")
    spark.udf.register("mask_all", (s: String) => maskAll(s))
    reg.createOrReplaceTempFunction("mask",
      es => HiveMask(0, es), "built-in")
    reg.createOrReplaceTempFunction("mask_first_n",
      es => HiveMask(1, es), "built-in")
    reg.createOrReplaceTempFunction("mask_last_n",
      es => HiveMask(2, es), "built-in")
    reg.createOrReplaceTempFunction("mask_show_first_n",
      es => HiveMask(3, es), "built-in")
    reg.createOrReplaceTempFunction("mask_show_last_n",
      es => HiveMask(4, es), "built-in")
    // GenericUDFMaskHash.java: md5 hex for the string family (char
    // hashes its padded value, result rendered char(255)), NULL for
    // any other type
    reg.createOrReplaceTempFunction("mask_hash",
      es => HiveMaskHash(es.head), "built-in")
    Seq("substr", "substring").foreach(n =>
      reg.createOrReplaceTempFunction(n, es => HiveSubstr(es(0), es(1),
        es.lift(2).getOrElse(Literal(Int.MaxValue))), "built-in"))
    spark.udf.register("in_file", (s: String, path: String) => inFile(s, path))
  }
}
