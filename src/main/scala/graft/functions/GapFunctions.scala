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
    spark.udf.register("mask_first_n", (s: String, n: Int) => maskFirstN(s, n))
    spark.udf.register("mask_last_n", (s: String, n: Int) => maskLastN(s, n))
    spark.udf.register("mask_show_first_n",
      (s: String, n: Int) => maskShowFirstN(s, n))
    spark.udf.register("mask_show_last_n",
      (s: String, n: Int) => maskShowLastN(s, n))
    spark.udf.register("in_file", (s: String, path: String) => inFile(s, path))
  }
}
