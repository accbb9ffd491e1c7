package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Golden REPLAY harness: instead of hand-porting result blocks (see
  * GoldenSemanticsSpec), parse the reference's committed `.q.out`
  * goldens at test time (the same way FunctionCompletenessSpec parses
  * FunctionRegistry.java), execute every statement of the `.q` script
  * in order through this engine — CTAS becomes a temp view, SELECT
  * results are asserted literally against the golden rows — and compare
  * as sorted multisets (these files are SORT_QUERY_RESULTS). One
  * fixture load (kv1.txt → `src`) unlocks whole files at a time.
  */
class GoldenReplaySpec extends SparkSpec {
  // Isolated child session: qtest fixture views (`lineitem`, `part`,
  // `srcpart`, ...) share names with other suites' testdata views, and
  // suites run in parallel over one underlying session — newSession()
  // gives this suite its own temp-view catalog on the same context.
  override lazy val spark: org.apache.spark.sql.SparkSession =
    Engine.prepare(Engine.session(appName = "graft-test",
      master = "local[4]", shufflePartitions = 4).newSession())

  import spark.implicits._

  private val outDir =
    "/root/reference/ql/src/test/results/clientpositive"

  /** data/files/kv1.txt: ^A-delimited key,value — the `src` table every
    * clientpositive file assumes. */
  private def kvView(file: String, view: String): Unit = {
    val rows = {
      val s = scala.io.Source.fromFile(s"/root/reference/data/files/$file")
      try s.getLines().map { l =>
        // -1 limit keeps empty fields: kv3.txt has a bare "^A" line
        // meaning (empty key, empty value)
        val a = l.split("\u0001", -1)
        (if (a.length > 0) a(0) else "", if (a.length > 1) a(1) else null)
      }.toVector finally s.close()
    }
    rows.toDF("key", "value").createOrReplaceTempView(view)
  }

  private lazy val src: Unit = kvView("kv1.txt", "src")
  /** `src1` (QTestUtil loads kv3.txt into it). */
  private lazy val src1: Unit = kvView("kv3.txt", "src1")

  /** `srcpart`: kv1 loaded into 4 partitions ds×hr (q_test_init.sql). */
  private lazy val srcpart: Unit = {
    src
    val base = spark.table("src")
    val parts = for (ds <- Seq("2008-04-08", "2008-04-09");
                     hr <- Seq("11", "12")) yield
      base.withColumn("ds", org.apache.spark.sql.functions.lit(ds))
        .withColumn("hr", org.apache.spark.sql.functions.lit(hr))
    parts.reduce(_ union _).createOrReplaceTempView("srcpart")
  }

  /** The cbo fixture family (q_test_init.sql:269-312): comma-delimited
    * cbo_t1/t2 (partition dt='2014'), cbo_t3, and src_cbo = copy of src.
    * Keys keep their literal leading/trailing spaces; \N is NULL. */
  private lazy val cbo: Unit = {
    def load(file: String, view: String, dt: Option[String]): Unit = {
      val s = scala.io.Source.fromFile(s"/root/reference/data/files/$file")
      val lines = try s.getLines().toVector finally s.close()
      val rows = lines.map { l =>
        val a = l.split(",", -1)
        def f(i: Int): String = {
          val v = if (i < a.length) a(i) else null
          if (v == null || v == "\\N") null else v
        }
        Row.fromSeq(Seq[Any](f(0), f(1),
          Option(f(2)).flatMap(_.toIntOption).map(Int.box).orNull,
          Option(f(3)).flatMap(_.toFloatOption).map(Float.box).orNull,
          Option(f(4)).flatMap(_.toBooleanOption).map(Boolean.box).orNull)
          ++ dt.toSeq)
      }
      val base = StructType(Seq(
        StructField("key", StringType), StructField("value", StringType),
        StructField("c_int", IntegerType),
        StructField("c_float", FloatType),
        StructField("c_boolean", BooleanType)))
      val schema = dt.fold(base)(_ =>
        StructType(base.fields :+ StructField("dt", StringType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize[Row](rows, 2), schema)
        .createOrReplaceTempView(view)
    }
    load("cbo_t1.txt", "cbo_t1", Some("2014"))
    load("cbo_t2.txt", "cbo_t2", Some("2014"))
    load("cbo_t3.txt", "cbo_t3", None)
    src
    spark.table("src").createOrReplaceTempView("src_cbo")
  }

  private val decRe = "decimal\\((\\d+),(\\d+)\\)".r

  /** Hive DDL type name → Spark type (lazy-text replay subset). */
  private def hiveType(t: String): DataType = t.toLowerCase match {
    case "tinyint" => ByteType
    case "smallint" => ShortType
    case "int" => IntegerType
    case "bigint" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case "timestamp" => TimestampType
    case decRe(pr, sc) => DecimalType(pr.toInt, sc.toInt)
    case _ => StringType
  }

  /** Hive lazy-parse: \N or an unparseable primitive reads as NULL. */
  private def parseRaw(raw: String, dt: DataType): Any =
    if (raw == null || raw == "\\N") null else dt match {
      case ByteType => raw.toByteOption.map(Byte.box).orNull
      case ShortType => raw.toShortOption.map(Short.box).orNull
      case IntegerType => raw.toIntOption.map(Int.box).orNull
      case LongType => raw.toLongOption.map(Long.box).orNull
      case FloatType => raw.toFloatOption.map(Float.box).orNull
      case DoubleType => raw.toDoubleOption.map(Double.box).orNull
      case BooleanType => raw.toBooleanOption.map(Boolean.box).orNull
      case TimestampType =>
        try java.sql.Timestamp.valueOf(raw)
        catch { case _: IllegalArgumentException => null }
      case d: DecimalType =>
        try new java.math.BigDecimal(raw).setScale(d.scale)
        catch { case _: ArithmeticException | _: NumberFormatException =>
          null }
      case _ => raw
    }

  /** Column-spec string → schema; commas inside decimal(p,s) survive. */
  private def colSchema(colSpec: String): StructType =
    StructType(colSpec.split(",(?![^(]*\\))").map { c =>
      val p = c.trim.split("\\s+")
      StructField(p(0).replace("`", ""), hiveType(p(1)))
    })

  /** Typed delimited fixture (q_test_init.sql lazy-text semantics). */
  private def delimView(file: String, view: String, delim: Char,
      colSpec: String): Unit = {
    val schema = colSchema(colSpec)
    val s = scala.io.Source.fromFile(s"/root/reference/data/files/$file")
    val rows = try s.getLines().map { l =>
      val a = l.split(java.util.regex.Pattern.quote(delim.toString), -1)
      Row.fromSeq(schema.fields.zipWithIndex.map { case (f, i) =>
        parseRaw(if (i < a.length) a(i) else null, f.dataType)
      }.toSeq)
    }.toVector finally s.close()
    spark.createDataFrame(
      spark.sparkContext.parallelize[Row](rows, 2), schema)
      .createOrReplaceTempView(view)
  }

  /** `over10k` (data/files/over10k): the windowing/PTF fixture. */
  private lazy val over10k: Unit =
    delimView("over10k", "over10k", '|',
      "t tinyint, si smallint, i int, b bigint, f float, d double, " +
        "bo boolean, s string, ts timestamp, dec decimal(4,2), bin string")

  /** `alltypesorc` — the qtest ORC fixture, read natively. */
  private lazy val alltypesorc: Unit =
    spark.read.orc("/root/reference/data/files/alltypesorc")
      .createOrReplaceTempView("alltypesorc")

  /** TPC-H-shaped qtest fixtures (q_test_init.sql:277-311). */
  private lazy val tpchFixtures: Unit = {
    delimView("part_tiny.txt", "part", '',
      "p_partkey int, p_name string, p_mfgr string, p_brand string, " +
        "p_type string, p_size int, p_container string, " +
        "p_retailprice double, p_comment string")
    delimView("lineitem.txt", "lineitem", '|',
      "l_orderkey int, l_partkey int, l_suppkey int, l_linenumber int, " +
        "l_quantity double, l_extendedprice double, l_discount double, " +
        "l_tax double, l_returnflag string, l_linestatus string, " +
        "l_shipdate string, l_commitdate string, l_receiptdate string, " +
        "l_shipinstruct string, l_shipmode string, l_comment string")
  }

  private case class Block(query: String, rows: Seq[String])

  /** One block per POSTHOOK statement: the (possibly multi-line) query
    * text, then its emitted rows (tab-separated, NULL for null). */
  private def blocks(file: String): Seq[Block] = {
    val s = scala.io.Source.fromFile(s"$outDir/$file")
    val lines = try s.getLines().toVector finally s.close()
    val out = Vector.newBuilder[Block]
    var i = 0
    while (i < lines.length) {
      if (lines(i).startsWith("POSTHOOK: query: ")) {
        val q = new StringBuilder(
          lines(i).stripPrefix("POSTHOOK: query: "))
        i += 1
        while (i < lines.length &&
            !lines(i).startsWith("POSTHOOK: type:")) {
          q.append('\n').append(lines(i)); i += 1
        }
        while (i < lines.length && (lines(i).startsWith("POSTHOOK:") ||
            lines(i).startsWith("#### A masked pattern"))) i += 1
        val rows = Vector.newBuilder[String]
        while (i < lines.length &&
            !lines(i).startsWith("PREHOOK: query:") &&
            !lines(i).startsWith("Warning:")) {
          // "RUN: Stage-..." hook-echo lines are not result rows
          if (!lines(i).startsWith("RUN: ")) rows += lines(i)
          i += 1
        }
        out += Block(q.toString, rows.result())
      } else i += 1
    }
    out.result()
  }

  private val ctasRe =
    "(?is)create table (?:if\\s+not\\s+exists\\s+)?`?(\\w+)`?\\s+as\\s+(select.*)".r
  // a view over temp views replays as a temp view of the same query
  // (PARTITIONED ON is a physical hint — no-op for the logical replay)
  private val viewRe = ("(?is)create view `?(\\w+)`?\\s*" +
    "(?:partitioned\\s+on\\s*\\([^)]*\\)\\s*)?as\\s+(select.*)").r
  // column list, then any physical clauses (CLUSTERED BY / STORED AS /
  // ROW FORMAT) — physical layout is a no-op for temp-view replay
  private val createRe =
    "(?is)create table (?:if\\s+not\\s+exists\\s+)?`?(\\w+)`?\\s*\\(([^)]*)\\).*".r
  private val loadRe =
    "(?is)load data local inpath '[^']*/([^'/]+)'\\s+(overwrite\\s+)?into table (\\w+).*".r

  /** Per-view field delimiter recorded from `ROW FORMAT DELIMITED
    * FIELDS TERMINATED BY '<d>'` in the replayed CREATE (default ^A). */
  private val viewDelims = scala.collection.mutable.Map[String, String]()
  private val termRe =
    "(?is).*fields\\s+terminated\\s+by\\s+'([^']+)'.*".r

  /** LOAD DATA replay: parse the delimited fixture per the view's
    * schema (Hive text semantics: missing / unparseable → NULL) and
    * append (or replace, on OVERWRITE) into the temp view. */
  private def loadData(fileName: String, table: String,
      overwrite: Boolean): Unit = {
    val schema = spark.table(table).schema
    val delim = viewDelims.getOrElse(table.toLowerCase, "\u0001")
    val s = scala.io.Source.fromFile(
      s"/root/reference/data/files/$fileName")
    val rows = try s.getLines().map { l =>
      val a = l.split(java.util.regex.Pattern.quote(delim), -1)
      Row.fromSeq(schema.fields.zipWithIndex.map { case (f, i) =>
        parseRaw(if (i < a.length) a(i) else null, f.dataType)
      }.toSeq)
    }.toVector finally s.close()
    val fresh = spark.createDataFrame(
      spark.sparkContext.parallelize[Row](rows, 2), schema)
    val merged = if (overwrite) fresh else spark.table(table).union(fresh)
    // temp views resolve before re-registration, so snapshot first
    val snap = merged.collect().toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize[Row](snap, 2), schema)
      .createOrReplaceTempView(table)
  }

  // Hive allows omitting TABLE, a PARTITION spec (static and/or
  // dynamic), and inserting literal VALUES rows
  private val insertRe =
    ("(?is)insert\\s+(overwrite|into)\\s+(?:table\\s+)?`?(\\w+)`?\\s*" +
      "(?:partition\\s*\\(([^)]*)\\))?\\s*((?:select|values).*)").r
  // FROM-first insert: the from clause may be a whole join tree, and
  // several INSERT segments may share it (Hive multi-insert)
  private val fromHeadRe =
    "(?is)from\\s+(.+?)\\s+(insert\\s+(?:overwrite|into)\\s+table\\s+.*)".r
  private val insertSegRe =
    ("(?is)insert\\s+(overwrite|into)\\s+table\\s+" +
      "`?(\\w+)`?\\s*(?:partition\\s*\\(([^)]*)\\))?\\s*(select.*)").r
  // CREATE TABLE [IF NOT EXISTS] x LIKE y — empty view with y's schema
  private val likeRe =
    "(?is)create table (?:if\\s+not\\s+exists\\s+)?`?(\\w+)`?\\s+like\\s+`?(\\w+)`?.*".r

  /** PARTITION clause entries in order: name -> Some(static value) or
    * None (dynamic — its value is a trailing select column). */
  private def parsePartSpec(spec: String): Seq[(String, Option[String])] =
    if (spec == null || spec.trim.isEmpty) Nil
    else spec.split(",").toSeq.map { e =>
      e.split("=", 2) match {
        case Array(n, v) =>
          n.trim.toLowerCase -> Some(v.trim
            .stripPrefix("'").stripSuffix("'")
            .stripPrefix("\"").stripSuffix("\""))
        case Array(n) => n.trim.toLowerCase -> None
      }
    }

  /** INSERT replay: run the select, apply Hive's insert-cast to the
    * target's declared column types by position, then replace or append
    * the view. Static PARTITION values are spliced in at their schema
    * positions; dynamic partition values ride as trailing select
    * columns (Hive's own contract). An OVERWRITE with a fully-static
    * partition spec replaces only that partition. */
  private def insertInto(table: String, overwrite: Boolean,
      sel: org.apache.spark.sql.DataFrame,
      partSpec: String = null): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    val schema = spark.table(table).schema
    val static = parsePartSpec(partSpec).collect {
      case (n, Some(v)) => n -> v
    }.toMap
    val selCols = sel.toDF(sel.columns.indices.map(i => s"__c$i"): _*)
    var si = 0
    val aligned = selCols.select(schema.fields.map { f =>
      static.get(f.name.toLowerCase) match {
        case Some(v) => lit(v).cast(f.dataType).as(f.name)
        case None =>
          val c = col(s"__c$si").cast(f.dataType).as(f.name); si += 1; c
      }
    }.toIndexedSeq: _*)
    val cast = aligned
    val spec = parsePartSpec(partSpec)
    val merged =
      if (overwrite && spec.nonEmpty) {
        // partitioned OVERWRITE (static or dynamic) replaces only the
        // partitions present in the insert's own output — Hive's
        // dynamic-partition overwrite contract
        val pFields = spec.map { case (n, _) =>
          schema.fields.find(_.name.equalsIgnoreCase(n)).get.name }
        val aff = cast.select(pFields.map(col): _*).distinct()
        spark.table(table).join(aff, pFields, "left_anti")
          .select(schema.fieldNames.map(col).toIndexedSeq: _*) // using-join
          .union(cast)                            // may reorder columns
      } else if (overwrite) cast
      else spark.table(table).union(cast)
    val snap = merged.collect().toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize[Row](snap, 2), schema)
      .createOrReplaceTempView(table)
  }

  /** SORT_AND_HASH goldens append a base64 digest line per block. */
  private def isHashLine(l: String): Boolean =
    l.matches("[A-Za-z0-9+/]{22}==")

  private def emptyView(name: String, cols: String): Unit =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], colSchema(cols))
      .createOrReplaceTempView(name)

  /** Body of the first balanced paren group — the column list of a
    * CREATE TABLE, robust to nested parens like decimal(4,2). */
  private def parenBody(q: String): String = {
    val start = q.indexOf('(')
    require(start >= 0, s"no column list in: $q")
    var depth = 0; var i = start
    while (i < q.length) {
      q(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return q.substring(start + 1, i)
        case _ =>
      }
      i += 1
    }
    sys.error(s"unbalanced parens in: $q")
  }

  /** Decimal cells: older goldens print HiveDecimal-normalized values
    * (123.0BD as "123"); newer ones keep the declared scale
    * ("1173.150"). Per-file flag, default normalize. */
  private def fmt(r: Row, stripDecZeros: Boolean = true): String =
    (0 until r.length).map(i =>
      if (r.isNullAt(i)) "NULL" else r.get(i) match {
        case d: java.math.BigDecimal =>
          if (stripDecZeros) d.stripTrailingZeros.toPlainString
          else d.toPlainString
        case d: scala.math.BigDecimal =>
          if (stripDecZeros) d.bigDecimal.stripTrailingZeros.toPlainString
          else d.bigDecimal.toPlainString
        // HiveIntervalDayTime "%d %02d:%02d:%02d.%09d", YearMonth "%d-%d"
        case d: java.time.Duration =>
          val sign = if (d.isNegative) "-" else ""
          val a = d.abs
          f"$sign${a.toDays} ${a.toHoursPart}%02d:${a.toMinutesPart}%02d:" +
            f"${a.toSecondsPart}%02d.${a.toNanosPart}%09d"
        case p: java.time.Period =>
          s"${p.getYears}-${p.getMonths}"
        case v => v.toString
      }).mkString("\t")

  /** Execute the file's statements in golden order; returns how many
    * SELECT blocks were asserted. `skip` drops individual statements
    * with a documented engine divergence. */
  private def replay(file: String,
      skip: String => Boolean = _ => false,
      stripDecZeros: Boolean = true): Int = {
    var asserted = 0
    blocks(file).filterNot(b => skip(b.query)).foreach { b =>
      // leading -- comment lines (e.g. -- SORT_QUERY_RESULTS) ride along
      // with the first statement in the golden
      val q0 = b.query.linesIterator
        .dropWhile(l => l.trim.isEmpty || l.trim.startsWith("--"))
        .mkString("\n").trim
      // goldens call Hive's `hash` (ObjectInspectorUtils contract) —
      // that is our SQL-registered hive_hash; Spark's own `hash` is
      // Murmur3 and would never match the golden sums
      val q = q0.replaceAll("(?i)(?<![\\w_])hash\\(", "hive_hash(")
      val ql = q.toLowerCase
      def assertSelect(query: String): Unit = {
        val got = spark.sql(query).collect().toSeq
          .map(fmt(_, stripDecZeros)).sorted
        assert(got === b.rows.filterNot(isHashLine).sorted,
          s"golden mismatch in $file for: $query")
        asserted += 1
      }
      if (ql.startsWith("create table")) q match {
        case ctasRe(name, sel) =>
          spark.sql(sel).createOrReplaceTempView(name)
        case likeRe(name, other) =>
          spark.table(other).limit(0).createOrReplaceTempView(name)
        case createRe(name, _) =>
          // balanced-paren column list (decimal(4,2) nests parens);
          // PARTITIONED BY columns are part of the logical schema
          val cols = parenBody(q)
          val partByRe = "(?is).*partitioned\\s+by\\s*\\(([^)]*)\\).*".r
          val full = q match {
            case partByRe(p) => cols + "," + p
            case _ => cols
          }
          emptyView(name, full)
          q match { // remember the declared text delimiter for LOAD DATA
            case termRe(d) => viewDelims(name.toLowerCase) =
              d.replace("\\t", "\t").replace("\\001", "")
            case _ =>
          }
        case _ => fail(s"unhandled create in $file: $q")
      } else if (ql.startsWith("create view")) q match {
        case viewRe(name, sel) =>
          spark.sql(sel).createOrReplaceTempView(name)
        case _ => fail(s"unhandled view in $file: $q")
      } else if (ql.startsWith("load data")) q match {
        case loadRe(fileName, ow, table) =>
          loadData(fileName, table, ow != null)
        case _ => fail(s"unhandled load in $file: $q")
      } else if (ql.startsWith("insert")) q match {
        case insertRe(mode, table, part, sel) =>
          // `VALUES (...)` is itself a valid Spark query
          insertInto(table, mode.equalsIgnoreCase("overwrite"),
            spark.sql(sel), part)
        case _ => fail(s"unhandled insert in $file: $q")
      } else if (ql.startsWith("from")) q match {
        // Hive FROM-first inserts (possibly MULTI-insert: one scan, many
        // sinks); each segment replays as FROM <tree> SELECT ...
        case fromHeadRe(from, rest) =>
          rest.split("(?is)(?=insert\\s+(?:overwrite|into)\\s+table)")
            .map(_.trim).filter(_.nonEmpty).foreach {
              case insertSegRe(mode, table, part, sel) =>
                insertInto(table, mode.equalsIgnoreCase("overwrite"),
                  spark.sql(s"FROM $from $sel"), part)
              case seg => fail(s"unhandled insert segment in $file: $seg")
            }
        case _ =>
          // FROM-first bare SELECT — Spark parses it as a query
          assertSelect(q)
      } else if (ql.startsWith("select")) {
        assertSelect(q)
      } // set/explain/drop blocks replay as no-ops
    }
    asserted
  }

  test("having.q golden replay (HAVING on alias, on non-grouped agg, " +
      "with WHERE)") {
    src
    assert(replay("having.q.out") === 6)
  }

  test("semijoin.q golden replay (left semi across CTAS chain, " +
      "filters on build side, outer-join mixes)") {
    src
    assert(replay("semijoin.q.out") >= 20)
  }

  test("join_nulls.q golden replay (null-key matrix across all join " +
      "types, 49 goldens)") {
    assert(replay("join_nulls.q.out") === 49)
  }

  test("join_filters.q golden replay (ON-clause filter placement matrix " +
      "on outer joins, 112 goldens)") {
    assert(replay("join_filters.q.out") === 112)
  }

  test("ppd_join.q golden replay (predicate pushdown through join chains)") {
    src
    assert(replay("ppd_join.q.out") === 2)
  }

  test("subquery_exists.q golden replay (correlated EXISTS decorrelation)") {
    src
    assert(replay("subquery_exists.q.out") >= 4)
  }

  test("innerjoin.q golden replay (INSERT OVERWRITE then read back)") {
    src
    assert(replay("innerjoin.q.out") >= 3)
  }

  test("groupby2.q golden replay (FROM-first insert, multi-DISTINCT agg, " +
      "double-to-string concat)") {
    src
    assert(replay("groupby2.q.out") === 1)
  }

  test("groupby1.q golden replay (FROM-first group-by insert, " +
      "sum over substr cast)") {
    src
    assert(replay("groupby1.q.out") === 1)
  }

  test("union3.q golden replay (4-way UNION ALL with LIMIT subqueries " +
      "and CLUSTER BY)") {
    src
    assert(replay("union3.q.out") === 1)
  }

  test("join29.q golden replay (join of two grouped subqueries into " +
      "typed table)") {
    src; src1
    assert(replay("join29.q.out") === 1)
  }

  test("notable_alias1.q golden replay (FROM-first WHERE + GROUP BY " +
      "with constant projection)") {
    src
    assert(replay("notable_alias1.q.out") === 1)
  }

  test("batch golden replay: auto_join corpus + cbo + casts (hive_hash " +
      "checksums are bit-compatibility assertions)") {
    src; src1
    val files = Seq(
      "auto_join0.q.out", "auto_join1.q.out", "auto_join2.q.out",
      "auto_join3.q.out", "auto_join4.q.out", "auto_join5.q.out",
      "auto_join6.q.out", "auto_join7.q.out", "auto_join8.q.out",
      "auto_join11.q.out", "auto_join12.q.out", "auto_join13.q.out",
      "auto_join15.q.out", "auto_join16.q.out", "auto_join17.q.out",
      "auto_join18.q.out", "auto_join18_multi_distinct.q.out",
      "auto_join20.q.out", "auto_join21.q.out", "auto_join22.q.out",
      "auto_join23.q.out", "auto_join24.q.out", "auto_join26.q.out",
      "auto_join27.q.out", "auto_join29.q.out", "auto_join33.q.out")
    // not replayed, with reasons: auto_join_without_localtask.q (bare
    // LIMIT over a join asserts an engine-defined row subset),
    // cbo_*.q (need the cbo_t1/t2/t3 +
    // src_cbo fixture family), cast1.q / ansi_sql_arithmetic.q (Hive
    // casts boolean→string as "TRUE" and int/int division to decimal;
    // Spark says "true" and double — dialect divergences),
    // ambiguous_col.q (Hive tolerates ambiguous column refs Spark
    // rejects at analysis)
    val failures = files.flatMap { f =>
      try {
        if (replay(f) < 1) Some(f -> "no select blocks asserted") else None
      } catch {
        case e: Throwable =>
          Some(f -> Option(e.getMessage).getOrElse("?").take(300))
      }
    }
    assert(failures.isEmpty,
      failures.map { case (f, m) => s"$f: $m" }.mkString("\n\n"))
  }

  test("batch golden replay: cbo corpus over the cbo_t fixture family") {
    cbo; tpchFixtures; srcpart
    val files = Seq(
      "cbo_simple_select.q.out", "cbo_union.q.out",
      "cbo_subq_exists.q.out", "cbo_subq_in.q.out",
      "cbo_subq_not_in.q.out",
      "cbo_gby.q.out", "cbo_gby_empty.q.out", "cbo_join.q.out",
      "cbo_semijoin.q.out", "cbo_const.q.out", "subquery_in.q.out",
      "subquery_views.q.out")
    // not replayed, with reasons: cbo_limit.q (ORDER BY c_int LIMIT with
    // ties asserts an engine-defined subset), cbo_const.q (Hive
    // interval_day_time() constructor syntax), cbo_windowing.q (RANGE
    // frame over a string order key — Hive permits, Spark type-checks),
    // cbo_udf_max.q (struct cell rendering: Hive prints JSON with its
    // expr$N field names)
    val failures = files.flatMap { f =>
      try {
        if (replay(f) < 1) Some(f -> "no select blocks asserted") else None
      } catch {
        case e: Throwable =>
          Some(f -> Option(e.getMessage).getOrElse("?").take(300))
      }
    }
    assert(failures.isEmpty,
      failures.map { case (f, m) => s"$f: $m" }.mkString("\n\n"))
  }

  test("batch golden replay: srcpart corpus (partition pruning, dynamic " +
      "partitions, ppd, map-joins)") {
    src; src1; srcpart
    val files = Seq(
      "auto_join9.q.out", "auto_join14.q.out", "auto_join19.q.out",
      "auto_join19_inclause.q.out", "auto_join25.q.out",
      "join9.q.out", "join14.q.out", "join26.q.out", "join28.q.out",
      "join32.q.out", "join33.q.out", "join_empty.q.out",
      "join_merge_multi_expressions.q.out",
      "groupby_ppr.q.out", "groupby_map_ppr.q.out",
      "groupby_ppr_multi_distinct.q.out",
      "groupby_map_ppr_multi_distinct.q.out",
      "input_part0.q.out", "input_part1.q.out",
      "input_part2.q.out", "input_part3.q.out", "input_part5.q.out",
      "input_part7.q.out", "input_part9.q.out",
      "ppd2.q.out", "ppd_constant_where.q.out", "ppd_udf_case.q.out",
      "ppr_allchildsarenull.q.out", "ppr_pushdown3.q.out",
      "mapjoin_mapjoin.q.out", "mapjoin_subquery.q.out",
      "mapjoin_distinct.q.out", "partition_boolexpr.q.out",
      "constant_prop_2.q.out", "filter_numeric.q.out",
      "load_dyn_part1.q.out", "load_dyn_part2.q.out",
      "load_dyn_part3.q.out", "load_dyn_part8.q.out",
      "load_dyn_part13.q.out", "mi.q.out")
    // input42.q left out: its selects sample with rand(100)
    val failures = files.flatMap { f =>
      try {
        if (replay(f) < 1) Some(f -> "no select blocks asserted") else None
      } catch {
        case e: Throwable =>
          Some(f -> Option(e.getMessage).getOrElse("?").take(250))
      }
    }
    assert(failures.isEmpty,
      failures.map { case (f, m) => s"$f: $m" }.mkString("\n\n"))
  }

  test("batch golden replay: windowing corpus (files whose asserts are " +
      "deterministic — no bare LIMIT subsets)") {
    over10k; tpchFixtures; src; cbo; alltypesorc
    val files = Seq(
      "windowing_decimal.q.out", "windowing_columnPruning.q.out",
      "windowing_gby2.q.out",
      "windowing_adjust_rowcontainer_sz.q.out")
    // most windowing_*.q files end every select with a bare LIMIT 100
    // over 10k rows — an engine-defined subset, not replayable; ptf.q
    // drives Hive's noop()/noopwithmap() PTFs; windowing_distinct.q
    // needs COUNT(DISTINCT) OVER, which Spark rejects at analysis
    val failures = files.flatMap { f =>
      try {
        if (replay(f, stripDecZeros = false) < 1)
          Some(f -> "no select blocks asserted")
        else None
      } catch {
        case e: Throwable =>
          Some(f -> Option(e.getMessage).getOrElse("?").take(250))
      }
    }
    assert(failures.isEmpty,
      failures.map { case (f, m) => s"$f: $m" }.mkString("\n\n"))
  }

  test("udf_case.q golden replay (CASE WHEN matrices incl. NULL arms)") {
    src
    // the short-circuit block calls reflect('java.lang.String','bogus',1)
    // in a dead ELSE arm: Hive defers resolution to runtime (never
    // reached), Spark type-checks every branch at analysis — documented
    // divergence, block skipped
    assert(replay("udf_case.q.out", skip = _.contains("bogus")) >= 2)
  }
}
