package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-pattern matching over ordered partitions — the reference's
  * MatchPath PTF (ql/udf/ptf/MatchPath.java, 938 LoC; registered at
  * ql/exec/FunctionRegistry.java:522), a MATCH_RECOGNIZE-lite Spark has
  * no operator for.
  *
  * Spark-first design (SURVEY.md §2.7): symbols are Catalyst boolean
  * expressions evaluated columnar BEFORE grouping (codegen'd, pushed into
  * the scan pipeline); only the tiny per-row symbol char plus the kept
  * columns reach the per-partition matcher, which runs as
  * `flatMapSortedGroups` — Spark secondary-sorts rows inside the shuffle
  * (the way Hive's PTF ReduceSink sort keys do), and partitions spread
  * across executors by the partition key.
  *
  * The path pattern is a regular expression over single-char symbol
  * names (e.g. symbols 'c' = click, 'p' = purchase; pattern "c+p" =
  * click-streak ending in a purchase). Non-overlapping left-to-right
  * matches, like java.util.regex find().
  */
object MatchPath {

  /** @param partitionCols grouping keys (one partition = one sequence)
    * @param orderCols     total order within the partition
    * @param symbols       (symbolChar, rowPredicate); first match wins,
    *                      rows matching no symbol get '.' (never matches)
    * @param pattern       regex over symbol chars
    * @param keep          columns carried into the output
    * @return keep-columns + match_id (per partition, 0-based) +
    *         match_pos (0-based position within the match)
    */
  def matchPath(df: DataFrame, partitionCols: Seq[String],
                orderCols: Seq[String], symbols: Seq[(Char, Column)],
                pattern: String, keep: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val symCol = symbols.foldRight(lit(".")) { case ((ch, cond), acc) =>
      when(cond, lit(ch.toString)).otherwise(acc)
    }
    val prepared = df.withColumn("__sym", symCol)
      .select((partitionCols ++ orderCols ++ keep).distinct.map(col) :+
        col("__sym"): _*)

    val outSchema = StructType(
      keep.map(c => prepared.schema(c)) :+
        StructField("match_id", IntegerType, nullable = false) :+
        StructField("match_pos", IntegerType, nullable = false))
    implicit val rowEnc: Encoder[Row] = RowEncoder.encoderFor(outSchema)

    val keyIdx = partitionCols.map(prepared.schema.fieldIndex)
    val keepIdx = keep.map(prepared.schema.fieldIndex)
    val symIdx = prepared.schema.fieldIndex("__sym")
    val rx = pattern.r

    implicit val keyEnc: Encoder[String] = Encoders.STRING
    prepared.groupByKey(r => keyIdx.map(i => String.valueOf(r.get(i)))
        .mkString("|"))
      .flatMapSortedGroups(orderCols.map(col): _*) { (_, it) =>
        // rows arrive secondary-sorted by orderCols; buffer only to
        // index match positions (Hive's PTFPartition buffers the same)
        val sorted = it.toArray
        val syms = sorted.map(_.getString(symIdx)).mkString
        rx.findAllMatchIn(syms).zipWithIndex.flatMap { case (m, mid) =>
          (m.start until m.end).map { p =>
            Row.fromSeq(keepIdx.map(sorted(p).get) :+ mid :+ (p - m.start))
          }
        }
      }.toDF(keep :+ "match_id" :+ "match_pos": _*)
  }

  /** The reference's EXACT MatchPath contract (MatchPath.java:94):
    * for EVERY row of the ordered partition, attempt a GREEDY,
    * NON-BACKTRACKING match of the symbol chain starting there
    * (SymbolFunction.match; Plus/Star consume while the predicate
    * holds — MatchPath.java:492,534); each matching row emits one
    * output row carrying all input columns plus `tpath`, the
    * array-of-structs of the matched rows. Matches may overlap.
    *
    * @param pattern  names separated by '.', each optionally followed
    *                 by '+' or '*' (e.g. "LATE.LATE+")
    * @param symbols  (name, rowPredicate), names case-insensitive
    */
  def hiveMatchPath(df: DataFrame, partitionCols: Seq[String],
                    orderCols: Seq[String],
                    symbols: Seq[(String, Column)],
                    pattern: String): DataFrame = {
    val toks: Seq[(Int, Char)] = pattern.split('.').toSeq.map { t0 =>
      val t = t0.trim
      val q = t.lastOption.filter(c => c == '+' || c == '*')
      val name = q.map(_ => t.dropRight(1)).getOrElse(t)
      val idx = symbols.indexWhere(_._1.equalsIgnoreCase(name))
      require(idx >= 0, s"matchpath: unknown symbol '$name'")
      (idx, q.getOrElse(' '))
    }
    val inSchema = df.schema
    val prepared = df.select(
      inSchema.fieldNames.map(col).toIndexedSeq ++
        symbols.zipWithIndex.map { case ((_, c), i) =>
          coalesce(c.cast(BooleanType), lit(false)).as(s"__sym$i") }: _*)
    val outSchema = StructType(inSchema.fields :+
      StructField("tpath", ArrayType(StructType(inSchema.fields))))
    implicit val rowEnc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    def idxOf(name: String): Int = {
      val i = prepared.schema.fieldNames
        .indexWhere(_.equalsIgnoreCase(name))
      require(i >= 0, s"matchpath: no column '$name'")
      i
    }
    val keyIdx = partitionCols.map(idxOf)
    val symIdx = symbols.indices.map(i => idxOf(s"__sym$i"))
    val nIn = inSchema.fields.length
    prepared.groupByKey(r => keyIdx.map(i => String.valueOf(r.get(i)))
        .mkString("|"))
      .flatMapSortedGroups(orderCols.map(col): _*) { (_, it) =>
        val rows = it.toArray
        val n = rows.length
        def sym(i: Int, p: Int): Boolean = rows(p).getBoolean(symIdx(i))
        /** Replays the reference's Chain/Symbol/Plus/Star `nextRow`
          * contracts exactly (MatchPath.java:445-607), iterator
          * convention getIndex() == current row + 1:
          *  - Symbol: nextRow = row+1 (MatchPath.java:465);
          *  - Plus: nextRow = getIndex()-1 — the first FAILING index
          *    mid-partition, but at partition end this EXCLUDES the
          *    last matched row, and a '+' starting ON the last row
          *    matches with zero consumed rows (MatchPath.java:540);
          *  - Star: always matches; nextRow = getIndex(), decremented
          *    only when rows remain (MatchPath.java:498-501) — a scan
          *    ending ON the last row consumes it even when its
          *    predicate failed there;
          *  - Chain: each component resumes AT the previous one's
          *    nextRow (resetToIndex, MatchPath.java:587); past the
          *    end, only optional (Star) components may remain.
          * Returns the match's nextRow, or -1 on no match. */
        def matchAt(start: Int): Int = {
          var row = start
          var next = start
          val ti = toks.iterator
          while (ti.hasNext) {
            val (s, q) = ti.next()
            if (row < n) {
              q match {
                case ' ' =>
                  if (!sym(s, row)) return -1
                  next = row + 1
                case '+' =>
                  if (!sym(s, row)) return -1
                  var j = row
                  while (sym(s, j) && j + 1 < n) j += 1
                  next = j
                case '*' =>
                  var j = row
                  while (sym(s, j) && j + 1 < n) j += 1
                  next = if (j + 1 < n) j else n
              }
              row = next
            } else if (q != '*') return -1
          }
          next
        }
        rows.indices.iterator.flatMap { i =>
          val end = matchAt(i)
          if (end < i) None
          else {
            // sz = nextRow - start (MatchPath.java:103); sz == 0 emits
            // with an EMPTY tpath, as the reference does
            val path = (i until end).map(p =>
              Row.fromSeq(rows(p).toSeq.take(nIn)))
            Some(Row.fromSeq(rows(i).toSeq.take(nIn) :+ path))
          }
        }
      }.toDF(outSchema.fieldNames.toIndexedSeq: _*)
  }
}
