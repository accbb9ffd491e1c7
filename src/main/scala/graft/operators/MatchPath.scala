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
}
