package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with `right.ts <= left.ts` in the same key group.
  *
  * The reference has no such operator (SURVEY.md §2.3: equi-joins only);
  * this is a training-pipeline extra (attach the latest label/feature
  * snapshot to each event).
  *
  * Tier-(a) composition, deliberately NOT a custom SparkStrategy/Exec:
  * tag both sides, union, one window pass ordered by (ts, tag) carrying
  * the last right payload forward — a SINGLE shuffle+sort on the key,
  * exactly what a hand-written AsOfJoinExec would do, but it inherits
  * codegen, AQE, spill handling and WindowGroupLimit-family optimizer
  * work for free. A custom physical operator would only re-implement
  * that machinery (per the custom-operator preference order: compose
  * built-ins first).
  */
object AsOfJoin {

  /** @param left      probe side (each row appears once in the output)
    * @param right     reference side providing the as-of payload
    * @param keyCol    equi-key present on both sides
    * @param tsCol     event-time column present on both sides
    * @param payload   right-side columns to carry (null when no right
    *                  row precedes the left row)
    * @param tolerance optional max age (seconds) of the matched right
    *                  row; older matches become null (ASOF ... WITHIN)
    */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           payload: Seq[String],
           tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns
    // tag: right rows sort BEFORE left rows at equal ts (<= semantics)
    val restLeft = leftCols.filterNot(c => c == keyCol || c == tsCol)
    val rCols = Seq(col(keyCol), col(tsCol), lit(0).as("__tag")) ++
      payload.map(c => col(c).as(s"__p_$c")) ++
      restLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val r = right.select(rCols: _*)
    val lCols = Seq(col(keyCol), col(tsCol), lit(1).as("__tag")) ++
      payload.map(c => lit(null).cast(right.schema(c).dataType)
        .as(s"__p_$c")) ++
      restLeft.map(col)
    val l = left.select(lCols: _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the matched right row as ONE struct: ts and payload always
    // come from the same row, so a legitimately-NULL payload on the true
    // as-of match stays NULL instead of falling back to a stale older row
    val matchStruct = when(col("__tag") === 0,
      struct(col(tsCol).as("__mts") +:
        payload.map(c => col(s"__p_$c").as(c)): _*))
    val carried = l.unionByName(r.select(l.columns.map(col): _*))
      .withColumn("__m", last(matchStruct, ignoreNulls = true).over(w))
    val fresh = tolerance match {
      case Some(s) => unix_micros(col(tsCol)) -
        unix_micros(col("__m.__mts")) <= s * 1000000L
      case None => lit(true)
    }
    carried.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++ payload.map(c =>
        when(col("__m").isNotNull && fresh, col(s"__m.$c"))
          .otherwise(lit(null)).as(s"asof_$c")): _*)
  }
}
