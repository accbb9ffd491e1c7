package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-write surface (SURVEY.md §2.1/§2.13; ref:
  * ql/exec/FileSinkOperator.java:664 — dynamic partitions, bucketing,
  * compression; MoveTask commit protocol; multi-insert planning in
  * ql/parse/SemanticAnalyzer.java).
  *
  * Spark-first mapping: `DataFrameWriter.partitionBy/bucketBy`, dynamic
  * partition overwrite mode, `FileCommitProtocol` (MoveTask for free),
  * and multi-insert = one cached scan fanned into N writers.
  */
object Writes {

  /** Partitioned write (Hive: PARTITIONED BY directories). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Dynamic-partition overwrite: only partitions present in `df` are
    * replaced (Hive: hive.exec.dynamic.partition + INSERT OVERWRITE;
    * ref FileSinkOperator dynamic partition handling). */
  def overwriteDynamicPartitions(df: DataFrame, path: String,
                                 partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed + sorted managed table (Hive: CLUSTERED BY ... SORTED BY
    * ... INTO n BUCKETS; ref ql/optimizer/BucketMapJoinOptimizer.java).
    * Joins/aggs on the bucket key then skip the shuffle — the SMB path. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Multi-insert: one source scan, many sinks (Hive `FROM t INSERT ...
    * INSERT ...`). The cache makes the fan-out read the scan once. */
  def multiInsert(src: DataFrame,
                  sinks: Seq[(DataFrame => DataFrame, String)]): Unit = {
    src.cache()
    try sinks.foreach { case (transform, path) =>
      transform(src).write.mode(SaveMode.Overwrite).parquet(path)
    } finally src.unpersist()
  }

  /** Small-file compaction (ref: ql/exec/AbstractFileMergeOperator /
    * OrcFileMergeOperator — Hive's merge-files task): rewrite a dataset
    * directory to `targetFiles` output files. */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Unit = {
    val tmp = path + "__compact_tmp"
    spark.read.parquet(path).repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    // resolve the FILE'S filesystem (not fs.defaultFS) and swap via the
    // backup-rename protocol: the old data survives until the new data
    // is in place, so a crash mid-swap cannot lose the dataset
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new org.apache.hadoop.fs.Path(path + "__compact_backup")
    fs.delete(backup, true)
    if (!fs.rename(dst, backup))
      throw new java.io.IOException(s"could not back up $dst")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)) {
      fs.rename(backup, dst)
      throw new java.io.IOException(s"rename $tmp -> $dst failed")
    }
    fs.delete(backup, true)
  }
}
