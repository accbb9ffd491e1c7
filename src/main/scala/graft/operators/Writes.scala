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

  /** Hive `LOAD DATA INPATH 'src' [OVERWRITE] INTO TABLE t
    * [PARTITION (...)]` (ql/parse/LoadSemanticAnalyzer.java): a file
    * MOVE into the table (or partition) directory — no parse, no
    * rewrite; Hive appends `_copy_N` on name collisions, reproduced
    * here. `src` may be a file or a directory of files. */
  def loadData(spark: SparkSession, src: String, tableDir: String,
               overwrite: Boolean = false,
               partition: Seq[(String, String)] = Nil): Unit = {
    val srcPath = new org.apache.hadoop.fs.Path(src)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = srcPath.getFileSystem(conf)
    val destDir = partition.foldLeft(new org.apache.hadoop.fs.Path(tableDir)) {
      case (p, (k, v)) => new org.apache.hadoop.fs.Path(p, s"$k=$v")
    }
    val destFs = destDir.getFileSystem(conf)
    // Hive OVERWRITE clears the whole table/partition location,
    // including stale subdirectories — not just top-level files
    if (overwrite && destFs.exists(destDir))
      destFs.listStatus(destDir)
        .foreach(st => destFs.delete(st.getPath, true))
    destFs.mkdirs(destDir)
    val files =
      if (fs.getFileStatus(srcPath).isDirectory)
        fs.listStatus(srcPath).filter(_.isFile).map(_.getPath)
      else Array(srcPath)
    val sameFs = fs.getUri == destFs.getUri
    files.foreach { f =>
      var target = new org.apache.hadoop.fs.Path(destDir, f.getName)
      var n = 0
      while (destFs.exists(target)) { // Hive's _copy_N collision rule
        n += 1
        target = new org.apache.hadoop.fs.Path(destDir,
          s"${f.getName}_copy_$n")
      }
      if (sameFs) {
        if (!fs.rename(f, target))
          throw new java.io.IOException(
            s"LOAD DATA: move $f -> $target failed")
      } else if (!org.apache.hadoop.fs.FileUtil.copy(fs, f, destFs, target,
          /* deleteSource = */ true, conf))
        throw new java.io.IOException(
          s"LOAD DATA: cross-filesystem move $f -> $target failed")
    }
  }

  /** Hive `EXPORT TABLE t TO 'dir'` (ql/parse/ExportSemanticAnalyzer
    * .java): data files + a metadata descriptor (here the Spark schema
    * JSON standing in for Hive's `_metadata` thrift dump). */
  def exportTable(spark: SparkSession, tableDir: String,
                  destDir: String): Unit = {
    val df = spark.read.parquet(tableDir)
    val dest = new org.apache.hadoop.fs.Path(destDir)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val data = new org.apache.hadoop.fs.Path(dest, "data")
    fs.mkdirs(data)
    val src = new org.apache.hadoop.fs.Path(tableDir)
    src.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(src).filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("_"))
      .foreach { st =>
        org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
          new org.apache.hadoop.fs.Path(data, st.getPath.getName),
          false, spark.sparkContext.hadoopConfiguration)
      }
    val meta = fs.create(new org.apache.hadoop.fs.Path(dest, "_metadata"))
    try meta.write(df.schema.json.getBytes("UTF-8")) finally meta.close()
  }

  /** Hive `IMPORT TABLE t FROM 'dir'`
    * (ql/parse/ImportSemanticAnalyzer.java): validates the descriptor,
    * then moves the exported data files in. Returns the schema read
    * from the descriptor. */
  def importTable(spark: SparkSession, srcDir: String,
                  tableDir: String): org.apache.spark.sql.types.StructType = {
    val src = new org.apache.hadoop.fs.Path(srcDir)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaPath = new org.apache.hadoop.fs.Path(src, "_metadata")
    require(fs.exists(metaPath), s"IMPORT: no _metadata under $srcDir")
    val meta = new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(fs.open(metaPath)),
      "UTF-8")
    val schema = org.apache.spark.sql.types.DataType.fromJson(meta)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    loadData(spark, new org.apache.hadoop.fs.Path(src, "data").toString,
      tableDir)
    schema
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
