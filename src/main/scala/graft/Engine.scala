package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session facade for the engine.
  *
  * The reference (Apache Hive 2.3.2, `/root/reference`) funnels every query
  * through `ql/Driver.java:404` (compile: parse -> semantic analysis ->
  * logical optimize -> task DAG) and `ql/Driver.java:1848` (execute over
  * MR/Tez/Spark-RDD). On Spark, that whole lifecycle IS Catalyst + Tungsten,
  * so the engine owns only what Hive's `SessionState`/`HiveConf` owned:
  * session configuration, catalog/view bootstrap, and function registration
  * (ref: `ql/exec/FunctionRegistry.java:193-533`).
  *
  * Scale posture (targets a 1000-executor / 100 TB deployment even though
  * tests run on local[32]):
  *   - AQE on: runtime join re-planning replaces Hive's
  *     `CommonJoinResolver` (runtime mapjoin conversion) and
  *     `SkewJoinResolver` (runtime skew splits).
  *   - autoBroadcastJoinThreshold 64m: dimension tables (region, nation,
  *     supplier, part at TPC-H shape) broadcast instead of shuffling the
  *     fact table.
  *   - shuffle.partitions is a session-level default only; AQE coalesces
  *     to the data's real size at runtime.
  */
object Engine {

  /** The driver testdata tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def session(appName: String = "graft",
              master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int =
                sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
                  .toInt): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      // Local-bench sizing: testdata tables are single ~1-40 MB parquet
      // files; the 128m default would scan each in ONE task, idling 31
      // cores. 4m splits sf0.1 scans across the box. (A 100 TB deployment
      // keeps the default — files there are many and block-sized.)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      // AQE coalesces shuffles to actual data size at runtime; keep the
      // pre-AQE partition count modest so stage task counts match the
      // local core budget rather than a cluster's.
      // scale-dependent: default matches the local core budget; a
      // cluster deployment sets SPARK_GRAFT_SHUFFLE_PARTITIONS to
      // 2-3x total executor cores and AQE coalesces downward from it
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        shufflePartitions.toString)
      // iterative operators localCheckpoint transient state; the
      // ContextCleaner only reclaims those blocks after a driver GC,
      // and the default periodic GC (30 min) lets them pile up across
      // many short queries in one JVM
      .config("spark.cleaner.periodicGC.interval", "1min")
      // ObjectHashAggregate (collect_list/percentile/sketches) falls back
      // to SORT-based aggregation after only 128 distinct keys per task —
      // for inverted-index builds (collect_list over ~30k shingles) that
      // means sorting the full exploded stream per task. 64k keys of
      // small object buffers fit comfortably in task memory; beyond that
      // the sort fallback still engages as the safety valve. Measured:
      // the jaccard postings stage dropped 4.1 s -> 1.6 s at sf0.1.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OHA_FALLBACK", "65536"))
      // Hive 2.x arithmetic is non-ANSI (overflow wraps, bad casts -> NULL);
      // keep ANSI off so dialect-sensitive expressions match the reference.
      .config("spark.sql.ansi.enabled", "false")
      // Hive char(n) semantics: CAST pads and comparisons see the padded
      // value (serde2/typeinfo/CharTypeInfo.java); without this Spark
      // treats CHAR(n)/VARCHAR(n) casts as plain STRING.
      .config("spark.sql.preserveCharVarcharTypeInfo", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.Registry.registerAll(spark)
    spark
  }

  /** Ensure gap functions + the engine's dialect/runtime posture on any
    * session, including externally-built ones (the driver's smoke test
    * hands us its own). Everything set here is runtime-settable SQLConf. */
  def prepare(spark: SparkSession): SparkSession = {
    functions.Registry.registerAll(spark)
    // Hive 2.x is non-ANSI: '' casts to NULL, overflow wraps
    // (SURVEY.md §7.3 dialect list)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.preserveCharVarcharTypeInfo", "true")
    // Hive's LazyMap keeps the LAST duplicate key (LinkedHashMap put)
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    // Spark's default decimal scale-trim rule (allowPrecisionLoss=
    // true) IS Hive 2.x's deriveResultDecimalTypeInfo rule — keep it
    // (the no-loss mode NULLs large products Hive can represent)
    spark.conf.set("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      sys.env.getOrElse("SPARK_GRAFT_OHA_FALLBACK", "65536"))
    spark
  }

  /** Scale-adaptive spread after an unsplittable read (optimization
    * guide §2.5: "one huge unsplittable file … repartition immediately
    * after the read"). The local testdata tables are single-row-group
    * parquet files, so every scan is exactly ONE task regardless of
    * `maxPartitionBytes`, and each per-row-heavy stage above it
    * (tokenize/shingle/explode/vector math) runs on one core of the
    * box. When the input's provable scan parallelism is well below the
    * cluster's, hash-repartition by `key` so that work uses every core;
    * when parallelism is already ample — the 100 TB case: block-sized
    * files >> total cores — this is a NO-OP and no shuffle is added.
    *
    * The decision reads plan metadata only (file counts / checkpointed
    * RDD partition counts), never runs a job, and deliberately returns
    * the input unchanged for plan shapes whose parallelism it cannot
    * prove cheaply (joins, aggregates): repartitioning those at scale
    * could coalesce a huge intermediate. Results are unaffected at any
    * decision: `key`-hash placement feeds only order-insensitive
    * aggregations downstream.
    */
  def spread(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    // dev A/B toggle: SPARK_GRAFT_NOSPREAD=1 disables every conditional
    // spread so a spread's win can be measured in isolation
    if (sys.env.get("SPARK_GRAFT_NOSPREAD").contains("1")) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def leafParallelism(p: LogicalPlan): Option[Int] = p match {
      case l: LogicalRDD => Some(l.rdd.getNumPartitions)
      case r: LogicalRelation => r.relation match {
        // file count is a LOWER bound on scan tasks (block splitting
        // only raises parallelism, never lowers it)
        case fs: HadoopFsRelation => Some(fs.location.inputFiles.length)
        case _ => None
      }
      case p: Project => leafParallelism(p.child)
      case f: Filter => leafParallelism(f.child)
      case s: SubqueryAlias => leafParallelism(s.child)
      case _ => None
    }
    leafParallelism(df.queryExecution.analyzed) match {
      case Some(n) if n * 2 <= target => df.repartition(target, key)
      case _ => df
    }
  }

  /** Register every testdata table under `dir` as a temp view (idempotent)
    * and return them by name. Mirrors Hive's metastore-backed name
    * resolution (`ql/metadata/Table.java`) with Spark temp views; a real
    * deployment would use a persistent catalog + partitioned layout.
    */
  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      Map[String, DataFrame]]()

  def tables(spark: SparkSession, dir: String): Map[String, DataFrame] =
    tableCache.computeIfAbsent((spark, dir), { _ =>
      prepare(spark)
      tableNames.map { name =>
        val df = read(spark, dir, name)
        df.createOrReplaceTempView(name)
        name -> df
      }.toMap
    })

  /** `events.ts` has shipped both as parquet TIMESTAMP(NANOS) (which
    * Spark cannot represent, SPARK-40819 — read as raw nanos and
    * truncate to micros, the truncation DuckDB applies casting
    * timestamp_ns -> TIMESTAMP) and, in newer testdata drops, plain
    * TIMESTAMP(MICROS)/NTZ. Branch on the inferred type so either
    * generation reads as a session TimestampType column.
    */
  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // the flag STAYS set: it only affects parquet NANOS columns
      // (which only events has), and a set/unset window would race
      // concurrent sessions sharing this SparkSession (test suites
      // run suites in parallel — an unset here mid-read elsewhere
      // flips the inferred type under that reader)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampType}
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case LongType => // nanos-as-long legacy layout
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampType => raw
        case _ => // TIMESTAMP_NTZ: same wall clock as a session
          // (UTC) timestamp
          raw.withColumn("ts", col("ts").cast(TimestampType))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
