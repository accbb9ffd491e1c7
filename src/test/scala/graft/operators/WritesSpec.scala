package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class WritesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_writes").toString

  test("partitioned write creates partition directories, prunes on read") {
    val base = s"${tmp()}/orders_part"
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("y", year(col("o_orderdate")))
    Writes.writePartitioned(o, base, Seq("y"))
    val dirs = new java.io.File(base).list().filter(_.startsWith("y="))
    assert(dirs.nonEmpty)
    val pruned = spark.read.parquet(base).filter(col("y") === 1995)
    // partition filter must prune, not scan-and-filter
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ===
      o.filter(year(col("o_orderdate")) === 1995).count())
  }

  test("dynamic partition overwrite replaces only touched partitions") {
    val base = s"${tmp()}/dynpart"
    val df = Seq((1, "a", 10), (2, "b", 20)).toDF("id", "p", "v")
    Writes.writePartitioned(df, base, Seq("p"))
    val upd = Seq((3, "b", 99)).toDF("id", "p", "v")
    Writes.overwriteDynamicPartitions(upd, base, Seq("p"))
    val out = spark.read.parquet(base).orderBy("id").collect()
    // partition a untouched, partition b replaced
    assert(out.map(r => (r.getInt(0), r.getInt(1))).toSeq ===
      Seq((1, 10), (3, 99)))
  }

  test("bucketed table joins without exchange on the bucket key") {
    spark.sql("DROP TABLE IF EXISTS bt1")
    spark.sql("DROP TABLE IF EXISTS bt2")
    // a previously-aborted run can leave the managed location behind
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("bt1", "bt2").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(wh, t))
    }
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    Writes.writeBucketed(o.select("o_orderkey", "o_totalprice"), "bt1",
      "o_orderkey", 4)
    Writes.writeBucketed(o.select("o_orderkey", "o_orderstatus"), "bt2",
      "o_orderkey", 4)
    // disable broadcast so the planner must co-locate via buckets;
    // success = SortMergeJoin with NO shuffle exchange on either side
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val joined = spark.table("bt1").join(spark.table("bt2"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"bucketed join should plan sort-merge (the SMB path):\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === o.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("LOAD DATA moves files in; OVERWRITE replaces; _copy_N on clash") {
    val base = tmp()
    val table = s"$base/t"
    val stage1 = s"$base/stage1"; val stage2 = s"$base/stage2"
    Seq((1L, "a")).toDF("id", "v").write.parquet(stage1)
    Seq((2L, "b")).toDF("id", "v").write.parquet(stage2)
    Writes.loadData(spark, stage1, table)
    assert(spark.read.parquet(table).count() === 1)
    // second load APPENDS (and renames colliding file names)
    Writes.loadData(spark, stage2, table)
    assert(spark.read.parquet(table).orderBy("id")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b")))
    // overwrite load replaces content
    val stage3 = s"$base/stage3"
    Seq((9L, "z")).toDF("id", "v").write.parquet(stage3)
    Writes.loadData(spark, stage3, table, overwrite = true)
    assert(spark.read.parquet(table).as[(Long, String)].collect().toSeq ===
      Seq((9L, "z")))
  }

  test("LOAD DATA OVERWRITE clears stale subdirectories too") {
    val base = tmp()
    val table = s"$base/t"
    // a stale partition-style subdir that keeps contributing rows if
    // overwrite only removes top-level files
    Seq((1L, "old")).toDF("id", "v").write.parquet(s"$table/stale=1")
    val stage = s"$base/stage"
    Seq((9L, "z")).toDF("id", "v").write.parquet(stage)
    Writes.loadData(spark, stage, table, overwrite = true)
    assert(!new java.io.File(s"$table/stale=1").exists())
    assert(spark.read.parquet(table).as[(Long, String)].collect().toSeq ===
      Seq((9L, "z")))
  }

  test("LOAD DATA into a partition directory") {
    val base = tmp()
    val table = s"$base/t"
    Seq((1L, "x")).toDF("id", "v").write
      .parquet(s"$base/seed") // stage
    Writes.loadData(spark, s"$base/seed", table,
      partition = Seq("region" -> "us"))
    val got = spark.read.parquet(table)
    assert(got.columns.toSet === Set("id", "v", "region"))
    assert(got.head().getAs[String]("region") === "us")
  }

  test("EXPORT then IMPORT round-trips data and schema descriptor") {
    val base = tmp()
    val table = s"$base/t"
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "v", "w")
      .write.parquet(table)
    Writes.exportTable(spark, table, s"$base/exp")
    assert(new java.io.File(s"$base/exp/_metadata").exists())
    val schema = Writes.importTable(spark, s"$base/exp", s"$base/t2")
    assert(schema.fieldNames.toSeq === Seq("id", "v", "w"))
    assert(spark.read.parquet(s"$base/t2").orderBy("id")
      .as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("multiInsert fans one scan into several sinks") {
    val base = tmp()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    Writes.multiInsert(li, Seq(
      ((d: org.apache.spark.sql.DataFrame) =>
        d.groupBy("l_returnflag").count(), s"$base/by_flag"),
      ((d: org.apache.spark.sql.DataFrame) =>
        d.filter(col("l_quantity") > 45), s"$base/big_qty")))
    assert(spark.read.parquet(s"$base/by_flag").count() === 3)
    assert(spark.read.parquet(s"$base/big_qty").count() ===
      li.filter(col("l_quantity") > 45).count())
  }

  test("compact reduces file count, preserves data") {
    val base = s"${tmp()}/frag"
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.repartition(16).write.parquet(base)
    val before = new java.io.File(base).list().count(_.endsWith(".parquet"))
    val rows = spark.read.parquet(base).count()
    Writes.compact(spark, base, 2)
    val after = new java.io.File(base).list().count(_.endsWith(".parquet"))
    assert(before === 16 && after === 2)
    assert(spark.read.parquet(base).count() === rows)
  }
}
