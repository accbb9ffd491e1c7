package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.SequenceFileIO

/** SequenceFile source/sink (SURVEY §2.1; reference
  * ql/io/HiveSequenceFileOutputFormat.java + serde2/lazy/
  * LazySimpleSerDe.java): delimited Text values inside the Hadoop
  * container format, ^A default delimiter, \N nulls, lazy-parse
  * (unparseable primitive reads as NULL), split fan-out over one file.
  */
class SequenceFileSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    s"${Files.createTempDirectory("graft_seq")}/$tag"

  test("round-trip of typed TPC-H slice through IO API") {
    val sample = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .orderBy("c_custkey").limit(100)
    val p = tmp("cust")
    SequenceFileIO.write(sample, p)
    val back = SequenceFileIO.read(spark, p, sample.schema)
    assert(back.orderBy("c_custkey").collect().toSeq ===
      sample.collect().toSeq)
  }

  test("format(\"sequencefile\") write/read with schema and delimiter") {
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -0.25), (3L, null, 2.0))
      .toDF("id", "name", "v")
    val p = tmp("fmt")
    df.write.format("sequencefile").option("delimiter", "|").save(p)
    val back = spark.read.format("sequencefile").option("delimiter", "|")
      .schema(df.schema).load(p)
    assert(back.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
    // schema-less read infers c0..cN strings
    val inferred = spark.read.format("sequencefile")
      .option("delimiter", "|").load(p)
    assert(inferred.columns.toSeq === Seq("c0", "c1", "c2"))
    assert(inferred.count() === 3)
  }

  test("\\N nulls and lazy-parse: unparseable primitives read as NULL") {
    val p = tmp("lazy")
    // hand-write rows the way a foreign Hive job might: one bad int
    Seq(("1", "7"), ("2", "notanint"), ("3", "\\N"))
      .toDF("a", "b").coalesce(1)
      .write.format("sequencefile").option("delimiter", ",").save(p)
    val schema = StructType(Seq(StructField("a", IntegerType),
      StructField("b", IntegerType)))
    val back = spark.read.format("sequencefile").option("delimiter", ",")
      .schema(schema).load(p).orderBy("a")
      .collect().map(r => (r.get(0), r.get(1))).toSeq
    assert(back === Seq((1, 7), (2, null), (3, null)))
  }

  test("missing trailing fields read as NULL") {
    val p = tmp("short")
    Seq(Tuple1("only")).toDF("x").coalesce(1)
      .write.format("sequencefile").save(p)
    val schema = StructType(Seq(StructField("x", StringType),
      StructField("extra", StringType)))
    val r = spark.read.format("sequencefile").schema(schema).load(p).head()
    assert(r.getString(0) === "only" && r.isNullAt(1))
  }

  test("single file fans out across splits without dup or drop") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), regexp_replace(col("text"), "[\\u0001\\n]", " ")
        .as("text"))
      .limit(2000).coalesce(1)
    val p = tmp("split")
    SequenceFileIO.write(docs, p)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val back = SequenceFileIO.read(spark, p, schema)
    assert(back.rdd.getNumPartitions > 1) // sync-marker block splits
    val whole = back.agg(count(lit(1)), sum(length(col("text")))).head()
    val orig = docs.agg(count(lit(1)), sum(length(col("text")))).head()
    assert(whole === orig)
  }

  test("block compression round-trips") {
    val df = spark.range(500).select(col("id"),
      concat(lit("v"), col("id")).as("s"))
    val p = tmp("comp")
    SequenceFileIO.write(df, p, compression = "block")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType)))
    val back = SequenceFileIO.read(spark, p, schema)
    assert(back.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }

  test("decimal, date, timestamp columns round-trip") {
    val df = spark.sql("""
      SELECT id,
             CAST(id * 1.05 AS DECIMAL(10,2)) dec,
             DATE'2024-02-29' d,
             TIMESTAMP'2024-03-15 13:45:00' ts
      FROM range(5)""")
    val p = tmp("types")
    SequenceFileIO.write(df, p)
    val back = SequenceFileIO.read(spark, p, df.schema)
    assert(back.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }
}
