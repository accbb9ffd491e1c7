package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.AvroIO

/** Avro source/sink (SURVEY §2.1, reference serde2/avro/AvroSerDe.java):
  * round-trips through our container-file reader/writer, the full type
  * bridge (decimal/date/timestamp logical types, nested record/array/map),
  * the `format("avro")` registration, column pruning, and the sync-marker
  * split protocol (a file read with tiny splitBytes must not duplicate or
  * drop rows — blocks are claimed by the split owning their sync point).
  */
class AvroSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    s"${Files.createTempDirectory("graft_avro")}/$tag"

  test("round-trip of TPC-H slice via AvroIO and format(\"avro\")") {
    val sample = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .orderBy("c_custkey").limit(100)
    val p = tmp("cust")
    AvroIO.write(sample, p)
    val back = AvroIO.read(spark, p)
    assert(back.schema === StructType(sample.schema.map(_.copy(
      nullable = true))))
    assert(back.orderBy("c_custkey").collect().toSeq ===
      sample.collect().toSeq)
    // registered short name resolves to our source
    val viaFormat = spark.read.format("avro").load(p)
    assert(viaFormat.orderBy("c_custkey").collect().toSeq ===
      sample.collect().toSeq)
    val p2 = tmp("cust2")
    sample.write.format("avro").save(p2)
    assert(spark.read.format("avro").load(p2).count() === 100)
  }

  test("type bridge: decimal, date, timestamp, binary, nested") {
    val df = spark.sql("""
      SELECT CAST(id AS INT) i, CAST(id AS DECIMAL(20, 4)) * 1.5 dec,
             DATE'2024-02-29' + make_interval(0, 0, 0, CAST(id AS INT)) d,
             TIMESTAMP'2024-03-15 13:45:00.123456' ts,
             encode(CAST(id AS STRING), 'UTF-8') bin,
             named_struct('a', id, 'b', CAST(id AS STRING)) rec,
             array(id, id + 1) arr,
             map('k', id) m,
             IF(id % 2 = 0, NULL, CAST(id AS STRING)) maybe
      FROM range(10)""")
    val p = tmp("types")
    AvroIO.write(df, p, compression = "deflate")
    val back = AvroIO.read(spark, p).orderBy("i")
    assert(back.collect().toSeq === df.orderBy("i").collect().toSeq)
    assert(back.schema("dec").dataType === DecimalType(23, 5))
    assert(back.schema("d").dataType === DateType)
    assert(back.schema("ts").dataType === TimestampType)
  }

  test("sync-marker splits: tiny splitBytes neither drops nor duplicates") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(2000).coalesce(1)
    val p = tmp("split")
    AvroIO.write(docs, p, compression = "none")
    val whole = AvroIO.read(spark, p).agg(count("*"),
      sum(length(col("text")))).head()
    // 4 KB splits on a single file: many tasks over one container
    val sliced = AvroIO.read(spark, p, splitBytes = 4096).agg(count("*"),
      sum(length(col("text")))).head()
    assert(sliced === whole)
    assert(whole.getLong(0) === docs.count())
  }

  test("column pruning through format(\"avro\") and count(*) scan") {
    val sample = spark.range(50).select(col("id"),
      concat(lit("n"), col("id")).as("name"), (col("id") * 2).as("v"))
    val p = tmp("prune")
    sample.write.format("avro").save(p)
    val q = spark.read.format("avro").load(p).select("name")
    assert(q.collect().map(_.getString(0)).sorted.head === "n0")
    assert(spark.read.format("avro").load(p).count() === 50)
  }

  test("user schema: added nullable column reads as null (evolution)") {
    val p = tmp("evolve")
    spark.range(10).select(col("id"), concat(lit("n"), col("id")).as("name"))
      .write.format("avro").save(p)
    val declared = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("added", IntegerType, nullable = true)))
    val back = spark.read.format("avro").schema(declared).load(p)
    assert(back.count() === 10)
    assert(back.where(col("added").isNull).count() === 10)
  }

  test("user schema: type mismatch and non-nullable-missing fail clearly") {
    val p = tmp("mismatch")
    spark.range(5).select(col("id"), concat(lit("n"), col("id")).as("name"))
      .write.format("avro").save(p)
    val wrongType = StructType(Seq(StructField("name", IntegerType)))
    val e1 = intercept[org.apache.spark.SparkException] {
      spark.read.format("avro").schema(wrongType).load(p).collect()
    }
    assert(e1.getMessage.contains("avro schema mismatch") ||
      Option(e1.getCause).exists(_.getMessage.contains("avro schema mismatch")))
    val missingStrict = StructType(Seq(
      StructField("nope", LongType, nullable = false)))
    val e2 = intercept[org.apache.spark.SparkException] {
      spark.read.format("avro").schema(missingStrict).load(p).collect()
    }
    assert(e2.getMessage.contains("no field 'nope'") ||
      Option(e2.getCause).exists(_.getMessage.contains("no field 'nope'")))
  }

  test("directory schema inference merges evolved file headers") {
    // old file (id, name) + new file (id, name, added): the inferred
    // reader schema carries the evolved column; old rows read null
    val p = tmp("evolvedir")
    spark.range(3).select(col("id"),
      concat(lit("o"), col("id")).as("name")).coalesce(1)
      .write.format("avro").save(p)
    spark.range(3, 6).select(col("id"),
      concat(lit("n"), col("id")).as("name"),
      (col("id") * 10).cast(IntegerType).as("added")).coalesce(1)
      .write.format("avro").mode("append").save(p)
    val df = spark.read.format("avro").load(p)
    assert(df.columns.toSeq === Seq("id", "name", "added"))
    assert(df.count() === 6)
    assert(df.where(col("added").isNull).count() === 3)
    assert(df.where(col("added") === 40).count() === 1)
  }

  test("directory inference fails loudly on a same-name type conflict") {
    val p = tmp("conflictdir")
    spark.range(2).select(col("id")).coalesce(1)
      .write.format("avro").save(p)
    spark.range(2).select(col("id").cast(StringType).as("id")).coalesce(1)
      .write.format("avro").mode("append").save(p)
    val e = intercept[Exception] {
      spark.read.format("avro").load(p).collect()
    }
    assert(e.getMessage.contains("avro schema conflict"))
  }

  test("partially-consumed scan (limit) completes without leaking readers") {
    val p = tmp("partial")
    spark.range(5000).select(col("id"),
      concat(lit("x"), col("id")).as("s")).coalesce(1)
      .write.format("avro").save(p)
    // small splits ⇒ several open files per task; limit abandons the
    // iterators early — the task-completion listener must close them
    val few = spark.read.format("avro")
      .option("splitBytes", "4096").load(p).limit(3).collect()
    assert(few.length === 3)
  }
}
