package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def writeBatch(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes)

  test("fileIngest commits batches exactly once across restarts") {
    val base = Files.createTempDirectory("graft_ingest").toString
    val src = s"$base/src"; val dst = s"$base/dst"; val cp = s"$base/cp"
    Files.createDirectories(Paths.get(src))
    writeBatch(src, "b1.json", Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:00Z","event_type":"click","value":1.5}""",
      """{"event_id":2,"ts":"2024-01-01T00:01:00Z","event_type":"view","value":2.0}"""))
    val q1 = Ingest.fileIngest(spark, src, schema, "json", dst, cp)
    q1.awaitTermination()
    assert(spark.read.parquet(dst).count() === 2)
    // second transaction batch + restart: only new rows commit
    writeBatch(src, "b2.json", Seq(
      """{"event_id":3,"ts":"2024-01-01T00:02:00Z","event_type":"click","value":3.0}"""))
    val q2 = Ingest.fileIngest(spark, src, schema, "json", dst, cp)
    q2.awaitTermination()
    assert(spark.read.parquet(dst).count() === 3)
    // restart with NO new data: nothing duplicated (exactly-once)
    val q3 = Ingest.fileIngest(spark, src, schema, "json", dst, cp)
    q3.awaitTermination()
    assert(spark.read.parquet(dst).count() === 3)
  }

  test("upsertSink MERGEs each micro-batch into the table exactly once") {
    val base = Files.createTempDirectory("graft_upsert").toString
    val src = s"$base/src"; val dst = s"$base/t"; val cp = s"$base/cp"
    Files.createDirectories(Paths.get(src))
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("amount", DoubleType)))
    writeBatch(src, "b1.json", Seq(
      """{"id":1,"amount":10.0}""", """{"id":2,"amount":20.0}""",
      """{"id":2,"amount":25.0}""")) // in-batch dup: one row must win
    val q1 = Ingest.upsertSink(
      spark.readStream.schema(sch).json(src), dst, "id", cp)
    q1.awaitTermination()
    val after1 = spark.read.parquet(dst).orderBy("id")
      .as[(Long, Double)].collect().toSeq
    assert(after1.map(_._1) === Seq(1L, 2L))
    assert(after1(1)._2 === 25.0) // last-wins dedup picked the larger row
    // batch 2: update id=1, insert id=3
    writeBatch(src, "b2.json", Seq(
      """{"id":1,"amount":99.0}""", """{"id":3,"amount":30.0}"""))
    val q2 = Ingest.upsertSink(
      spark.readStream.schema(sch).json(src), dst, "id", cp)
    q2.awaitTermination()
    val after2 = spark.read.parquet(dst).orderBy("id")
      .as[(Long, Double)].collect().toSeq
    assert(after2 === Seq((1L, 99.0), (2L, 25.0), (3L, 30.0)))
    // restart with no new data: nothing reapplied (exactly-once)
    val q3 = Ingest.upsertSink(
      spark.readStream.schema(sch).json(src), dst, "id", cp)
    q3.awaitTermination()
    assert(spark.read.parquet(dst).count() === 3)
  }

  test("curation operators compose into a streaming pipeline unchanged") {
    // piiRedact and stratifiedSample are stateless column pipelines, so
    // the same operator code runs under readStream — the property a
    // unified batch/streaming curation engine needs
    val base = Files.createTempDirectory("graft_stream_cur").toString
    val src = s"$base/src"; val dst = s"$base/dst"; val cp = s"$base/cp"
    Files.createDirectories(Paths.get(src))
    writeBatch(src, "d1.json", Seq(
      """{"doc_id":1,"lang":"en","text":"mail a@b.io please"}""",
      """{"doc_id":2,"lang":"de","text":"nichts zu sehen"}"""))
    val sch = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("text", StringType)))
    val stream = spark.readStream.schema(sch).json(src)
    val q = graft.operators.Curation.piiRedact(stream)
      .writeStream.format("parquet").option("path", dst)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(dst).orderBy("doc_id")
      .select("doc_id", "n_emails", "redacted")
      .as[(Long, Int, String)].collect().toSeq
    assert(got === Seq((1L, 1, "mail [EMAIL] please"),
      (2L, 0, "nichts zu sehen")))
  }

  test("upsertSink with seqCol: highest sequence wins, not max payload") {
    val base = Files.createTempDirectory("graft_upsert_seq").toString
    val src = s"$base/src"; val dst = s"$base/t"; val cp = s"$base/cp"
    Files.createDirectories(Paths.get(src))
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("seq", LongType), StructField("amount", DoubleType)))
    // the LATER row (seq=2) carries the SMALLER amount: max-tuple-wins
    // would pick 20.0, last-value-wins must pick 5.0
    writeBatch(src, "b1.json", Seq(
      """{"id":1,"seq":1,"amount":20.0}""",
      """{"id":1,"seq":2,"amount":5.0}"""))
    val q = Ingest.upsertSink(
      spark.readStream.schema(sch).json(src), dst, "id", cp,
      seqCol = Some("seq"))
    q.awaitTermination()
    val got = spark.read.parquet(dst)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 5.0)))
  }

  test("windowedCounts aggregates a file stream with watermark") {
    val base = Files.createTempDirectory("graft_window").toString
    val src = s"$base/src"
    Files.createDirectories(Paths.get(src))
    writeBatch(src, "b1.json", Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:30Z","event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:01:30Z","event_type":"click","value":2.0}""",
      """{"event_id":3,"ts":"2024-01-01T00:06:30Z","event_type":"view","value":4.0}"""))
    val stream = spark.readStream.schema(schema).json(src)
    val q = Ingest.windowedCounts(stream)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("winout")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("winout").collect()
    val click = rows.find(_.getAs[String]("event_type") == "click").get
    assert(click.getAs[Long]("n") === 2)
    assert(click.getAs[Double]("total_value") === 3.0)
    val view = rows.find(_.getAs[String]("event_type") == "view").get
    assert(view.getAs[Long]("n") === 1)
  }

  test("stream-stream interval join attributes purchases to recent clicks") {
    val base = Files.createTempDirectory("graft_ssj").toString
    val csrc = s"$base/clicks"; val psrc = s"$base/purchases"
    Files.createDirectories(Paths.get(csrc))
    Files.createDirectories(Paths.get(psrc))
    val evSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType)))
    writeBatch(csrc, "c1.json", Seq(
      """{"event_id":1,"ts":"2024-01-01T00:10:00Z","user_id":7}""",
      """{"event_id":2,"ts":"2024-01-01T02:00:00Z","user_id":7}""",
      """{"event_id":3,"ts":"2024-01-01T00:20:00Z","user_id":9}"""))
    writeBatch(psrc, "p1.json", Seq(
      """{"event_id":10,"ts":"2024-01-01T00:30:00Z","user_id":7}"""))
    val clicks = spark.readStream.schema(evSchema).json(csrc)
    val purchases = spark.readStream.schema(evSchema).json(psrc)
    val q = Ingest.streamStreamAttribution(clicks, purchases)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssj")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("ssj").collect()
    // purchase 10 (user 7 @00:30) matches click 1 (@00:10, within 1h);
    // click 2 is later, click 3 is another user
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("purchase_id") === 10L)
    assert(rows.head.getAs[Long]("click_id") === 1L)
  }

  test("streamingDedup drops repeated content within the watermark") {
    val base = Files.createTempDirectory("graft_sdedup").toString
    val src = s"$base/src"
    Files.createDirectories(Paths.get(src))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ts", TimestampType),
      StructField("text", StringType)))
    writeBatch(src, "b1.json", Seq(
      """{"doc_id":1,"ts":"2024-01-01T00:00:00Z","text":"same content"}""",
      """{"doc_id":2,"ts":"2024-01-01T00:01:00Z","text":"SAME   content"}""",
      """{"doc_id":3,"ts":"2024-01-01T00:02:00Z","text":"different content"}"""))
    val stream = spark.readStream.schema(docSchema).json(src)
    val q = Ingest.streamingDedup(stream)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sdedup")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ids = spark.table("sdedup").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    // docs 1 and 2 normalize to the same content -> one survives
    assert(ids.length === 2 && ids.contains(3L))
    assert(ids.intersect(Seq(1L, 2L)).length === 1)
  }

  test("stateful sessionize counts sessions across micro-batches") {
    val base = Files.createTempDirectory("graft_sess").toString
    val src = s"$base/src"
    Files.createDirectories(Paths.get(src))
    // user 7: two events 10 min apart (1 session), then one 2h later
    writeBatch(src, "b1.json", Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:00Z","event_type":"a","value":0},""".dropRight(1),
      """{"event_id":2,"ts":"2024-01-01T00:10:00Z","event_type":"a","value":0}"""))
    val evs = spark.readStream.schema(schema).json(src)
      .withColumn("user_id", lit(7L))
      .select(col("user_id"), col("ts")).as[Ingest.Ev]
    val q = Ingest.sessionize(evs)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("sessout")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val r1 = spark.table("sessout").collect().last
    assert(r1.getAs[Long]("n_events") === 2)
    assert(r1.getAs[Long]("n_sessions") === 1)
  }
}
