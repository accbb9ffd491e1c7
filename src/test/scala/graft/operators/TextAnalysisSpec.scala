package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "completely unique words everywhere nothing repeats"),
    (3L, "der die das und etwas mehr text")
  ).toDF("doc_id", "text")

  test("textStats computes exact token statistics") {
    val r = TextAnalysis.textStats(docs).orderBy("doc_id").collect()
    val d1 = r(0)
    assert(d1.getAs[Int]("n_tokens") === 6)
    assert(d1.getAs[Int]("n_chars") === 22)
    assert(d1.getAs[Double]("stop_ratio") === 2.0 / 6) // two 'the'
    assert(d1.getAs[Double]("uniq_ratio") === 5.0 / 6)
    val d2 = r(1)
    assert(d2.getAs[Double]("uniq_ratio") === 1.0)
  }

  test("langId picks the profile with most function-word hits") {
    val r = TextAnalysis.langId(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[String]("pred_lang") === "en")
    assert(r(2).getAs[String]("pred_lang") === "de")
  }

  test("fingerprints are stable and normalization-insensitive") {
    val variants = Seq(
      (1L, "Hello  World"),
      (2L, "hello world"),
      (3L, "  HELLO   WORLD  ")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(variants).collect()
      .map(_.getAs[Long]("fp")).distinct
    assert(fps.length === 1)
  }

  test("topNgrams returns most frequent n-grams with deterministic ties") {
    val r = TextAnalysis.topNgrams(docs, n = 2, k = 3).collect()
    assert(r.nonEmpty)
    val counts = r.map(_.getAs[Long]("cnt"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("contextNgrams counts hole fillers for a fixed context") {
    val d = Seq((1L, "the cat and the dog and the cat")).toDF("doc_id", "text")
    val r = TextAnalysis.contextNgrams(d, Seq(Some("the"), None), 5)
      .as[(String, Long)].collect().toSeq
    assert(r === Seq(("cat", 2L), ("dog", 1L)))
  }

  test("multimodal feature extraction is deterministic with real schema") {
    val media = Multimodal.mediaTable(docs)
    assert(media.schema("media").dataType.typeName === "binary")
    val f = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    assert(f.length === 3)
    assert(f(0).getAs[Long]("n_bytes") === 22)
    assert(Seq("f0", "f1", "f2", "f3")
      .map(f(0).getAs[Double](_)).sum === 22.0) // hist sums to len
    val again = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    assert(f.map(_.getAs[Long]("checksum")).toSeq ===
      again.map(_.getAs[Long]("checksum")).toSeq)
  }

  test("multimodal IMAGE decode is real: committed PNG fixtures " +
      "through extractFeatures yield width/height/channels/luminance " +
      "from actual pixels, same schema as the opaque path") {
    def pngBytes(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/media/$name")
      assert(in != null, s"fixture $name missing")
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    }
    val rows = Seq(
      (1L, pngBytes("red_8x4.png"), "png"),
      (2L, pngBytes("gray_5x5.png"), "png"),
      (3L, pngBytes("grad_16x2.png"), "png"),
      // an opaque payload in the same frame keeps the stub path
      (4L, "not an image".getBytes("UTF-8"), "bin"))
    val media = rows.toDF("doc_id", "media", "format")
      .withColumn("n_bytes", length(col("media")).cast("long"))
    val f = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    // identical schema to the opaque path
    assert(f.head.schema.fieldNames.toSeq === Seq("doc_id", "n_bytes",
      "checksum", "mean_byte", "f0", "f1", "f2", "f3"))
    def wh(r: org.apache.spark.sql.Row) =
      (r.getAs[Double]("f0"), r.getAs[Double]("f1"), r.getAs[Double]("f2"))
    assert(wh(f(0)) === ((8.0, 4.0, 3.0)))   // red 8x4 RGB
    assert(wh(f(1)) === ((5.0, 5.0, 3.0)))   // gray 5x5
    assert(wh(f(2)) === ((16.0, 2.0, 3.0)))  // gradient 16x2
    // luminance from REAL pixels: solid red = 0.299*255 ≈ 76.245;
    // solid gray 128 = 128 exactly
    assert(math.abs(f(0).getAs[Double]("f3") - 0.299 * 255) < 0.3)
    assert(math.abs(f(1).getAs[Double]("f3") - 128.0) < 0.01)
    // gradient mean: x*16 for x=0..15 → mean 120
    assert(math.abs(f(2).getAs[Double]("f3") - 120.0) < 0.5)
    // the opaque row still runs the stub (hist sums to byte length)
    assert(Seq("f0", "f1", "f2", "f3")
      .map(f(3).getAs[Double](_)).sum === 12.0)
    // deterministic
    val again = Multimodal.extractFeatures(media).orderBy("doc_id")
      .collect()
    assert(f.map(_.getAs[Long]("checksum")).toSeq ===
      again.map(_.getAs[Long]("checksum")).toSeq)
  }

  test("multimodal AUDIO decode is real: committed WAV fixtures " +
      "through extractFeatures yield sample-rate/channels/duration/" +
      "RMS from actual PCM samples, same schema as the opaque path") {
    def wavBytes(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/media/$name")
      assert(in != null, s"fixture $name missing")
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    }
    val rows = Seq(
      // 0.1 s, 8 kHz mono 16-bit, 440 Hz sine at amplitude 0.5
      (1L, wavBytes("tone_8k_mono.wav"), "wav"),
      // 0.05 s, 4 kHz stereo 8-bit, ±0.5 square wave
      (2L, wavBytes("square_4k_stereo8.wav"), "wav"),
      (3L, "not audio".getBytes("UTF-8"), "bin"))
    val media = rows.toDF("doc_id", "media", "format")
      .withColumn("n_bytes", length(col("media")).cast("long"))
    val f = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    assert(f.head.schema.fieldNames.toSeq === Seq("doc_id", "n_bytes",
      "checksum", "mean_byte", "f0", "f1", "f2", "f3"))
    // sine: rate 8000, 1 channel, 0.1 s, RMS = 0.5/sqrt(2) ≈ 0.3536
    assert(f(0).getAs[Double]("f0") === 8000.0)
    assert(f(0).getAs[Double]("f1") === 1.0)
    assert(math.abs(f(0).getAs[Double]("f2") - 0.1) < 1e-9)
    assert(math.abs(f(0).getAs[Double]("f3") - 0.5 / math.sqrt(2)) < 0.01)
    // square: rate 4000, 2 channels, 0.05 s, |x| = 0.5 everywhere
    assert(f(1).getAs[Double]("f0") === 4000.0)
    assert(f(1).getAs[Double]("f1") === 2.0)
    assert(math.abs(f(1).getAs[Double]("f2") - 0.05) < 1e-9)
    assert(math.abs(f(1).getAs[Double]("f3") - 0.5) < 0.01)
    // opaque payload keeps the stub path (hist sums to byte length)
    assert(Seq("f0", "f1", "f2", "f3")
      .map(f(2).getAs[Double](_)).sum === 9.0)
    val again = Multimodal.extractFeatures(media).orderBy("doc_id")
      .collect()
    assert(f.map(_.getAs[Long]("checksum")).toSeq ===
      again.map(_.getAs[Long]("checksum")).toSeq)
  }

  test("multimodal resize bounds payloads; schema/metadata stay coherent") {
    val media = Multimodal.mediaTable(docs)
    val out = Multimodal.resize(media, targetBytes = 10).collect()
    out.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("media")
      assert(bytes.length <= 10)
      assert(r.getAs[Long]("n_bytes") === bytes.length.toLong)
    }
    // deterministic: same subsample on re-run
    val again = Multimodal.resize(media, targetBytes = 10).collect()
    assert(out.map(_.getAs[Array[Byte]]("media").toSeq).toSeq ===
      again.map(_.getAs[Array[Byte]]("media").toSeq).toSeq)
  }

  test("multimodal frame sampling explodes one row per frame, " +
      "partitioning the payload") {
    val media = Multimodal.mediaTable(docs)
    val frames = Multimodal.sampleFrames(media, nFrames = 4)
      .orderBy("doc_id", "frame_no").collect()
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.values.forall(_.length === 4))
    // frames reassemble to the original payload, in order
    val original = media.orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("media"))
    original.foreach { case (id, bytes) =>
      val re = byDoc(id).sortBy(_.getAs[Int]("frame_no"))
        .flatMap(_.getAs[Array[Byte]]("media"))
      assert(re.toSeq === bytes.toSeq)
    }
  }
}
