package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Image header decode tests (SURVEY.md §2 #31/#104): the ImageMeta
  * kernel against hand-assembled and generator-built containers, the
  * reject paths, and the end-to-end multimodal_meta contract. */
class ImageMetaSpec extends SparkTestBase {
  import spark.implicits._

  private def parse(b: Array[Byte]) =
    Option(graft.functions.expressions.ImageMeta.parse(b)).map { r =>
      (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2), r.getLong(3))
    }

  test("PNG IHDR fields round-trip through the parser") {
    for ((ch, colorType) <- Seq((1, 0), (2, 4), (3, 2), (4, 6))) {
      val b = Multimodal.pngHeader(640, 480, ch)
      assert(b(25) === colorType.toByte, s"color type for $ch channels")
      assert(parse(b) === Some(("png", 640L, 480L, ch.toLong)))
    }
    // palette color type (not emitted by the generator) reads 1 channel
    val pal = Multimodal.pngHeader(33, 7, 1)
    pal(25) = 3
    val crc = new java.util.zip.CRC32
    crc.update(pal, 12, 17)
    val c = crc.getValue.toInt
    pal(29) = (c >>> 24).toByte; pal(30) = (c >>> 16).toByte
    pal(31) = (c >>> 8).toByte; pal(32) = c.toByte
    assert(parse(pal) === Some(("png", 33L, 7L, 1L)))
  }

  test("JPEG SOF dimensions are found behind skippable segments") {
    for (ch <- 1 to 4) {
      val b = Multimodal.jpegHeader(639, 479, ch)
      assert(parse(b) === Some(("jpeg", 639L, 479L, ch.toLong)))
    }
    // progressive (SOF2) and padded fill bytes also parse
    val prog = Multimodal.jpegHeader(100, 50, 3)
    prog(21) = 0xc2.toByte // SOF0 -> SOF2
    assert(parse(prog) === Some(("jpeg", 100L, 50L, 3L)))
  }

  test("junk, truncated, and dimension-less payloads read NULL") {
    assert(parse(Array.empty[Byte]) === None)
    assert(parse("not an image at all".getBytes("UTF-8")) === None)
    assert(parse(Multimodal.pngHeader(64, 64, 3).take(20)) === None)
    // JPEG that hits SOS before any SOF carries no dimensions
    val noSof = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xda.toByte, 0, 2)
    assert(parse(noSof) === None)
    // PNG whose first chunk is not IHDR is malformed
    val bad = Multimodal.pngHeader(64, 64, 3)
    bad(13) = 'X'
    assert(parse(bad) === None)
    // fill-byte run ending exactly at the buffer tail: the length
    // field of the padded marker is out of bounds — must be NULL, not
    // an ArrayIndexOutOfBoundsException (round-11 regression)
    val padTail = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte, 0xc0.toByte)
    assert(parse(padTail) === None)
    // same shape one byte longer (only half the length field present)
    assert(parse(padTail :+ 0x00.toByte) === None)
  }

  test("multimodal_meta decodes what the generator encoded, for every doc") {
    val got = Multimodal.multimodalMeta(spark, SfDir).collect()
    assert(got.length > 0)
    val texts = graft.sources.Tables.load(spark, SfDir, "documents")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got.length === texts.size)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = texts(id).getBytes("UTF-8").length.toLong
      assert(r.getAs[String]("format") === (if (id % 2 == 0) "png" else "jpeg"))
      assert(r.getAs[Long]("width") === 16 + n % 624)
      assert(r.getAs[Long]("height") === 16 + (n * 7) % 464)
      assert(r.getAs[Long]("channels") === 1 + n % 3)
      val hdr = if (id % 2 == 0) 33L else 30L + 3L * (1 + n % 3)
      assert(r.getAs[Long]("n_bytes") === n + hdr)
    }
  }

  test("image_meta is callable from SQL and codegen handles nulls") {
    GraftFunctions.register(spark)
    val b = Multimodal.jpegHeader(12, 34, 3)
    val got = Seq((1L, b), (2L, "junk".getBytes("UTF-8")), (3L, null))
      .toDF("id", "payload")
      .selectExpr("id", "image_meta(payload) AS m")
      .selectExpr("id", "m.format", "m.width", "m.height", "m.channels")
      .collect().sortBy(_.getLong(0))
    assert(got(0).getString(1) === "jpeg")
    assert(got(0).getLong(2) === 12L && got(0).getLong(3) === 34L)
    assert(got(1).isNullAt(1) && got(2).isNullAt(1))
  }

  test("audio_meta parses RIFF/WAVE headers; junk and truncation are NULL") {
    val wav = Multimodal.wavHeader(16000, 2, 16, 64000)
    val m = graft.functions.expressions.AudioMeta.parse(wav)
    assert(m != null)
    assert(m.getLong(0) === 1L && m.getLong(1) === 2L)
    assert(m.getLong(2) === 16000L && m.getLong(3) === 16L)
    assert(m.getLong(4) === 64000L / 4L, "frames = dataLen/blockAlign")
    // body optional: data length is metadata (truncated object-store
    // sweeps still yield features)
    assert(graft.functions.expressions.AudioMeta.parse(
      wav.take(44)) != null)
    assert(graft.functions.expressions.AudioMeta.parse(
      "RIFFjunk".getBytes("US-ASCII")) == null)
    assert(graft.functions.expressions.AudioMeta.parse(
      wav.take(20)) == null, "fmt chunk cut short")
    val viaQuery = Multimodal.multimodalAudio(spark, SfDir).collect()
    assert(viaQuery.nonEmpty)
    viaQuery.foreach { r =>
      assert(r.getAs[Long]("codec") === 1L)
      assert(r.getAs[Long]("bits") === 16L)
      val n = r.getAs[Long]("n_bytes") - 44L
      assert(r.getAs[Long]("channels") === 1L + n % 2L)
      assert(r.getAs[Long]("sample_rate") === 8000L + (n % 5L) * 8000L)
    }
  }

  test("video_meta walks the MP4 box tree; junk and truncation are NULL") {
    val mp4 = Multimodal.mp4Header(30000, 123456L, 2, 9999)
    val m = graft.functions.expressions.VideoMeta.parse(mp4)
    assert(m != null)
    assert(m.getUTF8String(0).toString === "isom")
    assert(m.getLong(1) === 30000L && m.getLong(2) === 123456L)
    assert(m.getLong(3) === 2L)
    // mdat body absent: structure already parsed (truncated sweeps)
    assert(graft.functions.expressions.VideoMeta.parse(
      mp4.take(16 + 8 + 108 + 16)) != null)
    assert(graft.functions.expressions.VideoMeta.parse(
      "nonsense".getBytes("US-ASCII")) == null)
    assert(graft.functions.expressions.VideoMeta.parse(
      mp4.take(20)) == null, "moov cut short")
    val viaQuery = Multimodal.multimodalVideo(spark, SfDir).collect()
    assert(viaQuery.nonEmpty)
    viaQuery.foreach { r =>
      assert(r.getAs[String]("brand") === "isom")
      val n = r.getAs[Long]("n_bytes") - 140L - 8L * r.getAs[Long]("n_tracks")
      assert(r.getAs[Long]("duration") === n * 7L)
      assert(r.getAs[Long]("timescale") === 1000L * (1L + n % 3L))
    }
  }

  test("byte_histogram matches a reference fold; empty is NULL") {
    val rnd = new scala.util.Random(11)
    val payloads = Seq(
      Array.fill(1000)(rnd.nextInt(256).toByte),
      Array[Byte](0, 0, 0, -1), // bins 0 and 63
      Array.empty[Byte])
    def ref(b: Array[Byte], bins: Int): Array[Double] = {
      val c = new Array[Double](bins)
      b.foreach(x => c((x & 0xff) / (256 / bins)) += 1.0)
      c.map(_ / b.length)
    }
    GraftFunctions.register(spark)
    val got = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload")
      .selectExpr("id", "byte_histogram(payload, 64) AS f")
      .collect().sortBy(_.getLong(0))
    assert(got(0).getSeq[Double](1) === ref(payloads(0), 64).toSeq)
    val f1 = got(1).getSeq[Double](1)
    assert(f1(0) === 0.75 && f1(63) === 0.25 &&
      f1.slice(1, 63).forall(_ === 0.0))
    assert(got(2).isNullAt(1), "empty payload has no feature")
    // frequencies always sum to 1 - the normalization invariant the
    // cosine composition relies on
    assert(math.abs(got(0).getSeq[Double](1).sum - 1.0) < 1e-12)
  }

  test("multimodal_features: self-consistent centroid cosine screen") {
    val got = Multimodal.multimodalFeatures(spark, SfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val cos = r.getAs[Double]("centroid_cos")
      assert(cos > 0.0 && cos <= 1.0,
        s"similar text payloads must score near the centroid, got $cos")
      assert(r.getAs[Double]("top_freq") > 0.0)
      val tb = r.getAs[Long]("top_bin")
      assert(tb >= 0L && tb < Multimodal.FeatureBins)
    }
  }
}
