package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal binary-column plumbing (SURVEY.md §2 #31): media
  * payloads ride through the engine as opaque `binary` columns with
  * typed metadata. The metadata decode is REAL since round 10: the
  * codegen [[graft.functions.expressions.ImageMeta]] kernel parses
  * PNG/JPEG container headers (magic bytes, dimension fields, channel
  * count) straight off the binary column inside the scan stage — no
  * image library, no stub formula.
  *
  * The test corpus has no media files, so payloads are FABRICATED
  * here — but fabricated as byte-valid containers: [[encodePayload]]
  * emits a spec-conformant PNG signature+IHDR (CRC included) or JPEG
  * SOI+APP0+SOF0 header with deterministic dimensions, followed by
  * the document text as the opaque body. The decode path never sees
  * the generator's arithmetic — everything it reports is read back
  * out of the bytes, and the DuckDB oracle recomputes the same fields
  * from the generator's closed form, so a parser that mis-read a
  * single field would hash-mismatch.
  */
object Multimodal {

  case class MediaIn(doc_id: Long, payload: Array[Byte])

  val ChunkBytes = 4096L

  /** PNG header bytes: signature + IHDR chunk (bit depth 8, color
    * type from the channel count, correct CRC-32 over type+data). */
  private[graft] def pngHeader(w: Int, h: Int, channels: Int): Array[Byte] = {
    val colorType = channels match {
      case 1 => 0 // grayscale
      case 2 => 4 // grayscale + alpha
      case 3 => 2 // truecolor
      case 4 => 6 // truecolor + alpha
      case c => throw new IllegalArgumentException(s"channels $c")
    }
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    out.putInt(13) // IHDR data length
    val typeAndData = java.nio.ByteBuffer.allocate(17)
    typeAndData.put("IHDR".getBytes("US-ASCII"))
    typeAndData.putInt(w).putInt(h)
    typeAndData.put(8.toByte).put(colorType.toByte) // bit depth, color
    typeAndData.put(0.toByte).put(0.toByte).put(0.toByte) // comp/filter/interlace
    out.put(typeAndData.array())
    val crc = new java.util.zip.CRC32
    crc.update(typeAndData.array())
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** JPEG header bytes: SOI + JFIF APP0 + a baseline SOF0 segment
    * carrying the dimensions and component count. */
  private[graft] def jpegHeader(w: Int, h: Int, channels: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(30 + 3 * channels)
    out.put(0xff.toByte).put(0xd8.toByte) // SOI
    out.put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0, len 16
    out.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    out.put(1.toByte).put(1.toByte) // version 1.1
    out.put(0.toByte) // density units: none
    out.putShort(1).putShort(1) // x/y density
    out.put(0.toByte).put(0.toByte) // no thumbnail
    out.put(0xff.toByte).put(0xc0.toByte) // SOF0 (baseline)
    out.putShort((8 + 3 * channels).toShort)
    out.put(8.toByte) // precision
    out.putShort(h.toShort).putShort(w.toShort)
    out.put(channels.toByte)
    for (c <- 1 to channels) { // id, 1×1 sampling, quant table 0
      out.put(c.toByte).put(0x11.toByte).put(0.toByte)
    }
    out.array()
  }

  /** Fabricate a container-valid payload for a document: even ids get
    * PNG, odd ids JPEG; dimensions/channels are a closed form of the
    * text byte length (so the DuckDB oracle can recompute them); the
    * text bytes ride behind the header as the opaque body. */
  private[graft] def encodePayload(docId: Long, text: Array[Byte]): Array[Byte] = {
    val n = text.length.toLong
    val w = (16 + n % 624).toInt
    val h = (16 + (n * 7) % 464).toInt
    val ch = (1 + n % 3).toInt
    val header =
      if (docId % 2 == 0) pngHeader(w, h, ch) else jpegHeader(w, h, ch)
    val out = new Array[Byte](header.length + text.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(text, 0, out, header.length, text.length)
    out
  }

  /** #48 Chunk/frame-sample plumbing: split each payload into fixed
    * 4 KiB chunks, one row per chunk — the fan-out shape of frame
    * sampling or tiled image decode, where a downstream decoder
    * consumes bounded pieces. The explode is bounded by payload size
    * and runs inside the scan stage (no shuffle). */
  def multimodalChunks(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
      // empty payloads have no chunks (and sequence(0,-1) would
      // count down); both engines drop them identically
      .filter(col("n_bytes") > 0L)
      .withColumn("n_chunks", ((col("n_bytes") + ChunkBytes - 1L) /
        lit(ChunkBytes)).cast("long"))
      .select(col("doc_id"), col("n_bytes"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        least(lit(ChunkBytes), col("n_bytes") - col("chunk_id") * ChunkBytes)
          .as("chunk_len"))
      .orderBy("doc_id", "chunk_id")

  private def imageMeta(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.expressions.ImageMeta(
        org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** #31/#104 Scan → binary payload → codegen header decode → typed
    * features. The fabrication step runs per-partition (mapPartitions
    * — SURVEY.md §4 preference (d) for genuinely imperative byte
    * assembly; in production this column arrives from storage and the
    * operator is just the decode projection). The decode itself is
    * the [[graft.functions.expressions.ImageMeta]] kernel reading
    * format/width/height/channels back out of the container bytes. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      // a null payload has nothing to encode or decode — mirror
      // multimodalChunks' null/empty policy
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions(_.map(m => MediaIn(m.doc_id,
        encodePayload(m.doc_id, m.payload))))
      .toDF()
      .select(col("doc_id"), imageMeta(col("payload")).as("meta"),
        length(col("payload")).cast("long").as("n_bytes"))
      .select(col("doc_id"),
        col("meta.format").as("format"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.channels").as("channels"),
        col("n_bytes"),
        ((col("n_bytes") + ChunkBytes - 1L) / lit(ChunkBytes)).cast("long")
          .as("n_chunks"))
      .orderBy("doc_id")
  }

  /** Canonical 44-byte PCM WAV header (RIFF little-endian): fmt
    * chunk with the given geometry + a data chunk DECLARING
    * `dataLen` body bytes. */
  private[graft] def wavHeader(rate: Int, channels: Int, bits: Int,
      dataLen: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1.toShort) // PCM
    bb.putShort(channels.toShort).putInt(rate)
    bb.putInt(rate * channels * bits / 8) // byte rate
    bb.putShort((channels * bits / 8).toShort) // block align
    bb.putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  /** WAV twin of [[encodePayload]]: closed-form geometry from the
    * text byte length (so the DuckDB oracle recomputes every field),
    * text bytes as the PCM body. */
  private[graft] def encodeWav(text: Array[Byte]): Array[Byte] = {
    val n = text.length
    val rate = 8000 + (n % 5) * 8000
    val ch = 1 + n % 2
    val header = wavHeader(rate, ch, 16, n)
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(text, 0, out, header.length, n)
    out
  }

  private def audioMeta(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.expressions.AudioMeta(
        org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** #114 Audio leg of the decode surface: scan → byte-valid WAV
    * payload → codegen RIFF/fmt/data header walk → typed audio
    * features (codec, geometry, frame count, duration). Same
    * contract as [[multimodalMeta]]: everything reported is read
    * back OUT OF THE BYTES, and the oracle recomputes the fields
    * from the generator's closed form — a parser mis-reading any
    * LE field hash-mismatches. */
  def multimodalAudio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions(_.map(m => MediaIn(m.doc_id, encodeWav(m.payload))))
      .toDF()
      .select(col("doc_id"), audioMeta(col("payload")).as("meta"),
        length(col("payload")).cast("long").as("n_bytes"))
      .select(col("doc_id"),
        col("meta.codec").as("codec"),
        col("meta.channels").as("channels"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.bits").as("bits"),
        col("meta.n_frames").as("n_frames"),
        (col("meta.n_frames") * 1000L / col("meta.sample_rate"))
          .cast("long").as("duration_ms"),
        col("n_bytes"))
      .orderBy("doc_id")
  }

  /** Minimal byte-valid ISO-BMFF header: 16-byte `ftyp` (isom), a
    * `moov` holding a FULL 108-byte version-0 `mvhd` (fields past
    * duration zeroed, as the spec's defaults allow) plus `nTracks`
    * empty `trak` boxes, then an `mdat` box declaring the body. */
  private[graft] def mp4Header(timescale: Int, duration: Long,
      nTracks: Int, dataLen: Int): Array[Byte] = {
    val moovSize = 8 + 108 + 8 * nTracks
    val bb = java.nio.ByteBuffer.allocate(16 + moovSize + 8)
    bb.putInt(16).put("ftyp".getBytes("US-ASCII"))
    bb.put("isom".getBytes("US-ASCII")).putInt(0)
    bb.putInt(moovSize).put("moov".getBytes("US-ASCII"))
    bb.putInt(108).put("mvhd".getBytes("US-ASCII"))
    bb.putInt(0) // version 0 + flags
    bb.putInt(0).putInt(0) // ctime, mtime
    bb.putInt(timescale).putInt(duration.toInt)
    bb.position(bb.position() + 80) // rate..next_track: zeroed defaults
    for (_ <- 1 to nTracks)
      bb.putInt(8).put("trak".getBytes("US-ASCII"))
    bb.putInt(8 + dataLen).put("mdat".getBytes("US-ASCII"))
    bb.array()
  }

  /** MP4 twin of [[encodeWav]]: closed-form geometry from the text
    * byte length, text bytes as the mdat body. */
  private[graft] def encodeMp4(text: Array[Byte]): Array[Byte] = {
    val n = text.length
    val header = mp4Header(1000 * (1 + n % 3), n.toLong * 7L,
      1 + n % 2, n)
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(text, 0, out, header.length, n)
    out
  }

  private def videoMeta(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.expressions.VideoMeta(
        org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** #115 Video leg of the decode surface: scan → byte-valid MP4
    * payload → codegen box walk (`ftyp` brand, `mvhd` timescale/
    * duration, `trak` count) → typed features. Same closed-form
    * oracle contract as the image/audio legs. */
  def multimodalVideo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions(_.map(m => MediaIn(m.doc_id, encodeMp4(m.payload))))
      .toDF()
      .select(col("doc_id"), videoMeta(col("payload")).as("meta"),
        length(col("payload")).cast("long").as("n_bytes"))
      .select(col("doc_id"),
        col("meta.brand").as("brand"),
        col("meta.timescale").as("timescale"),
        col("meta.duration").as("duration"),
        col("meta.n_tracks").as("n_tracks"),
        (col("meta.duration") * 1000L / col("meta.timescale"))
          .cast("long").as("duration_ms"),
        col("n_bytes"))
      .orderBy("doc_id")
  }

  /** Frames sampled per video by [[frameSample]]. */
  val FramesPerVideo = 5

  /** #172 Frame-sample scheduling: for each decoded video, the k
    * midpoint-uniform sample instants a frame-extraction stage would
    * decode — sample_ms_i = (2i+1)·duration_ms div 2k, pure integer
    * arithmetic over the REAL container decode (#115's codegen box
    * walk supplies duration/timescale; the pixel decode itself stays
    * stubbed per the brief — no codec libraries in the container).
    * This is the scheduling half of video ingestion: the plan fans
    * each video into k rows that downstream per-frame stages
    * (feature kernels #113, dedup) consume. Row-linear ×k. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    multimodalVideo(spark, dir)
      .select(col("doc_id"), col("duration_ms"))
      .select(col("doc_id"),
        posexplode(array((0 until FramesPerVideo)
          .map(i => lit(i.toLong)): _*)).as(Seq("pos", "frame_idx")),
        col("duration_ms"))
      .select(col("doc_id"), col("frame_idx"),
        expr(s"(2 * frame_idx + 1) * duration_ms div ${2 * FramesPerVideo}")
          .as("sample_ms"),
        col("duration_ms"))
      .orderBy("doc_id", "frame_idx")

  private def byteHistogram(c: org.apache.spark.sql.Column, bins: Int) =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.expressions.ByteHistogram(
        org.apache.spark.sql.GraftSqlBridge.expression(c), bins))

  val FeatureBins = 64

  /** #113 Feature extraction over binary payloads: the normalized
    * byte-histogram kernel turns every payload into a 64-dim dense
    * feature inside the scan stage — no codec, any format — and the
    * feature drops into the repo's vector machinery unchanged. Here
    * each payload is scored against the CORPUS CENTROID feature
    * (bin-wise mean — a bounded driver artifact like the k-means
    * codebooks): a content-outlier screen (corrupt/foreign payloads
    * score low) that composes the histogram kernel with the codegen
    * cosine. Output per doc: payload size, dominant bin + its mass,
    * centroid cosine. Deterministic; no SQL oracle (byte access over
    * blobs isn't SQL-expressible) → rows-only gate + kernel property
    * spec (ImageMetaSpec). */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions(_.map(m => MediaIn(m.doc_id,
        encodePayload(m.doc_id, m.payload))))
      .toDF()
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        byteHistogram(col("payload"), FeatureBins).as("f"))
    // bin-wise mean feature: |bins| cells from one aggregate — the
    // explode is bins-bounded per doc, combined map-side
    val centroid = feats
      .select(posexplode(col("f")).as(Seq("bin", "v")))
      .groupBy("bin").agg(avg(col("v")).as("m"))
      .orderBy("bin").collect().map(_.getDouble(1))
    feats
      .withColumn("top_bin",
        (expr("array_position(f, array_max(f))") - 1L).cast("long"))
      .withColumn("top_freq", round(array_max(col("f")), 6))
      .withColumn("centroid_cos",
        round(graft.functions.VectorFunctions.cosine(col("f"),
          array(centroid.map(lit(_)).toIndexedSeq: _*)), 6))
      .select("doc_id", "n_bytes", "top_bin", "top_freq", "centroid_cos")
      .orderBy("doc_id")
  }

  /** #113 portable twin: the same ByteHistogram→centroid→cosine
    * pipeline over the RAW text bytes (no fabricated container — its
    * PNG/JPEG headers embed a CRC32 no SQL oracle can recompute).
    * Dropping the header makes every byte SQL-reachable, so DuckDB
    * rebuilds the 64-bin histograms, the decimal-exact bin-mean
    * centroid (the [[graft.operators.Num.davg]] contract), and the
    * cosine — hash-verifying the feature kernel and the outlier
    * screen end-to-end. `multimodal_features` keeps the container
    * fabrication (rows-only + kernel property spec); this row is its
    * exactness gate, the round-11 portable-signature pattern. */
  def multimodalFeaturesText(spark: SparkSession, dir: String): DataFrame = {
    val feats = Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        byteHistogram(col("payload"), FeatureBins).as("f"))
      .filter(col("f").isNotNull) // empty payloads have no histogram
    val centroid = feats
      .select(posexplode(col("f")).as(Seq("bin", "v")))
      .groupBy("bin")
      .agg(graft.operators.Num.davg(col("v")).as("m"))
      .orderBy("bin").collect().map(_.getDouble(1))
    feats
      .withColumn("top_bin",
        (expr("array_position(f, array_max(f))") - 1L).cast("long"))
      .withColumn("top_freq", round(array_max(col("f")), 6))
      .withColumn("centroid_cos",
        round(graft.functions.VectorFunctions.cosine(col("f"),
          array(centroid.map(lit(_)).toIndexedSeq: _*)), 6))
      .select("doc_id", "n_bytes", "top_bin", "top_freq", "centroid_cos")
      .orderBy("doc_id")
  }
}
