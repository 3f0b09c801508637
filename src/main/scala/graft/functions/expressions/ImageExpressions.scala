package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Image container-header decode kernel (SURVEY.md §2 #31/#104): parse
  * the magic bytes + dimension fields of a PNG or JPEG payload held in
  * a `binary` column — format, width, height, channels — without any
  * image library, entirely inside whole-stage codegen. This replaces
  * the round-9 `decodeStub`: the metadata now comes from the BYTES,
  * not from a formula.
  *
  * What is parsed (both are public container specs):
  *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR
  *    chunk (must be first per the spec): 4-byte big-endian length
  *    (= 13), "IHDR", width u32 BE, height u32 BE, bit depth u8,
  *    color type u8. Channels from color type: 0 (gray) → 1,
  *    2 (truecolor) → 3, 3 (palette) → 1, 4 (gray+alpha) → 2,
  *    6 (truecolor+alpha) → 4.
  *  - JPEG: SOI `FF D8`, then marker segments `FF mm len(u16 BE)
  *    payload[len-2]` scanned in order; the first SOF marker
  *    (C0-CF except C4/C8/CC) carries precision u8, height u16 BE,
  *    width u16 BE, component count u8 (= channels). The scan stops
  *    at SOS (`FF DA`) — dimensions always precede entropy-coded
  *    data, so appended payload bytes are never touched.
  *
  * Unrecognized or truncated headers yield NULL (a scan over mixed
  * media must skip, not throw). At 100 TB this runs in the scan
  * stage — per-row cost is a bounded header walk, no allocation
  * beyond the 4-field result row. */
case class ImageMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ImageMeta.Schema
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case BinaryType => TypeCheckSuccess
      case t => TypeCheckFailure(
        s"image_meta requires binary, got ${t.simpleString}")
    }
  }

  override def nullSafeEval(b: Any): Any =
    ImageMeta.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val v = ctx.freshName("meta")
      s"""
         |InternalRow $v = graft.functions.expressions.ImageMeta.parse($b);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $v; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageMeta {
  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("channels", LongType, nullable = false)))

  private val Png = UTF8String.fromString("png")
  private val Jpeg = UTF8String.fromString("jpeg")

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** (format, width, height, channels) row, or null if the payload is
    * not a recognizable PNG/JPEG header. */
  def parse(b: Array[Byte]): InternalRow = {
    val png = parsePng(b)
    if (png != null) return png
    parseJpeg(b)
  }

  private def row(fmt: UTF8String, w: Long, h: Long, ch: Long): InternalRow =
    new GenericInternalRow(Array[Any](fmt, w, h, ch))

  private def parsePng(b: Array[Byte]): InternalRow = {
    // signature + IHDR length/type/width/height/bitdepth/colortype
    if (b.length < 8 + 4 + 4 + 4 + 4 + 2) return null
    if (u8(b, 0) != 0x89 || b(1) != 'P' || b(2) != 'N' || b(3) != 'G' ||
      u8(b, 4) != 0x0d || u8(b, 5) != 0x0a || u8(b, 6) != 0x1a ||
      u8(b, 7) != 0x0a) return null
    // IHDR must be the first chunk and carry exactly 13 data bytes
    if (u32(b, 8) != 13L || b(12) != 'I' || b(13) != 'H' ||
      b(14) != 'D' || b(15) != 'R') return null
    val w = u32(b, 16)
    val h = u32(b, 20)
    val colorType = u8(b, 25)
    val ch = colorType match {
      case 0 => 1L // grayscale
      case 2 => 3L // truecolor
      case 3 => 1L // palette-indexed (one index per pixel)
      case 4 => 2L // grayscale + alpha
      case 6 => 4L // truecolor + alpha
      case _ => return null
    }
    if (w <= 0L || h <= 0L) return null
    row(Png, w, h, ch)
  }

  private def parseJpeg(b: Array[Byte]): InternalRow = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return null
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return null // marker desync: not a JPEG stream
      var m = u8(b, i + 1)
      // fill bytes: any number of FFs may pad before the marker byte
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      // the fill loop may have advanced i to the tail: re-check that a
      // length field (i+2, i+3) is still in bounds before reading it
      if (i + 3 >= b.length) return null
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
        i += 2 // standalone markers carry no length field
      } else if (m == 0xd9 || m == 0xda) {
        return null // EOI/SOS before any SOF: no dimensions in stream
      } else {
        val len = u16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return null
        val isSof = m >= 0xc0 && m <= 0xcf &&
          m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          // len(2) precision(1) height(2) width(2) ncomp(1) + 3/comp
          if (len < 8) return null
          val h = u16(b, i + 5).toLong
          val w = u16(b, i + 7).toLong
          val ch = u8(b, i + 9).toLong
          if (w <= 0L || h <= 0L || ch < 1L || ch > 4L) return null
          return row(Jpeg, w, h, ch)
        }
        i += 2 + len
      }
    }
    null
  }
}

/** Content-feature extraction over a binary payload (SURVEY.md §2
  * #113): the normalized byte-value histogram — `bins` equal-width
  * buckets of the 0-255 range as an array<double> of frequencies.
  * This is the classic codec-free media feature (EXE/packing
  * detectors, format classifiers, near-dup binary screens all start
  * here): computable on ANY payload without decoding, stable under
  * container reordering, and it drops straight into the existing
  * vector machinery — [[CosineSim]], the LSH banders, the ANN ladder
  * — as a dense embedding. One pass over the bytes inside the scan
  * stage (codegen static call, no allocation beyond the output).
  * Empty payloads yield NULL (no mass to normalize). `bins` must
  * divide 256. */
case class ByteHistogram(child: Expression, bins: Int)
    extends UnaryExpression {
  require(bins > 0 && 256 % bins == 0, s"bins $bins must divide 256")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == BinaryType) TypeCheckSuccess
    else TypeCheckFailure(
      s"byte_histogram requires binary, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(b: Any): Any =
    ByteHistogram.compute(b.asInstanceOf[Array[Byte]], bins)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.expressions.ByteHistogram.compute(
       |  $c, $bins);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteHistogram {
  /** Frequencies of `bins` equal byte-value buckets; null for an
    * empty payload. */
  def compute(b: Array[Byte], bins: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    if (b.length == 0) return null
    val shift = Integer.numberOfTrailingZeros(256 / bins)
    val counts = new Array[Long](bins)
    var i = 0
    while (i < b.length) {
      counts((b(i) & 0xff) >>> shift) += 1L
      i += 1
    }
    val out = new Array[Double](bins)
    val n = b.length.toDouble
    i = 0
    while (i < bins) { out(i) = counts(i) / n; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Audio container-header decode kernel (SURVEY.md §2 #114): parse a
  * RIFF/WAVE payload's `fmt ` and `data` chunks — codec tag, channel
  * count, sample rate, bits per sample, and the frame count derived
  * from the data chunk's byte length — without an audio library,
  * entirely inside whole-stage codegen. The sibling of [[ImageMeta]]
  * for the audio leg of the multimodal surface.
  *
  * What is parsed (RIFF is a public container spec; all multi-byte
  * fields LITTLE-endian, unlike PNG/JPEG):
  *  - `RIFF` u32(riffSize) `WAVE`, then chunks `id[4] u32(len)
  *    payload[len]` walked in order;
  *  - `fmt `: audioFormat u16 (1 = PCM), channels u16, sampleRate
  *    u32, byteRate u32, blockAlign u16, bitsPerSample u16;
  *  - `data`: the sample bytes; frames = dataLen / (channels ×
  *    bits/8). The data PAYLOAD is never touched — only its declared
  *    length — so a truncated body (common in object-store sweeps)
  *    still yields metadata.
  *
  * Unrecognized or truncated headers yield NULL (scan-over-mixed-
  * media semantics, as [[ImageMeta]]). Per-row cost is a bounded
  * chunk walk in the scan stage. */
case class AudioMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = AudioMeta.Schema
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == BinaryType) TypeCheckSuccess
    else TypeCheckFailure(
      s"audio_meta requires binary, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(b: Any): Any =
    AudioMeta.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.expressions.AudioMeta.parse($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioMeta {
  val Schema: StructType = StructType(Seq(
    StructField("codec", LongType),
    StructField("channels", LongType),
    StructField("sample_rate", LongType),
    StructField("bits", LongType),
    StructField("n_frames", LongType)))

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (u16le(b, i).toLong) | (u16le(b, i + 2).toLong << 16)

  def parse(b: Array[Byte]): GenericInternalRow = {
    if (b.length < 12) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'))
      return null
    var codec = -1L; var ch = 0L; var rate = 0L; var bits = 0L
    var haveFmt = false
    var i = 12
    while (i + 8 <= b.length) {
      val len = u32le(b, i + 4)
      val payload = i + 8
      // a declared chunk length beyond the buffer is fine only for
      // the data chunk (whose body is optional); anything else is a
      // truncated/corrupt walk — and it must not wrap the cursor
      if (len > b.length.toLong &&
          !(b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
            b(i + 3) == 'a')) return null
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' &&
          b(i + 3) == ' ') {
        if (len < 16 || payload + 16 > b.length) return null
        codec = u16le(b, payload).toLong
        ch = u16le(b, payload + 2).toLong
        rate = u32le(b, payload + 4)
        bits = u16le(b, payload + 14).toLong
        haveFmt = true
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
          b(i + 3) == 'a') {
        // data's declared length is metadata; the body may be absent
        if (!haveFmt || ch < 1L || bits < 8L || bits % 8L != 0L)
          return null
        val frames = len / (ch * (bits / 8L))
        val r = new GenericInternalRow(5)
        r.update(0, codec); r.update(1, ch); r.update(2, rate)
        r.update(3, bits); r.update(4, frames)
        return r
      }
      // chunks are word-aligned: odd lengths carry a pad byte
      i = payload + len.toInt + (len.toInt & 1)
    }
    null
  }
}

/** Video container-header decode kernel (SURVEY.md §2 #115): parse an
  * ISO-BMFF (MP4) payload's box tree — `ftyp` major brand, `moov` →
  * `mvhd` timescale + duration (version 0 and 1 layouts), and the
  * `trak` count — completing the image/audio/video decode triple
  * next to [[ImageMeta]] and [[AudioMeta]]. Big-endian box sizes with
  * the spec's escapes honored: size 1 → 64-bit largesize, size 0 →
  * box extends to end of buffer. Media data (`mdat`) is never
  * touched — the walk reads structure, so a payload truncated after
  * `moov` still yields metadata. NULL on junk/truncated headers
  * (scan-over-mixed-media semantics). */
case class VideoMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = VideoMeta.Schema
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == BinaryType) TypeCheckSuccess
    else TypeCheckFailure(
      s"video_meta requires binary, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(b: Any): Any =
    VideoMeta.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.expressions.VideoMeta.parse($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VideoMeta {
  val Schema: StructType = StructType(Seq(
    StructField("brand", StringType),
    StructField("timescale", LongType),
    StructField("duration", LongType),
    StructField("n_tracks", LongType)))

  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u64be(b: Array[Byte], i: Int): Long =
    (u32be(b, i) << 32) | u32be(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  /** The [payloadStart, payloadEnd) of the box at `i`, or null if the
    * header is malformed/truncated. end may be clamped to b.length
    * only for size-0 (to-EOF) boxes; a declared size overrunning the
    * buffer is accepted solely so a truncated trailing box (mdat)
    * does not void the walk — the STRUCTURAL boxes parsed here must
    * be complete or the field reads below return null anyway. */
  private def boxBounds(b: Array[Byte], i: Int): (Int, Long) = {
    if (i + 8 > b.length) return null
    val size = u32be(b, i)
    if (size == 1L) {
      if (i + 16 > b.length) return null
      (i + 16, i + u64be(b, i + 8))
    } else if (size == 0L) (i + 8, b.length.toLong)
    else (i + 8, i + size)
  }

  def parse(b: Array[Byte]): GenericInternalRow = {
    if (b.length < 12) return null
    // first box must be ftyp per the spec
    val first = boxBounds(b, 0)
    if (first == null || !fourcc(b, 4, "ftyp")) return null
    if (first._1 + 4 > b.length) return null
    val brand = new String(b, first._1, 4, "US-ASCII")
    var i = 0
    while (i + 8 <= b.length) {
      val bounds = boxBounds(b, i)
      if (bounds == null) return null
      val (payload, end) = bounds
      if (end <= i) return null // malformed size: no progress
      if (fourcc(b, i + 4, "moov")) {
        // walk moov children for mvhd + trak
        var timescale = -1L; var duration = -1L; var tracks = 0L
        var j = payload
        val moovEnd = math.min(end, b.length.toLong)
        while (j + 8 <= moovEnd) {
          val cb = boxBounds(b, j)
          if (cb == null) return null
          val (cp, ce) = cb
          if (ce <= j || ce > moovEnd) return null
          if (fourcc(b, j + 4, "mvhd")) {
            if (cp + 4 > b.length) return null
            val version = b(cp) & 0xff
            if (version == 1) {
              // v1: ctime u64, mtime u64, timescale u32, duration u64
              if (cp + 32 > b.length) return null
              timescale = u32be(b, cp + 20)
              duration = u64be(b, cp + 24)
            } else {
              // v0: ctime u32, mtime u32, timescale u32, duration u32
              if (cp + 20 > b.length) return null
              timescale = u32be(b, cp + 12)
              duration = u32be(b, cp + 16)
            }
          } else if (fourcc(b, j + 4, "trak")) tracks += 1L
          j = ce.toInt
        }
        if (timescale <= 0L || duration < 0L) return null
        val r = new GenericInternalRow(4)
        r.update(0, UTF8String.fromString(brand))
        r.update(1, timescale); r.update(2, duration); r.update(3, tracks)
        return r
      }
      i = if (end > b.length.toLong) b.length else end.toInt
    }
    null
  }
}
