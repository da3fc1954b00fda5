package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json north star): image/audio/video
  * as opaque `binary` columns plus typed metadata, flowing through typed
  * `Dataset.mapPartitions` stages (the Scala analogue of arrow-batched
  * decode UDFs).
  *
  * The formats a real corpus contains decode FOR REAL, pure JDK:
  * uncompressed BMP at 8/24/32 bpp ([[decodeBmp]] — a from-scratch
  * parser handling bottom-up/top-down rows, 4-byte padding, and
  * palettes, with [[encodeBmp]] as its spec-compliant encoder twin),
  * PNG/JPEG/GIF via the JRE's bundled ImageIO readers ([[decodePng]] /
  * [[decodeJpeg]] / [[decodeGif]], closed-form-oracled for lossless PNG
  * in q88), RIFF/WAVE PCM audio ([[decodeWav]] — a from-scratch
  * chunk-walking container parser, closed-form-oracled in q90; PCM
  * needs no codec), and MP4/ISO-BMFF video containers ([[decodeMp4]] —
  * a from-scratch box walker extracting brand, timescale/duration,
  * track handlers, and video dimensions, closed-form-oracled in q98).
  * Only genuinely codec-bound SAMPLE decoding (H.264/AAC/MP3 payloads —
  * the JDK ships no codec) stays behind `decodeStub`, a deterministic
  * fake that derives "features" from the bytes alone; everything around
  * it (schemas, partitioning, batch iteration, feature layout) is real
  * and tested, so further real decoders drop in the way the image,
  * WAV, and MP4 ones did.
  *
  * Scale notes: decode is per-row/per-partition — embarrassingly parallel,
  * no shuffle. Large blobs should be read via `binaryFile` with
  * `spark.sql.files.maxPartitionBytes` sized so a partition of blobs fits
  * executor memory; frame-sampling keeps per-row output bounded.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      // fake decode output: fixed-length feature vector + "dimensions"
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  /** STUB decode: deterministic pseudo-features from raw bytes — stands in
    * for pillow/ffmpeg-style decoding, which is unavailable offline. A real
    * implementation replaces only this function.
    */
  def decodeStub(row: MediaRow, featDim: Int = 16): MediaFeatures = {
    val bytes = if (row.payload == null) Array.emptyByteArray else row.payload
    val len = bytes.length
    // fake "image dimensions": derived from length, deterministic
    val width = 64 + (len % 512)
    val height = 64 + ((len / 7) % 512)
    val nFrames = if (row.kind == "video") 1 + (len % 30) else 1
    val feats = new Array[Float](featDim)
    var i = 0
    while (i < len) {
      feats(i % featDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    var j = 0
    while (j < featDim) { feats(j) = feats(j) / math.max(1, len).toFloat; j += 1 }
    MediaFeatures(row.media_id, row.kind, len.toLong, width, height, nFrames, feats)
  }

  /** The fixture set ships no media table, so media rows are derived from
    * `documents` (text bytes as the opaque payload) — exercising the same
    * binary-column plumbing a real corpus would use.
    */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Batched decode stage: one decode call per row, iterated per partition
    * (codec/context init would amortize per-partition here).
    */
  def decodeFeatures(media: Dataset[MediaRow], featDim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => decodeStub(r, featDim)))
  }

  /** Frame-sampling for "video" rows: every strideBytes-th byte starts a
    * fake frame; emits (media_id, frame_no, frame_hash). Real pipelines
    * sample frames the same shape — 1 row in, N bounded rows out.
    */
  def sampleFrames(media: Dataset[MediaRow], maxFrames: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val n = math.min(maxFrames, math.max(1, r.payload.length / 64))
      (0 until n).map { f =>
        val start = f * (r.payload.length / math.max(1, n))
        val end = math.min(r.payload.length, start + 64)
        val slice = java.util.Arrays.copyOfRange(r.payload, start, end)
        (r.media_id, f, java.util.Arrays.hashCode(slice).toLong)
      }
    }.toDF("media_id", "frame_no", "frame_hash")
  }

  /** Fake "resize": deterministic byte-stride downsample of the payload to
    * at most `targetBytes` bytes (stands in for image resizing — same
    * 1-row-in/1-smaller-row-out shape and bounded-output contract a real
    * resampler has).
    */
  def resize(media: Dataset[MediaRow], targetBytes: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val n = if (r.payload == null) 0 else r.payload.length
      if (n <= targetBytes) r
      else {
        val stride = math.max(1, n / targetBytes)
        val out = Array.ofDim[Byte]((n + stride - 1) / stride)
        var i = 0
        var j = 0
        while (i < n && j < out.length) { out(j) = r.payload(i); i += stride; j += 1 }
        r.copy(payload = out)
      }
    })
  }

  // -------------------------------------------------- real BMP decode

  final case class BmpImage(width: Int, height: Int, pixelSum: Long)
  final case class ImageFeatures(
      media_id: Long, width: Int, height: Int, pixel_sum: Long, px_mean: Double)

  /** Decoded raster: 0xRRGGBB-packed pixels, row-major, top-down. */
  final case class RgbImage(width: Int, height: Int, pixels: Array[Int]) {
    def pixelSum: Long = {
      var s = 0L
      var i = 0
      while (i < pixels.length) {
        val p = pixels(i)
        s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        i += 1
      }
      s
    }
  }

  /** Bilinear resample to (dstW, dstH) with half-pixel-center source
    * mapping and edge clamp (`sx = (dx+0.5)·srcW/dstW − 0.5`, the
    * convention of the mainstream image/tensor libraries' default
    * `align_corners=false`), each channel rounded half-up to the
    * nearest byte — THE multimodal-training preprocessing step, on
    * decoded pixels (the byte-stride [[resize]] stands in only where
    * payloads stay undecoded). Per row, zero shuffle.
    */
  def bilinearResize(img: RgbImage, dstW: Int, dstH: Int): RgbImage = {
    require(dstW > 0 && dstH > 0, s"bad target: ${dstW}x$dstH")
    val w = img.width; val h = img.height
    val out = new Array[Int](dstW * dstH)
    var dy = 0
    while (dy < dstH) {
      val sy = (dy + 0.5) * h / dstH - 0.5
      val syc = math.max(0.0, math.min(h - 1.0, sy))
      val y0 = syc.toInt
      val y1 = math.min(h - 1, y0 + 1)
      val fy = syc - y0
      var dx = 0
      while (dx < dstW) {
        val sx = (dx + 0.5) * w / dstW - 0.5
        val sxc = math.max(0.0, math.min(w - 1.0, sx))
        val x0 = sxc.toInt
        val x1 = math.min(w - 1, x0 + 1)
        val fx = sxc - x0
        val p00 = img.pixels(y0 * w + x0); val p10 = img.pixels(y0 * w + x1)
        val p01 = img.pixels(y1 * w + x0); val p11 = img.pixels(y1 * w + x1)
        var packed = 0
        var shift = 16
        while (shift >= 0) {
          val v = (1 - fx) * (1 - fy) * ((p00 >> shift) & 0xff) +
            fx * (1 - fy) * ((p10 >> shift) & 0xff) +
            (1 - fx) * fy * ((p01 >> shift) & 0xff) +
            fx * fy * ((p11 >> shift) & 0xff)
          packed |= math.floor(v + 0.5).toInt << shift
          shift -= 8
        }
        out(dy * dstW + dx) = packed
        dx += 1
      }
      dy += 1
    }
    RgbImage(dstW, dstH, out)
  }

  /** Center crop to (cw, ch): offsets floor((dim − crop)/2), the
    * torchvision/PIL convention. Requires crop ≤ image on both axes. */
  def centerCrop(img: RgbImage, cw: Int, ch: Int): RgbImage = {
    require(cw > 0 && ch > 0 && cw <= img.width && ch <= img.height,
      s"bad crop ${cw}x$ch for ${img.width}x${img.height}")
    val x0 = (img.width - cw) / 2
    val y0 = (img.height - ch) / 2
    val out = new Array[Int](cw * ch)
    var y = 0
    while (y < ch) {
      var x = 0
      while (x < cw) {
        out(y * cw + x) = img.pixels((y0 + y) * img.width + (x0 + x))
        x += 1
      }
      y += 1
    }
    RgbImage(cw, ch, out)
  }

  /** Batched decode → bilinear resize → center-crop: the standard
    * image-preprocessing stage over a media column. Undecodable
    * payloads drop (the shared decoder error contract); everything is
    * per-row mapPartitions, zero shuffle.
    */
  def preprocessImages(media: Dataset[MediaRow], dstW: Int, dstH: Int,
      cropW: Int, cropH: Int): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      decodeBmpRgb(r.payload).map { img =>
        val cropped = centerCrop(bilinearResize(img, dstW, dstH),
          cropW, cropH)
        val s = cropped.pixelSum
        ImageFeatures(r.media_id, cropped.width, cropped.height, s,
          s.toDouble / (3.0 * cropped.width * cropped.height))
      }
    })
  }

  /** Encode an uncompressed 24bpp BMP (BITMAPFILEHEADER + 40-byte
    * BITMAPINFOHEADER, bottom-up rows, rows padded to 4 bytes) — the
    * encoder twin of [[decodeBmp]]. `pixel(x, y)` returns (r, g, b) with
    * (0, 0) the TOP-left corner (rows are written bottom-up as the
    * positive-height BMP layout requires).
    */
  def encodeBmp(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = (width * 3 + 3) / 4 * 4
    val dataSize = stride * height
    val fileSize = 54 + dataSize
    val out = new Array[Byte](fileSize)
    def i32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    i32(2, fileSize); i32(10, 54) // pixel data offset
    i32(14, 40) // BITMAPINFOHEADER
    i32(18, width); i32(22, height)
    out(26) = 1 // planes
    out(28) = 24 // bpp
    i32(30, 0) // BI_RGB (uncompressed)
    i32(34, dataSize)
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * stride // bottom-up
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        val p = rowOff + x * 3
        out(p) = (b & 0xff).toByte // BGR order
        out(p + 1) = (g & 0xff).toByte
        out(p + 2) = (r & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL decode of an uncompressed BMP at the three common bit depths
    * — 24bpp BGR, 32bpp BGRA, and 8bpp palettized: validates the `BM`
    * signature, reads dimensions from the DIB header (negative height =
    * top-down rows, per the spec), resolves the palette for 8bpp, walks
    * the padded pixel rows, and returns the dimensions plus the
    * checksum of all decoded R+G+B channel bytes (alpha is not color —
    * a 32bpp image checksums identically to its 24bpp twin; a
    * palettized image checksums its palette-EXPANDED pixels, so the
    * same picture gives the same checksum at any supported depth).
    * Returns None for anything else (wrong magic, truncated,
    * compressed, other depths) — the error contract PdfText set
    * (malformed input yields an empty result, never an exception).
    */
  def decodeBmp(bytes: Array[Byte]): Option[BmpImage] =
    decodeBmpRgb(bytes).map(img =>
      BmpImage(img.width, img.height, img.pixelSum))

  /** Full-pixel BMP decode (the parse behind [[decodeBmp]]): top-down
    * row-major 0xRRGGBB pixels regardless of the file's row order,
    * palette entries expanded, alpha dropped. Same coverage and
    * error→None contract as [[decodeBmp]].
    */
  def decodeBmpRgb(bytes: Array[Byte]): Option[RgbImage] = {
    def i32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def i16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    try {
      if (bytes == null || bytes.length < 54) return None
      if (bytes(0) != 'B' || bytes(1) != 'M') return None
      val dataOff = i32(10)
      val dibSize = i32(14)
      if (dibSize < 40) return None // pre-BITMAPINFOHEADER cores unsupported
      val width = i32(18)
      val rawHeight = i32(22)
      val height = math.abs(rawHeight)
      if (width <= 0 || height == 0) return None
      val bpp = i16(28)
      if (i16(26) != 1) return None
      if (bpp != 8 && bpp != 24 && bpp != 32) return None
      if (i32(30) != 0) return None // BI_RGB only
      val bytesPerPx = bpp / 8
      val stride = (width * bytesPerPx + 3) / 4 * 4
      // 8bpp: BGRX palette sits between the DIB header and the pixels;
      // biClrUsed (offset 46) of 0 means the full 256 entries
      val palette: Array[Int] = if (bpp == 8) {
        val clrUsed = i32(46)
        val n = if (clrUsed == 0) 256 else clrUsed
        val palOff = 14 + dibSize
        if (n <= 0 || n > 256 || palOff + 4 * n > bytes.length) return None
        Array.tabulate(n) { i =>
          val o = palOff + 4 * i // B, G, R, X
          ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) |
            (bytes(o) & 0xff)
        }
      } else null
      if (dataOff < 54 || dataOff.toLong + stride.toLong * height > bytes.length)
        return None
      val px = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        // emit top-down regardless of the file's bottom-up default
        val srcRow = if (rawHeight > 0) height - 1 - y else y
        val rowOff = dataOff + srcRow * stride
        var x = 0
        while (x < width) {
          val p = rowOff + x * bytesPerPx
          px(y * width + x) =
            if (bpp == 8) {
              val idx = bytes(p) & 0xff
              if (idx >= palette.length) return None
              palette(idx)
            } else // BGR (24) or BGRA (32): first three bytes are color
              ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 1) & 0xff) << 8) |
                (bytes(p) & 0xff)
          x += 1
        }
        y += 1
      }
      Some(RgbImage(width, height, px))
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** Batched REAL image decode: parses each payload as BMP and emits
    * dimensions + pixel checksum + per-channel-byte mean. Rows whose
    * payload is not a decodable 24bpp BMP are dropped (same stage shape
    * as a real corpus where undecodable blobs are filtered to a
    * quarantine path).
    */
  def decodeBmpImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      decodeBmp(r.payload).map(img =>
        ImageFeatures(r.media_id, img.width, img.height, img.pixelSum,
          img.pixelSum.toDouble / (3.0 * img.width * img.height)))
    })
  }

  // ------------------------------------------------ real WAV decode

  final case class WavAudio(
      channels: Int, sampleRate: Int, bitsPerSample: Int,
      nSamples: Long, // per channel
      sampleSum: Long, // sum of all raw PCM sample values (all channels)
      peak: Int) // max |sample|

  /** REAL audio decode for RIFF/WAVE PCM — a from-scratch container
    * parser (no codec needed: PCM samples are the payload), covering
    * 8-bit unsigned and 16-bit signed little-endian, the formats
    * synthetic/telephony corpora actually hold. Walks the chunk list
    * (fmt → data, tolerating extra chunks like LIST), validates
    * format tag 1 (PCM), and folds the samples into
    * (count, sum, peak) — the audio analogue of the image decoders'
    * pixel checksum, closed-form oracle-able for generated waveforms.
    * 8-bit samples are re-centered to signed (−128…127) so the sum is
    * depth-comparable. Malformed/truncated/compressed input → None
    * (the shared decoder error contract).
    */
  def decodeWav(bytes: Array[Byte]): Option[WavAudio] = {
    def i32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def i16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def tag(off: Int, t: String): Boolean =
      off + 4 <= bytes.length && (0 until 4).forall(i =>
        bytes(off + i) == t.charAt(i).toByte)
    try {
      if (bytes == null || bytes.length < 44) return None
      if (!tag(0, "RIFF") || !tag(8, "WAVE")) return None
      var pos = 12
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var data: Option[(Int, Int)] = None // (offset, len)
      while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
        val size = i32(pos + 4)
        if (size < 0 || pos + 8 + size > bytes.length) return None
        if (tag(pos, "fmt ")) {
          if (size < 16) return None
          if (i16(pos + 8) != 1) return None // PCM only — no codecs ship
          fmt = Some((i16(pos + 10), i32(pos + 12), i16(pos + 22)))
        } else if (tag(pos, "data")) {
          data = Some((pos + 8, size))
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      for {
        (channels, rate, bits) <- fmt
        (dOff, dLen) <- data
        if channels >= 1 && channels <= 16 && rate > 0
        if bits == 8 || bits == 16
      } yield {
        val bytesPerSample = bits / 8
        val frame = channels * bytesPerSample
        val nFrames = dLen / frame
        var sum = 0L
        var peak = 0
        var i = dOff
        val end = dOff + nFrames * frame
        while (i < end) {
          val v =
            if (bits == 8) (bytes(i) & 0xff) - 128
            else i16(i).toShort.toInt
          sum += v
          val a = math.abs(v)
          if (a > peak) peak = a
          i += bytesPerSample
        }
        WavAudio(channels, rate, bits, nFrames.toLong, sum, peak)
      }
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** Encoder twin of [[decodeWav]]: 16-bit signed little-endian PCM,
    * `sample(frame, channel)` in −32768…32767.
    */
  def encodeWav(channels: Int, sampleRate: Int, nFrames: Int,
      sample: (Int, Int) => Int): Array[Byte] = {
    require(channels >= 1 && nFrames >= 0, s"bad wav shape")
    val dataLen = nFrames * channels * 2
    val out = new Array[Byte](44 + dataLen)
    def put(off: Int, s: String): Unit =
      (0 until s.length).foreach(i => out(off + i) = s.charAt(i).toByte)
    def i32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def i16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    put(0, "RIFF"); i32(4, 36 + dataLen); put(8, "WAVE")
    put(12, "fmt "); i32(16, 16); i16(20, 1); i16(22, channels)
    i32(24, sampleRate); i32(28, sampleRate * channels * 2)
    i16(32, channels * 2); i16(34, 16)
    put(36, "data"); i32(40, dataLen)
    var f = 0
    var p = 44
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        i16(p, sample(f, c) & 0xffff)
        p += 2
        c += 1
      }
      f += 1
    }
    out
  }

  final case class AudioFeatures(
      media_id: Long, channels: Int, sample_rate: Int, n_samples: Long,
      sample_sum: Long, peak: Int, duration_sec: Double)

  /** Batched REAL WAV decode — the audio twin of [[decodeBmpImages]];
    * undecodable rows are dropped (quarantine-path semantics).
    */
  def decodeWavAudio(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      decodeWav(r.payload).map(a =>
        AudioFeatures(r.media_id, a.channels, a.sampleRate, a.nSamples,
          a.sampleSum, a.peak,
          a.nSamples.toDouble / a.sampleRate))
    })
  }

  // ----------------------------------------- real MP4 container parse

  final case class Mp4Meta(
      brand: String, timescale: Int, durationUnits: Long,
      nTracks: Int, nVideo: Int, nAudio: Int,
      width: Int, height: Int) // first video track, 16.16 fixed → int

  /** REAL video-container parse for MP4/ISO BMFF (ISO/IEC 14496-12) —
    * a from-scratch box walker: `ftyp` brand, `moov/mvhd` timescale +
    * duration, per-`trak` handler types (`mdia/hdlr`: vide/soun) and
    * the first video track's `tkhd` width/height (16.16 fixed-point).
    * This is the container METADATA level — everything a corpus
    * pipeline needs for routing/stats/sampling decisions — decoded for
    * real; SAMPLE decode (H.264/AAC payloads inside `mdat`) is
    * codec-bound and stays behind [[decodeStub]], the one genuinely
    * codec-less boundary left.
    *
    * Box walk: [size:4BE][type:4]; size==1 → 64-bit largesize follows,
    * size==0 → box extends to EOF (both per §4.2). Unknown boxes are
    * skipped by size. Malformed/truncated/overrunning sizes → None
    * (the shared decoder error contract).
    */
  def decodeMp4(bytes: Array[Byte]): Option[Mp4Meta] = {
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def typ(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // walk the boxes in [from, to); call f(type, payloadStart,
    // payloadEnd). A malformed box ANYWHERE (truncated header,
    // overrunning size) poisons the whole parse via `malformed` —
    // nested walks inherit the strict error contract.
    var malformed = false
    def walk(from: Int, to: Int)(f: (String, Int, Int) => Unit): Unit = {
      var pos = from
      while (pos < to && !malformed) {
        if (pos + 8 > to) { malformed = true; return }
        val size0 = u32(pos)
        val t = typ(pos + 4)
        val (payload, end) =
          if (size0 == 0L) (pos + 8, to) // to end of enclosing box
          else if (size0 == 1L) {
            if (pos + 16 > to) { malformed = true; return }
            val ls = u64(pos + 8)
            if (ls < 16 || pos + ls > to) { malformed = true; return }
            (pos + 16, pos + ls.toInt)
          } else {
            if (size0 < 8 || pos + size0 > to) { malformed = true; return }
            (pos + 8, pos + size0.toInt)
          }
        f(t, payload, end)
        pos = end
      }
    }
    try {
      if (bytes == null || bytes.length < 16) return None
      if (typ(4) != "ftyp") return None
      var brand: String = null
      var timescale = 0
      var duration = 0L
      var nTracks, nVideo, nAudio = 0
      var w, h = 0
      var sawMoov = false
      walk(0, bytes.length) { (t, p, e) =>
        t match {
          case "ftyp" if brand == null && e - p >= 4 => brand = typ(p)
          case "moov" =>
            sawMoov = true
            walk(p, e) { (ct, cp, ce) =>
              ct match {
                case "mvhd" if ce - cp >= 4 =>
                  val v = bytes(cp) & 0xff
                  if (v == 1 && ce - cp >= 28) {
                    timescale = u32(cp + 20).toInt; duration = u64(cp + 24)
                  } else if (v == 0 && ce - cp >= 20) {
                    timescale = u32(cp + 12).toInt; duration = u32(cp + 16)
                  }
                case "trak" =>
                  nTracks += 1
                  var isVideo, isAudio = false
                  var tw, th = 0
                  walk(cp, ce) { (tt, tp, te) =>
                    tt match {
                      case "tkhd" if te - tp >= 84 && (bytes(tp) & 0xff) == 0 =>
                        // v0 payload: vf(4) ctime(4) mtime(4) id(4) res(4)
                        // dur(4) res(8) layer(2) alt(2) vol(2) res(2)
                        // matrix(36) width(4) height(4) — 16.16 fixed
                        tw = (u32(tp + 76) >> 16).toInt
                        th = (u32(tp + 80) >> 16).toInt
                      case "mdia" =>
                        walk(tp, te) { (mt, mp, me) =>
                          if (mt == "hdlr" && me - mp >= 12) {
                            typ(mp + 8) match {
                              case "vide" => isVideo = true
                              case "soun" => isAudio = true
                              case _ => ()
                            }
                          }
                        }
                      case _ => ()
                    }
                  }
                  if (isVideo) {
                    nVideo += 1
                    if (w == 0 && h == 0) { w = tw; h = th }
                  }
                  if (isAudio) nAudio += 1
                case _ => ()
              }
            }
          case _ => ()
        }
      }
      if (malformed || brand == null || !sawMoov || timescale <= 0) None
      else Some(Mp4Meta(brand, timescale, duration, nTracks, nVideo,
        nAudio, w, h))
    } catch { case _: RuntimeException => None }
  }

  /** Encoder twin of [[decodeMp4]]: minimal well-formed ISO BMFF —
    * `ftyp` + `moov(mvhd + trak(tkhd + mdia(mdhd + hdlr))...)` +
    * empty `mdat`, all version-0 boxes. `tracks` = (handler fourcc
    * "vide"|"soun", width, height).
    */
  def encodeMp4(brand: String, timescale: Int, durationUnits: Long,
      tracks: Seq[(String, Int, Int)]): Array[Byte] = {
    require(brand.length == 4 && timescale > 0, "bad mp4 shape")
    val bb = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + payload.length)
      System.arraycopy(u32(out.length.toLong), 0, out, 0, 4)
      System.arraycopy(t.getBytes("US-ASCII"), 0, out, 4, 4)
      System.arraycopy(payload, 0, out, 8, payload.length)
      out
    }
    val mvhd = box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++
      u32(timescale.toLong) ++ u32(durationUnits) ++
      u32(0x00010000L) ++ Array.fill[Byte](12)(0) ++ // rate, vol+reserved
      (u32(0x00010000L) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0x00010000L) ++
        u32(0) ++ u32(0) ++ u32(0) ++ u32(0x40000000L)) ++ // unity matrix
      Array.fill[Byte](24)(0) ++ u32(tracks.length + 1L))
    val traks = tracks.zipWithIndex.map { case ((handler, tw, th), i) =>
      val tkhd = box("tkhd", u32(7) ++ u32(0) ++ u32(0) ++ // vf(enabled)
        u32(i + 1L) ++ u32(0) ++ u32(durationUnits) ++
        Array.fill[Byte](16)(0) ++ // res(8) layer alt vol res
        (u32(0x00010000L) ++ u32(0) ++ u32(0) ++ u32(0) ++
          u32(0x00010000L) ++ u32(0) ++ u32(0) ++ u32(0) ++
          u32(0x40000000L)) ++
        u32(tw.toLong << 16) ++ u32(th.toLong << 16))
      val mdhd = box("mdhd", u32(0) ++ u32(0) ++ u32(0) ++
        u32(timescale.toLong) ++ u32(durationUnits) ++
        Array[Byte](0x55, (0xc4 & 0xff).toByte, 0, 0)) // lang "und"
      val hdlr = box("hdlr", u32(0) ++ u32(0) ++
        handler.getBytes("US-ASCII") ++ Array.fill[Byte](12)(0) ++
        Array[Byte](0)) // empty name
      box("trak", tkhd ++ box("mdia", mdhd ++ hdlr))
    }
    bb.write(box("ftyp", brand.getBytes("US-ASCII") ++ u32(0) ++
      brand.getBytes("US-ASCII")))
    bb.write(box("moov", mvhd ++ traks.foldLeft(Array.emptyByteArray)(_ ++ _)))
    bb.write(box("mdat", Array.emptyByteArray))
    bb.toByteArray
  }

  final case class VideoMeta(
      media_id: Long, brand: String, timescale: Int, n_tracks: Int,
      n_video: Int, n_audio: Int, width: Int, height: Int,
      duration_ms: Long)

  /** Batched REAL MP4 container parse — the video twin of
    * [[decodeWavAudio]]; undecodable rows are dropped.
    */
  def decodeMp4Meta(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      decodeMp4(r.payload).map(m =>
        VideoMeta(r.media_id, m.brand, m.timescale, m.nTracks, m.nVideo,
          m.nAudio, m.width, m.height,
          m.durationUnits * 1000L / m.timescale))
    })
  }

  // ------------------------------------------- JDK ImageIO decoders

  /** PNG signature (8 bytes) — checked before handing bytes to ImageIO
    * so [[decodePng]] is format-STRICT: a JPEG payload returns None
    * rather than silently decoding as the wrong format.
    */
  private def isPng(b: Array[Byte]): Boolean =
    b != null && b.length > 8 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a

  /** JPEG SOI marker. */
  private def isJpeg(b: Array[Byte]): Boolean =
    b != null && b.length > 3 &&
      (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff

  /** Shared JDK decode core: ImageIO (pure JDK, offline — the readers
    * for PNG/JPEG/GIF/BMP ship in every JRE) → (width, height, sum of
    * R+G+B channel bytes), the same contract as [[decodeBmp]]. Malformed
    * or unreadable input → None, never an exception (the PdfText error
    * contract). Per-row work, no shuffle — the decode stage a real
    * multimodal corpus runs, now real for the formats such a corpus
    * actually contains.
    */
  private def decodeJdk(bytes: Array[Byte]): Option[BmpImage] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y) // sRGB, alpha ignored (not color)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some(BmpImage(w, h, sum))
      }
    } catch { case _: Exception => None }

  /** REAL PNG decode (JDK ImageIO): dimensions + R+G+B checksum;
    * non-PNG or malformed input → None. Lossless, so a generated ramp
    * image checksums in closed form — q88 oracles exactly that.
    */
  def decodePng(bytes: Array[Byte]): Option[BmpImage] =
    if (isPng(bytes)) decodeJdk(bytes) else None

  /** REAL JPEG decode (JDK ImageIO): dimensions + R+G+B checksum;
    * non-JPEG or malformed input → None. JPEG is LOSSY — dimensions are
    * exact but the checksum is the decoded (approximate) pixels', so it
    * is spec-tested for closeness, not closed-form oracled like PNG.
    */
  def decodeJpeg(bytes: Array[Byte]): Option[BmpImage] =
    if (isJpeg(bytes)) decodeJdk(bytes) else None

  /** GIF87a/GIF89a signature. */
  private def isGif(b: Array[Byte]): Boolean =
    b != null && b.length > 6 &&
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** REAL GIF decode (JDK ImageIO, first frame): dimensions + R+G+B
    * checksum; non-GIF or malformed input → None. Palette-lossless like
    * PNG for images that fit 256 colors.
    */
  def decodeGif(bytes: Array[Byte]): Option[BmpImage] =
    if (isGif(bytes)) decodeJdk(bytes) else None

  /** Encoder twin of [[decodePng]] (JDK ImageIO writer): `pixel(x, y)`
    * → (r, g, b), (0, 0) top-left. Lossless round-trip with decodePng.
    */
  def encodePng(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encoder twin of [[decodeJpeg]] (JDK ImageIO writer, default
    * quality). Lossy — for spec fixtures, not oracles.
    */
  def encodeJpeg(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Batched REAL PNG decode — [[decodeBmpImages]]'s shape for PNG
    * payloads; undecodable rows are dropped (quarantine-path semantics).
    */
  def decodePngImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      decodePng(r.payload).map(img =>
        ImageFeatures(r.media_id, img.width, img.height, img.pixelSum,
          img.pixelSum.toDouble / (3.0 * img.width * img.height)))
    })
  }

  /** Batched REAL JPEG decode. */
  def decodeJpegImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      decodeJpeg(r.payload).map(img =>
        ImageFeatures(r.media_id, img.width, img.height, img.pixelSum,
          img.pixelSum.toDouble / (3.0 * img.width * img.height)))
    })
  }

  /** SQL-expressible metadata over the binary column (octet length, prefix
    * hash) — this slice is oracle-checkable in DuckDB.
    */
  def metadata(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      length(encode(col("text"), "UTF-8")).cast("bigint").as("byte_len"),
      substring(col("text"), 1, 8).as("head8"))
}
