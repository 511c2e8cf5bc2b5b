package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract run
  * per-row on the executors, shuffle-free, with the binary column pruned
  * at the scan when only (key, binary) are selected upstream.
  *
  * Image decode is REAL: `javax.imageio` ships in the JDK and reads
  * PNG/JPEG/GIF/BMP with zero extra dependencies. An undecodable payload
  * (unknown codec, truncated bytes, genuinely-non-image column) falls back
  * to a deterministic byte-fold feature vector and is FLAGGED
  * (`decoded = false`) — the pipeline keeps moving and the caller can
  * count/quarantine failures.
  *
  * Audio decode is REAL too: `javax.sound.sampled` ships in the JDK and
  * reads WAV/AIFF/AU PCM payloads — `decodeAudio` extracts exact integer
  * sample sums (lossless for PCM, so hash-exact oracles work — the q57
  * pattern). Video frame sampling is real for animated GIF
  * (`sampleFrames`) and for AVI containers carrying uncompressed-DIB or
  * MJPEG frames (`sampleVideoFrames` — RIFF walk per the public spec;
  * MJPEG frames decode through the in-JDK JPEG codec). Only TRUE
  * inter-frame codecs (mp4/webm) are absent from the JDK;
  * `frameSampleStub` stays a declared stub for those.
  */
object Multimodal {

  final case class MediaMeta(key: String, mime: String, nBytes: Long, sha: String)

  /** Image features from one decoded payload. Channel sums are exact
    * integers (lossless for PNG/BMP/GIF) so downstream checks can be
    * oracled hash-exact; means are derived. `lumaHist` is an 8-bin
    * histogram of the BT.601 luma (bin width 32). */
  final case class ImageFeatures(
      decoded: Boolean,
      width: Int,
      height: Int,
      channels: Int,
      sumR: Long,
      sumG: Long,
      sumB: Long,
      nPx: Long,
      lumaHist: Array[Long],
      features: Array[Float])

  /** Metadata extraction — pure column ops, pushdown-friendly. */
  def describeBinary(df: DataFrame, keyCol: String, binCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      lit("application/octet-stream").as("mime"),
      length(col(binCol)).cast("long").as("n_bytes"),
      sha2(col(binCol), 256).as("sha"))

  /** Deterministic byte-fold fallback "features" for payloads no JDK codec
    * can decode: 8 floats folded from the bytes. Clearly flagged via
    * `decoded = false` wherever it is used. */
  private[operators] def fakeFeatures(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) {
        out(i % 8) = out(i % 8) + (bytes(i) & 0xff) / 255.0f
        i += 1
      }
    }
    out
  }

  /** Decode one payload with the JDK's ImageIO; null on failure. */
  private[operators] def readImage(bytes: Array[Byte]): BufferedImage =
    if (bytes == null || bytes.length == 0) null
    else
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }

  /** Exact per-channel sums + luma histogram of a decoded image. getRGB
    * converts every raster/palette layout to 8-bit sRGB, so the arithmetic
    * is layout-independent; grayscale decodes with r=g=b. */
  private[operators] def rgbSums(img: BufferedImage): (Long, Long, Long, Array[Long]) = {
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Long](8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sr += r; sg += g; sb += b
        val luma = (299 * r + 587 * g + 114 * b) / 1000
        hist(math.min(7, luma >> 5)) += 1L
        x += 1
      }
      y += 1
    }
    (sr, sg, sb, hist)
  }

  private[operators] def imageFeatures(bytes: Array[Byte]): ImageFeatures = {
    val img = readImage(bytes)
    if (img == null)
      ImageFeatures(decoded = false, 0, 0, 0, 0L, 0L, 0L, 0L,
        new Array[Long](8), fakeFeatures(bytes))
    else {
      val w = img.getWidth
      val h = img.getHeight
      val (sr, sg, sb, hist) = rgbSums(img)
      val n = w.toLong * h
      val feats = Array[Float](
        w.toFloat, h.toFloat,
        (sr.toDouble / n).toFloat, (sg.toDouble / n).toFloat, (sb.toDouble / n).toFloat,
        hist(0).toFloat / n, hist(7).toFloat / n,
        img.getColorModel.getNumComponents.toFloat)
      ImageFeatures(decoded = true, w, h, img.getColorModel.getNumComponents,
        sr, sg, sb, n, hist, feats)
    }
  }

  /** Image decode + feature extraction: one feature row per input row;
    * executes per partition, no shuffle. Undecodable payloads come back
    * with `decoded = false` and the byte-fold fallback features. */
  def decodeImages(df: DataFrame, keyCol: String, binCol: String): DataFrame = {
    val featUdf = udf((b: Array[Byte]) => imageFeatures(b))
    df.select(col(keyCol).cast("string").as("key"), col(binCol).as("payload"))
      .withColumn("__f", featUdf(col("payload")))
      .select(col("key"),
        col("__f.decoded").as("decoded"),
        col("__f.width").as("width"),
        col("__f.height").as("height"),
        col("__f.channels").as("channels"),
        col("__f.sumR").as("sum_r"),
        col("__f.sumG").as("sum_g"),
        col("__f.sumB").as("sum_b"),
        col("__f.nPx").as("n_px"),
        // ANSI-safe: undecodable rows carry nPx = 0 → null means
        when(col("__f.nPx") > 0,
          col("__f.sumR").cast("double") / col("__f.nPx")).as("mean_r"),
        when(col("__f.nPx") > 0,
          col("__f.sumG").cast("double") / col("__f.nPx")).as("mean_g"),
        when(col("__f.nPx") > 0,
          col("__f.sumB").cast("double") / col("__f.nPx")).as("mean_b"),
        col("__f.lumaHist").as("luma_hist"),
        col("__f.features").as("features"))
  }

  /** Back-compat decode surface (the round-2 stub contract): key +
    * 8-float feature vector — now real image features when the payload
    * decodes, byte-fold fallback (flagged) otherwise. */
  def decodeStub(df: DataFrame, keyCol: String, binCol: String): DataFrame =
    decodeImages(df, keyCol, binCol).select("key", "decoded", "features")

  /** One sampled frame's exact features (animated GIF / any multi-image
    * container `ImageIO` can read). */
  final case class FrameFeatures(
      frameIdx: Int,
      decoded: Boolean,
      width: Int,
      height: Int,
      sumR: Long,
      sumG: Long,
      sumB: Long,
      nPx: Long)

  /** Decode every `stride`-th frame of a multi-frame payload — REAL frame
    * sampling for animated GIF (the one video-ish container the pure JDK
    * can decode: `ImageIO`'s GIF reader exposes getNumImages/read(i)).
    * Single-frame images yield one row (frame 0); undecodable payloads
    * yield one FLAGGED row (`decoded = false`). Frames are decoded as
    * stored (no inter-frame disposal compositing — deterministic and
    * documented; partial-update frames report their own raster). */
  private[operators] def frameFeatures(bytes: Array[Byte], stride: Int): Seq[FrameFeatures] = {
    val failed = Seq(FrameFeatures(0, decoded = false, 0, 0, 0L, 0L, 0L, 0L))
    if (bytes == null || bytes.length == 0) return failed
    val iis =
      try ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (iis == null) return failed
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return failed
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = math.max(1,
          try reader.getNumImages(true) catch { case _: Exception => 1 })
        (0 until n by math.max(1, stride)).map { i =>
          try {
            val img = reader.read(i)
            val (sr, sg, sb, _) = rgbSums(img)
            FrameFeatures(i, decoded = true, img.getWidth, img.getHeight,
              sr, sg, sb, img.getWidth.toLong * img.getHeight)
          } catch {
            case _: Exception => FrameFeatures(i, decoded = false, 0, 0, 0L, 0L, 0L, 0L)
          }
        }
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Frame sampling as a DataFrame op: one row per sampled frame, per-row
    * on the executors, shuffle-free (M-explode like the reference's
    * one-vs-rest but over decoded frames). */
  def sampleFrames(df: DataFrame, keyCol: String, binCol: String,
      stride: Int = 1): DataFrame = {
    val framesUdf = udf((b: Array[Byte]) => frameFeatures(b, stride))
    df.select(col(keyCol).cast("string").as("key"), col(binCol).as("payload"))
      .withColumn("__f", explode(framesUdf(col("payload"))))
      .select(col("key"),
        col("__f.frameIdx").as("frame_idx"),
        col("__f.decoded").as("decoded"),
        col("__f.width").as("width"),
        col("__f.height").as("height"),
        col("__f.sumR").as("sum_r"),
        col("__f.sumG").as("sum_g"),
        col("__f.sumB").as("sum_b"),
        col("__f.nPx").as("n_px"))
  }

  /** Frame-sample stub for TRUE inter-frame video codecs (mp4/webm — not
    * in the JDK): every `stride`-th 16-byte block becomes one "frame"
    * digest — demonstrates the explode-to-frames shape (one row per
    * sampled frame). Animated-GIF frame sampling is REAL
    * (`sampleFrames`), as is AVI with DIB/MJPEG frames
    * (`sampleVideoFrames`). */
  def frameSampleStub(df: DataFrame, keyCol: String, binCol: String, stride: Int = 4): DataFrame =
    df.select(col(keyCol).cast("string").as("key"), col(binCol).as("payload"))
      .withColumn("n_frames", greatest(floor(length(col("payload")) / (16 * stride)), lit(1)).cast("int"))
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1)))
      .withColumn("frame_digest",
        sha2(concat(col("payload"), col("frame_idx").cast("string").cast("binary")), 256))
      .select("key", "frame_idx", "frame_digest")

  /** Deterministic test-image generator: a `w`×`h` RGB PNG whose pixel
    * (x, y) is r=(seed·7+x·13+y·31)%256, g=(seed·11+x·3+y·17)%256,
    * b=(seed·5+x·19+y·23)%256. PNG is lossless, so decoded channel sums
    * are exactly the closed-form sums an independent oracle can compute. */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((seed * 7 + x * 13 + y * 31) % 256).toInt
        val g = ((seed * 11 + x * 3 + y * 17) % 256).toInt
        val b = ((seed * 5 + x * 19 + y * 23) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Column form of `syntheticPng` for driver-contract queries. */
  def syntheticPngUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((seed: Long, w: Int, h: Int) => syntheticPng(seed, w, h))

  /** Deterministic ANIMATED-GIF generator: `nFrames` grayscale frames with
    * pixel value v(f, x, y) = (seed·7 + f·41 + x·13 + y·31) % 256 on an
    * explicit 256-entry gray palette — every value has an exact palette
    * slot, so the GIF round-trips losslessly and decoded channel sums
    * (r = g = b = Σv) match a closed-form oracle bit-exactly. */
  def syntheticGif(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val gray = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
    var f = 0
    while (f < nFrames) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, ((seed * 7 + f * 41 + x * 13 + y * 31) % 256).toInt)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  /** Column form of `syntheticGif` for driver-contract queries. */
  def syntheticGifUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((seed: Long, w: Int, h: Int, n: Int) => syntheticGif(seed, w, h, n))

  // ───────────────────────── audio ─────────────────────────

  /** Audio features from one decoded payload. Sample sums are exact
    * integers in the 16-bit sample domain (8-bit PCM is centered and
    * scaled by 256), so PCM payloads can be oracled hash-exact. `ampHist`
    * is an 8-bin histogram of channel-0 amplitude (bin width 8192 over
    * [-32768, 32768)). */
  final case class AudioFeatures(
      decoded: Boolean,
      sampleRate: Int,
      channels: Int,
      bits: Int,
      nFrames: Long,
      sumCh0: Long,
      sumCh1: Long,
      sumSqCh0: Long,
      peakAbs: Int,
      ampHist: Array[Long])

  /** Decode one audio payload with the JDK's `javax.sound.sampled`
    * (WAV/AIFF/AU containers). Supported sample layouts: 16-bit signed
    * PCM (either endianness) and 8-bit unsigned PCM — the formats the
    * JDK parses losslessly without a resampling pass. Anything else
    * (float PCM, compressed encodings, no container match) returns the
    * FLAGGED failure row, mirroring the image path's policy. */
  private[operators] def audioFeatures(bytes: Array[Byte]): AudioFeatures = {
    val failed = AudioFeatures(decoded = false, 0, 0, 0, 0L, 0L, 0L, 0L, 0,
      new Array[Long](8))
    if (bytes == null || bytes.length == 0) return failed
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (ais == null) return failed
    try {
      import javax.sound.sampled.AudioFormat.Encoding
      val fmt = ais.getFormat
      val bits = fmt.getSampleSizeInBits
      val ch = fmt.getChannels
      val ok = ch >= 1 &&
        ((fmt.getEncoding == Encoding.PCM_SIGNED && bits == 16) ||
          (fmt.getEncoding == Encoding.PCM_UNSIGNED && bits == 8))
      if (!ok) return failed
      val data = ais.readAllBytes()
      val bytesPerSample = bits / 8
      val frameSize = bytesPerSample * ch
      val n = data.length / frameSize
      val be = fmt.isBigEndian
      var sum0 = 0L; var sum1 = 0L; var sq0 = 0L; var peak = 0
      val hist = new Array[Long](8)
      var i = 0
      while (i < n) {
        var c = 0
        while (c < ch) {
          val off = i * frameSize + c * bytesPerSample
          // normalize to the signed 16-bit sample domain
          val v =
            if (bits == 16) {
              val b0 = data(off) & 0xff
              val b1 = data(off + 1) & 0xff
              (if (be) (b0 << 8) | b1 else (b1 << 8) | b0).toShort.toInt
            } else ((data(off) & 0xff) - 128) << 8
          if (c == 0) {
            sum0 += v; sq0 += v.toLong * v
            hist(math.min(7, (v + 32768) >> 13)) += 1L
          } else if (c == 1) sum1 += v
          val a = math.abs(v)
          if (a > peak) peak = a
          c += 1
        }
        i += 1
      }
      AudioFeatures(decoded = true, fmt.getSampleRate.toInt, ch, bits, n,
        sum0, sum1, sq0, peak, hist)
    } catch { case _: Exception => failed }
    finally ais.close()
  }

  /** Audio decode + feature extraction: one feature row per input row,
    * per-partition on the executors, shuffle-free (same plan shape as
    * `decodeImages`). Exact integer columns (`sum_ch0`/`sum_ch1`/
    * `sumsq_ch0`/`peak_abs`) enable hash-exact oracles; `power_ch0` and
    * `duration_sec` are derived, null on undecodable rows (ANSI-safe). */
  def decodeAudio(df: DataFrame, keyCol: String, binCol: String): DataFrame = {
    val featUdf = udf((b: Array[Byte]) => audioFeatures(b))
    df.select(col(keyCol).cast("string").as("key"), col(binCol).as("payload"))
      .withColumn("__f", featUdf(col("payload")))
      .select(col("key"),
        col("__f.decoded").as("decoded"),
        col("__f.sampleRate").as("sample_rate"),
        col("__f.channels").as("channels"),
        col("__f.bits").as("bits"),
        col("__f.nFrames").as("n_frames"),
        col("__f.sumCh0").as("sum_ch0"),
        col("__f.sumCh1").as("sum_ch1"),
        col("__f.sumSqCh0").as("sumsq_ch0"),
        col("__f.peakAbs").as("peak_abs"),
        when(col("__f.nFrames") > 0,
          col("__f.sumSqCh0").cast("double") / col("__f.nFrames"))
          .as("power_ch0"),
        when(col("__f.decoded") && col("__f.sampleRate") > 0,
          col("__f.nFrames").cast("double") / col("__f.sampleRate"))
          .as("duration_sec"),
        col("__f.ampHist").as("amp_hist"))
  }

  /** Deterministic test-audio generator: a hand-rolled RIFF/WAVE PCM
    * payload whose sample at (channel c, frame i) is
    * `((seed·7 + c·41 + i·13) mod 65536) − 32768` (16-bit signed LE), or
    * the same value mapped to `(v >> 8) + 128` for 8-bit unsigned. PCM is
    * lossless, so decoded sums match a closed-form oracle bit-exactly. */
  def syntheticWav(seed: Long, sampleRate: Int, channels: Int, nFrames: Int,
      bits: Int = 16): Array[Byte] = {
    require(bits == 16 || bits == 8, s"unsupported bits=$bits")
    val bytesPerSample = bits / 8
    val dataSize = nFrames * channels * bytesPerSample
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels * bytesPerSample)
    bb.putShort((channels * bytesPerSample).toShort)
    bb.putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataSize)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        val v = (((seed * 7 + c * 41 + i * 13) % 65536) - 32768).toInt
        if (bits == 16) bb.putShort(v.toShort)
        else bb.put((((v >> 8) + 128) & 0xff).toByte)
        c += 1
      }
      i += 1
    }
    bb.array()
  }

  /** Column form of `syntheticWav` for driver-contract queries. */
  def syntheticWavUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((seed: Long, rate: Int, ch: Int, n: Int) => syntheticWav(seed, rate, ch, n))

  // ───────────────────────── video (AVI) ─────────────────────────

  /** One sampled video frame's features. `codec` is "dib" (uncompressed
    * 24-bit bottom-up DIB, decoded by the container parser itself) or
    * "mjpeg" (JPEG chunk decoded by the JDK's ImageIO JPEG codec). */
  final case class VideoFrameFeatures(
      frameIdx: Int,
      decoded: Boolean,
      codec: String,
      width: Int,
      height: Int,
      sumR: Long,
      sumG: Long,
      sumB: Long,
      nPx: Long)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Decode every `stride`-th video frame of a RIFF/AVI payload — REAL
    * video frame sampling for the two codecs decodable without native
    * libraries: uncompressed 24-bit DIB (`##db` chunks; raw bottom-up BGR
    * rows padded to 4 bytes, read straight off the container per the
    * public AVI/BITMAPINFOHEADER spec) and MJPEG (`##dc` chunks, each an
    * independent JPEG decoded by the in-JDK ImageIO codec). The container
    * walk honors RIFF word alignment (odd-sized chunks carry a pad byte
    * outside their declared size). Top-down DIBs (negative biHeight),
    * other bit depths, and true inter-frame codecs (mp4/webm) yield
    * FLAGGED rows — `frameSampleStub` remains the declared stub for those.
    * Returns one row per sampled frame; a payload that is not an AVI at
    * all yields one flagged row, mirroring `frameFeatures`. */
  private[operators] def videoFrameFeatures(bytes: Array[Byte],
      stride: Int): Seq[VideoFrameFeatures] = {
    val failed = Seq(VideoFrameFeatures(0, decoded = false, "none", 0, 0, 0L, 0L, 0L, 0L))
    if (bytes == null || bytes.length < 12 ||
        fourCC(bytes, 0) != "RIFF" || fourCC(bytes, 8) != "AVI ") return failed
    try {
      // first video stream's BITMAPINFOHEADER (from hdrl → strl → strf)
      var vidW = 0; var vidH = 0; var vidBits = 0; var vidComp = 0
      var haveFmt = false
      // (chunk fourCC, data offset, data size) of each movi frame chunk
      val frames = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()

      def walkStrl(off: Int, end: Int): Unit = {
        var p = off
        var isVids = false
        while (p + 8 <= end) {
          val id = fourCC(bytes, p); val sz = le32(bytes, p + 4)
          // a hostile/corrupt negative le32 size would advance p by <= 0
          // (sz = -8/-9 loops forever inside a UDF) — treat as malformed
          // and stop; the payload decodes as far as its well-formed prefix
          if (sz < 0) return
          if (id == "strh" && sz >= 4)
            isVids = fourCC(bytes, p + 8) == "vids"
          // sz >= 20 so biBitCount (data+14..15) and biCompression
          // (data+16..19) are inside the declared chunk, not its pad byte
          // or the next chunk's header
          else if (id == "strf" && isVids && !haveFmt && sz >= 20) {
            vidW = le32(bytes, p + 12)      // biWidth  (data + 4)
            vidH = le32(bytes, p + 16)      // biHeight (data + 8)
            vidBits = le16(bytes, p + 22)   // biBitCount (data + 14)
            vidComp = le32(bytes, p + 24)   // biCompression (data + 16)
            haveFmt = true
          }
          p += 8 + sz + (sz & 1)
        }
      }

      def walk(off: Int, end: Int): Unit = {
        var p = off
        while (p + 8 <= end) {
          val id = fourCC(bytes, p); val sz = le32(bytes, p + 4)
          if (sz < 0) return // malformed size: zero/negative advance loops forever
          val dataEnd = math.min(end, p + 8 + sz)
          if (id == "LIST" && sz >= 4) {
            fourCC(bytes, p + 8) match {
              case "strl" => walkStrl(p + 12, dataEnd)
              case _ => walk(p + 12, dataEnd) // hdrl, movi, odml, ...
            }
          } else if (id.substring(2) == "db" || id.substring(2) == "dc") {
            if (id(0).isDigit && id(1).isDigit)
              frames += ((id, p + 8, sz))
          }
          p += 8 + sz + (sz & 1)
        }
      }
      walk(12, math.min(bytes.length, 8 + le32(bytes, 4)))

      if (frames.isEmpty) return failed

      def decodeOne(i: Int, id: String, off: Int, sz: Int,
          flaggedRow: VideoFrameFeatures): VideoFrameFeatures =
        if (id.endsWith("db")) {
          // uncompressed DIB: bottom-up 24-bit BGR, rows padded to 4 bytes
          val rowBytes = ((vidW * 3 + 3) / 4) * 4
          if (!haveFmt || vidComp != 0 || vidBits != 24 || vidW <= 0 || vidH <= 0 ||
              sz < rowBytes * vidH || off + rowBytes * vidH > bytes.length) flaggedRow
          else {
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < vidH) {
              val rowOff = off + (vidH - 1 - y) * rowBytes
              var x = 0
              while (x < vidW) {
                sb += bytes(rowOff + x * 3) & 0xff
                sg += bytes(rowOff + x * 3 + 1) & 0xff
                sr += bytes(rowOff + x * 3 + 2) & 0xff
                x += 1
              }
              y += 1
            }
            VideoFrameFeatures(i, decoded = true, "dib", vidW, vidH,
              sr, sg, sb, vidW.toLong * vidH)
          }
        } else { // ##dc — per AVI convention an independently-coded frame; try JPEG
          val img =
            if (off + sz > bytes.length) null
            else readImage(java.util.Arrays.copyOfRange(bytes, off, off + sz))
          if (img == null) flaggedRow
          else {
            val (sr, sg, sb, _) = rgbSums(img)
            VideoFrameFeatures(i, decoded = true, "mjpeg", img.getWidth, img.getHeight,
              sr, sg, sb, img.getWidth.toLong * img.getHeight)
          }
        }

      frames.indices.by(math.max(1, stride)).map { i =>
        val (id, off, sz) = frames(i)
        val flaggedRow = VideoFrameFeatures(i, decoded = false, "none", 0, 0, 0L, 0L, 0L, 0L)
        try decodeOne(i, id, off, sz, flaggedRow)
        catch { case _: Exception => flaggedRow } // truncated chunk etc.
      }
    } catch { case _: Exception => failed }
  }

  /** Video frame sampling as a DataFrame op: one row per sampled frame,
    * per-row on the executors, shuffle-free — the `sampleFrames` plan
    * shape over AVI payloads. */
  def sampleVideoFrames(df: DataFrame, keyCol: String, binCol: String,
      stride: Int = 1): DataFrame = {
    val framesUdf = udf((b: Array[Byte]) => videoFrameFeatures(b, stride))
    df.select(col(keyCol).cast("string").as("key"), col(binCol).as("payload"))
      .withColumn("__f", explode(framesUdf(col("payload"))))
      .select(col("key"),
        col("__f.frameIdx").as("frame_idx"),
        col("__f.decoded").as("decoded"),
        col("__f.codec").as("codec"),
        col("__f.width").as("width"),
        col("__f.height").as("height"),
        col("__f.sumR").as("sum_r"),
        col("__f.sumG").as("sum_g"),
        col("__f.sumB").as("sum_b"),
        col("__f.nPx").as("n_px"))
  }

  /** Deterministic AVI generator (hand-rolled RIFF per the public spec,
    * like `syntheticWav`): `nFrames` frames whose pixel (f, x, y) is
    * r=(seed·7+f·41+x·13+y·31)%256, g=(seed·11+f·43+x·3+y·17)%256,
    * b=(seed·5+f·47+x·19+y·23)%256 (the q57/q61 pattern + a frame term).
    * `codec` = "dib" writes lossless uncompressed 24-bit frames (closed-
    * form oracle-exact); "mjpeg" writes each frame as an ImageIO-encoded
    * JPEG `##dc` chunk (lossy — round-trip asserted with tolerance in
    * ScalaTest, exercising the real JDK JPEG codec path). */
  def syntheticAvi(seed: Long, w: Int, h: Int, nFrames: Int,
      codec: String = "dib"): Array[Byte] = {
    def px(f: Int, x: Int, y: Int): (Int, Int, Int) = (
      ((seed * 7 + f * 41 + x * 13 + y * 31) % 256).toInt,
      ((seed * 11 + f * 43 + x * 3 + y * 17) % 256).toInt,
      ((seed * 5 + f * 47 + x * 19 + y * 23) % 256).toInt)
    val frameChunks: Seq[(String, Array[Byte])] = (0 until nFrames).map { f =>
      if (codec == "dib") {
        val rowBytes = ((w * 3 + 3) / 4) * 4
        val data = new Array[Byte](rowBytes * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (r, g, b) = px(f, x, y)
            val off = (h - 1 - y) * rowBytes + x * 3
            data(off) = b.toByte; data(off + 1) = g.toByte; data(off + 2) = r.toByte
            x += 1
          }
          y += 1
        }
        ("00db", data)
      } else {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (r, g, b) = px(f, x, y)
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        ImageIO.write(img, "jpg", out)
        ("00dc", out.toByteArray)
      }
    }
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val padded = data.length + (data.length & 1)
      val bb = java.nio.ByteBuffer.allocate(8 + padded)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")); bb.putInt(data.length); bb.put(data)
      bb.array()
    }
    def list(typ: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
      val size = 4 + bodies.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(8 + size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("US-ASCII")); bb.putInt(size)
      bb.put(typ.getBytes("US-ASCII")); bodies.foreach(bb.put)
      bb.array()
    }
    val frameBytes = frameChunks.map(_._2.length).max
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40000); bb.putInt(0); bb.putInt(0); bb.putInt(0)
      bb.putInt(nFrames); bb.putInt(0); bb.putInt(1); bb.putInt(frameBytes)
      bb.putInt(w); bb.putInt(h) // + 4 reserved ints left zero
      bb.array()
    }
    val strh = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("US-ASCII"))
      bb.put((if (codec == "dib") "DIB " else "MJPG").getBytes("US-ASCII"))
      bb.putInt(0); bb.putInt(0); bb.putInt(0)      // flags, prio/lang, initial
      bb.putInt(1); bb.putInt(25)                   // scale, rate
      bb.putInt(0); bb.putInt(nFrames)              // start, length
      bb.putInt(frameBytes); bb.putInt(-1); bb.putInt(0) // bufSize, quality, sampleSize
      bb.array()
    }
    val strf = {
      val bb = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40); bb.putInt(w); bb.putInt(h)
      bb.putShort(1); bb.putShort(24)
      bb.putInt(0); bb.putInt(frameBytes) // BI_RGB; size image
      bb.array()
    }
    val hdrl = list("hdrl", Seq(chunk("avih", avih),
      list("strl", Seq(chunk("strh", strh), chunk("strf", strf)))))
    val movi = list("movi", frameChunks.map { case (id, d) => chunk(id, d) })
    val riffSize = 4 + hdrl.length + movi.length
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(riffSize)
    bb.put("AVI ".getBytes("US-ASCII")); bb.put(hdrl); bb.put(movi)
    bb.array()
  }

  /** Column form of `syntheticAvi` for driver-contract queries. */
  def syntheticAviUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((seed: Long, w: Int, h: Int, n: Int) => syntheticAvi(seed, w, h, n))
}
