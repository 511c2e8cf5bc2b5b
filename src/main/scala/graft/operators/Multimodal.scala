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
  * count/quarantine failures. Audio/video codecs are not in the JDK, so
  * `frameSampleStub` stays a declared stub demonstrating the
  * explode-to-frames plan shape.
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

  /** Extract exact per-channel sums + luma histogram from a decoded image.
    * getRGB converts every raster/palette layout to 8-bit sRGB, so the
    * arithmetic is layout-independent; grayscale decodes with r=g=b. */
  private[operators] def imageFeatures(bytes: Array[Byte]): ImageFeatures = {
    val img = readImage(bytes)
    if (img == null)
      ImageFeatures(decoded = false, 0, 0, 0, 0L, 0L, 0L, 0L,
        new Array[Long](8), fakeFeatures(bytes))
    else {
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

  /** Frame-sample stub for video-shaped payloads: every `stride`-th 16-byte
    * block becomes one "frame" digest — demonstrates the explode-to-frames
    * shape (one row per sampled frame). Video codecs are NOT in the JDK;
    * this remains a declared stub for the plan shape only. */
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
}
