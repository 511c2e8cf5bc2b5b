package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden tests for the REAL image decoder: deterministic in-test images
  * (written with ImageIO, decoded back through the Spark operator) with
  * hand-computed expected dims / channel sums / luma histogram. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def png(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("PNG decode: exact dims, channel sums, and luma histogram") {
    // 3×2 RGB with explicit pixels
    val px = Array(
      Array((10, 20, 30), (40, 50, 60), (70, 80, 90)),
      Array((200, 210, 220), (0, 0, 0), (255, 255, 255)))
    val img = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3) {
      val (r, g, b) = px(y)(x)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val df = Seq(("k1", png(img))).toDF("id", "payload")
    val row = Multimodal.decodeImages(df, "id", "payload").collect()(0)
    assert(row.getAs[Boolean]("decoded"))
    assert(row.getAs[Int]("width") == 3 && row.getAs[Int]("height") == 2)
    assert(row.getAs[Int]("channels") == 3)
    val flat = px.flatten
    assert(row.getAs[Long]("sum_r") == flat.map(_._1.toLong).sum)
    assert(row.getAs[Long]("sum_g") == flat.map(_._2.toLong).sum)
    assert(row.getAs[Long]("sum_b") == flat.map(_._3.toLong).sum)
    assert(row.getAs[Long]("n_px") == 6L)
    // hand-computed BT.601 luma bins (integer math, bin width 32)
    val wantHist = new Array[Long](8)
    flat.foreach { case (r, g, b) =>
      val luma = (299 * r + 587 * g + 114 * b) / 1000
      wantHist(math.min(7, luma >> 5)) += 1
    }
    assert(row.getSeq[Long](row.fieldIndex("luma_hist")) == wantHist.toSeq)
    // derived means
    assert(math.abs(row.getAs[Double]("mean_r") - flat.map(_._1).sum / 6.0) < 1e-12)
  }

  test("grayscale PNG decodes with r=g=b and 1 channel") {
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 4) {
      val v = 16 * (y * 4 + x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val df = Seq(("g", png(img))).toDF("id", "payload")
    val row = Multimodal.decodeImages(df, "id", "payload").collect()(0)
    assert(row.getAs[Boolean]("decoded"))
    assert(row.getAs[Int]("channels") == 1)
    assert(row.getAs[Long]("sum_r") == row.getAs[Long]("sum_g"))
    assert(row.getAs[Long]("sum_g") == row.getAs[Long]("sum_b"))
  }

  test("JPEG decodes (lossy): exact dims, approximate means") {
    val img = new BufferedImage(16, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16)
      img.setRGB(x, y, (128 << 16) | (64 << 8) | 200)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    val df = Seq(("j", out.toByteArray)).toDF("id", "payload")
    val row = Multimodal.decodeImages(df, "id", "payload").collect()(0)
    assert(row.getAs[Boolean]("decoded"))
    assert(row.getAs[Int]("width") == 16 && row.getAs[Int]("height") == 8)
    assert(math.abs(row.getAs[Double]("mean_r") - 128) < 16, "JPEG mean_r drift")
    assert(math.abs(row.getAs[Double]("mean_g") - 64) < 16, "JPEG mean_g drift")
    assert(math.abs(row.getAs[Double]("mean_b") - 200) < 16, "JPEG mean_b drift")
  }

  test("undecodable payloads are flagged and fall back to byte-fold features") {
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val df = Seq(("bad", junk), ("empty", Array.emptyByteArray)).toDF("id", "payload")
    val rows = Multimodal.decodeImages(df, "id", "payload")
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    assert(!rows("bad").getAs[Boolean]("decoded"))
    assert(!rows("empty").getAs[Boolean]("decoded"))
    val feats = rows("bad").getSeq[Float](rows("bad").fieldIndex("features"))
    assert(feats == Multimodal.fakeFeatures(junk).toSeq)
    // mixed batch: a decodable image in the same frame still decodes
    val mixed = Seq(("ok", Multimodal.syntheticPng(1, 3, 2)), ("bad", junk))
      .toDF("id", "payload")
    val m = Multimodal.decodeImages(mixed, "id", "payload")
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Boolean]("decoded")).toMap
    assert(m("ok") && !m("bad"))
  }

  test("syntheticPng round-trips through the decoder to its closed-form sums") {
    for (seed <- Seq(0L, 1L, 7L, 63L)) {
      val w = (3 + seed % 4).toInt
      val h = (2 + seed % 3).toInt
      val df = Seq((seed.toString, Multimodal.syntheticPng(seed, w, h))).toDF("id", "payload")
      val row = Multimodal.decodeImages(df, "id", "payload").collect()(0)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sr += (seed * 7 + x * 13 + y * 31) % 256
        sg += (seed * 11 + x * 3 + y * 17) % 256
        sb += (seed * 5 + x * 19 + y * 23) % 256
      }
      assert(row.getAs[Int]("width") == w && row.getAs[Int]("height") == h)
      assert(row.getAs[Long]("sum_r") == sr, s"seed=$seed r")
      assert(row.getAs[Long]("sum_g") == sg, s"seed=$seed g")
      assert(row.getAs[Long]("sum_b") == sb, s"seed=$seed b")
    }
  }

  // ───────────────────────── audio ─────────────────────────

  /** Closed-form 16-bit sample value of `Multimodal.syntheticWav`. */
  private def wavSample(seed: Long, c: Int, i: Int): Long =
    (seed * 7 + c * 41 + i * 13) % 65536 - 32768

  test("WAV decode: exact sums, sum of squares, peak, histogram (16-bit stereo)") {
    val (seed, n) = (5L, 300)
    val df = Seq(("a", Multimodal.syntheticWav(seed, 8000, 2, n))).toDF("id", "payload")
    val row = Multimodal.decodeAudio(df, "id", "payload").collect()(0)
    assert(row.getAs[Boolean]("decoded"))
    assert(row.getAs[Int]("sample_rate") == 8000)
    assert(row.getAs[Int]("channels") == 2 && row.getAs[Int]("bits") == 16)
    assert(row.getAs[Long]("n_frames") == n.toLong)
    val ch0 = (0 until n).map(wavSample(seed, 0, _))
    val ch1 = (0 until n).map(wavSample(seed, 1, _))
    assert(row.getAs[Long]("sum_ch0") == ch0.sum)
    assert(row.getAs[Long]("sum_ch1") == ch1.sum)
    assert(row.getAs[Long]("sumsq_ch0") == ch0.map(v => v * v).sum)
    assert(row.getAs[Int]("peak_abs") == (ch0 ++ ch1).map(v => math.abs(v)).max)
    val wantHist = new Array[Long](8)
    ch0.foreach(v => wantHist(math.min(7, ((v + 32768) >> 13).toInt)) += 1)
    assert(row.getSeq[Long](row.fieldIndex("amp_hist")) == wantHist.toSeq)
    assert(math.abs(row.getAs[Double]("duration_sec") - n / 8000.0) < 1e-12)
    assert(math.abs(row.getAs[Double]("power_ch0")
      - ch0.map(v => v * v).sum.toDouble / n) < 1e-6)
  }

  test("WAV decode: 8-bit unsigned mono maps to the centered 16-bit domain") {
    val (seed, n) = (3L, 128)
    val df = Seq(("m", Multimodal.syntheticWav(seed, 4000, 1, n, bits = 8)))
      .toDF("id", "payload")
    val row = Multimodal.decodeAudio(df, "id", "payload").collect()(0)
    assert(row.getAs[Boolean]("decoded"))
    assert(row.getAs[Int]("channels") == 1 && row.getAs[Int]("bits") == 8)
    // the 8-bit writer quantizes v to (v >> 8) << 8 — reproduce exactly
    val ch0 = (0 until n).map(i => (wavSample(seed, 0, i) >> 8) << 8)
    assert(row.getAs[Long]("sum_ch0") == ch0.sum)
    assert(row.getAs[Long]("sum_ch1") == 0L)
    assert(row.getAs[Long]("sumsq_ch0") == ch0.map(v => v * v).sum)
  }

  test("AIFF (big-endian PCM) decodes to the same sums as the WAV source") {
    import javax.sound.sampled._
    val (seed, n) = (9L, 200)
    val wav = Multimodal.syntheticWav(seed, 8000, 2, n)
    val src = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
    val out = new ByteArrayOutputStream()
    AudioSystem.write(src, AudioFileFormat.Type.AIFF, out)
    val df = Seq(("aiff", out.toByteArray)).toDF("id", "payload")
    val row = Multimodal.decodeAudio(df, "id", "payload").collect()(0)
    assert(row.getAs[Boolean]("decoded"))
    val ch0 = (0 until n).map(wavSample(seed, 0, _))
    assert(row.getAs[Long]("n_frames") == n.toLong)
    assert(row.getAs[Long]("sum_ch0") == ch0.sum, "BE path sum mismatch")
    assert(row.getAs[Long]("sumsq_ch0") == ch0.map(v => v * v).sum)
  }

  test("undecodable audio payloads are flagged, mixed batches keep moving") {
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val df = Seq(("ok", Multimodal.syntheticWav(1, 8000, 1, 50)),
      ("bad", junk), ("empty", Array.emptyByteArray)).toDF("id", "payload")
    val rows = Multimodal.decodeAudio(df, "id", "payload")
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    assert(rows("ok").getAs[Boolean]("decoded"))
    assert(!rows("bad").getAs[Boolean]("decoded"))
    assert(!rows("empty").getAs[Boolean]("decoded"))
    assert(rows("bad").isNullAt(rows("bad").fieldIndex("duration_sec")))
  }

  // ─────────── AVI video frame sampling ───────────

  /** The syntheticAvi generator's closed-form channel values. */
  private def aviPx(seed: Long, f: Int, x: Int, y: Int): (Long, Long, Long) = (
    (seed * 7 + f * 41 + x * 13 + y * 31) % 256,
    (seed * 11 + f * 43 + x * 3 + y * 17) % 256,
    (seed * 5 + f * 47 + x * 19 + y * 23) % 256)

  test("AVI uncompressed-DIB frames round-trip to closed-form exact sums") {
    val (seed, w, h, n) = (3L, 5, 6, 3) // w=5 exercises the 4-byte row pad
    val df = Seq(("k", Multimodal.syntheticAvi(seed, w, h, n))).toDF("id", "payload")
    val rows = Multimodal.sampleVideoFrames(df, "id", "payload")
      .orderBy("frame_idx").collect()
    assert(rows.length == n)
    rows.zipWithIndex.foreach { case (r, f) =>
      assert(r.getAs[Boolean]("decoded") && r.getAs[String]("codec") == "dib")
      assert(r.getAs[Int]("frame_idx") == f)
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      val want = (for (x <- 0 until w; y <- 0 until h) yield aviPx(seed, f, x, y))
      assert(r.getAs[Long]("sum_r") == want.map(_._1).sum)
      assert(r.getAs[Long]("sum_g") == want.map(_._2).sum)
      assert(r.getAs[Long]("sum_b") == want.map(_._3).sum)
      assert(r.getAs[Long]("n_px") == w.toLong * h)
    }
  }

  test("AVI frame stride sampling keeps original frame indices") {
    val df = Seq(("k", Multimodal.syntheticAvi(9, 4, 4, 5))).toDF("id", "payload")
    val idxs = Multimodal.sampleVideoFrames(df, "id", "payload", stride = 2)
      .orderBy("frame_idx").collect().map(_.getAs[Int]("frame_idx")).toSeq
    assert(idxs == Seq(0, 2, 4))
  }

  test("AVI MJPEG frames decode through the JDK JPEG codec (lossy tolerance)") {
    val (seed, w, h, n) = (7L, 16, 16, 2)
    val df = Seq(("k", Multimodal.syntheticAvi(seed, w, h, n, codec = "mjpeg")))
      .toDF("id", "payload")
    val rows = Multimodal.sampleVideoFrames(df, "id", "payload")
      .orderBy("frame_idx").collect()
    assert(rows.length == n)
    rows.zipWithIndex.foreach { case (r, f) =>
      assert(r.getAs[Boolean]("decoded") && r.getAs[String]("codec") == "mjpeg")
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Long]("n_px") == w.toLong * h)
      val want = (for (x <- 0 until w; y <- 0 until h) yield aviPx(seed, f, x, y))
      val nPx = (w * h).toDouble
      // JPEG is lossy but mean-preserving to within a few counts
      assert(math.abs(r.getAs[Long]("sum_r") / nPx - want.map(_._1).sum / nPx) < 24)
      assert(math.abs(r.getAs[Long]("sum_g") / nPx - want.map(_._2).sum / nPx) < 24)
      assert(math.abs(r.getAs[Long]("sum_b") / nPx - want.map(_._3).sum / nPx) < 24)
    }
  }

  test("non-AVI and truncated AVI payloads are flagged, never throw") {
    val good = Multimodal.syntheticAvi(1, 4, 4, 2)
    val junk = Array.tabulate[Byte](64)(i => (i * 53).toByte)
    val truncated = good.take(good.length - 20) // cuts into the last frame
    val df = Seq(("ok", good), ("bad", junk), ("cut", truncated))
      .toDF("id", "payload")
    val byKey = Multimodal.sampleVideoFrames(df, "id", "payload")
      .collect().groupBy(_.getAs[String]("key"))
    assert(byKey("ok").forall(_.getAs[Boolean]("decoded")))
    assert(byKey("bad").forall(!_.getAs[Boolean]("decoded")))
    // the intact leading frame still decodes; the cut frame is flagged/absent
    assert(byKey("cut").exists(r =>
      r.getAs[Int]("frame_idx") == 0 && r.getAs[Boolean]("decoded")))
    assert(byKey("cut").forall(r =>
      r.getAs[Int]("frame_idx") == 0 || !r.getAs[Boolean]("decoded")))
  }

  test("negative RIFF chunk sizes terminate the walk (no infinite loop)") {
    // sz = -8 gives zero advance and sz = -9 (odd) oscillates: before the
    // guard both hung the executor task forever inside the UDF
    def patched(sz: Int): Array[Byte] = {
      val b = Multimodal.syntheticAvi(3, 4, 4, 2).clone()
      // first chunk after the 12-byte RIFF/AVI header: size field at 16
      b(16) = (sz & 0xff).toByte; b(17) = ((sz >> 8) & 0xff).toByte
      b(18) = ((sz >> 16) & 0xff).toByte; b(19) = ((sz >> 24) & 0xff).toByte
      b
    }
    for (sz <- Seq(-8, -9, -1, Int.MinValue)) {
      val rows = Multimodal.videoFrameFeatures(patched(sz), 1)
      assert(rows.nonEmpty && rows.forall(!_.decoded), s"sz=$sz must flag, not hang")
    }
  }

  test("undersized strf chunk (sz in 18..19) is ignored, not read past") {
    // biBitCount needs sz >= 16 and biCompression sz >= 20: a declared 18
    // used to read 2 bytes past the chunk into the next header
    def minimalAvi(strfSz: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
      def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      val strfData = new Array[Byte](strfSz + (strfSz & 1)) // data + pad
      val strlBody = 4 + (8 + 4) + (8 + strfData.length)    // "strl" + strh + strf
      val hdrlBody = 4 + (8 + strlBody)
      val frame = new Array[Byte](16)
      val moviBody = 4 + (8 + frame.length)
      tag("RIFF"); w32(4 + (8 + hdrlBody) + (8 + moviBody)); tag("AVI ")
      tag("LIST"); w32(hdrlBody); tag("hdrl")
      tag("LIST"); w32(strlBody); tag("strl")
      tag("strh"); w32(4); tag("vids")
      tag("strf"); w32(strfSz); out.write(strfData)
      tag("LIST"); w32(moviBody); tag("movi")
      tag("00db"); w32(frame.length); out.write(frame)
      out.toByteArray
    }
    for (sz <- Seq(18, 19)) {
      val rows = Multimodal.videoFrameFeatures(minimalAvi(sz), 1)
      // format ignored → the DIB frame cannot validate → flagged, no throw
      assert(rows.nonEmpty && rows.forall(!_.decoded), s"strf sz=$sz")
    }
    // control: a well-formed 40-byte strf with matching geometry decodes
    val ok = Multimodal.videoFrameFeatures(Multimodal.syntheticAvi(3, 4, 4, 1), 1)
    assert(ok.forall(_.decoded))
  }
}
