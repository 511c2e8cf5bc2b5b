package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract run as
  * per-partition batch transforms.
  *
  * The actual codecs are NOT in this container (no image/audio libs —
  * builder brief), so `decodeStub` derives a deterministic fake feature
  * vector from the bytes; the Spark-side contract — schema, partition
  * batching, null passthrough, binary hygiene — is real and tested. Swap
  * `fakeFeatures` for a JNI/even pandas-UDF decoder in production; the plan
  * shape (mapPartitions over Arrow-sized batches, projection pushdown of
  * only (key, binary) columns) is unchanged.
  */
object Multimodal {

  final case class MediaMeta(key: String, mime: String, nBytes: Long, sha: String)

  /** Metadata extraction — pure column ops, pushdown-friendly. */
  def describeBinary(df: DataFrame, keyCol: String, binCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      lit("application/octet-stream").as("mime"),
      length(col(binCol)).cast("long").as("n_bytes"),
      sha2(col(binCol), 256).as("sha"))

  /** Deterministic fake "decode → feature vector": 8 floats folded from the
    * payload bytes. Stands in for image-resize / audio-fingerprint; marked
    * clearly as a stub per the builder brief. */
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

  /** Batched decode: one feature row per input row; executes per partition,
    * no shuffle; binary column pruned at the scan when only (key, bin) are
    * selected upstream. */
  def decodeStub(df: DataFrame, keyCol: String, binCol: String): DataFrame = {
    val featUdf = udf((b: Array[Byte]) => fakeFeatures(b))
    df.select(col(keyCol).cast("string").as("key"), col(binCol).as("payload"))
      .withColumn("features", featUdf(col("payload")))
      .select("key", "features")
  }

  /** Frame-sample stub for video-shaped payloads: every `stride`-th 16-byte
    * block becomes one "frame" digest — demonstrates the explode-to-frames
    * shape (one row per sampled frame) without real codecs. */
  def frameSampleStub(df: DataFrame, keyCol: String, binCol: String, stride: Int = 4): DataFrame =
    df.select(col(keyCol).cast("string").as("key"), col(binCol).as("payload"))
      .withColumn("n_frames", greatest(floor(length(col("payload")) / (16 * stride)), lit(1)).cast("int"))
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1)))
      .withColumn("frame_digest",
        sha2(concat(col("payload"), col("frame_idx").cast("string").cast("binary")), 256))
      .select("key", "frame_idx", "frame_digest")
}
