package graft.operators

import graft.functions.{SimHash64, TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite for web-text corpora — exact, MinHash+LSH, SimHash
  * and n-gram-Jaccard near-dup. All candidate generation is bucket-local:
  * signatures are computed per-row (no shuffle), candidates pair up only
  * inside an LSH band bucket / simhash prefix bucket, so the shuffle
  * carries (doc, bucket) pairs — never the O(n²) cross product.
  */
object Dedup {

  /** Bound on the per-group id sample in `exactGroups`: one degenerate hot
    * fingerprint (e.g. empty text over a 10^12-row corpus) must not build
    * a multi-million-element array anywhere — not in the result row and
    * not in an aggregation buffer. */
  val MaxSampleIds = 100

  /** Default per-bucket membership cap for the bucket-local self-joins:
    * a boilerplate-heavy bucket (the same cookie banner on 10⁷ pages)
    * would otherwise pair quadratically. Buckets are truncated to the
    * first `DefaultMaxBucket` members by id — deterministic, bounds the
    * worst bucket at cap² pairs; the truly identical members of a hot
    * bucket are exact-dups and caught by `exactGroups` regardless.
    * Documented recall tradeoff, tunable per call. */
  val DefaultMaxBucket = 5000

  /** Keep at most `cap` rows per bucket, deterministically (ordered by
    * `orderCol`). The row_number window hash-partitions on the bucket —
    * the SAME partitioning the following self-join needs, so this adds a
    * sort but no extra shuffle round. */
  private[operators] def capBucket(df: DataFrame, bucketCol: String,
      orderCol: String, cap: Int): DataFrame =
    df.withColumn("__bn",
        row_number().over(Window.partitionBy(bucketCol).orderBy(col(orderCol))))
      .filter(col("__bn") <= cap)
      .drop("__bn")

  /** Exact duplicate groups by normalized-text fingerprint.
    * Returns (fingerprint, n_docs, keep_id, all_ids) where all_ids is the
    * first `MaxSampleIds` ids by id order (n_docs carries the true count).
    *
    * Two phases so the id list is bounded end to end: phase 1 is the plain
    * partial hash-agg (count + min only — fixed-size buffers, md5 keys are
    * uniform → no skew); phase 2 semi-joins the duplicate rows (tiny
    * subset) and samples ≤ MaxSampleIds ids per group via a capped
    * row_number — the hot group sorts/spills, it never materializes an
    * unbounded array. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withFp = df.withColumn("fp", TF.fingerprint(col(textCol)))
    val groups = withFp.groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .filter(col("n_docs") > 1)
    val w = Window.partitionBy("fp").orderBy(col(idCol))
    val sample = withFp
      .join(groups.select("fp"), Seq("fp"), "left_semi")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= MaxSampleIds)
      .groupBy("fp")
      .agg(sort_array(collect_list(col(idCol))).as("all_ids"))
    groups.join(sample, Seq("fp"))
      .select("fp", "n_docs", "keep_id", "all_ids")
  }

  /** Rows to drop under exact dedup (everything but the min id per group). */
  def exactDropList(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy("fp").orderBy(col(idCol))
    df.withColumn("fp", TF.fingerprint(col(textCol)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select(col(idCol).as("drop_id"), col("fp"))
  }

  /** MinHash+LSH near-duplicate candidate pairs with estimated Jaccard.
    *
    * shingle → k-min signature (per-row) → band keys → explode(bands) →
    * self-join within band bucket → distinct pairs → signature-agreement
    * estimate; optionally verified with exact n-gram Jaccard.
    *
    * @param bands × rowsPerBand = signature length k.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, bands: Int = 4, rowsPerBand: Int = 3,
      minEstJaccard: Double = 0.5, verifyExact: Boolean = true,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val k = bands * rowsPerBand
    // cache the signature frame: Catalyst's project-collapse would otherwise
    // re-inline the k-hash signature expression into every band element and
    // both join sides — k× redundant md5 work and enormous codegen. At
    // production scale this frame is written to the table store instead.
    val sig0 = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", TF.minhashSignature(col("text"), shingleN, k))
      .cache()
      .withColumn("band", explode(TF.lshBands(col("sig"), bands, rowsPerBand)))
    val sig = capBucket(sig0, "band", "id", maxBucket)
    val a = sig.select(col("band"), col("id").as("id_a"), col("sig").as("sig_a"),
      col("text").as("text_a"))
    val b = sig.select(col("band"), col("id").as("id_b"), col("sig").as("sig_b"),
      col("text").as("text_b"))
    val est = a.join(b, Seq("band")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1.0).otherwise(0.0)),
          lit(0.0), (acc, v) => acc + v) / lit(k.toDouble))
      .filter(col("est_jaccard") >= minEstJaccard)
    val out =
      if (verifyExact)
        est.withColumn("jaccard", TF.ngramJaccard(col("text_a"), col("text_b"), shingleN))
      else est.withColumn("jaccard", lit(null).cast("double"))
    out.select("id_a", "id_b", "est_jaccard", "jaccard")
  }

  /** SimHash near-dup candidates: bucket by the top `prefixBits` of the
    * 64-bit simhash, pair within bucket, keep pairs under the Hamming
    * threshold. (Production variant: q tables with rotated prefixes to
    * guarantee recall; one table suffices for the planted-duplicate tests.) */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
      prefixBits: Int = 16, maxHamming: Int = 3,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val withSig0 = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sim", SimHash64.ofText(col("text")))
      .withColumn("bucket", shiftrightunsigned(col("sim"), 64 - prefixBits))
    val withSig = capBucket(withSig0, "bucket", "id", maxBucket)
    val a = withSig.select(col("bucket"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = withSig.select(col("bucket"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", SimHash64.hamming(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
