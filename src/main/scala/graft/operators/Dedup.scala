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

  /** Exact duplicate groups by normalized-text fingerprint.
    * Returns (fingerprint, n_docs, keep_id, dup_ids). Partial hash-agg
    * map-side; the md5 group key is uniformly distributed → no skew. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fp", TF.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"),
        min(col(idCol)).as("keep_id"),
        sort_array(collect_list(col(idCol))).as("all_ids"))
      .filter(col("n_docs") > 1)

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
      minEstJaccard: Double = 0.5, verifyExact: Boolean = true): DataFrame = {
    val k = bands * rowsPerBand
    // cache the signature frame: Catalyst's project-collapse would otherwise
    // re-inline the k-hash signature expression into every band element and
    // both join sides — k× redundant md5 work and enormous codegen. At
    // production scale this frame is written to the table store instead.
    val sig = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", TF.minhashSignature(col("text"), shingleN, k))
      .cache()
      .withColumn("band", explode(TF.lshBands(col("sig"), bands, rowsPerBand)))
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
      prefixBits: Int = 16, maxHamming: Int = 3): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sim", SimHash64.ofText(col("text")))
      .withColumn("bucket", shiftrightunsigned(col("sim"), 64 - prefixBits))
    val a = withSig.select(col("bucket"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = withSig.select(col("bucket"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", SimHash64.hamming(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
