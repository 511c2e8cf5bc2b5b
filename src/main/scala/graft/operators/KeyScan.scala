package graft.operators

import graft.engine.CacheTracker.TrackedCacheOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fused phase-1 key scan shared by Uniqueness and ByteIdentity.
  *
  * Both checks' first phase is a full-table `groupBy(xxhash64(key))` —
  * uniqueness needs per-bucket counts, byte-identity needs min/max payload
  * digests. Run separately that is two full scans + two shuffles of the
  * same 8-byte key hashes; fused it is ONE pass emitting both:
  *
  *   groupBy(xxhash64(key)).agg(count, min(digest64), max(digest64))
  *
  * A bucket with n == 1 necessarily has min == max digest, so the single
  * `count > 1` filter retains every candidate either check needs; the
  * byte-identity candidates are the subset with diverging digests. Each
  * check's phase 2 stays exact (full-key groupBy / full sha2-256), so the
  * fusion changes cost, not semantics.
  */
object KeyScan {

  /** One-pass candidate frame: (__kh, __n, __a, __b) for buckets with >1
    * row. Cached — verdicts + violations of both checks reuse it. */
  def phase1(df: DataFrame, keyCols: Seq[String], payloadCol: String): DataFrame =
    df.groupBy(xxhash64(keyCols.map(col): _*).as("__kh"))
      .agg(count(lit(1)).as("__n"),
        min(ByteIdentity.digest64(col(payloadCol))).as("__a"),
        max(ByteIdentity.digest64(col(payloadCol))).as("__b"))
      .filter(col("__n") > 1)
      .trackedCache()

  /** Uniqueness phase-2 input: every bucket with more than one row. */
  def uniqueCandidates(phase1: DataFrame): DataFrame = phase1.select("__kh")

  /** Byte-identity phase-2 input: buckets whose payload digests diverge. */
  def byteCandidates(phase1: DataFrame): DataFrame =
    phase1.filter(col("__a") =!= col("__b")).select("__kh")

  /** Fused phase 2: because a divergent-digest bucket necessarily has >1
    * row, byteCandidates ⊆ uniqueCandidates — so ONE semi-join on the
    * phase-1 candidates and ONE exact groupBy(key) serves both checks'
    * second phase (run separately that is two full input scans + two
    * shuffles):
    *
    *   (key..., dup_count, n_digests) for every key with dup_count > 1
    *
    * dup_count is Uniqueness's exact per-key count (hash-collision rows
    * land in a candidate bucket but group to dup_count = 1 here and are
    * filtered — same exactness argument as the unfused phase 2);
    * n_digests counts distinct full sha2-256 payload digests, so a
    * reported byte conflict is never a 64-bit-hash artifact. Cached —
    * verdicts + violations of both checks reuse it.
    *
    * Join strategy is picked HERE, not left to the static planner: the
    * candidate frame is a filtered aggregate whose size Catalyst cannot
    * estimate, so the static plan is a sort-merge semi-join that shuffles
    * the ENTIRE input — and AQE materializes that exchange before it can
    * convert the join (measured: a 5.7 GB full-table exchange at 30 M
    * pages, the single most expensive stage in the suite). Phase 1 is
    * cached, so counting it is cheap; when the candidate set is small
    * (dup-rate bounded — the design point) it is broadcast and the big
    * side never shuffles. The fallback for candidate sets past the
    * threshold (spark.graft.broadcast.candidates.max, default 8M hashes
    * = 64 MB) projects the fat payload down to its 32-byte sha2 digest
    * BEFORE the exchange, so even the sort-merge path never shuffles
    * payload bytes. */
  def phase2(df: DataFrame, keyCols: Seq[String], payloadCol: String,
      p1: DataFrame): DataFrame = {
    val bcMax = df.sparkSession.conf
      .get("spark.graft.broadcast.candidates.max", "8000000").toLong
    val nCand = p1.count() // p1 is trackedCache'd — materialized once
    val joined =
      if (nCand <= bcMax)
        df.withColumn("__kh", xxhash64(keyCols.map(col): _*))
          .join(broadcast(p1.select("__kh")), Seq("__kh"), "left_semi")
          .select(keyCols.map(col) :+
            sha2(col(payloadCol).cast("binary"), 256).as("__dg"): _*)
      else
        df.select(keyCols.map(col) :+
            sha2(col(payloadCol).cast("binary"), 256).as("__dg"): _*)
          .withColumn("__kh", xxhash64(keyCols.map(col): _*))
          .join(p1.select("__kh"), Seq("__kh"), "left_semi")
          .drop("__kh")
    joined
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("dup_count"),
        countDistinct(col("__dg")).as("n_digests"))
      .filter(col("dup_count") > 1)
      .trackedCache()
  }
}
