package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against the corpus, ONE pass, ranked per query with a window. The
  * scale path buckets both sides with a deterministic sign-pattern LSH
  * (VectorFunctions.signBucket) so candidates only pair within a cell —
  * the join becomes a bucket equi-join and the per-query candidate count
  * drops by ~2^bits. All vector math is builtin higher-order functions
  * (codegen), no UDF.
  */
object Similarity {

  /** Brute-force top-k: every (query, corpus) cosine, ranked per query.
    * `queries` must be small (broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** LSH-bucketed ANN: sign-pattern cell id on both sides, equi-join on the
    * cell, rank within query.
    *
    * `probeHamming = 0` probes only the query's own cell (cheapest, lowest
    * recall — a neighbor whose sign pattern differs in one dim is missed
    * when its coordinate sits near 0). `probeHamming = 1` is multi-probe:
    * the query side explodes to its cell plus all `bits` Hamming-1
    * neighbor cells, so a single borderline sign flip can no longer lose
    * the neighbor. The corpus side stays single-cell — the join is still a
    * bucket equi-join, the candidate count grows only (bits+1)× on the
    * (small, broadcast) query side. */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 8, probeHamming: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
      .withColumn("cell", VectorFunctions.signBucket(col("cvec"), bits))
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("cell0", VectorFunctions.signBucket(col("qvec"), bits))
    val q =
      if (probeHamming <= 0) q0.withColumn("cell", col("cell0")).drop("cell0")
      else {
        // probe set: own cell + every cell one sign-flip away (distinct by
        // construction — no pair dedup needed downstream)
        val probes = col("cell0") +:
          (0 until bits).map(b => col("cell0").bitwiseXOR(lit(1L << b)))
        q0.withColumn("cell", explode(array(probes: _*))).drop("cell0")
      }
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: same-cell pairs above a
    * cosine threshold — the embedding flavor of Dedup. */
  def cosineNearDups(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 8,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    // hot-cell cap: a degenerate embedding cell (e.g. all-zero vectors)
    // pairs quadratically — truncate to the first maxBucket members by id
    // (same mechanism as Dedup's bucket-local joins: count-detect the hot
    // cells, rank only their rows, cold rows pass through map-side)
    val c0 = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("cell", VectorFunctions.signBucket(col("vec"), bits))
    val c = Dedup.capBucket(c0, "cell", "id", maxBucket)
    val a = c.select(col("cell"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = c.select(col("cell"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("cell")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
