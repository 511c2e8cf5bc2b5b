package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall guarantees for the scale-path candidate generators:
  * pigeonhole block-split simhash (exact guarantee at the Hamming
  * threshold) and multi-probe bucketed ANN (measured planted-neighbor
  * recall vs the brute-force baseline). */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("simhash block-split recovers EVERY pair at Hamming <= maxHamming (pigeonhole)") {
    val rng = new scala.util.Random(42)
    // planted partners differ in exactly 3 bits, one in each of blocks
    // 0/1/2 (bits 3, 20, 45) — a single-prefix table keyed on the top 16
    // bits would also catch these, so add a second family straddling the
    // TOP block too (bits 20, 45, 60): no contiguous 16-bit prefix is
    // clean for both families; only the pigeonhole union recovers all.
    val basesA = (0 until 40).map(i => (i * 10L, rng.nextLong()))
    val pairsA = basesA.map { case (id, s) => (id + 1, s ^ (1L << 3) ^ (1L << 20) ^ (1L << 45)) }
    val basesB = (100 until 140).map(i => (i * 10L, rng.nextLong()))
    val pairsB = basesB.map { case (id, s) => (id + 1, s ^ (1L << 20) ^ (1L << 45) ^ (1L << 60)) }
    // distance-4 pairs spread over all four blocks: above threshold,
    // must NOT be emitted
    val basesC = (200 until 220).map(i => (i * 10L, rng.nextLong()))
    val pairsC = basesC.map { case (id, s) =>
      (id + 1, s ^ (1L << 3) ^ (1L << 20) ^ (1L << 45) ^ (1L << 60))
    }
    val sig = (basesA ++ pairsA ++ basesB ++ pairsB ++ basesC ++ pairsC).toDF("id", "sim")
    val found = Dedup.simhashPairs(sig, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (basesA ++ basesB).foreach { case (id, _) =>
      assert(found.contains((id, id + 1)), s"planted Hamming-3 pair at id=$id missed")
    }
    basesC.foreach { case (id, _) =>
      assert(!found.contains((id, id + 1)), s"Hamming-4 pair at id=$id wrongly emitted")
    }
    // emitted hamming distances are correct and within threshold
    val hs = Dedup.simhashPairs(sig, maxHamming = 3)
      .select("hamming").collect().map(_.getInt(0))
    assert(hs.forall(_ <= 3))
  }

  test("nearDupSurfaces: exact non-keepers drop; planted Pages near-clones surface") {
    // hand exact group: keep-min-id, everything else drops as 'exact'
    val docs = Seq(
      ("a1", "x y z"), ("a2", "x y z"), ("a3", "x y z"),
      ("b1", "totally different content")).toDF("url", "text")
    val (_, drops, _) = Dedup.nearDupSurfaces(docs, "url", "text")
    val d = drops.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(d == Set(("a2", "exact", "a1"), ("a3", "exact", "a1")), d.toString)

    // Pages plants 1/1000 exact clones (20 at 20k rows) and 1/2000
    // near-clones (one extra token); the generator is deterministic, so
    // the near count is a fixed property of the fixture
    val pages = graft.sources.Pages.generate(spark, 20000)
    val (_, pd, _) = Dedup.nearDupSurfaces(pages, "url", "text")
    val byReason = pd.groupBy("reason").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byReason.getOrElse("exact", 0L) == 20L, byReason.toString)
    assert(byReason.getOrElse("near", 0L) >= 1L, byReason.toString)
    // every near drop names a real kept id and a within-threshold distance
    val near = pd.filter(col("reason") === "near").collect()
    assert(near.forall(_.getInt(3) <= 3))
  }

  test("bucket-cap truncation is surfaced in the NearDupCheck verdict") {
    import graft.checks.NearDupCheck
    // healthy corpus: the deterministic Pages fixture — nothing hits the
    // cap, so the capped_buckets verdict reads 0 / pass
    val pages = graft.sources.Pages.generate(spark, 20000)
    val (sig, drops, capStats) = Dedup.nearDupSurfaces(pages, "url", "text")
    val healthy = Dedup.nearDupVerdictsFrom(sig, drops, capStats,
      NearDupCheck("nd")).collect().map(r => r.getAs[String]("metric") -> r).toMap
    assert(healthy("capped_buckets").getAs[Double]("stat") == 0.0)
    assert(healthy("capped_buckets").getAs[Boolean]("pass"))
    assert(healthy("capped_buckets").getAs[Long]("n_obs") == 0L)
    sig.unpersist()

    // adversarial boilerplate: 40 docs sharing a 200-token body with one
    // unique token each — near-identical simhashes flood the candidate
    // buckets past a small cap, and the verdict must SAY so instead of
    // silently losing recall
    val body = (1 to 200).map(i => s"w$i").mkString(" ")
    val boiler = (1 to 40).map(i => (s"u$i", s"$body uniq$i")).toDF("url", "text")
    val (s2, d2, c2) = Dedup.nearDupSurfaces(boiler, "url", "text", maxBucket = 5)
    val capped = Dedup.nearDupVerdictsFrom(s2, d2, c2,
      NearDupCheck("nd", maxBucket = 5))
      .collect().map(r => r.getAs[String]("metric") -> r).toMap
    assert(capped("capped_buckets").getAs[Double]("stat") > 0.0,
      "planted boilerplate must report capped buckets")
    assert(!capped("capped_buckets").getAs[Boolean]("pass"))
    assert(capped("capped_buckets").getAs[Long]("n_obs") > 0L)
    s2.unpersist()
  }

  test("simhash pairs are emitted once even when hashes agree on several blocks") {
    val sig = Seq((1L, 0x0123456789abcdefL), (2L, 0x0123456789abcdefL)).toDF("id", "sim")
    val rows = Dedup.simhashPairs(sig, maxHamming = 3).collect()
    assert(rows.length == 1, "identical hashes agree on all 4 blocks — one pair, not 4")
    assert(rows(0).getInt(2) == 0)
  }

  test("multi-probe bucketed ANN: planted-neighbor recall >= 0.95, beats single-probe") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val corpus = emb.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray))
    val rng = new scala.util.Random(7)
    val scale = corpus.iterator.flatMap(_._2).map(math.abs(_)).sum /
      corpus.iterator.map(_._2.length).sum
    // planted queries: 100 corpus vectors + small deterministic noise;
    // the true nearest neighbor is the original vector
    val queries = corpus.take(100).map { case (id, v) =>
      (id + 1000000L, v.map(x => x + (0.05 * scale * rng.nextGaussian()).toFloat))
    }
    val qDf = queries.toSeq.toDF("vec_id", "embedding")
    def hits(probeHamming: Int): Int = {
      val top = Similarity.bucketedTopK(emb, qDf, "vec_id", "embedding",
        k = 3, bits = 8, probeHamming = probeHamming)
        .select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      queries.count { case (qid, _) => top.contains((qid, qid - 1000000L)) }
    }
    val multi = hits(1)
    val single = hits(0)
    assert(multi >= 95, s"multi-probe planted recall ${multi}/100 below 0.95")
    assert(multi >= single, s"multi-probe ($multi) must not trail single-probe ($single)")
    // brute force (the exact baseline) finds the planted neighbor ~always;
    // multi-probe must be within 5 points of it
    val brute = {
      val top = Similarity.bruteForceTopK(emb, qDf, "vec_id", "embedding", 3)
        .select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      queries.count { case (qid, _) => top.contains((qid, qid - 1000000L)) }
    }
    assert(brute - multi <= 5, s"multi-probe ($multi) too far from brute force ($brute)")
  }
}
