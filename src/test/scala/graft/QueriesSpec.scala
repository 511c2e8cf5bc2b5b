package graft

import org.apache.spark.sql.functions._

/** Every driver-contract query runs at sf0.001 and returns rows; oracle
  * equivalence is exercised by the driver (and tools/compare_oracle.py)
  * at sf0.01. */
class QueriesSpec extends SparkSpec {

  SparkEntry.allSpecs.foreach { spec =>
    test(s"${spec.name} runs at sf0.001") {
      val df = spec.fn(spark, sf("sf0.001"))
      assert(df.columns.nonEmpty)
      // most queries return rows even at the smallest scale; a handful of
      // threshold-filtered ones may legitimately be empty — just execute
      assert(df.count() >= 0)
    }
  }

  test("oracle SQL exists for every SQL-expressible query, names match") {
    val qNames = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qNames))
    assert(SparkEntry.oracleSql.size >= 30, "oracle coverage")
  }

  test("entry returns verdict rows on the flagship suite") {
    val e = SparkEntry.entry(spark)
    assert(e.count() > 0)
    assert(e.columns.contains("check_id") && e.columns.contains("pass"))
  }

  test("dedup operators find the planted duplicates on documents") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val withDups = docs.unionByName(
      docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val groups = graft.operators.Dedup.exactGroups(withDups, "doc_id", "text")
    assert(groups.count() == 20)
    val drops = graft.operators.Dedup.exactDropList(withDups, "doc_id", "text")
    assert(drops.count() == 20)
    val sim = graft.operators.Dedup.simhashCandidates(withDups, "doc_id", "text",
      maxHamming = 0)
    assert(sim.count() >= 20) // identical docs share identical simhash
  }

  test("exactGroups caps the id sample on a degenerate hot fingerprint") {
    import spark.implicits._
    // 10k rows of identical text — a boilerplate-degenerate group
    val hot = (1L to 10000L).map(i => (i, "the same boilerplate page"))
    val tail = Seq((20001L, "unique a"), (20002L, "unique b"))
    val df = (hot ++ tail).toDF("doc_id", "text")
    val g = graft.operators.Dedup.exactGroups(df, "doc_id", "text").collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("n_docs") == 10000L, "true count preserved")
    assert(g(0).getAs[Long]("keep_id") == 1L)
    val ids = g(0).getSeq[Long](3)
    assert(ids.size == graft.operators.Dedup.MaxSampleIds, s"sample capped, got ${ids.size}")
    assert(ids == (1L to graft.operators.Dedup.MaxSampleIds.toLong))
  }

  test("bucket-local self-joins cap the hot bucket (boilerplate corpus)") {
    import spark.implicits._
    // 500 identical texts land in ONE simhash bucket; with maxBucket=10
    // the candidate pairs are bounded at C(10,2), deterministically the
    // lowest ids — not C(500,2)
    val hot = (1L to 500L).map(i => (i, "cookie banner accept all cookies please"))
    val df = (hot ++ Seq((9001L, "totally unrelated text one two three"))).toDF("doc_id", "text")
    val sim = graft.operators.Dedup.simhashCandidates(df, "doc_id", "text",
      maxHamming = 0, maxBucket = 10).collect()
    assert(sim.length == 45, s"expected C(10,2)=45 capped pairs, got ${sim.length}")
    assert(sim.map(_.getAs[Long]("id_a")).max <= 10)
    val mh = graft.operators.Dedup.minhashCandidates(df, "doc_id", "text",
      verifyExact = false, maxBucket = 10)
      .collect()
    assert(mh.length == 45, s"minhash band bucket capped, got ${mh.length}")
    // embedding flavor: identical vectors share a cell
    val vecs = (1L to 300L).map(i => (i, Array(1.0f, 0.5f, -0.25f))) :+
      (9002L, Array(-1.0f, 2.0f, 0.0f))
    val nd = graft.operators.Similarity.cosineNearDups(
      vecs.toDF("doc_id", "vec"), "doc_id", "vec", threshold = 0.99, maxBucket = 10).collect()
    assert(nd.length == 45, s"cosine cell capped, got ${nd.length}")
  }
}
