package graft

import graft.functions.SimHash64
import graft.operators.Dedup
import graft.sources.Pages
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: measure the simhash combo-bucket size distribution on the
  * synthetic pages fixture — the candidate-pair volume of the NearDup
  * check is Σ min(size, cap)² / 2 over buckets, and it must stay LINEAR
  * in rows for the suite to survive the 100 TB posture. Prints the
  * bucket-count histogram and the implied capped pair volume, then times
  * the full nearDupSurfaces drop computation.
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_GRAFT_PAGES", "2000000").toLong
    val maxHamming = 3
    val cap = Dedup.DefaultMaxBucket

    val pages = Pages.generate(spark, n, 128).select("url", "text")
    val sig = pages.select(col("url").as("id"),
      SimHash64.ofText(col("text")).as("sim")).cache()
    val t0 = System.nanoTime()
    println(s"[probe] rows=${sig.count()} (${(System.nanoTime() - t0) / 1e9}%.1f s sig)")

    // replicate simhashPairs' combo keying to inspect bucket sizes
    val nBlocks = maxHamming + 3
    val width = 64 / nBlocks
    def blockBits(i: Int) = {
      val lo = i * width
      val w = if (i == nBlocks - 1) 64 - lo else width
      val mask = if (w == 64) -1L else (1L << w) - 1L
      shiftrightunsigned(col("sim"), lo).bitwiseAND(lit(mask))
    }
    def blockWidth(i: Int): Int = if (i == nBlocks - 1) 64 - i * width else width
    val combos = (0 until nBlocks).combinations(3).toSeq
    val keys = combos.zipWithIndex.map { case (combo, ci) =>
      val bits = combo.foldLeft(lit(0L)) { (acc, bi) =>
        shiftleft(acc, blockWidth(bi)).bitwiseOR(blockBits(bi))
      }
      shiftleft(lit(ci.toLong), 56).bitwiseOR(bits) // one-long pack, as simhashPairs
    }
    val sizes = sig.select(explode(array(keys: _*)).as("bucket"))
      .groupBy("bucket").count().cache()
    sizes.agg(
      count(lit(1)).as("n_buckets"),
      max("count").as("max_size"),
      sum(when(col("count") > cap, 1L).otherwise(0L)).as("n_capped"),
      sum(least(col("count"), lit(cap.toLong)) * least(col("count"), lit(cap.toLong)) / 2)
        .as("capped_pair_volume")).show(false)
    sizes.select(
      sum(when(col("count") === 1, 1L).otherwise(0L)).as("singletons"),
      sum(when(col("count").between(2, 10), 1L).otherwise(0L)).as("b2_10"),
      sum(when(col("count").between(11, 100), 1L).otherwise(0L)).as("b11_100"),
      sum(when(col("count").between(101, 1000), 1L).otherwise(0L)).as("b101_1k"),
      sum(when(col("count") > 1000, 1L).otherwise(0L)).as("b_gt1k")).show(false)

    // stage attribution for the NearDupCheck surface (dev timings; each
    // stage forced with a noop write or count so wall maps to ONE stage)
    def timed[T](label: String)(f: => T): T = {
      val t = System.nanoTime()
      val r = f
      println(f"[probe] stage $label%-22s ${(System.nanoTime() - t) / 1e9}%6.1f s")
      r
    }
    import graft.functions.{TextFunctions => TF}
    val sigFull = pages.select(col("url").as("id"),
      TF.fingerprint(col("text")).as("fp"),
      SimHash64.ofText(col("text")).as("sim")).cache()
    timed("sig fp+sim cache")(sigFull.count())
    timed("sim only (cached ref)")(sig.count())
    val expl = sigFull.select(col("id"), col("sim"),
      explode(array(keys: _*)).as("bucket"))
    timed("explode pass")(expl.write.format("noop").mode("overwrite").save())
    val pairsOnly = Dedup.simhashPairs(sigFull.select("id", "sim"), maxHamming, cap)
    timed("pair join+dedup")(pairsOnly.write.format("noop").mode("overwrite").save())

    val t1 = System.nanoTime()
    val (_, drops, _) = Dedup.nearDupSurfaces(pages, "url", "text", maxHamming)
    val byReason = drops.groupBy("reason").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(f"[probe] nearDupSurfaces ${(System.nanoTime() - t1) / 1e9}%.1f s drops=$byReason")
    spark.stop()
  }
}
