package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `abs_dev_sums_agg` (the explode-free Brown–Forsythe kernel) against
  * independent plain-Scala sums: partition-invariant merge, null-skip,
  * NaN-poison — the exact semantics of the `sum(abs(v − m))` explode form
  * it replaced.
  */
class AbsDevSumsSpec extends SparkSpec {
  import spark.implicits._

  test("abs_dev_sums_agg is partition-invariant and null/NaN-faithful") {
    val meds = Seq(0.0, 2.0, -1.5)
    val vals: Seq[java.lang.Double] =
      Seq[java.lang.Double](1.0, -2.0, 3.5, null, 0.25, 7.0, -0.5)
    def run(parts: Int): Seq[Double] =
      spark.createDataset(vals)(org.apache.spark.sql.Encoders.DOUBLE)
        .toDF("v").repartition(parts)
        .withColumn("meds", typedLit(meds))
        .agg(AbsDevSumsAgg.sums(col("v"), col("meds")).as("a"))
        .head().getSeq[Double](0)
    // independent expectation: nulls skip entirely
    val live = vals.filter(_ != null).map(_.doubleValue)
    val expected = meds.map(m => live.map(v => math.abs(v - m)).sum) ++
      meds.map(m => live.map(v => { val z = math.abs(v - m); z * z }).sum)
    for (p <- Seq(1, 7)) {
      val got = run(p)
      assert(got.length == 6)
      got.zip(expected).foreach { case (g, e) =>
        assert(math.abs(g - e) < 1e-9, s"parts=$p got=$got expected=$expected") }
    }
    // a NaN value poisons every cell, like sum(abs(v − m)) would
    val gotN = Seq(1.0, Double.NaN).toDF("v")
      .withColumn("meds", typedLit(Seq(0.0, 1.0)))
      .agg(AbsDevSumsAgg.sums(col("v"), col("meds")).as("a"))
      .head().getSeq[Double](0)
    assert(gotN.forall(_.isNaN))
  }

  test("per-group buffers stay independent across groups in one agg") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0))
      .toDF("g", "v")
      .withColumn("meds",
        when(col("g") === "a", typedLit(Seq(0.0, 2.0))).otherwise(typedLit(Seq(5.0, 20.0))))
    val m = df.groupBy("g")
      .agg(AbsDevSumsAgg.sums(col("v"), col("meds")).as("a"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // a: |1-0|+|3-0|=4, |1-2|+|3-2|=2 ; squares: 1+9=10, 1+1=2
    assert(m("a").zip(Seq(4.0, 2.0, 10.0, 2.0)).forall { case (g, e) => math.abs(g - e) < 1e-12 })
    // b: |10-5|=5, |10-20|=10 ; 25, 100
    assert(m("b").zip(Seq(5.0, 10.0, 25.0, 100.0)).forall { case (g, e) => math.abs(g - e) < 1e-12 })
  }
}
