package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The distributed `VarComp.estimates` must be numerically equivalent to
  * the driver-side `fromResidualStats` (same MoM sums, re-associated) and
  * must stay one-row-per-scope regardless of subject count — this is the
  * round-2 guard for the "no subject-proportional driver collect" fix.
  */
class VarCompSpec extends SparkSpec {
  import spark.implicits._

  private def subjStats(rows: Seq[(String, String, Double)]) =
    rows.toDF("__key", "subj", "r")
      .groupBy("__key", "subj")
      .agg(count(lit(1)).as("n"), sum("r").as("s"), sum(col("r") * col("r")).as("ss"))

  test("estimates ≡ fromResidualStats on a mixed fixture") {
    val rng = new scala.util.Random(3)
    val rows = for {
      key <- Seq("A", "B")
      subj <- 1 to 17
      t <- 1 to (subj % 5 + 1)
    } yield (key, s"s$subj", (if (key == "A") 1.0 else 3.0) * rng.nextGaussian() + subj * 0.1)
    val stats = subjStats(rows)
    val got = VarComp.estimates(stats).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    for (key <- Seq("A", "B")) {
      val per = rows.filter(_._1 == key).groupBy(_._2).map { case (_, xs) =>
        val vs = xs.map(_._3)
        (vs.size.toLong, vs.sum, vs.map(v => v * v).sum)
      }.toSeq
      val want = VarComp.fromResidualStats(per)
      assert(math.abs(got(key)._1 - want.sigmaB2) < 1e-9, s"$key sigmaB2")
      assert(math.abs(got(key)._2 - want.sigmaE2) < 1e-9, s"$key sigmaE2")
      assert(got(key)._3 == want.nSubjects && got(key)._4 == want.nRows)
    }
  }

  test("estimates emits exactly one row per scope at high subject cardinality") {
    val rows = (1 to 5000).flatMap(s => Seq(("K1", s"s$s", s * 0.01), ("K2", s"s$s", s * 0.02)))
    val est = VarComp.estimates(subjStats(rows))
    assert(est.count() == 2, "scope-level frame must not scale with subjects")
  }

  test("single-observation subjects → sigma_e2 NaN, whitening NaN (matches whitenCoeffs)") {
    val rows = Seq(("K", "s1", 1.0), ("K", "s2", 2.0), ("K", "s3", 3.0))
    val est = VarComp.estimates(subjStats(rows)).collect()(0)
    assert(est.getDouble(2).isNaN, "n == k → msw undefined")
    val joined = rows.toDF("__key", "subj", "r")
      .join(VarComp.estimates(subjStats(rows)), "__key")
      .withColumn("rs", VarComp.whitenExpr(lit(1L), col("r"), col("r")))
    assert(joined.collect().forall(_.getAs[Double]("rs").isNaN))
  }

  test("whitenExpr matches whitenCoeffs arithmetic") {
    val est = VarComp.Estimate(sigmaB2 = 0.7, sigmaE2 = 2.3, 10, 40)
    val (a, b) = VarComp.whitenCoeffs(est, 4)
    val want = a * 1.5 + b * 3.25
    val got = Seq((1.5, 3.25)).toDF("r", "rsum")
      .withColumn("sigma_b2", lit(0.7)).withColumn("sigma_e2", lit(2.3))
      .select(VarComp.whitenExpr(lit(4L), col("r"), col("rsum")).as("rs"))
      .collect()(0).getDouble(0)
    assert(math.abs(got - want) < 1e-12)
  }
}
