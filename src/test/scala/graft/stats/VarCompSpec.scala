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

  test("REML equals ANOVA/MoM on balanced data (classic equivalence)") {
    // balanced one-way random effects with MSB > MSW: REML = ANOVA estimator
    val rng = new scala.util.Random(11)
    val rows = for (s <- 1 to 12; _ <- 1 to 6)
      yield ("K", s"s$s", 2.0 * s + 0.5 * rng.nextGaussian())
    val per = rows.groupBy(_._2).map { case (_, xs) =>
      val vs = xs.map(_._3); (vs.size.toLong, vs.sum, vs.map(v => v * v).sum)
    }.toSeq
    val mom = VarComp.fromResidualStats(per)
    assert(mom.sigmaB2 > mom.sigmaE2, "fixture must have strong between-variance")
    val sz = per.groupBy(_._1).map { case (n, xs) =>
      VarComp.SizeStat(n, xs.size, xs.map(_._2).sum,
        xs.map(x => x._2 * x._2).sum, xs.map(_._3).sum)
    }.toSeq
    val reml = VarComp.remlFromSizeStats(sz)
    // MoM centers at the grand mean, REML at the GLS mean — identical for
    // balanced data, so the estimators coincide exactly
    assert(math.abs(reml.sigmaB2 - mom.sigmaB2) / mom.sigmaB2 < 1e-5, s"$reml vs $mom")
    assert(math.abs(reml.sigmaE2 - mom.sigmaE2) / mom.sigmaE2 < 1e-5)
  }

  test("REML is the matrix-likelihood optimum on unbalanced data") {
    // independent oracle: the full matrix REML criterion
    //   h(σ²_b, σ²ₑ) = log|V| + log(1'V⁻¹1) + r'V⁻¹r − (1'V⁻¹r)²/(1'V⁻¹1)
    // computed with explicit per-subject matrices (commons-math3 LU) —
    // none of the profile algebra under test. The profile-REML estimate
    // must beat every grid perturbation around it.
    import org.apache.commons.math3.linear._
    val rng = new scala.util.Random(7)
    val sizes = Seq(2, 3, 3, 5, 7, 10, 1, 4)
    val subj = sizes.zipWithIndex.map { case (n, i) =>
      val b = 1.7 * rng.nextGaussian()
      (s"s$i", Seq.fill(n)(b + 0.9 * rng.nextGaussian()))
    }
    def h(sb2: Double, se2: Double): Double = {
      var logdet = 0.0; var q11 = 0.0; var q1r = 0.0; var qrr = 0.0
      subj.foreach { case (_, vs) =>
        val n = vs.size
        val v = new Array2DRowRealMatrix(n, n)
        for (i <- 0 until n; j <- 0 until n)
          v.setEntry(i, j, (if (i == j) se2 else 0.0) + sb2)
        val lu = new LUDecomposition(v)
        logdet += math.log(lu.getDeterminant)
        val inv = lu.getSolver.getInverse
        val one = new ArrayRealVector(Array.fill(n)(1.0))
        val r = new ArrayRealVector(vs.toArray)
        q11 += inv.operate(one).dotProduct(one)
        q1r += inv.operate(one).dotProduct(r)
        qrr += inv.operate(r).dotProduct(r)
      }
      logdet + math.log(q11) + qrr - q1r * q1r / q11
    }
    val per = subj.map { case (_, vs) => (vs.size.toLong, vs.sum, vs.map(x => x * x).sum) }
    val sz = per.groupBy(_._1).map { case (n, xs) =>
      VarComp.SizeStat(n, xs.size, xs.map(_._2).sum,
        xs.map(x => x._2 * x._2).sum, xs.map(_._3).sum)
    }.toSeq
    val est = VarComp.remlFromSizeStats(sz)
    assert(est.sigmaB2 > 0 && est.sigmaE2 > 0, s"fixture should be interior: $est")
    val hHat = h(est.sigmaB2, est.sigmaE2)
    for (fb <- Seq(0.7, 0.85, 1.2, 1.5); fe <- Seq(0.7, 0.85, 1.0, 1.2, 1.5)) {
      assert(hHat <= h(est.sigmaB2 * fb, est.sigmaE2 * fe) + 1e-7,
        s"perturbation ($fb,$fe) beats the REML optimum")
    }
    for (fe <- Seq(0.7, 0.85, 1.2, 1.5))
      assert(hHat <= h(est.sigmaB2, est.sigmaE2 * fe) + 1e-7)
  }

  test("remlEstimates DataFrame path ≡ remlFromSizeStats, one row per scope") {
    val rng = new scala.util.Random(5)
    val rows = for {
      key <- Seq("A", "B"); s <- 1 to 23; _ <- 1 to (s % 4 + 1)
    } yield (key, s"s$s", (if (key == "A") 1.0 else 2.0) * rng.nextGaussian() + s * 0.3)
    val df = VarComp.remlEstimates(subjStats(rows))
    val got = df.collect().map(r =>
      r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == 2)
    for (key <- Seq("A", "B")) {
      val per = rows.filter(_._1 == key).groupBy(_._2).map { case (_, xs) =>
        val vs = xs.map(_._3); (vs.size.toLong, vs.sum, vs.map(v => v * v).sum)
      }.toSeq
      val sz = per.groupBy(_._1).map { case (n, xs) =>
        VarComp.SizeStat(n, xs.size, xs.map(_._2).sum,
          xs.map(x => x._2 * x._2).sum, xs.map(_._3).sum)
      }.toSeq
      val want = VarComp.remlFromSizeStats(sz)
      // distributed sums re-associate floats; the flat optimum region
      // amplifies that into ~1e-7 on the estimates — not an algorithm gap
      assert(math.abs(got(key)._1 - want.sigmaB2) < 1e-5 * math.max(1.0, want.sigmaB2), s"$key sigmaB2")
      assert(math.abs(got(key)._2 - want.sigmaE2) < 1e-5 * math.max(1.0, want.sigmaE2), s"$key sigmaE2")
      assert(got(key)._3 == want.nSubjects && got(key)._4 == want.nRows)
    }
  }

  test("LongitudinalOutlier method=reml runs end-to-end and flags like mom on clean data") {
    val rng = new scala.util.Random(9)
    val rows = for (s <- 1 to 10; t <- 1 to 8) yield
      ("u" + s, t, 5.0 + 0.2 * s + (if (s == 3 && t == 4) 25.0 else rng.nextGaussian()))
    val df = rows.toDF("user_id", "t", "value")
    import graft.checks.LongitudinalOutlierCheck
    val mom = graft.operators.LongitudinalOutlier.flagged(df,
      LongitudinalOutlierCheck("lo", "value", "user_id", cutoffPct = 99))
      .filter(col("flag_outlier")).select("user_id", "t").collect().toSet
    val reml = graft.operators.LongitudinalOutlier.flagged(df,
      LongitudinalOutlierCheck("lo", "value", "user_id", cutoffPct = 99, method = "reml"))
      .filter(col("flag_outlier")).select("user_id", "t").collect().toSet
    assert(reml.exists(r => r.getString(0) == "u3"), "planted spike flagged under reml")
    assert(mom.exists(r => r.getString(0) == "u3"), "planted spike flagged under mom")
  }

  test("remlFromSizeStats degenerate branches: no per-subject expansion, MoM-consistent") {
    // all-singleton subjects (n == k): σ²_b unidentifiable → 0, MSW has
    // 0 df → NaN, matching the distributed MoM path — and it must work at
    // counts that would overflow an Int if expanded per-subject
    val singletons = Seq(VarComp.SizeStat(1L, 3000000000L, 1.0e9, 4.0e9, 6.0e9))
    val e1 = VarComp.remlFromSizeStats(singletons)
    assert(e1.sigmaB2 == 0.0 && e1.sigmaE2.isNaN)
    assert(e1.nSubjects == 3000000000L && e1.nRows == 3000000000L)
    // one subject (k == 1): σ²_b → 0, MSW = sample variance of its rows
    val vs = Seq(1.0, 2.0, 4.0, 7.0)
    val one = Seq(VarComp.SizeStat(vs.size, 1, vs.sum,
      vs.sum * vs.sum, vs.map(v => v * v).sum))
    val e2 = VarComp.remlFromSizeStats(one)
    val mean = vs.sum / vs.size
    val wantMsw = vs.map(v => (v - mean) * (v - mean)).sum / (vs.size - 1)
    assert(e2.sigmaB2 == 0.0 && math.abs(e2.sigmaE2 - wantMsw) < 1e-12)
    // matches the per-subject MoM arithmetic exactly
    val mom = VarComp.fromResidualStats(Seq((vs.size.toLong, vs.sum, vs.map(v => v * v).sum)))
    assert(math.abs(e2.sigmaE2 - mom.sigmaE2) < 1e-12)
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
