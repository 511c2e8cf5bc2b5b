package graft.stats

import graft.SparkSpec
import graft.operators.OlsPass
import org.apache.commons.math3.linear.{Array2DRowRealMatrix, ArrayRealVector, LUDecomposition}
import org.apache.spark.sql.functions._

/** Golden tests for the feasible-GLS refit: the engine's sufficient-
  * statistics solve must reproduce a dense textbook GLS
  * β = (X'V⁻¹X)⁻¹X'V⁻¹y with V built explicitly per subject. */
class FglsSpec extends SparkSpec {
  import spark.implicits._

  /** Unbalanced two-covariate fixture: 6 subjects, sizes 1..6, strong
    * subject effect so GLS and OLS genuinely differ. */
  private def fixture(): Seq[(String, Double, Double)] = {
    val rng = new scala.util.Random(11)
    for {
      s <- 1 to 6
      subjEff = (s - 3.5) * 4.0
      i <- 1 to s
    } yield (s"s$s", i.toDouble + s, 2.0 + 0.5 * (i + s) + subjEff + rng.nextGaussian())
  }

  private def denseGls(rows: Seq[(String, Double, Double)],
      sb2: Double, se2: Double): Array[Double] = {
    // block-diagonal V: per subject V_i = se2 I + sb2 J
    val bySubj = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val p = 2
    val xtvx = new Array2DRowRealMatrix(p, p)
    val xtvy = new ArrayRealVector(p)
    bySubj.foreach { case (_, rs) =>
      val n = rs.size
      val v = new Array2DRowRealMatrix(n, n)
      for (i <- 0 until n; j <- 0 until n)
        v.setEntry(i, j, (if (i == j) se2 else 0.0) + sb2)
      val vInv = new LUDecomposition(v).getSolver.getInverse
      val x = new Array2DRowRealMatrix(n, p)
      rs.zipWithIndex.foreach { case ((_, xv, _), i) =>
        x.setEntry(i, 0, 1.0); x.setEntry(i, 1, xv)
      }
      val y = new ArrayRealVector(rs.map(_._3).toArray)
      val xtv = x.transpose().multiply(vInv)
      val contribXX = xtv.multiply(x)
      val contribXy = xtv.operate(y)
      for (i <- 0 until p; j <- 0 until p)
        xtvx.setEntry(i, j, xtvx.getEntry(i, j) + contribXX.getEntry(i, j))
      for (i <- 0 until p)
        xtvy.setEntry(i, xtvy.getEntry(i) + contribXy.getEntry(i))
    }
    new LUDecomposition(xtvx).getSolver.solve(xtvy).toArray
  }

  test("refit reproduces dense GLS on an unbalanced fixture") {
    val rows = fixture()
    val df = rows.toDF("subj", "x", "y")
    val d = OlsPass.design(df, Seq("x"), Nil)
    val raw = OlsPass.fitPerGroupRaw(df, "y", d, Nil)
    val (sb2, se2) = (3.0, 1.4) // arbitrary positive components
    val est = Seq(("", sb2, se2)).toDF("__key", "sigma_b2", "sigma_e2")
    val keyed = OlsPass.withKey(df, "y", d, Nil)
    val fit = Fgls.refit(keyed, "y", d, "subj",
      raw.map { case (k, (r, _)) => k -> r }, est)("")
    val want = denseGls(rows, sb2, se2)
    assert(fit.beta.length == 2)
    fit.beta.zip(want).foreach { case (got, w) =>
      assert(math.abs(got - w) < 1e-8, s"beta: got ${fit.beta.toSeq}, want ${want.toSeq}")
    }
    // GLS must actually move the estimate on this unbalanced fixture
    val ols = raw("")._2.beta
    assert(math.abs(ols(1) - fit.beta(1)) > 1e-6, "fixture should separate OLS from GLS")
  }

  test("sigma_b2 = 0 reduces the refit to OLS exactly") {
    val rows = fixture()
    val df = rows.toDF("subj", "x", "y")
    val d = OlsPass.design(df, Seq("x"), Nil)
    val raw = OlsPass.fitPerGroupRaw(df, "y", d, Nil)
    val est = Seq(("", 0.0, 1.7)).toDF("__key", "sigma_b2", "sigma_e2")
    val keyed = OlsPass.withKey(df, "y", d, Nil)
    val fit = Fgls.refit(keyed, "y", d, "subj",
      raw.map { case (k, (r, _)) => k -> r }, est)("")
    raw("")._2.beta.zip(fit.beta).foreach { case (o, g) =>
      assert(math.abs(o - g) < 1e-10)
    }
  }

  test("LongitudinalOutlier fgls=true: balanced intercept-only flags == plain path") {
    import graft.checks.LongitudinalOutlierCheck
    val rng = new scala.util.Random(3)
    val rows = for (s <- 1 to 12; t <- 1 to 5) yield
      ("u" + s, t, 2.0 * s + (if (s == 4 && t == 2) 40.0 else rng.nextGaussian()))
    val df = rows.toDF("user_id", "t", "value")
    def flagsOf(fgls: Boolean) = graft.operators.LongitudinalOutlier.flagged(df,
      LongitudinalOutlierCheck("lo", "value", "user_id", cutoffPct = 99, fgls = fgls))
      .filter(col("flag_outlier")).select("user_id", "t")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    // balanced + intercept-only: GLS weights are uniform, β_gls ≡ β_ols
    assert(flagsOf(true) == flagsOf(false))
    assert(flagsOf(true).exists(_._1 == "u4"), "planted spike flagged under fgls")
  }

  test("GroupVariance fgls=true runs end-to-end with a covariate") {
    import graft.checks.GroupVarianceCheck
    val rng = new scala.util.Random(5)
    val rows = for (g <- Seq("a", "b", "c"); i <- 1 to 40) yield
      (g, i.toDouble, 1.0 + 0.3 * i +
        (if (g == "c") 6.0 else 1.0) * rng.nextGaussian())
    val df = rows.toDF("grp", "x", "y")
    val t = graft.operators.GroupVariance.tests(df,
      GroupVarianceCheck("gv", "y", "grp", contCovariates = Seq("x"), fgls = true))
      .collect()
    assert(t.length == 3)
    val pC = t.find(_.getAs[String]("cmp") == "c").get.getAs[Double]("p_holm")
    assert(pC < 0.05, s"inflated-variance group should flag, p=$pC")
  }
}
