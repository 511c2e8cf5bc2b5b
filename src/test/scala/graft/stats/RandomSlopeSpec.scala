package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `RandomSlope.estimates` (Swamy-type intercept+slope MoM,
  * longitudinalPlot.sas `random=`/`type=UN` surface) against an
  * independent plain-Scala two-stage computation, plus the degenerate-
  * subject and clamp semantics.
  */
class RandomSlopeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent textbook implementation: per-subject OLS of r on (1, t)
    * via direct loops, then the bias-corrected coefficient covariance. */
  private def expected(rows: Seq[(String, Double, Double)])
      : (Double, Double, Double, Double, Long, Long) = {
    val bySubj = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val nRows = rows.size.toLong
    final case class S(a: Double, c: Double, sse: Double, dfe: Long,
        v00: Double, v01: Double, v11: Double)
    val ok = bySubj.flatMap { case (_, xs) =>
      val n = xs.size
      val ts = xs.map(_._2); val rs = xs.map(_._3)
      val st = ts.sum; val stt = ts.map(t => t * t).sum
      val sr = rs.sum; val srt = ts.zip(rs).map { case (t, r) => t * r }.sum
      val srr = rs.map(r => r * r).sum
      val det = n * stt - st * st
      if (n >= 3 && det > 1e-12 * (math.abs(n * stt) + 1.0)) {
        val a = (stt * sr - st * srt) / det
        val c = (n * srt - st * sr) / det
        Some(S(a, c, srr - a * sr - c * srt, n - 2L, stt / det, -st / det, n / det))
      } else None
    }
    val k = ok.size
    val sigmaE2 = ok.map(_.sse).sum / ok.map(_.dfe).sum
    def cov(f: S => Double, g: S => Double): Double = {
      val mf = ok.map(f).sum / k; val mg = ok.map(g).sum / k
      ok.map(s => (f(s) - mf) * (g(s) - mg)).sum / (k - 1)
    }
    val g00 = math.max(cov(_.a, _.a) - sigmaE2 * ok.map(_.v00).sum / k, 0.0)
    val g11 = math.max(cov(_.c, _.c) - sigmaE2 * ok.map(_.v11).sum / k, 0.0)
    val g01raw = cov(_.a, _.c) - sigmaE2 * ok.map(_.v01).sum / k
    val g01 = math.signum(g01raw) * math.min(math.abs(g01raw), math.sqrt(g00 * g11))
    (sigmaE2, g00, g01, g11, k.toLong, nRows)
  }

  private def estimate(rows: Seq[(String, Double, Double)]) = {
    val df = rows.toDF("subj", "t", "r").withColumn("__key", lit("all"))
    val got = RandomSlope.estimates(
      RandomSlope.subjStats(df, "__key", "subj", "t", "r")).collect()
    assert(got.length == 1)
    val r = got.head
    (r.getAs[Double]("sigma_e2"), r.getAs[Double]("g00"), r.getAs[Double]("g01"),
      r.getAs[Double]("g11"), r.getAs[Long]("k3"), r.getAs[Long]("n_rows"))
  }

  test("estimates ≡ independent two-stage computation") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 25).flatMap { i =>
      val b0 = 2.0 * rng.nextGaussian(); val b1 = 0.4 * rng.nextGaussian()
      (1 to (3 + i % 4)).map { t =>
        (s"s$i", t.toDouble, b0 + b1 * t + 0.3 * rng.nextGaussian())
      }
    }
    val (e1, e2, e3, e4, ek, en) = expected(rows)
    val (g1, g2, g3, g4, gk, gn) = estimate(rows)
    assert(gk == ek && gn == en)
    assert(math.abs(g1 - e1) < 1e-9, s"sigma_e2 $g1 vs $e1")
    assert(math.abs(g2 - e2) < 1e-9, s"g00 $g2 vs $e2")
    assert(math.abs(g3 - e3) < 1e-9, s"g01 $g3 vs $e3")
    assert(math.abs(g4 - e4) < 1e-9, s"g11 $g4 vs $e4")
    // the planted structure is recoverable in order of magnitude
    assert(g2 > 0 && g4 > 0)
  }

  test("n<3 and constant-t subjects are excluded from estimation") {
    val rng = new scala.util.Random(11)
    val good = (1 to 12).flatMap { i =>
      (1 to 5).map(t => (s"g$i", t.toDouble, i * 0.5 + 0.2 * t * i + 0.1 * rng.nextGaussian()))
    }
    val short = Seq(("short", 1.0, 5.0), ("short", 2.0, 6.0)) // n = 2
    val flat = (1 to 5).map(t => ("flat", 3.0, t * 1.0))      // constant t
    val all = good ++ short ++ flat
    val (e1, e2, e3, e4, ek, en) = expected(all)
    val (g1, g2, g3, g4, gk, gn) = estimate(all)
    assert(gk == 12L && ek == 12L, "only the 12 informative subjects count")
    assert(gn == all.size.toLong && en == gn, "n_rows still counts every row")
    assert(math.abs(g1 - e1) < 1e-9 && math.abs(g2 - e2) < 1e-9 &&
      math.abs(g3 - e3) < 1e-9 && math.abs(g4 - e4) < 1e-9)
  }

  test("clamps: diagonals floor at 0 and |g01| ≤ √(g00·g11)") {
    // pure noise, tiny between-subject structure → corrections exceed the
    // sample covariances and the diagonals clamp; g01 then clamps to 0
    val rng = new scala.util.Random(13)
    val rows = (1 to 20).flatMap { i =>
      (1 to 4).map(t => (s"s$i", t.toDouble, rng.nextGaussian() * 5.0))
    }
    val (_, g00, g01, g11, _, _) = estimate(rows)
    assert(g00 >= 0 && g11 >= 0)
    assert(math.abs(g01) <= math.sqrt(g00 * g11) + 1e-12)
  }

  test("flagged(slopeVar) scales by the marginal V_jj and flags the spike") {
    val rng = new scala.util.Random(42)
    val rows = (1 to 60).flatMap { i =>
      val b0 = 1.5 * rng.nextGaussian(); val b1 = 0.3 * rng.nextGaussian()
      (1 to 6).map { t =>
        val spike = if (i == 9 && t == 2) 40.0 else 0.0
        (i.toLong, t.toDouble, 5.0 + 1.0 * t + b0 + b1 * t + 0.3 * rng.nextGaussian() + spike)
      }
    }
    val df = rows.toDF("subj", "t", "y")
    val f = graft.operators.LongitudinalOutlier.flagged(df,
      graft.checks.LongitudinalOutlierCheck("rs", "y", "subj",
        contCovariates = Seq("t"), cutoffPct = 99.9, slopeVar = Some("t")))
    val flagged = f.filter(col("flag_outlier"))
      .select("subj", "t").as[(Long, Double)].collect().toSet
    assert(flagged.contains((9L, 2.0)), "planted spike must flag")
    assert(flagged.size <= 3, s"no flag storm: $flagged")
  }

  private def reml(rows: Seq[(String, Double, Double)]) = {
    val df = rows.toDF("subj", "t", "r").withColumn("__key", lit("all"))
    val got = RandomSlope.remlEstimates(
      RandomSlope.subjStats(df, "__key", "subj", "t", "r")).collect()
    assert(got.length == 1)
    val r = got.head
    (r.getAs[Double]("sigma_e2"), r.getAs[Double]("g00"), r.getAs[Double]("g01"),
      r.getAs[Double]("g11"), r.getAs[Long]("k3"), r.getAs[Long]("n_rows"))
  }

  /** Independent DENSE −2·restricted-log-likelihood: builds each subject's
    * full V = σ²I + TGTᵀ and inverts it by in-spec Cholesky — no Woodbury
    * identity, no design-class collapse — so it checks the optimizer's
    * criterion through a disjoint code path. */
  private def dense2lr(rows: Seq[(String, Double, Double)],
      s2: Double, g00: Double, g01: Double, g11: Double): Double = {
    def chol(a: Array[Array[Double]]): Array[Array[Double]] = {
      val n = a.length
      val l = Array.fill(n, n)(0.0)
      for (i <- 0 until n; j <- 0 to i) {
        var s = 0.0
        for (k <- 0 until j) s += l(i)(k) * l(j)(k)
        if (i == j) l(i)(i) = math.sqrt(a(i)(i) - s)
        else l(i)(j) = (a(i)(j) - s) / l(j)(j)
      }
      l
    }
    def solveLower(l: Array[Array[Double]], b: Array[Double]): Array[Double] = {
      val n = b.length; val x = new Array[Double](n)
      for (i <- 0 until n) {
        var s = b(i)
        for (k <- 0 until i) s -= l(i)(k) * x(k)
        x(i) = s / l(i)(i)
      }
      x
    }
    val bySubj = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var logdet = 0.0; var quad = 0.0
    val m = Array.fill(2, 2)(0.0); val mv = Array(0.0, 0.0)
    bySubj.foreach { case (_, xs) =>
      val n = xs.size
      val ts = xs.map(_._2).toArray; val rs = xs.map(_._3).toArray
      val v = Array.tabulate(n, n) { (i, j) =>
        val zz = g00 + g01 * (ts(i) + ts(j)) + g11 * ts(i) * ts(j)
        zz + (if (i == j) s2 else 0.0)
      }
      val l = chol(v)
      for (i <- 0 until n) logdet += 2 * math.log(l(i)(i))
      val wr = solveLower(l, rs)                       // L⁻¹ r
      val w0 = solveLower(l, Array.fill(n)(1.0))       // L⁻¹ 1
      val w1 = solveLower(l, ts)                       // L⁻¹ t
      quad += wr.map(x => x * x).sum
      m(0)(0) += w0.map(x => x * x).sum
      m(0)(1) += w0.zip(w1).map { case (a, b) => a * b }.sum
      m(1)(1) += w1.map(x => x * x).sum
      mv(0) += w0.zip(wr).map { case (a, b) => a * b }.sum
      mv(1) += w1.zip(wr).map { case (a, b) => a * b }.sum
    }
    m(1)(0) = m(0)(1)
    val detM = m(0)(0) * m(1)(1) - m(0)(1) * m(0)(1)
    val d0 = (m(1)(1) * mv(0) - m(0)(1) * mv(1)) / detM
    val d1 = (m(0)(0) * mv(1) - m(0)(1) * mv(0)) / detM
    logdet + math.log(detM) + quad - (d0 * mv(0) + d1 * mv(1))
  }

  test("remlEstimates ≡ Swamy MoM on balanced interior data (classic equivalence)") {
    // all subjects share the t grid and the planted components dominate the
    // correction, so the MoM solution is interior — there REML and the
    // bias-corrected MANOVA estimator coincide (property verified against
    // the dense-likelihood python prototype as well)
    val rng = new scala.util.Random(7)
    val rows = (1 to 40).flatMap { i =>
      val b0 = 2.0 * rng.nextGaussian(); val b1 = 1.4 * rng.nextGaussian()
      (1 to 6).map { t => (s"s$i", t.toDouble, b0 + b1 * t + 0.5 * rng.nextGaussian()) }
    }
    val (m1, m2, m3, m4, mk, mn) = estimate(rows)
    val (r1, r2, r3, r4, rk, rn) = reml(rows)
    assert(rk == mk && rn == mn)
    assert(math.abs(r1 - m1) < 1e-4 * m1, s"sigma_e2 $r1 vs $m1")
    assert(math.abs(r2 - m2) < 1e-3 * m2, s"g00 $r2 vs $m2")
    assert(math.abs(r3 - m3) < 1e-3 * (math.abs(m3) + 1), s"g01 $r3 vs $m3")
    assert(math.abs(r4 - m4) < 1e-3 * m4, s"g11 $r4 vs $m4")
  }

  test("remlEstimates reaches a no-worse dense-likelihood value than MoM (unbalanced)") {
    val rng = new scala.util.Random(19)
    val rows = (1 to 30).flatMap { i =>
      val b0 = 1.5 * rng.nextGaussian(); val b1 = 0.8 * rng.nextGaussian()
      (1 to (3 + i % 5)).map { t =>
        (s"s$i", t.toDouble + 0.1 * (i % 3), b0 + b1 * t + 0.4 * rng.nextGaussian())
      }
    }
    val (m1, m2, m3, m4, _, _) = estimate(rows)
    val (r1, r2, r3, r4, _, _) = reml(rows)
    val critMom = dense2lr(rows, m1, m2, m3, m4)
    val critReml = dense2lr(rows, r1, r2, r3, r4)
    assert(critReml <= critMom + 1e-8,
      s"REML criterion $critReml must not exceed MoM's $critMom")
    // PSD clamps hold structurally (G = LLᵀ)
    assert(r2 >= 0 && r4 >= 0 && math.abs(r3) <= math.sqrt(r2 * r4) + 1e-12)
  }

  test("remlEstimates falls back to the MoM row when < 2 informative subjects") {
    val rows = (1 to 6).flatMap { i => Seq((s"s$i", 1.0, 2.0 + i), (s"s$i", 2.0, 3.0 + i)) }
    val (m1, m2, m3, m4, mk, mn) = estimate(rows)
    val (r1, r2, r3, r4, rk, rn) = reml(rows)
    assert(rk == mk && rn == mn && rk == 0L)
    def same(a: Double, b: Double) = (a.isNaN && b.isNaN) || a == b
    assert(same(r1, m1) && same(r2, m2) && same(r3, m3) && same(r4, m4))
  }

  test("degenerate scope (<2 informative subjects) flags NOTHING, not everything") {
    // every subject has n < 3 → k3 = 0 → NaN components; before the guard,
    // NaN rscaled compared above the cutoff (Spark orders NaN highest) and
    // every row of the scope was flagged an outlier
    val rows = (1 to 8).flatMap { i =>
      Seq((i.toLong, 1.0, 2.0 + i), (i.toLong, 2.0, 3.0 + i))
    }
    val df = rows.toDF("subj", "t", "y")
    val f = graft.operators.LongitudinalOutlier.flagged(df,
      graft.checks.LongitudinalOutlierCheck("rs0", "y", "subj",
        contCovariates = Seq("t"), cutoffPct = 90.0, slopeVar = Some("t")))
    assert(f.filter(col("flag_outlier")).count() == 0,
      "NaN scaled residuals must coalesce to unflagged")
    // and the scaled residual itself is NULL (never NaN) on that scope
    assert(f.filter(col("rscaled").isNotNull).count() == 0)
  }
}
