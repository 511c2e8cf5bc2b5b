package graft.stats

import graft.SparkSpec
import graft.checks.LongitudinalOutlierCheck
import graft.operators.LongitudinalOutlier
import org.apache.spark.sql.functions._

/** `RandomEffects.estimates` (generalized Swamy MoM for arbitrary
  * `random INTERCEPT x1 x2 …  / type=UN` term lists) against (a) the
  * oracled q = 2 special case (`RandomSlope.estimates`), (b) an
  * independent plain-Scala dense two-stage computation at q = 3, and the
  * PSD-clamp / degenerate / end-to-end flag semantics.
  */
class RandomEffectsSpec extends SparkSpec {
  import spark.implicits._

  /** q = 3 fixture: quadratic per-subject trends r = b0 + b1·t + b2·t²,
    * unbalanced panel lengths. */
  private def quadRows(k: Int, seed: Int): Seq[(String, Double, Double)] = {
    val rng = new scala.util.Random(seed)
    (1 to k).flatMap { i =>
      val b0 = 2.0 * rng.nextGaussian()
      val b1 = 0.5 * rng.nextGaussian()
      val b2 = 0.1 * rng.nextGaussian()
      (1 to (5 + i % 4)).map { t =>
        val td = t.toDouble
        (s"s$i", td, b0 + b1 * td + b2 * td * td + 0.3 * rng.nextGaussian())
      }
    }
  }

  private def estimateQ(rows: Seq[(String, Double, Double)], terms: Seq[String])
      : (Double, Seq[Double], Long, Long) = {
    val df = rows.toDF("subj", "t", "r")
      .withColumn("t2", col("t") * col("t"))
      .withColumn("__key", lit("all"))
    val got = RandomEffects.estimates(
      RandomEffects.subjStats(df, "__key", "subj", terms, "r"), terms.size).collect()
    assert(got.length == 1)
    val r = got.head
    (r.getAs[Double]("sigma_e2"), r.getSeq[Double](r.fieldIndex("g")),
      r.getAs[Long]("k3"), r.getAs[Long]("n_rows"))
  }

  test("q = 2 (terms = [t]) reproduces RandomSlope.estimates exactly") {
    val rows = quadRows(25, 7)
    val df = rows.toDF("subj", "t", "r").withColumn("__key", lit("all"))
    val rs = RandomSlope.estimates(
      RandomSlope.subjStats(df, "__key", "subj", "t", "r")).collect().head
    val (se2, g, k3, n) = estimateQ(rows, Seq("t"))
    assert(k3 == rs.getAs[Long]("k3") && n == rs.getAs[Long]("n_rows"))
    assert(math.abs(se2 - rs.getAs[Double]("sigma_e2")) < 1e-9)
    // raw Ĝ is PSD on this structured fixture, so the eigen-clamp and the
    // q = 2 diagonal/off-diagonal clamp both reduce to the identity and
    // the two estimators must agree to reconstruction precision
    assert(math.abs(g(0) - rs.getAs[Double]("g00")) < 1e-9, s"g00 ${g(0)}")
    assert(math.abs(g(1) - rs.getAs[Double]("g01")) < 1e-9, s"g01 ${g(1)}")
    assert(math.abs(g(2) - rs.getAs[Double]("g11")) < 1e-9, s"g11 ${g(2)}")
  }

  /** Independent dense q = 3 two-stage computation (no shared code: plain
    * loops, Gaussian elimination instead of Cholesky). Returns the RAW
    * (unclamped) Ĝ — callers assert its PSD-ness before comparing. */
  private def denseSwamy(rows: Seq[(String, Double, Double)])
      : (Double, Array[Array[Double]], Int) = {
    val q = 3
    def design(t: Double) = Array(1.0, t, t * t)
    val bySubj = rows.groupBy(_._1).toSeq.sortBy(_._1)
    def solve(a: Array[Array[Double]], y: Array[Double]): Option[Array[Double]] = {
      val m = a.map(_.clone); val x = y.clone
      for (p <- 0 until q) {
        val piv = (p until q).maxBy(r => math.abs(m(r)(p)))
        if (math.abs(m(piv)(p)) < 1e-10) return None
        val tmp = m(p); m(p) = m(piv); m(piv) = tmp
        val tv = x(p); x(p) = x(piv); x(piv) = tv
        for (r <- p + 1 until q) {
          val f = m(r)(p) / m(p)(p)
          for (cc <- p until q) m(r)(cc) -= f * m(p)(cc)
          x(r) -= f * x(p)
        }
      }
      val out = new Array[Double](q)
      for (r <- (q - 1) to 0 by -1) {
        var s = x(r)
        for (cc <- r + 1 until q) s -= m(r)(cc) * out(cc)
        out(r) = s / m(r)(r)
      }
      Some(out)
    }
    def inverse(a: Array[Array[Double]]): Option[Array[Array[Double]]] = {
      val cols = (0 until q).map { j =>
        val e = new Array[Double](q); e(j) = 1.0
        solve(a, e)
      }
      if (cols.exists(_.isEmpty)) None
      else Some(Array.tabulate(q, q)((i, j) => cols(j).get(i)))
    }
    val fits = bySubj.flatMap { case (_, xs) =>
      if (xs.size <= q) None
      else {
        val ts = xs.map(r => design(r._2)); val ys = xs.map(_._3)
        val ata = Array.tabulate(q, q)((a, b) =>
          ts.map(t => t(a) * t(b)).sum)
        val aty = Array.tabulate(q)(a => ts.zip(ys).map { case (t, y) => t(a) * y }.sum)
        for {
          b <- solve(ata, aty)
          vinv <- inverse(ata)
        } yield {
          val sse = ys.map(y => y * y).sum - (0 until q).map(a => b(a) * aty(a)).sum
          (b, sse, xs.size - q, vinv)
        }
      }
    }
    val k = fits.size
    val sigmaE2 = fits.map(_._2).sum / fits.map(_._3).sum
    val bbar = Array.tabulate(q)(a => fits.map(_._1(a)).sum / k)
    val graw = Array.tabulate(q, q) { (a, b) =>
      val s = fits.map(f => (f._1(a) - bbar(a)) * (f._1(b) - bbar(b))).sum / (k - 1)
      s - sigmaE2 * fits.map(_._4(a)(b)).sum / k
    }
    (sigmaE2, graw, k)
  }

  test("q = 3 estimates ≡ independent dense two-stage computation") {
    val rows = quadRows(40, 11)
    val (ese2, eg, ek) = denseSwamy(rows)
    // fixture sanity: raw Ĝ is PSD (leading principal minors), so the
    // engine's eigen-clamp is the identity and values compare exactly
    val det2 = eg(0)(0) * eg(1)(1) - eg(0)(1) * eg(0)(1)
    val det3 =
      eg(0)(0) * (eg(1)(1) * eg(2)(2) - eg(1)(2) * eg(1)(2)) -
        eg(0)(1) * (eg(0)(1) * eg(2)(2) - eg(1)(2) * eg(0)(2)) +
        eg(0)(2) * (eg(0)(1) * eg(1)(2) - eg(1)(1) * eg(0)(2))
    assert(eg(0)(0) > 0 && det2 > 0 && det3 > 0, "fixture must have PSD raw G")
    val (se2, g, k3, _) = estimateQ(rows, Seq("t", "t2"))
    assert(k3 == ek.toLong)
    assert(math.abs(se2 - ese2) < 1e-9, s"sigma_e2 $se2 vs $ese2")
    for (a <- 0 until 3; b <- a until 3) {
      val i = RandomEffects.triIdx(a, b, 3)
      assert(math.abs(g(i) - eg(a)(b)) < 1e-8, s"g($a,$b) ${g(i)} vs ${eg(a)(b)}")
    }
  }

  test("eigen-clamp returns a PSD matrix on a noise fixture") {
    // pure noise: the sampling-noise correction exceeds the coefficient
    // covariance and the raw Ĝ goes indefinite → the output must still be
    // PSD (all leading principal minors ≥ 0 up to reconstruction noise)
    val rng = new scala.util.Random(13)
    val rows = (1 to 25).flatMap { i =>
      (1 to 6).map(t => (s"s$i", t.toDouble, rng.nextGaussian() * 5.0))
    }
    val (_, g, _, _) = estimateQ(rows, Seq("t", "t2"))
    val m = Array.tabulate(3, 3)((a, b) =>
      g(RandomEffects.triIdx(math.min(a, b), math.max(a, b), 3)))
    val det2 = m(0)(0) * m(1)(1) - m(0)(1) * m(0)(1)
    val det3 =
      m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(1)(2)) -
        m(0)(1) * (m(0)(1) * m(2)(2) - m(1)(2) * m(0)(2)) +
        m(0)(2) * (m(0)(1) * m(1)(2) - m(1)(1) * m(0)(2))
    assert(m(0)(0) >= -1e-10 && m(1)(1) >= -1e-10 && m(2)(2) >= -1e-10)
    assert(det2 >= -1e-8 && det3 >= -1e-8, s"minors $det2 / $det3")
  }

  test("flagged(randomTerms) flags the planted spike, degenerate scope flags nothing") {
    val rng = new scala.util.Random(17)
    val base = (1 to 30).flatMap { i =>
      val b0 = rng.nextGaussian(); val b1 = 0.3 * rng.nextGaussian()
      val b2 = 0.05 * rng.nextGaussian()
      (1 to 8).map { t =>
        val td = t.toDouble
        (s"u$i", td, b0 + b1 * td + b2 * td * td + 0.2 * rng.nextGaussian(), "ok")
      }
    }
    val spike = Seq(("u3", 9.0, 80.0, "ok"))
    // degenerate scope: ONE subject → k3 < 2 → components NaN → no flags
    val degen = (1 to 6).map(t => ("solo", t.toDouble, t * 1.0, "degen"))
    val df = (base ++ spike ++ degen).toDF("id", "t", "y", "grp")
      .withColumn("t2", col("t") * col("t"))
    val flags = LongitudinalOutlier.flagged(df,
      LongitudinalOutlierCheck("re", "y", "id",
        contCovariates = Seq("t"), scope = Seq("grp"), cutoffPct = 99.9,
        randomTerms = Seq("t", "t2")))
    val flaggedRows = flags.filter(col("flag_outlier"))
      .select("id", "y").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(flaggedRows.contains(("u3", 80.0)), s"spike not flagged: ${flaggedRows.mkString(",")}")
    assert(!flaggedRows.exists(_._1 == "solo"), "degenerate scope must not flag")
    // every row of the degenerate scope must be present and unflagged
    assert(flags.filter(col("grp") === "degen").count() == 6)
  }
}
