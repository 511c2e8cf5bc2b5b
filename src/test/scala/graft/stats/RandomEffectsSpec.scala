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

  /** In-spec dense restricted −2 log-likelihood: builds every subject's
    * V = σ²I + T G T' as a FULL n×n matrix and evaluates by Gaussian
    * elimination (log-det via the pivot product, explicit inverse) — no
    * Woodbury identity, no design-class collapse, no shared code with
    * `RandomEffects.remlFromClasses` beyond the model definition. */
  private def denseNeg2lr(rows: Seq[(String, Double, Double)], s2: Double,
      g: Seq[Double]): Double = {
    val q = 3
    def design(t: Double) = Array(1.0, t, t * t)
    val gm = Array.tabulate(q, q)((a, b) =>
      g(RandomEffects.triIdx(math.min(a, b), math.max(a, b), q)))
    def luInvLogDet(a: Array[Array[Double]]): (Array[Array[Double]], Double) = {
      val n = a.length
      val m = a.map(_.clone)
      val inv = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
      var logDet = 0.0
      for (p <- 0 until n) {
        val piv = (p until n).maxBy(r => math.abs(m(r)(p)))
        if (piv != p) {
          val t = m(p); m(p) = m(piv); m(piv) = t
          val ti = inv(p); inv(p) = inv(piv); inv(piv) = ti
          logDet += 0.0 // symmetric PD V: pivoting swaps cancel in |det|
        }
        logDet += math.log(math.abs(m(p)(p)))
        val d = m(p)(p)
        for (c <- 0 until n) { m(p)(c) /= d; inv(p)(c) /= d }
        for (r <- 0 until n; if r != p) {
          val f = m(r)(p)
          if (f != 0.0)
            for (c <- 0 until n) { m(r)(c) -= f * m(p)(c); inv(r)(c) -= f * inv(p)(c) }
        }
      }
      (inv, logDet)
    }
    val bySubj = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var logdet = 0.0; var quad = 0.0
    val mm = Array.ofDim[Double](q, q); val mv = new Array[Double](q)
    bySubj.foreach { case (_, xs) =>
      val n = xs.size
      val ts = xs.map(r => design(r._2)).toArray
      val rv = xs.map(_._3).toArray
      val v = Array.tabulate(n, n) { (i, j) =>
        var s = if (i == j) s2 else 0.0
        for (a <- 0 until q; b <- 0 until q) s += ts(i)(a) * gm(a)(b) * ts(j)(b)
        s
      }
      val (vi, ld) = luInvLogDet(v)
      logdet += ld
      for (i <- 0 until n; j <- 0 until n) {
        quad += rv(i) * vi(i)(j) * rv(j)
        for (a <- 0 until q) {
          mv(a) += ts(i)(a) * vi(i)(j) * rv(j)
          for (b <- 0 until q) mm(a)(b) += ts(i)(a) * vi(i)(j) * ts(j)(b)
        }
      }
    }
    // log det M + delta' m via the spec's Gaussian solver
    def det3(m: Array[Array[Double]]): Double =
      m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
        m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
        m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
    val (mi, _) = luInvLogDet(mm)
    val delta = Array.tabulate(q)(a => (0 until q).map(b => mi(a)(b) * mv(b)).sum)
    logdet + math.log(det3(mm)) + quad - (0 until q).map(a => delta(a) * mv(a)).sum
  }

  test("q = 2 REML reproduces RandomSlope.remlEstimates (objective parity)") {
    val rows = quadRows(25, 7)
    val df = rows.toDF("subj", "t", "r").withColumn("__key", lit("all"))
    val rs = RandomSlope.remlEstimatesWithObjective(
      RandomSlope.subjStats(df, "__key", "subj", "t", "r")).collect().head
    val re = RandomEffects.remlEstimatesWithObjective(
      RandomEffects.subjStats(df, "__key", "subj", Seq("t"), "r"), 1).collect().head
    // the compared surface is the OBJECTIVE (the G ridge-coordinate
    // caveat documented on RandomSlope.remlEstimatesWithObjective)
    val o2 = rs.getAs[Double]("neg2lr"); val oq = re.getAs[Double]("neg2lr")
    assert(math.abs(o2 - oq) < 1e-3 * (math.abs(o2) + 1.0), s"neg2lr $oq vs $o2")
    assert(math.abs(re.getAs[Double]("sigma_e2") - rs.getAs[Double]("sigma_e2")) <
      0.02 * rs.getAs[Double]("sigma_e2"))
    assert(re.getAs[Long]("k3") == rs.getAs[Long]("k3"))
  }

  test("q = 3 REML: class objective ≡ dense likelihood, and no worse than MoM") {
    val rows = quadRows(40, 11)
    val df = rows.toDF("subj", "t", "r")
      .withColumn("t2", col("t") * col("t")).withColumn("__key", lit("all"))
    val stats = RandomEffects.subjStats(df, "__key", "subj", Seq("t", "t2"), "r")
    val re = RandomEffects.remlEstimatesWithObjective(stats, 2).collect().head
    val s2 = re.getAs[Double]("sigma_e2")
    val g = re.getSeq[Double](re.fieldIndex("g"))
    val obj = re.getAs[Double]("neg2lr")
    // (a) the Woodbury/design-class objective agrees with a dense n×n
    // evaluation at the returned point — pins the collapse algebra
    val dense = denseNeg2lr(rows, s2, g)
    assert(math.abs(dense - obj) < 1e-6 * (math.abs(dense) + 1.0), s"$obj vs dense $dense")
    // (b) optimizer sanity: REML is no worse than its MoM start
    val mom = RandomEffects.estimates(stats, 2).collect().head
    val momObj = denseNeg2lr(rows, mom.getAs[Double]("sigma_e2"),
      mom.getSeq[Double](mom.fieldIndex("g")))
    assert(obj <= momObj + 1e-6, s"REML $obj worse than MoM start $momObj")
  }

  test("multi-scope REML ≡ each scope alone (per-key class partitioning)") {
    val rowsA = quadRows(20, 5)
    val rowsB = quadRows(28, 23).map { case (s, t, r) => (s + "_b", t, r * 1.7 + 0.4) }
    def statsOf(rows: Seq[(String, Double, Double)], key: String) = {
      val df = rows.toDF("subj", "t", "r")
        .withColumn("t2", col("t") * col("t")).withColumn("__key", lit(key))
      RandomEffects.subjStats(df, "__key", "subj", Seq("t", "t2"), "r")
    }
    val joint = RandomEffects.remlEstimatesWithObjective(
      statsOf(rowsA, "A").unionByName(statsOf(rowsB, "B")), 2)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((key, rows) <- Seq("A" -> rowsA, "B" -> rowsB)) {
      val solo = RandomEffects.remlEstimatesWithObjective(statsOf(rows, key), 2)
        .collect().head
      val j = joint(key)
      assert(math.abs(j.getAs[Double]("neg2lr") - solo.getAs[Double]("neg2lr")) <
        1e-9 * (math.abs(solo.getAs[Double]("neg2lr")) + 1.0), s"scope $key objective")
      assert(j.getAs[Double]("sigma_e2") == solo.getAs[Double]("sigma_e2"))
      assert(j.getAs[Long]("k3") == solo.getAs[Long]("k3"))
    }
  }

  test("REML falls back to the MoM row when a scope has < 2 informative subjects") {
    val rows = (1 to 6).map(t => ("solo", t.toDouble, t * 1.0))
    val df = rows.toDF("subj", "t", "r")
      .withColumn("t2", col("t") * col("t")).withColumn("__key", lit("all"))
    val stats = RandomEffects.subjStats(df, "__key", "subj", Seq("t", "t2"), "r")
    val re = RandomEffects.remlEstimatesWithObjective(stats, 2).collect().head
    assert(re.getAs[Double]("neg2lr").isNaN)
    assert(re.getAs[Double]("sigma_e2").isNaN)
    assert(re.getAs[Long]("k3") < 2)
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
