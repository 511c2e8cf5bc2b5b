package graft.operators

import graft.SparkSpec
import graft.stats.UnCov
import org.apache.spark.sql.functions._

/** Golden tests for the type=UN panel outlier operator: hand-computed
  * pooled covariance / Mahalanobis distances on small panels, plus the
  * complete-case, singularity, and planted-outlier policies. */
class UnPanelOutlierSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = UnPanelOutlier.Config("un", "y", "subj", "slot")

  /** Hand-rolled reference: pooled covariance and d² from a balanced
    * panel matrix (rows = subjects, cols = slots). */
  private def reference(y: Array[Array[Double]]): (Array[Array[Double]], Array[Double]) = {
    val k = y.length
    val t = y(0).length
    val mu = Array.tabulate(t)(j => y.map(_(j)).sum / k)
    val r = y.map(row => row.indices.map(j => row(j) - mu(j)).toArray)
    val cov = Array.tabulate(t, t)((a, b) =>
      r.map(v => v(a) * v(b)).sum / (k - 1))
    val inv = UnCov.invert(cov)
    (cov, r.map(v => UnCov.mahalanobis(v, inv)))
  }

  test("pooled covariance and d2 match the hand-rolled balanced reference") {
    // 5 subjects × 3 slots, values chosen to give a well-conditioned cov
    val y = Array(
      Array(1.0, 2.0, 4.0),
      Array(2.0, 1.0, 5.0),
      Array(3.0, 4.0, 3.0),
      Array(0.0, 2.0, 6.0),
      Array(4.0, 6.0, 2.0))
    val rows = for (s <- y.indices; t <- 0 until 3)
      yield (s.toString, t, y(s)(t))
    val df = rows.toDF("subj", "slot", "y")
    val got = UnPanelOutlier.scored(df, cfg)
      .select("__subj", "d2").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (_, wantD2) = reference(y)
    y.indices.foreach { s =>
      assert(math.abs(got(s.toString) - wantD2(s)) < 1e-9, s"subj=$s")
    }
  }

  test("per-(subject, slot) means panelize repeated observations") {
    // subject 0 has two rows in slot 0 (mean 1.5) — the panel value
    val df = Seq(("0", 0, 1.0), ("0", 0, 2.0), ("0", 1, 3.0),
      ("1", 0, 2.0), ("1", 1, 1.0),
      ("2", 0, 4.0), ("2", 1, 5.0)).toDF("subj", "slot", "y")
    val y = Array(Array(1.5, 3.0), Array(2.0, 1.0), Array(4.0, 5.0))
    val got = UnPanelOutlier.scored(df, cfg)
      .select("__subj", "d2").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (_, wantD2) = reference(y)
    y.indices.foreach(s => assert(math.abs(got(s.toString) - wantD2(s)) < 1e-9))
  }

  test("incomplete subjects are excluded from estimation and scoring") {
    val complete = for (s <- 0 until 4; t <- 0 until 2)
      yield (s.toString, t, (s * 2 + t * 3 + (s * t) % 3).toDouble)
    val partial = Seq(("9", 0, 100.0)) // missing slot 1
    val df = (complete ++ partial).toDF("subj", "slot", "y")
    val scored = UnPanelOutlier.scored(df, cfg)
    assert(!scored.select("__subj").as[String].collect().contains("9"))
    // and the retained panel matches the 4-subject reference exactly
    val y = Array.tabulate(4, 2)((s, t) => (s * 2 + t * 3 + (s * t) % 3).toDouble)
    val (_, wantD2) = reference(y)
    val got = scored.select("__subj", "d2").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    y.indices.foreach(s => assert(math.abs(got(s.toString) - wantD2(s)) < 1e-9))
  }

  test("planted outlier subject is flagged, conformers are not") {
    // 20 subjects follow slot pattern (10, 20, 30) with tiny deterministic
    // jitter; subject 19 inverts the pattern entirely
    val rows = (0 until 20).flatMap { s =>
      (0 until 3).map { t =>
        val base = if (s == 19) 40.0 - 10.0 * (t + 1) else 10.0 * (t + 1)
        (s.toString, t, base + 0.1 * ((s * 7 + t * 3) % 5))
      }
    }
    val scored = UnPanelOutlier.scored(rows.toDF("subj", "slot", "y"),
      cfg.copy(cutoffPct = 99.0))
    val flags = scored.select("__subj", "flag_outlier").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(flags("19"), "planted anti-pattern subject must flag")
    assert(flags.count(_._2) == 1, "conformers must not flag")
    val verdict = UnPanelOutlier.verdicts(rows.toDF("subj", "slot", "y"), cfg)
      .select("stat", "pass").collect()(0)
    assert(verdict.getDouble(0) == 1.0 && !verdict.getBoolean(1))
    val viol = UnPanelOutlier.violations(rows.toDF("subj", "slot", "y"), cfg)
    assert(viol.select("key").as[String].collect().toSeq == Seq("19"))
  }

  test("singular covariance (k <= T) yields a pass=null verdict, no flags") {
    // 3 subjects, 4 slots: pooled cov has rank <= 2 < 4 → singular
    val rows = for (s <- 0 until 3; t <- 0 until 4)
      yield (s.toString, t, (s + t).toDouble)
    val df = rows.toDF("subj", "slot", "y")
    val scored = UnPanelOutlier.scored(df, cfg)
    assert(scored.filter(col("d2").isNotNull).count() == 0)
    assert(scored.filter(col("flag_outlier")).count() == 0)
    val v = UnPanelOutlier.verdicts(df, cfg).select("pass").collect()(0)
    assert(v.isNullAt(0), "non-evaluable scope must report pass=null")
  }

  test("scoped panels estimate independent covariances per scope key") {
    val rows =
      (for (s <- 0 until 6; t <- 0 until 2)
        yield ("a", s.toString, t, (s + 2 * t + (s * t) % 2).toDouble)) ++
      (for (s <- 0 until 6; t <- 0 until 2)
        yield ("b", s.toString, t, (3 * s - t + (s + t) % 3).toDouble))
    val df = rows.toDF("grp", "subj", "slot", "y")
    val scored = UnPanelOutlier.scored(df, cfg.copy(scope = Seq("grp")))
    assert(scored.select("__key").distinct().as[String].collect().toSet == Set("a", "b"))
    val ya = Array.tabulate(6, 2)((s, t) => (s + 2 * t + (s * t) % 2).toDouble)
    val (_, wantA) = reference(ya)
    val gotA = scored.filter(col("__key") === "a").select("__subj", "d2")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ya.indices.foreach(s => assert(math.abs(gotA(s.toString) - wantA(s)) < 1e-9))
  }
}
