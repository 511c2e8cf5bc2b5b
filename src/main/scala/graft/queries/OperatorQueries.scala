package graft.queries

import graft.checks._
import graft.operators._
import graft.queries.QuerySpec.read
import org.apache.spark.sql.functions._

/** End-to-end check-operator queries. Most carry a full DuckDB oracle —
  * including the tinv-cutoff flag families (q48/q50), whose t-quantiles the
  * oracle reproduces via the Peiser large-ν series, and the FGLS chain
  * (q59), which is closed-form in per-subject sufficient statistics. The
  * remaining rows-only entries are genuinely not SQL-expressible, and
  * each is BOTH py-oracled (tools/pyoracles.py) AND DuckDB-shadowed on
  * the SQL-expressible heart of its chain: the Freeman–Halton network
  * algorithm (q47 — shadowed by q74, which recomputes the full exact
  * 2×3 tail in SQL), the F-CDF p-values + Holm on the BF chain (q49 —
  * its median/whitening/F heart is shadowed by q71 in the KLL-exact
  * regime), the REML argmin search (q56 — its objective −2l_R(λ) is
  * recomputed point-by-point by q73), and the T×T covariance inverse
  * (q64 — shadowed at T=2 by q70). Only the optimizer/DFS search loops
  * themselves have no SQL form.
  */
object OperatorQueries {

  val all: Seq[QuerySpec] = Seq(

    // M9: Fisher's exact path of the categorical check (Freeman–Halton
    // on the full 2×C table; chi-square fallback only over the
    // enumeration budget, flagged in test_used)
    QuerySpec("q47_fisher_consistency",
      (s, dir) => {
        val docs = read(s, dir, "documents").filter(col("lang").isin("en", "de"))
        CategoricalConsistency.tests(docs,
          CategoricalConsistencyCheck("f", "lang", "source", test = "fisher"))
          .select(col("grp"), round(col("stat"), 6).as("stat"),
            round(col("p_raw"), 9).as("p_fisher"),
            round(col("p_holm"), 9).as("p_holm"))
          .orderBy("grp")
      },
      None),

    // M1-M3 end-to-end: GLM outlier flags per group (univariatePlot parity
    // shape on TPC-H data: price ~ quantity within returnflag). The DuckDB
    // oracle reproduces the whole chain closed-form: simple-regression
    // leverage/rstudent/cookd plus tinv(0.999, dfe−1) via the Peiser
    // large-ν series (A&S 26.7.5, validated ≤3e-12 vs exact inversion at
    // ν ≥ 500; min flag margin in the fixtures is ~1.3, so series error
    // can never flip a flag).
    QuerySpec("q48_regression_outlier",
      (s, dir) => RegressionOutlier.verdicts(
        read(s, dir, "lineitem"),
        RegressionOutlierCheck("ro", "l_extendedprice", "l_orderkey",
          contCovariates = Seq("l_quantity"), scope = Seq("l_returnflag"),
          cutoffPct = 99.9, cookCutoff = Some(7.0)))
        .select("partition", "metric", "stat", "n_obs", "pass")
        .orderBy("partition"),
      Some("""WITH z AS (SELECT CAST(3.090232306167805 AS DOUBLE) AS z),
             li AS (SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS x,
                      CAST(l_extendedprice AS DOUBLE) AS y
                    FROM lineitem
                    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
             s AS (SELECT g, x, y,
                     count(*) OVER w AS n,
                     avg(x) OVER w AS xbar, avg(y) OVER w AS ybar,
                     sum(x*x) OVER w AS sx2, sum(x*y) OVER w AS sxy0,
                     sum(y*y) OVER w AS sy2
                   FROM li WINDOW w AS (PARTITION BY g)),
             t AS (SELECT g, x, y, n, xbar, ybar,
                     sx2 - n*xbar*xbar AS sxx, sxy0 - n*xbar*ybar AS sxy,
                     sy2 - n*ybar*ybar AS syy FROM s),
             u AS (SELECT g, n, CAST(n-2 AS DOUBLE) AS dfe,
                     y - ybar - (sxy/sxx)*(x-xbar) AS e,
                     1.0/n + (x-xbar)*(x-xbar)/sxx AS h,
                     (syy - (sxy/sxx)*sxy)/(n-2) AS s2 FROM t),
             v AS (SELECT g, n, dfe,
                     (dfe*s2 - e*e/(1.0-h))/(dfe-1) AS s2i,
                     e*e*h/(2*s2*(1.0-h)*(1.0-h)) AS cookd,
                     e, h FROM u),
             w AS (SELECT g, n, cookd,
                     CASE WHEN s2i > 0 THEN e/sqrt(s2i*(1.0-h)) ELSE NULL END AS rstudent,
                     z.z + ((pow(z.z,3)+z.z)/4)/(dfe-1)
                         + ((5*pow(z.z,5)+16*pow(z.z,3)+3*z.z)/96)/pow(dfe-1,2)
                         + ((3*pow(z.z,7)+19*pow(z.z,5)+17*pow(z.z,3)-15*z.z)/384)/pow(dfe-1,3)
                         + ((79*pow(z.z,9)+776*pow(z.z,7)+1482*pow(z.z,5)-1920*pow(z.z,3)-945*z.z)/92160)/pow(dfe-1,4)
                       AS cutoff
                   FROM v CROSS JOIN z)
             SELECT g AS partition, 'rstudent_outliers' AS metric,
               CAST(sum(CASE WHEN rstudent IS NULL OR abs(rstudent) >= cutoff
                              OR cookd > 7.0/n THEN 1 ELSE 0 END) AS DOUBLE) AS stat,
               CAST(max(n) AS BIGINT) AS n_obs,
               sum(CASE WHEN rstudent IS NULL OR abs(rstudent) >= cutoff
                         OR cookd > 7.0/n THEN 1 ELSE 0 END) = 0 AS pass
             FROM w GROUP BY g ORDER BY g""")),

    // M5-M6 end-to-end: Brown-Forsythe group-vs-rest with Holm
    QuerySpec("q49_group_variance",
      (s, dir) => GroupVariance.tests(
        read(s, dir, "lineitem"),
        GroupVarianceCheck("gv", "l_quantity", "l_returnflag"))
        .select(col("cmp"), col("n"), round(col("stat"), 6).as("f_stat"),
          round(col("p_holm"), 9).as("p_holm"))
        .orderBy("cmp"),
      None),

    // DuckDB shadow of the q49 family: the SAME GroupVariance.tests chain
    // (intercept-only residuals → MoM whitening with groups as subjects →
    // per-side medians → one-vs-rest Brown–Forsythe F), scoped by ship
    // year (7 scopes) so every (scope, side) holds well under
    // GroupVariance.SketchK rows — the regime where the KLL sketches are
    // EXACT, making the medians SQL-expressible: datasketches'
    // getQuantile(0.5) (inclusive rank) and DuckDB's quantile_disc(0.5)
    // both select the ⌈n/2⌉-th order statistic. Only the F p-value + Holm
    // (incomplete-beta CDF) stay outside SQL, so q49 itself remains
    // py-oracled while this query hash-checks the distributed heart of
    // the operator against DuckDB.
    QuerySpec("q71_bf_vs_rest",
      (s, dir) => GroupVariance.tests(
        read(s, dir, "lineitem")
          .withColumn("ship_year", year(col("l_shipdate"))),
        GroupVarianceCheck("bf71", "l_quantity", "l_returnflag",
          scope = Seq("ship_year")))
        .select(col("__key").as("scope"), col("cmp"),
          col("n").cast("long").as("n"), round(col("stat"), 6).as("f_stat"))
        .orderBy("scope", "cmp"),
      Some("""WITH li AS (
               SELECT CAST(CAST(extract(year FROM l_shipdate) AS INT) AS VARCHAR) AS k,
                      CAST(l_returnflag AS VARCHAR) AS g,
                      CAST(l_quantity AS DOUBLE) AS y
               FROM lineitem
               WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL),
             m AS (SELECT k, avg(y) AS ybar FROM li GROUP BY 1),
             r AS (SELECT li.k, li.g, li.y - m.ybar AS r
                   FROM li JOIN m USING (k)),
             subj AS (SELECT k, g, count(*) AS ni, sum(r) AS s, sum(r*r) AS ss
                      FROM r GROUP BY 1, 2),
             a AS (SELECT k, sum(ni) AS n, count(*) AS kk, sum(s) AS gs,
                     sum(ss - s*s/ni) AS sswc,
                     sum(ni * (s/ni) * (s/ni)) AS sgm2,
                     sum(CAST(ni AS DOUBLE)*ni) AS sn2 FROM subj GROUP BY 1),
             b AS (SELECT k, sswc/(n-kk) AS msw,
                     (sgm2 - gs*gs/n)/(kk-1) AS msb,
                     (n - sn2/n)/(kk-1) AS n0 FROM a),
             est AS (SELECT k, msw AS se2,
                       greatest((msb - msw)/n0, 0.0) AS sb2 FROM b),
             sc AS (SELECT r.k, r.g,
                      (1.0/sqrt(e.se2)) * r.r
                        + ((1.0/sqrt(e.se2 + subj.ni*e.sb2)
                            - 1.0/sqrt(e.se2))/subj.ni) * subj.s AS rs
                    FROM r JOIN subj ON r.k = subj.k AND r.g = subj.g
                    JOIN est e ON r.k = e.k),
             dom AS (SELECT DISTINCT k, g AS cmp FROM sc),
             zz AS (SELECT d.k, d.cmp,
                      CASE WHEN sc.g = d.cmp THEN 1 ELSE 0 END AS side, sc.rs
                    FROM sc JOIN dom d ON sc.k = d.k),
             med AS (SELECT k, cmp, side, quantile_disc(rs, 0.5) AS med
                     FROM zz GROUP BY 1, 2, 3),
             z AS (SELECT zz.k, zz.cmp, zz.side, abs(zz.rs - med.med) AS z
                   FROM zz JOIN med USING (k, cmp, side)),
             st AS (SELECT k, cmp, side, count(*) AS ns, sum(z) AS sz,
                      sum(z*z) AS szz
                    FROM z GROUP BY 1, 2, 3),
             f AS (SELECT k, cmp, sum(ns) AS n, sum(sz) AS szal,
                     sum(szz) AS szzall,
                     sum(ns * (sz/ns) * (sz/ns)) AS smm
                   FROM st GROUP BY 1, 2)
             SELECT k AS scope, cmp, CAST(n AS BIGINT) AS n,
               round((smm - szal*szal/n) / ((szzall - smm)/(n-2)), 6) AS f_stat
             FROM f ORDER BY scope, cmp""")),

    // M4 end-to-end: longitudinal within-subject outliers on the events
    // stream table (user_id = subject). The DuckDB oracle replays the full
    // default-config chain closed-form: intercept-only residuals → MoM
    // variance components (the q68-oracled arithmetic) → symmetric-root
    // whitening r* = a·r + b·Σr → |r*| >= tinv(0.99, n−2) via the Peiser
    // series (min flag margin ~1.7e-3 in the fixtures vs ≤3e-12 series
    // error).
    QuerySpec("q50_longitudinal_outlier",
      (s, dir) => LongitudinalOutlier.verdicts(
        read(s, dir, "events"),
        LongitudinalOutlierCheck("lo", "value", "user_id", cutoffPct = 99))
        .select("partition", "metric", "stat", "n_obs", "pass"),
      Some("""WITH z AS (SELECT CAST(2.326347874040838 AS DOUBLE) AS z),
             ev AS (SELECT user_id, CAST(value AS DOUBLE) AS y FROM events
                    WHERE value IS NOT NULL),
             g AS (SELECT count(*) AS n, avg(y) AS ybar FROM ev),
             r AS (SELECT e.user_id, e.y - g.ybar AS r FROM ev e CROSS JOIN g),
             subj AS (SELECT user_id, count(*) AS ni, sum(r) AS s, sum(r*r) AS ss
                      FROM r GROUP BY 1),
             a AS (SELECT sum(ni) AS n, count(*) AS k, sum(s) AS gs,
                     sum(ss - s*s/ni) AS ssw,
                     sum(ni * (s/ni) * (s/ni)) AS sgm2,
                     sum(CAST(ni AS DOUBLE)*ni) AS sn2 FROM subj),
             b AS (SELECT n, k, ssw/(n-k) AS msw,
                     (sgm2 - gs*gs/n)/(k-1) AS msb,
                     (n - sn2/n)/(k-1) AS n0 FROM a),
             est AS (SELECT n, k, msw AS sigma_e2,
                     greatest((msb - msw)/n0, 0.0) AS sigma_b2 FROM b),
             cut AS (SELECT est.n, est.sigma_e2, est.sigma_b2,
                       z.z + ((pow(z.z,3)+z.z)/4)/(est.n-2)
                           + ((5*pow(z.z,5)+16*pow(z.z,3)+3*z.z)/96)/pow(est.n-2,2)
                           + ((3*pow(z.z,7)+19*pow(z.z,5)+17*pow(z.z,3)-15*z.z)/384)/pow(est.n-2,3)
                           + ((79*pow(z.z,9)+776*pow(z.z,7)+1482*pow(z.z,5)-1920*pow(z.z,3)-945*z.z)/92160)/pow(est.n-2,4)
                         AS cutoff
                     FROM est CROSS JOIN z),
             sc AS (SELECT c.cutoff, c.n,
                      (1.0/sqrt(c.sigma_e2)) * r.r
                        + ((1.0/sqrt(c.sigma_e2 + subj.ni*c.sigma_b2)
                            - 1.0/sqrt(c.sigma_e2))/subj.ni) * subj.s AS rscaled
                    FROM r JOIN subj ON r.user_id IS NOT DISTINCT FROM subj.user_id
                    CROSS JOIN cut c)
             SELECT '' AS partition, 'longitudinal_outliers' AS metric,
               CAST(sum(CASE WHEN abs(rscaled) >= cutoff THEN 1 ELSE 0 END) AS DOUBLE) AS stat,
               CAST(max(n) AS BIGINT) AS n_obs,
               sum(CASE WHEN abs(rscaled) >= cutoff THEN 1 ELSE 0 END) = 0 AS pass
             FROM sc""")),

    // M4 REML path: exact profile REML variance components per scope
    // (PROC MIXED default method parity, longitudinalPlot.sas:423-442) —
    // rows-only (the optimizer isn't SQL-expressible; the estimator is
    // matrix-likelihood-golden-tested in VarCompSpec)
    QuerySpec("q56_reml_varcomp",
      (s, dir) => {
        val ev = read(s, dir, "events")
          .withColumn("__key", lit("all"))
          .groupBy(col("__key"), col("user_id"))
          .agg(count(lit(1)).as("n"), sum("value").as("s"),
            sum(col("value") * col("value")).as("ss"))
        graft.stats.VarComp.remlEstimates(ev)
          .select(col("__key").as("scope"),
            round(col("sigma_b2"), 6).as("sigma_b2"),
            round(col("sigma_e2"), 6).as("sigma_e2"),
            col("k_subjects"), col("n_rows"))
      },
      None),

    // Multimodal plumbing: non-image binary payload → decode attempt →
    // flagged byte-fold fallback (schema + batching + the decoded flag are
    // the tested surface; real decode is q57)
    QuerySpec("q52_multimodal_decode",
      (s, dir) => {
        val docs = read(s, dir, "documents").filter(col("doc_id") < 100)
          .withColumn("payload", to_binary(md5(col("text")), lit("hex")))
        Multimodal.decodeStub(docs, "doc_id", "payload")
          .select(col("key").cast("long").as("doc_id"), col("decoded"),
            size(col("features")).as("n_features"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, false AS decoded, 8 AS n_features FROM documents
             WHERE doc_id < 100 ORDER BY doc_id""")),

    // REAL image decode (javax.imageio, in-JDK): deterministic synthetic
    // PNGs generated per row, decoded back to exact per-channel pixel sums
    // — PNG is lossless, so an independent closed-form SQL oracle
    // reproduces the sums bit-exactly
    QuerySpec("q57_image_decode",
      (s, dir) => {
        val docs = read(s, dir, "documents").filter(col("doc_id") < 64)
          .withColumn("__w", (lit(3) + col("doc_id") % 4).cast("int"))
          .withColumn("__h", (lit(2) + col("doc_id") % 3).cast("int"))
          .withColumn("payload",
            Multimodal.syntheticPngUdf(col("doc_id"), col("__w"), col("__h")))
        Multimodal.decodeImages(docs, "doc_id", "payload")
          .select(col("key").cast("long").as("doc_id"), col("decoded"),
            col("width"), col("height"), col("channels"),
            col("sum_r"), col("sum_g"), col("sum_b"), col("n_px"))
          .orderBy("doc_id")
      },
      Some("""WITH xs AS (SELECT x FROM generate_series(0, 6) t(x)),
               ys AS (SELECT y FROM generate_series(0, 4) t(y)),
               ids AS (SELECT doc_id FROM documents WHERE doc_id < 64)
             SELECT i.doc_id, true AS decoded,
               CAST(3 + i.doc_id % 4 AS INT) AS width,
               CAST(2 + i.doc_id % 3 AS INT) AS height,
               CAST(3 AS INT) AS channels,
               CAST(sum((i.doc_id * 7 + xs.x * 13 + ys.y * 31) % 256) AS BIGINT) AS sum_r,
               CAST(sum((i.doc_id * 11 + xs.x * 3 + ys.y * 17) % 256) AS BIGINT) AS sum_g,
               CAST(sum((i.doc_id * 5 + xs.x * 19 + ys.y * 23) % 256) AS BIGINT) AS sum_b,
               CAST(count(*) AS BIGINT) AS n_px
             FROM ids i JOIN xs ON xs.x < 3 + i.doc_id % 4
                        JOIN ys ON ys.y < 2 + i.doc_id % 3
             GROUP BY 1 ORDER BY 1""")),

    // REAL multi-frame extraction (animated GIF via the JDK's ImageIO
    // reader getNumImages/read(i)): deterministic grayscale animated GIFs
    // on an explicit 256-gray palette (lossless), one row per frame with
    // exact channel sums — closed-form SQL oracle (q57 pattern + a frame
    // dimension). True video codecs stay a declared stub.
    QuerySpec("q61_gif_frames",
      (s, dir) => {
        val docs = read(s, dir, "documents").filter(col("doc_id") < 8)
          .withColumn("__w", (lit(4) + col("doc_id") % 3).cast("int"))
          .withColumn("__n", (lit(2) + col("doc_id") % 3).cast("int"))
          // height >= 5: the JDK GIF codec corrupts rasters of height 2-4
          // (measured; see MultimodalSpec) — keep fixtures out of that zone
          .withColumn("payload",
            Multimodal.syntheticGifUdf(col("doc_id"), col("__w"), lit(6), col("__n")))
        Multimodal.sampleFrames(docs, "doc_id", "payload")
          .select(col("key").cast("long").as("doc_id"), col("frame_idx"),
            col("decoded"), col("width"), col("height"),
            col("sum_r"), col("sum_g"), col("sum_b"), col("n_px"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH xs AS (SELECT x FROM generate_series(0, 6) t(x)),
               ys AS (SELECT y FROM generate_series(0, 5) t(y)),
               fs AS (SELECT f FROM generate_series(0, 4) t(f)),
               ids AS (SELECT doc_id FROM documents WHERE doc_id < 8)
             SELECT i.doc_id, CAST(fs.f AS INT) AS frame_idx, true AS decoded,
               CAST(4 + i.doc_id % 3 AS INT) AS width,
               CAST(6 AS INT) AS height,
               CAST(sum((i.doc_id * 7 + fs.f * 41 + xs.x * 13 + ys.y * 31) % 256) AS BIGINT) AS sum_r,
               CAST(sum((i.doc_id * 7 + fs.f * 41 + xs.x * 13 + ys.y * 31) % 256) AS BIGINT) AS sum_g,
               CAST(sum((i.doc_id * 7 + fs.f * 41 + xs.x * 13 + ys.y * 31) % 256) AS BIGINT) AS sum_b,
               CAST(count(*) AS BIGINT) AS n_px
             FROM ids i
               JOIN fs ON fs.f < 2 + i.doc_id % 3
               JOIN xs ON xs.x < 4 + i.doc_id % 3
               CROSS JOIN ys
             GROUP BY 1, 2 ORDER BY 1, 2""")),

    // REAL video frame sampling (RIFF/AVI container walk + uncompressed
    // 24-bit DIB frames read straight off the container): deterministic
    // AVI payloads generated per row, one row per frame with exact
    // channel sums — closed-form SQL oracle (q61 pattern with the AVI
    // generator's three per-channel formulas). MJPEG chunks exercise the
    // in-JDK JPEG codec and are tolerance-tested in MultimodalSpec; true
    // inter-frame codecs (mp4/webm) remain the declared stub.
    QuerySpec("q65_avi_frames",
      (s, dir) => {
        val docs = read(s, dir, "documents").filter(col("doc_id") < 8)
          .withColumn("__w", (lit(4) + col("doc_id") % 3).cast("int"))
          .withColumn("__n", (lit(2) + col("doc_id") % 3).cast("int"))
          .withColumn("payload",
            Multimodal.syntheticAviUdf(col("doc_id"), col("__w"), lit(6), col("__n")))
        Multimodal.sampleVideoFrames(docs, "doc_id", "payload")
          .select(col("key").cast("long").as("doc_id"), col("frame_idx"),
            col("decoded"), col("codec"), col("width"), col("height"),
            col("sum_r"), col("sum_g"), col("sum_b"), col("n_px"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH xs AS (SELECT x FROM generate_series(0, 6) t(x)),
               ys AS (SELECT y FROM generate_series(0, 5) t(y)),
               fs AS (SELECT f FROM generate_series(0, 4) t(f)),
               ids AS (SELECT doc_id FROM documents WHERE doc_id < 8)
             SELECT i.doc_id, CAST(fs.f AS INT) AS frame_idx, true AS decoded,
               'dib' AS codec,
               CAST(4 + i.doc_id % 3 AS INT) AS width,
               CAST(6 AS INT) AS height,
               CAST(sum((i.doc_id * 7 + fs.f * 41 + xs.x * 13 + ys.y * 31) % 256) AS BIGINT) AS sum_r,
               CAST(sum((i.doc_id * 11 + fs.f * 43 + xs.x * 3 + ys.y * 17) % 256) AS BIGINT) AS sum_g,
               CAST(sum((i.doc_id * 5 + fs.f * 47 + xs.x * 19 + ys.y * 23) % 256) AS BIGINT) AS sum_b,
               CAST(count(*) AS BIGINT) AS n_px
             FROM ids i
               JOIN fs ON fs.f < 2 + i.doc_id % 3
               JOIN xs ON xs.x < 4 + i.doc_id % 3
               CROSS JOIN ys
             GROUP BY 1, 2 ORDER BY 1, 2""")),

    // M4 type=UN surface: unstructured within-subject covariance on the
    // day-of-week panel of the events table — complete-case pooled
    // residual covariance, per-subject Mahalanobis d² vs the χ²_T cutoff
    // (PROC MIXED repeated/type=UN shape; rows-only here, matrix math
    // py-oracled via numpy in tools/pyoracles.py)
    QuerySpec("q64_un_panel",
      (s, dir) => {
        val ev = read(s, dir, "events").withColumn("dow", dayofweek(col("ts")))
        UnPanelOutlier.scored(ev,
          UnPanelOutlier.Config("un", "value", "user_id", "dow"))
          .select(col("__subj").cast("long").as("user_id"),
            round(col("d2"), 6).as("d2"),
            round(col("cutoff"), 6).as("cutoff"),
            col("t_slots"), col("k_subjects"), col("flag_outlier"))
          .orderBy("user_id")
      },
      None),

    // REAL audio decode (javax.sound.sampled, in-JDK): deterministic
    // synthetic PCM WAVs generated per row, decoded back to exact sample
    // sums in the 16-bit domain — PCM is lossless, so the closed-form SQL
    // oracle reproduces sums/sum-of-squares/peak bit-exactly (q57 pattern)
    QuerySpec("q63_audio_decode",
      (s, dir) => {
        val docs = read(s, dir, "documents").filter(col("doc_id") < 16)
          .withColumn("__ch", (lit(1) + col("doc_id") % 2).cast("int"))
          .withColumn("__n", (lit(200) + col("doc_id") * 37).cast("int"))
          .withColumn("payload",
            Multimodal.syntheticWavUdf(col("doc_id"), lit(8000), col("__ch"), col("__n")))
        Multimodal.decodeAudio(docs, "doc_id", "payload")
          .select(col("key").cast("long").as("doc_id"), col("decoded"),
            col("sample_rate"), col("channels"), col("bits"), col("n_frames"),
            col("sum_ch0"), col("sum_ch1"), col("sumsq_ch0"), col("peak_abs"))
          .orderBy("doc_id")
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 16),
               p AS (SELECT doc_id, CAST(1 + doc_id % 2 AS INT) AS channels,
                            200 + 37 * doc_id AS n FROM ids),
               s AS (SELECT p.doc_id, p.channels, p.n, i.i, c.c,
                            (p.doc_id * 7 + c.c * 41 + i.i * 13) % 65536 - 32768 AS v
                     FROM p
                     JOIN (SELECT unnest(range(0, 800)) AS i) i ON i.i < p.n
                     JOIN (SELECT unnest(range(0, 2)) AS c) c ON c.c < p.channels)
             SELECT doc_id, true AS decoded,
               CAST(8000 AS INT) AS sample_rate,
               CAST(max(channels) AS INT) AS channels,
               CAST(16 AS INT) AS bits,
               CAST(max(n) AS BIGINT) AS n_frames,
               CAST(sum(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_ch0,
               CAST(sum(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_ch1,
               CAST(sum(CASE WHEN c = 0 THEN v * v ELSE 0 END) AS BIGINT) AS sumsq_ch0,
               CAST(max(abs(v)) AS INT) AS peak_abs
             FROM s GROUP BY 1 ORDER BY 1""")),

    // A10 pairwise grid: i<j chi-square statistic arithmetic per source
    // pair (Categorical_Check.sas:368-419 fused as one cells self-join)
    QuerySpec("q54_pairwise_chisq",
      (s, dir) => CategoricalConsistency.pairwiseTests(
        read(s, dir, "documents"),
        CategoricalConsistencyCheck("pc", "lang", "source"))
        .select(col("grp1").cast("string").as("grp1"),
          col("grp2").cast("string").as("grp2"),
          round(col("stat"), 6).as("stat"),
          col("df").cast("long").as("df"),
          col("n1"), col("n2"))
        .orderBy("grp1", "grp2"),
      Some("""WITH c AS (SELECT source, lang, count(*) AS cnt FROM documents GROUP BY 1, 2),
               dom AS (SELECT s.source, l.lang
                 FROM (SELECT DISTINCT source FROM c) s
                 CROSS JOIN (SELECT DISTINCT lang FROM c) l),
               f AS (SELECT dom.source, dom.lang, COALESCE(c.cnt, 0) AS cnt
                 FROM dom LEFT JOIN c ON c.source = dom.source AND c.lang = dom.lang),
               tot AS (SELECT source, sum(cnt) AS n FROM f GROUP BY 1),
               p AS (SELECT a.source AS grp1, b.source AS grp2, a.lang,
                   CAST(a.cnt AS DOUBLE) AS c1, CAST(b.cnt AS DOUBLE) AS c2,
                   ta.n AS n1, tb.n AS n2
                 FROM f a JOIN f b ON a.lang = b.lang AND a.source < b.source
                 JOIN tot ta ON ta.source = a.source
                 JOIN tot tb ON tb.source = b.source)
             SELECT grp1, grp2,
               round(sum(
                 CASE WHEN n1 * (c1 + c2) > 0 THEN
                   pow(c1 - n1 * (c1 + c2) / (n1 + n2), 2) / (n1 * (c1 + c2) / (n1 + n2))
                 ELSE 0 END +
                 CASE WHEN n2 * (c1 + c2) > 0 THEN
                   pow(c2 - n2 * (c1 + c2) / (n1 + n2), 2) / (n2 * (c1 + c2) / (n1 + n2))
                 ELSE 0 END), 6) AS stat,
               CAST(count(DISTINCT CASE WHEN c1 + c2 > 0 THEN lang END) - 1 AS BIGINT) AS df,
               CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2
             FROM p GROUP BY 1, 2 ORDER BY 1, 2""")),

    // The `_All_` overall bar per panel (Categorical_Check.sas:317-340)
    QuerySpec("q55_overall_bar",
      (s, dir) => CategoricalConsistency.overallBar(
        read(s, dir, "documents"),
        CategoricalConsistencyCheck("ob", "lang", "source"))
        .select(col("value").as("lang"), col("cnt"),
          round(col("row_pct"), 6).as("row_pct"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS cnt,
               round(count(*) * 100.0 / sum(count(*)) OVER (), 6) AS row_pct
             FROM documents GROUP BY 1 ORDER BY 1""")),

    // M4 joint-estimation step: OLS vs feasible-GLS fixed effects (value ~
    // day, random intercept per user) — checked against an independent
    // DENSE textbook GLS (numpy per-subject V inversion) in the python
    // oracle; the engine path never materializes any V. The DuckDB oracle
    // additionally replays the whole sufficient-statistics chain: OLS β →
    // MoM components → cᵢ = σ²_b/(σ²_e + nᵢσ²_b) → adjusted 2×2 normal
    // equations solved closed-form (Fgls.refit's arithmetic exactly).
    QuerySpec("q59_fgls_model",
      (s, dir) => {
        // centered day index: raw epoch-days (~19723) are near-collinear
        // with the intercept, which would make the comparison
        // conditioning-bound instead of semantics-bound
        // ts is TIMESTAMP_NTZ in the fixture: cast through LTZ (session tz
        // is UTC) to get epoch seconds, matching DuckDB's epoch(ts)
        val ev = read(s, dir, "events")
          .withColumn("t_day",
            col("ts").cast("timestamp_ltz").cast("double") / 86400.0 - 19723.0)
        LongitudinalOutlier.modelSummary(ev,
          LongitudinalOutlierCheck("fg", "value", "user_id",
            contCovariates = Seq("t_day")))
          .select(col("partition"),
            round(element_at(col("beta_ols"), 1), 6).as("b0_ols"),
            round(element_at(col("beta_ols"), 2), 6).as("b1_ols"),
            round(element_at(col("beta_gls"), 1), 6).as("b0_gls"),
            round(element_at(col("beta_gls"), 2), 6).as("b1_gls"),
            round(col("sigma_b2"), 6).as("sigma_b2"),
            round(col("sigma_e2"), 6).as("sigma_e2"),
            col("n_rows"))
      },
      Some("""WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS subj,
                      epoch(ts)/86400.0 - 19723.0 AS t, CAST(value AS DOUBLE) AS y
                    FROM events
                    WHERE value IS NOT NULL AND ts IS NOT NULL),
             g AS (SELECT count(*) AS n, avg(t) AS tbar, avg(y) AS ybar,
                     sum(t*t) AS stt, sum(t*y) AS sty, sum(t) AS st, sum(y) AS sy
                   FROM ev),
             ols AS (SELECT n, st, sy, stt, sty,
                     (sty - n*tbar*ybar)/(stt - n*tbar*tbar) AS b1,
                     ybar - (sty - n*tbar*ybar)/(stt - n*tbar*tbar)*tbar AS b0 FROM g),
             r AS (SELECT e.subj, e.t, e.y, e.y - o.b0 - o.b1*e.t AS r
                   FROM ev e CROSS JOIN ols o),
             subj AS (SELECT subj, count(*) AS ni, sum(r) AS s, sum(r*r) AS ss,
                        sum(t) AS sti, sum(y) AS syi
                      FROM r GROUP BY 1),
             a AS (SELECT sum(ni) AS n, count(*) AS k, sum(s) AS gs,
                     sum(ss - s*s/ni) AS ssw, sum(ni*(s/ni)*(s/ni)) AS sgm2,
                     sum(CAST(ni AS DOUBLE)*ni) AS sn2 FROM subj),
             est AS (SELECT n, k, ssw/(n-k) AS sigma_e2,
                     greatest(((sgm2 - gs*gs/n)/(k-1) - ssw/(n-k))
                              /((n - sn2/n)/(k-1)), 0.0) AS sigma_b2
                     FROM a),
             wsum AS (SELECT sum(c*ni*ni) AS w00, sum(c*ni*sti) AS w01,
                        sum(c*sti*sti) AS w11,
                        sum(c*ni*syi) AS wy0, sum(c*sti*syi) AS wy1
                      FROM (SELECT s.*,
                              CASE WHEN e.sigma_e2 > 0 AND e.sigma_b2 >= 0
                                THEN e.sigma_b2/(e.sigma_e2 + s.ni*e.sigma_b2)
                                ELSE 0.0 END AS c
                            FROM subj s CROSS JOIN est e)),
             gls AS (SELECT o.n, o.b0, o.b1,
                       (o.n - w.w00) AS a00, (o.st - w.w01) AS a01,
                       (o.stt - w.w11) AS a11,
                       (o.sy - w.wy0) AS c0, (o.sty - w.wy1) AS c1
                     FROM ols o CROSS JOIN wsum w),
             bet AS (SELECT n, b0, b1,
                       (a11*c0 - a01*c1)/(a00*a11 - a01*a01) AS b0g,
                       (a00*c1 - a01*c0)/(a00*a11 - a01*a01) AS b1g FROM gls)
             SELECT '' AS partition,
               round(b.b0, 6) AS b0_ols, round(b.b1, 6) AS b1_ols,
               round(b.b0g, 6) AS b0_gls, round(b.b1g, 6) AS b1_gls,
               round(e.sigma_b2, 6) AS sigma_b2, round(e.sigma_e2, 6) AS sigma_e2,
               CAST(b.n AS BIGINT) AS n_rows
             FROM bet b CROSS JOIN est e""")),

    // M1-M3 Cook's-D surface of the SAME RegressionOutlier operator as
    // q48, restricted to the SQL-expressible flag family: on a simple
    // design (intercept + one continuous) cookd = e²h/(2s²(1−h)²) and the
    // cutoff is cookCutoff/n (BivariatePlot.sas:481-484) — closed-form in
    // DuckDB, so the operator's flagging path gets a driver-visible hash
    // row (the tinv-based rstudent family stays py-oracled via q48)
    QuerySpec("q66_cookd_outlier",
      (s, dir) => RegressionOutlier.flagged(
        read(s, dir, "lineitem"),
        RegressionOutlierCheck("cd", "l_extendedprice", "l_orderkey",
          contCovariates = Seq("l_quantity"), scope = Seq("l_returnflag"),
          cutoffPct = 99.9, cookCutoff = Some(4.0)))
        .groupBy(col("__key"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("flag_cookd"), 1L).otherwise(0L)).as("n_cookd"),
          round(max(col("cookd")), 6).as("max_cookd"),
          round(first(col("cookd_cutoff")), 9).as("cookd_cutoff"))
        .select(col("__key").as("g"), col("n"), col("n_cookd"),
          col("max_cookd"), col("cookd_cutoff"))
        .orderBy("g"),
      Some("""WITH s AS (SELECT l_returnflag AS g, l_quantity AS x, l_extendedprice AS y,
                 count(*) OVER (PARTITION BY l_returnflag) AS n,
                 avg(l_quantity) OVER (PARTITION BY l_returnflag) AS xbar,
                 avg(l_extendedprice) OVER (PARTITION BY l_returnflag) AS ybar,
                 sum(l_quantity * l_quantity) OVER (PARTITION BY l_returnflag) AS sx2,
                 sum(l_quantity * l_extendedprice) OVER (PARTITION BY l_returnflag) AS sxy0,
                 sum(l_extendedprice * l_extendedprice) OVER (PARTITION BY l_returnflag) AS sy2
               FROM lineitem),
             t AS (SELECT g, x, y, n, xbar, ybar,
                 sx2 - n * xbar * xbar AS sxx,
                 sxy0 - n * xbar * ybar AS sxy,
                 sy2 - n * ybar * ybar AS syy FROM s),
             u AS (SELECT g, n,
                 y - ybar - (sxy / sxx) * (x - xbar) AS e,
                 1.0 / n + (x - xbar) * (x - xbar) / sxx AS h,
                 (syy - (sxy / sxx) * sxy) / (n - 2) AS s2 FROM t),
             v AS (SELECT g, n,
                 e * e * h / (2 * s2 * (1.0 - h) * (1.0 - h)) AS cookd FROM u)
             SELECT g, count(*) AS n,
               CAST(sum(CASE WHEN cookd > 4.0 / n THEN 1 ELSE 0 END) AS BIGINT) AS n_cookd,
               round(max(cookd), 6) AS max_cookd,
               round(4.0 / max(n), 9) AS cookd_cutoff
             FROM v GROUP BY g ORDER BY g""")),

    // M4 MoM path: ANOVA method-of-moments variance components (the fully
    // distributed estimator behind LongitudinalOutlier/FGLS) — pure
    // closed-form arithmetic over per-subject sufficient stats, so unlike
    // the REML optimizer (q56) it IS SQL-expressible and gets a
    // driver-visible DuckDB hash row
    QuerySpec("q68_mom_varcomp",
      (s, dir) => {
        // + user_id*10 plants a deterministic between-subject component so
        // sigma_b2 > 0 and the MoM arithmetic (not just the max(0,·)
        // clamp) is what the oracle checks
        val ev = read(s, dir, "events")
          .withColumn("v", col("value") + col("user_id") * 10.0)
          .withColumn("__key", lit("all"))
          .groupBy(col("__key"), col("user_id"))
          .agg(count(lit(1)).as("n"), sum("v").as("s"),
            sum(col("v") * col("v")).as("ss"))
        graft.stats.VarComp.estimates(ev)
          .select(col("__key").as("scope"),
            round(col("sigma_b2"), 6).as("sigma_b2"),
            round(col("sigma_e2"), 6).as("sigma_e2"),
            col("k_subjects"), col("n_rows"))
      },
      Some("""WITH ev AS (SELECT user_id, value + user_id * 10.0 AS v FROM events),
             subj AS (SELECT user_id, count(*) AS n, sum(v) AS s,
                 sum(v * v) AS ss FROM ev GROUP BY 1),
             a AS (SELECT sum(n) AS n, count(*) AS k, sum(s) AS gs,
                 sum(ss - s * s / n) AS ssw,
                 sum(n * (s / n) * (s / n)) AS sgm2,
                 sum(n * n) AS sn2 FROM subj),
             b AS (SELECT n, k,
                 ssw / (n - k) AS msw,
                 (sgm2 - gs * gs / n) / (k - 1) AS msb,
                 (n - sn2 * 1.0 / n) / (k - 1) AS n0 FROM a)
             SELECT 'all' AS scope,
               round(greatest((msb - msw) / n0, 0.0), 6) AS sigma_b2,
               round(msw, 6) AS sigma_e2,
               CAST(k AS BIGINT) AS k_subjects,
               CAST(n AS BIGINT) AS n_rows
             FROM b""")),

    // M4 random = INTERCEPT t (type=UN) — Swamy-type two-stage MoM for
    // intercept+slope variance components (stats.RandomSlope): every step
    // is closed-form arithmetic (per-subject OLS from sufficient stats,
    // bias-corrected coefficient covariance, marginal studentized
    // residuals), so unlike REML the whole chain gets a DuckDB oracle
    QuerySpec("q67_random_slope",
      (s, dir) => {
        val ev = read(s, dir, "events")
          .withColumn("t_day",
            col("ts").cast("timestamp_ltz").cast("double") / 86400.0 - 19723.0)
        val d = OlsPass.design(ev, Seq("t_day"), Nil)
        val fits = OlsPass.fitPerGroup(ev, "value", d, Nil)
        val wr = OlsPass.rowStats(ev, "value", d, Nil, fits)
        val est = graft.stats.RandomSlope.estimates(
          graft.stats.RandomSlope.subjStats(
            wr.withColumn("__subj", col("user_id").cast("string")),
            "__key", "__subj", "t_day", "resid"))
        val counts = wr.join(broadcast(est), Seq("__key"))
          .withColumn("rscaled",
            graft.stats.RandomSlope.scaledResidual(col("resid"), col("t_day")))
          .groupBy(col("__key"))
          .agg(sum(when(abs(col("rscaled")) >= 2.0, 1L).otherwise(0L)).as("n_ge2"))
        est.join(counts, Seq("__key"))
          .select(round(col("sigma_e2"), 6).as("sigma_e2"),
            round(col("g00"), 6).as("g00"),
            round(col("g01"), 6).as("g01"),
            round(col("g11"), 6).as("g11"),
            col("k3"), col("n_rows"), col("n_ge2"))
      },
      Some("""WITH ev AS (SELECT user_id, epoch(ts)/86400.0 - 19723.0 AS t, value AS y FROM events),
             g AS (SELECT count(*) AS n, avg(t) AS xbar, avg(y) AS ybar,
                     sum(t*t) AS sx2, sum(t*y) AS sxy0 FROM ev),
             r AS (SELECT e.user_id, e.t,
                     e.y - g.ybar - ((g.sxy0 - g.n*g.xbar*g.ybar)/(g.sx2 - g.n*g.xbar*g.xbar)) * (e.t - g.xbar) AS r
                   FROM ev e CROSS JOIN g),
             subj AS (SELECT user_id, count(*) AS n, sum(t) AS st, sum(t*t) AS stt,
                        sum(r) AS sr, sum(r*t) AS srt, sum(r*r) AS srr
                      FROM r GROUP BY 1),
             ps AS (SELECT *, n*stt - st*st AS det,
                      (n >= 3 AND n*stt - st*st > 1e-12*(abs(n*stt)+1.0)) AS ok FROM subj),
             ps2 AS (SELECT *, (stt*sr - st*srt)/det AS a, (n*srt - st*sr)/det AS c
                     FROM ps WHERE ok),
             agg AS (SELECT (SELECT sum(n) FROM subj) AS n_rows,
                      count(*) AS k3, sum(n-2) AS dfe,
                      sum(srr - a*sr - c*srt) AS sse_sum,
                      sum(a) AS sa, sum(c) AS sc, sum(a*a) AS saa,
                      sum(c*c) AS scc, sum(a*c) AS sac,
                      sum(stt/det) AS sv00, sum(-st/det) AS sv01, sum(n/det) AS sv11
                    FROM ps2),
             est AS (SELECT n_rows, k3, sse_sum/dfe AS sigma_e2,
                      (saa - sa*sa/k3)/(k3-1) AS s00, (scc - sc*sc/k3)/(k3-1) AS s11,
                      (sac - sa*sc/k3)/(k3-1) AS s01,
                      sv00/k3 AS v00, sv01/k3 AS v01, sv11/k3 AS v11 FROM agg),
             est2 AS (SELECT n_rows, k3, sigma_e2,
                      greatest(s00 - sigma_e2*v00, 0.0) AS g00,
                      greatest(s11 - sigma_e2*v11, 0.0) AS g11,
                      s01 - sigma_e2*v01 AS g01raw FROM est),
             est3 AS (SELECT *, sign(g01raw) * least(abs(g01raw), sqrt(g00*g11)) AS g01 FROM est2),
             cnt AS (SELECT count(*) AS n_ge2 FROM r CROSS JOIN est3
                     WHERE g00 + 2*g01*r.t + g11*r.t*r.t + sigma_e2 > 0
                       AND abs(r.r / sqrt(g00 + 2*g01*r.t + g11*r.t*r.t + sigma_e2)) >= 2.0)
             SELECT round(sigma_e2, 6) AS sigma_e2, round(g00, 6) AS g00,
               round(g01, 6) AS g01, round(g11, 6) AS g11,
               CAST(k3 AS BIGINT) AS k3, CAST(n_rows AS BIGINT) AS n_rows,
               (SELECT n_ge2 FROM cnt) AS n_ge2
             FROM est3""")),

    // M4 random = INTERCEPT t, method = reml: exact REML for the
    // unstructured 2×2 G (stats.RandomSlope.remlEstimates — guarded
    // design-class collect + driver Nelder–Mead, the VarComp.remlEstimates
    // pattern generalized from size classes to (n, Σt, Σt²) classes).
    // Rows-only for the driver (the optimizer is not SQL-expressible);
    // py-oracled against an independent DENSE-likelihood REML in
    // tools/pyoracles.py (numpy V per subject, own Nelder–Mead). The
    // compared surface is (σ²ₑ, achieved −2l_R), NOT the raw G entries:
    // when σ²_G ≪ σ²ₑ the likelihood is a flat ridge in G (sf0.01 events:
    // two converged optimizers differ 3.4× in g00 at Δ(−2l_R) = 1.3e-3,
    // against a G=0-to-optimum span of only 0.54), so ridge coordinates
    // are not reproducible across independent optimizers while the
    // objective value — the actual optimality claim — is.
    QuerySpec("q69_slope_reml",
      (s, dir) => {
        val ev = read(s, dir, "events")
          .withColumn("t_day",
            col("ts").cast("timestamp_ltz").cast("double") / 86400.0 - 19723.0)
        val d = OlsPass.design(ev, Seq("t_day"), Nil)
        val fits = OlsPass.fitPerGroup(ev, "value", d, Nil)
        val wr = OlsPass.rowStats(ev, "value", d, Nil, fits)
        graft.stats.RandomSlope.remlEstimatesWithObjective(
          graft.stats.RandomSlope.subjStats(
            wr.withColumn("__subj", col("user_id").cast("string")),
            "__key", "__subj", "t_day", "resid"))
          .select(round(col("sigma_e2"), 6).as("sigma_e2"),
            round(col("neg2lr"), 4).as("neg2lr"),
            col("k3"), col("n_rows"))
      },
      None),

    // M4 general `random=` term list: random INTERCEPT t t² / type=UN —
    // the arbitrary-term surface (longitudinalPlot.sas:436-440) via the
    // generalized Swamy two-stage MoM (stats.RandomEffects: packed q×q
    // per-subject solves on the reduced frame, per-scope PSD eigen-clamp).
    // Rows-only for the driver (a 3×3 adjugate chain is technically SQL
    // but unreadable); py-oracled against an independent numpy dense
    // two-stage computation (lstsq residuals, per-subject solve/inv,
    // eigh clamp) in tools/pyoracles.py. Unlike the REML optimizers the
    // Swamy estimate is closed-form deterministic arithmetic, so the G
    // ENTRIES are directly comparable (no flat-ridge caveat).
    QuerySpec("q72_random_effects",
      (s, dir) => {
        val ev = read(s, dir, "events")
          .withColumn("t_day",
            col("ts").cast("timestamp_ltz").cast("double") / 86400.0 - 19723.0)
          .withColumn("t_day2", col("t_day") * col("t_day"))
        val d = OlsPass.design(ev, Seq("t_day"), Nil)
        val fits = OlsPass.fitPerGroup(ev, "value", d, Nil)
        val wr = OlsPass.rowStats(ev, "value", d, Nil, fits)
        val terms = Seq("t_day", "t_day2")
        graft.stats.RandomEffects.estimates(
          graft.stats.RandomEffects.subjStats(
            wr.withColumn("__subj", col("user_id").cast("string")),
            "__key", "__subj", terms, "resid"), terms.size)
          .select(round(col("sigma_e2"), 6).as("sigma_e2"),
            round(element_at(col("g"), 1), 9).as("g00"),
            round(element_at(col("g"), 2), 9).as("g01"),
            round(element_at(col("g"), 3), 9).as("g02"),
            round(element_at(col("g"), 4), 9).as("g11"),
            round(element_at(col("g"), 5), 9).as("g12"),
            round(element_at(col("g"), 6), 9).as("g22"),
            col("k3"), col("n_rows"))
      },
      None),

    // DuckDB shadow of the q64 UN-panel family: with T = 2 slots the
    // pooled Σ̂ is 2×2, its inverse is closed-form, and the χ²₂ quantile
    // is −2·ln(1−p) — so the ENTIRE Mahalanobis scoring chain (complete-
    // case panel → slot-mean residuals → pooled covariance → d² → flag)
    // is SQL-expressible and hash-compared against DuckDB; only the T×T
    // general inverse (q64) stays py-oracled. Slot = day-of-month parity
    // (engine-agnostic, unlike dayofweek's origin convention).
    QuerySpec("q70_un_panel_2slot",
      (s, dir) => {
        val ev = read(s, dir, "events")
          .withColumn("par", pmod(dayofmonth(col("ts")), lit(2)))
        UnPanelOutlier.scored(ev,
          UnPanelOutlier.Config("un2", "value", "user_id", "par"))
          .select(col("__subj").cast("long").as("user_id"),
            round(col("d2"), 6).as("d2"),
            round(col("cutoff"), 6).as("cutoff"),
            col("t_slots"), col("k_subjects"), col("flag_outlier"))
          .orderBy("user_id")
      },
      Some("""WITH cell AS (
               SELECT user_id, CAST(extract(day FROM ts) % 2 AS INT) AS s,
                      avg(value) AS y
               FROM events GROUP BY 1, 2),
             comp AS (SELECT user_id FROM cell GROUP BY 1 HAVING count(*) = 2),
             pan AS (SELECT c.* FROM cell c JOIN comp USING (user_id)),
             mu AS (SELECT s, avg(y) AS mu FROM pan GROUP BY 1),
             r AS (SELECT p.user_id, p.s, p.y - m.mu AS r
                   FROM pan p JOIN mu m USING (s)),
             w AS (SELECT user_id,
                     max(CASE WHEN s = 0 THEN r END) AS r0,
                     max(CASE WHEN s = 1 THEN r END) AS r1
                   FROM r GROUP BY 1),
             sig AS (SELECT sum(r0*r0)/(count(*) - 1) AS a,
                            sum(r0*r1)/(count(*) - 1) AS b,
                            sum(r1*r1)/(count(*) - 1) AS c,
                            count(*) AS k FROM w)
             SELECT w.user_id,
               round((sig.c*r0*r0 - 2*sig.b*r0*r1 + sig.a*r1*r1)
                     / (sig.a*sig.c - sig.b*sig.b), 6) AS d2,
               round(-2 * ln(1 - 0.99), 6) AS cutoff,
               2 AS t_slots,
               CAST(sig.k AS BIGINT) AS k_subjects,
               (sig.c*r0*r0 - 2*sig.b*r0*r1 + sig.a*r1*r1)
                 / (sig.a*sig.c - sig.b*sig.b) > -2 * ln(1 - 0.99)
                 AS flag_outlier
             FROM w CROSS JOIN sig ORDER BY user_id""")),

    // Exact-dup drop-list operator (keep-min-id policy)
    QuerySpec("q53_dedup_droplist",
      (s, dir) => {
        val d = read(s, dir, "documents").filter(col("doc_id") < 200)
          .select("doc_id", "text")
        val dup = d.select((col("doc_id") + 1000000).as("doc_id"), col("text"))
        Dedup.exactDropList(d.unionByName(dup), "doc_id", "text")
          .select("drop_id").orderBy("drop_id")
      },
      Some("""SELECT doc_id + 1000000 AS drop_id FROM documents
             WHERE doc_id < 200 ORDER BY 1""")),

    // DuckDB shadow of the q56 REML family: the PROFILED restricted
    // −2 log-likelihood −2l_R(λ) is closed-form in the size-class sums
    // (formula at stats.VarComp.remlFromSizeStats), so evaluating the
    // production objective (VarComp.neg2lrProfile — the exact function
    // the optimizer minimizes) at a FIXED λ grid is hash-comparable
    // against a full SQL recomputation; only the argmin search itself
    // (coarse log-λ scan + golden section) stays py-oracled via q56.
    // Rounded to 2 decimals: the objective is O(N·log Q) ~ 1e5 and the
    // engines sum the centered Q terms in different orders; any formula
    // defect shifts the value by O(1)..O(1e3), far above the rounding.
    QuerySpec("q73_reml_objective",
      (s, dir) => {
        import s.implicits._
        val subj = read(s, dir, "events")
          .withColumn("__key", lit("all"))
          .groupBy(col("__key"), col("user_id"))
          .agg(count(lit(1)).as("n"), sum("value").as("s"),
            sum(col("value") * col("value")).as("ss"))
        val stats = graft.stats.VarComp.sizeStats(subj)
          .select(col("n"), col("k"), col("sum_s"), col("sum_s2"), col("sum_ss"))
          .as[(Long, Long, Double, Double, Double)].collect()
          .map(r => graft.stats.VarComp.SizeStat(r._1, r._2, r._3, r._4, r._5))
          .toSeq
        Seq(0.0, 0.05, 0.25, 1.0, 4.0, 20.0)
          .map(l => (l, graft.stats.VarComp.neg2lrProfile(stats, l)))
          .toDF("lambda", "neg2lr")
          .select(col("lambda"), round(col("neg2lr"), 2).as("neg2lr"))
          .orderBy("lambda")
      },
      Some("""WITH subj AS (SELECT user_id, count(*) AS n,
                      sum(value) AS s, sum(value*value) AS ss
                    FROM events GROUP BY 1),
             cls AS (SELECT n, count(*) AS k, sum(s) AS sum_s,
                       sum(s*s) AS sum_s2, sum(ss) AS sum_ss
                     FROM subj GROUP BY 1),
             tot AS (SELECT sum(n*k) AS nn FROM cls),
             grid AS (SELECT CAST(lambda AS DOUBLE) AS lambda
                      FROM (VALUES (0.0),(0.05),(0.25),(1.0),(4.0),(20.0)) t(lambda)),
             mu AS (SELECT g.lambda,
                      sum(sum_s/(1+n*g.lambda)) / sum(n*k/(1+n*g.lambda)) AS mu,
                      sum(n*k/(1+n*g.lambda)) AS swnk
                    FROM cls CROSS JOIN grid g GROUP BY 1),
             obj AS (SELECT m.lambda,
                       sum( (sum_ss - 2*m.mu*sum_s + k*n*m.mu*m.mu)
                          - m.lambda/(1+n*m.lambda)
                            * (sum_s2 - 2*n*m.mu*sum_s
                               + k*CAST(n AS DOUBLE)*n*m.mu*m.mu) ) AS q,
                       sum(k*ln(1+n*m.lambda)) AS logdet,
                       max(m.swnk) AS swnk
                     FROM cls CROSS JOIN mu m GROUP BY 1)
             SELECT o.lambda,
               round((tot.nn - 1)*ln(o.q) + o.logdet + ln(o.swnk), 2) AS neg2lr
             FROM obj o CROSS JOIN tot ORDER BY o.lambda""")),

    // DuckDB shadow of the q47 Freeman–Halton family: on a 2×3 table the
    // exact-test enumeration is two nested series (x1, x2 fix the whole
    // table), so the FULL production path — one-vs-rest cells →
    // conditional hypergeometric log-probabilities via lchoose → the
    // p = Σ P(t) over tables with P(t) ≤ P_obs·(1+1e-7) tail, min 1 —
    // is recomputed in SQL with lgamma and hash-compared at 6 decimals;
    // the general 2×C DP/DFS network algorithm (q47) stays py-oracled.
    // The fixture pins 3 sources × {en,de} so the table is genuinely
    // 2×3 and within the exact-enumeration budget at every sf; test_used
    // pins that the exact path (not the chisq fallback) produced p.
    QuerySpec("q74_fisher_fh",
      (s, dir) => {
        val docs = read(s, dir, "documents")
          .filter(col("lang").isin("en", "de") &&
            col("source").isin("src0", "src1", "src2"))
        CategoricalConsistency.tests(docs,
          CategoricalConsistencyCheck("fh3", "source", "lang", test = "fisher"))
          .select(col("grp"), round(col("p_raw"), 6).as("p_fh"),
            col("test_used"))
          .orderBy("grp")
      },
      Some("""WITH d AS (SELECT lang, source FROM documents
                    WHERE lang IN ('en','de')
                      AND source IN ('src0','src1','src2')),
             cols AS (SELECT source, count(*) AS c FROM d GROUP BY 1),
             grps AS (SELECT DISTINCT lang AS grp FROM d),
             o0 AS (SELECT lang AS grp, source, count(*) AS x
                    FROM d GROUP BY 1, 2),
             obs AS (SELECT g.grp, c.source, c.c, coalesce(o.x, 0) AS x
                     FROM grps g CROSS JOIN cols c
                     LEFT JOIN o0 o ON o.grp = g.grp AND o.source = c.source),
             m AS (SELECT grp, sum(x) AS r1, sum(c) AS n,
                     sum(lgamma(c+1) - lgamma(x+1) - lgamma(c-x+1)) AS lpobs
                   FROM obs GROUP BY 1),
             ct AS (SELECT max(CASE WHEN source='src0' THEN c END) AS c1,
                           max(CASE WHEN source='src1' THEN c END) AS c2,
                           max(CASE WHEN source='src2' THEN c END) AS c3
                    FROM cols),
             enum AS (SELECT m.grp, m.r1, m.n, m.lpobs,
                        ct.c1, ct.c2, ct.c3,
                        a.v AS x1, b.v AS x2, m.r1 - a.v - b.v AS x3
                      FROM m CROSS JOIN ct
                      CROSS JOIN generate_series(0, 600) AS a(v)
                      CROSS JOIN generate_series(0, 600) AS b(v)
                      WHERE a.v <= ct.c1 AND b.v <= ct.c2
                        AND m.r1 - a.v - b.v BETWEEN 0 AND ct.c3),
             lp AS (SELECT grp, lpobs, n, r1,
                      (lgamma(c1+1) - lgamma(x1+1) - lgamma(c1-x1+1))
                    + (lgamma(c2+1) - lgamma(x2+1) - lgamma(c2-x2+1))
                    + (lgamma(c3+1) - lgamma(x3+1) - lgamma(c3-x3+1)) AS lpt
                    FROM enum)
             SELECT grp,
               round(least(1.0, sum(CASE WHEN lpt <= lpobs + ln(1.0000001)
                   THEN exp(lpt - (lgamma(n+1) - lgamma(r1+1)
                                   - lgamma(n-r1+1))) ELSE 0 END)), 6) AS p_fh,
               'fisher' AS test_used
             FROM lp GROUP BY grp ORDER BY grp""")),

    // M4 general random= with method = reml: exact REML for the q×q
    // unstructured G (stats.RandomEffects.remlEstimates — the RandomSlope
    // Woodbury/Cholesky machinery generalized to bounded q×q dense ops
    // over guarded (key, packed-T'T) design classes; closes the last
    // SURVEY §7.6(1) deviation up to RemlMaxTerms). random INTERCEPT t t²
    // here → q = 3, 7 simplex parameters. Rows-only for the driver;
    // py-oracled against an independent DENSE-V numpy REML with its own
    // Nelder–Mead (tools/pyoracles.py q75). Compared surface is
    // (σ²ₑ, achieved −2l_R), NOT the G entries — the likelihood is a
    // flat ridge in G when σ²_G ≪ σ²ₑ (see q69's measurement), so only
    // the objective value is reproducible across independent optimizers.
    QuerySpec("q75_random_effects_reml",
      (s, dir) => {
        val ev = read(s, dir, "events")
          .withColumn("t_day",
            col("ts").cast("timestamp_ltz").cast("double") / 86400.0 - 19723.0)
          .withColumn("t_day2", col("t_day") * col("t_day"))
        val d = OlsPass.design(ev, Seq("t_day"), Nil)
        val fits = OlsPass.fitPerGroup(ev, "value", d, Nil)
        val wr = OlsPass.rowStats(ev, "value", d, Nil, fits)
        val terms = Seq("t_day", "t_day2")
        graft.stats.RandomEffects.remlEstimatesWithObjective(
          graft.stats.RandomEffects.subjStats(
            wr.withColumn("__subj", col("user_id").cast("string")),
            "__key", "__subj", terms, "resid"), terms.size)
          .select(round(col("sigma_e2"), 6).as("sigma_e2"),
            round(col("neg2lr"), 4).as("neg2lr"),
            col("k3"), col("n_rows"))
      },
      None)
  )
}
