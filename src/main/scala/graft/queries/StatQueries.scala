package graft.queries

import graft.queries.QuerySpec.read
import graft.operators.{DigitPreference, PanelBins}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-operator coverage (SURVEY.md §2.6-2.7) with DuckDB oracles
  * for everything expressible as portable arithmetic (test statistics,
  * expansions, adjustments). p-values that need distribution CDFs are
  * covered by ScalaTest goldens instead (no CDFs in DuckDB).
  */
object StatQueries {

  val all: Seq[QuerySpec] = Seq(

    // A7: crosstab with row percents (proc freq shape,
    // Categorical_Check.sas:154-164)
    QuerySpec("q11_crosstab_pct",
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
        read(s, dir, "orders")
          .groupBy("o_orderpriority", "o_orderstatus")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("row_pct",
            round(col("cnt") * 100.0 / sum("cnt").over(w), 6))
          .orderBy("o_orderpriority", "o_orderstatus")
      },
      Some("""SELECT o_orderpriority, o_orderstatus, cnt,
               round(cnt * 100.0 / sum(cnt) OVER (PARTITION BY o_orderpriority), 6) AS row_pct
             FROM (SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
                   FROM orders GROUP BY 1, 2) t
             ORDER BY 1, 2""")),

    // A9: one-vs-rest inBar expansion (Categorical_Check.sas:175-184)
    QuerySpec("q12_one_vs_rest",
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
        read(s, dir, "orders")
          .groupBy("o_orderpriority", "o_orderstatus")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("tot", sum("cnt").over(w))
          .select(col("o_orderpriority"), col("o_orderstatus"),
            explode(array(
              struct(lit(1).as("in_bar"), col("cnt").as("freq")),
              struct(lit(0).as("in_bar"), (col("tot") - col("cnt")).as("freq")))).as("z"))
          .select(col("o_orderpriority"), col("o_orderstatus"),
            col("z.in_bar").as("in_bar"), col("z.freq").as("freq"))
          .orderBy(col("o_orderpriority"), col("o_orderstatus"), col("in_bar").desc)
      },
      Some("""WITH c AS (SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
                 sum(count(*)) OVER (PARTITION BY o_orderpriority) AS tot
               FROM orders GROUP BY 1, 2)
             SELECT o_orderpriority, o_orderstatus, 1 AS in_bar,
               CAST(cnt AS BIGINT) AS freq FROM c
             UNION ALL
             SELECT o_orderpriority, o_orderstatus, 0 AS in_bar,
               CAST(tot - cnt AS BIGINT) AS freq FROM c
             ORDER BY 1, 2, 3 DESC""")),

    // J6: zero-fill shell join (category completion,
    // Categorical_Check.sas:191-207)
    QuerySpec("q13_zero_fill",
      (s, dir) => {
        val ev = read(s, dir, "events")
        val counts = ev.groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt"))
        val types = counts.select("event_type").distinct()
        val users = counts.select("user_id").distinct()
        types.crossJoin(users)
          .join(counts, Seq("event_type", "user_id"), "left")
          .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
          .orderBy("event_type", "user_id")
      },
      Some("""WITH c AS (SELECT event_type, user_id, count(*) AS cnt
                 FROM events GROUP BY 1, 2)
             SELECT t.event_type, u.user_id, COALESCE(c.cnt, 0) AS cnt
             FROM (SELECT DISTINCT event_type FROM c) t
             CROSS JOIN (SELECT DISTINCT user_id FROM c) u
             LEFT JOIN c ON c.event_type = t.event_type AND c.user_id = u.user_id
             ORDER BY 1, 2""")),

    // O5: dense group numbering (univariatePlot.sas:360-363). A global
    // dense_rank window would funnel every row through ONE partition; the
    // scalable shape ranks only the DISTINCT key frame (tiny — group labels)
    // and broadcast-joins the index back. The rank itself is computed
    // without any window: dense_rank(v) = #distinct keys <= v, an
    // inequality self-join on the d-row distinct frame (O(d²) pairs on KB
    // of data, fully parallel, no single-partition exchange).
    QuerySpec("q14_dense_rank",
      (s, dir) => {
        val sup = read(s, dir, "supplier")
        val keys = sup.select("s_nationkey").distinct()
        val ranks = keys.join(keys.select(col("s_nationkey").as("__k2")),
            col("__k2") <= col("s_nationkey"))
          .groupBy("s_nationkey")
          .agg(count(lit(1)).cast("long").as("nation_grp"))
        sup.join(broadcast(ranks), "s_nationkey")
          .select("s_suppkey", "s_nationkey", "nation_grp")
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_nationkey,
               dense_rank() OVER (ORDER BY s_nationkey) AS nation_grp
             FROM supplier ORDER BY 1""")),

    // F2/F3: calendar panel binning (Categorical_Check.sas:104-141)
    QuerySpec("q15_calendar_bin",
      (s, dir) => read(s, dir, "events")
        .withColumn("panel", PanelBins.panel(col("ts"), "quarter"))
        .groupBy("panel", "event_type")
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value"))
        .orderBy("panel", "event_type"),
      Some("""SELECT CAST(year(ts) AS VARCHAR) || ' Q' ||
               CAST(CAST(ceil(month(ts) / 3.0) AS INT) AS VARCHAR) AS panel,
               event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value
             FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // F4: terminal-digit extraction at the cents place (DigitPref.sas:141)
    QuerySpec("q16_digit_extract",
      (s, dir) => read(s, dir, "lineitem")
        .withColumn("digit",
          floor(col("l_extendedprice") / 0.01 -
            lit(10.0) * floor(col("l_extendedprice") / 0.1)).cast("int"))
        .groupBy("l_returnflag", "digit")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "digit"),
      Some("""SELECT l_returnflag,
               CAST(floor(l_extendedprice / 0.01 - 10 * floor(l_extendedprice / 0.1)) AS INT) AS digit,
               count(*) AS cnt
             FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")),

    // M8: chi-square GOF statistic vs uniform digits (DigitPref.sas:349-355)
    QuerySpec("q17_gof_chisq",
      (s, dir) => read(s, dir, "lineitem")
        .withColumn("digit",
          floor(col("l_extendedprice") / 0.01 -
            lit(10.0) * floor(col("l_extendedprice") / 0.1)).cast("int"))
        .groupBy("l_returnflag", "digit").agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(sum("cnt").as("n"),
          round(sum(col("cnt") * col("cnt")) * 10.0 / sum("cnt") - sum("cnt"), 6)
            .as("gof_stat"))
        .orderBy("l_returnflag"),
      Some("""WITH d AS (SELECT l_returnflag,
                 CAST(floor(l_extendedprice / 0.01 - 10 * floor(l_extendedprice / 0.1)) AS INT) AS digit,
                 count(*) AS cnt
               FROM lineitem GROUP BY 1, 2)
             SELECT l_returnflag, CAST(sum(cnt) AS BIGINT) AS n,
               round(sum(cnt * cnt) * 10.0 / sum(cnt) - sum(cnt), 6) AS gof_stat
             FROM d GROUP BY 1 ORDER BY 1""")),

    // M7: chi-square homogeneity statistic, one-vs-rest per source
    // (Categorical_Check.sas:289-307 fused form)
    QuerySpec("q18_chisq_homog",
      (s, dir) => {
        val counts = read(s, dir, "documents")
          .groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
        val wSrc = Window.partitionBy("source")
        val wLang = Window.partitionBy("lang")
        // grand total via crossJoin(broadcast(agg)) rather than an
        // unpartitioned window: same value, no single-partition WindowExec
        val tot = counts.agg(sum("cnt").as("n_all"))
        counts
          .withColumn("n_src", sum("cnt").over(wSrc))
          .withColumn("n_lang", sum("cnt").over(wLang))
          .crossJoin(broadcast(tot))
          .withColumn("o1", col("cnt").cast("double"))
          .withColumn("o2", (col("n_lang") - col("cnt")).cast("double"))
          .withColumn("e1", col("n_src") * col("n_lang") / col("n_all"))
          .withColumn("e2", (col("n_all") - col("n_src")) * col("n_lang") / col("n_all"))
          .withColumn("term",
            when(col("e1") > 0, pow(col("o1") - col("e1"), 2) / col("e1")).otherwise(0.0) +
            when(col("e2") > 0, pow(col("o2") - col("e2"), 2) / col("e2")).otherwise(0.0))
          .groupBy("source")
          .agg(round(sum("term"), 6).as("chisq"),
            (countDistinct("lang") - 1).as("df"),
            max("n_src").cast("long").as("n"))
          .orderBy("source")
      },
      Some("""WITH c AS (SELECT source, lang, count(*) AS cnt FROM documents GROUP BY 1, 2),
               m AS (SELECT source, lang, cnt,
                 sum(cnt) OVER (PARTITION BY source) AS n_src,
                 sum(cnt) OVER (PARTITION BY lang) AS n_lang,
                 sum(cnt) OVER () AS n_all FROM c)
             SELECT source,
               round(sum(
                 CASE WHEN n_src * n_lang > 0 THEN
                   pow(cnt - n_src * n_lang / n_all, 2) / (n_src * n_lang / n_all)
                 ELSE 0 END +
                 CASE WHEN (n_all - n_src) * n_lang > 0 THEN
                   pow((n_lang - cnt) - (n_all - n_src) * n_lang / n_all, 2)
                     / ((n_all - n_src) * n_lang / n_all)
                 ELSE 0 END), 6) AS chisq,
               CAST(count(DISTINCT lang) - 1 AS BIGINT) AS df,
               CAST(max(n_src) AS BIGINT) AS n
             FROM m GROUP BY 1 ORDER BY 1""")),

    // M10: Holm step-down adjustment as window arithmetic (multtest
    // stepdownbonferroni, Categorical_Check.sas:435-466); applied to a
    // deterministic pseudo-p (1/(1+chisq)) to exercise the operator
    QuerySpec("q19_holm",
      (s, dir) => {
        val counts = read(s, dir, "documents")
          .groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
        val wLang = Window.partitionBy("lang")
        val stat = counts
          .withColumn("n_lang", sum("cnt").over(wLang))
          .groupBy("source")
          .agg(sum(pow(col("cnt"), 2) / col("n_lang")).as("s"))
          .withColumn("pseudo_p", round(lit(1.0) / (lit(1.0) + col("s")), 12))
        // Holm on a reduced frame without unpartitioned windows: ranks and
        // the prefix max both become broadcast inequality self-joins (the
        // frame is one row per source). key_j <= key_i on (pseudo_p, source)
        // replaces the global ORDER BY; m rides in via crossJoin(broadcast).
        val m = stat.agg(count(lit(1)).as("m"))
        val rhs = stat.select(col("source").as("src_j"), col("pseudo_p").as("p_j"))
        val before = col("p_j") < col("pseudo_p") ||
          (col("p_j") === col("pseudo_p") && col("src_j") <= col("source"))
        val ranked = stat.join(broadcast(rhs), before)
          .groupBy("source", "pseudo_p").agg(count(lit(1)).as("i"))
          .crossJoin(broadcast(m))
        val adjRhs = ranked.select(col("source").as("src_j"), col("pseudo_p").as("p_j"),
          least(lit(1.0), col("p_j") * (col("m") - col("i") + 1)).as("adj_j"))
        ranked.join(broadcast(adjRhs), before)
          .groupBy("source", "pseudo_p")
          .agg(round(max("adj_j"), 12).as("p_holm"))
          .select(col("source"), round(col("pseudo_p"), 12).as("pseudo_p"), col("p_holm"))
          .orderBy("source")
      },
      Some("""WITH c AS (SELECT source, lang, count(*) AS cnt,
                 sum(count(*)) OVER (PARTITION BY lang) AS n_lang
               FROM documents GROUP BY 1, 2),
             s AS (SELECT source, round(1.0 / (1.0 + sum(cnt * cnt / n_lang)), 12) AS pseudo_p
               FROM c GROUP BY 1),
             r AS (SELECT source, pseudo_p,
                 count(*) OVER () AS m,
                 row_number() OVER (ORDER BY pseudo_p, source) AS i
               FROM s)
             SELECT source, round(pseudo_p, 12) AS pseudo_p,
               round(max(least(1.0, pseudo_p * (m - i + 1)))
                 OVER (ORDER BY pseudo_p, source
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 12) AS p_holm
             FROM r ORDER BY source""")),

    // O2/limit: global top-k
    QuerySpec("q20_topk",
      (s, dir) => read(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // A12: rollup (both grains in one pass — the fusion the reference
    // computes as two separate aggs, Categorical_Check.sas:154-164)
    QuerySpec("q21_rollup",
      (s, dir) => read(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("_ALL_")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("_ALL_")).as("l_linestatus"),
          col("cnt"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT COALESCE(l_returnflag, '_ALL_') AS l_returnflag,
               COALESCE(l_linestatus, '_ALL_') AS l_linestatus, count(*) AS cnt
             FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             ORDER BY 1, 2""")),

    // A8/W4: first/last per group via ordered windows
    // (groupComparisons.sas:504-515 two-row collapse)
    QuerySpec("q22_first_last",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        read(s, dir, "orders")
          .withColumn("rn_a", row_number().over(w))
          .withColumn("rn_d", row_number().over(
            Window.partitionBy("o_custkey")
              .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
          .filter(col("rn_a") === 1 || col("rn_d") === 1)
          .groupBy("o_custkey")
          .agg(min(when(col("rn_a") === 1, col("o_orderkey"))).as("first_order"),
            min(when(col("rn_d") === 1, col("o_orderkey"))).as("last_order"))
          .orderBy("o_custkey")
      },
      Some("""WITH r AS (SELECT o_custkey, o_orderkey,
                 row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn_a,
                 row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_d
               FROM orders)
             SELECT o_custkey,
               min(CASE WHEN rn_a = 1 THEN o_orderkey END) AS first_order,
               min(CASE WHEN rn_d = 1 THEN o_orderkey END) AS last_order
             FROM r WHERE rn_a = 1 OR rn_d = 1
             GROUP BY 1 ORDER BY 1""")),

    // M1: OLS per group — slope/intercept from sufficient stats + count of
    // |rstudent| >= 2 (closed-form studentized deleted residuals,
    // univariatePlot.sas:309-324 semantics on a simple design)
    QuerySpec("q23_ols_rstudent",
      (s, dir) => {
        // OlsPass-shaped plan (SURVEY M1): partial-aggregated sufficient
        // stats per group (one shuffle of 6 doubles per group), broadcast
        // back for the row-level residual pass — no Window.partitionBy(g)
        // funneling each group through one partition.
        val li = read(s, dir, "lineitem")
          .select(col("l_returnflag").as("g"),
            col("l_quantity").as("x"), col("l_extendedprice").as("y"))
        val suff = li.groupBy("g").agg(
          count(lit(1)).as("n"),
          avg("x").as("xbar"), avg("y").as("ybar"),
          sum(pow(col("x"), 2)).as("sx2"),
          sum(col("x") * col("y")).as("sxy0"),
          sum(pow(col("y"), 2)).as("sy2"))
          .withColumn("sxx", col("sx2") - col("n") * pow(col("xbar"), 2))
          .withColumn("sxy", col("sxy0") - col("n") * col("xbar") * col("ybar"))
          .withColumn("syy", col("sy2") - col("n") * pow(col("ybar"), 2))
          .withColumn("beta", col("sxy") / col("sxx"))
          .withColumn("sse", col("syy") - col("beta") * col("sxy"))
          .withColumn("dfe", col("n") - 2)
          .withColumn("s2", col("sse") / col("dfe"))
          .select("g", "n", "xbar", "ybar", "sxx", "beta", "dfe", "s2")
        val stats = li.join(broadcast(suff), "g")
          .withColumn("e", col("y") - col("ybar") - col("beta") * (col("x") - col("xbar")))
          .withColumn("h", lit(1.0) / col("n") + pow(col("x") - col("xbar"), 2) / col("sxx"))
          .withColumn("s2i", (col("dfe") * col("s2") - pow(col("e"), 2) / (lit(1.0) - col("h"))) / (col("dfe") - 1))
          .withColumn("rstudent", col("e") / sqrt(col("s2i") * (lit(1.0) - col("h"))))
        stats.groupBy("g")
          .agg(round(first("beta"), 6).as("beta"),
            first("n").as("n"),
            sum(when(abs(col("rstudent")) >= 2.5, 1L).otherwise(0L)).as("n_outliers"))
          .orderBy("g")
      },
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
             u AS (SELECT g, n, sxy / sxx AS beta,
                 y - ybar - (sxy / sxx) * (x - xbar) AS e,
                 1.0 / n + (x - xbar) * (x - xbar) / sxx AS h,
                 (syy - (sxy / sxx) * sxy) / (n - 2) AS s2,
                 n - 2 AS dfe FROM t),
             v AS (SELECT g, n, beta, e, h, dfe,
                 (dfe * s2 - e * e / (1.0 - h)) / (dfe - 1) AS s2i FROM u)
             SELECT g, round(beta, 6) AS beta, CAST(n AS BIGINT) AS n,
               CAST(sum(CASE WHEN abs(e / sqrt(s2i * (1.0 - h))) >= 2.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             FROM v GROUP BY g, beta, n ORDER BY g""")),

    // M6: Brown-Forsythe statistic — one-way F on |x − group median|
    // (groupComparisons.sas:461-470); exact medians
    QuerySpec("q24_brown_forsythe",
      (s, dir) => {
        val li = read(s, dir, "lineitem")
          .select(col("l_returnflag").as("g"), col("l_quantity").as("x"))
        val med = li.groupBy("g").agg(expr("median(x)").as("med"))
        val z = li.join(broadcast(med), "g")
          .withColumn("z", abs(col("x") - col("med")))
        val sideStats = z.groupBy("g")
          .agg(count(lit(1)).as("n_g"), sum("z").as("sz"), sum(col("z") * col("z")).as("szz"))
        sideStats.groupBy()
          .agg(sum("n_g").as("n"), sum("sz").as("sz_all"),
            count(lit(1)).as("k"),
            sum(col("szz") - col("sz") * col("sz") / col("n_g")).as("ssw"),
            sum(col("n_g") * pow(col("sz") / col("n_g"), 2)).as("sgm2"))
          .withColumn("ssb", col("sgm2") - pow(col("sz_all"), 2) / col("n"))
          .withColumn("f_stat", round((col("ssb") / (col("k") - 1)) /
            (col("ssw") / (col("n") - col("k"))), 6))
          .select(col("f_stat"), (col("k") - 1).as("df1"), (col("n") - col("k")).as("df2"))
      },
      Some("""WITH med AS (SELECT l_returnflag AS g, median(l_quantity) AS med
                 FROM lineitem GROUP BY 1),
             z AS (SELECT l.l_returnflag AS g, abs(l.l_quantity - m.med) AS z
                 FROM lineitem l JOIN med m ON l.l_returnflag = m.g),
             gs AS (SELECT g, count(*) AS n_g, sum(z) AS sz, sum(z * z) AS szz
                 FROM z GROUP BY 1),
             t AS (SELECT sum(n_g) AS n, sum(sz) AS sz_all, count(*) AS k,
                 sum(szz - sz * sz / n_g) AS ssw,
                 sum(n_g * pow(sz / n_g, 2)) AS sgm2 FROM gs)
             SELECT round(((sgm2 - sz_all * sz_all / n) / (k - 1)) / (ssw / (n - k)), 6) AS f_stat,
               CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2
             FROM t""")),

    // M4: random-intercept variance components (MoM) from per-subject
    // sufficient stats (longitudinalPlot.sas:423-442 default config)
    QuerySpec("q25_varcomp",
      (s, dir) => {
        val ev = read(s, dir, "events")
          .select(col("user_id").as("id"), col("value").as("y"))
          .filter(col("y").isNotNull)
        val per = ev.groupBy("id")
          .agg(count(lit(1)).as("n_i"), sum("y").as("s"), sum(col("y") * col("y")).as("ss"))
        per.groupBy()
          .agg(sum("n_i").as("n"), count(lit(1)).as("k"),
            sum("s").as("gs"),
            sum(col("ss") - col("s") * col("s") / col("n_i")).as("ssw"),
            sum(col("n_i") * pow(col("s") / col("n_i"), 2)).as("sgm2"),
            sum(col("n_i") * col("n_i")).as("sn2"))
          .withColumn("ssb", col("sgm2") - pow(col("gs"), 2) / col("n"))
          .withColumn("msw", col("ssw") / (col("n") - col("k")))
          .withColumn("msb", col("ssb") / (col("k") - 1))
          .withColumn("n0", (col("n") - col("sn2") / col("n")) / (col("k") - 1))
          .select(
            round(col("msw"), 6).as("sigma_e2"),
            round(greatest((col("msb") - col("msw")) / col("n0"), lit(0.0)), 6).as("sigma_b2"),
            col("k").as("n_subjects"))
      },
      Some("""WITH per AS (SELECT user_id AS id, count(*) AS n_i, sum(value) AS s,
                 sum(value * value) AS ss
               FROM events WHERE value IS NOT NULL GROUP BY 1),
             t AS (SELECT sum(n_i) AS n, count(*) AS k, sum(s) AS gs,
                 sum(ss - s * s / n_i) AS ssw,
                 sum(n_i * pow(s / n_i, 2)) AS sgm2,
                 sum(n_i * n_i) AS sn2 FROM per)
             SELECT round(ssw / (n - k), 6) AS sigma_e2,
               round(greatest(((sgm2 - gs * gs / n) / (k - 1) - ssw / (n - k))
                 / ((n - sn2 / n) / (k - 1)), 0.0), 6) AS sigma_b2,
               CAST(k AS BIGINT) AS n_subjects
             FROM t""")),

    // Drift histogram + chi-square of each quarter vs rest over events.value
    // (north-rule drift shape, SQL-oracled end to end)
    QuerySpec("q26_drift_chisq",
      (s, dir) => {
        val ev = read(s, dir, "events").filter(col("value").isNotNull)
          .withColumn("panel", PanelBins.panel(col("ts"), "quarter"))
        // lazy broadcast edges (no blocking driver collect) — mirrors the
        // oracle's `FROM ev, mm` cross join and the Drift operator's plan
        val mm = ev.agg(min("value").as("__mn"), max("value").as("__mx"))
          .select(col("__mn"),
            when(col("__mx") > col("__mn"), (col("__mx") - col("__mn")) / 10)
              .otherwise(1.0).as("__w"))
        val binned = ev.crossJoin(broadcast(mm)).withColumn("bin",
          least(greatest(floor((col("value") - col("__mn")) / col("__w")), lit(0.0)), lit(9.0)).cast("int"))
          .groupBy("panel", "bin").agg(count(lit(1)).as("cnt"))
        val wBin = Window.partitionBy("bin")
        val wPanel = Window.partitionBy("panel")
        val grand = binned.agg(sum("cnt").as("grand"))
        binned
          .withColumn("bin_tot", sum("cnt").over(wBin))
          .withColumn("panel_tot", sum("cnt").over(wPanel))
          .crossJoin(broadcast(grand))
          .withColumn("e1", col("panel_tot") * col("bin_tot") / col("grand"))
          .withColumn("e2", (col("grand") - col("panel_tot")) * col("bin_tot") / col("grand"))
          .withColumn("term",
            when(col("e1") > 0, pow(col("cnt") - col("e1"), 2) / col("e1")).otherwise(0.0) +
            when(col("e2") > 0, pow(col("bin_tot") - col("cnt") - col("e2"), 2) / col("e2")).otherwise(0.0))
          .groupBy("panel")
          .agg(round(sum("term"), 6).as("chisq"), max("panel_tot").cast("long").as("n"))
          .orderBy("panel")
      },
      Some("""WITH ev AS (SELECT CAST(year(ts) AS VARCHAR) || ' Q' ||
                 CAST(CAST(ceil(month(ts) / 3.0) AS INT) AS VARCHAR) AS panel, value
               FROM events WHERE value IS NOT NULL),
             mm AS (SELECT min(value) AS mn, max(value) AS mx FROM ev),
             b AS (SELECT panel,
                 CAST(least(greatest(floor((value - mn) / ((mx - mn) / 10.0)), 0), 9) AS INT) AS bin,
                 count(*) AS cnt
               FROM ev, mm GROUP BY 1, 2),
             m AS (SELECT panel, bin, cnt,
                 sum(cnt) OVER (PARTITION BY bin) AS bin_tot,
                 sum(cnt) OVER (PARTITION BY panel) AS panel_tot,
                 sum(cnt) OVER () AS grand FROM b)
             SELECT panel,
               round(sum(
                 CASE WHEN panel_tot * bin_tot > 0 THEN
                   pow(cnt - panel_tot * bin_tot / grand, 2) / (panel_tot * bin_tot / grand)
                 ELSE 0 END +
                 CASE WHEN (grand - panel_tot) * bin_tot > 0 THEN
                   pow(bin_tot - cnt - (grand - panel_tot) * bin_tot / grand, 2)
                     / ((grand - panel_tot) * bin_tot / grand)
                 ELSE 0 END), 6) AS chisq,
               CAST(max(panel_tot) AS BIGINT) AS n
             FROM m GROUP BY 1 ORDER BY 1""")),

    // M9, driver-visible slice (round-3 verdict item 7): classic 2×2
    // Fisher exact test — per l_returnflag, the (linestatus = F) ×
    // (quantity > 25) table, two-sided p = sum of same-margin tables whose
    // point probability <= observed (× 1+1e-7 slack), exactly
    // Distributions.fisherExact2x2's rule (Categorical_Check.sas:298,305).
    // DuckDB expresses the same hypergeometric enumeration with lgamma +
    // a correlated generate_series — giving the Fisher path a DuckDB hash
    // row in addition to the python-oracle 2×C coverage (q47).
    QuerySpec("q60_fisher_2x2",
      (s, dir) => {
        val cells = read(s, dir, "lineitem").groupBy("l_returnflag").agg(
          sum(when(col("l_linestatus") === "F" && col("l_quantity") > 25, 1L)
            .otherwise(0L)).as("a"),
          sum(when(col("l_linestatus") === "F" && col("l_quantity") <= 25, 1L)
            .otherwise(0L)).as("b"),
          sum(when(col("l_linestatus") =!= "F" && col("l_quantity") > 25, 1L)
            .otherwise(0L)).as("c"),
          sum(when(col("l_linestatus") =!= "F" && col("l_quantity") <= 25, 1L)
            .otherwise(0L)).as("d"))
        val pUdf = udf((a: Long, b: Long, c: Long, d: Long) =>
          graft.stats.Distributions.fisherExact2x2(a, b, c, d))
        cells // reduced frame: one row per returnflag — UDF off the hot path
          .withColumn("fisher_p", round(pUdf(col("a"), col("b"), col("c"), col("d")), 6))
          .orderBy("l_returnflag")
      },
      Some("""WITH cells AS (
               SELECT l_returnflag,
                 CAST(sum(CASE WHEN l_linestatus = 'F' AND l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(sum(CASE WHEN l_linestatus = 'F' AND l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS b,
                 CAST(sum(CASE WHEN l_linestatus <> 'F' AND l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS c,
                 CAST(sum(CASE WHEN l_linestatus <> 'F' AND l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS d
               FROM lineitem GROUP BY 1),
             m AS (SELECT *, a + b AS r1, c + d AS r2, a + c AS c1, a + b + c + d AS n
               FROM cells),
             e AS (SELECT m.*, gs.k
               FROM m, generate_series(0, 1000000) gs(k)
               WHERE gs.k BETWEEN greatest(0, m.c1 - m.r2) AND least(m.r1, m.c1)),
             pr AS (SELECT *,
                 exp(lgamma(r1 + 1) - lgamma(k + 1) - lgamma(r1 - k + 1)
                   + lgamma(r2 + 1) - lgamma(c1 - k + 1) - lgamma(r2 - c1 + k + 1)
                   - lgamma(n + 1) + lgamma(c1 + 1) + lgamma(n - c1 + 1)) AS pk
               FROM e),
             obs AS (SELECT l_returnflag, pk AS p_obs FROM pr WHERE k = a)
             SELECT pr.l_returnflag, max(pr.a) AS a, max(pr.b) AS b,
               max(pr.c) AS c, max(pr.d) AS d,
               round(least(1.0, sum(CASE WHEN pr.pk <= o.p_obs * (1 + 1e-7)
                 THEN pr.pk ELSE 0 END)), 6) AS fisher_p
             FROM pr JOIN obs o ON pr.l_returnflag = o.l_returnflag
             GROUP BY 1 ORDER BY 1"""))
  )
}
