package graft.queries

import graft.queries.QuerySpec.read
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining SURVEY.md §2 inventory items: scalar-broadcast cross join,
  * whole-frame window stats, exact count-distinct, weighted frequencies,
  * SD-rank ordering, conditional flag / null-out columns, p-binning,
  * formatted label rendering.
  */
object MiscQueries {

  val all: Seq[QuerySpec] = Seq(

    // J1 + A4: 1-row aggregate cross-joined onto every row (the reference's
    // residuals × DF-table merge, univariatePlot.sas:330-337,380-388)
    QuerySpec("q39_cross_join_scalar",
      (s, dir) => {
        val li = read(s, dir, "lineitem")
        val stats = li.agg(
          min("l_quantity").as("qty_min"), max("l_quantity").as("qty_max"),
          count(lit(1)).as("n_all"))
        li.filter(col("l_orderkey") < 50)
          .crossJoin(broadcast(stats))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("qty_min"), col("qty_max"),
            (col("qty_max") - col("qty_min")).as("qty_range"), col("n_all"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, qty_min, qty_max,
               qty_max - qty_min AS qty_range, n_all
             FROM lineitem
             CROSS JOIN (SELECT min(l_quantity) AS qty_min, max(l_quantity) AS qty_max,
               count(*) AS n_all FROM lineitem) s
             WHERE l_orderkey < 50 ORDER BY 1, 2""")),

    // A2/A3: exact count-distinct per group + composite-key distinct
    // (Categorical_Check.sas:143-146, 577-581)
    QuerySpec("q40_count_distinct",
      (s, dir) => read(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
          countDistinct(concat_ws("~", col("l_suppkey"), col("l_linestatus")))
            .as("n_supp_status"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT CAST(l_suppkey AS VARCHAR) || '~' || l_linestatus) AS n_supp_status
             FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // A11: weighted frequency table (weight statement, Categorical_Check
    // .sas:300-307) — sum a weight column instead of counting rows
    QuerySpec("q41_weighted_freq",
      (s, dir) => read(s, dir, "events")
        .groupBy("event_type")
        .agg(round(sum("value"), 6).as("wsum"), count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type, round(sum(value), 6) AS wsum, count(*) AS n
             FROM events GROUP BY 1 ORDER BY 1""")),

    // O7: groups ordered by their standard deviation (groupComparisons
    // .sas:327-339 SD-rank numbering)
    QuerySpec("q42_sd_rank",
      (s, dir) => {
        val g = read(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(round(stddev_samp("l_extendedprice"), 6).as("sd"))
        // global rank on a reduced frame as a broadcast inequality
        // self-join (count of keys ≤ mine; keys are unique per group) —
        // no unpartitioned WindowExec. stddev_samp is null for a 1-row
        // group; coalesce to -inf so the comparison matches the oracle's
        // rank() NULLS FIRST ordering instead of dropping the group
        val sdKey = (c: Column) => coalesce(c, lit(Double.NegativeInfinity))
        val rhs = g.select(col("l_returnflag").as("rf_j"), col("sd").as("sd_j"))
        g.join(broadcast(rhs), sdKey(col("sd_j")) < sdKey(col("sd")) ||
            (sdKey(col("sd_j")) === sdKey(col("sd")) && col("rf_j") <= col("l_returnflag")))
          .groupBy("l_returnflag", "sd")
          .agg(count(lit(1)).cast("int").as("sd_rank"))
          .orderBy("sd_rank")
      },
      Some("""WITH g AS (SELECT l_returnflag, round(stddev_samp(l_extendedprice), 6) AS sd
               FROM lineitem GROUP BY 1)
             SELECT l_returnflag, sd,
               rank() OVER (ORDER BY sd, l_returnflag) AS sd_rank
             FROM g ORDER BY sd_rank""")),

    // P5/P6/P7 + M13/M15: threshold filter, conditional flag, null-out on
    // flag, and p-value→bucket binning (rangeattrmap,
    // Categorical_Check.sas:1084-1094) as one shaped listing
    QuerySpec("q43_flag_columns",
      (s, dir) => read(s, dir, "lineitem")
        .filter(col("l_orderkey") < 200)
        .withColumn("flag",
          when(col("l_quantity") >= 45, lit("OUTLIER")).otherwise(lit(null).cast("string")))
        .withColumn("qty_plot",
          when(col("flag").isNotNull, lit(null).cast("double")).otherwise(col("l_quantity")))
        .withColumn("disc_bucket",
          when(col("l_discount") < 0.02, "low")
            .when(col("l_discount") < 0.06, "mid")
            .otherwise("high"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "flag", "qty_plot", "disc_bucket")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
               CASE WHEN l_quantity >= 45 THEN 'OUTLIER' END AS flag,
               CASE WHEN l_quantity >= 45 THEN NULL ELSE l_quantity END AS qty_plot,
               CASE WHEN l_discount < 0.02 THEN 'low'
                    WHEN l_discount < 0.06 THEN 'mid' ELSE 'high' END AS disc_bucket
             FROM lineitem WHERE l_orderkey < 200 ORDER BY 1, 2""")),

    // F3/F9/F11/F14: label plumbing — concatenated, trimmed, rounded
    // rendering (univariatePlot.sas:370-371, BivariatePlot.sas:493-506)
    QuerySpec("q44_label_render",
      (s, dir) => read(s, dir, "orders")
        .filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"),
          concat_ws(" | ",
            concat(lit("cust="), col("o_custkey").cast("string")),
            concat(lit("price="), round(col("o_totalprice"), 2).cast("string")),
            upper(trim(col("o_orderpriority")))).as("label"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
               'cust=' || CAST(o_custkey AS VARCHAR) ||
               ' | price=' || CAST(round(o_totalprice, 2) AS VARCHAR) ||
               ' | ' || upper(trim(o_orderpriority)) AS label
             FROM orders WHERE o_orderkey < 100 ORDER BY 1""")),

    // O8 + P4: top-1 scalar lifted to the driver, re-applied as a literal
    // filter (select max(...) into :mv; univariatePlot.sas:390-393)
    QuerySpec("q45_driver_scalar",
      (s, dir) => {
        val li = read(s, dir, "lineitem")
        val maxQty = li.agg(max("l_quantity")).collect()(0).getDouble(0)
        li.filter(col("l_quantity") === maxQty)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_at_max"), lit(maxQty).as("max_qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n_at_max,
               (SELECT max(l_quantity) FROM lineitem) AS max_qty
             FROM lineitem
             WHERE l_quantity = (SELECT max(l_quantity) FROM lineitem)
             GROUP BY 1 ORDER BY 1""")),

    // M12: one-way frequency percent of a sentinel level
    // (DigitPref.sas:358-363)
    QuerySpec("q46_oneway_pct",
      (s, dir) => {
        val ev = read(s, dir, "events")
        val counts = ev.groupBy("event_type").agg(count(lit(1)).as("cnt"))
        val tot = counts.agg(sum("cnt").as("__tot"))
        counts.crossJoin(broadcast(tot))
          .withColumn("pct", round(col("cnt") * 100.0 / col("__tot"), 6))
          .drop("__tot")
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS cnt,
               round(count(*) * 100.0 / sum(count(*)) OVER (), 6) AS pct
             FROM events GROUP BY 1 ORDER BY 1""")),

    // §2.10 streaming surface, batch-parity leg: streamingDedup's batch
    // branch keeps the EARLIEST-ts row per normalized-text fingerprint —
    // the same keep-first-arrival policy the watermarked streaming path
    // applies (StreamingSpec asserts streaming ≡ batch on the fp set;
    // this query pins the kept-ROW policy against an SQL oracle)
    QuerySpec("q62_streaming_dedup",
      (s, dir) => graft.streaming.StreamingChecks.streamingDedup(
          read(s, dir, "events"), "ts", "event_type")
        .select(col("event_id"), col("ts"), col("event_type"), col("fp"))
        .orderBy("fp"),
      Some("""WITH e AS (
          SELECT event_id, ts, event_type,
                 md5(regexp_replace(lower(trim(event_type)), ' +', ' ')) AS fp
          FROM events
        ),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY fp ORDER BY ts) AS rn
          FROM e
        )
        SELECT event_id, ts, event_type, fp
        FROM r WHERE rn = 1 ORDER BY fp"""))
  )
}
