package graft.queries

import graft.queries.QuerySpec.read
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2.1-2.6, 2.8, 2.9) with DuckDB
  * oracles. Numeric hygiene for cross-engine hashing: money sums go through
  * cents-as-bigint (exact in both engines); float aggregates are rounded.
  */
object RelationalQueries {

  val all: Seq[QuerySpec] = Seq(

    // S1/A1/A5: scan + groupBy aggregate (TPC-H Q1 shape; the reference's
    // per-group proc means, groupComparisons.sas:317-324)
    QuerySpec("q01_agg_pricing",
      (s, dir) => read(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          count(lit(1)).as("cnt"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("price_cents"),
          round(avg("l_discount"), 6).as("avg_disc"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               count(*) AS cnt,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
               round(avg(l_discount), 6) AS avg_disc
             FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")),

    // S1/P1/P2/P3: projection + predicate pushdown to parquet
    QuerySpec("q02_scan_filter",
      (s, dir) => read(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01") && col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
               AND l_quantity > 45
             ORDER BY 1, 2""")),

    // J4 + broadcast dims: orders ⋈ customer ⋈ nation ⋈ region
    QuerySpec("q03_join_broadcast",
      (s, dir) => read(s, dir, "orders")
        .join(broadcast(read(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(read(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(read(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name, count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
             FROM orders
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY 1, 2 ORDER BY 1, 2""")),

    // J2 shuffle join fact-to-fact
    QuerySpec("q04_join_shuffle",
      (s, dir) => read(s, dir, "lineitem")
        .join(read(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_lines"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, sum(l_quantity) AS sum_qty,
               count(*) AS n_lines
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             GROUP BY 1 ORDER BY 1""")),

    // J5 left-semi (EXISTS; longitudinalPlot.sas:486-493 IN-subquery)
    QuerySpec("q05_semi_join",
      (s, dir) => read(s, dir, "orders")
        .join(read(s, dir, "lineitem").filter(col("l_quantity") >= 49)
          .select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n_orders FROM orders
             WHERE EXISTS (SELECT 1 FROM lineitem
               WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
             GROUP BY 1 ORDER BY 1""")),

    // J8 anti-join (north-rule referential check shape)
    QuerySpec("q06_anti_join",
      (s, dir) => read(s, dir, "customer")
        .join(read(s, dir, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_custs"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n_custs FROM customer
             WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             GROUP BY 1 ORDER BY 1""")),

    // W1/O6: rank per partition (top-2 orders per customer)
    QuerySpec("q07_window_rank",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        read(s, dir, "orders")
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 2)
          .select("o_custkey", "o_orderkey", "rnk")
          .orderBy("o_custkey", "rnk")
      },
      Some("""SELECT o_custkey, o_orderkey, rnk FROM (
               SELECT o_custkey, o_orderkey,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rnk
               FROM orders) t
             WHERE rnk <= 2 ORDER BY o_custkey, rnk""")),

    // W2: partition totals beside rows (J7 self-merge replacement)
    QuerySpec("q08_window_total",
      (s, dir) => {
        val w = Window.partitionBy("l_orderkey")
        read(s, dir, "lineitem")
          .withColumn("order_qty", sum("l_quantity").over(w))
          .filter(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("order_qty"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
               sum(l_quantity) OVER (PARTITION BY l_orderkey) AS order_qty
             FROM lineitem WHERE l_orderkey < 100
             ORDER BY 1, 2""")),

    // O3: dedup by key
    QuerySpec("q09_distinct",
      (s, dir) => read(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             ORDER BY 1, 2""")),

    // U1: union-all stack then aggregate (the reference's append loop)
    QuerySpec("q10_union_stack",
      (s, dir) => {
        val li = read(s, dir, "lineitem")
        val hi = li.filter(col("l_quantity") >= 25).withColumn("src", lit("hi"))
        val lo = li.filter(col("l_quantity") < 25).withColumn("src", lit("lo"))
        hi.unionByName(lo).groupBy("src", "l_returnflag")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("src", "l_returnflag")
      },
      Some("""SELECT src, l_returnflag, count(*) AS cnt FROM (
               SELECT 'hi' AS src, l_returnflag FROM lineitem WHERE l_quantity >= 25
               UNION ALL
               SELECT 'lo' AS src, l_returnflag FROM lineitem WHERE l_quantity < 25) t
             GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
