package graft.queries

import graft.{Dsl, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** Relational analytics core, part 1 (SURVEY.md §2 rows 1–13).
  *
  * Spark-first: declarative DataFrame plans; dimension sides of joins
  * are `broadcast()` when bounded (region/nation/supplier/part stay
  * dimension-sized at every SF); fact-fact joins shuffle on keys and
  * rely on AQE at scale. Every query obeys SURVEY.md §4 determinism.
  */
object RelationalCore {

  private def ts(s: String): Column = to_timestamp(lit(s))

  val q01 = QueryDef(
    "q01_pricing_summary",
    (sp, dir) => {
      Tables(sp, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          revSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          revTaxSum(col("l_extendedprice"), col("l_discount"), col("l_tax"))
            .as("sum_charge"),
          (moneySum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (moneySum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Selective filter + narrow projection — the scan must show
    * PushedFilters + a 4-column ReadSchema. */
  val q02 = QueryDef(
    "q02_filter_project",
    (sp, dir) => {
      Tables(sp, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01") &&
          col("l_discount") >= lit(0.05) && col("l_discount") <= lit(0.07) &&
          col("l_quantity") < lit(24.0))
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(200)
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0
      ORDER BY l_orderkey, l_linenumber
      LIMIT 200"""))

  /** TPC-H Q3 shape: shuffled fact-fact joins, decimal-exact revenue,
    * deterministic top-k. */
  val q03 = QueryDef(
    "q03_join_agg_topk",
    (sp, dir) => {
      val cust = Tables(sp, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables(sp, dir, "orders")
        .filter(col("o_orderdate") < ts("1997-01-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = Tables(sp, dir, "lineitem")
        .filter(col("l_shipdate") > ts("1997-01-01"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast(DateType).as("o_orderdate"))
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""
      SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10"""))

  /** Left-semi join (EXISTS): orders having any heavy line. */
  val q04 = QueryDef(
    "q04_semi_join",
    (sp, dir) => {
      val heavy = Tables(sp, dir, "lineitem")
        .filter(col("l_quantity") >= lit(48.0)).select("l_orderkey")
      Tables(sp, dir, "orders")
        .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 48.0)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** TPC-H Q5 shape: 6-table star join. Dimension chain
    * region→nation→supplier is broadcast; customer/orders/lineitem
    * shuffle on their keys. */
  val q05 = QueryDef(
    "q05_star_join",
    (sp, dir) => {
      val region = Tables(sp, dir, "region").filter(col("r_name") === "ASIA")
      val nation = Tables(sp, dir, "nation")
      val supplier = Tables(sp, dir, "supplier")
      val customer = Tables(sp, dir, "customer")
      val orders = Tables(sp, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1998-01-01"))
      val li = Tables(sp, dir, "lineitem")
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""
      SELECT n_name,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""))

  /** Conditional aggregation (TPC-H Q14 shape): promo revenue share. */
  val q06 = QueryDef(
    "q06_conditional_agg",
    (sp, dir) => {
      val part = Tables(sp, dir, "part").select("p_partkey", "p_type")
      val li = Tables(sp, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1996-07-01"))
      val promoPrice = when(col("p_type") === "PROMO", col("l_extendedprice"))
        .otherwise(lit(0.0))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(
          (lit(100.0) * revSum(promoPrice, col("l_discount")) /
            revSum(col("l_extendedprice"), col("l_discount")))
            .as("promo_revenue_pct"),
          revSum(promoPrice, col("l_discount")).as("promo_revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some("""
      SELECT
        100.0 * CAST(ROUND(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice ELSE 0.0 END AS DECIMAL(12,2))
                 * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
          / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS promo_revenue_pct,
        CAST(ROUND(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice ELSE 0.0 END AS DECIMAL(12,2))
                 * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS promo_revenue,
        COUNT(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'"""))

  /** Window ranking: top-5 customers by balance per market segment.
    * The segment column has cardinality 5, but the naive window stays
    * the right plan: Spark's InferWindowGroupLimit rewrites
    * `filter(rank <= k)` into a PARTIAL WindowGroupLimit below the
    * exchange (map-side per-partition top-k, like a combiner) plus a
    * FINAL one above it, so no task ever ranks more than k·partitions
    * rows per group. Asserted in PlanAuditSpec — a hand-rolled
    * two-phase operator would just duplicate the engine. */
  val q07 = QueryDef(
    "q07_window_rank",
    (sp, dir) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables(sp, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_name"),
          col("c_acctbal"), rank().over(w).as("rnk"))
        .filter(col("rnk") <= 5)
        .orderBy("c_mktsegment", "rnk", "c_custkey")
    },
    Some("""
      SELECT * FROM (
        SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
          RANK() OVER (PARTITION BY c_mktsegment
                       ORDER BY c_acctbal DESC, c_custkey) AS rnk
        FROM customer) t
      WHERE rnk <= 5
      ORDER BY c_mktsegment, rnk, c_custkey"""))

  /** Running totals + 3-row moving average per customer order stream. */
  val q08 = QueryDef(
    "q08_window_running",
    (sp, dir) => {
      val ord = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = ord.rowsBetween(-2, Window.currentRow)
      Tables(sp, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast(DateType).as("o_orderdate"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(run)
            .cast(DoubleType).as("running_total"),
          (sum(col("o_totalprice").cast(DecimalType(18, 2))).over(mov)
            .cast(DoubleType) / count(lit(1)).over(mov)).as("moving_avg3"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_run AS DOUBLE) AS running_total,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_mov AS DOUBLE)
          / COUNT(*) OVER w_mov AS moving_avg3
      FROM orders WHERE o_custkey < 100
      WINDOW
        w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_mov AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  /** Distinct aggregation per event type. */
  val q09 = QueryDef(
    "q09_distinct_agg",
    (sp, dir) => {
      Tables(sp, dir, "events")
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          moneySum(col("value")).as("sum_value"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** ROLLUP hierarchical totals over order priority × status. */
  val q10 = QueryDef(
    "q10_rollup",
    (sp, dir) => {
      Tables(sp, dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("sum_price"),
          grouping(col("o_orderpriority")).as("g_priority"),
          grouping(col("o_orderstatus")).as("g_status"))
        .orderBy(col("g_priority"), col("g_status"),
          col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)
    },
    Some("""
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_priority,
        CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status
      FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      ORDER BY g_priority, g_status,
        o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST"""))

  /** GROUPING SETS over customer segment × nation. */
  val q11 = QueryDef(
    "q11_grouping_sets",
    (sp, dir) => {
      val joined = Tables(sp, dir, "customer")
        .join(broadcast(Tables(sp, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
      joined
        .groupingSets(
          Seq(Seq(col("c_mktsegment")), Seq(col("n_name")), Seq()),
          col("c_mktsegment"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          moneySum(col("c_acctbal")).as("sum_bal"),
          grouping(col("c_mktsegment")).as("g_seg"),
          grouping(col("n_name")).as("g_nat"))
        .orderBy(col("g_seg"), col("g_nat"),
          col("c_mktsegment").asc_nulls_first, col("n_name").asc_nulls_first)
    },
    Some("""
      SELECT c_mktsegment, n_name, COUNT(*) AS n_cust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        CAST(GROUPING(c_mktsegment) AS TINYINT) AS g_seg,
        CAST(GROUPING(n_name) AS TINYINT) AS g_nat
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
      ORDER BY g_seg, g_nat, c_mktsegment ASC NULLS FIRST, n_name ASC NULLS FIRST"""))

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  val q12 = QueryDef(
    "q12_anti_join",
    (sp, dir) => {
      val ordKeys = Tables(sp, dir, "orders").select("o_custkey")
      Tables(sp, dir, "customer")
        .join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_no_order"),
          moneySum(col("c_acctbal")).as("sum_bal"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_no_order,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Left outer join + aggregation over the null-extended side. */
  val q13 = QueryDef(
    "q13_outer_join_agg",
    (sp, dir) => {
      val ord = Tables(sp, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
      Tables(sp, dir, "customer")
        .filter(col("c_custkey") <= 300)
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(moneySum(col("o_totalprice")), lit(0.0)).as("total_spend"))
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      WHERE c_custkey <= 300
      GROUP BY c_custkey ORDER BY c_custkey"""))

  val defs: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06, q07,
    q08, q09, q10, q11, q12, q13)
}
