package graft.queries

import graft.{Dsl, QueryDef, Tables}
import org.apache.spark.sql.functions._
import Dsl._

/** Relational analytics core, part 3 (SURVEY.md §2 rows 42–45):
  * correlated subqueries, regex extraction, array aggregation, approx
  * distinct.
  */
object RelationalMore {

  /** Correlated max-per-group subquery (TPC-H Q2 shape): customers at
    * their nation's maximum balance. Spark plan: broadcast the
    * per-group max aggregate back onto the fact — no correlation
    * re-execution per row. */
  val q27 = QueryDef(
    "q27_min_per_group",
    (sp, dir) => {
      val cust = Tables(sp, dir, "customer")
      val maxes = cust.groupBy(col("c_nationkey").as("mk"))
        .agg(max(col("c_acctbal")).as("max_bal"))
      cust.join(broadcast(maxes),
        col("c_nationkey") === col("mk") && col("c_acctbal") === col("max_bal"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .orderBy("c_nationkey", "c_custkey")
    },
    Some("""
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer c
      WHERE c_acctbal = (SELECT MAX(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c_nationkey, c_custkey"""))

  /** Regex capture-group extraction over part names. */
  val q28 = QueryDef(
    "q28_regexp_extract",
    (sp, dir) => {
      Tables(sp, dir, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "^([a-z]+) ([a-z]+)$", 1).as("color"),
          regexp_extract(col("p_name"), "^([a-z]+) ([a-z]+)$", 2).as("shape"))
        .groupBy("color")
        .agg(count(lit(1)).as("n_parts"),
          countDistinct(col("shape")).as("n_shapes"))
        .orderBy("color")
    },
    Some("""
      SELECT regexp_extract(p_name, '^([a-z]+) ([a-z]+)$', 1) AS color,
        COUNT(*) AS n_parts,
        COUNT(DISTINCT regexp_extract(p_name, '^([a-z]+) ([a-z]+)$', 2)) AS n_shapes
      FROM part GROUP BY 1 ORDER BY color"""))

  /** Array aggregation: deterministic sorted distinct lists, surfaced
    * as joined strings (engine-portable array rendering). */
  val q29 = QueryDef(
    "q29_array_agg",
    (sp, dir) => {
      Tables(sp, dir, "nation")
        .join(Tables(sp, dir, "customer"),
          col("n_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(
          array_join(sort_array(collect_set(col("c_mktsegment"))), ",")
            .as("segments"),
          count(lit(1)).as("n_cust"))
        .orderBy("n_name")
    },
    Some("""
      SELECT n_name,
        array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
        COUNT(*) AS n_cust
      FROM nation JOIN customer ON n_nationkey = c_nationkey
      GROUP BY n_name ORDER BY n_name"""))

  /** HyperLogLog approximate distinct (rows-only: sketch estimates
    * are engine-specific; accuracy asserted in RelationalMoreSpec). */
  val q30 = QueryDef(
    "q30_approx_distinct",
    (sp, dir) => {
      Tables(sp, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")
    },
    None)

  /** Navigation windows: lead/lag deltas and ntile quartiles over each
    * customer's order history. */
  val q31 = QueryDef(
    "q31_lead_lag_ntile",
    (sp, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types._
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(sp, dir, "orders")
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast(DateType).as("o_orderdate"),
          datediff(col("o_orderdate"),
            lag(col("o_orderdate"), 1).over(w)).as("days_since_prev"),
          lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
          ntile(4).over(w).as("quartile"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        CAST(date_diff('day', LAG(o_orderdate, 1) OVER w, o_orderdate) AS INT) AS days_since_prev,
        LEAD(o_orderkey, 1) OVER w AS next_orderkey,
        CAST(NTILE(4) OVER w AS INT) AS quartile
      FROM orders WHERE o_custkey < 200
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  /** Two-level aggregation: per-customer order totals, then the
    * distribution of those totals per market segment. */
  val q32 = QueryDef(
    "q32_nested_agg",
    (sp, dir) => {
      val perCust = Tables(sp, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(moneySum(col("o_totalprice")).as("cust_total"),
          count(lit(1)).as("cust_orders"))
      Tables(sp, dir, "customer")
        .join(perCust, col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          (moneySum(col("cust_total")) / count(lit(1))).as("avg_cust_total"),
          max(col("cust_orders")).as("max_orders"))
        .orderBy("c_mktsegment")
    },
    Some("""
      WITH per_cust AS (
        SELECT o_custkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS cust_total,
          COUNT(*) AS cust_orders
        FROM orders GROUP BY o_custkey)
      SELECT c_mktsegment, COUNT(*) AS n_customers,
        CAST(SUM(CAST(cust_total AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_cust_total,
        CAST(MAX(cust_orders) AS BIGINT) AS max_orders
      FROM customer JOIN per_cust ON c_custkey = o_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** As-of join with tolerance (pandas merge_asof semantics): the
    * most recent prior click counts only if within 1 hour. */
  val q33 = QueryDef(
    "q33_asof_tolerance",
    (sp, dir) => {
      import graft.operators.AsOfJoin
      val ev = Tables(sp, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val tolMs = 3600L * 1000
      AsOfJoin.leftAsOf(purchases, clicks, "user_id", "ts",
        Map("event_id" -> "click_event_id", "ts" -> "click_ts"))
        .withColumn("ms_since",
          unix_millis(col("ts")) - unix_millis(col("click_ts")))
        .select(col("event_id"), col("user_id"),
          when(col("ms_since") <= tolMs, col("click_event_id"))
            .as("click_event_id"),
          when(col("ms_since") <= tolMs, col("ms_since")).as("ms_since_click"))
        .orderBy("event_id")
    },
    Some("""
      SELECT p.event_id, p.user_id,
        CASE WHEN epoch_ms(p.ts) - epoch_ms(c.ts) <= 3600000
             THEN c.event_id END AS click_event_id,
        CASE WHEN epoch_ms(p.ts) - epoch_ms(c.ts) <= 3600000
             THEN epoch_ms(p.ts) - epoch_ms(c.ts) END AS ms_since_click
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id"""))

  /** Null-aware NOT IN subquery — plans as Spark's null-aware anti
    * join, a distinct operator from NOT EXISTS (q12). Expressed in
    * SQL (the DataFrame API has no NOT IN form). */
  val q34 = QueryDef(
    "q34_not_in_subquery",
    (sp, dir) => {
      Tables(sp, dir, "customer").createOrReplaceTempView("customer")
      Tables(sp, dir, "orders").createOrReplaceTempView("orders")
      sp.sql("""
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_totalprice > 100000.0)
        ORDER BY c_custkey""")
    },
    Some("""
      SELECT c_custkey, c_mktsegment
      FROM customer
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                              WHERE o_totalprice > 100000.0)
      ORDER BY c_custkey"""))

  val defs: Seq[QueryDef] = Seq(q27, q28, q29, q30, q31, q32, q33, q34)
}
