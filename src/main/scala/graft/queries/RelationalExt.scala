package graft.queries

import graft.{Dsl, QueryDef, Tables}
import graft.operators.{AsOfJoin, Sessionize}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** Relational analytics core, part 2 (SURVEY.md §2 rows 14–26):
  * strings, dates, JSON, subqueries, set ops, pivot, time series and
  * the custom as-of / range join operators.
  */
object RelationalExt {

  private def ts(s: String): Column = to_timestamp(lit(s))

  /** String function pipeline. */
  val q14 = QueryDef(
    "q14_string_ops",
    (sp, dir) => {
      Tables(sp, dir, "part")
        .filter(col("p_name").like("%re%"))
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_uc"),
          substring(col("p_name"), 1, 5).as("name_head"),
          concat_ws("/", col("p_type"), col("p_brand")).as("type_brand"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("name_masked"),
          lpad(col("p_size").cast(StringType), 4, "0").as("size_padded"))
        .orderBy("p_partkey")
        .limit(300)
    },
    Some("""
      SELECT p_partkey, UPPER(p_brand) AS brand_uc,
        SUBSTR(p_name, 1, 5) AS name_head,
        CONCAT_WS('/', p_type, p_brand) AS type_brand,
        CAST(LENGTH(p_name) AS INT) AS name_len,
        REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS name_masked,
        LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
      FROM part WHERE p_name LIKE '%re%'
      ORDER BY p_partkey LIMIT 300"""))

  /** Calendar aggregation: month truncation + year/quarter extracts. */
  val q15 = QueryDef(
    "q15_date_agg",
    (sp, dir) => {
      Tables(sp, dir, "orders")
        .groupBy(
          date_trunc("month", col("o_orderdate")).cast(DateType).as("month"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"))
        .agg(count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("month")
    },
    Some("""
      SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
        CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
        CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS qtr,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY 1, 2, 3 ORDER BY month"""))

  /** JSON field extraction from the events.props payload. */
  val q16 = QueryDef(
    "q16_json_extract",
    (sp, dir) => {
      Tables(sp, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"),
          count(col("k")).as("n_with_k"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Scalar subquery: customers above the global average balance.
    * Expressed as a genuine SQL scalar subquery so Spark executes the
    * one-row aggregate as a separate subquery stage and substitutes
    * the result into a plain Filter — no join node at all (a non-equi
    * join against the 1-row aggregate would plan as a nested loop). */
  val q17 = QueryDef(
    "q17_scalar_subquery",
    (sp, dir) => {
      val view = s"q17_customer_${math.abs(dir.hashCode)}"
      Tables(sp, dir, "customer").createOrReplaceTempView(view)
      sp.sql(s"""
        SELECT c_custkey, c_name, c_acctbal
        FROM $view
        WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM $view)
        ORDER BY c_custkey""")
    },
    Some("""
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                         FROM customer)
      ORDER BY c_custkey"""))

  /** Post-aggregation HAVING filter. */
  val q18 = QueryDef(
    "q18_having",
    (sp, dir) => {
      Tables(sp, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(moneySum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_lines"))
        .filter(col("sum_qty") > 700.0)
        .orderBy("l_partkey")
    },
    Some("""
      SELECT l_partkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_partkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 700.0
      ORDER BY l_partkey"""))

  /** UNION ALL / INTERSECT / EXCEPT over nation keys. */
  val q19 = QueryDef(
    "q19_set_ops",
    (sp, dir) => {
      val custNations = Tables(sp, dir, "customer")
        .select(col("c_nationkey").as("nationkey")).distinct()
      val suppNations = Tables(sp, dir, "supplier")
        .select(col("s_nationkey").as("nationkey")).distinct()
      val both = custNations.intersect(suppNations)
        .withColumn("src", lit("both"))
      val custOnly = custNations.except(suppNations)
        .withColumn("src", lit("customer_only"))
      val allTagged = custNations.withColumn("src", lit("customer"))
        .unionAll(suppNations.withColumn("src", lit("supplier")))
      both.unionAll(custOnly).unionAll(allTagged)
        .select("src", "nationkey")
        .orderBy("src", "nationkey")
    },
    Some("""
      WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
           sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
      SELECT src, nationkey FROM (
        SELECT 'both' AS src, nationkey FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
        UNION ALL
        SELECT 'customer_only', nationkey FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
        UNION ALL SELECT 'customer', nationkey FROM cn
        UNION ALL SELECT 'supplier', nationkey FROM sn)
      ORDER BY src, nationkey"""))

  /** Pivot events wide: one column per event type. */
  val q20 = QueryDef(
    "q20_pivot",
    (sp, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val base = Tables(sp, dir, "events")
        .withColumn("user_bucket", col("user_id") % 10)
      val pivoted = base.groupBy("user_bucket")
        .pivot("event_type", types)
        .agg(sum(col("value").cast(DecimalType(18, 2))))
      types.foldLeft(pivoted) { (df, t) =>
        df.withColumn(t, col(t).cast(DoubleType))
      }.orderBy("user_bucket")
    },
    Some("""
      SELECT user_id % 10 AS user_bucket,
        CAST(SUM(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
        CAST(SUM(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
        CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
        CAST(SUM(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
        CAST(SUM(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
      FROM events GROUP BY 1 ORDER BY user_bucket"""))

  /** Top-n per group via row_number window. Safe on the 5-value
    * priority partition at any scale: InferWindowGroupLimit plans a
    * map-side partial top-n before the exchange (see q07's note;
    * plan-audited). */
  val q21 = QueryDef(
    "q21_topk_per_group",
    (sp, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(sp, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_orderpriority", "rn")
    },
    Some("""
      SELECT * FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_orderpriority, rn"""))

  /** Tumbling 1-hour event-time buckets (batch analogue of the
    * streaming windowed aggregation in graft.streaming). */
  val q22 = QueryDef(
    "q22_time_bucket",
    (sp, dir) => {
      Tables(sp, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          moneySum(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("bucket", "event_type")
    },
    Some("""
      SELECT DATE_TRUNC('hour', ts) AS bucket, event_type,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1, 2 ORDER BY bucket, event_type"""))

  /** Gap-based sessionization (30-minute inactivity gap). */
  val q23 = QueryDef(
    "q23_sessionize",
    (sp, dir) => {
      val sessions = Sessionize.withSessionId(
        Tables(sp, dir, "events"), "user_id", "ts",
        gapMs = 30L * 60 * 1000, tieBreakCol = "event_id")
      sessions.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          (unix_millis(max(col("ts"))) - unix_millis(min(col("ts"))))
            .as("duration_ms"),
          moneySum(col("value")).as("sum_value"))
        .orderBy("user_id", "session_id")
    },
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN LAG(epoch_ms(ts)) OVER w IS NULL
                 OR epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > 1800000
               THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      tagged AS (
        SELECT user_id, ts, value,
          CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_id
        FROM flagged)
      SELECT user_id, session_id, COUNT(*) AS n_events,
        MIN(ts) AS session_start,
        epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS duration_ms,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM tagged GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""))

  /** As-of join: each purchase gets its user's most recent prior
    * click (graft.operators.AsOfJoin — union + running window, one
    * shuffle, no range join). */
  val q24 = QueryDef(
    "q24_asof_join",
    (sp, dir) => {
      val ev = Tables(sp, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      AsOfJoin.leftAsOf(purchases, clicks, "user_id", "ts",
        Map("event_id" -> "click_event_id", "ts" -> "click_ts"))
        .select(col("event_id"), col("user_id"),
          col("click_event_id"),
          (unix_millis(col("ts")) - unix_millis(col("click_ts")))
            .as("ms_since_click"))
        .orderBy("event_id")
    },
    Some("""
      SELECT p.event_id, p.user_id, c.event_id AS click_event_id,
        epoch_ms(p.ts) - epoch_ms(c.ts) AS ms_since_click
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id"""))

  /** Range/band join: events bucketed into irregular value bands via
    * the bucket-accelerated range join (equi-join on a quantized value
    * bucket + exact re-verify) — a hash join, not a nested loop, so
    * per-row cost is O(1) regardless of band count or fact size. */
  val q25 = QueryDef(
    "q25_range_join",
    (sp, dir) => {
      import sp.implicits._
      val bands = Seq(
        ("p1_micro", 0.0, 5.0), ("p2_small", 5.0, 25.0),
        ("p3_mid", 25.0, 100.0), ("p4_large", 100.0, 250.0),
        ("p5_huge", 250.0, 1000.0)).toDF("band", "lo", "hi")
      graft.operators.RangeJoin.banded(
          Tables(sp, dir, "events"), bands, "value", "lo", "hi",
          bucketWidth = 5.0)
        .groupBy("band")
        .agg(count(lit(1)).as("n_events"),
          moneySum(col("value")).as("sum_value"))
        .orderBy("band")
    },
    Some("""
      SELECT band, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      JOIN (VALUES ('p1_micro', 0.0, 5.0), ('p2_small', 5.0, 25.0),
                   ('p3_mid', 25.0, 100.0), ('p4_large', 100.0, 250.0),
                   ('p5_huge', 250.0, 1000.0)) AS b(band, lo, hi)
        ON value >= lo AND value < hi
      GROUP BY band ORDER BY band"""))

  /** Exact interpolated percentiles per event type. */
  val q26 = QueryDef(
    "q26_percentiles",
    (sp, dir) => {
      Tables(sp, dir, "events")
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.25)"), 4).as("p25"),
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.75)"), 4).as("p75"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type,
        ROUND(quantile_cont(value, 0.25), 4) AS p25,
        ROUND(quantile_cont(value, 0.5), 4) AS p50,
        ROUND(quantile_cont(value, 0.75), 4) AS p75,
        MIN(value) AS min_value, MAX(value) AS max_value
      FROM events GROUP BY event_type ORDER BY event_type"""))

  val defs: Seq[QueryDef] = Seq(q14, q15, q16, q17, q18, q19, q20,
    q21, q22, q23, q24, q25, q26)
}
