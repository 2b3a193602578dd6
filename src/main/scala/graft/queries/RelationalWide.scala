package graft.queries

import graft.{Dsl, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational coverage extensions (q35–q44): explicit-formula moment
  * statistics, unpivot, full outer join, RANGE-frame time windows,
  * rank distributions, ordered string aggregation, lateral explode
  * with ordinality, histograms, navigation frames, and argmax dedup.
  *
  * Determinism: every floating-point result is either (a) derived
  * from exact decimal sums with the identical double formula on both
  * engines, or (b) a single double division of exact integers
  * (SURVEY.md §4).
  */
object RelationalWide {

  /** Moment statistics from exact decimal power sums — stddev and
    * correlation via the textbook formulas, NOT the engines' native
    * stddev/corr (their internal accumulation orders differ). */
  val q35 = QueryDef(
    "q35_stats_moments",
    (sp, dir) => {
      val li = Tables(sp, dir, "lineitem")
      val q = col("l_quantity").cast(DecimalType(12, 2))
      val p = col("l_extendedprice").cast(DecimalType(12, 2))
      // The three power sums FLOOR to integer decimals before the
      // double cast. Two engine quirks force this: DuckDB's
      // fractional int128-decimal -> double conversion double-rounds
      // (1-ulp drift observed at sf0.001), and DuckDB's decimal
      // downscale cast truncates while Spark's rounds half-up —
      // floor() is the one rescaling both engines agree on, and an
      // integer below 2^53 then converts to double exactly. sq/sp
      // stay exact (scaled units < 2^53 at any realistic SF).
      val agg = li.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(q).cast(DoubleType).as("sq"),
        floor(sum(q * q)).cast(DoubleType).as("sq2"),
        sum(p).cast(DoubleType).as("sp"),
        floor(sum(p * p)).cast(DoubleType).as("sp2"),
        floor(sum(q * p)).cast(DoubleType).as("sqp"))
      // try_divide: a single-row group (n-1 = 0) or zero-variance
      // group must yield NULL like the oracle engine's x/0, not an
      // ANSI divide-by-zero error
      val n = col("n").cast(DoubleType)
      agg.select(col("l_returnflag"), col("n"),
          (col("sq") / n).as("mean_qty"),
          sqrt(try_divide(col("sq2") * n - col("sq") * col("sq"),
            n * (n - lit(1.0)))).as("sd_qty"),
          try_divide(col("sqp") * n - col("sq") * col("sp"),
            sqrt(col("sq2") * n - col("sq") * col("sq")) *
              sqrt(col("sp2") * n - col("sp") * col("sp"))).as("corr_qty_price"))
        .orderBy("l_returnflag")
    },
    Some("""
      WITH a AS (
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sq,
          CAST(floor(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)))) AS DOUBLE) AS sq2,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sp,
          CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)))) AS DOUBLE) AS sp2,
          CAST(floor(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)))) AS DOUBLE) AS sqp
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        sq / CAST(n AS DOUBLE) AS mean_qty,
        sqrt((sq2 * CAST(n AS DOUBLE) - sq * sq)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS sd_qty,
        (sqp * CAST(n AS DOUBLE) - sq * sp)
          / (sqrt(sq2 * CAST(n AS DOUBLE) - sq * sq)
             * sqrt(sp2 * CAST(n AS DOUBLE) - sp * sp)) AS corr_qty_price
      FROM a ORDER BY l_returnflag"""))

  /** Wide→long unpivot of per-part measures (Dataset.unpivot). */
  val q36 = QueryDef(
    "q36_unpivot",
    (sp, dir) => {
      Tables(sp, dir, "part").filter(col("p_partkey") < 100)
        .select(col("p_partkey"),
          col("p_size").cast(DoubleType).as("size"),
          col("p_retailprice").cast(DoubleType).as("retail"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retail")),
          "metric", "value")
        .orderBy("p_partkey", "metric")
    },
    Some("""
      SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
      FROM part WHERE p_partkey < 100
      UNION ALL
      SELECT p_partkey, 'retail', CAST(p_retailprice AS DOUBLE)
      FROM part WHERE p_partkey < 100
      ORDER BY p_partkey, metric"""))

  /** Full outer join: per-nation customer and supplier counts, nations
    * appearing on either side. */
  val q37 = QueryDef(
    "q37_full_outer_join",
    (sp, dir) => {
      val cust = Tables(sp, dir, "customer")
        .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
      val supp = Tables(sp, dir, "supplier")
        .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
      cust.withColumnRenamed("nk", "c_nk")
        .join(supp.withColumnRenamed("nk", "s_nk"),
          col("c_nk") === col("s_nk"), "full_outer")
        .select(coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    },
    Some("""
      WITH c AS (SELECT c_nationkey nk, CAST(COUNT(*) AS BIGINT) n_cust
                 FROM customer GROUP BY 1),
           s AS (SELECT s_nationkey nk, CAST(COUNT(*) AS BIGINT) n_supp
                 FROM supplier GROUP BY 1)
      SELECT COALESCE(c.nk, s.nk) AS nationkey,
        COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
      FROM c FULL JOIN s ON c.nk = s.nk
      ORDER BY nationkey"""))

  /** Time-RANGE window frame: per-user trailing-hour spend at every
    * event, framed on integer epoch millis so both engines share the
    * same peer semantics. */
  val q38 = QueryDef(
    "q38_range_frame",
    (sp, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(unix_millis(col("ts")))
        .rangeBetween(-3600000L, 0L)
      Tables(sp, dir, "events")
        .withColumn("hour_sum",
          sum(col("value").cast(DecimalType(18, 2))).over(w).cast(DoubleType))
        .select("event_id", "user_id", "hour_sum")
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, user_id,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
          PARTITION BY user_id ORDER BY epoch_ms(ts)
          RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS hour_sum
      FROM events ORDER BY event_id"""))

  /** Rank-distribution windows: percent_rank and cume_dist are single
    * double divisions of exact integers — engine-identical. */
  val q39 = QueryDef(
    "q39_rank_distribution",
    (sp, dir) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      Tables(sp, dir, "lineitem").filter(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity").cast(DoubleType).as("qty"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_returnflag,
        CAST(l_quantity AS DOUBLE) AS qty,
        percent_rank() OVER (PARTITION BY l_returnflag
          ORDER BY l_quantity, l_orderkey, l_linenumber) AS pr,
        cume_dist() OVER (PARTITION BY l_returnflag
          ORDER BY l_quantity, l_orderkey, l_linenumber) AS cd
      FROM lineitem WHERE l_orderkey < 200
      ORDER BY l_orderkey, l_linenumber"""))

  /** Ordered string aggregation: rich customers per nation, names
    * concatenated in (acctbal, name) order — collect + sort + join,
    * the shuffle-safe form of an ordered LISTAGG. */
  val q40 = QueryDef(
    "q40_string_agg",
    (sp, dir) => {
      Tables(sp, dir, "customer").filter(col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"),
          concat_ws(",", transform(
            sort_array(collect_list(struct(
              col("c_acctbal").cast(DecimalType(12, 2)).as("b"),
              col("c_name").as("nm")))),
            s => s.getField("nm"))).as("names"))
        .orderBy("c_nationkey")
    },
    Some("""
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
        string_agg(c_name, ',' ORDER BY CAST(c_acctbal AS DECIMAL(12,2)), c_name)
          AS names
      FROM customer WHERE c_acctbal > 9000
      GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** Lateral explode with ordinality: part-name tokens with their
    * positions (posexplode ≡ UNNEST WITH ORDINALITY). */
  val q41 = QueryDef(
    "q41_posexplode",
    (sp, dir) => {
      Tables(sp, dir, "part").filter(col("p_partkey") < 50)
        .select(col("p_partkey"),
          posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
        .orderBy("p_partkey", "pos")
    },
    Some("""
      SELECT * FROM (
        SELECT p_partkey,
          unnest(list_transform(string_split(p_name, ' '),
            (w, i) -> {'pos': i - 1, 'word': w}), recursive := true)
        FROM part WHERE p_partkey < 50)
      ORDER BY p_partkey, pos"""))

  /** Fixed-width histogram of order totals: bucket by explicit floor
    * division (identical double op), exact decimal min/max/sum. */
  val q42 = QueryDef(
    "q42_histogram",
    (sp, dir) => {
      Tables(sp, dir, "orders")
        .withColumn("bucket",
          least(floor(col("o_totalprice") / lit(60000.0)), lit(9L)).cast("int"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice").cast(DecimalType(12, 2))).cast(DoubleType)
            .as("lo"),
          max(col("o_totalprice").cast(DecimalType(12, 2))).cast(DoubleType)
            .as("hi"),
          Dsl.moneySum(col("o_totalprice")).as("total"))
        .orderBy("bucket")
    },
    Some("""
      SELECT CAST(LEAST(floor(o_totalprice / 60000.0), 9) AS INT) AS bucket,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS lo,
        CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS hi,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1 ORDER BY bucket"""))

  /** Navigation frames: first/last/2nd event per user over the full
    * partition frame, reduced to one row per user. */
  val q43 = QueryDef(
    "q43_first_last_value",
    (sp, dir) => {
      val order = Seq(col("ts"), col("event_id"))
      val wFull = Window.partitionBy("user_id").orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wRow = Window.partitionBy("user_id").orderBy(order: _*)
      Tables(sp, dir, "events")
        .select(col("user_id"),
          first(col("event_id")).over(wFull).as("first_event"),
          last(col("event_id")).over(wFull).as("last_event"),
          nth_value(col("event_id"), 2).over(wFull).as("second_event"),
          row_number().over(wRow).as("rn"))
        .filter(col("rn") === 1).drop("rn")
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, first_event, last_event, second_event FROM (
        SELECT user_id,
          first_value(event_id) OVER w AS first_event,
          last_value(event_id) OVER w AS last_event,
          nth_value(event_id, 2) OVER w AS second_event,
          row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      WHERE rn = 1 ORDER BY user_id"""))

  /** Argmax dedup: latest event per (user, type) — the keep-newest ETL
    * staple, as a row_number window + filter. */
  val q44 = QueryDef(
    "q44_latest_per_key",
    (sp, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables(sp, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_millis(col("ts")).as("ts_ms"))
        .orderBy("user_id", "event_type")
    },
    Some("""
      SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
          ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1 ORDER BY user_id, event_type"""))

  /** Skew-resistant salted join: events (large, potentially one hot
    * user) joined to the customer dim through `nSalts` sub-keys —
    * result-identical to the plain join, so the oracle IS the plain
    * join. */
  val q45 = QueryDef(
    "q45_salted_join",
    (sp, dir) => {
      import graft.operators.SaltedJoin
      val events = Tables(sp, dir, "events")
        .select("event_id", "user_id", "value")
      val cust = Tables(sp, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      SaltedJoin.inner(events, cust, "user_id", "c_custkey",
        col("event_id"), nSalts = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"),
          Dsl.moneySum(col("value")).as("sum_value"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Column profiling (the ETL data-quality staple): per-column row /
    * null / distinct counts and lexicographic min/max, computed in ONE
    * pass (multi-distinct plans as a single expand) and unpivoted to
    * a row per column. Values surface as strings — doubles via an
    * exact decimal cast so both engines render identically. */
  val q46 = QueryDef(
    "q46_column_profile",
    (sp, dir) => {
      val strCols: Seq[(String, org.apache.spark.sql.Column)] = Seq(
        "o_custkey" -> col("o_custkey").cast("string"),
        "o_orderpriority" -> col("o_orderpriority"),
        "o_orderstatus" -> col("o_orderstatus"),
        "o_totalprice" -> col("o_totalprice").cast(DecimalType(12, 2)).cast("string"))
      // ONE scan of orders: explode each row into (col_name, value)
      // pairs, then a two-level aggregate — per-(col,value) counts with
      // map-side partials, then per-col profile. Four per-column
      // branches would scan the file four times; a multi-distinct
      // single agg would plan as a ×5 expand without the partial
      // aggregation the explode shape keeps.
      val orders = Tables(sp, dir, "orders")
      orders.select(explode(array(strCols.map { case (name, c) =>
          struct(lit(name).as("col_name"), c.as("v")) }: _*)).as("s"))
        .select(col("s.col_name"), col("s.v"))
        .groupBy("col_name", "v").agg(count(lit(1)).as("cnt"))
        .groupBy("col_name")
        .agg(sum(col("cnt")).as("n"),
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("n_null"),
          count(col("v")).as("n_distinct"),
          min(col("v")).as("min_s"), max(col("v")).as("max_s"))
        .orderBy("col_name")
    },
    Some("""
      SELECT 'o_custkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_null,
        CAST(COUNT(DISTINCT CAST(o_custkey AS VARCHAR)) AS BIGINT) AS n_distinct,
        MIN(CAST(o_custkey AS VARCHAR)) AS min_s,
        MAX(CAST(o_custkey AS VARCHAR)) AS max_s
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
        CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
        CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
        MIN(o_orderpriority), MAX(o_orderpriority)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
        CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
        CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
        MIN(o_orderstatus), MAX(o_orderstatus)
      FROM orders
      UNION ALL
      SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
        CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
        CAST(COUNT(DISTINCT CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)) AS BIGINT),
        MIN(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)),
        MAX(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR))
      FROM orders
      ORDER BY col_name"""))

  /** Month spine + densified counts: every month from the first to
    * the last order month appears, zero-filled where no qualifying
    * order exists — the gap-filling shape a plain groupBy cannot
    * produce. The spine is `sequence()` over a one-row min/max
    * aggregate, NOT a recursive CTE: Spark re-evaluates a correlated
    * scalar subquery (a full orders scan) on every recursion step,
    * which measured 80 scans / 15 s at sf0.1 vs one scan here. */
  val q47 = QueryDef(
    "q47_month_spine",
    (sp, dir) => {
      val orders = Tables(sp, dir, "orders")
      val spine = orders.agg(
          date_trunc("month", min(col("o_orderdate"))).as("lo"),
          date_trunc("month", max(col("o_orderdate"))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL '1' MONTH"))).as("mon"))
      val big = orders.filter(col("o_totalprice") > 450000.0)
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("cnt"))
      spine.join(big, col("mon") === col("m"), "left_outer")
        .select(col("mon"), coalesce(col("cnt"), lit(0L)).as("n_big"))
        .orderBy("mon")
    },
    Some("""
      WITH b AS (
        SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
               date_trunc('month', MAX(o_orderdate)) AS hi
        FROM orders),
      months AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS mon FROM b),
      big AS (
        SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS cnt
        FROM orders WHERE o_totalprice > 450000.0 GROUP BY 1)
      SELECT mon, CAST(COALESCE(cnt, 0) AS BIGINT) AS n_big
      FROM months LEFT JOIN big ON mon = big.m
      ORDER BY mon"""))

  /** Fuzzy matching by edit distance, bucketed on the first name
    * token so candidate pairs stay bucket-bounded (no all-pairs scan)
    * — the string analogue of the LSH dedup shape. Levenshtein is
    * integer unit-cost DP in both engines. */
  val q48 = QueryDef(
    "q48_fuzzy_match",
    (sp, dir) => {
      val p = Tables(sp, dir, "part").filter(col("p_partkey") < 500)
        .select(col("p_partkey"), col("p_name"),
          split(col("p_name"), " ").getItem(0).as("b"))
      p.as("a").join(p.as("c"),
          col("a.b") === col("c.b") && col("a.p_partkey") < col("c.p_partkey"))
        .select(col("a.p_partkey").as("k1"), col("c.p_partkey").as("k2"),
          levenshtein(col("a.p_name"), col("c.p_name")).as("dist"))
        .filter(col("dist") <= 4)
        .orderBy("k1", "k2")
    },
    Some("""
      WITH p AS (
        SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS b
        FROM part WHERE p_partkey < 500)
      SELECT a.p_partkey AS k1, c.p_partkey AS k2,
        CAST(levenshtein(a.p_name, c.p_name) AS INT) AS dist
      FROM p a JOIN p c ON a.b = c.b AND a.p_partkey < c.p_partkey
      WHERE levenshtein(a.p_name, c.p_name) <= 4
      ORDER BY k1, k2"""))

  /** Bitwise aggregation: per-user event-type presence mask via
    * BIT_OR — the compact "which behaviors has this user shown"
    * rollup. */
  val q49 = QueryDef(
    "q49_bitwise_agg",
    (sp, dir) => {
      val flag = when(col("event_type") === "click", 1L)
        .when(col("event_type") === "view", 2L)
        .when(col("event_type") === "purchase", 4L)
        .when(col("event_type") === "signup", 8L)
        .otherwise(16L)
      Tables(sp, dir, "events")
        .select(col("user_id"), flag.as("flag"))
        .groupBy("user_id")
        .agg(expr("bit_or(flag)").as("type_mask"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id,
        CAST(bit_or(CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
          WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8 ELSE 16 END) AS BIGINT)
          AS type_mask,
        CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Correlated LATERAL subquery: each customer's two largest orders
    * — per-row subquery semantics, a different operator from the
    * window top-n (q21). Spark plans it as a lateral join. */
  val q50 = QueryDef(
    "q50_lateral_topn",
    (sp, dir) => {
      Tables(sp, dir, "customer").createOrReplaceTempView("customer_q50")
      Tables(sp, dir, "orders").createOrReplaceTempView("orders_q50")
      sp.sql("""
        SELECT c_custkey, o_orderkey,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
        FROM customer_q50,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders_q50 WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
        WHERE c_acctbal > 9000
        ORDER BY c_custkey, o_orderkey""")
    },
    Some("""
      SELECT c_custkey, o_orderkey,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
      FROM customer,
      LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders WHERE o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c_acctbal > 9000
      ORDER BY c_custkey, o_orderkey"""))

  /** Exact per-group mode (most frequent value, smallest-value
    * tie-break): two-level aggregate + one rank window — the portable
    * mode() shape (engines disagree on native mode()'s tie rules, so
    * both sides spell the tie-break out). */
  val q51 = QueryDef(
    "q51_mode_per_group",
    (sp, dir) => {
      val counts = Tables(sp, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderstatus")
        .orderBy(col("n").desc, col("o_orderpriority"))
      counts.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
          col("n").as("mode_count"))
        .orderBy("o_orderstatus")
    },
    Some("""
      WITH c AS (
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY 1, 2),
      r AS (
        SELECT o_orderstatus, o_orderpriority, n,
          ROW_NUMBER() OVER (PARTITION BY o_orderstatus
            ORDER BY n DESC, o_orderpriority) AS rn
        FROM c)
      SELECT o_orderstatus, o_orderpriority AS mode_priority,
        CAST(n AS BIGINT) AS mode_count
      FROM r WHERE rn = 1 ORDER BY o_orderstatus"""))

  /** A fully oracle-checked cardinality sketch: HyperLogLog with 64
    * registers built from engine-portable arithmetic only. Unlike q30
    * (Spark's native HLL — rows-only, sketch internals opaque), every
    * step here is deterministic across engines: LCG id hash → bucket =
    * low 6 bits, rho = 1-based position of the remaining bits' lowest
    * set bit (`length(bin(w & -w))` — both engines print minimal
    * binary), register = max rho. The harmonic sum accumulates as an
    * exact BIGINT (`1 << (26 - rho)`, i.e. fixed-point scaled by 2^26)
    * so summation order is irrelevant, and the α·m²-scaled estimate is
    * a single double division at the end. One shuffle (64 groups) +
    * one exact-distinct pass for the reported error. */
  val q52 = QueryDef(
    "q52_hll_sketch",
    (sp, dir) => {
      // The LCG hash is injective on [0, 2^31-1) and (bucket, w) ↔ h,
      // so Σ_buckets COUNT(DISTINCT w) IS the exact distinct-user
      // count — the reference figure rides in the SAME single-shuffle
      // aggregation instead of a second scan + 1×1 join (which
      // Catalyst constant-folds into a nested-loop join).
      val regs = Tables(sp, dir, "events")
        .select(pmod(pmod(col("user_id"), lit(2147483647L)) * lit(1103515245L) + lit(12345L),
          lit(2147483647L)).as("h"))
        .select(expr("CAST(h % 64 AS INT)").as("bucket"),
          expr("h DIV 64").as("w"))
        .select(col("bucket"), col("w"),
          // bin() prints minimal binary (no padding) in BOTH engines,
          // so length(bin(lowest-set-bit)) IS the 1-based bit position
          when(col("w") === 0, lit(26))
            .otherwise(length(expr("bin(w & -w)"))).as("rho"))
        .groupBy("bucket").agg(max(col("rho")).as("maxrho"),
          countDistinct(col("w")).as("nd"))
      val spine = sp.range(0, 64).select(col("id").cast("int").as("bucket"))
      spine.join(regs, Seq("bucket"), "left_outer")
        .select(coalesce(col("maxrho"), lit(0)).as("maxrho"),
          coalesce(col("nd"), lit(0L)).as("nd"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(when(col("maxrho") === 0, 1L).otherwise(0L)).as("zero_buckets"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), 26 - maxrho)")).as("sum_scaled"),
          sum(col("nd")).as("exact_distinct"))
        .withColumn("est_distinct",
          lit(0.709) * lit(4096) * lit(67108864)
            / col("sum_scaled").cast("double"))
        .withColumn("rel_err",
          col("est_distinct") / col("exact_distinct") - 1)
        .select("n_buckets", "zero_buckets", "sum_scaled", "est_distinct",
          "exact_distinct", "rel_err")
    },
    Some("""
      WITH h AS (SELECT ((user_id % 2147483647) * 1103515245 + 12345) % 2147483647 AS h
                 FROM events),
      b AS (SELECT CAST(h % 64 AS INT) AS bucket, h // 64 AS w FROM h),
      r AS (SELECT bucket, w,
              CASE WHEN w = 0 THEN 26
                   ELSE length(bin(w & -w)) END AS rho
            FROM b),
      m AS (SELECT bucket, MAX(rho) AS maxrho, COUNT(DISTINCT w) AS nd
            FROM r GROUP BY bucket),
      spine AS (SELECT unnest(generate_series(0, 63)) AS bucket),
      reg AS (SELECT COALESCE(m.maxrho, 0) AS maxrho, COALESCE(m.nd, 0) AS nd
              FROM spine s LEFT JOIN m ON s.bucket = m.bucket),
      agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
                CAST(SUM(CASE WHEN maxrho = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS zero_buckets,
                CAST(SUM(1::BIGINT << (26 - maxrho)) AS BIGINT) AS sum_scaled,
                CAST(SUM(nd) AS BIGINT) AS exact_distinct
              FROM reg)
      SELECT n_buckets, zero_buckets, sum_scaled,
        CAST(0.709 AS DOUBLE) * 4096 * 67108864 / CAST(sum_scaled AS DOUBLE)
          AS est_distinct,
        exact_distinct,
        (CAST(0.709 AS DOUBLE) * 4096 * 67108864 / CAST(sum_scaled AS DOUBLE))
          / exact_distinct - 1 AS rel_err
      FROM agg"""))

  /** q24's as-of semantics through the NATIVE physical operator
    * ([[graft.plans.AsOfJoinExec]]; logical node + strategy injected
    * by GraftExtensions): purchase → latest same-user click at or
    * before it, ties to max click event_id. The oracle spells the
    * tie rule out with an explicit ROW_NUMBER instead of DuckDB's
    * ASOF (whose tie choice is unspecified), so the hash match pins
    * the custom exec's full ordering contract. */
  val q53 = QueryDef(
    "q53_asof_native",
    (sp, dir) => {
      val ev = Tables(sp, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("click_event_id"), col("value").as("click_value"))
      graft.operators.AsOfJoin.nativeLeftAsOf(purchases, clicks,
          "user_id", "ts", "c_user", "c_ts", "click_event_id")
        .select(col("event_id"), col("user_id"), col("click_event_id"),
          (unix_millis(col("ts")) - unix_millis(col("c_ts")))
            .as("ms_since_click"),
          col("click_value"))
        .orderBy("event_id")
    },
    Some("""
      WITH p AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts, event_id, value FROM events
            WHERE event_type = 'click'),
      cand AS (SELECT p.event_id, c.event_id AS click_event_id,
          epoch_ms(p.ts) - epoch_ms(c.ts) AS ms_since_click,
          c.value AS click_value,
          ROW_NUMBER() OVER (PARTITION BY p.event_id
            ORDER BY c.ts DESC, c.event_id DESC) AS rn
        FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts)
      SELECT p.event_id, p.user_id, k.click_event_id, k.ms_since_click,
        k.click_value
      FROM p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) k
        ON p.event_id = k.event_id
      ORDER BY p.event_id"""))

  /** Per-user EWMA (α = 0.5) over the time-ordered event stream — the
    * order-dependent recursive aggregate engines usually disagree on.
    * Portable because BOTH sides run the identical sequential left
    * fold over the identically-ordered list (SURVEY §4: ordered folds
    * are bit-reproducible; 0.5 is exact in binary64). State per group
    * = that user's event list — bounded by per-user activity, the
    * documented collect_list caveat. */
  val q54 = QueryDef(
    "q54_ewma",
    (sp, dir) => {
      Tables(sp, dir, "events").filter(col("user_id") < 200)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          aggregate(
            transform(
              array_sort(collect_list(struct(col("ts"), col("event_id"),
                col("value")))),
              s => s.getField("value")),
            lit(0.0), (acc, x) => acc * lit(0.5) + x * lit(0.5)).as("ewma"))
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list(value ORDER BY ts, event_id)),
          (a, b) -> a * 0.5 + b * 0.5) AS ewma
      FROM events WHERE user_id < 200
      GROUP BY user_id ORDER BY user_id"""))

  /** CUBE over return flag × line status: all four grouping levels in
    * one pass (Spark plans a single Expand + hash aggregate — one
    * shuffle regardless of how many grouping sets, exactly what a
    * reporting layer wants at 100 TB instead of four separate scans).
    * GROUPING() columns disambiguate rolled-up NULLs from data NULLs.
    *
    * The CUBE runs over a per-(flag, status) PRE-AGGREGATE, not the
    * fact table: Expand multiplies its input by the number of grouping
    * sets BEFORE the shuffle, so cubing the raw table pushes 4× the
    * fact rows through exchange — pre-aggregating first shrinks that
    * to 4× ~6 rows. Counts re-aggregate as sums; decimal sums re-sum
    * exactly (associative), so results are identical (measured ~3×
    * faster at sf0.1). */
  val q55 = QueryDef(
    "q55_cube",
    (sp, dir) => {
      val pre = Tables(sp, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("__n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).as("__qty"),
          Dsl.revSumDec(col("l_extendedprice"), col("l_discount"))
            .as("__disc"))
      pre
        .cube("l_returnflag", "l_linestatus")
        .agg(sum(col("__n")).as("n_items"),
          sum(col("__qty")).cast(DoubleType).as("sum_qty"),
          // round to money grain before the double cast — the exact
          // scale-4 total crosses the 2^53 conversion cliff between
          // sf1 and sf30 (Dsl.revSum scaladoc)
          round(sum(col("__disc")), 2).cast(DoubleType).as("sum_disc_price"),
          grouping(col("l_returnflag")).as("g_flag"),
          grouping(col("l_linestatus")).as("g_status"))
        .orderBy(col("g_flag"), col("g_status"),
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },
    Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
          (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2)
          AS DOUBLE) AS sum_disc_price,
        CAST(GROUPING(l_returnflag) AS TINYINT) AS g_flag,
        CAST(GROUPING(l_linestatus) AS TINYINT) AS g_status
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY g_flag, g_status,
        l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** Bloom-prefiltered semi-join ([[graft.operators.BloomSemi]]): the
    * explicit runtime-filter idiom — a fixed-size bit set built from
    * the (selective) dim keys pre-filters the fact scan before the
    * join shuffle; a Bloom filter has no false negatives, so the
    * result — and therefore the oracle — is the plain EXISTS. */
  val q56 = QueryDef(
    "q56_bloom_semi",
    (sp, dir) => {
      val parts = Tables(sp, dir, "part").filter(col("p_size") <= 5)
      graft.operators.BloomSemi.semiJoin(
          Tables(sp, dir, "lineitem"), "l_partkey", parts, "p_partkey",
          mBits = 1 << 16)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("sum_qty"),
          Dsl.revSum(col("l_extendedprice"), col("l_discount"))
            .as("sum_disc_price"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag, COUNT(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
          (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2)
          AS DOUBLE) AS sum_disc_price
      FROM lineitem
      WHERE EXISTS (SELECT 1 FROM part
                    WHERE p_partkey = l_partkey AND p_size <= 5)
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val defs: Seq[QueryDef] =
    Seq(q35, q36, q37, q38, q39, q40, q41, q42, q43, q44, q45, q46, q47,
      q48, q49, q50, q51, q52, q53, q54, q55, q56)
}
