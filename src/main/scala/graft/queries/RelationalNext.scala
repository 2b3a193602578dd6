package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational coverage, continued (q57+): interval-sweep concurrency,
  * Count-Min heavy hitters, gaps-and-islands streaks.
  *
  * Determinism: all integer arithmetic (counts, epoch-microsecond
  * sweeps, sketch counters) or date arithmetic — nothing here touches
  * order-dependent floating-point accumulation.
  */
object RelationalNext {

  /** Peak concurrency via the classic interval sweep: each event opens
    * a session of `60 + floor(value)` seconds (clipped to its day, end
    * exclusive); +1/-1 boundary points, a running sum per
    * (event_type, day) partition, max prefix = peak concurrent
    * sessions. The sweep window partitions on type×day, so partition
    * width is bounded by a day's traffic per type — no global sort at
    * any scale; ties carry equal deltas, so the peak is
    * order-invariant within a tie group. Epoch-microsecond BIGINTs
    * sidestep engine interval-arithmetic differences. */
  val q57 = QueryDef(
    "q57_peak_concurrency",
    (sp, dir) => {
      val iv = Tables(sp, dir, "events")
        .select(col("event_type"),
          date_trunc("day", col("ts")).as("day"),
          unix_micros(col("ts")).as("t0"),
          floor(col("value")).cast("long").as("dur_s"))
        .withColumn("t1",
          least(col("t0") + (col("dur_s") + 60L) * 1000000L,
            unix_micros(col("day")) + lit(86400000000L)))
      graft.operators.IntervalSweep.peakConcurrency(iv,
          Seq("event_type", "day"), "t0", "t1")
        .orderBy("event_type", "day")
    },
    Some("""
      WITH iv AS (
        SELECT event_type, DATE_TRUNC('day', ts) AS day,
          epoch_us(ts) AS t0,
          least(epoch_us(ts) + (CAST(FLOOR(value) AS BIGINT) + 60) * 1000000,
                epoch_us(DATE_TRUNC('day', ts)) + 86400000000) AS t1
        FROM events),
      pts AS (
        SELECT event_type, day, t0 AS t, 1 AS delta FROM iv
        UNION ALL
        SELECT event_type, day, t1 AS t, -1 AS delta FROM iv),
      swept AS (
        SELECT event_type, day, delta,
          SUM(delta) OVER (PARTITION BY event_type, day
            ORDER BY t, delta ROWS UNBOUNDED PRECEDING) AS run
        FROM pts)
      SELECT event_type, day,
        CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_intervals,
        CAST(MAX(run) AS BIGINT) AS peak
      FROM swept GROUP BY event_type, day
      ORDER BY event_type, day"""))

  /** Count-Min heavy hitters ([[graft.operators.CountMin]]): top-20
    * part keys by sketch estimate, exact count and overcount alongside.
    * The oracle replays the identical integer hash rows and counters,
    * so the sketch's exact contents — not just its error bound — are
    * DuckDB-checked. */
  val q58 = QueryDef(
    "q58_heavy_hitters",
    (sp, dir) => {
      graft.operators.CountMin.heavyHitters(
          Tables(sp, dir, "lineitem").select(col("l_partkey")),
          "l_partkey", w = 1024, k = 20)
        .orderBy("rank")
    },
    Some {
      val hashRows = graft.operators.CountMin.rowParams.zipWithIndex
        .map { case ((a, b), i) =>
          s"SELECT $i AS row, (($a * (key % 2147483647) + $b) % 2147483647) % 1024 AS bucket, key FROM keys"
        }.mkString("\n        UNION ALL ")
      s"""
      WITH keys AS (
        SELECT l_partkey AS key, COUNT(*) AS exact_cnt
        FROM lineitem GROUP BY 1),
      routed AS (
        SELECT r.row, r.bucket, k.key, k.exact_cnt
        FROM ($hashRows) r JOIN keys k USING (key)),
      counters AS (
        SELECT row, bucket, SUM(exact_cnt) AS counter
        FROM routed GROUP BY row, bucket),
      est AS (
        SELECT r.key, r.exact_cnt, MIN(c.counter) AS cms_estimate
        FROM routed r JOIN counters c USING (row, bucket)
        GROUP BY r.key, r.exact_cnt),
      ranked AS (
        SELECT key, exact_cnt, cms_estimate,
          ROW_NUMBER() OVER (ORDER BY cms_estimate DESC, key) AS rank
        FROM est)
      SELECT key, CAST(exact_cnt AS BIGINT) AS exact_cnt,
        CAST(cms_estimate AS BIGINT) AS cms_estimate,
        CAST(cms_estimate - exact_cnt AS BIGINT) AS overcount,
        CAST(rank AS INT) AS rank
      FROM ranked WHERE rank <= 20 ORDER BY rank"""
    })

  /** Gaps-and-islands: longest consecutive-active-day streak per user.
    * The `day - row_number()` trick turns each run of consecutive days
    * into a constant group key — two window/agg passes, both
    * partitioned by user, no self-join; per-user longest streak breaks
    * ties toward the earliest start. */
  val q59 = QueryDef(
    "q59_activity_streaks",
    (sp, dir) => {
      val days = Tables(sp, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val byDay = Window.partitionBy("user_id").orderBy("day")
      val streaks = days
        .withColumn("grp", date_sub(col("day"), row_number().over(byDay)))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"), min(col("day")).as("start"))
      val best = Window.partitionBy("user_id")
        .orderBy(col("len").desc, col("start"))
      val perUser = Window.partitionBy("user_id")
      streaks
        .withColumn("rn", row_number().over(best))
        .withColumn("n_streaks", count(lit(1)).over(perUser))
        .withColumn("n_active_days", sum(col("len")).over(perUser))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("len").as("best_len"),
          col("start").as("best_start"), col("n_streaks"),
          col("n_active_days"))
        .orderBy("user_id")
    },
    Some("""
      WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      isl AS (
        SELECT user_id, day,
          day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
            AS INT) AS grp
        FROM days),
      streaks AS (
        SELECT user_id, grp, COUNT(*) AS len, MIN(day) AS start
        FROM isl GROUP BY user_id, grp),
      ranked AS (
        SELECT user_id, len, start,
          ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY len DESC, start) AS rn,
          COUNT(*) OVER (PARTITION BY user_id) AS n_streaks,
          SUM(len) OVER (PARTITION BY user_id) AS n_active_days
        FROM streaks)
      SELECT user_id, CAST(len AS BIGINT) AS best_len, start AS best_start,
        CAST(n_streaks AS BIGINT) AS n_streaks,
        CAST(n_active_days AS BIGINT) AS n_active_days
      FROM ranked WHERE rn = 1 ORDER BY user_id"""))

  /** Rolling distinct-user count: a sliding 100-row set cardinality
    * per event type (`size(collect_set(...))` over a ROWS frame —
    * Spark has no COUNT(DISTINCT) window, the set-size formulation is
    * the idiomatic equivalent and stays a bounded per-frame state).
    * The frame is bounded, so state per window slot is O(frame), and
    * the partition key keeps the sort distributed. */
  val q60 = QueryDef(
    "q60_rolling_distinct",
    (sp, dir) => {
      // event_type has cardinality 5: a window partitioned on it alone
      // sorts a fifth of all events per task, even though the frame
      // needs only 100 rows of context. RollingDistinct decomposes the
      // sliding COUNT DISTINCT into ±1 difference markers + running
      // sums (both chunk-distributed) — the previous halo-chunked
      // `size(collect_set)` rebuilt a 100-element set PER ROW (an
      // imperative aggregate over a sliding frame re-evaluates its
      // whole buffer each row). Same exact semantics, same oracle.
      graft.operators.RollingDistinct.withRollingCountDistinct(
          Tables(sp, dir, "events")
            .select(col("event_type"), col("event_id"), col("ts"),
              col("user_id")),
          Seq("event_type"), Seq(col("ts"), col("event_id")),
          valueCol = "user_id", framePreceding = 99,
          outCol = "rolling_users")
        .select("event_type", "event_id", "ts", "rolling_users")
        .orderBy("event_type", "ts", "event_id")
    },
    Some("""
      SELECT event_type, event_id, ts,
        CAST(COUNT(DISTINCT user_id) OVER (PARTITION BY event_type
          ORDER BY ts, event_id
          ROWS BETWEEN 99 PRECEDING AND CURRENT ROW) AS BIGINT)
          AS rolling_users
      FROM events ORDER BY event_type, ts, event_id"""))

  /** Ratio-to-report: each order's share of its customer's lifetime
    * spend — the windowed part-of-whole every BI layer ships. The
    * denominator accumulates in DECIMAL (exact, order-insensitive);
    * the share is then ONE double division, so both engines agree
    * bit-for-bit. */
  val q61 = QueryDef(
    "q61_ratio_to_report",
    (sp, dir) => {
      val w = Window.partitionBy("o_custkey")
      Tables(sp, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          (col("o_totalprice") /
            sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
              .over(w).cast("double")).as("share_of_customer"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
        o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          OVER (PARTITION BY o_custkey) AS DOUBLE) AS share_of_customer
      FROM orders ORDER BY o_custkey, o_orderkey"""))

  /** Forward fill (LOCF imputation): every third reading is knocked
    * out deterministically, then recovered as the last non-null value
    * in (ts, event_id) order per user — `last(ignoreNulls)` over a
    * running frame is Spark's LOCF idiom (DuckDB: LAST_VALUE IGNORE
    * NULLS). Leading nulls stay null; the fill never crosses users. */
  val q62 = QueryDef(
    "q62_forward_fill",
    (sp, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(sp, dir, "events")
        .filter(col("user_id") < 200)
        .withColumn("metric",
          when(col("event_id") % 3 === 0, lit(null)).otherwise(col("value")))
        .select(col("user_id"), col("event_id"), col("ts"), col("metric"),
          last(col("metric"), ignoreNulls = true).over(w).as("metric_filled"))
        .orderBy("user_id", "ts", "event_id")
    },
    Some("""
      WITH knocked AS (
        SELECT user_id, event_id, ts,
          CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS metric
        FROM events WHERE user_id < 200)
      SELECT user_id, event_id, ts, metric,
        LAST_VALUE(metric IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS metric_filled
      FROM knocked ORDER BY user_id, ts, event_id"""))

  /** Ordered conversion funnel: view → click within a day of the
    * first view → purchase within a day of that click, per user;
    * step order is enforced by the strict ts inequality and each step
    * has a bounded attribution window (otherwise every long-lived
    * user trivially converts). Three keyed aggregates + left joins on
    * user_id — each stage's frame shrinks, and everything shuffles on
    * the same key. Conversion time accumulates as exact
    * epoch-microsecond sums. */
  val q63 = QueryDef(
    "q63_event_funnel",
    (sp, dir) => {
      val ev = Tables(sp, dir, "events")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("v"))
      val dayUs = 86400000000L
      val c = ev.join(v, "user_id")
        .filter(col("event_type") === "click" && col("ts") > col("v") &&
          unix_micros(col("ts")) <= unix_micros(col("v")) + dayUs)
        .groupBy("user_id").agg(min(col("ts")).as("c"))
      val p = ev.join(c, "user_id")
        .filter(col("event_type") === "purchase" && col("ts") > col("c") &&
          unix_micros(col("ts")) <= unix_micros(col("c")) + dayUs)
        .groupBy("user_id").agg(min(col("ts")).as("p"))
      ev.select("user_id").distinct()
        .join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .withColumn("stage",
          when(col("p").isNotNull, "3_purchase")
            .when(col("c").isNotNull, "2_click")
            .when(col("v").isNotNull, "1_view")
            .otherwise("0_none"))
        .groupBy("stage")
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("p").isNotNull,
            unix_micros(col("p")) - unix_micros(col("v"))))
            .as("sum_conv_us"))
        .orderBy("stage")
    },
    Some("""
      WITH v AS (SELECT user_id, MIN(ts) AS v FROM events
                 WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.ts) AS c
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.v
              AND epoch_us(e.ts) <= epoch_us(v.v) + 86400000000
            GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(e.ts) AS p
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.c
              AND epoch_us(e.ts) <= epoch_us(c.c) + 86400000000
            GROUP BY e.user_id),
      staged AS (
        SELECT u.user_id,
          CASE WHEN p.p IS NOT NULL THEN '3_purchase'
               WHEN c.c IS NOT NULL THEN '2_click'
               WHEN v.v IS NOT NULL THEN '1_view'
               ELSE '0_none' END AS stage,
          CASE WHEN p.p IS NOT NULL
               THEN epoch_us(p.p) - epoch_us(v.v) END AS conv_us
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN v ON u.user_id = v.user_id
        LEFT JOIN c ON u.user_id = c.user_id
        LEFT JOIN p ON u.user_id = p.user_id)
      SELECT stage, COUNT(*) AS n_users,
        CAST(SUM(conv_us) AS BIGINT) AS sum_conv_us
      FROM staged GROUP BY stage ORDER BY stage"""))

  /** Weekly cohort retention: users grouped by first-activity week,
    * counted in each subsequent activity week — the retention triangle.
    * Two aggregates and one join, all shuffling on user_id, then a
    * small group-count; weeks difference is exact integer day
    * arithmetic (never months_between's fractional double). */
  val q64 = QueryDef(
    "q64_cohort_retention",
    (sp, dir) => {
      val ev = Tables(sp, dir, "events")
        .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
      val cohort = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
      ev.distinct()
        .join(cohort, "user_id")
        .withColumn("weeks_since",
          expr("datediff(week, cohort_week) div 7").cast("int"))
        .groupBy("cohort_week", "weeks_since")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "weeks_since")
    },
    Some("""
      WITH act AS (
        SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS week
        FROM events),
      cohort AS (
        SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id)
      SELECT c.cohort_week,
        CAST(date_diff('day', c.cohort_week, a.week) // 7 AS INT)
          AS weeks_since,
        COUNT(*) AS n_users
      FROM act a JOIN cohort c ON a.user_id = c.user_id
      GROUP BY 1, 2 ORDER BY cohort_week, weeks_since"""))

  /** k-th smallest via the typed-Aggregator UDAF
    * ([[graft.functions.KthSmallest]]): 3rd-lowest line price per
    * (returnflag, linestatus) WITHOUT sorting whole groups — each
    * map-side partial carries at most k doubles per group. The oracle
    * picks row 3 of the value-ordered window; duplicates count, and
    * ties among equal values can't change the k-th VALUE, so both
    * formulations agree exactly. */
  val q65 = QueryDef(
    "q65_kth_smallest",
    (sp, dir) => {
      val kth = udaf(new graft.functions.KthSmallest(3))
      Tables(sp, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_items"),
          min(col("l_extendedprice")).as("min_price"),
          kth(col("l_extendedprice")).as("third_lowest"))
        // groups with fewer than k values finish as NaN, but the
        // oracle's `WHERE rn = 3` DROPS such groups — filter them here
        // too so both engines agree structurally on any data
        .filter(!isnan(col("third_lowest")))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      WITH r AS (
        SELECT l_returnflag, l_linestatus, l_extendedprice,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
            ORDER BY l_extendedprice) AS rn,
          COUNT(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS n,
          MIN(l_extendedprice) OVER (PARTITION BY l_returnflag,
            l_linestatus) AS mn
        FROM lineitem)
      SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n_items,
        mn AS min_price, l_extendedprice AS third_lowest
      FROM r WHERE rn = 3
      ORDER BY l_returnflag, l_linestatus"""))

  /** Month-over-month growth: revenue per (priority, month) with the
    * previous month's value and percent change — the lag-over-sorted-
    * calendar idiom. Revenue accumulates in decimal; the growth rate
    * is a double expression over two exact values, identical in both
    * engines (NULL for each priority's first month). */
  val q66 = QueryDef(
    "q66_mom_growth",
    (sp, dir) => {
      import graft.Dsl.moneySum
      val monthly = Tables(sp, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"),
          // to_date: Spark's date_trunc yields TIMESTAMP while DuckDB's
          // DATE_TRUNC on a DATE column stays DATE — align on DATE
          to_date(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(moneySum(col("o_totalprice")).as("revenue"))
      val w = Window.partitionBy("priority").orderBy("month")
      monthly
        .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
        .withColumn("pct_change",
          (col("revenue") - col("prev_revenue")) / col("prev_revenue") * 100.0)
        .orderBy("priority", "month")
    },
    Some("""
      WITH monthly AS (
        SELECT o_orderpriority AS priority,
          DATE_TRUNC('month', o_orderdate) AS month,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS revenue
        FROM orders GROUP BY 1, 2)
      SELECT priority, month, revenue,
        LAG(revenue) OVER (PARTITION BY priority ORDER BY month)
          AS prev_revenue,
        (revenue - LAG(revenue) OVER (PARTITION BY priority ORDER BY month))
          / LAG(revenue) OVER (PARTITION BY priority ORDER BY month) * 100.0
          AS pct_change
      FROM monthly ORDER BY priority, month"""))

  /** Pareto / ABC analysis: within each return flag, how many parts
    * cover 80% of revenue. The running share is a per-row double
    * division of two exact decimal sums over a total order (revenue
    * desc, partkey). The flag column has cardinality 3, so a window
    * partitioned on it would sort ~a third of all parts inside each of
    * 3 tasks — the cumulative sum instead goes through
    * [[graft.operators.PrefixSum]] (range chunks + local sums +
    * broadcast offsets), and the per-flag denominator is a 3-row
    * broadcast aggregate, not a whole-partition window. */
  val q67 = QueryDef(
    "q67_pareto_abc",
    (sp, dir) => {
      import graft.Dsl.revSumDec
      // truncated (checkpoint-dir-aware): byPart feeds BOTH the
      // prefix-sum chain and the
      // per-flag totals — un-truncated, the totals branch re-ran the
      // whole lineitem aggregation a second time. The checkpointed
      // frame is (flag, part)-cardinality, not fact-table-sized.
      val byPart = Tables(sp, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"),
          col("l_partkey").as("part"))
        .agg(revSumDec(col("l_extendedprice"), col("l_discount")).as("rev"))
        .transform(org.apache.spark.sql.graft.Bridge.truncateBounded)
      val cum = graft.operators.PrefixSum.withRunningSum(byPart,
        Seq("flag"), Seq(col("rev").desc, col("part")), "rev", "cum_rev")
      val tot = byPart.groupBy("flag").agg(sum(col("rev")).as("flag_rev"))
      cum.join(broadcast(tot), "flag")
        // round both operands to money grain before the double casts:
        // past the 2^53 conversion cliff (Dsl.revSum scaladoc) the
        // raw scale-4 decimals convert differently on the two
        // engines, and cum_share DRIVES A SELECTION (<= 0.8) — a
        // last-ulp disagreement would flip knife-edge rows
        .withColumn("cum_share",
          round(col("cum_rev"), 2).cast("double") /
            round(col("flag_rev"), 2).cast("double"))
        .groupBy("flag")
        .agg(count(lit(1)).as("n_parts"),
          sum(when(col("cum_share") <= 0.8, 1L).otherwise(0L)).as("n_a_parts"),
          round(sum(col("rev")), 2).cast("double").as("total_rev"))
        .orderBy("flag")
    },
    Some("""
      WITH byPart AS (
        SELECT l_returnflag AS flag, l_partkey AS part,
          SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
            (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS rev
        FROM lineitem GROUP BY 1, 2),
      shares AS (
        SELECT flag, part, rev,
          CAST(ROUND(SUM(rev) OVER (PARTITION BY flag
              ORDER BY rev DESC, part ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE)
            / CAST(ROUND(SUM(rev) OVER (PARTITION BY flag), 2) AS DOUBLE)
            AS cum_share
        FROM byPart)
      SELECT flag, COUNT(*) AS n_parts,
        CAST(SUM(CASE WHEN cum_share <= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_a_parts,
        CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS total_rev
      FROM shares GROUP BY flag ORDER BY flag"""))

  /** Several COUNT(DISTINCT …) over DIFFERENT columns in one aggregate
    * — planned through Expand (one row copy per distinct column), the
    * engine feature single-distinct q09 never exercises. The non-
    * distinct count and decimal sum ride in the same pass. */
  val q68 = QueryDef(
    "q68_multi_distinct",
    (sp, dir) => {
      import graft.Dsl.moneySum
      Tables(sp, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_custs"),
          countDistinct(col("o_orderstatus")).as("n_statuses"),
          countDistinct(year(col("o_orderdate"))).as("n_years"),
          count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
        COUNT(DISTINCT o_custkey) AS n_custs,
        COUNT(DISTINCT o_orderstatus) AS n_statuses,
        COUNT(DISTINCT YEAR(o_orderdate)) AS n_years,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Rolling DISCRETE median (lower middle — picks an existing value,
    * zero float interpolation, so both engines agree bit-for-bit) over
    * a 25-row trailing frame per priority: Spark has no windowed
    * median, so the idiom is a sorted bounded frame + positional pick;
    * the oracle uses DuckDB's windowed quantile_disc. */
  val q69 = QueryDef(
    "q69_rolling_median",
    (sp, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_orderkey"))
        .rowsBetween(-24, Window.currentRow)
      Tables(sp, dir, "orders")
        .filter(col("o_custkey") < 200)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          sort_array(collect_list(col("o_totalprice")).over(w)).as("frame"))
        .withColumn("n", size(col("frame")))
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          element_at(col("frame"),
            expr("(n + 1) div 2").cast("int")).as("rolling_median"))
        .orderBy("o_orderpriority", "o_orderkey")
    },
    Some("""
      SELECT o_orderpriority, o_orderkey, o_totalprice,
        quantile_disc(o_totalprice, 0.5) OVER (PARTITION BY o_orderpriority
          ORDER BY o_orderkey ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)
          AS rolling_median
      FROM orders WHERE o_custkey < 200
      ORDER BY o_orderpriority, o_orderkey"""))

  /** The 100 TB twin of q26's exact percentiles: `approx_percentile`
    * (Greenwald–Khanna summaries) holds aggregation state bounded by
    * the accuracy parameter — NOT by group row count, which is what
    * makes exact `percentile()` an executor-crusher on near-continuous
    * values with few groups (its buffer holds every distinct value).
    * Sketch internals are engine-specific, so no portable DuckDB
    * oracle exists — rows-only by declared design (the q30/q52
    * pairing); the rank-error bound (≤ 1/accuracy) is spec-asserted
    * against the exact answer in RelationalMoreSpec. */
  val q70 = QueryDef(
    "q70_approx_percentiles",
    (sp, dir) => {
      Tables(sp, dir, "events")
        .groupBy("event_type")
        .agg(expr("approx_percentile(value, array(0.25, 0.5, 0.75), 10000)")
            .as("pcts"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"),
          element_at(col("pcts"), 1).as("p25"),
          element_at(col("pcts"), 2).as("p50"),
          element_at(col("pcts"), 3).as("p75"),
          col("n_events"))
        .orderBy("event_type")
    },
    None)

  /** KMV (k-minimum-values) distinct-count sketch — the third sketch
    * family after HLL (q52) and Count-Min (q58), and like them built
    * from EXACT integer hashing so the full sketch state is
    * DuckDB-replayable: the estimator (k−1)·P/h_k uses the k-th
    * smallest distinct LCG hash, an exact integer in both engines, so
    * even the estimate's double division matches bit-for-bit. Scale
    * shape: the distinct-hash aggregation map-side combines, and the
    * k minima come from TakeOrderedAndProject (per-partition heaps),
    * never a global sort. Error ~1/√(k−2) is spec-asserted. */
  val q71 = QueryDef(
    "q71_kmv_distinct",
    (sp, dir) => {
      val P = 2147483647L
      val li = Tables(sp, dir, "lineitem")
      val h = pmod(pmod(col("l_partkey"), lit(P)) * lit(1103515245L)
        + lit(12345L), lit(P))
      val topk = li.select(h.as("h")).distinct().orderBy("h").limit(64)
      val sketch = topk.agg(count(lit(1)).as("k_used"), max(col("h")).as("h_k"))
        .withColumn("__j", pmod(col("k_used"), lit(1L)))
      val exact = li.agg(countDistinct(col("l_partkey")).as("n_exact"))
        .withColumn("__j", pmod(col("n_exact"), lit(1L)))
      exact.join(broadcast(sketch), "__j").drop("__j")
        .withColumn("kmv_estimate",
          ((col("k_used") - 1) * lit(P)).cast("double") /
            greatest(col("h_k"), lit(1L)).cast("double"))
    },
    Some("""
      WITH h AS (SELECT DISTINCT
          ((l_partkey % 2147483647) * 1103515245 + 12345) % 2147483647 AS h
        FROM lineitem),
      topk AS (SELECT h FROM h ORDER BY h LIMIT 64),
      kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
               CAST(MAX(h) AS BIGINT) AS h_k FROM topk),
      ex AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact
             FROM lineitem)
      SELECT n_exact, k_used, h_k,
        CAST((k_used - 1) * 2147483647 AS DOUBLE)
          / CAST(GREATEST(h_k, 1) AS DOUBLE) AS kmv_estimate
      FROM ex, kk"""))

  /** Running max/min (record-to-date tracking) per order priority —
    * another 5-value partition column, so the cumulative extrema run
    * through [[graft.operators.PrefixSum.withRunningMax]]/`Min`: the
    * chunk decomposition generalized to any associative combine
    * (max(a∪b) = max(max a, max b)), never a 5-task whole-partition
    * sort. Double comparisons are exact, so the oracle matches
    * bit-for-bit. */
  val q72 = QueryDef(
    "q72_running_extrema",
    (sp, dir) => {
      import graft.operators.PrefixSum
      val base = Tables(sp, dir, "orders")
        .select(col("o_orderpriority").as("priority"), col("o_orderkey"),
          col("o_totalprice"))
      // both extrema in ONE chunk decomposition — shared range
      // shuffle, checkpoint, local window, and offsets aggregation
      PrefixSum.withRunningAggs(base,
          Seq("priority"), Seq(col("o_orderkey")),
          Seq(
            PrefixSum.RunningAgg("o_totalprice", "run_max", max,
              (loc, off) => greatest(loc, off)),
            PrefixSum.RunningAgg("o_totalprice", "run_min", min,
              (loc, off) => least(loc, off))))
        .orderBy("priority", "o_orderkey")
    },
    Some("""
      SELECT o_orderpriority AS priority, o_orderkey, o_totalprice,
        MAX(o_totalprice) OVER (PARTITION BY o_orderpriority
          ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING) AS run_max,
        MIN(o_totalprice) OVER (PARTITION BY o_orderpriority
          ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING) AS run_min
      FROM orders ORDER BY priority, o_orderkey"""))

  /** EXACT percentiles at scale — q26's same answer through
    * [[graft.operators.ExactPercentiles]] (two-pass bucketed counting:
    * bounded histogram state, then bucket-local sorts of target
    * buckets only) instead of `percentile()`'s per-group
    * every-distinct-value buffer. The third leg of the percentile
    * triangle: q26 exact-but-buffered (dev), q70 approximate-bounded,
    * q73 exact-AND-bounded. Same oracle as q26 (quantile_cont,
    * rounded to 4 decimals). */
  val q73 = QueryDef(
    "q73_bucketed_percentiles",
    (sp, dir) => {
      val r = graft.operators.ExactPercentiles.compute(
        Tables(sp, dir, "events"), "event_type", "value",
        qs = Seq(("25", 0.25), ("50", 0.5), ("75", 0.75)),
        bucketWidth = 16.0)
      r.select(col("g").as("event_type"),
          round(col("p_25"), 4).as("p25"),
          round(col("p_50"), 4).as("p50"),
          round(col("p_75"), 4).as("p75"),
          col("n").as("n_events"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type,
        ROUND(quantile_cont(value, 0.25), 4) AS p25,
        ROUND(quantile_cont(value, 0.5), 4) AS p50,
        ROUND(quantile_cont(value, 0.75), 4) AS p75,
        COUNT(*) AS n_events
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Mergeable quantile sketch — the fourth leg of the percentile
    * triangle (q26 exact-buffered, q70 approx-GK, q73 exact-bucketed):
    * [[graft.functions.TDigestQuantiles]], a native t-digest
    * TypedImperativeAggregate whose per-group state is O(compression)
    * wherever the rows land and whose partial digests merge
    * associatively — the shape that lets per-day digests union later
    * without re-reading raw data. Estimates are merge-order-dependent,
    * so rows-only (the q30/q70 precedent); the rank-error bound and
    * partition-count invariance are spec-asserted in TDigestSpec. */
  val q101 = QueryDef(
    "q101_tdigest_quantiles",
    (sp, dir) => {
      Tables(sp, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          graft.functions.TDigestQuantiles(
            col("l_extendedprice").cast("double"),
            Seq(0.1, 0.5, 0.9, 0.99), 100.0).as("qt"))
        .select(col("l_returnflag"), col("n_rows"),
          col("qt")(0).as("p10"), col("qt")(1).as("p50"),
          col("qt")(2).as("p90"), col("qt")(3).as("p99"))
        .orderBy("l_returnflag")
    },
    None)

  /** Two-level digest rollup — the INCREMENTAL shape of q101: build
    * one O(compression)-byte [[graft.functions.TDigestSketch]] per
    * (returnflag, ship month) cell (what a daily pipeline would
    * persist to a monitoring table), then fold the stored sketches
    * per returnflag with [[graft.functions.TDigestMergeQuantiles]] —
    * quantiles over a year of data without re-reading a single raw
    * row. Rows-only like q101; TDigestSpec proves the two-level
    * estimates honor the same rank-error bound as the one-level. */
  val q102 = QueryDef(
    "q102_tdigest_rollup",
    (sp, dir) => {
      val monthly = Tables(sp, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          date_trunc("month", col("l_shipdate")).as("ship_month"))
        .agg(count(lit(1)).as("n"),
          graft.functions.TDigestSketch(
            col("l_extendedprice").cast("double"), 100.0).as("sketch"))
      monthly
        .groupBy("l_returnflag")
        .agg(sum("n").as("n_rows"),
          count(lit(1)).as("n_sketches"),
          graft.functions.TDigestMergeQuantiles(col("sketch"),
            Seq(0.1, 0.5, 0.9, 0.99)).as("qt"))
        .select(col("l_returnflag"), col("n_rows"), col("n_sketches"),
          col("qt")(0).as("p10"), col("qt")(1).as("p50"),
          col("qt")(2).as("p90"), col("qt")(3).as("p99"))
        .orderBy("l_returnflag")
    },
    None)

  /** The q102 rollup shape for CARDINALITY — and, unlike the t-digest,
    * fully ORACLE-CHECKED: build one 258-byte
    * [[graft.functions.HllSketchAgg]] per (event_type, week) cell
    * (what a daily pipeline persists to a monitoring table), fold the
    * stored sketches per type with [[graft.functions.HllMerge]], and
    * estimate via [[graft.functions.HllEstimate]] — distinct users
    * over a year without re-reading raw data. HLL registers merge by
    * max (associative, commutative, idempotent), so the two-level
    * Spark rollup is bit-identical to DuckDB's one-level register
    * replay (q52's portable algebra: LCG hash, low 8 bits → bucket,
    * lowest-set-bit rho, exact fixed-point BIGINT harmonic sum, one
    * trailing double division) — the hash match proves the aggregate's
    * full state algebra, not just its row count. The estimate rounds
    * to 4 decimals on both engines (linear counting's one ln() is the
    * only op libm and fdlibm may disagree on — last ulp), and the
    * sketch input is the SQUARED LCG (affine hashes map consecutive
    * ids collision-free, biasing linear counting high — see
    * [[graft.functions.HllSketch]]). The exact side rides a second
    * aggregation of the same scan (5-row broadcast join) for the
    * q52-style error report. */
  val q104 = QueryDef(
    "q104_hll_rollup",
    (sp, dir) => {
      val ev = Tables(sp, dir, "events")
      val lcg = pmod(pmod(col("user_id"), lit(2147483647L)) * lit(1103515245L)
        + lit(12345L), lit(2147483647L))
      val monthly = ev
        .select(col("event_type"),
          date_trunc("week", col("ts")).as("week"),
          ((lcg * lcg) % lit(2147483647L)).as("h"))
        .groupBy("event_type", "week")
        .agg(count(lit(1)).as("n"),
          graft.functions.HllSketchAgg(col("h"), 8).as("sketch"))
      val rolled = monthly.groupBy("event_type")
        .agg(sum("n").as("n_events"),
          count(lit(1)).as("n_sketches"),
          round(graft.functions.HllEstimate(
            graft.functions.HllMerge(col("sketch"))), 4).as("est_distinct"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      rolled.join(exact, Seq("event_type"))
        .withColumn("rel_err", col("est_distinct") / col("exact_distinct") - 1)
        .select("event_type", "n_events", "n_sketches", "est_distinct",
          "exact_distinct", "rel_err")
        .orderBy("event_type")
    },
    Some("""
      WITH l AS (SELECT event_type, ts, user_id,
                   ((user_id % 2147483647) * 1103515245 + 12345) % 2147483647 AS l
                 FROM events),
      h AS (SELECT event_type, (l * l) % 2147483647 AS h FROM l),
      b AS (SELECT event_type, CAST(h % 256 AS INT) AS bucket,
              h // 256 AS w FROM h),
      r AS (SELECT event_type, bucket,
              CASE WHEN w = 0 THEN 54
                   ELSE LEAST(length(bin(w & -w)), 54) END AS rho
            FROM b),
      mx AS (SELECT event_type, bucket, MAX(rho) AS maxrho
             FROM r GROUP BY 1, 2),
      types AS (SELECT DISTINCT event_type FROM events),
      spine AS (SELECT t.event_type, g.bucket
                FROM types t CROSS JOIN
                  (SELECT unnest(generate_series(0, 255)) AS bucket) g),
      reg AS (SELECT s.event_type, COALESCE(mx.maxrho, 0) AS maxrho
              FROM spine s LEFT JOIN mx
                ON s.event_type = mx.event_type AND s.bucket = mx.bucket),
      agg AS (SELECT event_type,
                CAST(SUM(1::BIGINT << (54 - maxrho)) AS BIGINT) AS sum_scaled,
                CAST(SUM(CASE WHEN maxrho = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS zeros
              FROM reg GROUP BY 1),
      base AS (SELECT event_type, COUNT(*) AS n_events,
                 COUNT(DISTINCT DATE_TRUNC('week', ts)) AS n_sketches,
                 COUNT(DISTINCT user_id) AS exact_distinct
               FROM events GROUP BY 1),
      raw AS (SELECT a.event_type, a.zeros,
                ((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0)
                  * 18014398509481984.0
                  / CAST(a.sum_scaled AS DOUBLE) AS raw
              FROM agg a),
      est AS (SELECT event_type,
                ROUND(CASE WHEN zeros = 256 THEN 0.0
                           WHEN raw <= 2.5 * 256.0 AND zeros > 0
                             THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE))
                           ELSE raw END, 4) AS est_distinct
              FROM raw)
      SELECT b.event_type, b.n_events, b.n_sketches, e.est_distinct,
        b.exact_distinct,
        e.est_distinct / b.exact_distinct - 1 AS rel_err
      FROM base b JOIN est e ON b.event_type = e.event_type
      ORDER BY b.event_type"""))

  /** The rollup shape for FREQUENCIES — q58's Count-Min algebra
    * through the STORED-SKETCH path: one
    * [[graft.functions.CmsSketchAgg]] d×4096 counter matrix per ship
    * week (what a daily pipeline persists), folded with
    * [[graft.functions.CmsMerge]] (elementwise sum — associative and
    * commutative, so the two-level rollup is bit-identical to
    * one-level), then the exact top-20 part keys probe the merged
    * sketch via [[graft.functions.CmsQuery]]. All exact 64-bit
    * integer arithmetic, so the oracle replays the counter matrix row
    * for row (q58's precedent) and the CMS overcount guarantee is
    * e2e-checked. The probe side joins the 1-row merged sketch on a
    * constant NON-FOLDABLE key (pmod of a data column — the CountMin
    * rank-window trick): a foldable literal key would propagate into
    * the join condition and degrade the broadcast hash join to a
    * nested-loop join. */
  val q105 = QueryDef(
    "q105_cms_rollup",
    (sp, dir) => {
      val li = Tables(sp, dir, "lineitem")
        .select(col("l_partkey").cast("long").as("part"),
          date_trunc("week", col("l_shipdate")).as("week"))
      val weekly = li.groupBy("week")
        .agg(count(lit(1)).as("n"),
          graft.functions.CmsSketchAgg(col("part"), 4096).as("sketch"))
      val merged = weekly
        .agg(sum("n").as("n_rows"), count(lit(1)).as("n_sketches"),
          graft.functions.CmsMerge(col("sketch")).as("sketch"))
        .withColumn("k", pmod(col("n_rows"), lit(1L)))
      val top = li.groupBy("part").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("part")).limit(20)
        .withColumn("k", pmod(col("part"), lit(1L)))
      val probed = top.join(merged, Seq("k"))
        .withColumn("cms_estimate",
          graft.functions.CmsQuery(col("sketch"), col("part")))
      probed.select(col("part"), col("exact_cnt"), col("cms_estimate"),
          (col("cms_estimate") - col("exact_cnt")).as("overcount"),
          col("n_rows"), col("n_sketches"))
        .orderBy(col("exact_cnt").desc, col("part"))
    },
    Some {
      val hashRows = graft.operators.CountMin.rowParams.zipWithIndex
        .map { case ((a, b), i) =>
          s"SELECT $i AS row, (($a * (part % 2147483647) + $b) % 2147483647) % 4096 AS bucket, part, exact_cnt FROM keys"
        }.mkString("\n        UNION ALL ")
      s"""
      WITH keys AS (
        SELECT CAST(l_partkey AS BIGINT) AS part, COUNT(*) AS exact_cnt
        FROM lineitem GROUP BY 1),
      routed AS (
        $hashRows),
      counters AS (
        SELECT row, bucket, SUM(exact_cnt) AS counter
        FROM routed GROUP BY 1, 2),
      top AS (
        SELECT part, exact_cnt FROM keys
        ORDER BY exact_cnt DESC, part LIMIT 20),
      est AS (
        SELECT t.part, t.exact_cnt, MIN(c.counter) AS cms_estimate
        FROM top t JOIN routed r ON t.part = r.part
        JOIN counters c ON r.row = c.row AND r.bucket = c.bucket
        GROUP BY 1, 2),
      meta AS (
        SELECT COUNT(*) AS n_rows,
          COUNT(DISTINCT DATE_TRUNC('week', l_shipdate)) AS n_sketches
        FROM lineitem)
      SELECT e.part, CAST(e.exact_cnt AS BIGINT) AS exact_cnt,
        CAST(e.cms_estimate AS BIGINT) AS cms_estimate,
        CAST(e.cms_estimate - e.exact_cnt AS BIGINT) AS overcount,
        CAST(m.n_rows AS BIGINT) AS n_rows,
        CAST(m.n_sketches AS BIGINT) AS n_sketches
      FROM est e CROSS JOIN meta m
      ORDER BY e.exact_cnt DESC, e.part"""
    })

  /** The rollup shape for MEMBERSHIP — the q56 runtime-filter idiom
    * through the STORED-SKETCH path: one
    * [[graft.functions.BloomSketchAgg]] 16384-bit filter per
    * (priority, order week) cell (what an incremental pipeline
    * persists per installment — the d21 persisted-index story at a
    * FIXED 2 KB per cell), folded per priority with
    * [[graft.functions.BloomMerge]] (word OR — associative,
    * commutative, idempotent, so the two-level rollup is bit-identical
    * to one-level), then a 20-key probe panel (10 low custkeys present
    * in most priorities + 10 synthetic keys absent from the data)
    * answers "has this customer ever ordered at this priority"
    * against the sketches alone. The bit positions come from the
    * portable LCG family (CountMin algebra), so the oracle replays
    * the EXACT bit array: set-bit counts, every probe outcome AND the
    * false-positive flags are checked end to end — the no-false-
    * negative guarantee is e2e-proven, not assumed. The probe panel
    * joins the 5-row folded side on a constant NON-FOLDABLE key
    * (the q105 broadcast trick). */
  val q106 = QueryDef(
    "q106_bloom_rollup",
    (sp, dir) => {
      val ord = Tables(sp, dir, "orders")
        .select(col("o_orderpriority").as("pri"),
          date_trunc("week", col("o_orderdate")).as("week"),
          col("o_custkey").cast("long").as("cust"))
      val weekly = ord.groupBy("pri", "week")
        .agg(count(lit(1)).as("n"),
          graft.functions.BloomSketchAgg(col("cust"), 16384, 3).as("sketch"))
      val folded = weekly.groupBy("pri")
        .agg(sum("n").as("n_orders"), count(lit(1)).as("n_sketches"),
          graft.functions.BloomMerge(col("sketch")).as("sketch"))
        .withColumn("set_bits", graft.functions.BloomBits(col("sketch")))
        .withColumn("fpp_est", round(graft.functions.BloomFpp(col("sketch")), 4))
        .withColumn("j", pmod(col("n_orders"), lit(1L)))
      val probes = sp.range(0, 10).select(col("id").as("probe_key"))
        .unionAll(sp.range(1000000, 1000010).select(col("id").as("probe_key")))
        .withColumn("j", pmod(col("probe_key"), lit(1L)))
      val present = ord.select(col("pri"), col("cust").as("probe_key"))
        .distinct().withColumn("present", lit(true))
      folded.join(broadcast(probes), Seq("j"))
        .withColumn("might_contain",
          graft.functions.BloomContains(col("sketch"), col("probe_key")))
        .join(present, Seq("pri", "probe_key"), "left")
        .withColumn("present", coalesce(col("present"), lit(false)))
        .withColumn("false_positive", col("might_contain") && !col("present"))
        .select("pri", "probe_key", "might_contain", "present",
          "false_positive", "n_orders", "n_sketches", "set_bits", "fpp_est")
        .orderBy("pri", "probe_key")
    },
    Some {
      val rows = graft.functions.BloomSketch.sqlRowParams.take(3)
      def routed(src: String, key: String): String = rows.map { case (a, b) =>
        s"SELECT pri, $key, (($a * ($key % 2147483647) + $b) % 2147483647)" +
          s" % 16384 AS pos FROM $src"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH custs AS (
        SELECT DISTINCT o_orderpriority AS pri, CAST(o_custkey AS BIGINT) AS cust
        FROM orders),
      meta AS (
        SELECT o_orderpriority AS pri, COUNT(*) AS n_orders,
          COUNT(DISTINCT DATE_TRUNC('week', o_orderdate)) AS n_sketches
        FROM orders GROUP BY 1),
      routed AS (
        ${routed("custs", "cust")}),
      bits AS (SELECT DISTINCT pri, pos FROM routed),
      bitcnt AS (SELECT pri, COUNT(*) AS set_bits FROM bits GROUP BY 1),
      probes AS (
        SELECT unnest(generate_series(0, 9)) AS probe_key
        UNION ALL
        SELECT unnest(generate_series(1000000, 1000009)) AS probe_key),
      panel AS (SELECT m.pri, p.probe_key FROM meta m CROSS JOIN probes p),
      panelrouted AS (
        ${routed("panel", "probe_key")}),
      hit AS (
        SELECT pr.pri, pr.probe_key,
          BOOL_AND(b.pos IS NOT NULL) AS might_contain
        FROM panelrouted pr LEFT JOIN bits b
          ON pr.pri = b.pri AND pr.pos = b.pos
        GROUP BY 1, 2)
      SELECT h.pri, h.probe_key, h.might_contain,
        (c.cust IS NOT NULL) AS present,
        (h.might_contain AND c.cust IS NULL) AS false_positive,
        m.n_orders, m.n_sketches, b.set_bits,
        ROUND(POWER(b.set_bits / 16384.0, 3), 4) AS fpp_est
      FROM hit h
      JOIN meta m ON h.pri = m.pri
      JOIN bitcnt b ON h.pri = b.pri
      LEFT JOIN custs c ON h.pri = c.pri AND h.probe_key = c.cust
      ORDER BY h.pri, h.probe_key"""
    })

  /** Sketch-to-sketch GROUP-similarity join — the Jaccard-RATIO twin
    * of q103's KMV size algebra: one 64-component
    * [[graft.functions.MinHashSigAgg]] signature per (priority, week)
    * cell, folded per priority with [[graft.functions.MinHashSigMerge]]
    * (elementwise min — the signature of the union, EXACTLY), then
    * every priority pair's customer-set Jaccard estimated from the
    * signatures alone via [[graft.functions.MinHashJaccard]]
    * (component agreement / k — a dyadic rational, so the oracle
    * replays it exactly) against the exact Jaccard riding the same
    * scan. The all-pairs matrix over 5 groups is the declared dev
    * shape; at real group counts the signatures band into LSH buckets
    * (r components per band → equi-join) — sub-quadratic group-
    * similarity search, d02's document-level discipline lifted to
    * groups. Pair generation joins on a constant NON-FOLDABLE key
    * (the q105 broadcast trick) and keeps pri_a < pri_b. */
  val q107 = QueryDef(
    "q107_minhash_group_join",
    (sp, dir) => {
      val ord = Tables(sp, dir, "orders")
        .select(col("o_orderpriority").as("pri"),
          date_trunc("week", col("o_orderdate")).as("week"),
          col("o_custkey").cast("long").as("cust"))
      val weekly = ord.groupBy("pri", "week")
        .agg(graft.functions.MinHashSigAgg(col("cust"), 64).as("sig"))
      val sigs = weekly.groupBy("pri")
        .agg(graft.functions.MinHashSigMerge(col("sig")).as("sig"))
        .withColumn("j", pmod(length(col("pri")).cast("long"), lit(1L)))
      val pairs = sigs.select(col("pri").as("pri_a"), col("sig").as("sig_a"),
          col("j"))
        .join(broadcast(sigs.select(col("pri").as("pri_b"),
          col("sig").as("sig_b"), col("j"))), Seq("j"))
        .filter(col("pri_a") < col("pri_b"))
        .withColumn("jaccard_est",
          graft.functions.MinHashJaccard(col("sig_a"), col("sig_b")))
      val sets = ord.select("pri", "cust").distinct()
      val sizes = sets.groupBy("pri").agg(count(lit(1)).as("n"))
      val inter = sets.select(col("pri").as("pri_a"), col("cust"))
        .join(sets.select(col("pri").as("pri_b"), col("cust")), Seq("cust"))
        .filter(col("pri_a") < col("pri_b"))
        .groupBy("pri_a", "pri_b").agg(count(lit(1)).as("n_inter"))
      pairs
        .join(sizes.select(col("pri").as("pri_a"), col("n").as("n_a")),
          Seq("pri_a"))
        .join(sizes.select(col("pri").as("pri_b"), col("n").as("n_b")),
          Seq("pri_b"))
        .join(inter, Seq("pri_a", "pri_b"))
        .withColumn("jaccard_exact",
          col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
        .withColumn("err", col("jaccard_est") - col("jaccard_exact"))
        .select("pri_a", "pri_b", "n_a", "n_b", "n_inter",
          "jaccard_exact", "jaccard_est", "err")
        .orderBy("pri_a", "pri_b")
    },
    Some {
      val perms = graft.functions.MinHashGroupSig.sqlPerms(64)
      val permRows = perms.zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      s"""
      WITH custs AS (
        SELECT DISTINCT o_orderpriority AS pri, CAST(o_custkey AS BIGINT) AS cust
        FROM orders),
      perms AS (SELECT * FROM (VALUES $permRows) t(i, a, b)),
      sigs AS (
        SELECT pri, p.i, MIN(((cust % 2147483647) * p.a + p.b) % 2147483647) AS m
        FROM custs c CROSS JOIN perms p GROUP BY 1, 2),
      agree AS (
        SELECT x.pri AS pri_a, y.pri AS pri_b,
          SUM(CASE WHEN x.m = y.m THEN 1 ELSE 0 END) / 64.0 AS jaccard_est
        FROM sigs x JOIN sigs y ON x.i = y.i AND x.pri < y.pri
        GROUP BY 1, 2),
      sizes AS (SELECT pri, CAST(COUNT(*) AS BIGINT) AS n FROM custs GROUP BY 1),
      inter AS (
        SELECT x.pri AS pri_a, y.pri AS pri_b, CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM custs x JOIN custs y ON x.cust = y.cust AND x.pri < y.pri
        GROUP BY 1, 2)
      SELECT a.pri_a, a.pri_b, sa.n AS n_a, sb.n AS n_b, i.n_inter,
        CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) AS jaccard_exact,
        a.jaccard_est,
        a.jaccard_est - CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter)
          AS err
      FROM agree a
      JOIN sizes sa ON a.pri_a = sa.pri
      JOIN sizes sb ON a.pri_b = sb.pri
      JOIN inter i ON a.pri_a = i.pri_a AND a.pri_b = i.pri_b
      ORDER BY a.pri_a, a.pri_b"""
    })

  /** Set algebra over STORED HLL sketches — the q80-for-HLL, composed
    * entirely from the existing q104 surface (no new expression):
    * per-type register sketches pair up via the constant-key broadcast
    * join, each pair's two sketches explode into rows and fold through
    * [[graft.functions.HllMerge]] (register max = the union's sketch,
    * exactly), and |A∩B| comes from inclusion-exclusion
    * est_a + est_b − est_union — the classic HLL intersection, noisy
    * by construction (the error report rides along; q103's KMV is the
    * lower-variance alternative when a ratio is what's wanted). Both
    * estimator regimes are exercised across dev SFs: linear counting
    * at sf0.01 (≈150 users/type vs 2.5·m = 640), the raw harmonic
    * estimator at sf0.1 (≈1500). Fully oracle-checked — DuckDB
    * replays per-type registers, pairwise register max, and all three
    * estimates (4-decimal rounding on the ln branch, the t10 rule). */
  val q108 = QueryDef(
    "q108_hll_setops",
    (sp, dir) => {
      val lcg = pmod(pmod(col("user_id"), lit(2147483647L)) * lit(1103515245L)
        + lit(12345L), lit(2147483647L))
      val ev = Tables(sp, dir, "events")
        .select(col("event_type"), col("user_id"),
          ((lcg * lcg) % lit(2147483647L)).as("h"))
      val sketches = ev.groupBy("event_type")
        .agg(graft.functions.HllSketchAgg(col("h"), 8).as("sk"))
        .withColumn("j", pmod(length(col("event_type")).cast("long"), lit(1L)))
      val pairs = sketches
        .select(col("event_type").as("type_a"), col("sk").as("sk_a"), col("j"))
        .join(broadcast(sketches.select(col("event_type").as("type_b"),
          col("sk").as("sk_b"), col("j"))), Seq("j"))
        .filter(col("type_a") < col("type_b"))
      val unions = pairs
        .select(col("type_a"), col("type_b"),
          explode(array(col("sk_a"), col("sk_b"))).as("sk"))
        .groupBy("type_a", "type_b")
        .agg(round(graft.functions.HllEstimate(
          graft.functions.HllMerge(col("sk"))), 4).as("est_union"))
      val du = ev.select(col("event_type"), col("user_id")).distinct()
      val exact = du.select(col("event_type").as("type_a"), col("user_id"))
        .join(du.select(col("event_type").as("type_b"), col("user_id")),
          Seq("user_id"))
        .filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_inter_exact"))
      pairs
        .withColumn("est_a",
          round(graft.functions.HllEstimate(col("sk_a")), 4))
        .withColumn("est_b",
          round(graft.functions.HllEstimate(col("sk_b")), 4))
        .join(unions, Seq("type_a", "type_b"))
        .join(exact, Seq("type_a", "type_b"))
        .withColumn("est_inter",
          col("est_a") + col("est_b") - col("est_union"))
        .withColumn("err", col("est_inter") - col("n_inter_exact"))
        .select("type_a", "type_b", "est_a", "est_b", "est_union",
          "est_inter", "n_inter_exact", "err")
        .orderBy("type_a", "type_b")
    },
    Some("""
      WITH l AS (SELECT event_type, user_id,
                   ((user_id % 2147483647) * 1103515245 + 12345) % 2147483647 AS l
                 FROM events),
      h AS (SELECT event_type, (l * l) % 2147483647 AS h FROM l),
      b AS (SELECT event_type, CAST(h % 256 AS INT) AS bucket,
              h // 256 AS w FROM h),
      r AS (SELECT event_type, bucket,
              CASE WHEN w = 0 THEN 54
                   ELSE LEAST(length(bin(w & -w)), 54) END AS rho
            FROM b),
      mx AS (SELECT event_type, bucket, MAX(rho) AS maxrho
             FROM r GROUP BY 1, 2),
      types AS (SELECT DISTINCT event_type FROM events),
      spine AS (SELECT t.event_type, g.bucket
                FROM types t CROSS JOIN
                  (SELECT unnest(generate_series(0, 255)) AS bucket) g),
      reg AS (SELECT s.event_type, s.bucket, COALESCE(mx.maxrho, 0) AS maxrho
              FROM spine s LEFT JOIN mx
                ON s.event_type = mx.event_type AND s.bucket = mx.bucket),
      -- one register table holding singles AND pairwise maxes
      sides AS (SELECT event_type AS type_a, event_type AS type_b,
                  bucket, maxrho FROM reg),
      pairregs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b, a.bucket,
          GREATEST(a.maxrho, b.maxrho) AS maxrho
        FROM reg a JOIN reg b
          ON a.bucket = b.bucket AND a.event_type < b.event_type),
      allregs AS (SELECT * FROM sides UNION ALL SELECT * FROM pairregs),
      agg AS (SELECT type_a, type_b,
                CAST(SUM(1::BIGINT << (54 - maxrho)) AS BIGINT) AS sum_scaled,
                CAST(SUM(CASE WHEN maxrho = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS zeros
              FROM allregs GROUP BY 1, 2),
      est AS (SELECT type_a, type_b,
                ROUND(CASE WHEN zeros = 256 THEN 0.0
                           WHEN ((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0)
                                  * 18014398509481984.0
                                  / CAST(sum_scaled AS DOUBLE)
                                <= 2.5 * 256.0 AND zeros > 0
                             THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE))
                           ELSE ((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0)
                                  * 18014398509481984.0
                                  / CAST(sum_scaled AS DOUBLE) END, 4) AS est
              FROM agg),
      inter AS (
        SELECT x.event_type AS type_a, y.event_type AS type_b,
          CAST(COUNT(*) AS BIGINT) AS n_inter_exact
        FROM (SELECT DISTINCT event_type, user_id FROM events) x
        JOIN (SELECT DISTINCT event_type, user_id FROM events) y
          ON x.user_id = y.user_id AND x.event_type < y.event_type
        GROUP BY 1, 2)
      SELECT p.type_a, p.type_b,
        ea.est AS est_a, eb.est AS est_b, p.est AS est_union,
        ea.est + eb.est - p.est AS est_inter,
        i.n_inter_exact,
        ea.est + eb.est - p.est - i.n_inter_exact AS err
      FROM est p
      JOIN est ea ON ea.type_a = p.type_a AND ea.type_b = p.type_a
      JOIN est eb ON eb.type_a = p.type_b AND eb.type_b = p.type_b
      JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b
      WHERE p.type_a < p.type_b
      ORDER BY p.type_a, p.type_b"""))

  /** The sketch-APPLICATION shape for JOIN PLANNING: estimate the
    * equi-join size between two large keyed tables from their stored
    * Count-Min sketches alone — the classic AGMS/CMS inner product
    * (Cormode & Muthukrishnan 2005 §4.2). Per event-type pair, the
    * join size on user_id (number of row pairs Σ_u cA(u)·cB(u) — the
    * quantity a cost-based planner needs BEFORE running the join) is
    * estimated by [[graft.functions.CmsInnerProduct]] over the d×4096
    * counter matrices q105's pipeline already persists, without
    * touching raw data. Everything is exact 64-bit integer arithmetic
    * — counters, dot products, the min over rows — so the oracle
    * replays the counter matrices row for row and the inner-product
    * guarantee (estimate ≥ exact join size, over only by cross-key
    * bucket collisions ≈ nA·nB/w per row) is e2e-checked on every
    * pair, self-joins included (the diagonal is the second frequency
    * moment F2). The sketch key is the SQUARED LCG of user_id (the
    * q104 rule, inverted motive: the raw affine rows map consecutive
    * ids collision-FREE, which makes the estimate unrealistically
    * exact at dev key diversity — the nonlinear key restores
    * random-hash collision behavior, so the overcount column is
    * non-trivially exercised at BOTH dev SFs, ~U/w relative: +0.9%
    * at 150 users, +29% at 1500 — the measured "size w to the key
    * diversity" lesson). The 5-row sketch table pair-joins on a
    * constant NON-FOLDABLE key (the q105/q108 broadcast trick) so the
    * plan sweep sees an equi-join, not a cartesian. */
  val q109 = QueryDef(
    "q109_cms_join_size",
    (sp, dir) => {
      val lcg = pmod(pmod(col("user_id"), lit(2147483647L)) * lit(1103515245L)
        + lit(12345L), lit(2147483647L))
      val ev = Tables(sp, dir, "events")
        .select(col("event_type"), col("user_id"),
          ((lcg * lcg) % lit(2147483647L)).as("k"))
      val sk = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          graft.functions.CmsSketchAgg(col("k"), 4096).as("sk"))
        .withColumn("j", pmod(col("n"), lit(1L)))
      val pairs = sk
        .select(col("event_type").as("type_a"), col("n").as("n_a"),
          col("sk").as("sk_a"), col("j"))
        .join(broadcast(sk.select(col("event_type").as("type_b"),
          col("n").as("n_b"), col("sk").as("sk_b"), col("j"))), Seq("j"))
        .filter(col("type_a") <= col("type_b"))
        .withColumn("est_join_size",
          graft.functions.CmsInnerProduct(col("sk_a"), col("sk_b")))
      val cu = ev.groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("c"))
      val exact = cu
        .select(col("event_type").as("type_a"), col("user_id"),
          col("c").as("c_a"))
        .join(cu.select(col("event_type").as("type_b"), col("user_id"),
          col("c").as("c_b")), Seq("user_id"))
        .filter(col("type_a") <= col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(sum(col("c_a") * col("c_b")).as("exact_join_size"))
      pairs.join(exact, Seq("type_a", "type_b"))
        .withColumn("overcount",
          col("est_join_size") - col("exact_join_size"))
        .select("type_a", "type_b", "n_a", "n_b", "exact_join_size",
          "est_join_size", "overcount")
        .orderBy("type_a", "type_b")
    },
    Some {
      val hashRows = graft.operators.CountMin.rowParams.zipWithIndex
        .map { case ((a, b), i) =>
          s"SELECT event_type, $i AS row, (($a * (k % 2147483647) + $b) % 2147483647) % 4096 AS bucket, c FROM ck"
        }.mkString("\n        UNION ALL ")
      s"""
      WITH lk AS (
        SELECT event_type, user_id,
          ((((user_id % 2147483647) * 1103515245 + 12345) % 2147483647)
           * (((user_id % 2147483647) * 1103515245 + 12345) % 2147483647)) % 2147483647 AS hk
        FROM events),
      cu AS (
        SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM lk GROUP BY 1, 2),
      ck AS (
        SELECT event_type, hk AS k, CAST(COUNT(*) AS BIGINT) AS c
        FROM lk GROUP BY 1, 2),
      routed AS (
        $hashRows),
      counters AS (
        SELECT event_type, row, bucket, SUM(c) AS counter
        FROM routed GROUP BY 1, 2, 3),
      dots AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b, a.row,
          SUM(a.counter * b.counter) AS dot
        FROM counters a JOIN counters b
          ON a.row = b.row AND a.bucket = b.bucket
          AND a.event_type <= b.event_type
        GROUP BY 1, 2, 3),
      est AS (
        SELECT type_a, type_b, MIN(dot) AS est_join_size
        FROM dots GROUP BY 1, 2),
      exact AS (
        SELECT x.event_type AS type_a, y.event_type AS type_b,
          SUM(x.c * y.c) AS exact_join_size
        FROM cu x JOIN cu y
          ON x.user_id = y.user_id AND x.event_type <= y.event_type
        GROUP BY 1, 2),
      n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1)
      SELECT e.type_a, e.type_b, na.n AS n_a, nb.n AS n_b,
        CAST(x.exact_join_size AS BIGINT) AS exact_join_size,
        CAST(e.est_join_size AS BIGINT) AS est_join_size,
        CAST(e.est_join_size - x.exact_join_size AS BIGINT) AS overcount
      FROM est e
      JOIN exact x ON x.type_a = e.type_a AND x.type_b = e.type_b
      JOIN n na ON na.event_type = e.type_a
      JOIN n nb ON nb.event_type = e.type_b
      ORDER BY e.type_a, e.type_b"""
    })

  /** The rollup shape for SAMPLING — the last member of the mergeable
    * sketch family ([[graft.functions.SampleSketchAgg]]/
    * [[graft.functions.SampleMerge]]/[[graft.functions.SampleEntries]],
    * SQL-registered): one bounded k=10 weighted sample per
    * (event_type, week) cell (what a daily pipeline persists — 169
    * bytes each), folded per type. Per-row priority is the portable
    * LCG of the unique event_id; per-user priority folds by MAX, so a
    * user active in c events holds the max of c uniforms ≡ the
    * Efraimidis–Spirakis u^(1/c) priority — the folded top-k IS an
    * exact activity-weighted sample, in pure 64-bit integers (the
    * uniform is monotone in its hash, so no log/pow/doubles exist
    * anywhere). The coordinated bottom-k merge theorem (class doc)
    * makes the two-level rollup BIT-IDENTICAL to sampling the raw
    * year directly, so the entry is fully oracle-checked: DuckDB
    * replays per-user max + rank directly off the raw table, and the
    * exact per-user activity rides along as the weighting evidence. */
  val q110 = QueryDef(
    "q110_sample_rollup",
    (sp, dir) => {
      val prio = pmod(pmod(col("event_id"), lit(2147483647L)) * lit(1103515245L)
        + lit(12345L), lit(2147483647L))
      val ev = Tables(sp, dir, "events")
        .select(col("event_type"), date_trunc("week", col("ts")).as("week"),
          col("user_id"), prio.as("prio"))
      val weekly = ev.groupBy("event_type", "week")
        .agg(count(lit(1)).as("n"),
          graft.functions.SampleSketchAgg(col("user_id"), col("prio"), 10)
            .as("sk"))
      val folded = weekly.groupBy("event_type")
        .agg(sum("n").as("n_events"), count(lit(1)).as("n_sketches"),
          graft.functions.SampleMerge(col("sk")).as("sk"))
      val sampled = folded
        .select(col("event_type"), col("n_events"), col("n_sketches"),
          posexplode(graft.functions.SampleEntries(col("sk"))).as(Seq("pos", "e")))
        .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
          col("e.key").as("user_id"), col("e.priority").as("priority"),
          col("n_events"), col("n_sketches"))
      val counts = Tables(sp, dir, "events")
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("n_user_events"))
      sampled.join(counts, Seq("event_type", "user_id"))
        .select("event_type", "rank", "user_id", "n_user_events",
          "priority", "n_events", "n_sketches")
        .orderBy("event_type", "rank")
    },
    Some("""
      WITH pr AS (
        SELECT event_type, user_id,
          ((event_id % 2147483647) * 1103515245 + 12345) % 2147483647 AS prio
        FROM events),
      mx AS (SELECT event_type, user_id, MAX(prio) AS priority
             FROM pr GROUP BY 1, 2),
      rk AS (SELECT event_type, user_id, priority,
               ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY priority DESC, user_id) AS rank
             FROM mx),
      cnt AS (SELECT event_type, user_id,
                CAST(COUNT(*) AS BIGINT) AS n_user_events
              FROM events GROUP BY 1, 2),
      meta AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(COUNT(DISTINCT DATE_TRUNC('week', ts)) AS BIGINT)
                   AS n_sketches
               FROM events GROUP BY 1)
      SELECT r.event_type, CAST(r.rank AS INT) AS rank, r.user_id,
        c.n_user_events, r.priority, m.n_events, m.n_sketches
      FROM rk r
      JOIN cnt c ON c.event_type = r.event_type AND c.user_id = r.user_id
      JOIN meta m ON m.event_type = r.event_type
      WHERE r.rank <= 10
      ORDER BY r.event_type, r.rank"""))

  /** Semi-structured columns through Spark 4's VARIANT type — the
    * modern engine-native path q16's string-functions approach
    * predates: `parse_json` shreds the JSON once into the binary
    * variant encoding, `variant_get` does typed path extraction
    * (NULL on a missing path, like the SQL standard's lax mode). The
    * variant codec is engine-internal so the ORACLE stays on plain
    * JSON-string extraction — equality of the two pipelines is
    * exactly what certifies the variant path end to end. */
  val q111 = QueryDef(
    "q111_variant_extract",
    (sp, dir) => {
      val v = parse_json(col("props"))
      Tables(sp, dir, "events")
        .select(col("event_type"),
          variant_get(v, "$.k", "bigint").as("k"),
          variant_get(v, "$.missing", "bigint").as("miss"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), max("k").as("max_k"),
          count("k").as("n_with_k"),
          sum(when(col("miss").isNull, 1L).otherwise(0L)).as("n_missing"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
          AS sum_k,
        MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
        CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
      FROM events GROUP BY event_type ORDER BY event_type"""))

  val defs: Seq[QueryDef] =
    Seq(q57, q58, q59, q60, q61, q62, q63, q64, q65, q66, q67, q68,
      q69, q70, q71, q72, q73, q101, q102, q104, q105, q106, q107,
      q108, q109, q110, q111)
}
