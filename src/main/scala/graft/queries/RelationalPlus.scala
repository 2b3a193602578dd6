package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational coverage, fifth block (q74–q77): one-pass correlation
  * matrices, distributed skyline, robust dispersion (MAD), and linear
  * gap interpolation.
  *
  * Determinism: q35's exact-decimal power-sum idiom for every moment
  * statistic; double formulas written IDENTICALLY on both engines;
  * percentile legs ride [[graft.operators.ExactPercentiles]] with
  * round(4) guards at each engine boundary (SURVEY.md §4).
  */
object RelationalPlus {

  /** Pairwise Pearson correlation of three lineitem measures in ONE
    * scan — the multi-column generalization of q35: all nine power
    * sums accumulate as exact decimals in a single aggregate (map-side
    * partials, one-row result), then the three correlations unpivot to
    * (pair, corr) rows. Discount is scaled ×100 BEFORE squaring so the
    * q35 floor-to-integer guard (int128-decimal→double double-rounding
    * differs per engine on fractions) costs nothing: corr is
    * scale-invariant, and the scaled sums are integer-exact. */
  val q74 = QueryDef(
    "q74_corr_matrix",
    (sp, dir) => {
      val q = col("l_quantity").cast(DecimalType(12, 2))
      val p = col("l_extendedprice").cast(DecimalType(12, 2))
      val d = (col("l_discount").cast(DecimalType(12, 2)) * lit(100))
        .cast(DecimalType(12, 2))
      val agg = Tables(sp, dir, "lineitem").agg(
        count(lit(1)).as("n"),
        sum(q).cast(DoubleType).as("s_q"),
        sum(p).cast(DoubleType).as("s_p"),
        sum(d).cast(DoubleType).as("s_d"),
        floor(sum(q * q)).cast(DoubleType).as("s_qq"),
        floor(sum(p * p)).cast(DoubleType).as("s_pp"),
        floor(sum(d * d)).cast(DoubleType).as("s_dd"),
        floor(sum(q * p)).cast(DoubleType).as("s_qp"),
        floor(sum(q * d)).cast(DoubleType).as("s_qd"),
        floor(sum(p * d)).cast(DoubleType).as("s_pd"))
      val n = col("n").cast(DoubleType)
      def corr(sx: String, sy: String, sxx: String, syy: String,
          sxy: String): org.apache.spark.sql.Column =
        try_divide(col(sxy) * n - col(sx) * col(sy),
          sqrt(col(sxx) * n - col(sx) * col(sx)) *
            sqrt(col(syy) * n - col(sy) * col(sy)))
      agg.select(col("n"), explode(array(
          struct(lit("quantity_price").as("pair"),
            corr("s_q", "s_p", "s_qq", "s_pp", "s_qp").as("corr")),
          struct(lit("quantity_discount").as("pair"),
            corr("s_q", "s_d", "s_qq", "s_dd", "s_qd").as("corr")),
          struct(lit("price_discount").as("pair"),
            corr("s_p", "s_d", "s_pp", "s_dd", "s_pd").as("corr"))))
          .as("t"))
        .select(col("t.pair").as("pair"), col("t.corr").as("corr"),
          col("n"))
        .orderBy("pair")
    },
    Some("""
      WITH a AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s_q,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS s_p,
          CAST(SUM(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS DECIMAL(12,2))) AS DOUBLE) AS s_d,
          CAST(floor(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)))) AS DOUBLE) AS s_qq,
          CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)))) AS DOUBLE) AS s_pp,
          CAST(floor(SUM(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS DECIMAL(12,2)) * CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS DECIMAL(12,2)))) AS DOUBLE) AS s_dd,
          CAST(floor(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)))) AS DOUBLE) AS s_qp,
          CAST(floor(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS DECIMAL(12,2)))) AS DOUBLE) AS s_qd,
          CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS DECIMAL(12,2)))) AS DOUBLE) AS s_pd
        FROM lineitem)
      SELECT pair, corr, n FROM (
        SELECT 'quantity_price' AS pair,
          (s_qp * CAST(n AS DOUBLE) - s_q * s_p)
            / (sqrt(s_qq * CAST(n AS DOUBLE) - s_q * s_q)
               * sqrt(s_pp * CAST(n AS DOUBLE) - s_p * s_p)) AS corr, n FROM a
        UNION ALL
        SELECT 'quantity_discount',
          (s_qd * CAST(n AS DOUBLE) - s_q * s_d)
            / (sqrt(s_qq * CAST(n AS DOUBLE) - s_q * s_q)
               * sqrt(s_dd * CAST(n AS DOUBLE) - s_d * s_d)), n FROM a
        UNION ALL
        SELECT 'price_discount',
          (s_pd * CAST(n AS DOUBLE) - s_p * s_d)
            / (sqrt(s_pp * CAST(n AS DOUBLE) - s_p * s_p)
               * sqrt(s_dd * CAST(n AS DOUBLE) - s_d * s_d)), n FROM a)
      ORDER BY pair"""))

  /** Skyline / Pareto frontier over parts: cheapest-for-their-size
    * parts (no other part is both <= price and >= size with one
    * strict). Runs through [[graft.operators.Skyline]]'s two-phase
    * scan — partition-local frontiers, then one merge pass over the
    * tiny survivor set; the fact table is never globally sorted. The
    * oracle is the textbook NOT EXISTS dominance query. */
  val q75 = QueryDef(
    "q75_skyline",
    (sp, dir) => {
      graft.operators.Skyline.frontier(
          Tables(sp, dir, "part"), "p_partkey", "p_retailprice", "p_size")
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("int").as("p_size"))
        .orderBy("p_retailprice", "p_partkey")
    },
    Some("""
      SELECT p_partkey, p_retailprice, p_size FROM part p
      WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      ORDER BY p_retailprice, p_partkey"""))

  /** Median absolute deviation (robust dispersion) per event type:
    * MAD = median(|v − median(v)|), both medians through
    * [[graft.operators.ExactPercentiles.mad]] — four bounded passes
    * that deliberately RE-SCAN the column-pruned parquet projection
    * (a cache-fused variant was built and profiled slower at sf0.1;
    * the operator docstring records the numbers). Bounded two-pass
    * state throughout, q73's path — never `percentile()`'s
    * every-distinct-value buffer. The inner median is rounded to 4
    * decimals ON BOTH ENGINES before the deviations: the engine
    * boundary is crossed once, under a round(4) guard, so the
    * deviation doubles are bit-identical inputs to the outer
    * median. */
  val q76 = QueryDef(
    "q76_mad",
    (sp, dir) => {
      graft.operators.ExactPercentiles.mad(
          Tables(sp, dir, "events"), "event_type", "value",
          bucketWidthV = 16.0, bucketWidthD = 8.0, roundMed = 4)
        .select(col("g").as("event_type"),
          round(col("p_50"), 4).as("mad"), col("n").as("n_events"))
        .orderBy("event_type")
    },
    Some("""
      WITH med AS (
        SELECT event_type, ROUND(quantile_cont(value, 0.5), 4) AS med
        FROM events GROUP BY event_type)
      SELECT e.event_type,
        ROUND(quantile_cont(abs(e.value - m.med), 0.5), 4) AS mad,
        COUNT(*) AS n_events
      FROM events e JOIN med m ON e.event_type = m.event_type
      GROUP BY e.event_type ORDER BY e.event_type"""))

  /** Linear gap interpolation — q62's LOCF twin for numeric series:
    * every third reading is knocked out, then recovered as the
    * time-weighted blend of the nearest non-null neighbors on each
    * side, `pv + (nv − pv) · (t − pt)/(nt − pt)` over microsecond
    * epochs. Leading/trailing gaps (no neighbor on one side) stay
    * null. The prev/next scans are running frames per user — state is
    * one (ts, value) pair per direction, never a buffered group. */
  val q77 = QueryDef(
    "q77_interpolate",
    (sp, dir) => {
      val past = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val future = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      val known = when(col("metric").isNotNull, col("t"))
      val knownV = when(col("metric").isNotNull, col("metric"))
      Tables(sp, dir, "events")
        .filter(col("user_id") < 200)
        .withColumn("metric",
          when(col("event_id") % 3 === 0, lit(null)).otherwise(col("value")))
        .withColumn("t", unix_micros(col("ts")))
        .withColumn("pt", last(known, ignoreNulls = true).over(past))
        .withColumn("pv", last(knownV, ignoreNulls = true).over(past))
        .withColumn("nt", first(known, ignoreNulls = true).over(future))
        .withColumn("nv", first(knownV, ignoreNulls = true).over(future))
        .select(col("user_id"), col("event_id"), col("ts"), col("metric"),
          when(col("metric").isNotNull, col("metric"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((col("t") - col("pt")).cast("double") /
                (col("nt") - col("pt")).cast("double")))
            .as("metric_interp"))
        .orderBy("user_id", "ts", "event_id")
    },
    Some("""
      WITH knocked AS (
        SELECT user_id, event_id, ts, epoch_us(ts) AS t,
          CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS metric
        FROM events WHERE user_id < 200),
      nbr AS (
        SELECT user_id, event_id, ts, metric,
          LAST_VALUE(CASE WHEN metric IS NOT NULL THEN t END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
          LAST_VALUE(CASE WHEN metric IS NOT NULL THEN metric END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
          FIRST_VALUE(CASE WHEN metric IS NOT NULL THEN t END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt,
          FIRST_VALUE(CASE WHEN metric IS NOT NULL THEN metric END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
          t
        FROM knocked)
      SELECT user_id, event_id, ts, metric,
        CASE WHEN metric IS NOT NULL THEN metric
             ELSE pv + (nv - pv) *
               (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) END
          AS metric_interp
      FROM nbr ORDER BY user_id, ts, event_id"""))

  /** Join-skew profile — the pre-flight number every big join needs:
    * per-key row counts on BOTH sides, the per-key output fanout
    * n_left·n_right, and each key's share of the total join output.
    * The hottest keys are exactly the ones q45's salting exists for;
    * this report is how you find them WITHOUT running the join (two
    * count aggregations + a key-level join — never the fanout
    * itself). Top-10 by (fanout desc, key) is a total order, so the
    * limit is deterministic; the scalar total joins back through a
    * derived constant key (q71's idiom — an equi-join the planner
    * keeps a BroadcastHashJoin, not a cross join). */
  val q78 = QueryDef(
    "q78_join_skew",
    (sp, dir) => {
      val le = Tables(sp, dir, "events")
        .groupBy(col("user_id").as("key"))
        .agg(count(lit(1)).as("n_events"))
      val ro = Tables(sp, dir, "orders")
        .groupBy(col("o_custkey").as("key"))
        .agg(count(lit(1)).as("n_orders"))
      val j = le.join(ro, "key")
        .withColumn("fanout", col("n_events") * col("n_orders"))
      val total = j.agg(sum(col("fanout")).as("total"))
        .withColumn("__j", pmod(col("total"), lit(1L)))
      j.withColumn("__j", pmod(col("fanout"), lit(1L)))
        .join(broadcast(total), "__j").drop("__j")
        .select(col("key"), col("n_events"), col("n_orders"), col("fanout"),
          (col("fanout").cast(DoubleType) / col("total").cast(DoubleType))
            .as("share"))
        .orderBy(col("fanout").desc, col("key")).limit(10)
    },
    Some("""
      WITH le AS (SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n_events
                  FROM events GROUP BY user_id),
      ro AS (SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n_orders
             FROM orders GROUP BY o_custkey),
      j AS (SELECT key, n_events, n_orders,
              n_events * n_orders AS fanout
            FROM le JOIN ro USING (key)),
      t AS (SELECT CAST(SUM(fanout) AS BIGINT) AS total FROM j)
      SELECT key, n_events, n_orders, CAST(fanout AS BIGINT) AS fanout,
        CAST(fanout AS DOUBLE) / CAST(total AS DOUBLE) AS share
      FROM j, t ORDER BY fanout DESC, key LIMIT 10"""))

  /** Cumulative (expanding-window) OLS regression slope of value on
    * time, per user — "is this metric trending, as of each event".
    * The five running sums (n, Σd, Σv, Σdv, Σd²) are each one running
    * frame; days are integer offsets (≤ ~2·10⁴, so Σd² stays exactly
    * double-representable) and Σv/Σdv accumulate in DECIMAL — the
    * slope formula then runs in doubles IDENTICALLY on both engines.
    * try_divide: a user's prefix with zero time variance (all events
    * same day) has no slope — NULL, not an ANSI error. Partitions are
    * per-user (high cardinality) — never a low-cardinality window. */
  val q79 = QueryDef(
    "q79_rolling_slope",
    (sp, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val base = Tables(sp, dir, "events")
        .filter(col("user_id") < 100)
        .withColumn("d", expr("unix_micros(ts) div 86400000000"))
        .withColumn("vDec", col("value").cast(DecimalType(18, 2)))
      val n = count(lit(1)).over(w).cast(DoubleType)
      val sd = sum(col("d")).over(w).cast(DoubleType)
      val sv = sum(col("vDec")).over(w).cast(DoubleType)
      val sdv = sum(col("vDec") * col("d")).over(w).cast(DoubleType)
      val sdd = sum(col("d") * col("d")).over(w).cast(DoubleType)
      base.select(col("user_id"), col("event_id"), col("ts"),
          try_divide(sdv * n - sd * sv, sdd * n - sd * sd).as("slope"))
        .orderBy("user_id", "ts", "event_id")
    },
    Some("""
      WITH b AS (
        SELECT user_id, event_id, ts,
          epoch_us(ts) // 86400000000 AS d,
          CAST(value AS DECIMAL(18,2)) AS v
        FROM events WHERE user_id < 100),
      s AS (
        SELECT user_id, event_id, ts,
          CAST(COUNT(*) OVER w AS DOUBLE) AS n,
          CAST(SUM(d) OVER w AS DOUBLE) AS sd,
          CAST(SUM(v) OVER w AS DOUBLE) AS sv,
          CAST(SUM(v * d) OVER w AS DOUBLE) AS sdv,
          CAST(SUM(d * d) OVER w AS DOUBLE) AS sdd
        FROM b
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT user_id, event_id, ts,
        CASE WHEN sdd * n - sd * sd = 0 THEN NULL
             ELSE (sdv * n - sd * sv) / (sdd * n - sd * sd) END AS slope
      FROM s ORDER BY user_id, ts, event_id"""))

  /** KMV sketch ALGEBRA — union and intersection estimates between two
    * key sets from their mergeable sketches (q71 built one sketch;
    * this is why sketches exist: set operations without re-scanning
    * either side). A = partkeys shipped 'R', B = shipped 'A'.
    * |A∪B| from the merged sketch's k-th minimum; |A∩B| = ĵ·|A∪B|
    * with ĵ = (members of the merged top-k present in both sides)/k.
    * Every sketch datum is an exact integer (q71's LCG hash), so both
    * engines replay the whole pipeline bit-for-bit; exact
    * countDistinct values ride along as the error report. */
  val q80 = QueryDef(
    "q80_kmv_setops",
    (sp, dir) => {
      val P = 2147483647L
      val li = Tables(sp, dir, "lineitem")
      def h(c: org.apache.spark.sql.Column) =
        pmod(pmod(c, lit(P)) * lit(1103515245L) + lit(12345L), lit(P))
      def hashes(flag: String) =
        li.filter(col("l_returnflag") === flag)
          .select(h(col("l_partkey")).as("h")).distinct()
      val ha = hashes("R")
      val hb = hashes("A")
      val k = 64
      val topU = ha.unionAll(hb).distinct().orderBy("h").limit(k)
      val shared = topU.join(ha, "h").join(hb, "h")
        .agg(count(lit(1)).as("n_shared"))
        .withColumn("__j", pmod(col("n_shared"), lit(1L)))
      val sketch = topU.agg(count(lit(1)).as("k_used"), max(col("h")).as("h_k"))
        .withColumn("__j", pmod(col("k_used"), lit(1L)))
      val exact = li.filter(col("l_returnflag").isin("R", "A"))
        .agg(
          countDistinct(when(col("l_returnflag") === "R", col("l_partkey")))
            .as("n_a_exact"),
          countDistinct(when(col("l_returnflag") === "A", col("l_partkey")))
            .as("n_b_exact"),
          countDistinct(col("l_partkey")).as("n_union_exact"))
        .withColumn("__j", pmod(col("n_union_exact"), lit(1L)))
      exact.join(broadcast(sketch), "__j").join(broadcast(shared), "__j")
        .drop("__j")
        .withColumn("est_union",
          ((col("k_used") - 1) * lit(P)).cast(DoubleType) /
            greatest(col("h_k"), lit(1L)).cast(DoubleType))
        .withColumn("est_intersection",
          (col("n_shared").cast(DoubleType) / col("k_used").cast(DoubleType)) *
            (((col("k_used") - 1) * lit(P)).cast(DoubleType) /
              greatest(col("h_k"), lit(1L)).cast(DoubleType)))
    },
    Some("""
      WITH ha AS (SELECT DISTINCT
          ((l_partkey % 2147483647) * 1103515245 + 12345) % 2147483647 AS h
        FROM lineitem WHERE l_returnflag = 'R'),
      hb AS (SELECT DISTINCT
          ((l_partkey % 2147483647) * 1103515245 + 12345) % 2147483647 AS h
        FROM lineitem WHERE l_returnflag = 'A'),
      topu AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
               ORDER BY h LIMIT 64),
      sk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
               CAST(MAX(h) AS BIGINT) AS h_k FROM topu),
      shr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_shared
              FROM topu JOIN ha USING (h) JOIN hb USING (h)),
      ex AS (SELECT
          CAST(COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
            THEN l_partkey END) AS BIGINT) AS n_a_exact,
          CAST(COUNT(DISTINCT CASE WHEN l_returnflag = 'A'
            THEN l_partkey END) AS BIGINT) AS n_b_exact,
          CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_union_exact
        FROM lineitem WHERE l_returnflag IN ('R', 'A'))
      SELECT n_a_exact, n_b_exact, n_union_exact, k_used, h_k, n_shared,
        CAST((k_used - 1) * 2147483647 AS DOUBLE) / CAST(GREATEST(h_k, 1) AS DOUBLE)
          AS est_union,
        (CAST(n_shared AS DOUBLE) / CAST(k_used AS DOUBLE)) *
          (CAST((k_used - 1) * 2147483647 AS DOUBLE) / CAST(GREATEST(h_k, 1) AS DOUBLE))
          AS est_intersection
      FROM ex, sk, shr"""))

  /** Lag-1 autocorrelation per event type — "does this metric's next
    * reading depend on its last": consecutive (prev, cur) value pairs
    * form WITHIN a user's ordered series (the lag window partitions on
    * the high-cardinality (user, type) key, never the 5-value type),
    * then one q35-style exact-decimal power-sum aggregate per type
    * computes Pearson r over all pairs. Floor-to-integer guards on the
    * product sums (the int128-decimal→double conversion quirk, §4). */
  val q81 = QueryDef(
    "q81_autocorr",
    (sp, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables(sp, dir, "events")
        .withColumn("prev", lag(col("value"), 1).over(w))
        .filter(col("prev").isNotNull)
      val x = col("prev").cast(DecimalType(12, 2))
      val y = col("value").cast(DecimalType(12, 2))
      val agg = pairs.groupBy("event_type").agg(
        count(lit(1)).as("n_pairs"),
        sum(x).cast(DoubleType).as("sx"),
        sum(y).cast(DoubleType).as("sy"),
        floor(sum(x * x)).cast(DoubleType).as("sxx"),
        floor(sum(y * y)).cast(DoubleType).as("syy"),
        floor(sum(x * y)).cast(DoubleType).as("sxy"))
      val n = col("n_pairs").cast(DoubleType)
      agg.select(col("event_type"), col("n_pairs"),
          try_divide(col("sxy") * n - col("sx") * col("sy"),
            sqrt(col("sxx") * n - col("sx") * col("sx")) *
              sqrt(col("syy") * n - col("sy") * col("sy"))).as("acf1"))
        .orderBy("event_type")
    },
    Some("""
      WITH p AS (
        SELECT event_type,
          LAG(value) OVER (PARTITION BY user_id, event_type
            ORDER BY ts, event_id) AS prev,
          value
        FROM events),
      f AS (SELECT event_type,
              CAST(prev AS DECIMAL(12,2)) AS x,
              CAST(value AS DECIMAL(12,2)) AS y
            FROM p WHERE prev IS NOT NULL),
      a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
              CAST(SUM(x) AS DOUBLE) AS sx,
              CAST(SUM(y) AS DOUBLE) AS sy,
              CAST(floor(SUM(x * x)) AS DOUBLE) AS sxx,
              CAST(floor(SUM(y * y)) AS DOUBLE) AS syy,
              CAST(floor(SUM(x * y)) AS DOUBLE) AS sxy
            FROM f GROUP BY event_type)
      SELECT event_type, n_pairs,
        (sxy * CAST(n_pairs AS DOUBLE) - sx * sy)
          / (sqrt(sxx * CAST(n_pairs AS DOUBLE) - sx * sx)
             * sqrt(syy * CAST(n_pairs AS DOUBLE) - sy * sy)) AS acf1
      FROM a ORDER BY event_type"""))

  /** ROLLUP with grouping_id — the disambiguation q10 left implicit: a
    * NULL in a rollup row is ambiguous (real NULL data vs subtotal
    * marker) until grouping_id says which levels are aggregated. The
    * bit mask (leftmost grouping column = most significant bit) is
    * engine-portable, and the oracle's GROUPING(a, b) must agree
    * bit-for-bit on every total/subtotal/detail row. */
  val q82 = QueryDef(
    "q82_grouping_id",
    (sp, dir) => {
      import graft.Dsl.moneySum
      Tables(sp, dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(expr("grouping_id()").cast("long").as("gid"),
          count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("gid"), col("o_orderpriority"), col("o_orderstatus"))
    },
    Some("""
      SELECT o_orderpriority, o_orderstatus,
        CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      ORDER BY gid, o_orderpriority, o_orderstatus"""))

  /** Decile lift/gains table — "the top 10% of customers carry X% of
    * revenue": customers decile by total spend through the
    * DISTRIBUTED exact ntile (`Pipeline.distributedNtile` — the
    * global rank never sorts in one task), then per decile the
    * revenue share and the top-down cumulative share. The cumulative
    * window runs over the 10-row decile frame only. Shares divide
    * exact decimal sums as doubles, identically on both engines. */
  val q83 = QueryDef(
    "q83_decile_lift",
    (sp, dir) => {
      val spend = Tables(sp, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("spend"))
      val tiled = graft.operators.Pipeline.distributedNtile(
        spend.withColumn("spend_d", col("spend").cast(DoubleType)),
        n = 10, orderCol = "spend_d", tieCol = "o_custkey")
      val perDecile = tiled.groupBy(col("ntile").as("decile"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("spend")).as("rev_dec"))
      val w = Window.partitionBy(pmod(col("n_customers"), lit(1L)))
        .orderBy(col("decile").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(pmod(col("n_customers"), lit(1L)))
      perDecile
        .withColumn("revenue", col("rev_dec").cast(DoubleType))
        .withColumn("share", col("rev_dec").cast(DoubleType) /
          sum(col("rev_dec")).over(tot).cast(DoubleType))
        .withColumn("cum_share_from_top",
          sum(col("rev_dec")).over(w).cast(DoubleType) /
            sum(col("rev_dec")).over(tot).cast(DoubleType))
        .select("decile", "n_customers", "revenue", "share",
          "cum_share_from_top")
        .orderBy("decile")
    },
    Some("""
      WITH spend AS (
        SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        FROM orders GROUP BY o_custkey),
      tiled AS (
        SELECT o_custkey, spend,
          NTILE(10) OVER (ORDER BY CAST(spend AS DOUBLE), o_custkey)
            AS decile
        FROM spend),
      d AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
              SUM(spend) AS rev_dec
            FROM tiled GROUP BY decile)
      SELECT decile, n_customers,
        CAST(rev_dec AS DOUBLE) AS revenue,
        CAST(rev_dec AS DOUBLE) / CAST(SUM(rev_dec) OVER () AS DOUBLE)
          AS share,
        CAST(SUM(rev_dec) OVER (ORDER BY decile DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          / CAST(SUM(rev_dec) OVER () AS DOUBLE) AS cum_share_from_top
      FROM d ORDER BY decile"""))

  /** Top-k WITH TIES — rank() keeps every row tied at the boundary,
    * so "top 3 order priorities' orders per status" can return MORE
    * than 3 groups' worth when counts tie: the SQL-standard FETCH
    * FIRST WITH TIES semantics, distinct from q21's row_number cutoff
    * (which breaks ties arbitrarily unless the order is total). Tie
    * groups here are (status, count) collisions — real and data-
    * dependent, which is exactly what the hash-match certifies. */
  val q84 = QueryDef(
    "q84_topk_with_ties",
    (sp, dir) => {
      val counts = Tables(sp, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("n_orders").desc)
      counts.withColumn("rk", rank().over(w))
        .filter(col("rk") <= 3)
        .orderBy("o_orderstatus", "rk", "o_orderpriority")
    },
    Some("""
      WITH c AS (
        SELECT o_orderstatus, o_orderpriority,
          CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_orderstatus, o_orderpriority),
      r AS (SELECT o_orderstatus, o_orderpriority, n_orders,
              CAST(RANK() OVER (PARTITION BY o_orderstatus
                ORDER BY n_orders DESC) AS INT) AS rk
            FROM c)
      SELECT o_orderstatus, o_orderpriority, n_orders, rk
      FROM r WHERE rk <= 3
      ORDER BY o_orderstatus, rk, o_orderpriority"""))

  /** Interval UNION (coverage) per user — "how much wall-clock was
    * this user active", counting overlapping activity windows ONCE:
    * every event opens a 15-minute interval; overlapping/touching
    * intervals merge into islands (start > running max of prior ends
    * ⇒ new island), and the measure is Σ island lengths. The running
    * max and the island-id cumsum both partition on the
    * high-cardinality user key. Complements q57 (how MANY concurrent)
    * and q23 (gap sessions): this is the measure-theoretic union
    * length. All integer millisecond arithmetic. */
  val q85 = QueryDef(
    "q85_interval_union",
    (sp, dir) => {
      val iv = Tables(sp, dir, "events")
        .filter(col("user_id") < 300)
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts")).as("s"),
          (unix_millis(col("ts")) + lit(15L * 60 * 1000)).as("e"))
      val ord = Window.partitionBy("user_id")
        .orderBy(col("s"), col("event_id"))
      val prevMax = max(col("e")).over(ord.rowsBetween(
        Window.unboundedPreceding, -1))
      val flagged = iv
        .withColumn("new_island",
          when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      val tagged = flagged.withColumn("island",
        sum(col("new_island")).over(ord.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      tagged.groupBy("user_id", "island")
        .agg(min(col("s")).as("is"), max(col("e")).as("ie"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          sum(col("ie") - col("is")).as("covered_ms"))
        .orderBy("user_id")
    },
    Some("""
      WITH iv AS (
        SELECT user_id, event_id, epoch_ms(ts) AS s,
          epoch_ms(ts) + 900000 AS e
        FROM events WHERE user_id < 300),
      f AS (
        SELECT user_id, event_id, s, e,
          CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                 OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS new_island
        FROM iv),
      t AS (
        SELECT user_id, s, e,
          SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM f),
      isl AS (SELECT user_id, island, MIN(s) AS i_s, MAX(e) AS i_e
              FROM t GROUP BY user_id, island)
      SELECT user_id, COUNT(*) AS n_islands,
        CAST(SUM(i_e - i_s) AS BIGINT) AS covered_ms
      FROM isl GROUP BY user_id ORDER BY user_id"""))

  /** Exact weighted median — price per returnflag weighted by
    * quantity ("the price point where half the UNITS sit below") —
    * via [[graft.operators.ExactPercentiles.weightedMedian]]'s
    * bounded histogram path: per-bucket weight sums, integer `2·cum ≥
    * W` crossing test, one target bucket re-scanned. The oracle
    * states the definition directly with a full cumulative window —
    * fine for DuckDB at oracle scale, the thing the bucketed form
    * exists to avoid at 100 TB. */
  val q86 = QueryDef(
    "q86_weighted_median",
    (sp, dir) => {
      graft.operators.ExactPercentiles.weightedMedian(
          Tables(sp, dir, "lineitem"), "l_returnflag",
          "l_extendedprice", "l_quantity", bucketWidth = 1024.0)
        .select(col("g").as("l_returnflag"), col("wmedian"),
          col("total_weight"))
        .orderBy("l_returnflag")
    },
    Some("""
      WITH b AS (
        SELECT l_returnflag AS g, l_extendedprice AS v,
          CAST(l_quantity AS BIGINT) AS w
        FROM lineitem),
      tot AS (SELECT g, CAST(SUM(w) AS BIGINT) AS total_weight
              FROM b GROUP BY g),
      cum AS (SELECT g, v,
                SUM(w) OVER (PARTITION BY g ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
              FROM b)
      SELECT c.g AS l_returnflag, MIN(c.v) AS wmedian, t.total_weight
      FROM cum c JOIN tot t ON c.g = t.g
      WHERE 2 * c.cw >= t.total_weight
      GROUP BY c.g, t.total_weight ORDER BY l_returnflag"""))

  /** First/last-touch revenue attribution — the marketing-analytics
    * split q63's funnel doesn't do: each purchase's value divides
    * 50/50 between the user's FIRST and LAST click in the prior 24 h
    * (100% when they're the same click), and attributed revenue rolls
    * up by the click's hour-of-day. The candidate join is an
    * equi-join on the high-cardinality user key with a time-band
    * filter; first/last click per purchase are `min/max(struct(ts,
    * id))` — map-side combinable, no per-purchase sort. The 50%
    * split stays EXACT: DECIMAL(18,2) × 0.5 is a scale-3 decimal,
    * no rounding on either engine. */
  val q87 = QueryDef(
    "q87_touch_attribution",
    (sp, dir) => {
      val ev = Tables(sp, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          unix_millis(col("ts")).as("p_ms"),
          col("value").cast(DecimalType(18, 2)).as("rev"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"),
          unix_millis(col("ts")).as("c_ms"),
          hour(col("ts")).as("c_hour"))
      val half = lit(new java.math.BigDecimal("0.5"))
        .cast(DecimalType(2, 1))
      val attributed = purchases.join(clicks, Seq("user_id"))
        .filter(col("c_ms") >= col("p_ms") - lit(86400000L) &&
          col("c_ms") < col("p_ms"))
        .groupBy("user_id", "p_id", "rev")
        .agg(min(struct(col("c_ms"), col("c_id"), col("c_hour")))
            .as("first_c"),
          max(struct(col("c_ms"), col("c_id"), col("c_hour")))
            .as("last_c"))
      val shares = attributed.select(col("rev"),
          col("first_c.c_hour").as("f_hour"),
          col("last_c.c_hour").as("l_hour"),
          (col("first_c.c_id") === col("last_c.c_id")).as("same"))
      val firstLeg = shares.select(col("f_hour").as("click_hour"),
        when(col("same"), col("rev").cast(DecimalType(19, 3)))
          .otherwise((col("rev") * half).cast(DecimalType(19, 3)))
          .as("attr"))
      val lastLeg = shares.filter(!col("same"))
        .select(col("l_hour").as("click_hour"),
          (col("rev") * half).cast(DecimalType(19, 3)).as("attr"))
      firstLeg.unionByName(lastLeg)
        .groupBy("click_hour")
        .agg(count(lit(1)).as("n_legs"),
          // corpus-level revenue per hour: round the exact scale-3 sum
          // to money grain before the double cast (the 2^53 cliff rule,
          // Dsl.revSum's discipline — enforced catalog-wide by the
          // PlanAuditSpec decimal-cliff sweep)
          round(sum(col("attr")), 2).cast(DoubleType).as("attributed_rev"))
        .orderBy("click_hour")
    },
    Some("""
      WITH p AS (
        SELECT user_id, event_id AS p_id, epoch_ms(ts) AS p_ms,
          CAST(value AS DECIMAL(18,2)) AS rev
        FROM events WHERE event_type = 'purchase'),
      c AS (
        SELECT user_id, event_id AS c_id, epoch_ms(ts) AS c_ms,
          CAST(EXTRACT(hour FROM ts) AS INT) AS c_hour
        FROM events WHERE event_type = 'click'),
      cand AS (
        SELECT p.user_id, p.p_id, p.rev, c.c_id, c.c_ms, c.c_hour
        FROM p JOIN c ON p.user_id = c.user_id
        WHERE c.c_ms >= p.p_ms - 86400000 AND c.c_ms < p.p_ms),
      attr AS (
        SELECT user_id, p_id, rev,
          MIN(struct_pack(c_ms := c_ms, c_id := c_id, c_hour := c_hour))
            AS first_c,
          MAX(struct_pack(c_ms := c_ms, c_id := c_id, c_hour := c_hour))
            AS last_c
        FROM cand GROUP BY user_id, p_id, rev),
      shares AS (
        SELECT rev,
          first_c['c_hour'] AS f_hour, last_c['c_hour'] AS l_hour,
          first_c['c_id'] = last_c['c_id'] AS same
        FROM attr),
      legs AS (
        SELECT f_hour AS click_hour,
          CASE WHEN same THEN CAST(rev AS DECIMAL(19,3))
               ELSE CAST(rev * CAST(0.5 AS DECIMAL(2,1)) AS DECIMAL(19,3))
          END AS attr
        FROM shares
        UNION ALL
        SELECT l_hour,
          CAST(rev * CAST(0.5 AS DECIMAL(2,1)) AS DECIMAL(19,3))
        FROM shares WHERE NOT same)
      SELECT click_hour, COUNT(*) AS n_legs,
        CAST(ROUND(SUM(attr), 2) AS DOUBLE) AS attributed_rev
      FROM legs GROUP BY click_hour ORDER BY click_hour"""))

  /** IQR outlier fences per event type — the Tukey box-plot gate:
    * p25/p75 from [[graft.operators.ExactPercentiles]] (bounded
    * two-pass state), fences at ±1.5·IQR, then one more scan counts
    * the rows outside. The quartiles cross the engine boundary under
    * the round(4) guard (q76's discipline), so the fence doubles are
    * bit-identical inputs to the comparison on both engines. */
  val q88 = QueryDef(
    "q88_iqr_outliers",
    (sp, dir) => {
      val ev = Tables(sp, dir, "events")
      val fences = graft.operators.ExactPercentiles.compute(
          ev, "event_type", "value", Seq(("25", 0.25), ("75", 0.75)),
          bucketWidth = 16.0)
        .select(col("g").as("event_type"),
          round(col("p_25"), 4).as("p25"), round(col("p_75"), 4).as("p75"))
        .withColumn("lo", col("p25") - lit(1.5) * (col("p75") - col("p25")))
        .withColumn("hi", col("p75") + lit(1.5) * (col("p75") - col("p25")))
      ev.join(broadcast(fences), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          min(col("p25")).as("p25"), min(col("p75")).as("p75"),
          sum(when(col("value") < col("lo") || col("value") > col("hi"),
            1L).otherwise(0L)).as("n_outliers"))
        .withColumn("outlier_share",
          col("n_outliers").cast(DoubleType) / col("n_events").cast(DoubleType))
        .orderBy("event_type")
    },
    Some("""
      WITH f AS (
        SELECT event_type,
          ROUND(quantile_cont(value, 0.25), 4) AS p25,
          ROUND(quantile_cont(value, 0.75), 4) AS p75
        FROM events GROUP BY event_type),
      g AS (SELECT event_type, p25, p75,
              p25 - 1.5 * (p75 - p25) AS lo,
              p75 + 1.5 * (p75 - p25) AS hi
            FROM f)
      SELECT e.event_type, COUNT(*) AS n_events,
        MIN(g.p25) AS p25, MIN(g.p75) AS p75,
        CAST(SUM(CASE WHEN e.value < g.lo OR e.value > g.hi
          THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        CAST(SUM(CASE WHEN e.value < g.lo OR e.value > g.hi
          THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS outlier_share
      FROM events e JOIN g ON e.event_type = g.event_type
      GROUP BY e.event_type ORDER BY e.event_type"""))

  /** CUSUM drift statistic per user — the classic upward
    * change-detector S_t = max(0, S_{t−1} + (x_t − target)), target =
    * the user's own mean. The recurrence is NOT associative (the
    * clamp), so no window/prefix decomposition exists — it rides
    * q54's bit-reproducible ordered-fold idiom instead: collect the
    * user's (bounded) series, sort, fold left. The mean crosses into
    * the fold under a round(4) guard so both engines fold identical
    * doubles. Group state is one user's events — the per-key-bounded
    * collect the EWMA entry already established. */
  val q89 = QueryDef(
    "q89_cusum_drift",
    (sp, dir) => {
      val base = Tables(sp, dir, "events").filter(col("user_id") < 200)
      val means = base.groupBy("user_id")
        .agg((sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("mu_raw"))
        .select(col("user_id"), round(col("mu_raw"), 4).as("mu"))
      base.join(broadcast(means), "user_id")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), min(col("mu")).as("mean_value"),
          aggregate(
            transform(
              array_sort(collect_list(struct(col("ts"), col("event_id"),
                col("value"), col("mu")))),
              s => struct(s.getField("value").as("v"),
                s.getField("mu").as("m"))),
            lit(0.0),
            (acc, x) => greatest(lit(0.0),
              acc + (x.getField("v") - x.getField("m")))).as("cusum_end"))
        .orderBy("user_id")
    },
    Some("""
      WITH mu AS (
        SELECT user_id,
          ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE), 4) AS mu
        FROM events WHERE user_id < 200 GROUP BY user_id)
      SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        MIN(m.mu) AS mean_value,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list(value - m.mu ORDER BY ts, event_id)),
          (a, b) -> greatest(CAST(0.0 AS DOUBLE), a + b)) AS cusum_end
      FROM events e JOIN mu m ON e.user_id = m.user_id
      WHERE e.user_id < 200
      GROUP BY e.user_id ORDER BY e.user_id"""))

  /** FORWARD as-of join — time-to-conversion: each click gets its
    * user's NEXT purchase at-or-after it. No new operator: forward
    * as-of is backward as-of on NEGATED time, so the same
    * union+running-window machinery (one shuffle, q24's) serves both
    * directions — the composability the operator was designed for.
    * Tie rule inherited: among purchases at the same instant, the max
    * (event_id, ts) payload wins, mirrored in the oracle's
    * (p_ts ASC, p_id DESC) pick. */
  val q90 = QueryDef(
    "q90_forward_asof",
    (sp, dir) => {
      import graft.operators.AsOfJoin
      val ev = Tables(sp, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("nts", -unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("nts", -unix_micros(col("ts")))
      AsOfJoin.leftAsOf(clicks, purchases, "user_id", "nts",
          Map("event_id" -> "purchase_event_id", "ts" -> "purchase_ts"))
        .select(col("event_id"), col("user_id"), col("purchase_event_id"),
          (unix_millis(col("purchase_ts")) - unix_millis(col("ts")))
            .as("ms_to_purchase"))
        .orderBy("event_id")
    },
    Some("""
      WITH c AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'click'),
      p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
            WHERE event_type = 'purchase'),
      cand AS (SELECT c.event_id, c.user_id, c.ts, p.p_id, p.p_ts
               FROM c JOIN p ON c.user_id = p.user_id AND p.p_ts >= c.ts),
      r AS (SELECT event_id, p_id, p_ts,
              ROW_NUMBER() OVER (PARTITION BY event_id
                ORDER BY p_ts ASC, p_id DESC) AS rn
            FROM cand)
      SELECT c.event_id, c.user_id, r.p_id AS purchase_event_id,
        epoch_ms(r.p_ts) - epoch_ms(c.ts) AS ms_to_purchase
      FROM c LEFT JOIN r ON r.event_id = c.event_id AND r.rn = 1
      ORDER BY c.event_id"""))

  /** Rolling 7-day distinct actives (DAU/WAU) — THE product metric,
    * and an exact sliding COUNT(DISTINCT), which no window frame can
    * express directly: each (user, active-day) pair is EXPLODED into
    * the 7 window-ends it supports (bounded 7× fanout of the deduped
    * pairs — not of the events), then one countDistinct per day. No
    * per-day state ever holds more than that day's contributing
    * users; contrast q60's set-frame variant over raw event rows. */
  val q91 = QueryDef(
    "q91_rolling_actives",
    (sp, dir) => {
      val userDays = Tables(sp, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val dau = userDays.groupBy("day")
        .agg(countDistinct(col("user_id")).as("dau"))
      val wau = userDays
        .select(col("user_id"), explode(sequence(lit(0), lit(6))).as("i"),
          col("day"))
        .select(col("user_id"), expr("date_add(day, i)").as("day"))
        .groupBy("day").agg(countDistinct(col("user_id")).as("wau7"))
      dau.join(wau, "day")
        .select("day", "dau", "wau7")
        .orderBy("day")
    },
    Some("""
      WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                  FROM events),
      dau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
              FROM ud GROUP BY day),
      expl AS (SELECT user_id, day + CAST(i AS INT) AS day_w
               FROM ud, unnest(generate_series(0, 6)) AS t(i)),
      wau AS (SELECT day_w, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau7
              FROM expl GROUP BY day_w)
      SELECT d.day, d.dau, w.wau7
      FROM dau d JOIN wau w ON w.day_w = d.day
      ORDER BY d.day"""))

  /** 2-D histogram (the heatmap feed): lineitem binned on quantity ×
    * price bands in one aggregation — grid cells are exact integer
    * bucket pairs, counts and decimal revenue per cell. Only occupied
    * cells materialize (sparse grid), and the shuffle key is the
    * 2-tuple of SMALL integers, never the measures. */
  val q92 = QueryDef(
    "q92_histogram_2d",
    (sp, dir) => {
      import graft.Dsl.moneySum
      Tables(sp, dir, "lineitem")
        .select(floor(col("l_quantity") / 10).cast("long").as("qty_band"),
          floor(col("l_extendedprice") / 10000).cast("long").as("price_band"),
          col("l_extendedprice"))
        .groupBy("qty_band", "price_band")
        .agg(count(lit(1)).as("n_items"),
          moneySum(col("l_extendedprice")).as("sum_price"))
        .orderBy("qty_band", "price_band")
    },
    Some("""
      SELECT CAST(floor(l_quantity / 10) AS BIGINT) AS qty_band,
        CAST(floor(l_extendedprice / 10000) AS BIGINT) AS price_band,
        COUNT(*) AS n_items,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price
      FROM lineitem GROUP BY 1, 2 ORDER BY qty_band, price_band"""))

  /** Exact weighted percentiles — q86's weighted median generalized
    * from the 0.5 point to the full rank family (quartiles + p90 of
    * price weighted by units) via [[graft.operators.ExactPercentiles
    * .weightedPercentiles]]: ONE bounded weight histogram per group
    * serves all four ranks, each crossing decided by the integer
    * `den·cum ≥ num·W` test (ranks are RATIONALS, so no double
    * threshold exists anywhere), and only the crossing buckets are
    * re-scanned. The oracle states each rank directly with filtered
    * MIN over a full cumulative window — fine for DuckDB at oracle
    * scale, the thing the bucketed form exists to avoid at 100 TB. */
  val q93 = QueryDef(
    "q93_weighted_percentiles",
    (sp, dir) => {
      graft.operators.ExactPercentiles.weightedPercentiles(
          Tables(sp, dir, "lineitem"), "l_returnflag",
          "l_extendedprice", "l_quantity",
          Seq(("25", 1, 4), ("50", 1, 2), ("75", 3, 4), ("90", 9, 10)),
          bucketWidth = 1024.0)
        .select(col("g").as("l_returnflag"), col("total_weight"),
          col("p_25"), col("p_50"), col("p_75"), col("p_90"))
        .orderBy("l_returnflag")
    },
    Some("""
      WITH b AS (
        SELECT l_returnflag AS g, l_extendedprice AS v,
          CAST(l_quantity AS BIGINT) AS w
        FROM lineitem),
      tot AS (SELECT g, CAST(SUM(w) AS BIGINT) AS total_weight
              FROM b GROUP BY g),
      cum AS (SELECT g, v,
                SUM(w) OVER (PARTITION BY g ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
              FROM b)
      SELECT c.g AS l_returnflag, t.total_weight,
        MIN(c.v) FILTER (WHERE 4 * c.cw >= 1 * t.total_weight) AS p_25,
        MIN(c.v) FILTER (WHERE 2 * c.cw >= 1 * t.total_weight) AS p_50,
        MIN(c.v) FILTER (WHERE 4 * c.cw >= 3 * t.total_weight) AS p_75,
        MIN(c.v) FILTER (WHERE 10 * c.cw >= 9 * t.total_weight) AS p_90
      FROM cum c JOIN tot t ON c.g = t.g
      GROUP BY c.g, t.total_weight ORDER BY l_returnflag"""))

  /** Sliding-window aggregate join (point-in-time feature join): for
    * each purchase, the count and exact-decimal sum of the same user's
    * clicks in the trailing hour — via [[graft.operators.SlidingJoin]]
    * (tagged union + time-RANGE frame, NO join, no pair
    * materialization; one shuffle on user_id). The oracle is the
    * semantically equivalent LEFT band join + GROUP BY; unmatched
    * purchases keep COUNT 0 and SUM NULL on both engines. Sum
    * accumulates as DECIMAL(18,2) and crosses to double only at the
    * boundary (SURVEY.md §4). */
  /** q94/q97's shared body — both plans MUST stay the same feature
    * shape so the one oracle keeps proving them equivalent. */
  private def slidingClickFeatures(sp: org.apache.spark.sql.SparkSession,
      dir: String, chunkMs: Option[Long]): org.apache.spark.sql.DataFrame = {
    val ev = Tables(sp, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("value").cast(DecimalType(18, 2)).as("click_value"))
    graft.operators.SlidingJoin.trailingAgg(
        purchases, clicks, "user_id", "ts", 3600000L,
        Seq(
          graft.operators.SlidingJoin.Agg(
            "count", "click_value", "click_cnt"),
          graft.operators.SlidingJoin.Agg(
            "sum", "click_value", "click_sum_dec")),
        chunkMs = chunkMs)
      .select(col("event_id"), col("user_id"), col("click_cnt"),
        col("click_sum_dec").cast(DoubleType).as("click_sum"))
      .orderBy("event_id")
  }

  val q94 = QueryDef(
    "q94_sliding_agg_join",
    (sp, dir) => slidingClickFeatures(sp, dir, chunkMs = None),
    Some("""
      SELECT p.event_id, p.user_id,
        COUNT(c.value) AS click_cnt,
        CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS click_sum
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id
        AND epoch_ms(c.ts) BETWEEN epoch_ms(p.ts) - 3600000
                               AND epoch_ms(p.ts)
      GROUP BY p.event_id, p.user_id
      ORDER BY p.event_id"""))

  /** PageRank centrality over the customer↔supplier purchase graph
    * (orders ⋈ lineitem, symmetrized so the walk has no dangling
    * nodes), 10 iterations at damping 17/20 — web-graph centrality is
    * the standard quality-weighting signal in large-corpus pipelines.
    * Every arithmetic step is INTEGER: ranks live in 10⁻¹²
    * fixed-point, per-node contributions and the damping blend use
    * floor division (`DIV` / DuckDB `//`, positive operands so both
    * truncate identically), so 10 iterations stay bit-identical on
    * both engines and the oracle replays them as 10 unrolled CTEs.
    * Node ids pack as 2·custkey / 2·suppkey+1.
    *
    * Scale shape: the Pregel-style iterate — per-iteration (join
    * contributions to edges on src, groupBy dst) — two hash shuffles
    * per iteration, state one row per node. The edge/degree subtrees
    * repeat identically across iterations, so ReuseExchange
    * materializes them once; a production run at web scale would
    * checkpoint the edge list and pre-partition it by src so every
    * iteration's join reuses the layout ([[graft.operators
    * .Components]] demonstrates the checkpoint discipline). */
  val q95 = QueryDef(
    "q95_pagerank",
    (sp, dir) => {
      val Q = 1000000000000L
      val cs = Tables(sp, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables(sp, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("cv"),
          (col("l_suppkey") * 2 + 1).as("sv"))
        .distinct()
      val edges = cs.select(col("cv").as("src"), col("sv").as("dst"))
        .unionAll(cs.select(col("sv").as("src"), col("cv").as("dst")))
      graft.operators.PageRank
        .fixedPoint(edges, "src", "dst", iters = 10, q = Q)
        .select(
          when(col("v") % 2 === 0, lit("customer"))
            .otherwise(lit("supplier")).as("kind"),
          expr("v DIV 2").as("node_id"), col("r").as("rank_fp"))
        .orderBy(col("rank_fp").desc, col("kind"), col("node_id"))
        .limit(20)
    },
    Some {
      val Q = "1000000000000"
      val iters = (1 to 10).map { k =>
        s"""r$k AS (SELECT e.dst AS v,
           CAST((3 * ($Q // nn)) // 20
                + (17 * CAST(SUM(p.r // dg.deg) AS BIGINT)) // 20
             AS BIGINT) AS r
         FROM edges e JOIN r${k - 1} p ON e.src = p.v
              JOIN deg dg ON e.src = dg.v, n
         GROUP BY e.dst, nn)"""
      }.mkString(",\n      ")
      s"""
      WITH cs AS (SELECT DISTINCT 2 * o_custkey AS cv,
                    2 * l_suppkey + 1 AS sv
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (SELECT cv AS src, sv AS dst FROM cs
                UNION ALL SELECT sv, cv FROM cs),
      deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS deg
              FROM edges GROUP BY src),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM deg),
      r0 AS (SELECT v, CAST($Q // nn AS BIGINT) AS r FROM deg, n),
      $iters
      SELECT CASE WHEN v % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
        CAST(v // 2 AS BIGINT) AS node_id, r AS rank_fp
      FROM r10
      ORDER BY rank_fp DESC, kind, node_id LIMIT 20"""
    })

  /** Multi-horizon point-in-time features: clicks in the trailing
    * hour AND trailing day per purchase, from ONE shuffle — each
    * horizon is just another RANGE frame over the same sorted
    * partition ([[graft.operators.SlidingJoin]] per-agg windows). The
    * oracle joins the WIDER band once and FILTER-counts the narrower
    * one inside it — the semantics the frame pair encodes. */
  val q96 = QueryDef(
    "q96_multi_horizon",
    (sp, dir) => {
      val ev = Tables(sp, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("value").cast(DecimalType(18, 2)).as("cv"))
      graft.operators.SlidingJoin.trailingAgg(
          purchases, clicks, "user_id", "ts", 3600000L,
          Seq(
            graft.operators.SlidingJoin.Agg("count", "cv", "clicks_1h"),
            graft.operators.SlidingJoin.Agg("count", "cv", "clicks_24h",
              windowMs = Some(86400000L)),
            graft.operators.SlidingJoin.Agg("sum", "cv", "spend_24h_dec",
              windowMs = Some(86400000L))))
        .select(col("event_id"), col("user_id"), col("clicks_1h"),
          col("clicks_24h"),
          col("spend_24h_dec").cast(DoubleType).as("spend_24h"))
        .orderBy("event_id")
    },
    Some("""
      SELECT p.event_id, p.user_id,
        COUNT(c.value) FILTER (
          WHERE epoch_ms(c.ts) >= epoch_ms(p.ts) - 3600000) AS clicks_1h,
        COUNT(c.value) AS clicks_24h,
        CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS spend_24h
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id
        AND epoch_ms(c.ts) BETWEEN epoch_ms(p.ts) - 86400000
                               AND epoch_ms(p.ts)
      GROUP BY p.event_id, p.user_id
      ORDER BY p.event_id"""))

  /** q94 through the HOT-KEY-SAFE chunked path: the window partitions
    * on (user, 30-minute chunk) with halo-copied clicks, so one hot
    * user spreads over its time range instead of one task — and the
    * oracle is the SAME band join as q94's, proving the chunked plan
    * hash-identical through the gate (the q24/q53 as-of precedent:
    * both plans for one semantics, both continuously verified). */
  val q97 = QueryDef(
    "q97_sliding_chunked",
    (sp, dir) => slidingClickFeatures(sp, dir, chunkMs = Some(1800000L)),
    q94.oracle)

  /** FORWARD-window conversion labeling: for each click, the number
    * of purchases by the same user within the NEXT hour — the label
    * construction step of a training pipeline ("did the click
    * convert"). Zero new operator code: negate event time and the
    * trailing band [[graft.operators.SlidingJoin]] becomes a leading
    * one (q90's forward-as-of trick applied to the aggregate join);
    * the band flips to inclusive [t, t+W]. */
  val q98 = QueryDef(
    "q98_conversion_label",
    (sp, dir) => {
      val ev = Tables(sp, dir, "events")
      def negTs(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("ts", timestamp_millis(-unix_millis(col("ts"))))
      val clicks = negTs(ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts"))
      val purchases = negTs(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id")))
      graft.operators.SlidingJoin.trailingAgg(
          clicks, purchases, "user_id", "ts", 3600000L,
          Seq(graft.operators.SlidingJoin.Agg(
            "count", "purchase_id", "conversions_1h")))
        .select(col("event_id"), col("user_id"), col("conversions_1h"),
          (col("conversions_1h") > 0L).as("converted"))
        .orderBy("event_id")
    },
    Some("""
      SELECT c.event_id, c.user_id,
        COUNT(p.event_id) AS conversions_1h,
        COUNT(p.event_id) > 0 AS converted
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
        AND epoch_ms(p.ts) BETWEEN epoch_ms(c.ts)
                               AND epoch_ms(c.ts) + 3600000
      GROUP BY c.event_id, c.user_id
      ORDER BY c.event_id"""))

  /** KMV sketch-to-sketch overlap JOIN — the sketch APPLICATION shape
    * beyond q80's single-pair set ops: ONE bounded sketch per group
    * (the distinct user set per event type, k smallest LCG hashes),
    * then every group PAIR's union/intersection/Jaccard estimated by
    * joining the k-byte sketches — the audience-overlap matrix, raw
    * data scanned once however many pairs are scored.
    *
    * Scale posture: the per-group top-k ranks through a rank-limit
    * window Spark compiles to a map-side partial top-k below the
    * exchange (WindowGroupLimit, the q07/q21 shape), so no whole
    * group's hash set ever sorts in one task; the pairwise stage joins
    * G sketch ROWS of k BIGINTs each (G² pairs of O(k) work — for
    * thousands of groups still trivially one executor's work, and an
    * equi-join on a constant key + broadcast, never a planned
    * cartesian). The exact pairwise overlap rides along as the error
    * report via ONE distinct-key self equi-join shuffled on the
    * high-cardinality user hash. Every sketch datum is an exact
    * integer (q71's LCG hash) and the estimate divisions are written
    * identically in both engines, so the entry is fully
    * oracle-checked. */
  val q103 = QueryDef(
    "q103_kmv_overlap_join",
    (sp, dir) => {
      graft.operators.KmvOverlap.overlapMatrix(
          Tables(sp, dir, "events"), "event_type", "user_id",
          k = 64, withExact = true)
        .select(col("group_a").as("type_a"), col("group_b").as("type_b"),
          col("k_used"), col("h_k"), col("n_shared"), col("n_inter_exact"),
          col("est_union"), col("est_intersection"), col("est_jaccard"),
          col("est_a"), col("est_b"), col("est_only_a"), col("est_only_b"))
        .orderBy("type_a", "type_b")
    },
    Some("""
      WITH hd AS (SELECT DISTINCT event_type,
          ((user_id % 2147483647) * 1103515245 + 12345) % 2147483647 AS h
        FROM events),
      topk AS (SELECT event_type, h FROM hd
               QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h) <= 64),
      sk AS (SELECT event_type, list(h ORDER BY h) AS sk
             FROM topk GROUP BY event_type),
      pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.sk AS sk_a, b.sk AS sk_b
             FROM sk a JOIN sk b ON a.event_type < b.event_type),
      c AS (SELECT type_a, type_b, sk_a, sk_b,
              list_slice(list_sort(list_distinct(list_concat(sk_a, sk_b))),
                1, 64) AS topu
            FROM pr),
      m AS (SELECT type_a, type_b,
              CAST(len(topu) AS BIGINT) AS k_used,
              CAST(topu[len(topu)] AS BIGINT) AS h_k,
              CAST(len(list_filter(topu,
                x -> list_contains(sk_a, x) AND list_contains(sk_b, x)))
                AS BIGINT) AS n_shared,
              CAST(len(sk_a) AS BIGINT) AS k_a,
              CAST(sk_a[len(sk_a)] AS BIGINT) AS h_a,
              CAST(len(sk_b) AS BIGINT) AS k_b,
              CAST(sk_b[len(sk_b)] AS BIGINT) AS h_b
            FROM c),
      ex AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_inter_exact
             FROM (SELECT DISTINCT event_type, user_id FROM events) x
             JOIN (SELECT DISTINCT event_type, user_id FROM events) y
               ON x.user_id = y.user_id AND x.event_type < y.event_type
             GROUP BY 1, 2)
      SELECT m.type_a, m.type_b, k_used, h_k, n_shared,
        COALESCE(ex.n_inter_exact, 0) AS n_inter_exact,
        CAST((k_used - 1) * 2147483647 AS DOUBLE) / CAST(GREATEST(h_k, 1) AS DOUBLE)
          AS est_union,
        (CAST(n_shared AS DOUBLE) / CAST(k_used AS DOUBLE)) *
          (CAST((k_used - 1) * 2147483647 AS DOUBLE) / CAST(GREATEST(h_k, 1) AS DOUBLE))
          AS est_intersection,
        CAST(n_shared AS DOUBLE) / CAST(k_used AS DOUBLE) AS est_jaccard,
        CAST((k_a - 1) * 2147483647 AS DOUBLE) / CAST(GREATEST(h_a, 1) AS DOUBLE) AS est_a,
        CAST((k_b - 1) * 2147483647 AS DOUBLE) / CAST(GREATEST(h_b, 1) AS DOUBLE) AS est_b,
        GREATEST(CAST((k_a - 1) * 2147483647 AS DOUBLE) / CAST(GREATEST(h_a, 1) AS DOUBLE)
          - (CAST(n_shared AS DOUBLE) / CAST(k_used AS DOUBLE)) *
            (CAST((k_used - 1) * 2147483647 AS DOUBLE) / CAST(GREATEST(h_k, 1) AS DOUBLE)),
          0.0) AS est_only_a,
        GREATEST(CAST((k_b - 1) * 2147483647 AS DOUBLE) / CAST(GREATEST(h_b, 1) AS DOUBLE)
          - (CAST(n_shared AS DOUBLE) / CAST(k_used AS DOUBLE)) *
            (CAST((k_used - 1) * 2147483647 AS DOUBLE) / CAST(GREATEST(h_k, 1) AS DOUBLE)),
          0.0) AS est_only_b
      FROM m LEFT JOIN ex ON m.type_a = ex.type_a AND m.type_b = ex.type_b
      ORDER BY m.type_a, m.type_b"""))

  val defs: Seq[QueryDef] = Seq(q74, q75, q76, q77, q78, q79, q80, q81,
    q82, q83, q84, q85, q86, q87, q88, q89, q90, q91, q92, q93, q94,
    q95, q96, q97, q98, q103)
}
