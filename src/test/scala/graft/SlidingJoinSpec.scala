package graft

import graft.operators.SlidingJoin
import graft.operators.SlidingJoin.Agg
import org.apache.spark.sql.functions._

/** SlidingJoin.trailingAgg: value equivalence against the literal band
  * join + groupBy it replaces, LEFT-JOIN null semantics on empty
  * frames, inclusive band boundaries, every supported aggregate, and
  * the physical contract (no join operator, one shuffle).
  */
class SlidingJoinSpec extends SparkSpec {
  import spark.implicits._

  // key 1: clicks straddle the band edges; key 2: probe before any
  // build row; key 3: no build rows at all; key 9: build-only key.
  private def probe = Seq(
    (1L, 10L, 5000L), (2L, 20L, 1000L), (2L, 21L, 8000L),
    (3L, 30L, 4000L)).toDF("k", "pid", "tms")
    .select(col("k"), col("pid"),
      timestamp_millis(col("tms")).as("ts"))

  private def build = Seq(
    (1L, 1000L, 1.50), (1L, 2000L, 2.25), (1L, 5000L, 4.00),
    (1L, 5001L, 8.00),
    (2L, 5000L, 16.00),
    (9L, 100L, 32.00)).toDF("k", "tms", "v")
    .select(col("k"), timestamp_millis(col("tms")).as("ts"),
      col("v").cast("decimal(18,2)").as("v"))

  // band = 3000 ms: probe (1, t=5000) must include builds at exactly
  // 2000 (= t - window) and 5000 (= t), not 1000 or 5001.
  private def run(aggs: Seq[Agg]) =
    SlidingJoin.trailingAgg(probe, build, "k", "ts", 3000L, aggs)

  test("trailing count/sum match the literal band join + groupBy") {
    val got = run(Seq(Agg("count", "v", "cnt"), Agg("sum", "v", "s")))
      .select(col("pid"), col("cnt"),
        col("s").cast("double").as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
      .toSet

    val p = probe.select(col("k"), col("pid"),
      unix_millis(col("ts")).as("pt"))
    val b = build.select(col("k").as("bk"),
      unix_millis(col("ts")).as("bt"), col("v"))
    val ref = p.join(b, col("k") === col("bk") &&
        col("bt") >= col("pt") - 3000L && col("bt") <= col("pt"), "left")
      .groupBy("pid")
      .agg(count(col("v")).as("cnt"),
        sum(col("v")).cast("double").as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
      .toSet

    assert(got === ref)
    // pin the semantics, not just the equivalence: inclusive edges for
    // pid 10, zero-count NULL-sum for the unmatched probes
    assert(got === Set(
      (10L, 2L, 6.25),    // t=5000: builds at exactly 2000 and 5000
      (20L, 0L, -1.0),    // t=1000: probe before any build row
      (21L, 1L, 16.0),    // t=8000: build at 5000 within [5000, 8000]
      (30L, 0L, -1.0)))   // key with no build rows
  }

  test("min/max/avg ignore the NULL padding on probe rows") {
    val r = run(Seq(Agg("min", "v", "mn"), Agg("max", "v", "mx"),
        Agg("avg", "v", "av")))
      .filter(col("pid") === 10L)
      .select(col("mn").cast("double"), col("mx").cast("double"),
        col("av").cast("double"))
      .head()
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2)) ===
      ((2.25, 4.0, 3.125)))
  }

  test("physical plan has no join and exactly one shuffle") {
    val p = run(Seq(Agg("sum", "v", "s")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"expected join-free plan:\n$p")
    assert("Exchange".r.findAllIn(p).length === 1,
      s"expected exactly one shuffle:\n$p")
  }

  test("multi-horizon aggs equal per-horizon calls and share one shuffle") {
    val both = run(Seq(Agg("count", "v", "c_short"),
      Agg("count", "v", "c_long", windowMs = Some(7000L))))
    val expect = run(Seq(Agg("count", "v", "c_short")))
      .join(run(Seq(Agg("count", "v", "c_long", windowMs = Some(7000L))))
        .select("pid", "c_long"), "pid")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("pid"), r.getAs[Long]("c_short"), r.getAs[Long]("c_long"))
    assert(both.select("pid", "c_short", "c_long").collect().map(key).toSet
      === expect.select("pid", "c_short", "c_long").collect().map(key).toSet)
    // a second horizon is another frame over the same sort, not
    // another shuffle
    val p = both.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).length === 1,
      s"expected exactly one shuffle for two horizons:\n$p")
  }

  test("chunked path is value-identical across chunk boundaries") {
    // chunkMs 1500 < band 3000: every probe's band straddles chunks,
    // so halo copies are doing real work (3 copies per build row)
    def key3(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("pid"), r.getAs[Long]("cnt"),
        Option(r.getAs[java.math.BigDecimal]("s"))
          .map(_.doubleValue).getOrElse(-1.0))
    val aggs = Seq(Agg("count", "v", "cnt"), Agg("sum", "v", "s"))
    val plain = run(aggs).collect().map(key3).toSet
    val chunked = SlidingJoin.trailingAgg(probe, build, "k", "ts",
      3000L, aggs, chunkMs = Some(1500L)).collect().map(key3).toSet
    assert(chunked === plain)
    // the chunk id must actually reach the window partitioning
    val p = SlidingJoin.trailingAgg(probe, build, "k", "ts", 3000L,
      aggs, chunkMs = Some(1500L)).queryExecution.executedPlan.toString
    assert(p.contains("__chunk"), s"chunk key missing from plan:\n$p")
    assert(!p.contains("Join"))
  }

  test("chunked multi-horizon: halo sized by the widest band") {
    val aggs = Seq(Agg("count", "v", "c_short"),
      Agg("count", "v", "c_long", windowMs = Some(7000L)))
    def key3(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("pid"), r.getAs[Long]("c_short"),
        r.getAs[Long]("c_long"))
    val plain = run(aggs).collect().map(key3).toSet
    val chunked = SlidingJoin.trailingAgg(probe, build, "k", "ts",
      3000L, aggs, chunkMs = Some(2000L)).collect().map(key3).toSet
    assert(chunked === plain)
  }

  test("chunking spreads a hot key: partition volume bounded, results equal") {
    // hot user 0: 20k events over 200 s; 20 cold users with 100 each.
    // 10 s chunks, 3 s band -> the hot key splits across ~20 partitions.
    val c = 10000L
    val w = 3000L
    val hot = spark.range(20000)
      .select(lit(0L).as("k"), (col("id") * lit(10L)).as("tms"))
    val cold = spark.range(2000)
      .select((col("id") % 20 + 1).as("k"), (col("id") * lit(100L)).as("tms"))
    val all = hot.unionAll(cold)
    val probe = all.select(col("k"),
      monotonically_increasing_id().as("pid"),
      timestamp_millis(col("tms")).as("ts"))
    val build = all.select(col("k"), timestamp_millis(col("tms")).as("ts"),
      lit(1L).as("v"))

    // (a) the operator's own chunk assignment keeps every (key, chunk)
    // partition within 2x the hot key's mean and far below the
    // unsplit hot partition
    val fdiv = (e: String) => s"((($e) - pmod(($e), ${c}L)) DIV ${c}L)"
    val parts = all
      .select(col("k"), explode(expr(
        s"sequence(${fdiv("tms")}, ${fdiv(s"tms + ${w}L")})")).as("chunk"))
      .groupBy("k", "chunk").count()
      .filter(col("k") === 0L).collect().map(_.getLong(2))
    val mean = parts.sum.toDouble / parts.length
    assert(parts.max <= 2.0 * mean,
      s"hot-key chunks unbalanced: max ${parts.max} vs mean $mean")
    assert(parts.max * 10 <= 20000L,
      s"chunking must cut the hot partition >=10x: ${parts.max}")

    // (b) end-to-end equality with the plain path on the same fixture
    val aggs = Seq(Agg("count", "v", "cnt"), Agg("sum", "v", "s"))
    val plain = SlidingJoin.trailingAgg(probe, build, "k", "ts", w, aggs)
    val chunked = SlidingJoin.trailingAgg(probe, build, "k", "ts", w,
      aggs, chunkMs = Some(c))
    assert(chunked.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(chunked).count() === 0L)
    assert(chunked.count() === 22000L)
  }

  test("contract: a chunk size creating >64 halo copies is rejected") {
    val e = intercept[IllegalArgumentException] {
      SlidingJoin.trailingAgg(probe, build, "k", "ts", 3000L,
        Seq(Agg("count", "v", "c")), chunkMs = Some(10L))
    }
    assert(e.getMessage.contains("halo copies"))
  }

  test("contract: overlapping non-key columns are rejected loudly") {
    val bad = build.withColumnRenamed("v", "pid")
    val e = intercept[IllegalArgumentException] {
      SlidingJoin.trailingAgg(probe, bad, "k", "ts", 3000L,
        Seq(Agg("sum", "pid", "s")))
    }
    assert(e.getMessage.contains("share exactly"))
  }
}
