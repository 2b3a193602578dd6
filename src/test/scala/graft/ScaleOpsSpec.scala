package graft

import graft.operators.{AsOfJoin, Dedup, Pipeline}
import graft.sources.ClusteredWriter
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("ngramJaccard maxDf cap drops high-df shingles but keeps true near-dups") {
    val boiler = "common header boilerplate text appears everywhere in every doc"
    val docs = Seq(
      (0L, s"$boiler unique alpha beta gamma delta epsilon zeta eta theta"),
      (1L, s"$boiler unique alpha beta gamma delta epsilon zeta eta iota"),
      (2L, s"$boiler totally different body content here nothing shared at all"),
      (3L, s"$boiler another unrelated document body with its own words")
    ).toDF("doc_id", "text")
    // cap df at 3: the boilerplate shingles (df=4) vanish, the shared
    // "unique alpha beta..." run (df=2) survives
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3,
      minJaccard = 0.3, maxDf = Some(3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("native as-of join matches the window formulation at 200k x 100k") {
    val left = spark.range(200000).select(
      (col("id") % 1000).as("k"), (col("id") * 7 % 1000000).as("ts"),
      col("id").as("lid"))
    val right = spark.range(100000).select(
      (col("id") % 1000).as("rk"), (col("id") * 13 % 1000000).as("rts"),
      col("id").as("rid"))
    val native = AsOfJoin.nativeLeftAsOf(left, right,
      "k", "ts", "rk", "rts", "rid").select("lid", "rid")
    // window formulation breaks equal-(key, ts) ties by max payload =
    // max rid — the same rule the native exec's tie sort encodes
    val window = AsOfJoin.leftAsOf(left,
        right.select(col("rk").as("k"), col("rts").as("ts"), col("rid")),
        "k", "ts", Map("rid" -> "rid"))
      .select("lid", "rid")
    assert(native.exceptAll(window).count() === 0)
    assert(window.exceptAll(native).count() === 0)
  }

  test("distributedNtile at 1M rows yields the exact NTILE bucket sizes") {
    val n = 1000003  // remainder 3: first three buckets get the extra row
    val df = spark.range(n).select(col("id"), (col("id") % 977).as("v"))
    val sizes = Pipeline.distributedNtile(df, 4, "v", "id")
      .groupBy("ntile").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes === Map(1 -> 250001L, 2 -> 250001L, 3 -> 250001L,
      4 -> 250000L))
  }

  test("range-clustered write produces narrow per-file key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cluster").toString
    val df = spark.range(10000).select(col("id"),
      (col("id") % 7).as("payload"))
    ClusteredWriter.writeRangeClustered(df, dir, nFiles = 8, Seq("id"))
    // each file must cover a disjoint narrow range: per-file max-min
    // far below the global range
    val spans = spark.read.parquet(dir)
      .select(col("id"), input_file_name().as("f"))
      .groupBy("f").agg((max("id") - min("id")).as("span"))
      .collect().map(_.getLong(1))
    assert(spans.length >= 4)
    assert(spans.forall(_ < 10000 / 4))
  }

  test("bloom semi-join stays exact at 1M fact rows against a 10k dim") {
    val fact = spark.range(1000000).select(
      (col("id") * 2654435761L % 3000000L).as("k"), col("id").as("v"))
    val dim = spark.range(10000).select((col("id") * 31L).as("dk"))
    val got = graft.operators.BloomSemi
      .semiJoin(fact, "k", dim, "dk", mBits = 1 << 20)
    val want = fact.join(dim, col("k") === col("dk"), "left_semi")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("count-min at 1M rows: estimates never undercount, true heavy hitter tops") {
    // one planted heavy key over a 100k-key tail: 200k hits from the
    // id%5 rows plus the 10 tail ids congruent to 42 mod 100000 (none
    // of which are divisible by 5)
    val df = spark.range(1000000).select(
      when(col("id") % 5 === 0, 42L)
        .otherwise(col("id") % 100000L).as("k"))
    val hh = graft.operators.CountMin.heavyHitters(df, "k", w = 4096, k = 10)
    val rows = hh.orderBy("rank")
      .select("key", "exact_cnt", "cms_estimate")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.head._1 === 42L && rows.head._2 === 200010L)
    assert(rows.forall { case (_, exact, est) => est >= exact })
  }

  test("interval sweep at 1M intervals matches the per-group analytic peak") {
    // group g gets 10k intervals [i, i+1000): at any t in the steady
    // region exactly 1000 overlap — peak is exactly 1000 per group
    val df = spark.range(1000000).select(
      (col("id") % 100).as("g"),
      expr("id div 100").as("s"),
      (expr("id div 100") + 1000L).as("e"))
    val peaks = graft.operators.IntervalSweep
      .peakConcurrency(df, Seq("g"), "s", "e")
      .select("g", "n_intervals", "peak")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(peaks.length === 100)
    assert(peaks.forall { case (_, n, p) => n === 10000L && p === 1000L })
  }

  test("table diff at 1M x 1M classifies exact counts") {
    val a = spark.range(1000000).select(col("id").as("k"),
      (col("id") % 97).as("v"))
    // drop the %13 keys, change v on the %7 keys (of those kept),
    // append 50k new keys
    val b = a.filter(col("k") % 13 =!= 0)
      .withColumn("v", when(col("k") % 7 === 0, col("v") + 1000)
        .otherwise(col("v")))
      .unionByName(spark.range(1000000, 1050000)
        .select(col("id").as("k"), lit(0L).as("v")))
    val counts = graft.operators.TableDiff.diff(a, b, Seq("k"))
      .groupBy("diff_status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val removed = 1000000L / 13 + 1  // k=0 counts: 0 % 13 == 0
    val changedKept = (0L until 1000000L)
      .count(k => k % 13 != 0 && k % 7 == 0).toLong
    assert(counts("removed") === removed)
    assert(counts("added") === 50000L)
    assert(counts("changed") === changedKept)
    assert(counts("unchanged") === 1000000L - removed - changedKept)
  }

  test("cdc apply at 1M base with a 100k multi-version change batch") {
    val base = spark.range(1000000).select(col("id").as("k"),
      lit("base").as("s"), (col("id") % 1000).cast("double").as("v"))
    // 100k versions over 50k keys: even seq upserts, odd seq deletes —
    // per key the final op is seq=2's, i.e. keys 0..49999 all get a
    // final U (seq 2 even) with v = k + 2
    val changes = spark.range(100000).select(
      (col("id") % 50000).as("k"), lit("chg").as("s"),
      (col("id") % 50000 + expr("id div 50000") + 1).cast("double").as("v"),
      when((expr("id div 50000") + 1) % 2 === 0, "U").otherwise("D").as("op"),
      (expr("id div 50000") + 1).as("seq"))
    val out = graft.operators.Cdc(base, changes, "k", "op", "seq")
    assert(out.count() === 1000000L)  // 950k untouched + 50k final upserts
    val changed = out.filter(col("s") === "chg")
    assert(changed.count() === 50000L)
    assert(changed.filter(col("v") =!= col("k") + 2).count() === 0L)
  }

  test("prefix sum at 1M rows over 3 logical partitions is exact") {
    // closed form: within each residue class g ∈ {0,1,2}, ordering by
    // id gives the g-th, (g+3)-th, … values; running sum of a constant
    // 1 equals the 1-based position — checked against a closed form,
    // no window reference needed at this size
    val df = spark.range(1500000).select((col("id") % 3).as("g"), col("id"))
      .withColumn("one", lit(1L))
    val out = graft.operators.PrefixSum.withRunningSum(
      df, Seq("g"), Seq(col("id")), "one", "cum")
    assert(out.filter(col("cum") =!= (col("id") - col("g")) / 3 + 1).count() === 0L)
  }

  test("weighted median at 1M rows matches the closed form") {
    // v = 1..1M, unit weights: W = 1e6, crossing 2·cum ≥ W at
    // cum = 500000 → the lower weighted median is exactly 500000
    val df = spark.range(1, 1000001).select(lit("g").as("g"),
      col("id").cast("double").as("v"), lit(1L).as("w"))
    val r = graft.operators.ExactPercentiles
      .weightedMedian(df, "g", "v", "w", bucketWidth = 1000.0)
      .collect()(0)
    assert(r.getAs[Double]("wmedian") === 500000.0)
    assert(r.getAs[Long]("total_weight") === 1000000L)
  }

  test("skyline at 1M points matches the closed-form frontier") {
    // points (x=id+1, y=(id+1) % 64): for residue r >= 1 the cheapest
    // point with y=r is x=r; (64, 0) is dominated by (1, 1). Frontier
    // = {(r, r) : r = 1..63} exactly.
    val df = spark.range(1000000).select((col("id") + 1).as("x"))
      .select(col("x").as("id"), col("x"), (col("x") % 64).as("y"))
      .repartition(16)
    val got = graft.operators.Skyline.frontier(df, "id", "x", "y")
      .collect().map(r => (r.getDouble(1).toLong, r.getDouble(2).toLong))
      .toSet
    assert(got === (1L to 63L).map(r => (r, r)).toSet)
  }

  test("chunked rolling sum at 1M rows matches a closed form") {
    // v = id within one group: rolling 10-row sum ending at id is
    // sum(id-9..id) = 10*id - 45 once id >= 9
    val df = spark.range(1000000).select(lit("g").as("g"), col("id"))
    val out = graft.operators.ChunkedWindow.withRollingAggs(
      df, Seq("g"), Seq(col("id")), framePreceding = 9,
      Map("rs" -> (w => sum(col("id")).over(w))), chunkRows = 65536)
    val bad = out.filter(col("id") >= 9 &&
      col("rs") =!= col("id") * 10 - 45).count()
    assert(bad === 0L)
    assert(out.count() === 1000000L)
  }

  test("best-fit packing at 1M rows matches the closed-form assignment") {
    // 10 groups, every doc 100 tokens, 256-token bins: exactly two
    // docs fit per bin (156 then 56 remaining), so the r-th doc of a
    // group (0-based, id order) lands in bin r / 2 — checked for every
    // row with an expression compare, no collect
    val df = spark.range(1000000).select(col("id"),
      (col("id") % 10).as("grp"), lit(100L).as("n"))
    val out = Pipeline.packBestFit(df, "grp", "id", "n",
      maxTokens = 256, maxOpenBins = 4)
    // r = id DIV 10 (ids are dealt round-robin across the 10 groups);
    // DIV, not "/": Spark's "/" on longs is DOUBLE division
    val bad = out.filter(col("bin_id") =!= expr("(o DIV 10) DIV 2")).count()
    assert(bad === 0L)
    assert(out.count() === 1000000L)
  }

  test("weighted percentiles at 1M rows match a locally replayed crossing") {
    // v = id % 1000, w = (v % 7) + 1, groups id % 2. Since 1000 is
    // even, id % 1000 == v pins id's parity to v's: group g holds
    // exactly the same-parity values, each appearing 1000 times — so
    // the crossing per rank replays with a 500-step local loop over
    // exact integers
    val df = spark.range(1000000).select((col("id") % 2).as("g"),
      (col("id") % 1000).as("v"),
      ((col("id") % 1000) % 7 + 1).as("w"))
    val qs = Seq(("25", 1, 4), ("50", 1, 2), ("90", 9, 10))
    val got = graft.operators.ExactPercentiles.weightedPercentiles(
        df, "g", "v", "w", qs, bucketWidth = 64.0)
      .collect().map(r => r.getAs[Long]("g") ->
        (r.getAs[Long]("total_weight"),
          qs.map { case (l, _, _) => r.getAs[Double](s"p_$l") })).toMap
    (0L until 2L).foreach { g =>
      val vs = (g until 1000L by 2).toSeq
      val weightOf = vs.map(v => v -> 1000L * (v % 7 + 1)).toMap
      val total = weightOf.values.sum
      def crossing(num: Long, den: Long): Double = {
        var cum = 0L
        vs.find { v => cum += weightOf(v); den * cum >= num * total }
          .get.toDouble
      }
      val (w, vals) = got(g)
      assert(w === total, s"group $g total weight")
      qs.zip(vals).foreach { case ((l, num, den), v) =>
        assert(v === crossing(num, den), s"group $g p_$l")
      }
    }
  }

  test("pagerank on a 100k-node ring matches the scalar recurrence") {
    // symmetric ring: every node has degree 2 and two in-edges, so
    // ranks stay UNIFORM and the whole graph follows one scalar
    // recurrence r' = base + (17 * (2 * (r DIV 2))) DIV 20 — checked
    // for every node with an expression compare, no collect
    val n = 100000L
    val fwd = spark.range(n).select(col("id").as("src"),
      ((col("id") + 1) % n).as("dst"))
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"),
      col("src").as("dst")))
    val q = 1000000000000L
    val init = q / n
    val base = 3L * init / 20L
    var r = init
    (1 to 10).foreach(_ => r = base + 17L * (2L * (r / 2L)) / 20L)
    val out = graft.operators.PageRank.fixedPoint(edges, "src", "dst",
      iters = 10, q = q)
    assert(out.filter(col("r") =!= r).count() === 0L)
    assert(out.count() === n)
  }

  test("sliding agg join at 1M x 1M rows matches the closed form") {
    // both sides on the same ms grid: key = t % 100, so a probe at
    // time t sees builds at t, t-100, t-200, ... within the 1000 ms
    // band -> count = min(t DIV 100, 10) + 1, sum = count (unit
    // values). Checked per row with an expression compare, no collect.
    def grid = spark.range(1000000).select(
      (col("id") % 100).as("k"), timestamp_millis(col("id")).as("ts"))
    val probe = grid.withColumn("pid", unix_millis(col("ts")))
    val build = grid.withColumn("v", lit(1L))
    val out = graft.operators.SlidingJoin.trailingAgg(
      probe, build, "k", "ts", 1000L,
      Seq(graft.operators.SlidingJoin.Agg("count", "v", "cnt"),
        graft.operators.SlidingJoin.Agg("sum", "v", "s")))
    val expected = least(expr("pid DIV 100"), lit(10L)) + 1
    val bad = out.filter(col("cnt") =!= expected ||
      col("s") =!= expected).count()
    assert(bad === 0L)
    assert(out.count() === 1000000L)
  }

  test("sample sketch at 1M rows equals the exact weighted top-k") {
    import graft.functions.{SampleSketch, SampleSketchAgg}
    // 100k distinct keys x 10 rows each, LCG priorities per row
    val df = spark.range(1000000).select(
      (col("id") % 100000L).as("key"),
      pmod(col("id") * lit(1103515245L) + lit(12345L),
        lit(2147483647L)).as("prio"))
    val bytes = df.agg(SampleSketchAgg(col("key"), col("prio"), 20))
      .head().getAs[Array[Byte]](0)
    val got = SampleSketch.fromBytes(bytes).entries.toSeq
    // exact reference via a plain Spark aggregation (not the sketch)
    val expect = df.groupBy("key").agg(max("prio").as("p"))
      .orderBy(col("p").desc, col("key")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expect)
  }

  test("substring scan at 50k docs finds exactly the planted passages") {
    // every 10th doc carries the same 12-token passage appended to 10
    // otherwise globally-unique tokens; ~750k window hashes total
    val passage = (0 until 12).map(i => s"p$i").mkString(" ")
    val base = concat_ws(" ", (0 until 10).map(i =>
      concat(lit(s"u${i}_"), col("id"))): _*)
    val docs = spark.range(50000).select(
      col("id").as("doc_id"),
      when(col("id") % 10 === 0, concat(base, lit(s" $passage")))
        .otherwise(base).as("text"))
    val out = graft.queries.DedupQueries.substringDupScan(docs, n = 8)
    // planted docs: the 5 all-passage windows merge to ONE 12-token
    // span; clean docs: nothing flagged
    val planted = out.filter(col("doc_id") % 10 === 0)
    assert(planted.filter(col("n_spans") =!= 1L ||
      col("dup_tokens") =!= 12L).count() === 0L)
    assert(planted.count() === 5000L)
    val clean = out.filter(col("doc_id") % 10 =!= 0)
    assert(clean.filter(col("n_spans") =!= 0L).count() === 0L)
  }
}
