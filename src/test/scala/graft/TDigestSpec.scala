package graft

import graft.functions.{TDigest, TDigestQuantiles}
import org.apache.spark.sql.functions._

/** Accuracy and mergeability contract for the t-digest sketch
  * (rows-only in the catalog, so the guarantees live here):
  *   - rank error vs the exact quantile stays within the documented
  *     t-digest envelope (tight at the tails, loosest mid-stream);
  *   - the estimate is partition-count-robust: digests built from 1,
  *     8, and 32 partitions all honor the same rank-error bound
  *     (merge order shifts centroid boundaries, never the contract);
  *   - local digests merge associatively within the same bound.
  */
class TDigestSpec extends SparkSpec {
  import spark.implicits._

  private val probs = Seq(0.1, 0.5, 0.9, 0.99)
  // mid-quantile clusters are the coarsest (size ∝ q(1−q)); 0.02 rank
  // error at compression 100 is ~4× the theoretical envelope — a real
  // accuracy bug (e.g. uniform clustering) blows far past it
  private val maxRankErr = 0.02

  /** Fraction of `sorted` strictly below `v` — the rank the estimate
    * actually landed at. */
  private def rankOf(sorted: Array[Double], v: Double): Double =
    sorted.count(_ < v).toDouble / sorted.length

  private def assertWithinRankError(sorted: Array[Double],
      estimates: Seq[Double], label: String): Unit =
    probs.zip(estimates).foreach { case (q, est) =>
      val err = math.abs(rankOf(sorted, est) - q)
      assert(err <= maxRankErr,
        f"$label q=$q: estimate $est%.3f sits at rank error $err%.4f")
    }

  // log-normal-ish skewed data: the shape tail quantiles get wrong
  // first if the digest under-resolves the tail
  private lazy val values: Array[Double] = {
    var s = 42L
    Array.fill(60000) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val u = ((s >>> 11).toDouble / (1L << 53).toDouble)
      s = s * 6364136223846793005L + 1442695040888963407L
      val v = ((s >>> 11).toDouble / (1L << 53).toDouble)
      // Box-Muller → exp: log-normal
      math.exp(math.sqrt(-2 * math.log(u + 1e-12)) *
        math.cos(2 * math.Pi * v) * 0.8 + 3.0)
    }
  }
  private lazy val sorted: Array[Double] = values.sorted

  test("rank error within bound across partition counts") {
    for (parts <- Seq(1, 8, 32)) {
      val df = values.toSeq.toDF("x").repartition(parts)
      val est = df.agg(TDigestQuantiles(col("x"), probs, 100.0).as("q"))
        .head().getSeq[Double](0)
      assert(est == est.sorted, s"quantile estimates must be monotone: $est")
      assertWithinRankError(sorted, est, s"parts=$parts")
    }
  }

  test("local digests merge associatively within the bound") {
    // mergeWith mutates its receiver, so each merge strategy gets its
    // own freshly built chunk digests
    def chunks: Seq[TDigest] = values.grouped(7500).map { chunk =>
      val d = new TDigest(100.0)
      chunk.foreach(d.add)
      d
    }.toSeq
    // left fold and a two-level tree merge must BOTH honor the bound
    val folded = chunks.reduceLeft { (a, b) => a.mergeWith(b); a }
    assertWithinRankError(sorted, probs.map(folded.quantile), "fold-merge")
    val pairs = chunks.grouped(2).map { g =>
      g.reduceLeft { (a, b) => a.mergeWith(b); a }
    }.toSeq
    val tree = pairs.reduceLeft { (a, b) => a.mergeWith(b); a }
    assertWithinRankError(sorted, probs.map(tree.quantile), "tree-merge")
    assert(folded.totalWeight === values.length.toDouble)
  }

  test("serialization round-trips the digest") {
    val d = new TDigest(100.0)
    values.take(5000).foreach(d.add)
    val back = TDigest.fromBytes(d.toBytes)
    probs.foreach(q => assert(back.quantile(q) === d.quantile(q)))
    assert(back.totalWeight === d.totalWeight)
  }

  test("centroid count and sketch bytes stay bounded by compression") {
    // the O(compression) state claim, asserted: the size-bound pass
    // keeps ≤ ~2δ centroids whatever the input volume, so a stored
    // sketch is a few KB — 60k points must not grow it past that
    val d = new TDigest(100.0)
    values.foreach(d.add)
    assert(d.centroidCount <= 2 * 100 + 16,
      s"${d.centroidCount} centroids — the recluster bound is not holding")
    assert(d.toBytes.length <= 16 * (2 * 100 + 16) + 20,
      s"${d.toBytes.length} sketch bytes")
  }

  test("catalog entry q101 produces sane per-group quantiles") {
    val out = Catalog.byName("q101_tdigest_quantiles")
      .build(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p10, p50, p90, p99) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(p10 <= p50 && p50 <= p90 && p90 <= p99,
        s"non-monotone quantiles: $r")
      assert(p10 > 0 && p99 < 200000, s"implausible price quantiles: $r")
    }
  }

  test("sketches stored to parquet and merged later honor the bound") {
    import graft.functions.{TDigestMergeQuantiles, TDigestSketch}
    // per-"day" sketches, persisted like a monitoring pipeline would
    val df = values.zipWithIndex
      .map { case (v, i) => (i % 10, v) }.toSeq.toDF("day", "x")
    val tmp = java.nio.file.Files.createTempDirectory("tdsketch").toString
    df.groupBy("day")
      .agg(TDigestSketch(col("x"), 100.0).as("sketch"))
      .write.mode("overwrite").parquet(s"$tmp/sketches.parquet")
    // a later session rolls up the STORED sketches — no raw re-read
    val est = spark.read.parquet(s"$tmp/sketches.parquet")
      .agg(TDigestMergeQuantiles(col("sketch"), probs).as("q"))
      .head().getSeq[Double](0)
    assertWithinRankError(sorted, est, "stored-merge")
  }

  test("two-level rollup (q102) matches one-level (q101) within the bound") {
    val dir = "/root/testdata/sf0.001"
    val raw = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted }
    val twoLevel = Catalog.byName("q102_tdigest_rollup")
      .build(spark, dir).collect()
    twoLevel.foreach { r =>
      val flag = r.getString(0)
      val ests = Seq(r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assertWithinRankError(raw(flag), ests, s"rollup flag=$flag")
      assert(r.getLong(2) > 1, "rollup must actually merge several sketches")
    }
  }

  test("streaming digest (e30) tracks the batch exact quantiles") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val exact = Tables(spark, dir, "events")
      .select(col("event_type"), col("value").cast("double"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted }
    val streamed = Catalog.byName("e30_stream_quantiles")
      .build(spark, dir).collect()
    assert(streamed.nonEmpty)
    streamed.foreach { r =>
      val vals = exact(r.getString(0))
      Seq(0.5 -> r.getDouble(2), 0.9 -> r.getDouble(3),
          0.99 -> r.getDouble(4)).foreach { case (q, est) =>
        val err = math.abs(rankOf(vals, est) - q)
        assert(err <= maxRankErr,
          f"${r.getString(0)} q=$q: streaming estimate $est%.3f rank error $err%.4f")
      }
      assert(r.getLong(1) === vals.length.toLong)
    }
  }

  test("wrong-typed input fails at analysis, not mid-job") {
    import graft.functions.TDigestMergeQuantiles
    val ints = Seq(1, 2).toDF("x")
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.agg(TDigestQuantiles(col("x"), probs, 100.0)).head()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.agg(TDigestMergeQuantiles(col("x"), probs)).head()
    }
  }

  test("SQL-registered functions run q101's shape via spark.sql") {
    Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .createOrReplaceTempView("td_lineitem")
    try {
      // one-level (q101's shape): graft_tdigest_quantiles from SQL
      val oneLevel = spark.sql("""
        SELECT l_returnflag, COUNT(*) AS n_rows,
          graft_tdigest_quantiles(CAST(l_extendedprice AS DOUBLE),
            array(0.1, 0.5, 0.9, 0.99), 100.0) AS qt
        FROM td_lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """).collect()
      assert(oneLevel.nonEmpty)
      oneLevel.foreach { r =>
        val qs = r.getSeq[Double](2)
        assert(qs == qs.sorted, s"non-monotone SQL quantiles: $r")
        assert(qs.head > 0 && qs.last < 200000, s"implausible: $r")
      }
      // two-level (q102's shape): sketch per month, merge per flag —
      // SQL integer literal for compression exercises the numeric
      // literal coercion, array(...) the literal-array extraction
      val twoLevel = spark.sql("""
        WITH monthly AS (
          SELECT l_returnflag, date_trunc('month', l_shipdate) AS m,
            graft_tdigest_sketch(CAST(l_extendedprice AS DOUBLE), 100) AS sk
          FROM td_lineitem GROUP BY 1, 2)
        SELECT l_returnflag,
          graft_tdigest_merge_quantiles(sk, array(0.5, 0.99)) AS qt
        FROM monthly GROUP BY l_returnflag ORDER BY l_returnflag
      """).collect()
      assert(twoLevel.map(_.getString(0)).toSeq ===
        oneLevel.map(_.getString(0)).toSeq)
      // the SQL two-level median must agree with the SQL one-level
      // within the documented rank-error envelope (same data, both
      // estimates) — compare against exact ranks per flag
      val exact = Tables(spark, "/root/testdata/sf0.001", "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
        .collect().groupBy(_.getString(0))
        .map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted }
      twoLevel.foreach { r =>
        val vals = exact(r.getString(0))
        Seq(0.5, 0.99).zip(r.getSeq[Double](1)).foreach { case (q, est) =>
          val err = math.abs(rankOf(vals, est) - q)
          assert(err <= maxRankErr,
            f"SQL two-level flag=${r.getString(0)} q=$q rank error $err%.4f")
        }
      }
    } finally spark.catalog.dropTempView("td_lineitem")
  }

  test("SQL registration rejects non-literal sketch parameters") {
    Seq((1.0, 0.5)).toDF("x", "p").createOrReplaceTempView("td_bad")
    try {
      // a COLUMN where a literal parameter is required must fail at
      // plan time with the function's own message, not mid-job
      val e1 = intercept[Exception] {
        spark.sql(
          "SELECT graft_tdigest_quantiles(x, array(p), 100.0) FROM td_bad").head()
      }
      assert(e1.getMessage.contains("must be a literal"), e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql(
          "SELECT graft_tdigest_sketch(x, p) FROM td_bad").head()
      }
      assert(e2.getMessage.contains("must be a literal"), e2.getMessage)
    } finally spark.catalog.dropTempView("td_bad")
  }

  test("corrupt stored sketches fail with a descriptive error") {
    import graft.functions.TDigest
    val good = { val d = new TDigest(100.0); Seq(1.0, 2.0, 3.0).foreach(d.add); d }
    val bytes = good.toBytes
    // truncated payload: header intact, centroids cut short
    val truncated = java.util.Arrays.copyOf(bytes, bytes.length - 8)
    val e1 = intercept[IllegalArgumentException](TDigest.fromBytes(truncated))
    assert(e1.getMessage.contains("corrupt t-digest"), e1.getMessage)
    // too short for even a header
    val e2 = intercept[IllegalArgumentException](TDigest.fromBytes(Array[Byte](1, 2, 3)))
    assert(e2.getMessage.contains("not a t-digest"), e2.getMessage)
    // negative centroid count must not allocate
    val bb = java.nio.ByteBuffer.wrap(bytes.clone())
    bb.putInt(16, -1)
    val e3 = intercept[IllegalArgumentException](TDigest.fromBytes(bb.array()))
    assert(e3.getMessage.contains("corrupt t-digest"), e3.getMessage)
  }

  test("cdf is the inverse of quantile within the rank-error bound") {
    val d = new TDigest(100.0)
    values.foreach(d.add)
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val roundTrip = d.cdf(d.quantile(q))
      assert(math.abs(roundTrip - q) <= maxRankErr,
        f"cdf(quantile($q)) = $roundTrip%.4f")
    }
    // extremes clamp, and the sorted data agrees with the estimates
    assert(d.cdf(sorted.head - 1) === 0.0)
    assert(d.cdf(sorted.last + 1) === 1.0)
    for (x <- Seq(sorted(sorted.length / 4), sorted(sorted.length / 2)))
      assert(math.abs(d.cdf(x) - rankOf(sorted, x)) <= maxRankErr)
  }

  test("drift detector fires on an injected shift, stays quiet before it") {
    import graft.functions.{TDigestQuantiles, TDigestSketch}
    // 12 hourly windows of a stationary metric, then 2 windows shifted
    // by +4σ — the detector must alarm on the shifted windows ONLY
    var s = 7L
    def gauss(mu: Double): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      val u = ((s >>> 11).toDouble / (1L << 53).toDouble)
      s = s * 6364136223846793005L + 1442695040888963407L
      val v = ((s >>> 11).toDouble / (1L << 53).toDouble)
      mu + math.sqrt(-2 * math.log(u + 1e-12)) * math.cos(2 * math.Pi * v)
    }
    val rows = (0 until 14).flatMap { w =>
      val mu = if (w >= 12) 4.0 else 0.0
      Seq.fill(400)(("m1", w, gauss(mu)))
    }
    val windowed = rows.toDF("metric", "w", "x")
      .groupBy("metric", "w")
      .agg(count(lit(1)).as("n"),
        TDigestSketch(col("x"), 100.0).as("sk"),
        TDigestQuantiles(col("x"), Seq(0.5), 100.0).as("qt"))
      .withColumn("p50", col("qt")(0))
    val out = graft.operators.DigestDrift.report(windowed,
        "metric", "w", "sk", "n", "p50",
        minBaselineN = 300L, rankShiftAlarm = 0.2)
      .select("w", "baseline_n", "rank_shift", "drift_alarm")
      .orderBy("w").collect()
    assert(out.length === 14)
    // window 0 has no baseline: no alarm, rank NaN-free output shape
    assert(!out(0).getBoolean(3) && out(0).getLong(1) === 0L)
    // stationary windows (baseline mature from w>=1): quiet
    (1 until 12).foreach { w =>
      assert(!out(w).getBoolean(3), s"false alarm at stationary window $w")
    }
    // both shifted windows alarm — the +4σ median sits at rank ~1.0
    Seq(12, 13).foreach { w =>
      assert(out(w).getBoolean(3), s"missed injected shift at window $w")
      assert(out(w).getDouble(2) > 0.4, s"rank shift too small: ${out(w)}")
    }
  }

  test("catalog entry e31 runs the streaming drift report end-to-end") {
    val out = Catalog.byName("e31_stream_drift")
      .build(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    // the synthetic event stream is stationary: alarms must be rare
    // (a detector that cries wolf on stationary data is broken)
    val alarms = out.count(_.getBoolean(8))
    assert(alarms.toDouble / out.length <= 0.1,
      s"$alarms/${out.length} stationary windows alarmed")
    // shape invariants: baselines accumulate, ranks are ranks
    out.foreach { r =>
      assert(r.getLong(4) >= 0L)
      if (!r.isNullAt(5))
        assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0, s"bad rank: $r")
    }
  }

  test("SQL graft_tdigest_merge + graft_tdigest_cdf compose") {
    values.toSeq.toDF("x").createOrReplaceTempView("td_sql_drift")
    try {
      val r = spark.sql("""
        WITH sk AS (
          SELECT graft_tdigest_sketch(x, 100.0) AS s FROM td_sql_drift),
        merged AS (SELECT graft_tdigest_merge(s) AS m FROM sk)
        SELECT graft_tdigest_cdf(m, CAST(20.0857 AS DOUBLE)) AS r FROM merged
      """).head().getDouble(0)
      // e^3 ≈ 20.09 is the log-normal median (mu=3): rank ≈ 0.5
      assert(math.abs(r - 0.5) <= 2 * maxRankErr, s"rank $r")
    } finally spark.catalog.dropTempView("td_sql_drift")
  }

  test("update-mode streaming digest with watermark eviction matches batch") {
    // e30/e31 replay in complete mode; this is the always-on-stream
    // production shape — update output, watermarked window state that
    // EVICTS once the watermark passes, late data dropped instead of
    // corrupting an already-emitted digest
    import graft.streaming.StreamOps.Evt
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val w1Vals = values.take(400)
    val w1 = w1Vals.zipWithIndex.map { case (v, i) =>
      Evt(i.toLong, ts(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d"), "m", v)
    }
    val w2 = values.slice(400, 800).zipWithIndex.map { case (v, i) =>
      Evt(i.toLong, ts(f"2024-01-01 12:${i / 60}%02d:${i % 60}%02d"), "m", v)
    }
    val input = MemoryStream[Evt]
    val agg = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        TDigestQuantiles(col("value"), probs, 100.0).as("qt"))
    val q = agg.writeStream.format("memory").queryName("td_update")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(w1: _*)              // batch 1: the 10:00 window
      q.processAllAvailable()
      input.addData(w2: _*)              // batch 2: 12:00 window; max ts
      q.processAllAvailable()            //   12:06 → watermark 11:56 > 11:00
                                         //   evicts the 10:00 window's state
      // batch 3: LATE absurd outliers for the evicted window — must be
      // dropped, not fold a 1e9 tail into the already-emitted digest
      input.addData((0 until 5).map(i =>
        Evt(9000L + i, ts("2024-01-01 10:30:00"), "m", 1e9)): _*)
      q.processAllAvailable()
      val sink = spark.table("td_update")
        .select(col("window.start").cast("string").as("w"), col("n"), col("qt"))
        .collect()
      // update mode emitted each window exactly once (its own batch);
      // a second 10:00 row would mean the late data reopened the window
      val byWindow = sink.groupBy(_.getString(0))
      assert(byWindow.keySet === Set("2024-01-01 10:00:00", "2024-01-01 12:00:00"))
      byWindow.values.foreach(rows => assert(rows.length === 1,
        s"window emitted ${rows.length} updates: ${rows.toSeq}"))
      val w1Row = byWindow("2024-01-01 10:00:00").head
      assert(w1Row.getLong(1) === 400L, "late rows were counted")
      // and the stream-vs-batch rank bound holds on the update path
      assertWithinRankError(w1Vals.sorted, w1Row.getSeq[Double](2), "update-mode w1")
    } finally q.stop()
  }

  test("empty and single-value groups degrade gracefully") {
    val single = Seq(5.0).toDF("x")
      .agg(TDigestQuantiles(col("x"), probs, 100.0)).head().getSeq[Double](0)
    assert(single.forall(_ === 5.0))
    val empty = Seq.empty[Double].toDF("x")
      .agg(TDigestQuantiles(col("x"), probs, 100.0)).head()
    assert(empty.isNullAt(0))
  }
}
