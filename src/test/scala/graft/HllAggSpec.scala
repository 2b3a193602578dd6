package graft

import graft.functions.{HllEstimate, HllMerge, HllSketch, HllSketchAgg}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contract for the mergeable HLL aggregate family. Unlike the
  * t-digest (merge-order estimate drift → rows-only catalog entries),
  * HLL registers merge by max, so the spec asserts BIT-IDENTITY, not
  * bounds: the same inputs at any partitioning, duplication, or
  * rollup grouping must produce the same sketch bytes — which is what
  * lets q104/e33 be fully DuckDB-oracle-checked.
  */
class HllAggSpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L

  /** ids 0..n-1 through the catalog entries' squared-LCG hash (the
    * affine LCG alone is collision-free on consecutive ids, which
    * biases linear counting — the q104 design note), grouped by `g`. */
  private def hashed(n: Int, groups: Int = 1) = {
    val lcg = pmod(col("id") * lit(1103515245L) + lit(12345L), lit(P))
    spark.range(n.toLong)
      .select(col("id"), ((lcg * lcg) % lit(P)).as("h"),
        pmod(col("id"), lit(groups.toLong)).as("g"))
  }

  private def sketchBytes(df: org.apache.spark.sql.DataFrame, p: Int): Array[Byte] =
    df.agg(HllSketchAgg(col("h"), p).as("s")).head().getAs[Array[Byte]](0)

  test("estimate within the HLL error envelope at 50k distinct (raw regime)") {
    val n = 50000
    val est = hashed(n).agg(HllEstimate(HllSketchAgg(col("h"), 10)).as("e"))
      .head().getDouble(0)
    // 1.04/sqrt(1024) ≈ 3.3% std error; 10% is ~3σ — a real algebra
    // bug (wrong rho, wrong bucket split) lands orders off
    assert(math.abs(est / n - 1.0) < 0.10,
      s"estimate $est for $n distinct is outside 10%")
  }

  test("sparse groups switch to linear counting and stay within 10%") {
    // 150 distinct at m=256 sits far below 2.5·m, where the raw
    // estimator lands ~2× high — this is the q104 regime
    val est = hashed(150).agg(HllEstimate(HllSketchAgg(col("h"), 8)).as("e"))
      .head().getDouble(0)
    assert(math.abs(est / 150.0 - 1.0) < 0.10,
      s"sparse estimate $est for 150 distinct is outside 10%")
    // and a tiny group (the e33 per-window shape)
    val tiny = hashed(3).agg(HllEstimate(HllSketchAgg(col("h"), 6)).as("e"))
      .head().getDouble(0)
    assert(tiny > 2.0 && tiny < 4.0, s"estimate $tiny for 3 distinct")
  }

  test("sketch bytes are bit-identical across partitioning and duplication") {
    val base = hashed(20000)
    val ref = sketchBytes(base, 8)
    for (parts <- Seq(1, 7, 32)) {
      val b = sketchBytes(base.repartition(parts), 8)
      assert(java.util.Arrays.equals(ref, b), s"parts=$parts bytes differ")
    }
    // idempotence: every row twice → same registers exactly
    val doubled = sketchBytes(base.unionAll(base), 8)
    assert(java.util.Arrays.equals(ref, doubled), "duplicated input changed the sketch")
  }

  test("two-level merge rollup is bit-identical to one-level aggregation") {
    val df = hashed(20000, groups = 13)
    val oneLevel = sketchBytes(df, 8)
    val twoLevel = df.groupBy("g")
      .agg(HllSketchAgg(col("h"), 8).as("s"))
      .agg(HllMerge(col("s")).as("m"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(oneLevel, twoLevel))
    // and the store/read round trip preserves it
    val rt = HllSketch.fromBytes(twoLevel).toBytes
    assert(java.util.Arrays.equals(oneLevel, rt))
  }

  test("SQL registration matches the DataFrame API") {
    hashed(5000, groups = 7).createOrReplaceTempView("hll_in")
    val viaSql = spark.sql("""
      SELECT graft_hll_estimate(graft_hll_merge(s)) AS e
      FROM (SELECT g, graft_hll_sketch(h, 8) AS s FROM hll_in GROUP BY g)""")
      .head().getDouble(0)
    val viaApi = hashed(5000, groups = 7)
      .agg(HllEstimate(HllSketchAgg(col("h"), 8)).as("e")).head().getDouble(0)
    assert(viaSql == viaApi, s"SQL $viaSql != API $viaApi")
    // parameters must be literals
    val err = intercept[Exception] {
      spark.sql("SELECT graft_hll_sketch(h, CAST(g AS INT)) FROM hll_in GROUP BY g")
        .collect()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
  }

  test("running window merge yields a nondecreasing cumulative distinct curve") {
    val daily = hashed(8000)
      .withColumn("day", pmod(col("id"), lit(10L)))
      .groupBy("day").agg(HllSketchAgg(col("h"), 8).as("s"))
    val w = Window.partitionBy(pmod(coalesce(col("day"), lit(0L)), lit(1L)))
      .orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = daily
      .withColumn("cum", HllEstimate(HllMerge(col("s")).over(w)))
      .orderBy("day").select("cum").as[Double].collect()
    assert(curve.length == 10)
    assert(curve.zip(curve.tail).forall { case (a, b) => b >= a },
      s"cumulative estimates must be nondecreasing: ${curve.mkString(",")}")
  }

  test("null hashes are skipped; an all-null group estimates 0.0") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "a"), (null, "a"),
      (null, "b"), (null, "b")).toDF("h", "g")
    val out = df.groupBy("g").agg(HllEstimate(HllSketchAgg(col("h"), 4)).as("e"))
      .orderBy("g").as[(String, Double)].collect()
    assert(out(0)._2 > 0.0)
    assert(out(1)._2 == 0.0, s"all-null group must estimate 0.0, got ${out(1)._2}")
  }

  test("negative hash input fails loud") {
    val e = intercept[Exception] {
      Seq(-5L).toDF("h").agg(HllSketchAgg(col("h"), 4)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("non-negative")), e.getMessage)
  }

  test("update-mode streaming sketch with watermark eviction is bit-identical to batch") {
    // e33 replays in complete mode; this is the always-on-stream
    // production shape — update output, watermarked window state that
    // EVICTS once the watermark passes, late data dropped. Unlike the
    // t-digest twin (rank-bound), HLL registers are order-invariant,
    // so the emitted sketch must equal the batch sketch BYTE FOR BYTE.
    import graft.streaming.StreamOps.Evt
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sq = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val w1 = (0 until 400).map(i =>
      Evt(i.toLong % 97, ts(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d"), "m", 1.0))
    val w2 = (0 until 400).map(i =>
      Evt(i.toLong % 53, ts(f"2024-01-01 12:${i / 60}%02d:${i % 60}%02d"), "m", 1.0))
    val input = MemoryStream[Evt]
    val agg = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), HllSketchAgg(col("user_id"), 6).as("sk"))
    val q = agg.writeStream.format("memory").queryName("hll_update")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(w1: _*)
      q.processAllAvailable()
      input.addData(w2: _*)   // max ts 12:06 -> watermark 11:56 evicts 10:00
      q.processAllAvailable()
      // late users for the evicted window must be dropped, not emitted
      input.addData((0 until 5).map(i =>
        Evt(9000L + i, ts("2024-01-01 10:30:00"), "m", 1.0)): _*)
      q.processAllAvailable()
      val sink = spark.table("hll_update")
        .select(col("window.start").cast("string").as("w"), col("n"), col("sk"))
        .collect()
      val byWindow = sink.groupBy(_.getString(0))
      assert(byWindow.keySet === Set("2024-01-01 10:00:00", "2024-01-01 12:00:00"))
      byWindow.values.foreach(rows => assert(rows.length === 1,
        s"window emitted ${rows.length} updates"))
      val w1Row = byWindow("2024-01-01 10:00:00").head
      assert(w1Row.getLong(1) === 400L, "late rows were counted")
      val batchBytes = w1.map(_.user_id).toDF("key")
        .agg(HllSketchAgg(col("key"), 6)).head().getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(w1Row.getAs[Array[Byte]](2), batchBytes),
        "update-mode emitted sketch differs from the batch sketch")
    } finally q.stop()
  }

  test("non-bigint input fails at analysis time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("h").agg(HllSketchAgg(col("h"), 4)).collect()
    }
    assert(e.getMessage.contains("bigint"), e.getMessage)
  }

  test("corrupt stored sketches fail descriptively") {
    val good = sketchBytes(hashed(100), 4)
    // truncated payload
    val short = intercept[IllegalArgumentException] {
      HllSketch.fromBytes(java.util.Arrays.copyOf(good, good.length - 3))
    }
    assert(short.getMessage.contains("corrupt"), short.getMessage)
    // bad version byte
    val vbad = good.clone(); vbad(0) = 9
    val ver = intercept[IllegalArgumentException] { HllSketch.fromBytes(vbad) }
    assert(ver.getMessage.contains("version"), ver.getMessage)
    // register out of range for the declared precision
    val rbad = good.clone(); rbad(5) = 120
    val reg = intercept[IllegalArgumentException] { HllSketch.fromBytes(rbad) }
    assert(reg.getMessage.contains("register"), reg.getMessage)
    // header alone
    val tiny = intercept[IllegalArgumentException] {
      HllSketch.fromBytes(Array[Byte](1))
    }
    assert(tiny.getMessage.contains("header"), tiny.getMessage)
  }

  test("mixed-precision sketches refuse to merge") {
    val s4 = sketchBytes(hashed(100), 4)
    val s5 = sketchBytes(hashed(100), 5)
    val df = Seq(s4, s5).toDF("s")
    val e = intercept[Exception] { df.agg(HllMerge(col("s"))).collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("different precision")), e.getMessage)
  }
}
