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

  test("empty and single-value groups degrade gracefully") {
    val single = Seq(5.0).toDF("x")
      .agg(TDigestQuantiles(col("x"), probs, 100.0)).head().getSeq[Double](0)
    assert(single.forall(_ === 5.0))
    val empty = Seq.empty[Double].toDF("x")
      .agg(TDigestQuantiles(col("x"), probs, 100.0)).head()
    assert(empty.isNullAt(0))
  }
}
