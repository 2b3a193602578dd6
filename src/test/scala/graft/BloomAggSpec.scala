package graft

import graft.functions.{BloomBits, BloomContains, BloomFpp, BloomMerge,
  BloomSketch, BloomSketchAgg}
import org.apache.spark.sql.functions._

/** Contract for the mergeable Bloom aggregate family: bit positions
  * from the portable LCG rows, words merged by OR, so — like the
  * HLL/CMS twins — the spec asserts BIT-IDENTITY across partitioning
  * and rollup grouping, plus the classic Bloom guarantee: NO false
  * negatives ever, false positives appear at roughly fill^k on a
  * deliberately tight sketch and vanish on a wide one.
  */
class BloomAggSpec extends SparkSpec {
  import spark.implicits._

  private def keysDf(n: Int, groups: Int = 1) =
    spark.range(n.toLong).select(col("id").as("key"),
      pmod(col("id"), lit(groups.toLong)).as("g"))

  private def sketchBytes(df: org.apache.spark.sql.DataFrame, m: Int,
      k: Int): Array[Byte] =
    df.agg(BloomSketchAgg(col("key"), m, k).as("s")).head().getAs[Array[Byte]](0)

  test("sketch bytes are bit-identical across partitioning") {
    val base = keysDf(2000)
    val ref = sketchBytes(base, 4096, 3)
    for (parts <- Seq(1, 7, 32)) {
      val b = sketchBytes(base.repartition(parts), 4096, 3)
      assert(java.util.Arrays.equals(ref, b), s"parts=$parts bytes differ")
    }
  }

  test("two-level merge rollup is bit-identical to one-level aggregation") {
    val df = keysDf(2000, groups = 13)
    val oneLevel = sketchBytes(df, 4096, 3)
    val twoLevel = df.groupBy("g")
      .agg(BloomSketchAgg(col("key"), 4096, 3).as("s"))
      .agg(BloomMerge(col("s")).as("m"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(oneLevel, twoLevel))
    val rt = BloomSketch.fromBytes(twoLevel).toBytes
    assert(java.util.Arrays.equals(oneLevel, rt))
    // merging the same sketch twice is harmless (OR is idempotent)
    val doubled = Seq(oneLevel, oneLevel).toDF("s")
      .agg(BloomMerge(col("s"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(oneLevel, doubled))
  }

  test("no false negatives ever; false positives only at tight fill") {
    val df = keysDf(500)
    // every inserted key answers true at ANY width — the hard guarantee
    for (m <- Seq(64, 1024, 65536)) {
      val sk = BloomSketch.fromBytes(sketchBytes(df, m, 3))
      (0L until 500L).foreach { key =>
        assert(sk.mightContain(key), s"false negative for $key at m=$m")
      }
    }
    // tight sketch (m=64 for 500 keys): saturated, so absent keys
    // false-positive — fpp estimate must see the saturation
    val tight = BloomSketch.fromBytes(sketchBytes(df, 64, 3))
    assert(tight.fppEstimate > 0.9, s"fill should saturate: ${tight.fppEstimate}")
    // wide sketch (m=65536): fill ~2.3%, fpp ~1e-5 — 200 absent
    // probes should all answer false
    val wide = BloomSketch.fromBytes(sketchBytes(df, 65536, 3))
    val fps = (1000000L until 1000200L).count(wide.mightContain)
    assert(fps == 0, s"$fps false positives at ~1e-5 fpp over 200 probes")
    assert(wide.fppEstimate < 0.001, wide.fppEstimate.toString)
  }

  test("set-bit count matches an independent position replay") {
    val df = keysDf(300)
    val sk = BloomSketch.fromBytes(sketchBytes(df, 1024, 3))
    val P = 2147483647L
    val expected = (0L until 300L).flatMap { key =>
      BloomSketch.sqlRowParams.take(3).map { case (a, b) =>
        ((a * key + b) % P) % 1024
      }
    }.distinct.size
    assert(sk.setBits == expected.toLong, s"${sk.setBits} != $expected")
  }

  test("negative keys hash safely (pmod) and keep the no-FN guarantee") {
    val df = Seq(-1L, -2L, Long.MinValue).toDF("key")
    val sk = BloomSketch.fromBytes(sketchBytes(df, 1024, 3))
    assert(sk.mightContain(-1L))
    assert(sk.mightContain(-2L))
    assert(sk.mightContain(Long.MinValue))
  }

  test("SQL registration matches the DataFrame API") {
    keysDf(500, groups = 7).createOrReplaceTempView("bloom_in")
    val viaSql = spark.sql("""
      SELECT graft_bloom_contains(m, 42L) AS c, graft_bloom_bits(m) AS b,
        ROUND(graft_bloom_fpp(m), 6) AS f
      FROM (SELECT graft_bloom_merge(s) AS m
            FROM (SELECT g, graft_bloom_sketch(key, 1024, 3) AS s
                  FROM bloom_in GROUP BY g))""").head()
    val api = BloomSketch.fromBytes(sketchBytes(keysDf(500), 1024, 3))
    assert(viaSql.getBoolean(0) == api.mightContain(42L))
    assert(viaSql.getLong(1) == api.setBits)
    assert(viaSql.getDouble(2) ==
      BigDecimal(api.fppEstimate).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_bloom_sketch(key, CAST(g AS INT), 3) FROM bloom_in GROUP BY g")
        .collect()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
  }

  test("corrupt stored sketches fail descriptively") {
    val good = sketchBytes(keysDf(100), 1024, 3)
    val short = intercept[IllegalArgumentException] {
      BloomSketch.fromBytes(java.util.Arrays.copyOf(good, good.length - 5))
    }
    assert(short.getMessage.contains("corrupt"), short.getMessage)
    val vbad = good.clone(); vbad(0) = 9
    val ver = intercept[IllegalArgumentException] { BloomSketch.fromBytes(vbad) }
    assert(ver.getMessage.contains("version"), ver.getMessage)
    val kbad = good.clone(); kbad(1) = 99
    val ke = intercept[IllegalArgumentException] { BloomSketch.fromBytes(kbad) }
    assert(ke.getMessage.contains("k 99"), ke.getMessage)
    val tiny = intercept[IllegalArgumentException] {
      BloomSketch.fromBytes(Array[Byte](1, 3))
    }
    assert(tiny.getMessage.contains("header"), tiny.getMessage)
  }

  test("mixed-shape sketches refuse to merge") {
    val a = sketchBytes(keysDf(100), 1024, 3)
    val b = sketchBytes(keysDf(100), 2048, 3)
    val c = sketchBytes(keysDf(100), 1024, 2)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val e1 = intercept[Exception] {
      Seq(a, b).toDF("s").agg(BloomMerge(col("s"))).collect()
    }
    assert(messages(e1).exists(_.contains("different shape")), e1.getMessage)
    val e2 = intercept[Exception] {
      Seq(a, c).toDF("s").agg(BloomMerge(col("s"))).collect()
    }
    assert(messages(e2).exists(_.contains("different shape")), e2.getMessage)
  }

  test("non-bigint input fails at analysis time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("key").agg(BloomSketchAgg(col("key"), 1024, 3)).collect()
    }
    assert(e.getMessage.contains("bigint"), e.getMessage)
  }
}
