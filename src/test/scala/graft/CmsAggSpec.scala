package graft

import graft.functions.{CmsMerge, CmsQuery, CmsSketch, CmsSketchAgg}
import org.apache.spark.sql.functions._

/** Contract for the mergeable Count-Min aggregate family: exact
  * integer counters merged by sum, so — like the HLL twin and unlike
  * the t-digest — the spec asserts BIT-IDENTITY across partitioning
  * and rollup grouping, plus the classic CMS guarantee (estimate ≥
  * exact, equality when the counter table out-sizes the key set).
  */
class CmsAggSpec extends SparkSpec {
  import spark.implicits._

  /** `keys` distinct keys, key k appearing (k mod 5)+1 times, grouped
    * by g = k mod groups. */
  private def skewed(keys: Int, groups: Int = 1) =
    spark.range(keys.toLong)
      .select(col("id").as("key"),
        explode(sequence(lit(0L), col("id") % 5L)))
      .select(col("key"), pmod(col("key"), lit(groups.toLong)).as("g"))

  private def sketchBytes(df: org.apache.spark.sql.DataFrame, w: Int): Array[Byte] =
    df.agg(CmsSketchAgg(col("key"), w).as("s")).head().getAs[Array[Byte]](0)

  test("sketch bytes are bit-identical across partitioning") {
    val base = skewed(2000)
    val ref = sketchBytes(base, 64)
    for (parts <- Seq(1, 7, 32)) {
      val b = sketchBytes(base.repartition(parts), 64)
      assert(java.util.Arrays.equals(ref, b), s"parts=$parts bytes differ")
    }
  }

  test("two-level merge rollup is bit-identical to one-level aggregation") {
    val df = skewed(2000, groups = 13)
    val oneLevel = sketchBytes(df, 64)
    val twoLevel = df.groupBy("g")
      .agg(CmsSketchAgg(col("key"), 64).as("s"))
      .agg(CmsMerge(col("s")).as("m"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(oneLevel, twoLevel))
    val rt = CmsSketch.fromBytes(twoLevel).toBytes
    assert(java.util.Arrays.equals(oneLevel, rt))
  }

  test("estimates never undercount, and are exact when w outsizes the keys") {
    val df = skewed(500)
    val exact = df.groupBy("key").agg(count(lit(1)).as("exact")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // forced collisions at w=16: >= always
    val tight = CmsSketch.fromBytes(sketchBytes(df, 16))
    exact.foreach { case (k, n) =>
      assert(tight.query(k) >= n, s"key $k: ${tight.query(k)} < $n")
    }
    // comfortable width: d=4 rows of 4096 buckets for 500 keys — the
    // min over rows should be exact for every key here
    val wide = CmsSketch.fromBytes(sketchBytes(df, 4096))
    exact.foreach { case (k, n) =>
      assert(wide.query(k) == n, s"key $k: ${wide.query(k)} != $n")
    }
    // an unseen key reads 0 at this width
    assert(wide.query(999999L) == 0L)
  }

  test("negative keys hash safely (pmod) and keep the guarantee") {
    val df = Seq(-1L, -1L, -2L, Long.MinValue, Long.MinValue, Long.MinValue)
      .toDF("key")
    val sk = CmsSketch.fromBytes(sketchBytes(df, 1024))
    assert(sk.query(-1L) >= 2L)
    assert(sk.query(-2L) >= 1L)
    assert(sk.query(Long.MinValue) >= 3L)
  }

  test("SQL registration matches the DataFrame API") {
    skewed(500, groups = 7).createOrReplaceTempView("cms_in")
    val viaSql = spark.sql("""
      SELECT graft_cms_query(graft_cms_merge(s), 42L) AS e
      FROM (SELECT g, graft_cms_sketch(key, 64) AS s FROM cms_in GROUP BY g)""")
      .head().getLong(0)
    val viaApi = CmsSketch.fromBytes(sketchBytes(skewed(500), 64)).query(42L)
    assert(viaSql == viaApi, s"SQL $viaSql != API $viaApi")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_cms_sketch(key, CAST(g AS INT)) FROM cms_in GROUP BY g")
        .collect()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
  }

  test("corrupt stored sketches fail descriptively") {
    val good = sketchBytes(skewed(100), 16)
    val short = intercept[IllegalArgumentException] {
      CmsSketch.fromBytes(java.util.Arrays.copyOf(good, good.length - 5))
    }
    assert(short.getMessage.contains("corrupt"), short.getMessage)
    val vbad = good.clone(); vbad(0) = 9
    val ver = intercept[IllegalArgumentException] { CmsSketch.fromBytes(vbad) }
    assert(ver.getMessage.contains("version"), ver.getMessage)
    val tiny = intercept[IllegalArgumentException] {
      CmsSketch.fromBytes(Array[Byte](1, 0))
    }
    assert(tiny.getMessage.contains("header"), tiny.getMessage)
  }

  test("mixed-width sketches refuse to merge") {
    val s16 = sketchBytes(skewed(100), 16)
    val s32 = sketchBytes(skewed(100), 32)
    val e = intercept[Exception] {
      Seq(s16, s32).toDF("s").agg(CmsMerge(col("s"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("different width")), e.getMessage)
  }

  test("non-bigint input fails at analysis time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("key").agg(CmsSketchAgg(col("key"), 16)).collect()
    }
    assert(e.getMessage.contains("bigint"), e.getMessage)
  }

  test("inner product estimates join size: >= exact always, == when wide") {
    val a = skewed(400)                       // key k appears (k%5)+1 times
    val b = skewed(700).filter(col("key") >= 200L) // overlap on [200, 400)
    val ca = a.groupBy("key").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cb = b.groupBy("key").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exactJoin = ca.map { case (k, n) => n * cb.getOrElse(k, 0L) }.sum
    // comfortable width: no cross-key collisions expected -> exact
    val wideA = CmsSketch.fromBytes(sketchBytes(a, 1 << 16))
    val wideB = CmsSketch.fromBytes(sketchBytes(b, 1 << 16))
    assert(wideA.innerProduct(wideB) == exactJoin,
      s"wide: ${wideA.innerProduct(wideB)} != $exactJoin")
    // forced collisions at w=16: never under, and symmetric
    val tightA = CmsSketch.fromBytes(sketchBytes(a, 16))
    val tightB = CmsSketch.fromBytes(sketchBytes(b, 16))
    assert(tightA.innerProduct(tightB) >= exactJoin)
    assert(tightA.innerProduct(tightB) == tightB.innerProduct(tightA))
    // self inner product >= F2 = sum of squared counts
    val f2 = ca.values.map(n => n * n).sum
    assert(tightA.innerProduct(tightA) >= f2)
    assert(wideA.innerProduct(wideA) == f2)
  }

  test("inner product overflow fails loudly, never wraps") {
    // two sketches whose counters multiply past 2^63: every bucket of
    // a w=16 sketch loaded to ~2^33 via weighted adds
    val big = new CmsSketch(16)
    (0L until 16L).foreach(k => big.add(k, 1L << 33))
    val e = intercept[ArithmeticException] { big.innerProduct(big) }
    assert(e.getMessage.contains("overflows"), e.getMessage)
  }

  test("inner product: SQL matches API, mixed widths refuse") {
    skewed(300, groups = 2).createOrReplaceTempView("cms_ip")
    val viaSql = spark.sql("""
      WITH s AS (SELECT g, graft_cms_sketch(key, 64) AS sk
                 FROM cms_ip GROUP BY g)
      SELECT graft_cms_inner(a.sk, b.sk) AS ip
      FROM s a JOIN s b ON a.g = 0 AND b.g = 1""").head().getLong(0)
    val s0 = CmsSketch.fromBytes(
      sketchBytes(skewed(300, groups = 2).filter(col("g") === 0L), 64))
    val s1 = CmsSketch.fromBytes(
      sketchBytes(skewed(300, groups = 2).filter(col("g") === 1L), 64))
    assert(viaSql == s0.innerProduct(s1), s"SQL $viaSql != API")
    val e = intercept[IllegalArgumentException] {
      s0.innerProduct(CmsSketch.fromBytes(sketchBytes(skewed(100), 32)))
    }
    assert(e.getMessage.contains("different width"), e.getMessage)
  }
}
