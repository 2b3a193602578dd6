package graft

import graft.functions.{SampleEntries, SampleMerge, SampleSketch, SampleSketchAgg}
import org.apache.spark.sql.functions._

/** Contract for the mergeable weighted-sample sketch: exact top-k by
  * per-key MAX priority (the coordinated bottom-k construction), so —
  * like the HLL/CMS/Bloom/MinHash families — the spec asserts
  * BIT-IDENTITY across partitioning, rollup grouping, and trim
  * schedules, plus the weighting semantics (max of c uniforms ≡ the
  * Efraimidis–Spirakis u^(1/c) priority).
  */
class SampleAggSpec extends SparkSpec {
  import spark.implicits._

  /** rows (key, prio, g): key i gets (i % 7) + 1 rows with distinct
    * LCG-spread priorities, grouped by g = key mod groups. */
  private def rows(keysN: Int, groups: Int = 1) =
    spark.range(keysN.toLong)
      .select(col("id").as("key"), explode(sequence(lit(0L), col("id") % 7L)).as("r"))
      .select(col("key"),
        pmod((col("key") * lit(7919L) + col("r")) * lit(1103515245L) + lit(12345L),
          lit(2147483647L)).as("prio"),
        pmod(col("key"), lit(groups.toLong)).as("g"))

  private def sketchBytes(df: org.apache.spark.sql.DataFrame, k: Int): Array[Byte] =
    df.agg(SampleSketchAgg(col("key"), col("prio"), k).as("s"))
      .head().getAs[Array[Byte]](0)

  /** driver-side reference: exact top-k keys by (max prio desc, key asc). */
  private def reference(df: org.apache.spark.sql.DataFrame, k: Int): Seq[(Long, Long)] =
    df.groupBy("key").agg(max("prio").as("p")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (key, p) => (-p, key) }.take(k).toSeq

  test("sketch equals the exact top-k by per-key max priority") {
    val df = rows(300)
    val got = SampleSketch.fromBytes(sketchBytes(df, 10)).entries.toSeq
    assert(got === reference(df, 10).map { case (k, p) => (k, p) })
  }

  test("sketch bytes are bit-identical across partitioning (trim schedules differ)") {
    val base = rows(500)
    val ref = sketchBytes(base, 8)
    for (parts <- Seq(1, 7, 32)) {
      val b = sketchBytes(base.repartition(parts), 8)
      assert(java.util.Arrays.equals(ref, b), s"parts=$parts bytes differ")
    }
  }

  test("two-level merge rollup is bit-identical to one-level aggregation") {
    val df = rows(500, groups = 13)
    val oneLevel = sketchBytes(df, 8)
    val twoLevel = df.groupBy("g")
      .agg(SampleSketchAgg(col("key"), col("prio"), 8).as("s"))
      .agg(SampleMerge(col("s")).as("m"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(oneLevel, twoLevel))
    val rt = SampleSketch.fromBytes(twoLevel).toBytes
    assert(java.util.Arrays.equals(oneLevel, rt))
  }

  test("max-priority weighting: heavy keys dominate the sample") {
    // even keys get 40 rows (40 priority draws), odd keys 1: the k=20
    // sample should be overwhelmingly even keys
    val df = spark.range(200)
      .select(col("id").as("key"),
        explode(sequence(lit(0L),
          when(col("id") % 2 === 0, 39L).otherwise(0L))).as("r"))
      .select(col("key"),
        pmod((col("key") * lit(7919L) + col("r")) * lit(1103515245L) + lit(12345L),
          lit(2147483647L)).as("prio"))
    val es = SampleSketch.fromBytes(sketchBytes(df, 20)).entries
    val heavy = es.count(_._1 % 2 == 0)
    assert(heavy >= 17, s"expected mostly heavy keys, got $heavy/20")
  }

  test("fewer keys than k yields all keys; entries are rank-ordered") {
    val df = rows(5)
    val es = SampleSketch.fromBytes(sketchBytes(df, 10)).entries
    assert(es.length == 5)
    es.sliding(2).foreach { case Array((k1, p1), (k2, p2)) =>
      assert(p1 > p2 || (p1 == p2 && k1 < k2), "entries must be rank-ordered")
    }
  }

  test("SQL registration matches the DataFrame API") {
    rows(300, groups = 7).createOrReplaceTempView("samp_in")
    val viaSql = spark.sql("""
      SELECT graft_sample_entries(graft_sample_merge(s)) AS e
      FROM (SELECT g, graft_sample_sketch(key, prio, 6) AS s
            FROM samp_in GROUP BY g)""")
      .select(explode(col("e")).as("x"))
      .select(col("x.key"), col("x.priority"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaApi = SampleSketch.fromBytes(sketchBytes(rows(300), 6)).entries.toSeq
    assert(viaSql === viaApi)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_sample_sketch(key, prio, CAST(g AS INT)) FROM samp_in GROUP BY g")
        .collect()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
  }

  test("corrupt stored sketches fail descriptively") {
    val good = sketchBytes(rows(100), 5)
    val short = intercept[IllegalArgumentException] {
      SampleSketch.fromBytes(java.util.Arrays.copyOf(good, good.length - 3))
    }
    assert(short.getMessage.contains("corrupt"), short.getMessage)
    val vbad = good.clone(); vbad(0) = 9
    val ver = intercept[IllegalArgumentException] { SampleSketch.fromBytes(vbad) }
    assert(ver.getMessage.contains("version"), ver.getMessage)
    val tiny = intercept[IllegalArgumentException] {
      SampleSketch.fromBytes(Array[Byte](1, 0))
    }
    assert(tiny.getMessage.contains("header"), tiny.getMessage)
  }

  test("mixed-k sketches refuse to merge") {
    val s5 = sketchBytes(rows(100), 5)
    val s9 = sketchBytes(rows(100), 9)
    val e = intercept[Exception] {
      Seq(s5, s9).toDF("s").agg(SampleMerge(col("s"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("different k")), e.getMessage)
  }

  test("non-bigint inputs fail at analysis time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("x", 1L)).toDF("key", "prio")
        .agg(SampleSketchAgg(col("key"), col("prio"), 5)).collect()
    }
    assert(e.getMessage.contains("bigint"), e.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, "x")).toDF("key", "prio")
        .agg(SampleEntries(col("prio"))).collect()
    }
    assert(e2.getMessage.contains("binary"), e2.getMessage)
  }
}
