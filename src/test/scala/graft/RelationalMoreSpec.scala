package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

class RelationalMoreSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on events") {
    val dir = "/root/testdata/sf0.01"
    val approx = Catalog.byName("q30_approx_distinct").build(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, dir, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.05,
        s"$k: approx=${approx(k)} exact=$e")
    }
  }

  test("q70 approx percentiles honor the GK rank-error bound vs exact") {
    val dir = "/root/testdata/sf0.01"
    val approx = Catalog.byName("q70_approx_percentiles").build(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val values = Tables(spark, dir, "events")
      .select(col("event_type"), col("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    // rank error ≤ n/accuracy (+2 slack for the discrete floor/ceil
    // rank arithmetic); duplicates make the returned value occupy a
    // rank INTERVAL [count(<v), count(<=v)], so the bound is checked
    // against the interval, not a single rank
    values.foreach { case (et, sorted) =>
      val n = sorted.length
      val tol = n.toDouble / 10000 + 2
      val (p25, p50, p75) = approx(et)
      Seq(0.25 -> p25, 0.5 -> p50, 0.75 -> p75).foreach { case (q, v) =>
        val lo = sorted.count(_ < v)
        val hi = sorted.count(_ <= v)
        val target = q * n
        assert(lo - tol <= target && target <= hi + tol,
          s"$et q=$q: value $v spans ranks [$lo,$hi] of $n, target $target ± $tol")
      }
    }
  }

  test("q71 KMV estimate lands within the sketch's error envelope") {
    val dir = "/root/testdata/sf0.01"
    val r = Catalog.byName("q71_kmv_distinct").build(spark, dir).collect()(0)
    val exact = r.getAs[Long]("n_exact").toDouble
    val est = r.getAs[Double]("kmv_estimate")
    // std error ≈ 1/√(k−2) ≈ 12.7% at k=64; allow 4σ
    assert(math.abs(est - exact) / exact < 0.51,
      s"KMV estimate $est vs exact $exact")
    assert(r.getAs[Long]("k_used") === 64L)
  }

  test("salted join equals plain join") {
    val large = Seq((1L, "a"), (1L, "b"), (2L, "c"), (1L, "d"))
      .toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("sk", "name")
    val plain = large.join(small, col("k") === col("sk"))
      .select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val salted = SaltedJoin.inner(large, small, "k", "sk",
      saltSource = col("payload"), nSalts = 4)
      .select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
  }

  test("csv and json readers round-trip with explicit schemas") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_io").toString
    val df = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "name", "v")
    df.write.option("header", "true").csv(s"$dir/csv")
    df.write.json(s"$dir/json")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    val csvBack = graft.sources.Sinks.readCsv(spark, s"$dir/csv", schema)
    val jsonBack = graft.sources.Sinks.readJson(spark, s"$dir/json", schema)
    assert(csvBack.orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(jsonBack.orderBy("id").collect().map(_.getDouble(2)).toSeq === Seq(1.5, 2.5))
  }
}
