package graft

import graft.operators.ExactPercentiles
import org.apache.spark.sql.functions._

/** Randomized equivalence vs the reference linear-interpolation
  * quantile (percentile()/quantile_cont semantics), over value sets
  * including negatives and heavy ties, with varying bucket widths —
  * the cases a fixed-seed spec can miss. */
object ExactPercentilesProperties
    extends org.scalacheck.Properties("graft.percentiles") {
  import org.scalacheck.{Gen, Prop, Test}

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session

  private def refQuantile(vs: Seq[Double], q: Double): Double = {
    val a = vs.sorted.toIndexedSeq
    val pos = q * (a.size - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    a(lo) + (a(hi) - a(lo)) * (pos - lo)
  }

  private val values: Gen[List[Double]] =
    Gen.chooseNum(1, 300).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(-40, 40).map(_ / 2.0)))  // ties guaranteed

  private val width: Gen[Double] = Gen.oneOf(0.5, 3.0, 16.0, 1000.0)

  property("bucketed == reference interpolated quantile") =
    Prop.forAll(values, width) { (vs, w) =>
      import spark.implicits._
      val df = vs.zipWithIndex.map { case (v, i) => ("g" + (i % 2), v) }
        .toDF("g", "v")
      val got = ExactPercentiles.compute(df, "g", "v",
          Seq(("25", 0.25), ("50", 0.5), ("90", 0.9)), bucketWidth = w)
        .collect().map(r => r.getAs[String]("g") ->
          Seq(r.getAs[Double]("p_25"), r.getAs[Double]("p_50"),
            r.getAs[Double]("p_90"))).toMap
      val byG = vs.zipWithIndex.groupMap { case (_, i) => "g" + (i % 2) } {
        case (v, _) => v }
      byG.forall { case (g, gvs) =>
        Seq(0.25, 0.5, 0.9).zip(got(g)).forall { case (q, gotV) =>
          math.abs(gotV - refQuantile(gvs, q)) < 1e-9
        }
      }
    }
}

class ExactPercentilesSpec extends SparkSpec {
  import spark.implicits._

  test("two-pass bucketed percentiles equal Spark's exact percentile()") {
    val rnd = new scala.util.Random(47)
    val rows = (1 to 30000).map { _ =>
      (Seq("a", "b", "c")(rnd.nextInt(3)), rnd.nextDouble() * 500)
    }
    val df = rows.toDF("g", "v")
    val want = df.groupBy("g")
      .agg(expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val got = ExactPercentiles.compute(df, "g", "v",
      Seq(("25", 0.25), ("50", 0.5), ("90", 0.9)), bucketWidth = 8.0)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Double]("p_25"), r.getAs[Double]("p_50"),
          r.getAs[Double]("p_90"))).toMap
    want.foreach { case (g, (a, b, c)) =>
      val (x, y, z) = got(g)
      assert(math.abs(x - a) < 1e-9 && math.abs(y - b) < 1e-9 &&
        math.abs(z - c) < 1e-9, s"group $g: got ($x,$y,$z) want ($a,$b,$c)")
    }
  }

  test("checkpoint dir set switches the bounded-frame truncation to the reliable path") {
    // the operator's counts/hist truncations route through
    // Bridge.truncateBounded: with a checkpoint dir on the context
    // they must write reliable checkpoint FILES (executor-loss-safe on
    // a cluster) and still compute the same percentiles; without one
    // (the shared session default) they stay executor-local blocks.
    val df = (1 to 2000).map(i => ("g" + (i % 3), (i % 97).toDouble))
      .toDF("g", "v")
    val expected = ExactPercentiles.compute(df, "g", "v",
        Seq(("50", 0.5)), bucketWidth = 8.0)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("p_50"))
      .toMap
    val ckDir = java.nio.file.Files.createTempDirectory("graft_ck_ep").toString
    val viaReliable = org.apache.spark.sql.graft.Bridge.withCheckpointDir(
      spark.sparkContext, Some(ckDir)) {
      ExactPercentiles.compute(df, "g", "v",
          Seq(("50", 0.5)), bucketWidth = 8.0)
        .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("p_50"))
        .toMap
    }
    assert(viaReliable === expected)
    // mode actually switched: reliable checkpoints leave files behind
    assert(new java.io.File(ckDir).listFiles().nonEmpty)
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
  }

  test("weighted median equals the expanded (weight-replicated) median crossing") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4000).map { i =>
      (Seq("a", "b")(rnd.nextInt(2)), rnd.nextDouble() * 300,
        1L + rnd.nextInt(9).toLong)
    }
    val got = ExactPercentiles.weightedMedian(
        rows.toDF("g", "v", "w"), "g", "v", "w", bucketWidth = 7.0)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("wmedian"))
      .toMap
    // reference: smallest v whose cumulative weight reaches W/2
    rows.groupBy(_._1).foreach { case (g, gr) =>
      val sorted = gr.sortBy(_._2)
      val total = sorted.map(_._3).sum
      var cum = 0L
      val want = sorted.find { r => cum += r._3; 2 * cum >= total }.get._2
      assert(got(g) === want, s"group $g")
    }
  }

  test("weighted percentiles equal the expanded crossing at every rank") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 4000).map { _ =>
      (Seq("a", "b")(rnd.nextInt(2)), rnd.nextDouble() * 300,
        1L + rnd.nextInt(9).toLong)
    }
    val qs = Seq(("25", 1, 4), ("50", 1, 2), ("75", 3, 4), ("90", 9, 10))
    val got = ExactPercentiles.weightedPercentiles(
        rows.toDF("g", "v", "w"), "g", "v", "w", qs, bucketWidth = 7.0)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("total_weight"),
          qs.map { case (l, _, _) => r.getAs[Double](s"p_$l") })).toMap
    rows.groupBy(_._1).foreach { case (g, gr) =>
      val sorted = gr.sortBy(_._2)
      val total = sorted.map(_._3).sum
      def crossing(num: Long, den: Long): Double = {
        var cum = 0L
        sorted.find { r => cum += r._3; den * cum >= num * total }.get._2
      }
      val (gotTotal, gotQs) = got(g)
      assert(gotTotal === total, s"group $g total")
      qs.zip(gotQs).foreach { case ((l, num, den), gotV) =>
        assert(gotV === crossing(num, den), s"group $g p_$l")
      }
    }
  }

  test("weighted percentile at 1/2 equals weightedMedian, ties included") {
    val df = Seq(("g", 5.0, 3L), ("g", 5.0, 3L), ("g", 7.0, 1L),
      ("g", 2.0, 2L), ("h", 9.0, 4L)).toDF("g", "v", "w")
    val wm = ExactPercentiles.weightedMedian(df, "g", "v", "w", 2.0)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("wmedian"))
      .toMap
    val wp = ExactPercentiles.weightedPercentiles(df, "g", "v", "w",
        Seq(("50", 1, 2)), 2.0)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("p_50"))
      .toMap
    assert(wp === wm)
  }

  test("mad() equals the inline two-pass composition byte for byte") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 20000).map { _ =>
      (Seq("a", "b", "c")(rnd.nextInt(3)), rnd.nextDouble() * 200 - 40)
    }
    val df = rows.toDF("g", "v")
    // the literal composition q76 shipped originally — byte-identical
    // results are the regression contract ("hash unchanged"), whatever
    // execution strategy mad() adopts internally
    val med = ExactPercentiles.compute(df, "g", "v",
        Seq(("50", 0.5)), bucketWidth = 16.0)
      .select(col("g"), round(col("p_50"), 4).as("med"))
    val dev = df.join(broadcast(med), "g")
      .withColumn("adev", abs(col("v") - col("med")))
    val want = ExactPercentiles.compute(dev, "g", "adev",
        Seq(("50", 0.5)), bucketWidth = 8.0)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Double]("p_50"), r.getAs[Long]("n"))).toMap
    val got = ExactPercentiles.mad(df, "g", "v",
        bucketWidthV = 16.0, bucketWidthD = 8.0, roundMed = 4)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Double]("p_50"), r.getAs[Long]("n"))).toMap
    assert(got === want)
  }

  test("exact-integer rank positions and tiny groups") {
    // 5 values => p50 position 2.0 exactly (lo == hi), p25 position 1.0
    val df = Seq(("g", 10.0), ("g", 20.0), ("g", 30.0), ("g", 40.0),
      ("g", 50.0), ("h", 7.0)).toDF("g", "v")
    val r = ExactPercentiles.compute(df, "g", "v",
      Seq(("25", 0.25), ("50", 0.5)), bucketWidth = 100.0)
      .collect().map(x => x.getAs[String]("g") ->
        (x.getAs[Double]("p_25"), x.getAs[Double]("p_50"))).toMap
    assert(r("g") === ((20.0, 30.0)))
    // single-value group: every percentile is that value
    assert(r("h") === ((7.0, 7.0)))
  }

  test("histogram state is bounded and pass-2 sorts only target buckets") {
    val df = (1 to 10000).map(i => ("x", i.toDouble % 997)).toDF("g", "v")
    val plan = ExactPercentiles.compute(df, "g", "v",
      Seq(("50", 0.5)), bucketWidth = 50.0)
      .queryExecution.executedPlan.toString
    // the only data-order sort is the in-bucket row_number window,
    // partitioned by (g, b) — never by g alone
    val sorts = "windowspecdefinition\\(g[^)]*row_number[^)]*\\)".r
    val specs = "windowspecdefinition\\([^)]*\\)".r.findAllIn(plan).toList
      .filter(_.contains("specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())"))
    assert(specs.forall(s => s.contains("b#") || s.contains("__r")),
      s"unexpected group-wide sort window:\n${specs.mkString("\n")}")
  }
}
