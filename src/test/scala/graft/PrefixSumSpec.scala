package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("distributed running sum equals the naive partitioned window") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 5000).map { i =>
      (Seq("A", "B", "C")(rnd.nextInt(3)), i.toLong, rnd.nextInt(1000).toLong)
    }
    val df = rows.toDF("grp", "id", "v")
    val naive = df.withColumn("cum",
      sum(col("v")).over(Window.partitionBy("grp")
        .orderBy(col("v").desc, col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("grp", "id", "cum")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val dist = PrefixSum.withRunningSum(df, Seq("grp"),
      Seq(col("v").desc, col("id")), "v", "cum", numPartitions = 7)
      .select("grp", "id", "cum")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(dist === naive)
  }

  test("running sum over decimals keeps exact values") {
    val df = (1 to 400)
      .map(i => ("g" + (i % 2), i.toLong, BigDecimal(i) / 100))
      .toDF("grp", "id", "v")
      .withColumn("v", col("v").cast("decimal(12,2)"))
    val naive = df.withColumn("cum",
      sum(col("v")).over(Window.partitionBy("grp").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("grp", "id", "cum")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDecimal(2)).toMap
    val dist = PrefixSum.withRunningSum(df, Seq("grp"), Seq(col("id")),
      "v", "cum", numPartitions = 5)
      .select("grp", "id", "cum")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDecimal(2)).toMap
    assert(dist.keySet === naive.keySet)
    naive.foreach { case (k, v) =>
      assert(dist(k).compareTo(v) == 0, s"row $k: ${dist(k)} vs $v")
    }
  }

  test("running max/min equal the naive windows") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 4000).map { i =>
      (Seq("A", "B")(rnd.nextInt(2)), i.toLong, rnd.nextDouble() * 1000)
    }
    val df = rows.toDF("grp", "id", "v")
    def naive(fn: Column => Column): Map[(String, Long), Double] =
      df.withColumn("r", fn(col("v")).over(Window.partitionBy("grp")
        .orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("grp", "id", "r")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val gotMax = PrefixSum.withRunningMax(df, Seq("grp"), Seq(col("id")),
      "v", "r", numPartitions = 6)
      .select("grp", "id", "r")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val gotMin = PrefixSum.withRunningMin(df, Seq("grp"), Seq(col("id")),
      "v", "r", numPartitions = 6)
      .select("grp", "id", "r")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(gotMax === naive(max))
    assert(gotMin === naive(min))
  }

  test("fused multi-agg pass equals the separate single-agg passes") {
    val df = (1 to 5000).map(i =>
      (s"g${i % 3}", i.toLong, (i * 37 % 101).toDouble)).toDF("grp", "id", "v")
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1))
    val fused = PrefixSum.withRunningAggs(df, Seq("grp"), Seq(col("id")),
        Seq(
          PrefixSum.RunningAgg("v", "mx", max, (l, o) => greatest(l, o)),
          PrefixSum.RunningAgg("v", "mn", min, (l, o) => least(l, o)),
          PrefixSum.RunningAgg("v", "sm", sum,
            (l, o) => l + coalesce(o, lit(0.0)))),
        numPartitions = 7)
      .collect().map(r => key(r) ->
        (r.getAs[Double]("mx"), r.getAs[Double]("mn"), r.getAs[Double]("sm")))
      .toMap
    val mx = PrefixSum.withRunningMax(df, Seq("grp"), Seq(col("id")), "v", "r")
      .collect().map(r => key(r) -> r.getAs[Double]("r")).toMap
    val mn = PrefixSum.withRunningMin(df, Seq("grp"), Seq(col("id")), "v", "r")
      .collect().map(r => key(r) -> r.getAs[Double]("r")).toMap
    val sm = PrefixSum.withRunningSum(df, Seq("grp"), Seq(col("id")), "v", "r")
      .collect().map(r => key(r) -> r.getAs[Double]("r")).toMap
    fused.foreach { case (k, (gmx, gmn, gsm)) =>
      assert(gmx === mx(k) && gmn === mn(k) && gsm === sm(k), s"at $k")
    }
  }

  test("no window partition ever spans more than one range chunk") {
    val df = (1 to 1000).map(i => ("x", i.toLong, 1L)).toDF("grp", "id", "v")
    val p = PrefixSum.withRunningSum(df, Seq("grp"), Seq(col("id")),
      "v", "cum", numPartitions = 8)
      .queryExecution.executedPlan.toString
    // both data-side windows must carry the chunk id in their
    // partition spec — a window partitioned on `grp` alone would be
    // the low-cardinality single-task sort this operator exists to
    // avoid
    val specs = "windowspecdefinition\\([^)]*\\)".r.findAllIn(p).toList
    assert(specs.nonEmpty)
    assert(specs.forall(_.contains("__chunk")),
      s"window spec without chunk id:\n${specs.mkString("\n")}")
  }
}
