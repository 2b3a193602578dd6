package graft

import graft.functions.KthSmallest
import org.apache.spark.sql.functions._

class KthSmallestSpec extends SparkSpec {
  import spark.implicits._

  test("matches the sort-based answer on random groups") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(5000)((rnd.nextInt(20), rnd.nextInt(1000).toDouble))
    val df = rows.toDF("g", "v").repartition(7)
    val kth = udaf(new KthSmallest(3))
    val got = df.groupBy("g").agg(kth(col("v")).as("k3"))
      .as[(Int, Double)].collect().toMap
    val want = rows.groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted.apply(2) }
    assert(got === want)
  }

  test("merge is insensitive to partitioning") {
    val rows = (1 to 100).map(i => (1, i.toDouble))
    val kth = udaf(new KthSmallest(5))
    val answers = Seq(1, 3, 13).map { n =>
      rows.toDF("g", "v").repartition(n)
        .groupBy("g").agg(kth(col("v"))).as[(Int, Double)].head()._2
    }
    assert(answers.distinct === Seq(5.0))
  }

  test("duplicates count toward k") {
    val df = Seq((1, 2.0), (1, 2.0), (1, 2.0), (1, 9.0)).toDF("g", "v")
    val kth = udaf(new KthSmallest(3))
    assert(df.groupBy("g").agg(kth(col("v"))).as[(Int, Double)].head()._2 === 2.0)
  }

  test("undersized groups yield NaN") {
    val df = Seq((1, 2.0)).toDF("g", "v")
    val kth = udaf(new KthSmallest(3))
    assert(df.groupBy("g").agg(kth(col("v"))).as[(Int, Double)].head()._2.isNaN)
  }

  test("the q65 oracle-alignment filter drops undersized groups structurally") {
    // the DuckDB oracle (WHERE rn = k) yields NO row for a group with
    // fewer than k values; the Spark side must drop it too, not emit NaN
    val df = Seq((1, 2.0), (1, 3.0), (1, 9.0), (2, 5.0)).toDF("g", "v")
    val kth = udaf(new KthSmallest(3))
    val rows = df.groupBy("g").agg(kth(col("v")).as("k3"))
      .filter(!isnan(col("k3")))
      .as[(Int, Double)].collect().toMap
    assert(rows === Map(1 -> 9.0))
  }
}
