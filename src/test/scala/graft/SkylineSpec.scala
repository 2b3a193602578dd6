package graft

import graft.operators.Skyline

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("frontier keeps exactly the non-dominated points") {
    // (id, price, size): minimize price, maximize size
    val pts = Seq(
      (1L, 10.0, 5L),  // frontier (cheapest)
      (2L, 20.0, 9L),  // frontier
      (3L, 20.0, 7L),  // dominated by 2 (same price, smaller)
      (4L, 30.0, 9L),  // dominated by 2 (same size, pricier)
      (5L, 25.0, 12L), // frontier
      (6L, 40.0, 1L),  // dominated by everything
      (7L, 10.0, 5L)   // exact duplicate of 1 — incomparable, kept
    ).toDF("id", "price", "size")
    val got = Skyline.frontier(pts, "id", "price", "size")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 5L, 7L))
  }

  test("frontier is exact regardless of partitioning") {
    // adversarial split: every partition holds points that locally
    // look like frontier but are dominated cross-partition
    val pts = (1L to 400L)
      .map(i => (i, i.toDouble, if (i % 7 == 0) 500L - i else i % 13))
      .toDF("id", "price", "size").repartition(8)
    val got = Skyline.frontier(pts, "id", "price", "size")
      .collect().map(_.getLong(0)).toSet
    // brute-force oracle
    val all = (1L to 400L)
      .map(i => (i, i.toDouble, if (i % 7 == 0) 500L - i else i % 13))
    val want = all.filter { p =>
      !all.exists(q => q._2 <= p._2 && q._3 >= p._3 &&
        (q._2 < p._2 || q._3 > p._3))
    }.map(_._1).toSet
    assert(got === want)
  }
}
