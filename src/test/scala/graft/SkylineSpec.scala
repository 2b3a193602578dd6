package graft

import graft.operators.Skyline

/** Randomized equivalence: the two-phase frontier must match the
  * O(n²) dominance definition on arbitrary point sets — including
  * duplicate coordinates and axis ties — under arbitrary partitioning.
  */
object SkylineProperties extends org.scalacheck.Properties("graft.skyline") {
  import org.scalacheck.{Gen, Prop, Test}

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session

  private val pts: Gen[List[(Double, Double)]] =
    Gen.chooseNum(1, 120).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0, 15).map(_.toDouble),
        Gen.chooseNum(0, 15).map(_.toDouble))))

  property("frontier == brute-force dominance filter") = Prop.forAll(pts) { ps =>
    import spark.implicits._
    val rows = ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    val got = Skyline.frontier(
        rows.toDF("id", "x", "y").repartition(5), "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    val want = rows.filter { p =>
      !rows.exists(q => q._2 <= p._2 && q._3 >= p._3 &&
        (q._2 < p._2 || q._3 > p._3))
    }.map(_._1).toSet
    got == want
  }
}

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
