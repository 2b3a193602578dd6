package graft

import graft.operators.TableDiff
import org.apache.spark.sql.functions._

class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies added/removed/changed/unchanged, null-safely") {
    val a = Seq(
      (1L, Some("x"), 10.0), (2L, Some("y"), 20.0),
      (3L, None: Option[String], 30.0), (4L, Some("z"), 40.0))
      .toDF("k", "s", "v")
    val b = Seq(
      (1L, Some("x"), 10.0),              // unchanged
      (2L, Some("y"), 99.0),              // changed value
      (3L, None: Option[String], 30.0),   // unchanged (NULL <=> NULL)
      (5L, Some("w"), 50.0))              // added; 4 removed
      .toDF("k", "s", "v")
    val got = TableDiff.diff(a, b, Seq("k"))
      .select("k", "diff_status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", 4L -> "removed", 5L -> "added"))
  }

  test("null to value transitions are changed, not unchanged") {
    val a = Seq((1L, None: Option[String])).toDF("k", "s")
    val b = Seq((1L, Some("now set"))).toDF("k", "s")
    val got = TableDiff.diff(a, b, Seq("k"))
      .select("diff_status").as[String].head()
    assert(got === "changed")
  }

  test("mismatched schemas are rejected loudly") {
    val a = Seq((1L, "x")).toDF("k", "s")
    val b = Seq((1L, "x")).toDF("k", "other")
    intercept[IllegalArgumentException] {
      TableDiff.diff(a, b, Seq("k"))
    }
  }
}
