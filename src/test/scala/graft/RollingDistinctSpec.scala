package graft

import graft.operators.RollingDistinct
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The difference-array rolling COUNT DISTINCT must equal the window
  * idiom (`size(collect_set)` over the ROWS frame) row for row — on
  * data with heavy value repeats inside the frame, multiple logical
  * partitions, frame-boundary hits, and nulls (which COUNT DISTINCT
  * ignores). */
class RollingDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame, f: Int) = {
    val w = Window.partitionBy("g").orderBy(col("o"))
      .rowsBetween(-f, Window.currentRow)
    df.withColumn("want", size(collect_set(col("v")).over(w)).cast("long"))
  }

  test("matches the window idiom on repeat-heavy data with nulls") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 5000L).map { i =>
      val g = "g" + (i % 3)
      // small value pool forces repeats well inside a 25-row frame;
      // ~6% nulls exercise the COUNT DISTINCT null contract
      val v: java.lang.Long =
        if (rnd.nextInt(16) == 0) null else Long.box(rnd.nextInt(9).toLong)
      (g, i, v)
    }
    val df = rows.toDF("g", "o", "v")
    for (f <- Seq(0, 3, 24)) {
      val got = RollingDistinct.withRollingCountDistinct(
          df, Seq("g"), Seq(col("o")), "v", f, "got")
      val joined = got.join(reference(df, f), Seq("g", "o"))
      val bad = joined.filter(col("got") =!= col("want")).count()
      assert(bad === 0L, s"frame=$f: $bad mismatching rows")
      assert(got.count() === rows.size.toLong, s"frame=$f row count")
    }
  }

  test("first rows of a partition see the truncated frame") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 11L),
        ("a", 4L, 10L), ("b", 1L, 10L))
      .toDF("g", "o", "v")
    val got = RollingDistinct.withRollingCountDistinct(
        df, Seq("g"), Seq(col("o")), "v", 1, "c")
      .select("g", "o", "c").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(("a", 1L) -> 1L, ("a", 2L) -> 1L,
      ("a", 3L) -> 2L, ("a", 4L) -> 2L, ("b", 1L) -> 1L))
  }
}
