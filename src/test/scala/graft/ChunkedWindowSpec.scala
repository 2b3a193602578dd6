package graft

import graft.operators.ChunkedWindow
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ChunkedWindowSpec extends SparkSpec {
  import spark.implicits._

  // 20k rows, 3 groups, heavy order-key ties (t has ~13 duplicates per
  // group) and chunkRows small enough that every group crosses many
  // chunk boundaries — the halo path is exercised thousands of times.
  // The extra agg-only column u is the REGRESSION TRIGGER for the
  // chunk-assignment bug: column pruning makes the prefix-sum operator's
  // two range-exchange subtrees structurally different, so without the
  // pinned (localCheckpoint'd) chunk assignment each branch re-samples
  // its own boundaries and the frames silently corrupt.
  private lazy val data = {
    val rnd = new scala.util.Random(23)
    (1 to 20000).map { i =>
      (Seq("a", "b", "c")(rnd.nextInt(3)), i.toLong,
        rnd.nextInt(500).toLong, rnd.nextInt(50).toLong)
    }.toDF("g", "id", "t", "u")
  }

  test("chunked rolling distinct equals the naive single-task window") {
    val naive = data.withColumn("rd",
      size(collect_set(col("u")).over(Window.partitionBy("g")
        .orderBy(col("t"), col("id"))
        .rowsBetween(-99, Window.currentRow))).cast("long"))
      .select("g", "id", "rd")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val chunked = ChunkedWindow.withRollingAggs(data, Seq("g"),
      Seq(col("t"), col("id")), 99,
      Map("rd" -> (w => size(collect_set(col("u")).over(w)).cast("long"))),
      chunkRows = 1000)
      .select("g", "id", "rd")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(chunked === naive)
  }

  test("every frame covers exactly the f preceding rows of the total order") {
    val out = ChunkedWindow.withRollingAggs(data, Seq("g"),
      Seq(col("t"), col("id")), 99,
      Map("mnrn" -> (w => min(col("__rn")).over(w)),
        "self" -> (w => last(col("__rn")).over(w)),
        "fsz" -> (w => count(lit(1)).over(w))),
      chunkRows = 1000)
    val bad = out.filter(col("mnrn") =!= greatest(lit(1L), col("self") - 99) ||
        col("fsz") =!= least(lit(100L), col("self"))).count()
    assert(bad === 0L, s"$bad rows with wrong frame bounds")
  }

  test("output row count equals input row count (halo copies are dropped)") {
    val n = ChunkedWindow.withRollingAggs(data, Seq("g"),
      Seq(col("t"), col("id")), 99,
      Map("x" -> (w => count(lit(1)).over(w))), chunkRows = 500).count()
    assert(n === 20000L)
  }

  test("no window partition spans a whole logical partition") {
    val p = ChunkedWindow.withRollingAggs(data, Seq("g"),
      Seq(col("t"), col("id")), 99,
      Map("x" -> (w => count(lit(1)).over(w))), chunkRows = 1000)
      .queryExecution.executedPlan.toString
    val frameSpecs = "windowspecdefinition\\(g[^)]*\\)".r.findAllIn(p).toList
      .filter(_.contains("RowFrame, -99"))
    assert(frameSpecs.nonEmpty && frameSpecs.forall(_.contains("__tgt")),
      s"frame window must partition on (g, chunk):\n${frameSpecs.mkString("\n")}")
  }
}
