package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact 2-D skyline (Pareto frontier): the rows not strictly
  * dominated under (minimize `xCol`, maximize `yCol`). `q` dominates
  * `p` iff `q.x <= p.x && q.y >= p.y` with at least one strict — ties
  * on BOTH axes are incomparable, so exact duplicates all survive.
  *
  * Scale shape — the classic two-phase decomposition:
  *   phase 1: each partition computes its LOCAL frontier with one
  *     sorted scan (sort by (x asc, y desc): a point is dominated iff
  *     a strictly-cheaper point reached its y, or a same-x point
  *     exceeds it). Global-frontier membership implies local-frontier
  *     membership, so phase 1 never drops a true answer — and for
  *     anti-correlated-at-worst data it prunes each partition to
  *     O(frontier) points.
  *   phase 2: the survivors (|partitions| × local frontier — tiny)
  *     are shuffled to ONE task (`repartition(1)`, a real exchange:
  *     `coalesce(1)` would drag phase 1 into the same task) and the
  *     same scan runs once more over the union.
  *
  * The full input is never globally sorted and never leaves its
  * partition; only frontier candidates shuffle.
  */
object Skyline {

  /** (id, x, y) rows of the frontier, unordered — callers sort. */
  def frontier(df: DataFrame, idCol: String, xCol: String,
      yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df.select(col(idCol).cast("long").as("id"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .as[(Long, Double, Double)]

    def scan(it: Iterator[(Long, Double, Double)]):
        Iterator[(Long, Double, Double)] = {
      // sort by (x asc, y desc, id): within an x-group the first row
      // carries the group's max y; groups fold into the strict-less
      // running max only when x advances.
      val sorted = it.toArray
      java.util.Arrays.sort(sorted,
        Ordering.by[(Long, Double, Double), (Double, Double, Long)](
          p => (p._2, -p._3, p._1)))
      val out = Array.newBuilder[(Long, Double, Double)]
      var bestLess = Double.NegativeInfinity // max y over x strictly less
      var groupX = Double.NaN
      var groupMaxY = Double.NegativeInfinity
      var i = 0
      while (i < sorted.length) {
        val p = sorted(i)
        if (i == 0 || p._2 != groupX) {
          bestLess = math.max(bestLess, groupMaxY)
          groupX = p._2
          groupMaxY = p._3
        }
        // dominated by a strictly-cheaper point with y >= ours, or a
        // same-price point with y strictly greater
        if (!(bestLess >= p._3 || groupMaxY > p._3)) out += p
        i += 1
      }
      out.result().iterator
    }

    pts.mapPartitions(scan)
      .repartition(1)
      .mapPartitions(scan)
      .toDF(idCol, xCol, yCol)
  }
}
