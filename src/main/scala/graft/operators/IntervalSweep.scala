package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic interval-overlap sweep, distributed: every interval
  * contributes a +1 at `start` and a -1 at `end` (end EXCLUSIVE — a
  * session ending exactly when another starts does not overlap it);
  * the running sum of deltas in time order is the concurrency curve,
  * and its max per partition is the peak.
  *
  * The sweep window partitions on `partitionCols`, so each window holds
  * one partition's boundary points — pick partitions that bound the
  * data (tenant × day, type × day) and no global sort ever happens.
  * Rows tied on (t, delta) carry equal deltas, so every prefix-sum
  * order consistent with the sort yields the same running-max: the
  * peak is deterministic even though per-row prefixes are not.
  */
object IntervalSweep {

  /** Peak concurrency + interval count per partition key. `startCol`/
    * `endCol` must be monotonic in time, mutually comparable (epoch
    * numbers recommended: integer compare, no timezone) and NON-NULL:
    * a null boundary would sort NULLS FIRST in Spark's window but
    * NULLS LAST in a SQL oracle's ORDER BY, silently corrupting the
    * two running sums DIFFERENTLY — so it fails loudly per row
    * instead. */
  def peakConcurrency(intervals: DataFrame, partitionCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    val part = partitionCols.map(col)
    def boundary(c: String): Column =
      when(col(c).isNull, raise_error(
        lit(s"IntervalSweep: null $c boundary value"))).otherwise(col(c))
    val pts = intervals.select(part :+ boundary(startCol).as("t") :+ lit(1).as("delta"): _*)
      .unionByName(
        intervals.select(part :+ boundary(endCol).as("t") :+ lit(-1).as("delta"): _*))
    val sweep = Window.partitionBy(part: _*)
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("run", sum(col("delta")).over(sweep))
      .groupBy(part: _*)
      .agg(sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_intervals"),
        max(col("run")).as("peak"))
  }
}
