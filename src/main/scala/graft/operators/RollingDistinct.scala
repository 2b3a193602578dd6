package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding-frame COUNT DISTINCT without per-row set maintenance — the
  * difference-array decomposition of
  * `COUNT(DISTINCT v) OVER (... ROWS BETWEEN f PRECEDING AND CURRENT
  * ROW)`.
  *
  * The window idiom (`size(collect_set(v))` over the frame) makes
  * Spark re-build an O(frame)-sized set PER ROW: collect_set is an
  * imperative aggregate, so a sliding frame re-evaluates the whole
  * buffer at every row — 100× the row count of real work for a
  * 100-row frame, on top of [[ChunkedWindow]]'s halo exchange. This
  * operator replaces all of it with plain running sums:
  *
  * A value v is counted in the frame ending at row j iff the frame
  * contains an occurrence of v — equivalently, iff it contains the
  * FIRST occurrence of v inside the frame. An occurrence at position
  * `rn` (with the same value's previous occurrence at `prev`) is that
  * first-in-frame occurrence exactly for
  *
  *   j ∈ [max(rn, prev + f + 1), rn + f]
  *
  * (`prev + f + 1 ≤ rn + f` always, since `prev < rn` — the interval
  * is never empty; no `prev` means it starts at `rn`). So each
  * occurrence contributes `+1` at the interval start and `−1` one past
  * its end, and the count at row j is the running sum of markers at
  * positions ≤ j — with markers ordered BEFORE the row that shares
  * their position. Every step is a plain shuffle/sort/sum:
  *
  *   1. global row position `rn` per (partitionCols, orderCols) via
  *      [[PrefixSum]] (chunk-distributed — no low-cardinality window);
  *   2. `prev` = lag(rn) over (partitionCols, value) — value
  *      cardinality keys the exchange, so the sort stays distributed;
  *   3. explode each occurrence into its ±1 markers (null values emit
  *      none: COUNT DISTINCT ignores nulls), union them UNDER the rows
  *      (markers first at equal position), and take one more
  *      [[PrefixSum]] running sum of the deltas;
  *   4. keep only the rows.
  *
  * Marker ties (two markers at one position) are order-independent:
  * both sort strictly before the row at that position, so the ROW's
  * running sum — the only value kept — includes them regardless of
  * their mutual order. Output rows/columns equal the input plus
  * `outCol`; the count is exact, bit-identical to the window idiom.
  */
object RollingDistinct {

  /** df + `outCol` = COUNT(DISTINCT valueCol) over the trailing
    * `framePreceding`+1-row frame in (orderCols) order within
    * `partitionCols`. `orderCols` must totally order rows within a
    * logical partition (unique tie-break), as with every chunked
    * window in this package. */
  def withRollingCountDistinct(df: DataFrame, partitionCols: Seq[String],
      orderCols: Seq[Column], valueCol: String, framePreceding: Int,
      outCol: String): DataFrame = {
    require(framePreceding >= 0, s"frame must be >= 0, got $framePreceding")
    val w = framePreceding + 1L
    val part = partitionCols.map(col)
    val rn = PrefixSum.withRunningSum(
      df.withColumn("__one", lit(1L)), partitionCols, orderCols,
      "__one", "__rn").drop("__one")
    val byVal = Window.partitionBy(part :+ col(valueCol): _*)
      .orderBy(col("__rn"))
    val withPrev = rn.withColumn("__prev", lag(col("__rn"), 1).over(byVal))
    val start = when(col("__prev").isNull, col("__rn"))
      .otherwise(greatest(col("__rn"), col("__prev") + w))
    val markers = withPrev
      .filter(col(valueCol).isNotNull)
      .select(part :+ explode(array(
        struct(start.as("__pos"), lit(1L).as("__d")),
        struct((col("__rn") + w).as("__pos"), lit(-1L).as("__d"))))
        .as("__m"): _*)
      .select(part :+ col("__m.__pos").as("__pos")
        :+ col("__m.__d").as("__d"): _*)
      .withColumn("__isrow", lit(0))
    val rows = withPrev.drop("__prev")
      .withColumn("__pos", col("__rn"))
      .withColumn("__d", lit(0L))
      .withColumn("__isrow", lit(1))
    val combined = rows.unionByName(markers, allowMissingColumns = true)
    PrefixSum.withRunningSum(combined, partitionCols,
        Seq(col("__pos"), col("__isrow")), "__d", outCol)
      .filter(col("__isrow") === 1)
      .drop("__rn", "__pos", "__d", "__isrow")
  }
}
