package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucket-accelerated range (band) join: `fact.value ∈ [dim.lo, dim.hi)`.
  *
  * Spark has no native range-join optimization, so a naive band join
  * plans as a nested-loop that evaluates every (row, band) pair. The
  * standard fix is interval bucketing: quantize the value axis into
  * fixed-width buckets, expand each band to the buckets it overlaps,
  * equi-join on the bucket id, and re-verify the exact predicate. The
  * join becomes a hash join on an integer key whose fan-out is bounded
  * by (band width / bucketWidth), independent of fact cardinality —
  * the shape that survives 100 TB fact tables.
  */
object RangeJoin {

  /** @param fact        large side, probed once
    * @param bands       small side with [loCol, hiCol) ranges (broadcast)
    * @param valueCol    fact column to band
    * @param bucketWidth value-axis quantum; choose ≈ the narrowest band
    *                    so each band expands to a handful of buckets
    */
  def banded(fact: DataFrame, bands: DataFrame, valueCol: String,
      loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    def bucket(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    // a band covers buckets floor(lo/w)..floor(hi/w); the hi bucket may
    // over-cover when hi is a multiple of w — the exact verify below
    // removes those rows, so correctness never depends on the quantum
    val expanded = bands.withColumn("__bucket",
      explode(sequence(bucket(col(loCol)), bucket(col(hiCol)))))
    fact.withColumn("__bucket", bucket(col(valueCol)))
      .join(broadcast(expanded), Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
