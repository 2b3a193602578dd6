package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Bounded-ROWS-frame window aggregation over LOW-cardinality
  * partitions, distributed by halo-chunking.
  *
  * A frame like `ROWS BETWEEN f PRECEDING AND CURRENT ROW` needs only
  * f+1 rows of context per output row, but Spark's WindowExec still
  * sorts the ENTIRE window partition inside one task — fatal when the
  * partition key is a 5-value type column and the partition is a fifth
  * of the table. The fix is the classic halo (ghost-cell) exchange:
  *
  *   1. assign each row its global position `rn` within (partitionCols,
  *      orderCols) via [[PrefixSum]] — itself chunk-distributed;
  *   2. cut each logical partition into chunks of `chunkRows`; ship
  *      every row to its own chunk, and ALSO to the next chunk if it
  *      falls in the last f rows of its chunk (the halo copy);
  *   3. run the frame aggregation partitioned by (partitionCols,
  *      chunk) — every chunk now holds its full left context, at most
  *      chunkRows + f rows per task — and keep only the non-halo rows.
  *
  * Row `rn` of chunk c sees exactly rows [rn-f, rn]: those with
  * position ≥ c·chunkRows live in the chunk, the rest arrive as halo
  * copies. Shuffle overhead is the halo fraction f/chunkRows; task
  * memory is bounded by chunkRows + f regardless of data or key
  * cardinality.
  */
object ChunkedWindow {

  /** df + one column per (name → agg builder) entry, where each
    * builder receives the (chunk-partitioned) WindowSpec for the frame
    * `ROWS BETWEEN framePreceding PRECEDING AND CURRENT ROW` in
    * (orderCols) order. `orderCols` must totally order rows within a
    * logical partition (unique tie-break) so positions — and therefore
    * frames — are reproducible. */
  def withRollingAggs(df: DataFrame, partitionCols: Seq[String],
      orderCols: Seq[Column], framePreceding: Int,
      aggs: Map[String, WindowSpec => Column],
      chunkRows: Int = 65536): DataFrame = {
    require(framePreceding >= 0 && framePreceding < chunkRows,
      s"frame $framePreceding must be smaller than a chunk ($chunkRows)")
    val part = partitionCols.map(col)
    val rn = PrefixSum.withRunningSum(
      df.withColumn("__one", lit(1L)), partitionCols, orderCols,
      "__one", "__rn").drop("__one")
      // integer `div`, never `/`: double division loses exactness past
      // 2^53 rows — chunk ids must be exact at any scale
      .withColumn("__c0", expr(s"(__rn - 1) div $chunkRows"))
    // halo: the last `framePreceding` rows of each chunk also serve as
    // left context for the NEXT chunk
    val routed = rn
      .withColumn("__tgt", explode(when(
        expr(s"(__rn - 1) % $chunkRows") >= chunkRows - framePreceding,
        array(col("__c0"), col("__c0") + 1)).otherwise(array(col("__c0")))))
    val w = Window.partitionBy(part :+ col("__tgt"): _*)
      .orderBy(col("__rn"))
      .rowsBetween(-framePreceding, Window.currentRow)
    val agged = aggs.foldLeft(routed) { case (acc, (name, mk)) =>
      acc.withColumn(name, mk(w))
    }
    // drop the halo copies: only the row's own chunk emits it
    agged.filter(col("__tgt") === col("__c0"))
      .drop("__rn", "__c0", "__tgt")
  }
}
