package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum (running/cumulative sum over a total order)
  * without the low-cardinality-partition window it naively plans to.
  *
  * `sum().over(Window.partitionBy(k).orderBy(o))` sorts EVERY row of a
  * logical partition inside one task — fine when `k` has cardinality ≥
  * the shuffle parallelism, a scale-killer when it doesn't (a 3-value
  * flag column means 3 tasks each sorting a third of the data, however
  * large the data grows). This operator decomposes the running sum the
  * same way [[Pipeline.distributedNtile]] decomposes global rank:
  *
  *   1. range-repartition on (partitionCols ++ orderCols) into
  *      `numPartitions` chunks — each chunk holds a contiguous slice
  *      of the total order, sized by data volume, not key cardinality;
  *   2. per-chunk local running sums (window partitioned by
  *      (partitionCols, chunk id) — every window partition is at most
  *      one chunk, so sorts stay partition-local);
  *   3. per-chunk totals, cumulated over the TINY (≤ numPartitions
  *      rows per logical partition) frame and broadcast back as
  *      offsets. prefix = local + offset-of-earlier-chunks.
  *
  * Determinism: `orderCols` must be a total order within each logical
  * partition (add a unique tie-break column); the prefix sum over a
  * total order is well-defined under ANY chunk-boundary placement, and
  * the explicit `numPartitions` keeps AQE from re-coalescing the range
  * exchange (chunk ids must agree between the local-sum branch and the
  * totals branch — same-subplan exchange reuse makes them literally
  * the same shuffle, and RangePartitioner's fixed per-input-partition
  * sampling seed makes boundaries reproducible even when it doesn't).
  */
object PrefixSum {

  /** df + `outCol` = running sum of `valueCol` over `orderCols` within
    * `partitionCols`, equal row-for-row to
    * `sum(valueCol).over(Window.partitionBy(partitionCols).orderBy(orderCols)
    * .rowsBetween(unboundedPreceding, currentRow))`. */
  def withRunningSum(df: DataFrame, partitionCols: Seq[String],
      orderCols: Seq[Column], valueCol: String, outCol: String,
      numPartitions: Int = 0): DataFrame =
    withRunningAgg(df, partitionCols, orderCols, valueCol, outCol,
      numPartitions)(sum, (loc, off) => loc + coalesce(off, lit(0)))

  /** Running MAX — the same chunk decomposition applied to another
    * associative combine (max(a∪b) = max(max a, max b)); `greatest`
    * skips the null offset of each logical partition's first chunk. */
  def withRunningMax(df: DataFrame, partitionCols: Seq[String],
      orderCols: Seq[Column], valueCol: String, outCol: String,
      numPartitions: Int = 0): DataFrame =
    withRunningAgg(df, partitionCols, orderCols, valueCol, outCol,
      numPartitions)(max, (loc, off) => greatest(loc, off))

  /** Running MIN (see [[withRunningMax]]). */
  def withRunningMin(df: DataFrame, partitionCols: Seq[String],
      orderCols: Seq[Column], valueCol: String, outCol: String,
      numPartitions: Int = 0): DataFrame =
    withRunningAgg(df, partitionCols, orderCols, valueCol, outCol,
      numPartitions)(min, (loc, off) => least(loc, off))

  /** The general decomposition: any aggregate whose combine is
    * associative distributes over chunks as
    * `combine(local running agg, agg of all earlier chunks)`.
    * @param aggFn the aggregate (sum/min/max/bit_or/…)
    * @param combineFn merges the local running value with the
    *   (nullable — first chunk) offset aggregate of earlier chunks;
    *   must treat a null offset as the aggregate's identity. */
  def withRunningAgg(df: DataFrame, partitionCols: Seq[String],
      orderCols: Seq[Column], valueCol: String, outCol: String,
      numPartitions: Int = 0)(aggFn: Column => Column,
      combineFn: (Column, Column) => Column): DataFrame =
    withRunningAggs(df, partitionCols, orderCols,
      Seq(RunningAgg(valueCol, outCol, aggFn, combineFn)), numPartitions)

  /** One running aggregate to compute in a [[withRunningAggs]] pass. */
  final case class RunningAgg(valueCol: String, outCol: String,
      aggFn: Column => Column, combineFn: (Column, Column) => Column)

  /** Several running aggregates in ONE chunk decomposition: the range
    * shuffle, the checkpoint, the local window and the offsets
    * aggregation are all shared — a running max AND min (q72) costs
    * one pass, not two. Each agg supplies its own combine; all other
    * contracts are [[withRunningAgg]]'s. */
  def withRunningAggs(df: DataFrame, partitionCols: Seq[String],
      orderCols: Seq[Column], aggs: Seq[RunningAgg],
      numPartitions: Int = 0): DataFrame = {
    require(aggs.nonEmpty && aggs.map(_.outCol).distinct.size == aggs.size)
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val part = partitionCols.map(col)
    // The truncation (checkpoint-dir-aware: reliable on a cluster,
    // local blocks otherwise) is LOAD-BEARING: the chunk id comes from a
    // SAMPLING-based partitioner, and the frame below consumes it from
    // two subtrees (local sums + chunk totals). Column pruning can make
    // those subtrees structurally different, in which case ReuseExchange
    // does NOT fire and each branch re-runs the range shuffle with its
    // own sampled boundaries — local sums and offsets then disagree on
    // chunk membership and the prefix sums silently corrupt. Pinning
    // the assignment to materialized blocks makes both consumers read
    // the SAME chunk ids; losing a block after truncation fails loudly
    // instead of recomputing differently.
    val ranged = df
      .repartitionByRange(n, part ++ orderCols: _*)
      .withColumn("__chunk", spark_partition_id())
      .transform(org.apache.spark.sql.graft.Bridge.truncateBounded)
    // local running sums: every window partition ⊆ one range chunk,
    // so no task ever sorts more than ~|df|/n rows
    val local = Window.partitionBy(part :+ col("__chunk"): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-chunk totals: ≤ n rows per logical partition — the cumulative
    // window below runs over that bounded frame, never the data. The
    // exclusive prefix of the FIRST chunk is null; each combineFn owns
    // treating that as the identity.
    val wOff = Window.partitionBy(part: _*)
      .orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = ranged
      .groupBy(part :+ col("__chunk"): _*)
      .agg(aggs.head.aggFn(col(aggs.head.valueCol)).as(s"__ctot_0"),
        aggs.tail.zipWithIndex.map { case (a, i) =>
          a.aggFn(col(a.valueCol)).as(s"__ctot_${i + 1}")
        }: _*)
    val offsets = aggs.zipWithIndex.foldLeft(totals) { case (acc, (a, i)) =>
      acc.withColumn(s"__off_$i", a.aggFn(col(s"__ctot_$i")).over(wOff))
        .drop(s"__ctot_$i")
    }
    val withLocal = aggs.zipWithIndex.foldLeft(ranged) { case (acc, (a, i)) =>
      acc.withColumn(s"__loc_$i", a.aggFn(col(a.valueCol)).over(local))
    }
    val joined = withLocal.join(broadcast(offsets), partitionCols :+ "__chunk")
    aggs.zipWithIndex.foldLeft(joined) { case (acc, (a, i)) =>
      acc.withColumn(a.outCol, a.combineFn(col(s"__loc_$i"), col(s"__off_$i")))
        .drop(s"__loc_$i", s"__off_$i")
    }.drop("__chunk")
  }
}
