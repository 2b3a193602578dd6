package graft.operators

import graft.functions.{TDigestCdf, TDigestMerge}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Digest-based distribution-drift detection: score each time
  * window's value distribution against the MERGED trailing baseline
  * of every earlier window, and alarm on rank-shift.
  *
  * The probe is rank-space, not value-space: where does this window's
  * median sit in the baseline's distribution
  * (`tdigest_cdf(baseline, p50_window)`)? A stationary stream keeps
  * that near 0.5 whatever the distribution's shape or scale; a shift
  * pushes it toward 0 or 1 — so ONE unitless threshold works across
  * metrics with wildly different ranges (latencies vs prices), which
  * is what makes the detector deployable fleet-wide without per-metric
  * tuning.
  *
  * Scale shape: the input is the POST-AGGREGATE per-window sketch
  * table (one O(compression)-byte row per group×window — what a
  * monitoring pipeline persists anyway, q102's shape), so however
  * large the raw stream, this stage processes rows ∝ windows. The
  * trailing merge is a running window aggregate over that small
  * table: each step folds one sketch into the expanding baseline
  * (incremental frame — no per-row re-merge of the whole history),
  * partitioned by group so groups score independently and in
  * parallel.
  */
object DigestDrift {

  /** @param windowed  one row per (group, window): a stored t-digest
    *                  sketch + the window's own probe quantile
    * @param groupCol  independent metric/series column
    * @param orderCol  window-start column (sortable)
    * @param sketchCol binary sketch column ([[graft.functions.TDigestSketch]])
    * @param nCol      window row count (sizes the noise floor)
    * @param probeCol  the window's own probe quantile (typically p50)
    * @param minBaselineN  suppress alarms until the trailing baseline
    *                      has at least this many points (cold start)
    * @param rankShiftAlarm  |cdf_baseline(probe) − 0.5| above this
    *                        raises `drift_alarm` — subject to the
    *                        sample-noise floor below
    * @param zAlpha  under the null, a window median of n points sits
    *                at rank 0.5 ± 1/(2√n) (one stddev), so the alarm
    *                threshold is floored at zAlpha/(2√n): a sparse
    *                window CANNOT statistically evidence drift, and
    *                without this floor small windows alarm constantly
    *                (found by the sf0.001 e31 run: ~5-event windows)
    */
  def report(windowed: DataFrame, groupCol: String, orderCol: String,
      sketchCol: String, nCol: String, probeCol: String,
      minBaselineN: Long = 100L,
      rankShiftAlarm: Double = 0.2,
      zAlpha: Double = 4.0): DataFrame = {
    val trailing = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    windowed
      .withColumn("baseline_sketch", TDigestMerge(col(sketchCol)).over(trailing))
      .withColumn("baseline_n",
        coalesce(sum(col(nCol)).over(trailing), lit(0L)))
      .withColumn("baseline_rank",
        TDigestCdf(col("baseline_sketch"), col(probeCol)))
      .withColumn("rank_shift", abs(col("baseline_rank") - lit(0.5)))
      .withColumn("alarm_threshold",
        greatest(lit(rankShiftAlarm),
          lit(zAlpha / 2.0) / sqrt(col(nCol).cast("double"))))
      .withColumn("drift_alarm",
        coalesce(col("baseline_n") >= minBaselineN &&
          col("rank_shift") > col("alarm_threshold"), lit(false)))
  }
}
