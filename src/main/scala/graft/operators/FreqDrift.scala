package graft.operators

import graft.functions.{CmsMerge, CmsQuery}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical frequency-drift detection from STORED Count-Min
  * sketches — [[DigestDrift]]'s twin for discrete distributions:
  * score each window's heavy-hitter frequency profile against the
  * merged trailing baseline with a chi-square statistic, and alarm
  * when the profile shifts beyond sampling noise.
  *
  * For each probe key i the window's observed CMS estimate o_i is
  * compared to its expectation under the baseline's mix,
  * e_i = baseline_i / baseline_n · n_window; χ² = Σ (o_i − e_i)²/e_i
  * over the probe panel. A stationary stream keeps χ² near the
  * panel's degrees of freedom; a share shift (one key surging,
  * another collapsing) inflates it — the abuse/regression alarm an
  * event pipeline wants per hour ("did the traffic mix change"),
  * driven entirely by the fixed-size sketches it already persists.
  *
  * Scale shape: input is the POST-AGGREGATE per-window sketch table
  * (one O(d·w) row per group×window, the q105 monitoring shape), so
  * this stage processes rows ∝ windows whatever the raw volume. The
  * trailing merge is a running window aggregate partitioned by group
  * (each step folds ONE sketch into the expanding baseline), and the
  * probe panel joins via the constant-key broadcast idiom.
  *
  * Determinism (for the oracle gate): all sketch state is exact
  * integers; e_i and each χ² cell are fixed-shape IEEE expressions;
  * and the χ² SUM is an ORDERED fold over the probe cells sorted by
  * key (array_sort + aggregate — `list_reduce` replays it in the
  * same order), because an unordered double sum is partitioning-
  * dependent in the last ulp. χ² is rounded to 6 decimals and the
  * alarm derives from the ROUNDED value, so both engines decide
  * identically at the threshold.
  */
object FreqDrift {

  /** @param windowed  one row per (group, window): a stored CMS
    *                   sketch ([[graft.functions.CmsSketchAgg]]) +
    *                   the window's row count
    * @param groupCol   independent series column
    * @param orderCol   window-start column (sortable)
    * @param sketchCol  binary CMS sketch column
    * @param nCol       window row count
    * @param probes     small exact heavy-hitter key table (the probe
    *                   panel; bounded — it broadcasts)
    * @param probeKeyCol BIGINT key column in `probes`
    * @param minBaselineN suppress alarms until the trailing baseline
    *                     holds at least this many rows (cold start —
    *                     and the χ² approximation needs expected
    *                     counts with real mass)
    * @param chi2Alarm  χ² threshold; 21.67 is p≈0.01 at df=9 (a
    *                   10-key panel) */
  def report(windowed: DataFrame, groupCol: String, orderCol: String,
      sketchCol: String, nCol: String,
      probes: DataFrame, probeKeyCol: String,
      minBaselineN: Long = 200L, chi2Alarm: Double = 21.67): DataFrame = {
    val trailing = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val based = windowed
      .withColumn("baseline_sketch", CmsMerge(col(sketchCol)).over(trailing))
      .withColumn("baseline_n",
        coalesce(sum(col(nCol)).over(trailing), lit(0L)))
      .withColumn("__j", pmod(col(nCol), lit(1L)))
    val panel = probes.select(col(probeKeyCol).as("__probe"))
      .withColumn("__j", pmod(col("__probe"), lit(1L)))
    val cells = based.join(broadcast(panel), Seq("__j"))
      .withColumn("o",
        CmsQuery(col(sketchCol), col("__probe")).cast("double"))
      .withColumn("b", coalesce(
        CmsQuery(col("baseline_sketch"), col("__probe")), lit(0L))
        .cast("double"))
      // the baseline_n > 0 branch keeps the cold-start row off the
      // 0/0 path entirely: engines disagree on NaN ordering (Spark
      // sorts NaN greatest), so no NaN may ever reach a comparison
      .withColumn("expected", when(col("baseline_n") > 0L,
        col("b") / col("baseline_n").cast("double") * col(nCol).cast("double"))
        .otherwise(lit(0.0)))
      .withColumn("cell", when(col("expected") > 0.0,
        (col("o") - col("expected")) * (col("o") - col("expected"))
          / col("expected")).otherwise(lit(0.0)))
    cells
      .groupBy(col(groupCol), col(orderCol))
      .agg(first(col(nCol)).as("n_window"),
        first(col("baseline_n")).as("baseline_n"),
        round(aggregate(
          transform(
            array_sort(collect_list(struct(col("__probe").as("k"),
              col("cell").as("c")))),
            x => x("c")),
          lit(0.0), (acc, c) => acc + c), 6).as("chi2"))
      .withColumn("drift_alarm",
        col("baseline_n") >= minBaselineN && col("chi2") > chi2Alarm)
  }
}
