package graft

import graft.functions.CmsSketchAgg
import org.apache.spark.sql.functions._

/** Contract for the CMS frequency-drift detector: a stationary
  * key mix stays quiet (χ² near df), an injected share shift alarms
  * at exactly the shifted window, and the cold-start floor keeps the
  * first windows from alarming on an empty baseline — the e31
  * injected-shift discipline for the categorical twin.
  */
class FreqDriftSpec extends SparkSpec {
  import spark.implicits._

  /** 10 keys with a fixed skewed mix per window; `surge` remaps the
    * mix of one window so key 1 absorbs key 2's share as well. */
  private def windows(n: Int, surgeAt: Option[Int]) = {
    val rows = for {
      w <- 0 until n
      key <- 1L to 10L
      share = if (surgeAt.contains(w)) {
        if (key == 1L) 40 else if (key == 2L) 2 else 20 - key.toInt
      } else 21 - key.toInt // 20, 19, ..., 11 — 155 rows per window
      _ <- 0 until share
    } yield (w.toLong, key)
    rows.toDF("bucket", "key").withColumn("g", lit("m"))
  }

  private def report(df: org.apache.spark.sql.DataFrame) =
    graft.operators.FreqDrift.report(
      df.groupBy("g", "bucket")
        .agg(count(lit(1)).as("n"), CmsSketchAgg(col("key"), 64).as("sk")),
      groupCol = "g", orderCol = "bucket", sketchCol = "sk", nCol = "n",
      probes = (1L to 10L).toDF("key"), probeKeyCol = "key",
      minBaselineN = 200L, chi2Alarm = 21.67)

  test("stationary mix stays quiet; injected share shift alarms at its window") {
    val quiet = report(windows(20, None)).collect()
    assert(quiet.forall(!_.getAs[Boolean]("drift_alarm")),
      s"stationary stream alarmed: ${quiet.filter(_.getAs[Boolean]("drift_alarm")).toSeq}")
    val shifted = report(windows(20, Some(15))).collect()
    val alarms = shifted.filter(_.getAs[Boolean]("drift_alarm"))
      .map(_.getAs[Long]("bucket")).toSet
    assert(alarms === Set(15L),
      s"expected exactly window 15 to alarm, got $alarms")
    // the shifted window's chi2 is far above the stationary ceiling
    val chiAt15 = shifted.find(_.getAs[Long]("bucket") == 15L).get
      .getAs[Double]("chi2")
    val chiQuietMax = shifted.filter(_.getAs[Long]("bucket") != 15L)
      .map(_.getAs[Double]("chi2")).max
    assert(chiAt15 > 5 * math.max(chiQuietMax, 1.0),
      s"shift chi2 $chiAt15 vs quiet max $chiQuietMax")
  }

  test("cold-start windows cannot alarm, whatever their profile") {
    // the FIRST window is itself the surge — with an empty baseline
    // there is no expectation to violate, so the floor must hold it
    val r = report(windows(3, Some(0))).collect()
    val w0 = r.find(_.getAs[Long]("bucket") == 0L).get
    assert(w0.getAs[Long]("baseline_n") === 0L)
    assert(!w0.getAs[Boolean]("drift_alarm"))
    assert(w0.getAs[Double]("chi2") === 0.0, "empty baseline must score 0")
  }
}
