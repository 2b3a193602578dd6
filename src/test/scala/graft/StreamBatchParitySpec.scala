package graft

import java.sql.Timestamp
import graft.operators.Sessionize
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Evt
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch/stream parity: the stateful streaming sessionizer must agree
  * with the batch window sessionizer on the same events. */
class StreamBatchParitySpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)
  private val gapMs = 30 * 60 * 1000L

  private val events = Seq(
    Evt(1L, t("2024-01-01 10:00:00"), "click", 1.0),
    Evt(1L, t("2024-01-01 10:10:00"), "view", 2.0),
    Evt(1L, t("2024-01-01 12:00:00"), "click", 4.0),
    Evt(1L, t("2024-01-01 12:05:00"), "click", 8.0),
    Evt(2L, t("2024-01-01 09:00:00"), "click", 16.0),
    Evt(2L, t("2024-01-01 11:00:00"), "view", 32.0))

  // far-future sentinel per user forces the last real session closed
  private val sentinels = Seq(
    Evt(1L, t("2024-06-01 00:00:00"), "end", 0.0),
    Evt(2L, t("2024-06-01 00:00:00"), "end", 0.0))

  private def batchSessions: Set[(Long, Long, Long, Double)] = {
    import spark.implicits._
    val df = events.toDF()
      .withColumn("event_id", col("user_id") * 1000 + unix_millis(col("ts")) % 1000000)
    Sessionize.withSessionId(df, "user_id", "ts", gapMs, "event_id")
      .groupBy("user_id", "session_id")
      .agg(unix_millis(min(col("ts"))).as("start_ms"),
        count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_ms"),
        r.getAs[Long]("n"), r.getAs[Double]("sv"))).toSet
  }

  private def streamSessions: Set[(Long, Long, Long, Double)] = {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Evt]
    val q = StreamOps.sessionize(input.toDS(), gapMs)
      .writeStream.format("memory").queryName("parity_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      input.addData(sentinels: _*)
      q.processAllAvailable()
      spark.sql("SELECT user_id, start_ms, n_events, sum_value FROM parity_out")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getDouble(3)))
        .toSet
    } finally q.stop()
  }

  test("streaming sessionization matches batch sessionization") {
    assert(streamSessions === batchSessions)
  }
}
