package graft

import java.sql.Timestamp
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Evt
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit, pmod}
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("windowed counts aggregate by event-time window") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Evt]
    input.addData(
      Evt(1L, t("2024-01-01 10:05:00"), "click", 1.0),
      Evt(1L, t("2024-01-01 10:20:00"), "click", 2.0),
      Evt(2L, t("2024-01-01 11:05:00"), "view", 3.0))
    val q = StreamOps.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n_events, sum_value FROM win_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows === Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("sliding windows assign events to overlapping buckets") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[Evt]
    input.addData(Evt(1L, t("2024-01-01 10:45:00"), "click", 1.0))
    val slid = input.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .count()
    val q = slid.writeStream.format("memory").queryName("slide_out")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      // one event falls into two overlapping 1h windows (10:00, 10:30)
      assert(spark.sql("SELECT * FROM slide_out").count() === 2)
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to prior clicks only") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamOps.IdEvt
    val clicks = MemoryStream[IdEvt]
    val purchases = MemoryStream[IdEvt]
    clicks.addData(
      IdEvt(1L, 7L, t("2024-01-01 10:00:00"), "click", 0.0),
      IdEvt(2L, 7L, t("2024-01-01 10:50:00"), "click", 0.0),
      IdEvt(3L, 8L, t("2024-01-01 10:05:00"), "click", 0.0))
    purchases.addData(
      IdEvt(10L, 7L, t("2024-01-01 10:30:00"), "purchase", 9.99))
    val q = StreamOps.attributedPurchases(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT purchase_id, click_id FROM attr_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // only user 7's 10:00 click precedes the 10:30 purchase;
      // the 10:50 click and user 8's click must not attribute
      assert(rows === Set((10L, 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses replayed event ids") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamOps.IdEvt
    val input = MemoryStream[IdEvt]
    val q = StreamOps.dedupWithinWatermark(input.toDF(), "event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        IdEvt(1L, 7L, t("2024-01-01 10:00:00"), "click", 1.0),
        IdEvt(1L, 7L, t("2024-01-01 10:00:01"), "click", 1.0))  // same-batch dup
      q.processAllAvailable()
      input.addData(
        IdEvt(1L, 7L, t("2024-01-01 10:05:00"), "click", 1.0),  // replay
        IdEvt(2L, 7L, t("2024-01-01 10:06:00"), "click", 2.0))
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_out")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("file sink with checkpoint recovers exactly-once across a restart") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamOps.IdEvt
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val input = MemoryStream[IdEvt]
    def start() = input.toDF()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()

    val q1 = start()
    input.addData(IdEvt(1L, 7L, t("2024-01-01 10:00:00"), "click", 1.0))
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint; only NEW data may append
    val q2 = start()
    input.addData(IdEvt(2L, 7L, t("2024-01-01 10:01:00"), "view", 2.0))
    q2.processAllAvailable()
    q2.stop()

    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L))   // no duplicates, nothing lost
  }

  test("stateful sessionization emits closed sessions across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Evt]
    val q = StreamOps.sessionize(input.toDS(), gapMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Evt(1L, t("2024-01-01 10:00:00"), "click", 1.0),
        Evt(1L, t("2024-01-01 10:10:00"), "click", 2.0))
      q.processAllAvailable()
      // second batch: an event far past the gap closes session 1
      input.addData(Evt(1L, t("2024-01-01 12:00:00"), "click", 4.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events, sum_value FROM sess_out")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2, 3.0)))
    } finally q.stop()
  }

  test("stateful aggregation is backend-agnostic: RocksDB state store matches HDFS-backed") {
    // production deployments run RocksDB state stores (state off-heap,
    // bounded by disk not executor memory — the 100 TB posture for
    // large keyspaces); results must be identical to the default
    // in-memory/HDFS-backed provider
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Evt]
      input.addData(
        Evt(1L, t("2024-01-01 10:05:00"), "click", 1.0),
        Evt(1L, t("2024-01-01 10:20:00"), "click", 2.0),
        Evt(2L, t("2024-01-01 11:05:00"), "view", 3.0))
      val q = StreamOps.windowedCounts(input.toDF())
        .writeStream.format("memory").queryName("rocks_out")
        .outputMode(OutputMode.Update()).start()
      try {
        q.processAllAvailable()
        val rows = spark.sql("SELECT event_type, n_events, sum_value FROM rocks_out")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
        assert(rows === Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("exact-gap boundary: native session_window vs StreamOps.sessionize") {
    // two events exactly gap apart — pin each API's boundary rule so
    // e37's oracle stays honest if the data ever lands on it
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, session_window}
    val input = MemoryStream[Evt]
    input.addData(
      Evt(1L, t("2024-01-01 10:00:00"), "click", 1.0),
      Evt(1L, t("2024-01-01 10:30:00"), "click", 2.0), // exactly 30 min later
      Evt(1L, t("2024-01-02 00:00:00"), "flush", 0.0)) // advances watermark
    val agg = input.toDF()
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sw_boundary")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val native = spark.table("sw_boundary")
        .filter(col("session_window.start") < t("2024-01-02 00:00:00"))
        .select("n").collect().map(_.getLong(0)).sorted.toSeq
      // native rule (measured): an event landing exactly ON the
      // session end (= last + gap) MERGES — a new session needs
      // diff strictly greater than the gap
      assert(native === Seq(2L),
        s"native session_window boundary rule changed: $native")
    } finally q.stop()
    // StreamOps.sessionize uses the same rule (new only if diff >
    // gap), so the two APIs agree at exactly-gap — and e37's
    // gaps-and-islands oracle (`> 1800000`) mirrors both
    val input2 = MemoryStream[Evt]
    input2.addData(
      Evt(1L, t("2024-01-01 10:00:00"), "click", 1.0),
      Evt(1L, t("2024-01-01 10:30:00"), "click", 2.0),
      Evt(1L, t("2099-01-01 00:00:00"), "__end", 0.0))
    val q2 = StreamOps.sessionize(input2.toDS(), gapMs = 30L * 60 * 1000)
      .toDF().writeStream.format("memory").queryName("gs_boundary")
      .outputMode(OutputMode.Append()).start()
    try {
      q2.processAllAvailable()
      val custom = spark.table("gs_boundary")
        .filter(col("start_ms") < 4070908800000L)
        .select("n_events").collect().map(_.getInt(0)).toSeq
      assert(custom === Seq(2), s"sessionize boundary rule changed: $custom")
    } finally q2.stop()
  }

  test("sample-sketch streaming aggregate is bit-identical on RocksDB state") {
    // e36's aggregate is a TypedImperativeAggregate: its buffer rides
    // the state store through serialize/deserialize every micro-batch,
    // so the parity contract must hold for the sketch BYTES, not just
    // scalar results
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.functions.SampleSketchAgg
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Evt]
      val evts = (0 until 60).map(i =>
        Evt(i % 7L, t(f"2024-01-01 10:${i % 50}%02d:00"), "click", i.toDouble))
      input.addData(evts.take(30): _*)
      val agg = input.toDF()
        .groupBy(col("event_type"))
        .agg(SampleSketchAgg(col("user_id"),
          pmod(col("user_id") * lit(7919L) + lit(17L), lit(2147483647L)), 5)
          .as("sk"))
      val q = agg.writeStream.format("memory").queryName("rocks_sample")
        .outputMode(OutputMode.Complete()).start()
      try {
        q.processAllAvailable()
        input.addData(evts.drop(30): _*) // second micro-batch -> state round-trip
        q.processAllAvailable()
        val streamed = spark.table("rocks_sample")
          .head().getAs[Array[Byte]]("sk")
        val batch = evts.toDF()
          .agg(SampleSketchAgg(col("user_id"),
            pmod(col("user_id") * lit(7919L) + lit(17L), lit(2147483647L)), 5))
          .head().getAs[Array[Byte]](0)
        assert(java.util.Arrays.equals(streamed, batch),
          "streamed sketch bytes must equal the batch aggregation's")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
