package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-streaming operators (SURVEY.md §2 streaming section).
  *
  * Batch/stream parity: q22_time_bucket and q23_sessionize are the
  * batch analogues of these two — same semantics, incremental
  * execution. State is per-key and bounded (watermark evicts), so
  * both run indefinitely on an unbounded 100 TB/day stream.
  */
object StreamOps {

  case class Evt(user_id: Long, ts: java.sql.Timestamp,
      event_type: String, value: Double)

  case class IdEvt(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
      event_type: String, value: Double)

  case class SessionState(startMs: Long, lastMs: Long, n: Int, sum: Double)

  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Int, sum_value: Double)

  /** Tumbling event-time window aggregation with a watermark — the
    * streaming form of q22_time_bucket. */
  def windowedCounts(events: DataFrame, watermark: String = "1 hour",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Stream-stream interval join: attribute each purchase to the
    * clicks of the same user in the preceding `maxDelay`. Watermarks
    * on BOTH sides + the time-range predicate bound the join state
    * (rows older than ts - maxDelay - watermark are evicted), so the
    * join runs indefinitely on unbounded streams. */
  def attributedPurchases(clicks: DataFrame, purchases: DataFrame,
      maxDelay: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $maxDelay"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"), col("value"))
  }

  /** Exactly-once-ish id dedup on an at-least-once stream: duplicates
    * of an event id arriving within the watermark horizon are dropped;
    * state per id is evicted once the watermark passes it. */
  def dedupWithinWatermark(events: DataFrame, idCol: String,
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stateful gap-based sessionization via flatMapGroupsWithState —
    * the streaming form of q23_sessionize. A session closes when a
    * later event of the same user arrives past the gap, or when the
    * event-time timeout (watermark) fires. */
  def sessionize(events: Dataset[Evt], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, it: Iterator[Evt],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionOut(userId, s.startMs, s.lastMs, s.n, s.sum))
      }
      val sorted = it.toSeq.sortBy(_.ts.getTime)
      val out = Seq.newBuilder[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastMs > gapMs =>
            out += SessionOut(userId, s.startMs, s.lastMs, s.n, s.sum)
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(s) =>
            cur = Some(SessionState(s.startMs, t, s.n + 1, s.sum + e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastMs + gapMs)
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Corrupt-record routing for a permissive file stream (e16's
    * quarantine contract on the stream path): each micro-batch splits
    * in ONE cached pass — rows whose `corruptCol` is set write their
    * RAW source record under `outDir/quarantine`, clean rows (column
    * dropped) under `outDir/clean`. A malformed producer neither
    * kills the always-on stream nor silently vanishes, and the raw
    * record is preserved verbatim for replay once the producer is
    * fixed.
    *
    * foreachBatch is at-least-once: a crash between the two writes
    * replays the micro-batch, so each write OVERWRITES its own
    * `batch=<id>` subdirectory — the replay rewrites identical
    * content instead of appending duplicates, making both sinks
    * idempotent (read them back with plain partition discovery; the
    * `batch` column rides along). An all-clean or all-corrupt batch
    * still writes BOTH sides: Spark writes a schema-bearing footer
    * even for a zero-row frame (SPARK-23271), so a healthy
    * producer's empty quarantine reads back as 0 rows, never an
    * inference error. A stream that yields ZERO batches (empty
    * landing zone) is initialized after drain with a zero-row
    * `batch=-1` partition per side so the read contract holds there
    * too. Blocks until the AvailableNow replay drains; a real
    * deployment would omit the trigger and keep the handle. */
  def routeCorrupt(stream: DataFrame, corruptCol: String,
      outDir: String): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", s"$outDir/chk")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          batch.filter(col(corruptCol).isNotNull)
            .select(col(corruptCol).as("raw"))
            .write.mode("overwrite")
            .parquet(s"$outDir/quarantine/batch=$batchId")
          batch.filter(col(corruptCol).isNull)
            .drop(corruptCol)
            .write.mode("overwrite")
            .parquet(s"$outDir/clean/batch=$batchId")
        } finally { batch.unpersist(); () }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val spark = stream.sparkSession
    def ensure(path: String, schema: org.apache.spark.sql.types.StructType): Unit =
      if (!new java.io.File(path).exists())
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
            schema)
          .coalesce(1).write.parquet(s"$path/batch=-1")
    ensure(s"$outDir/quarantine", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("raw",
        org.apache.spark.sql.types.StringType))))
    ensure(s"$outDir/clean",
      org.apache.spark.sql.types.StructType(
        stream.schema.filterNot(_.name == corruptCol)))
  }
}
