package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the gap to the
  * previous event of the same key exceeds `gapMs`.
  *
  * One shuffle on the key + one sort on event time; the session id is
  * a running sum of boundary flags — all window-operator work, no
  * per-group state outside Catalyst. At 100 TB the cost is exactly one
  * repartition of the event stream, and AQE coalesces the output.
  */
object Sessionize {

  /** Adds `session_id` (0-based per key) to an event frame. */
  def withSessionId(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gapMs: Long,
      tieBreakCol: String): DataFrame = {
    val ord = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreakCol))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTs = lag(unix_millis(col(tsCol)), 1).over(ord)
    val isNew = when(prevTs.isNull ||
      unix_millis(col(tsCol)) - prevTs > gapMs, 1L).otherwise(0L)
    events
      .withColumn("__new", isNew)
      .withColumn("session_id", sum(col("__new")).over(run) - lit(1L))
      .drop("__new")
  }
}
