package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row
  * (by time, `right.ts <= left.ts`) with the same key.
  *
  * Spark-first plan: instead of a range join (O(n·m) nested loop) or a
  * per-key sort-merge in `mapPartitions`, tag and UNION the two
  * streams, then carry the latest right-side payload forward with a
  * `last(..., ignoreNulls)` running window per key. One shuffle on
  * (key), one sort on (ts) — the same cost profile as a sort-merge
  * as-of join, fully inside Catalyst/WholeStageCodegen, and safe at
  * 100 TB because state never leaves the window operator.
  */
object AsOfJoin {

  /** @param left      probe side (keeps all rows, like ASOF LEFT JOIN)
    * @param right     reference side
    * @param keyCol    equi-key column name present on both sides
    * @param tsCol     event-time column name present on both sides
    * @param rightCols right-side columns to carry (renamed as given)
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCols: Map[String, String]): DataFrame = {
    val leftTagged = left.withColumn("__side", lit(1))
    val rightTagged = right.withColumn("__side", lit(0))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)

    // Right rows sort before left rows at equal ts => `<=` semantics.
    // The payload struct itself is the final sort key: multiple right
    // rows at an equal (key, ts) would otherwise leave `last` picking
    // a shuffle-order-dependent winner; ordering by the carried values
    // makes the max payload win, deterministically. Carried columns of
    // unorderable types (maps) can't join the sort key — those fall
    // back to the (ts, side) ordering with engine-order ties.
    val payload: Column = when(col("__side") === 0,
      struct(rightCols.keys.toSeq.map(col): _*))
    val payloadOrderable = rightCols.keys.forall { src =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(right.schema(src).dataType)
    }
    val orderKeys =
      if (payloadOrderable) Seq(col(tsCol), col("__side"), col("__p"))
      else Seq(col(tsCol), col("__side"))
    val w = Window.partitionBy(keyCol)
      .orderBy(orderKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__p", payload)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withRight = rightCols.foldLeft(carried) { case (df, (src, dst)) =>
      df.withColumn(dst, col("__asof").getField(src))
    }
    // Keep the left schema + the carried columns; drop right-only cols
    // — but never a carried destination name (a mapping like
    // "price" -> "price" with no left "price" column must survive).
    val dstNames = rightCols.values.toSet
    val rightOnly = right.columns
      .filterNot(left.columns.contains).filterNot(dstNames.contains)
    withRight.drop("__side", "__p", "__asof").drop(rightOnly.toSeq: _*)
  }

  /** The native-physical-operator formulation
    * ([[graft.plans.AsOfJoinExec]]): hash-cluster each side on its
    * key, sort by (key, ts[, tie]), one-pass partition merge with O(1)
    * state. Output = all left columns ++ all right columns (nullable;
    * rename the right side first if names collide). Requires the
    * [[graft.plans.GraftExtensions]] strategy (installed via
    * `spark.sql.extensions`).
    *
    * Contract: key and ts must be 64-bit-backed (long /
    * timestamp-micros); right (key, ts) ties resolve to max `tieCol`.
    */
  def nativeLeftAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKeyCol: String, leftTsCol: String,
      rightKeyCol: String, rightTsCol: String,
      rightTieCol: String): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val l = Bridge.analyzed(left)
    val r = Bridge.analyzed(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) = p.output.find(_.name == name)
      .getOrElse(sys.error(s"as-of: no column '$name' in ${p.output.map(_.name)}"))
    val (lk, lt) = (attr(l, leftKeyCol), attr(l, leftTsCol))
    val (rk, rt, tie) = (attr(r, rightKeyCol), attr(r, rightTsCol),
      attr(r, rightTieCol))
    Seq(lk, lt, rk, rt).foreach { a =>
      require(a.dataType == LongType || a.dataType == TimestampType,
        s"as-of key/ts must be long/timestamp, got ${a.name}: ${a.dataType}")
    }
    require(l.outputSet.intersect(r.outputSet).isEmpty,
      "as-of: the two sides must not share attributes (self-join: alias one side)")
    Bridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoinNode(l, r, lk, lt, rk, rt, tie))
  }
}
