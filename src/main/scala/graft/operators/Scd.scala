package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: historize a dimension under a
  * stream of attribute changes, keeping one row per (key, validity
  * interval).
  *
  * Scale shape: one shuffle on the key, one window pass to chain
  * validity intervals — the already-closed history never reshuffles
  * (it is untouched by construction), so cost follows the OPEN row
  * set plus the batch, not the accumulated history.
  */
object Scd {

  /** @param history  existing SCD2 table: key, attrs..., `valid_from`
    *                 (timestamp), `valid_to` (timestamp, null = open)
    * @param changes  change batch: key, attrs..., `change_ts`
    * @return updated history. Open rows affected by a change close at
    *         the first superseding change_ts; each change opens a new
    *         version, itself closed by the next change in the batch.
    *         Ties on change_ts break deterministically on the attr
    *         columns (last wins).
    */
  def applyChanges(history: DataFrame, changes: DataFrame,
      keyCol: String, attrCols: Seq[String]): DataFrame = {
    val closed = history.filter(col("valid_to").isNotNull)
    val open = history.filter(col("valid_to").isNull)
      .select(col(keyCol) +: attrCols.map(col) :+
        col("valid_from").as("__ts") :+ lit(0).as("__new"): _*)
    val incoming = changes
      .select(col(keyCol) +: attrCols.map(col) :+
        col("change_ts").as("__ts") :+ lit(1).as("__new"): _*)

    val w = Window.partitionBy(keyCol)
      .orderBy(col("__ts") +: col("__new") +: attrCols.map(col): _*)
    val chained = open.unionByName(incoming)
      .withColumn("valid_from", col("__ts"))
      .withColumn("valid_to", lead(col("__ts"), 1).over(w))
      .drop("__ts", "__new")

    closed.select(chained.columns.map(col): _*).unionByName(chained)
      .withColumn("is_current", col("valid_to").isNull)
  }
}
