package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC merge-apply: fold a keyed change batch (upserts + deletes) into
  * a base snapshot — the lakehouse MERGE INTO / CDC-compaction step
  * that turns an append-only change log back into a queryable table.
  *
  * Scale shape: one window pass over the CHANGE BATCH (shuffled on its
  * key) to pick each key's final version, then one shuffled anti-join
  * of the base against the (typically much smaller) changed-key set,
  * plus a union with the surviving upserts. The base is never
  * shuffled more than once and never widened; with the batch far
  * smaller than the base, AQE turns the anti-join broadcast.
  */
object Cdc {

  /** @param base     current snapshot; schema = output schema
    * @param changes  change batch: same columns as base, plus `opCol`
    *                 ('U' upsert / 'D' delete) and `seqCol` (version
    *                 order within the batch — highest wins per key)
    * @return the next snapshot: base rows whose key is untouched, plus
    *         the final version of every upserted key; keys whose final
    *         change is a delete disappear. Ties on `seqCol` break
    *         deterministically on (op, remaining columns) — last wins.
    */
  def apply(base: DataFrame, changes: DataFrame, keyCol: String,
      opCol: String, seqCol: String): DataFrame = {
    val dataCols = base.columns.toSeq
    val w = Window.partitionBy(keyCol).orderBy(
      col(seqCol).desc +: col(opCol).desc +: dataCols.filterNot(_ == keyCol)
        .map(c => col(c).desc): _*)
    val finalVersion = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val untouched = base.join(finalVersion.select(keyCol), Seq(keyCol),
      "left_anti")
    val upserted = finalVersion.filter(col(opCol) === "U")
      .select(dataCols.map(col): _*)
    untouched.unionByName(upserted)
  }
}
