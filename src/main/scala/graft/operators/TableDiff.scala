package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff: row-level added / removed / changed / unchanged
  * classification between two versions of a keyed table — the audit
  * primitive behind data-quality gates, CDC backfills, and "what did
  * this pipeline change" reviews.
  *
  * One full-outer sort-merge join on the key (each side shuffles once;
  * no broadcast assumption — both snapshots may be huge). Value
  * comparison is null-safe per column (`<=>`), so NULL→NULL is
  * unchanged and NULL→value is changed, column by column.
  */
object TableDiff {

  /** `a` and `b` must share the schema. Returns one row per key with
    * `diff_status` plus both versions of every non-key column
    * (`a_*` / `b_*`). */
  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(a.columns.toSeq == b.columns.toSeq,
      s"snapshot schemas differ: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val valCols = a.columns.filterNot(keyCols.contains).toSeq
    val al = a.select(keyCols.map(col) ++
      valCols.map(c => col(c).as(s"a_$c")) :+ lit(1).as("__a"): _*)
    val bl = b.select(keyCols.map(col) ++
      valCols.map(c => col(c).as(s"b_$c")) :+ lit(1).as("__b"): _*)
    val same = valCols.map(c => col(s"a_$c") <=> col(s"b_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    al.join(bl, keyCols, "full_outer")
      .withColumn("diff_status",
        when(col("__a").isNull, "added")
          .when(col("__b").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed"))
      .drop("__a", "__b")
  }
}
