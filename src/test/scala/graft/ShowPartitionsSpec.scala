package graft

import graft.sources.TxLog
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** `SHOW PARTITIONS` / `DESCRIBE DETAIL` edge contracts beyond e79's
  * oracle story: non-partitioned tables refuse naming the repartition
  * verb, live tombstones surface as their own visible row (never
  * silently folded into leaf tallies), and the listing is
  * O(metadata) — row counts from sidecars/footers, no Spark job. */
class ShowPartitionsSpec extends SparkSpec {

  private val fmt = "graft.sources.txlog"

  test("a plain table refuses SHOW PARTITIONS naming the verb; " +
      "tombstones list as their own row") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("showparts").toString
    val tbl = "showparts_t"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Seq((1L, 0L, "a"), (2L, 1L, "b"), (3L, 0L, "c"))
      .toDF("id", "day", "s")
      .write.format(fmt).option("partitionBy", "day")
      .mode(SaveMode.Append).save(t)
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$t', keyCols 'id', partitionBy 'day')")
    val before = spark.sql(s"SHOW PARTITIONS $tbl").collect()
    assert(before.map(_.getString(0)).toSeq === Seq("day=0", "day=1"))
    assert(before.map(r => (r.getString(0), r.getLong(3))).toMap ===
      Map("day=0" -> 2L, "day=1" -> 1L))
    // a DELETE's tombstone surfaces visibly
    spark.sql(s"DELETE FROM $tbl WHERE id = 1")
    val after = spark.sql(s"SHOW PARTITIONS $tbl").collect()
    assert(after.map(_.getString(0)).toSeq ===
      Seq("day=0", "day=1", "deletes"))
    val det = spark.sql(s"DESCRIBE DETAIL $tbl").head
    assert(det.getAs[Int]("num_tombstones") === 1)
    assert(det.getAs[String]("partition_columns") === "day")
    spark.sql(s"DROP TABLE $tbl")

    // plain (non-partitioned) table refuses, naming the migration verb
    val p = java.nio.file.Files.createTempDirectory("showparts2").toString
    val tbl2 = "showparts_p"
    spark.sql(s"DROP TABLE IF EXISTS $tbl2")
    Seq((1L, "x")).toDF("id", "s")
      .write.format(fmt).mode(SaveMode.Append).save(p)
    spark.sql(s"CREATE TABLE $tbl2 USING `graft-txlog` " +
      s"OPTIONS (path '$p', keyCols 'id')")
    val e = intercept[Exception](spark.sql(s"SHOW PARTITIONS $tbl2"))
    assert(e.getMessage.contains("REPARTITION"), e.getMessage)
    // DESCRIBE DETAIL still works on a plain table (empty layout)
    val det2 = spark.sql(s"DESCRIBE DETAIL $tbl2").head
    assert(det2.getAs[String]("partition_columns") === "")
    assert(det2.getAs[Long]("num_rows") === 1L)
    spark.sql(s"DROP TABLE $tbl2")
  }
}
