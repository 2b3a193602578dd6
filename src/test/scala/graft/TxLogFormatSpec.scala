package graft

import graft.sources.TxLog
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The txlog DataSource surface (graft.sources.txlog.DefaultSource):
  * format-API reads ≡ TxLog.snapshot, time travel via asOf,
  * merge-on-read via keyCols, pushdown reaching the scan, and the
  * append-only writer committing one segment per save. */
class TxLogFormatSpec extends SparkSpec {

  private val Fmt = "graft.sources.txlog"

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlog_fmt").toString + "/t"

  test("writer commits one segment per save; reads equal snapshot") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L, 2L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    Seq(3L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    assert(TxLog.versions(t) === Seq(0, 1), "one commit per save")
    val got = spark.read.format(Fmt).load(t)
      .as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L, 3L))
    assert(got === TxLog.snapshot(spark, t, 1).as[Long].collect().sorted.toSeq)
    // short name registered through META-INF/services
    val short = spark.read.format("graft-txlog").load(t)
      .as[Long].collect().sorted.toSeq
    assert(short === got)
  }

  test("asOf time-travels; keyCols applies merge-on-read tombstones") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L, 2L, 3L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    Seq(4L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    TxLog.commitDeletes(Seq(2L).toDF("id"), t)
    def ids(r: org.apache.spark.sql.DataFrame) =
      r.select("id").as[Long].collect().sorted.toSeq
    assert(ids(spark.read.format(Fmt).option("asOf", 0).load(t)) ===
      Seq(1L, 2L, 3L))
    // without keyCols the raw snapshot still shows the tombstoned row
    assert(ids(spark.read.format(Fmt).load(t)) === Seq(1L, 2L, 3L, 4L))
    assert(ids(spark.read.format(Fmt).option("keyCols", "id").load(t)) ===
      Seq(1L, 3L, 4L))
  }

  test("filters and pruning push through the format boundary") {
    import spark.implicits._
    val t = freshTable()
    (1L to 100L).map(i => (i, s"name_$i")).toDF("id", "name")
      .write.format(Fmt).mode(SaveMode.Append).save(t)
    val q = spark.read.format(Fmt).load(t)
      .filter(col("id") > 90L).select("name")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(id,90)"),
      s"filter did not reach the V1 scan:\n${p.take(1500)}")
    assert(q.count() === 10)
    // zero-column COUNT(*) shape survives the positional-row contract
    assert(spark.read.format(Fmt).load(t).count() === 100)
  }

  test("CREATE TABLE ... USING the format reads through the catalog") {
    import spark.implicits._
    val t = freshTable()
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .write.format(Fmt).mode(SaveMode.Append).save(t)
    spark.sql("DROP TABLE IF EXISTS txlog_ddl")
    spark.sql(s"CREATE TABLE txlog_ddl USING `graft-txlog` " +
      s"OPTIONS (path '$t')")
    try {
      val got = spark.sql("SELECT id FROM txlog_ddl WHERE tag = 'b'")
        .as[Long].collect().toSeq
      assert(got === Seq(2L))
    } finally spark.sql("DROP TABLE IF EXISTS txlog_ddl")
  }

  test("streaming source: versions are offsets, restart resumes at the delta") {
    import spark.implicits._
    val t = freshTable()
    val ckpt = freshTable() + "_ckpt"
    Seq(1L, 2L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    Seq(3L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    def runPass(): Unit = {
      val q = spark.readStream.format(Fmt).load(t)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.synchronized {
            batches += b.select("id").collect().map(_.getLong(0)).sorted.toSeq
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runPass()
    assert(batches.flatten.sorted === Seq(1L, 2L, 3L),
      "first pass must deliver all committed rows")
    val passOne = batches.size
    // grow the table; the restarted query must read ONLY the delta
    Seq(4L, 5L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    runPass()
    val delta = batches.drop(passOne)
    assert(delta.flatten.sorted === Seq(4L, 5L),
      s"restart re-read old versions: $delta")
  }

  test("streaming source fails loudly on a delete inside an unread span") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L, 2L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    TxLog.commitDeletes(Seq(1L).toDF("id"), t)
    val q = spark.readStream.format(Fmt).load(t)
      .writeStream.format("noop")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q.awaitTermination())
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")))
  }

  test("writer rejects non-append modes") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L).toDF("id").write.format(Fmt).mode(SaveMode.Append).save(t)
    val e = intercept[Exception] {
      Seq(2L).toDF("id").write.format(Fmt)
        .mode(SaveMode.Overwrite).save(t)
    }
    assert(e.getMessage.contains("append-only"))
  }
}
