package graft

import graft.sources.TxLog
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Round-17 maintenance hardening (the pre-round ADVICE findings):
  * escape-aware dropped-column parsing, DROP COLUMN IF EXISTS,
  * byte-option parse errors that name the option, empty-parts markers
  * staying NEUTRAL in maintain's layout dispatch, the tombstone-key
  * disagreement deferral surviving the lazy-keys rework, and the
  * streaming byte-admission memo surviving a table recreated at the
  * same path. */
class MaintenanceHardeningSpec extends SparkSpec {

  private val fmt = "graft.sources.txlog"

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlog_maint").toString

  test("droppedColumns round-trips names holding commas and quotes " +
      "(entry-level escape-aware parse, not split(','))") {
    val t = freshTable()
    new java.io.File(t).mkdirs()
    val weird = Seq("a,b", "c\"d", "plain")
    TxLog.dropColumnsMeta(t, weird)
    assert(TxLog.droppedColumns(t) === weird,
      "a column name holding a comma or an escaped quote must " +
        "round-trip verbatim through dropped.json")
  }

  test("ALTER TABLE ... DROP COLUMN IF EXISTS no-ops on a missing " +
      "column; without IF EXISTS it refuses loudly") {
    import spark.implicits._
    val t = freshTable()
    val tbl = "maint_dropifx"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("id", "s", "x")
      .write.format(fmt).mode(SaveMode.Append).save(t)
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$t', keyCols 'id')")
    // IF EXISTS on a missing name: clean no-op, schema untouched
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN IF EXISTS no_such")
    assert(spark.table(tbl).columns.toSeq === Seq("id", "s", "x"))
    // IF EXISTS with a mix: the existing column drops, the missing
    // one falls out of the statement
    spark.sql(s"ALTER TABLE $tbl DROP COLUMNS IF EXISTS (x, nope)")
    assert(spark.table(tbl).columns.toSeq === Seq("id", "s"))
    // without IF EXISTS a missing column still refuses loudly
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl DROP COLUMN still_missing")
    }
    assert(e.getMessage.contains("does not exist"))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("maxBytesPerTrigger parse failure names the option and the " +
      "input instead of a raw NumberFormatException") {
    val e = intercept[IllegalArgumentException] {
      graft.sources.txlog.TxLogSource.parseBytes("1.5g")
    }
    assert(e.getMessage.contains("maxBytesPerTrigger") &&
      e.getMessage.contains("1.5g"),
      s"got: ${e.getMessage}")
    assert(graft.sources.txlog.TxLogSource.parseBytes("512m") ===
      512L * 1024 * 1024)
  }

  test("a stray empty-parts marker on an otherwise PLAIN table stays " +
      "neutral: maintain folds the table instead of skipping it") {
    import spark.implicits._
    val t = freshTable()
    // an EMPTY partitioned batch lands a plain fallback segment with
    // the explicit `{"cols":[]}` marker …
    Seq.empty[(Long, String)].toDF("id", "k")
      .write.format(fmt).option("partitionBy", "k")
      .mode(SaveMode.Append).save(t)
    // … and the rest of the table is plain (no partitionBy)
    Seq((1L, "a")).toDF("id", "k").write.format(fmt)
      .mode(SaveMode.Append).save(t)
    Seq((2L, "b")).toDF("id", "k").write.format(fmt)
      .mode(SaveMode.Append).save(t)
    val report = graft.operators.AnnIndex.maintainReport(spark, t,
      threshold = 1)
    assert(report.skipped.isEmpty,
      s"a plain table with one empty marker must not defer: " +
        s"${report.skipped}")
    assert(report.compacted.nonEmpty, "the plain fold must run")
    assert(TxLog.snapshot(spark, t,
      TxLog.latestVersion(t).get).count() === 2L)
  }

  test("tombstone key-schema disagreement still defers (as skipped) " +
      "through the lazy-keys fold") {
    import spark.implicits._
    val t = freshTable()
    (0 until 2).foreach { i =>
      Seq((i.toLong, 1L, "x"), (i.toLong + 10, 2L, "y"))
        .toDF("id", "day", "s")
        .write.format(fmt).option("partitionBy", "day")
        .mode(SaveMode.Append).save(t)
    }
    TxLog.commitDeletes(Seq(0L).toDF("id"), t)
    TxLog.commitDeletes(Seq((10L, "y")).toDF("id", "s"), t)
    val report = graft.operators.AnnIndex.maintainReport(spark, t,
      threshold = 1)
    assert(report.compacted.isEmpty)
    assert(report.skipped.exists(_._2.contains("disagree")),
      s"got: ${report.skipped}")
  }

  test("versionAddedBytes never serves a dead table's sizes after a " +
      "recreate at the same path") {
    import spark.implicits._
    val t = freshTable()
    Seq.tabulate(1000)(i => (i.toLong, "x" * 50)).toDF("id", "s")
      .write.format(fmt).mode(SaveMode.Append).save(t)
    val before = TxLog.versionAddedBytes(t, 0)
    assert(before > 0L)
    // recreate: same path, one tiny row — a stale memo would report
    // the dead table's kilobytes to streaming admission control
    import scala.reflect.io.Directory
    new Directory(new java.io.File(t)).deleteRecursively()
    Seq((1L, "y")).toDF("id", "s")
      .write.format(fmt).mode(SaveMode.Append).save(t)
    val after = TxLog.versionAddedBytes(t, 0)
    assert(after > 0L && after < before,
      s"recreated table must re-measure: before=$before after=$after")
  }
}
