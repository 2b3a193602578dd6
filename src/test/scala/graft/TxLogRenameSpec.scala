package graft

import graft.sources.TxLog
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** RENAME COLUMN / column mapping (r16 verdict missing #3): the
  * rename is O(1) metadata anchored to a version, committed segments
  * keep their physical names, readers re-map per segment — so time
  * travel below the anchor reads the OLD name, DML composes under the
  * new name, the old name is re-ADDable, and DROP/RENAME interplay
  * holds. Pruning sidecars re-key per segment (a re-added old name
  * must never consult the stale physical entry). */
class TxLogRenameSpec extends SparkSpec {

  private val fmt = "graft.sources.txlog"

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlog_ren").toString

  test("rename → DML under the new name → time travel pre-rename " +
      "reads the old name → re-ADD of the old name works") {
    import spark.implicits._
    val t = freshTable()
    val tbl = "ren_t1"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Seq((1L, 10L, "u"), (2L, 20L, "v")).toDF("id", "a", "s")
      .write.format(fmt).option("statsCols", "a")
      .mode(SaveMode.Append).save(t)                              // v0
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$t', keyCols 'id', statsCols 'a')")
    val ren = spark.sql(s"ALTER TABLE $tbl RENAME COLUMN a TO b")
      .collect()                                                  // v1
    assert(ren.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("a", "b")))
    // head reads the new name with the OLD segments' values
    assert(spark.table(tbl).columns.toSeq === Seq("id", "b", "s"))
    assert(spark.table(tbl).filter(col("b") === 10L).count() === 1L)
    // DML under the new name: INSERT + UPDATE
    spark.sql(s"INSERT INTO $tbl VALUES (3, 30, 'w')")            // v2
    spark.sql(s"UPDATE $tbl SET b = b + 1 WHERE id = 1")          // v3
    val head = spark.table(tbl).orderBy("id")
      .select("id", "b").as[(Long, Long)].collect().toSeq
    assert(head === Seq((1L, 11L), (2L, 20L), (3L, 30L)))
    // time travel BELOW the anchor reads the old name
    val pre = spark.sql(s"SELECT * FROM $tbl VERSION AS OF 0")
    assert(pre.columns.toSeq === Seq("id", "a", "s"))
    assert(pre.filter(col("a") === 10L).count() === 1L)
    // re-ADD of the old name: fresh logical column, NULL on every
    // pre-re-add segment, physical thereafter
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (a BIGINT)")
    spark.sql(s"INSERT INTO $tbl VALUES (4, 40, 'x', 400)")       // v4
    val readd = spark.table(tbl).orderBy("id")
      .select("id", "b", "a").collect()
    assert(readd.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 11L), (2L, 20L), (3L, 30L), (4L, 40L)))
    assert(readd.take(3).forall(_.isNullAt(2)),
      "pre-re-add rows read the re-added 'a' as NULL — never the " +
        "renamed-away physical values")
    assert(readd.last.getLong(2) === 400L)
    // the stale physical sidecar ('a', nulls=0 on v0's segment) must
    // NOT serve the re-added logical 'a': IS NULL finds the old rows
    assert(spark.table(tbl).filter(col("a").isNull).count() === 3L,
      "re-keyed pruning: a stale physical stats entry must never " +
        "wrongly prune an IS NULL probe on the re-added name")
    // …and the renamed column stays prunable + correct end to end
    assert(spark.table(tbl).filter(col("b") === 40L).count() === 1L)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("chained renames fold in order; DROP of a renamed column works") {
    import spark.implicits._
    val t = freshTable()
    val tbl = "ren_t2"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Seq((1L, 1.5, "p"), (2L, 2.5, "q")).toDF("id", "a", "s")
      .write.format(fmt).mode(SaveMode.Append).save(t)            // v0
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$t', keyCols 'id')")
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN a TO b")           // v1
    spark.sql(s"INSERT INTO $tbl VALUES (3, 3.5, 'r')")           // v2
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN b TO c")           // v3
    // both generations (physical 'a' at v0, physical 'b' at v2) map
    // to the head's logical 'c'
    assert(spark.table(tbl).columns.toSeq === Seq("id", "c", "s"))
    assert(spark.table(tbl).select(sum("c")).head.getDouble(0) === 7.5)
    // intermediate pin shows the intermediate name
    assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 2")
      .columns.toSeq === Seq("id", "b", "s"))
    // DROP the renamed column: recorded under the LOGICAL name,
    // projected away after the per-segment mapping
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN c")
    assert(spark.table(tbl).columns.toSeq === Seq("id", "s"))
    assert(spark.table(tbl).count() === 3L)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("rename refusals: key/partition columns, existing target, " +
      "dropped target, CHECK-referenced source") {
    import spark.implicits._
    val t = freshTable()
    val tbl = "ren_t3"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Seq((1L, 2L, 3L, "x")).toDF("id", "day", "v", "s")
      .write.format(fmt).option("partitionBy", "day")
      .mode(SaveMode.Append).save(t)
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` OPTIONS (" +
      s"path '$t', keyCols 'id', partitionBy 'day', checks 'v > 0')")
    def refuse(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.toLowerCase.contains(needle.toLowerCase),
        s"$sql → ${e.getMessage}")
    }
    refuse(s"ALTER TABLE $tbl RENAME COLUMN id TO id2", "key column")
    refuse(s"ALTER TABLE $tbl RENAME COLUMN day TO d2", "partition")
    refuse(s"ALTER TABLE $tbl RENAME COLUMN v TO s", "already exists")
    refuse(s"ALTER TABLE $tbl RENAME COLUMN v TO v2", "CHECK")
    // dropped target: drop s, then try to rename v onto it
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN s")
    refuse(s"ALTER TABLE $tbl RENAME COLUMN v TO s", "DROPPED")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("incremental reads refuse a span crossing the rename anchor; " +
      "clone and pre-anchor restore refuse loudly") {
    import spark.implicits._
    val t = freshTable()
    val tbl = "ren_t4"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Seq((1L, 10L)).toDF("id", "a")
      .write.format(fmt).mode(SaveMode.Append).save(t)            // v0
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$t', keyCols 'id')")
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN a TO b")           // v1
    spark.sql(s"INSERT INTO $tbl VALUES (2, 20)")                 // v2
    val span = intercept[Exception] {
      TxLog.changes(spark, t, -1, 2).collect()
    }
    assert(span.getMessage.contains("RENAME COLUMN"), span.getMessage)
    // a post-anchor span is name-consistent and reads fine
    assert(TxLog.changes(spark, t, 1, 2).count() === 1L)
    val clone = intercept[Exception] {
      TxLog.cloneTable(t, freshTable() + "/c")
    }
    assert(clone.getMessage.contains("RENAME COLUMN"), clone.getMessage)
    val rst = intercept[Exception] {
      TxLog.restore(spark, t, 0, Seq("id"))
    }
    assert(rst.getMessage.contains("RENAME COLUMN"), rst.getMessage)
    // restoring AT/ABOVE the anchor still works
    assert(TxLog.restore(spark, t, 1, Seq("id")).isDefined)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("statsCols option follows the rename: post-rename segments " +
      "record sidecars under the new name and prune") {
    import spark.implicits._
    val t = freshTable()
    val tbl = "ren_t5"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Seq((1L, 100L)).toDF("id", "a")
      .write.format(fmt).option("statsCols", "a")
      .mode(SaveMode.Append).save(t)                              // v0
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$t', keyCols 'id', statsCols 'a')")
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN a TO b")           // v1
    spark.sql(s"INSERT INTO $tbl VALUES (2, 200)")                // v2
    // the post-rename segment's sidecar is keyed by the NEW name
    val newSeg = TxLog.liveSegments(t, 2).filterNot(s =>
      TxLog.segmentStats(t, s).exists(_.contains("a")))
    assert(newSeg.exists(s =>
      TxLog.segmentStats(t, s).exists(_.contains("b"))),
      "the catalog's statsCols option must follow the rename")
    // pre-rename sidecar (physical 'a') serves a pushed filter on
    // the LOGICAL 'b' through the per-segment re-keying: a probe
    // outside v0's range prunes it
    val rel = graft.sources.txlog.TxLogRelation(spark.sqlContext, t,
      Some(2), None)
    val kept = rel.keptSegments(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("b", 200L)))
    assert(kept.size === 1,
      s"the re-keyed v0 sidecar must prune the b=200 probe: $kept")
    spark.sql(s"DROP TABLE $tbl")
  }
}
