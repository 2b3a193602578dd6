package graft

import graft.sources.TxLog
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** SQL VACUUM's concurrency guard (the r16 verdict's one
  * data-loss-shaped hazard): the default RETAIN-HOURS age window must
  * protect a concurrent writer's staged spill and its
  * relinked-but-uncommitted segment dirs — to a racing vacuum both
  * are indistinguishable from crashed-install orphans, and at age 0
  * deleting them would make the writer's subsequent commit reference
  * vanished directories. `RETAIN 0 HOURS` refuses without FORCE. */
class VacuumSafetySpec extends SparkSpec {

  private val fmt = "graft.sources.txlog"

  private def backdate(dir: java.io.File, hoursAgo: Int): Unit = {
    val t = System.currentTimeMillis() - hoursAgo * 3600L * 1000L
    def walk(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
      f.setLastModified(t); ()
    }
    walk(dir)
  }

  test("vacuum racing a staged, uncommitted write leaves the writer's " +
      "dirs intact; RETAIN 0 HOURS needs FORCE") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("vacsafe").toString
    val tbl = "vacsafe_t"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format(fmt).mode(SaveMode.Append).save(store)       // v0
    Seq((3L, "c")).toDF("id", "s")
      .write.format(fmt).mode(SaveMode.Append).save(store)       // v1
    spark.sql(s"CREATE TABLE $tbl USING `graft-txlog` " +
      s"OPTIONS (path '$store', keyCols 'id')")
    spark.sql(s"OPTIMIZE $tbl")                                  // v2: fold
    // simulate the concurrent IN-FLIGHT writer: a staging spill and a
    // relinked-but-not-yet-committed segment dir, both fresh
    val stage = new java.io.File(store, ".stage_concurrent")
    stage.mkdirs()
    java.nio.file.Files.write(stage.toPath.resolve("part-0.parquet"),
      Array[Byte](1, 2, 3))
    val inflight = new java.io.File(store, "write__seg000099")
    inflight.mkdirs()
    java.nio.file.Files.write(inflight.toPath.resolve("part-0.parquet"),
      Array[Byte](4, 5, 6))

    // default VACUUM: everything on disk is fresh — nothing reclaims,
    // and the writer's dirs are untouched
    assert(spark.sql(s"VACUUM $tbl").collect().isEmpty)
    assert(stage.exists() && inflight.exists())

    // age the RETIRED segments past the window: the default vacuum
    // now reclaims exactly them, still never the fresh in-flight dirs
    backdate(new java.io.File(store, "write__seg000000"), 2)
    backdate(new java.io.File(store, "write__seg000001"), 2)
    val gone = spark.sql(s"VACUUM $tbl").collect().map(_.getString(0)).toSeq
    assert(gone === Seq("write__seg000000", "write__seg000001"), s"got $gone")
    assert(stage.exists() && inflight.exists(),
      "the in-flight writer's fresh dirs must survive the default vacuum")
    // post-vacuum table reads exactly what it did
    assert(spark.table(tbl).count() === 3L)

    // RETAIN 0 HOURS without FORCE refuses, naming the hazard
    val e = intercept[Exception] {
      spark.sql(s"VACUUM $tbl RETAIN 0 HOURS")
    }
    assert(e.getMessage.contains("FORCE") &&
      e.getMessage.toLowerCase.contains("concurrent"), e.getMessage)
    assert(stage.exists() && inflight.exists())

    // the explicit single-maintainer override reclaims immediately —
    // including the orphan-shaped dirs
    val forced = spark.sql(s"VACUUM $tbl RETAIN 1 VERSIONS RETAIN 0 " +
      "HOURS FORCE").collect().map(_.getString(0)).toSeq
    assert(forced.contains("write__seg000099") &&
      forced.contains(".stage_concurrent"), s"got $forced")
    assert(!inflight.exists() && !stage.exists())
    assert(spark.table(tbl).count() === 3L)
    spark.sql(s"DROP TABLE $tbl")
  }
}
