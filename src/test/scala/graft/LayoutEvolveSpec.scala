package graft

import graft.sources.TxLog
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Partition-layout evolution at the API level (e80 drives the SQL
  * story): `repartitionTable` asked for a layout DIFFERENT from the
  * live one becomes a full rewrite — tombstones applied and retired,
  * exactly one layout live afterwards, history intact. */
class LayoutEvolveSpec extends SparkSpec {

  private val fmt = "graft.sources.txlog"

  test("(a) → (b) rewrites everything once: tombstones retire, one " +
      "layout lives, time travel intact, idempotent after") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("layoutev").toString
    Seq((1L, 0L, "F", 1.0), (2L, 1L, "O", 2.0),
      (3L, 0L, "F", 3.0), (4L, 1L, "O", 4.0))
      .toDF("id", "day", "status", "price")
      .write.format(fmt).option("partitionBy", "day")
      .mode(SaveMode.Append).save(t)                               // v0
    TxLog.commitDeletes(Seq(3L).toDF("id"), t)                     // v1
    val moved = TxLog.repartitionTable(spark, t,
      Seq("status"), Seq("id"))
    assert(moved.isDefined)
    val (segs, v) = moved.get
    assert(v === 2 && segs.size === 2, s"one new leaf per status: $segs")
    val live = TxLog.liveSegments(t, v)
    assert(live.toSet === segs.toSet,
      s"old leaves AND tombstones must retire in the same commit: $live")
    val layouts = live.map(s =>
      TxLog.segmentParts(t, s).get.map(_._1)).distinct
    assert(layouts === Seq(Seq("status")), s"one layout live: $layouts")
    // the tombstone applied physically: id=3 stays dead
    val head = TxLog.snapshot(spark, t, v).select("id")
      .as[Long].collect().sorted.toSeq
    assert(head === Seq(1L, 2L, 4L))
    // pre-evolution versions still read — v0 under the OLD layout
    val v0 = TxLog.snapshot(spark, t, 0)
    assert(v0.count() === 4L &&
      v0.columns.contains("day"))
    // idempotent: same layout again is a no-op
    assert(TxLog.repartitionTable(spark, t, Seq("status"),
      Seq("id")).isEmpty)
  }
}
