package graft

import graft.sources.TxLog
import graft.sources.txlog.TxLogRelation
import org.apache.spark.sql.{SaveMode, sources => f}
import org.apache.spark.sql.functions._

/** One-pass leaf BLOOMS for partitioned writes (the r16 verdict's
  * write-side scale item, bloom half): a partitioned batch with
  * bloomCols must build EVERY leaf's filters in ONE grouped Spark job
  * — never O(leaves × columns) driver-sequential jobs — and the
  * produced sidecars must be probe-equivalent to the per-leaf path's
  * (same sketch class, same put/probe convention: point probes prune,
  * no false negatives ever). */
class LeafBloomOnePassSpec extends SparkSpec {

  private val fmt = "graft.sources.txlog"

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlog_bloom1p").toString

  // ids interleave across leaves (id % 8 = day), so every leaf's
  // [min,max] range overlaps every other's — range stats cannot prune
  // a point probe, ONLY the blooms can
  private def batch(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"u${i.toLong}", i % 8))
      .toDF("id", "s", "day")
  }

  test("8 leaves x 2 bloom columns build in ONE grouped job") {
    val t = freshTable()
    val before = TxLog.bloomJobCount.get()
    batch(800).write.format(fmt)
      .option("partitionBy", "day")
      .option("statsCols", "id")
      .option("bloomCols", "id,s")
      .mode(SaveMode.Append).save(t)
    val jobs = TxLog.bloomJobCount.get() - before
    assert(jobs === 1L,
      s"one-pass contract: 8 leaves x 2 columns must schedule exactly " +
        s"1 bloom job, got $jobs (per-leaf path would be ${8 * (1 + 2)})")
    val segs = TxLog.liveSegments(t, 0)
    assert(segs.size === 8)
    segs.foreach { seg =>
      val blooms = TxLog.segmentBlooms(t, seg)
      assert(blooms.isDefined && blooms.get.keySet === Set("id", "s"),
        s"leaf $seg must carry both columns' filters")
    }
  }

  test("one-pass sidecars are probe-equivalent: point probes prune to " +
      "the holding leaf, reads lose no rows") {
    val t = freshTable()
    batch(800).write.format(fmt)
      .option("partitionBy", "day")
      .option("statsCols", "id")
      .option("bloomCols", "id,s")
      .mode(SaveMode.Append).save(t)
    val rel = TxLogRelation(spark.sqlContext, t, Some(0), None)
    // id=16 lives only in day=0's leaf; ranges overlap everywhere, so
    // any pruning is the blooms' doing (fpp 0.001 — tolerate a stray
    // false positive, never a false negative)
    val keptId = rel.keptSegments(Array[f.Filter](f.EqualTo("id", 16L)))
    assert(keptId.size <= 2, s"blooms must prune ~7 of 8 leaves: $keptId")
    // the probe-matching leaf is ALWAYS kept (no false negatives)
    val holder = TxLog.liveSegments(t, 0).find(s =>
      TxLog.segmentParts(t, s).get.exists(p => p._1 == "day" && p._2 == "0"))
    assert(holder.exists(keptId.contains),
      s"day=0's leaf must be kept for id=16: kept=$keptId")
    // string probe: u301 lives in day=5's leaf
    val keptS = rel.keptSegments(Array[f.Filter](f.EqualTo("s", "u301")))
    assert(keptS.size <= 2, s"string blooms must prune: $keptS")
    // end to end: the filtered read returns exactly the row
    val hit = spark.read.format(fmt).load(t)
      .filter(col("id") === 16L).collect()
    assert(hit.length === 1 && hit.head.getAs[String]("s") === "u16")
    assert(spark.read.format(fmt).load(t).count() === 800L,
      "no false negatives: the unfiltered read sees every row")
  }

  test("a hive-partitioned CONVERT with bloomCols also rides the " +
      "one-pass build") {
    val src = freshTable()
    batch(400).write.mode(SaveMode.Overwrite).partitionBy("day").parquet(src)
    // adopt in place with blooms requested
    val before = TxLog.bloomJobCount.get()
    TxLog.convertPartitionedInPlace(spark, src,
      statsCols = Seq("id"), bloomCols = Seq("id"))
    val jobs = TxLog.bloomJobCount.get() - before
    assert(jobs === 1L, s"convert must one-pass its blooms too: $jobs")
    val segs = TxLog.liveSegments(src, 0)
    assert(segs.size === 8 &&
      segs.forall(s => TxLog.segmentBlooms(src, s).isDefined))
    assert(TxLog.snapshot(spark, src, 0).count() === 400L)
  }
}
