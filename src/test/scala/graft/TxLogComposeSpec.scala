package graft

import graft.sources.TxLog
import graft.sources.txlog.TxLogRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{sources => f}

/** Round-15 composition contracts: the r14 features must not cancel
  * each other — blooms ride the fork/adopt verbs, planning decodes
  * them lazily, scans read ONE consistent snapshot, maintenance
  * commits survive a lost version race to a concurrent append, the
  * hive-partitioned CONVERT reads/prunes/deletes like a native table,
  * and ALTER-widened schemas ride SHALLOW CLONE. */
class TxLogComposeSpec extends SparkSpec {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlog_compose").toString

  private val fmt = "graft.sources.txlog"

  /** Four interleaved residue-class segments (every range straddles
    * every key — the bloom-skipping worst case for ranges). */
  private def residueStore(bloom: Boolean): String = {
    import spark.implicits._
    val t = freshTable()
    (0L until 4L).foreach { r =>
      val w = (0L until 64L).map(i => i * 4 + r).toDF("id")
        .write.format(fmt).option("statsCols", "id")
      (if (bloom) w.option("bloomCols", "id") else w)
        .mode(org.apache.spark.sql.SaveMode.Append).save(t)
    }
    t
  }

  private def rel(dir: String): TxLogRelation =
    TxLogRelation(spark.sqlContext, dir,
      Some(TxLog.latestVersion(dir).get), None)

  test("a clone's point probe prunes the same segment set as its source") {
    val src = residueStore(bloom = true)
    val dst = freshTable() + "/clone"
    TxLog.cloneTable(src, dst)
    // probe key 6 (residue 2): in-range for every segment, present in
    // exactly one — only the bloom can prune the other three
    val srcKept = rel(src).keptSegments(Array(f.EqualTo("id", 6L)))
    val dstKept = rel(dst).keptSegments(Array(f.EqualTo("id", 6L)))
    assert(srcKept.size === 1, s"source bloom prune: $srcKept")
    assert(dstKept.size === 1,
      s"the clone must carry the bloom sidecars and prune like the " +
        s"source, got $dstKept")
    // a miss prunes everything on both sides
    assert(rel(src).keptSegments(Array(f.EqualTo("id", -7L))).isEmpty)
    assert(rel(dst).keptSegments(Array(f.EqualTo("id", -7L))).isEmpty)
  }

  test("convertInPlace records blooms; a missing key prunes the segment") {
    import spark.implicits._
    val t = freshTable()
    (0L until 32L).toDF("id").repartition(2)
      .write.mode("overwrite").parquet(t)
    TxLog.convertInPlace(spark, t, statsCols = Seq("id"),
      bloomCols = Seq("id"))
    assert(TxLog.segmentBlooms(t, "convert__seg000000")
      .exists(_.contains("id")), "convert must record the bloom sidecar")
    // in-range but absent key: only the bloom can prove disjointness
    assert(rel(t).keptSegments(Array(f.EqualTo("id", 31L))).size === 1)
    assert(rel(t).keptSegments(Array(f.In("id", Array(7L, 9L)))).size === 1)
  }

  test("planning decodes blooms lazily and memoizes the decode") {
    val t = residueStore(bloom = true)
    val r = rel(t)
    // a range-only scan must never touch a bloom sidecar
    val before = TxLog.bloomDecodeCount.get()
    r.keptSegments(Array(f.GreaterThan("id", 100L),
      f.LessThanOrEqual("id", 200L)))
    r.keptSegments(Array(f.IsNotNull("id")))
    assert(TxLog.bloomDecodeCount.get() === before,
      "a range/null-only filter set must not decode any bloom sidecar")
    // first point probe decodes (at most one per live segment)...
    r.keptSegments(Array(f.EqualTo("id", 6L)))
    val afterFirst = TxLog.bloomDecodeCount.get()
    assert(afterFirst > before, "a point probe consults the blooms")
    // ...and repeat probes are served from the memo: zero new decodes
    r.keptSegments(Array(f.EqualTo("id", 7L)))
    r.keptSegments(Array(f.In("id", Array(6L, 9L))))
    assert(TxLog.bloomDecodeCount.get() === afterFirst,
      "repeat point probes must hit the decoded-sidecar memo")
  }

  test("scanDf reads ONE consistent snapshot per call") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L, 2L).toDF("id").write.format(fmt)
      .mode(org.apache.spark.sql.SaveMode.Append).save(t)        // v0
    val unpinned = TxLogRelation(spark.sqlContext, t, None, None)
    val dfV0 = unpinned.scanDf(Array("id"), Array.empty)
    // a commit lands AFTER the scan was planned: the planned scan
    // keeps its snapshot (prune and read were resolved together) …
    Seq(3L).toDF("id").write.format(fmt)
      .mode(org.apache.spark.sql.SaveMode.Append).save(t)        // v1
    assert(dfV0.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // … while a fresh scan of the same unpinned relation sees v1
    val dfV1 = unpinned.scanDf(Array("id"), Array.empty)
    assert(dfV1.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L))
  }

  test("maintenance commit survives a concurrent append (serialized, " +
      "no data lost, stream stays green)") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch(Seq(1L, 2L).toDF("id"), 0L, t))     // v0
    assert(TxLog.appendBatch(Seq(3L).toDF("id"), 1L, t))         // v1
    // deterministic interleave of compactMoR's steps: fold the head…
    val latest = TxLog.latestVersion(t).get
    val old = TxLog.liveSegments(t, latest)
    val seg = s"compact__seg${TxLog.versions(t).size}"
    TxLog.snapshotMoR(spark, t, latest, Seq("id"))
      .write.mode("overwrite").parquet(s"$t/$seg")
    // …an append WINS the next version mid-compaction…
    assert(TxLog.appendBatch(Seq(4L).toDF("id"), 2L, t))         // v2
    // …and the maintenance commit still installs: its removes are
    // re-validated against the NEW head (the appended segment is not
    // among them), so both commits serialize
    val v = TxLog.commit(t, adds = Seq(seg), removes = old,
      dataChange = false)                                        // v3
    assert(v === 3)
    val live = TxLog.liveSegments(t, v).sorted
    assert(live === Seq("batch__000002", seg).sorted,
      s"append and compaction must both survive, got $live")
    assert(TxLog.snapshotMoR(spark, t, v, Seq("id"))
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L),
      "no data lost across the racing pair")
    // an incremental consumer steps over the maintenance commit and
    // still sees every appended row exactly once
    assert(TxLog.changes(spark, t, -1, v).collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("threaded race: appends vs compactMoR, all rows survive") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch((0L until 8L).toDF("id"), 0L, t))
    val appender = new Thread(() => {
      (1L to 4L).foreach { b =>
        TxLog.appendBatch(Seq(100L + b).toDF("id"), b, t); ()
      }
    })
    appender.start()
    // compactMoR may interleave anywhere among the appends: its
    // commit must retry through lost version races, never fail
    TxLog.compactMoR(spark, t, Seq("id"))
    appender.join()
    val v = TxLog.latestVersion(t).get
    val got = TxLog.snapshotMoR(spark, t, v, Seq("id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === ((0L until 8L) ++ (101L to 104L)).sorted.toSeq,
      s"racing maintenance and appends must lose nothing, got $got")
  }

  test("partitioned convert: zero-copy adoption, attached columns, " +
      "exact pruning, MoR delete") {
    import spark.implicits._
    val t = freshTable()
    val df = (0L until 60L).map(i => (i, s"s${i % 3}", i % 2))
      .toDF("id", "grp", "par")
    df.write.partitionBy("grp", "par").mode("overwrite").parquet(t)
    // flat convert refuses the hive layout, pointing at the right verb
    val wrong = intercept[IllegalArgumentException](
      TxLog.convertInPlace(spark, t))
    assert(wrong.getMessage.contains("convertPartitionedInPlace"))
    val inodeBefore = {
      val leaf = new java.io.File(t, "grp=s0/par=0").listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
      java.nio.file.Files.getAttribute(leaf.toPath, "unix:ino")
    }
    val segs = TxLog.convertPartitionedInPlace(spark, t,
      statsCols = Seq("id"))
    assert(segs.size === 6, s"one segment per leaf, got $segs")
    assert(TxLog.versions(t) === Seq(0), "ALL leaves in ONE atomic v0")
    // zero copy: some adopted file shares the original's inode
    val adoptedInodes = segs.flatMap { case (s, _) =>
      new java.io.File(t, s).listFiles().toSeq
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(f => java.nio.file.Files.getAttribute(f.toPath, "unix:ino"))
    }
    assert(adoptedInodes.contains(inodeBefore), "hard links, not copies")
    // reads attach the partition columns from the parts sidecars
    val snap = TxLog.snapshot(spark, t, 0)
    assert(snap.columns.toSet === Set("id", "grp", "par"))
    assert(snap.count() === 60L)
    assert(snap.filter(col("grp") === "s1" && col("par") === 1L).count()
      === df.filter(col("grp") === "s1" && col("par") === 1L).count())
    // partition predicates prune EXACTLY by segment
    val r = rel(t)
    assert(r.keptSegments(Array(f.EqualTo("grp", "s2"))).size === 2)
    assert(r.keptSegments(Array(f.EqualTo("par", 0L))).size === 3)
    assert(r.keptSegments(Array(f.EqualTo("grp", "s2"),
      f.EqualTo("par", 0L))).size === 1)
    assert(r.keptSegments(Array(f.EqualTo("grp", "zzz"))).isEmpty)
    // MoR composes over the adopted layout; the partition column of a
    // deleted row is readable in the CDF feed
    TxLog.commitDeletes(Seq(6L, 7L).toDF("id"), t)               // v1
    val after = TxLog.snapshotMoR(spark, t, 1, Seq("id"))
    assert(after.count() === 58L)
    assert(after.filter(col("id") === 6L).isEmpty)
    val feed = TxLog.changesCdf(spark, t, -1, 1)
    assert(feed.filter(col("_change_type") === "insert" &&
      col("grp").isNull).isEmpty,
      "CDF insert rows must carry the attached partition values")
    // the clone carries parts sidecars: same read, same prune
    val dst = freshTable() + "/clone"
    TxLog.cloneTable(t, dst)
    val cloneSnap = TxLog.snapshotMoR(spark, dst,
      TxLog.latestVersion(dst).get, Seq("id"))
    assert(cloneSnap.columns.toSet === Set("id", "grp", "par"))
    assert(cloneSnap.count() === 58L)
    assert(rel(dst).keptSegments(Array(f.EqualTo("grp", "s2"))).size === 2)
  }

  test("OPTIMIZE over a converted-partitioned table: attached columns " +
      "materialize; stats stay prunable") {
    import spark.implicits._
    val t = freshTable()
    (0L until 40L).map(i => (i, s"g${i % 2}")).toDF("id", "grp")
      .write.partitionBy("grp").mode("overwrite").parquet(t)
    TxLog.convertPartitionedInPlace(spark, t, statsCols = Seq("id"))
    TxLog.commitDeletes(Seq(3L).toDF("id"), t)                   // v1
    val v = TxLog.compactMoR(spark, t, Seq("id"))                // v2
    val live = TxLog.liveSegments(t, v)
    assert(live.size === 1 && live.head.startsWith("compact__"))
    // the fold read attached grp from the parts sidecars, so the
    // compacted segment carries it PHYSICALLY — no parts sidecar
    assert(TxLog.segmentParts(t, live.head).isEmpty)
    val snap = TxLog.snapshot(spark, t, v)
    assert(snap.columns.toSet === Set("id", "grp"))
    assert(snap.count() === 39L)
    assert(snap.filter(col("grp") === "g1").count() === 19L) // id 3 died
    // the carried stats union collapses the per-segment points into a
    // (sound) range: an out-of-domain probe still prunes
    val kept = rel(t).keptSegments(Array(f.EqualTo("grp", "zzz")))
    assert(kept.isEmpty,
      "the compacted segment's carried grp range must still prune")
    assert(rel(t).keptSegments(Array(f.EqualTo("grp", "g1"))).size === 1)
  }

  test("native partitioned writes: one segment per value behind one " +
      "commit; scans prune by partition") {
    import spark.implicits._
    val t = freshTable()
    val df = (0L until 30L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    df.write.format(fmt).option("partitionBy", "grp")
      .option("statsCols", "id")
      .mode(org.apache.spark.sql.SaveMode.Append).save(t)        // v0
    assert(TxLog.versions(t) === Seq(0),
      "all partition values land behind ONE commit")
    val live0 = TxLog.liveSegments(t, 0)
    assert(live0.size === 3 &&
      live0.forall(_.matches("write__seg000000p\\d+")), s"got $live0")
    assert(live0.forall(s => TxLog.segmentParts(t, s).isDefined))
    // the snapshot attaches the partition column back
    val snap = TxLog.snapshot(spark, t, 0)
    assert(snap.columns.toSet === Set("id", "grp"))
    assert(snap.filter(col("grp") === "g2").count() === 10L)
    // a second append partitions independently; the probe prunes to
    // exactly the probed value's segments ACROSS versions
    df.filter(col("id") < 9L).write.format(fmt)
      .option("partitionBy", "grp").option("statsCols", "id")
      .mode(org.apache.spark.sql.SaveMode.Append).save(t)        // v1
    val r = rel(t)
    assert(r.keptSegments(Array(f.EqualTo("grp", "g1"))).size === 2)
    assert(r.keptSegments(Array(f.EqualTo("grp", "zzz"))).isEmpty)
    // data stays correct through the layout
    assert(TxLog.snapshot(spark, t, 1).count() === 39L)
    // overwrite = logical truncate, still partitioned
    df.filter(col("id") < 3L).write.format(fmt)
      .option("partitionBy", "grp")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(t)     // v2
    val snap2 = TxLog.snapshot(spark, t, 2)
    assert(snap2.count() === 3L)
    assert(TxLog.liveSegments(t, 2)
      .forall(_.matches("write__seg000002p\\d+")))
  }

  test("partitioned appendBatch: per-value segments, exactly-once " +
      "redelivery, empty-batch fallback") {
    import spark.implicits._
    val t = freshTable()
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "grp")
    assert(TxLog.appendBatch(b0, 0L, t, partitionCols = Seq("grp")))
    val live = TxLog.liveSegments(t, 0)
    assert(live.sorted === Seq("batch__000000p0", "batch__000000p1"))
    // a redelivery of the SAME batch id is recognized by the p-prefix
    // ledger and skipped — no new version, no double rows
    assert(!TxLog.appendBatch(b0, 0L, t, partitionCols = Seq("grp")))
    assert(TxLog.versions(t) === Seq(0))
    // an EMPTY batch still records its id (plain-segment fallback,
    // schema preserved) and its redelivery is skipped too
    assert(TxLog.appendBatch(b0.filter(col("id") < 0L), 1L, t,
      partitionCols = Seq("grp")))
    assert(TxLog.liveSegments(t, 1).contains("batch__000001"))
    assert(!TxLog.appendBatch(b0.filter(col("id") < 0L), 1L, t,
      partitionCols = Seq("grp")))
    val snap = TxLog.snapshot(spark, t, TxLog.latestVersion(t).get)
    assert(snap.count() === 2L)
    assert(snap.columns.toSet === Set("id", "grp"))
    // null partition values are refused loudly, and the failed batch
    // commits nothing
    val vsBefore = TxLog.versions(t)
    val bad = intercept[IllegalArgumentException](
      TxLog.appendBatch(Seq((9L, null: String)).toDF("id", "grp"), 2L, t,
        partitionCols = Seq("grp")))
    assert(bad.getMessage.contains("null partitions are not supported") ||
      bad.getMessage.contains("NULL value"))
    assert(TxLog.versions(t) === vsBefore)
  }

  test("dynamic partition overwrite: only touched partitions replaced, " +
      "atomically, history intact") {
    import spark.implicits._
    val t = freshTable()
    val df = (0L until 30L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    df.write.format(fmt).option("partitionBy", "grp")
      .mode(org.apache.spark.sql.SaveMode.Append).save(t)        // v0
    val untouched0 = TxLog.liveSegments(t, 0).filter(s =>
      TxLog.segmentParts(t, s).exists(_.exists(p => p._2 != "g1")))
    // replace ONLY g1 with a 2-row backfill
    Seq((100L, "g1"), (101L, "g1")).toDF("id", "grp")
      .write.format(fmt).option("partitionBy", "grp")
      .option("partitionOverwriteMode", "dynamic")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(t)     // v1
    assert(TxLog.versions(t) === Seq(0, 1))
    val snap = TxLog.snapshot(spark, t, 1)
    assert(snap.count() === 22L, "20 untouched + 2 backfilled")
    assert(snap.filter(col("grp") === "g1").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(100L, 101L))
    assert(snap.filter(col("grp") === "g0").count() === 10L)
    // untouched partitions survive under their ORIGINAL segment names
    val live1 = TxLog.liveSegments(t, 1)
    assert(untouched0.forall(live1.contains),
      "untouched partitions' segments must survive the overwrite")
    // the pre-overwrite version stays readable (one atomic commit)
    assert(TxLog.snapshot(spark, t, 0).count() === 30L)
    // an EMPTY dynamic overwrite replaces nothing and commits nothing
    df.filter(col("id") < 0L).write.format(fmt)
      .option("partitionBy", "grp")
      .option("partitionOverwriteMode", "dynamic")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(t)
    assert(TxLog.versions(t) === Seq(0, 1), "empty dynamic = no-op")
    // static overwrite stays the logical truncate
    Seq((7L, "g0")).toDF("id", "grp").write.format(fmt)
      .option("partitionBy", "grp")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(t)     // v2
    assert(TxLog.snapshot(spark, t, 2).count() === 1L)
    // a table holding UNPARTITIONED segments refuses dynamic overwrite
    val t2 = freshTable()
    Seq((1L, "g0")).toDF("id", "grp").write.format(fmt)
      .mode(org.apache.spark.sql.SaveMode.Append).save(t2)       // plain
    val e = intercept[IllegalArgumentException](
      Seq((2L, "g0")).toDF("id", "grp").write.format(fmt)
        .option("partitionBy", "grp")
        .option("partitionOverwriteMode", "dynamic")
        .mode(org.apache.spark.sql.SaveMode.Overwrite).save(t2))
    assert(e.getMessage.contains("no partition metadata"))
  }

  test("partition-scoped OPTIMIZE folds only the hot leaf; tombstones " +
      "stay live; overwrite still retires the folded segment") {
    import spark.implicits._
    val t = freshTable()
    val df = (0L until 30L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    df.write.format(fmt).option("partitionBy", "grp")
      .mode(org.apache.spark.sql.SaveMode.Append).save(t)        // v0
    df.filter(col("id") < 9L).write.format(fmt)
      .option("partitionBy", "grp")
      .mode(org.apache.spark.sql.SaveMode.Append).save(t)        // v1
    TxLog.commitDeletes(Seq(4L, 10L).toDF("id"), t)              // v2
    val coldBefore = TxLog.liveSegments(t, 2).filter(s =>
      TxLog.segmentParts(t, s).exists(_.exists(p => p._2 == "g0")))
    val folded = TxLog.compactPartitionsMoR(spark, t, Seq("id"),
      Seq("grp" -> "g1"))                                        // v3
    assert(folded.map(_._1) === Seq(Seq("grp" -> "g1")))
    val live = TxLog.liveSegments(t, 3)
    // cold leaves untouched, hot leaf now ONE segment, tombstone live
    assert(coldBefore.forall(live.contains))
    val g1Segs = live.filter(s => TxLog.segmentParts(t, s)
      .exists(_.exists(p => p._2 == "g1")))
    assert(g1Segs.size === 1, s"hot leaf must fold to one: $g1Segs")
    assert(live.exists(_.startsWith("deletes__")),
      "tombstones must stay live — they still mask the cold leaves")
    // MoR correctness across the fold: 30 + 9 re-adds − the re-added
    // duplicates are rows, not keys — count by data: ids 0..8 twice,
    // 9..29 once, minus deletes (4 twice, 10 once) = 39 − 3
    val snap = TxLog.snapshotMoR(spark, t, 3, Seq("id"))
    assert(snap.count() === 36L)
    assert(snap.filter(col("id").isin(4L, 10L)).isEmpty,
      "deleted keys stay dead in folded AND unfolded leaves")
    // idempotent: the folded leaf is one segment — nothing to do
    assert(TxLog.compactPartitionsMoR(spark, t, Seq("id"),
      Seq("grp" -> "g1")).isEmpty)
    // dynamic overwrite still retires the folded leaf exactly (its
    // partition identity survived the fold verbatim)
    Seq((200L, "g1")).toDF("id", "grp").write.format(fmt)
      .option("partitionBy", "grp")
      .option("partitionOverwriteMode", "dynamic")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(t)
    val after = TxLog.snapshotMoR(spark, t,
      TxLog.latestVersion(t).get, Seq("id"))
    assert(after.filter(col("grp") === "g1").collect()
      .map(_.getLong(0)).toSeq === Seq(200L))
    assert(after.filter(col("grp") === "g0").count() === 13L,
      "cold leaf g0 (10 + 3 re-added copies) untouched by it all")
  }

  test("widened schema rides SHALLOW CLONE") {
    import spark.implicits._
    val t = freshTable()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.format(fmt)
      .mode(org.apache.spark.sql.SaveMode.Append).save(t)        // v0
    TxLog.widenSchema(t, "note", "STRING")
    val dst = freshTable() + "/clone"
    TxLog.cloneTable(t, dst)
    assert(TxLog.widenedColumns(dst) === Seq("note" -> "STRING"),
      "the clone must inherit the widened-schema metadata")
    val cloneRead = TxLogRelation(spark.sqlContext, dst, None, None)
      .scanDf(Array("id", "note"), Array.empty)
    assert(cloneRead.collect().forall(_.isNullAt(1)),
      "pre-evolution rows read the widened column as NULL in the clone")
    // re-widening the same name fails loudly
    val dup = intercept[IllegalArgumentException](
      TxLog.widenSchema(t, "note", "INT"))
    assert(dup.getMessage.contains("already"))
  }

  test("timestamp bounds: at-or-after start, at-or-below end") {
    val t = freshTable()
    import spark.implicits._
    (0 to 2).foreach { i =>
      Seq(i.toLong).toDF("id").write.mode("overwrite")
        .parquet(s"$t/s$i")
      TxLog.commit(t, Seq(s"s$i")); ()
    }
    val log = java.nio.file.Paths.get(t, "_txlog")
    (0 to 2).foreach(v => java.nio.file.Files.setLastModifiedTime(
      log.resolve(s"v$v.json"),
      java.nio.file.attribute.FileTime.fromMillis(1000000L + v * 1000L)))
    assert(TxLog.versionAtOrAfterTimestamp(t, 1000000L) === 0)
    assert(TxLog.versionAtOrAfterTimestamp(t, 1000001L) === 1,
      "strictly between two commits → the NEXT one (start-side rule)")
    assert(TxLog.versionAtOrAfterTimestamp(t, 1002000L) === 2)
    val e = intercept[IllegalArgumentException](
      TxLog.versionAtOrAfterTimestamp(t, 1002001L))
    assert(e.getMessage.contains("postdates"))
  }
}
