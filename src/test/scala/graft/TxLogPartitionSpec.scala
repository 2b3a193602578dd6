package graft

import graft.sources.TxLog
import graft.sources.txlog.TxLogRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{SaveMode, sources => f}

/** Round-16 partitioned-table contracts: whole-table OPTIMIZE
  * preserves partition identity (and composes with dynamic overwrite
  * afterwards), partition column types come from the writer's schema,
  * an empty batch can't poison the fully-partitioned invariant, the
  * in-place repartition verb migrates legacy tables, leaf stats land
  * in one grouped job, and CONVERT never destroys files it did not
  * adopt. */
class TxLogPartitionSpec extends SparkSpec {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlog_part").toString

  private val fmt = "graft.sources.txlog"

  private def rel(dir: String): TxLogRelation =
    TxLogRelation(spark.sqlContext, dir,
      Some(TxLog.latestVersion(dir).get), None)

  test("partition column types come from the writer's schema: a " +
      "numeric-looking STRING value round-trips as a string") {
    import spark.implicits._
    val t = freshTable()
    Seq((1L, "007"), (2L, "010"), (3L, "007")).toDF("id", "code")
      .write.format(fmt).option("partitionBy", "code")
      .mode(SaveMode.Append).save(t)
    val snap = TxLog.snapshot(spark, t, 0)
    assert(snap.schema("code").dataType ===
      org.apache.spark.sql.types.StringType,
      "a StringType partition column must read back as StringType")
    assert(snap.filter(col("code") === "007").count() === 2L,
      "the VALUE '007' must survive verbatim — never the long 7")
    // the recorded sidecar type is string for every leaf
    TxLog.liveSegments(t, 0).foreach { s =>
      assert(TxLog.segmentParts(t, s).get.forall(_._3 == "string"))
    }
    // …and stays string on the NEXT batch even if its values all
    // parse as longs (per-batch inference would flip the type)
    Seq((4L, "12")).toDF("id", "code").write.format(fmt)
      .option("partitionBy", "code").mode(SaveMode.Append).save(t)
    val segs1 = TxLog.liveSegments(t, 1)
    assert(segs1.flatMap(s => TxLog.segmentParts(t, s).get)
      .forall(_._3 == "string"), "type stability across batches")
    // the merged read stays type-consistent (checkMergeable green)
    assert(TxLog.snapshot(spark, t, 1, mergeSchema = true).count() === 4L)
    // an unsupported partition-column type refuses loudly
    val bad = intercept[IllegalArgumentException] {
      Seq((java.sql.Date.valueOf("2024-01-01"), 1L)).toDF("d", "id")
        .write.format(fmt).option("partitionBy", "d")
        .mode(SaveMode.Append).save(freshTable())
    }
    assert(bad.getMessage.contains("integral and string"))
  }

  test("an empty partitioned batch does not poison the fully-" +
      "partitioned invariant: dynamic overwrite and OPTIMIZE WHERE " +
      "still work after it") {
    import spark.implicits._
    val t = freshTable()
    val df = (0L until 20L).map(i => (i, s"g${i % 2}")).toDF("id", "grp")
    assert(TxLog.appendBatch(df, 0L, t, partitionCols = Seq("grp")))
    // the empty micro-batch: plain fallback segment WITH the empty
    // parts marker — attributed to no value, but still partitioned
    assert(TxLog.appendBatch(df.filter(col("id") < 0L), 1L, t,
      partitionCols = Seq("grp")))
    val empty = TxLog.liveSegments(t, 1).find(_ == "batch__000001").get
    assert(TxLog.segmentParts(t, empty) === Some(Seq.empty),
      "the empty batch records the empty parts marker")
    assert(TxLog.appendBatch(df.filter(col("id") < 4L), 2L, t,
      partitionCols = Seq("grp")))
    // dynamic overwrite still works — the r15 failure mode (one empty
    // micro-batch made it refuse forever) is gone
    Seq((100L, "g1")).toDF("id", "grp").write.format(fmt)
      .option("partitionBy", "grp")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite).save(t)
    val snap = TxLog.snapshot(spark, t,
      TxLog.latestVersion(t).get, mergeSchema = true)
    assert(snap.filter(col("grp") === "g1").collect()
      .map(_.getLong(0)).toSeq === Seq(100L))
    assert(snap.filter(col("grp") === "g0").count() === 12L)
    // …and OPTIMIZE WHERE folds the hot leaf through the marker too
    val folded = TxLog.compactPartitionsMoR(spark, t, Seq("id"),
      Seq("grp" -> "g0"))
    assert(folded.map(_._1) === Seq(Seq("grp" -> "g0")))
  }

  test("whole-table OPTIMIZE on a partitioned table folds PER LEAF, " +
      "retires tombstones, and the layout verbs still work after") {
    import spark.implicits._
    val t = freshTable()
    val df = (0L until 30L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    df.write.format(fmt).option("partitionBy", "grp")
      .option("statsCols", "id").mode(SaveMode.Append).save(t)      // v0
    df.filter(col("id") < 9L).write.format(fmt)
      .option("partitionBy", "grp").option("statsCols", "id")
      .mode(SaveMode.Append).save(t)                                // v1
    TxLog.commitDeletes(Seq(4L, 10L).toDF("id"), t)                 // v2
    val folded = TxLog.compactAllPartitionsMoR(spark, t, Seq("id"))
    assert(folded.map(_._1) ===
      Seq(Seq("grp" -> "g0"), Seq("grp" -> "g1"), Seq("grp" -> "g2")),
      s"every leaf folds once, got $folded")
    val v = folded.head._2
    val live = TxLog.liveSegments(t, v)
    assert(!live.exists(_.startsWith("deletes__")),
      "a whole-table fold applies and RETIRES the tombstones")
    assert(live.size === 3, s"one segment per leaf, got $live")
    live.foreach { s =>
      assert(TxLog.segmentParts(t, s).exists(_.nonEmpty),
        s"partition identity must survive the fold: $s")
    }
    // rows correct: 30 + 9 re-adds − 3 tombstoned copies
    val snap = TxLog.snapshotMoR(spark, t, v, Seq("id"))
    assert(snap.count() === 36L)
    assert(snap.filter(col("id").isin(4L, 10L)).isEmpty)
    // stats carried: an out-of-domain partition probe still prunes
    assert(rel(t).keptSegments(Array(f.EqualTo("grp", "zzz"))).isEmpty)
    assert(rel(t).keptSegments(Array(f.EqualTo("grp", "g1"))).size === 1)
    // idempotent: nothing left to fold
    assert(TxLog.compactAllPartitionsMoR(spark, t, Seq("id")).isEmpty)
    // THE r15 verdict scenario: dynamic overwrite and OPTIMIZE WHERE
    // succeed AFTER the whole-table OPTIMIZE
    Seq((200L, "g1")).toDF("id", "grp").write.format(fmt)
      .option("partitionBy", "grp")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite).save(t)
    val after = TxLog.snapshot(spark, t, TxLog.latestVersion(t).get,
      mergeSchema = true)
    assert(after.filter(col("grp") === "g1").collect()
      .map(_.getLong(0)).toSeq === Seq(200L))
    df.filter(col("grp") === "g2").write.format(fmt)
      .option("partitionBy", "grp").mode(SaveMode.Append).save(t)
    assert(TxLog.compactPartitionsMoR(spark, t, Seq("id"),
      Seq("grp" -> "g2")).nonEmpty,
      "OPTIMIZE WHERE must still work after the whole-table fold")
    // history stays readable across the fold (dataChange=false)
    assert(TxLog.snapshot(spark, t, 0).count() === 30L)
  }

  test("maintainReport dispatches a partitioned plain table to the " +
      "partition-preserving fold (the SQL OPTIMIZE path)") {
    import spark.implicits._
    val t = freshTable()
    val df = (0L until 20L).map(i => (i, s"g${i % 2}")).toDF("id", "grp")
    df.write.format(fmt).option("partitionBy", "grp")
      .mode(SaveMode.Append).save(t)
    df.filter(col("id") < 6L).write.format(fmt)
      .option("partitionBy", "grp").mode(SaveMode.Append).save(t)
    TxLog.commitDeletes(Seq(3L).toDF("id"), t)
    val report = graft.operators.AnnIndex.maintainReport(spark, t,
      threshold = 1)
    assert(report.skipped.isEmpty, s"skips: ${report.skipped}")
    assert(report.compacted.map(_._1).sorted ===
      Seq("grp=g0", "grp=g1"), s"got ${report.compacted}")
    val live = TxLog.liveSegments(t, TxLog.latestVersion(t).get)
    assert(live.size === 2 &&
      live.forall(s => TxLog.segmentParts(t, s).exists(_.nonEmpty)),
      s"maintain must never strip partition identity, got $live")
    assert(TxLog.snapshot(spark, t, TxLog.latestVersion(t).get,
      mergeSchema = true).count() === 24L, "26 rows − 2 tombstoned")
  }

  test("OPTIMIZE REPARTITION BY migrates a plain table in place; " +
      "dynamic overwrite becomes possible; time travel intact") {
    import spark.implicits._
    val t = freshTable()
    val df = (0L until 24L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    // a LEGACY table: plain (unattributed) segments
    df.write.format(fmt).option("statsCols", "id")
      .mode(SaveMode.Append).save(t)                                // v0
    df.filter(col("id") < 6L).write.format(fmt)
      .mode(SaveMode.Append).save(t)                                // v1
    TxLog.commitDeletes(Seq(2L).toDF("id"), t)                      // v2
    // the precondition failure the verb exists to fix
    val refuse = intercept[IllegalArgumentException] {
      Seq((99L, "g0")).toDF("id", "grp").write.format(fmt)
        .option("partitionBy", "grp")
        .option("partitionOverwriteMode", "dynamic")
        .mode(SaveMode.Overwrite).save(t)
    }
    assert(refuse.getMessage.contains("REPARTITION BY"),
      "the refusal must name the verb that actually fixes it")
    val res = TxLog.repartitionTable(spark, t, Seq("grp"), Seq("id"))
    assert(res.isDefined)
    val (segs, v) = res.get
    assert(segs.size === 3, s"one segment per value, got $segs")
    val live = TxLog.liveSegments(t, v)
      .filterNot(_.startsWith("deletes__"))
    assert(live.forall(s => TxLog.segmentParts(t, s).isDefined),
      "every live data segment is attributed after the migration")
    // rows: 24 + 6 re-adds − 2 copies of id 2 (tombstone applied)
    assert(TxLog.snapshotMoR(spark, t, v, Seq("id")).count() === 28L)
    // idempotent
    assert(TxLog.repartitionTable(spark, t, Seq("grp"), Seq("id"))
      .isEmpty)
    // the blocked verb now works
    Seq((99L, "g0")).toDF("id", "grp").write.format(fmt)
      .option("partitionBy", "grp")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite).save(t)
    val after = TxLog.snapshotMoR(spark, t,
      TxLog.latestVersion(t).get, Seq("id"))
    assert(after.filter(col("grp") === "g0").collect()
      .map(_.getLong(0)).toSeq === Seq(99L))
    // every pre-repartition version stays time-travelable
    assert(TxLog.snapshot(spark, t, 0).count() === 24L)
    assert(TxLog.snapshot(spark, t, 1).count() === 30L)
  }

  test("partitioned writes compute ALL leaf stats in ONE grouped " +
      "aggregation, byte-identical to the per-leaf path") {
    import spark.implicits._
    val t = freshTable()
    val df = (0L until 64L).map(i => (i, i * 2.5, s"g${i % 8}"))
      .toDF("id", "w", "grp")
    val before = TxLog.statsJobCount.get()
    df.write.format(fmt).option("partitionBy", "grp")
      .option("statsCols", "id,w").mode(SaveMode.Append).save(t)
    assert(TxLog.statsJobCount.get() === before + 1,
      "8 leaves, ONE stats job — never one per leaf")
    // compare sidecar bytes against the per-leaf reference path
    val segs = TxLog.liveSegments(t, 0).sorted
    assert(segs.size === 8)
    segs.foreach { s =>
      val got = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(t, "_txlog", s"stats-$s.json")),
        java.nio.charset.StandardCharsets.UTF_8)
      // rebuild the same sidecar with the per-leaf machinery
      TxLog.writeSegmentStats(spark, t, s, Seq("id", "w"))
      TxLog.appendConstStats(t, s, TxLog.segmentParts(t, s).get)
      val want = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(t, "_txlog", s"stats-$s.json")),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(got === want, s"sidecar for $s must be byte-identical")
    }
    // the point ranges still prune
    assert(rel(t).keptSegments(Array(f.EqualTo("grp", "g3"))).size === 1)
  }

  test("a WHERE matching many leaves folds them CONCURRENTLY with " +
      "identical results") {
    import spark.implicits._
    val t = freshTable()
    val df = (0L until 160L).map(i => (i, s"g${i % 8}")).toDF("id", "grp")
    df.write.format(fmt).option("partitionBy", "grp")
      .mode(SaveMode.Append).save(t)
    df.write.format(fmt).option("partitionBy", "grp")
      .mode(SaveMode.Append).save(t)
    // every g-leaf matches: 8 concurrent leaf folds
    val folded = (0 until 8).flatMap(r =>
      TxLog.compactPartitionsMoR(spark, t, Seq("id"),
        Seq("grp" -> s"g$r")))
    assert(folded.size === 8)
    val live = TxLog.liveSegments(t, TxLog.latestVersion(t).get)
    assert(live.size === 8, s"each leaf folded to one, got $live")
    assert(TxLog.snapshot(spark, t, TxLog.latestVersion(t).get,
      mergeSchema = true).count() === 320L, "no rows lost or doubled")
    // and the whole-table fold over MANY leaves in one call
    val t2 = freshTable()
    df.write.format(fmt).option("partitionBy", "grp")
      .mode(SaveMode.Append).save(t2)
    df.write.format(fmt).option("partitionBy", "grp")
      .mode(SaveMode.Append).save(t2)
    val all = TxLog.compactAllPartitionsMoR(spark, t2, Seq("id"))
    assert(all.size === 8, "all 8 leaves fold in ONE call/commit")
    assert(all.map(_._2).distinct.size === 1,
      "…behind ONE atomic commit")
    assert(TxLog.snapshot(spark, t2, all.head._2, mergeSchema = true)
      .count() === 320L)
  }

  test("CONVERT preserves non-parquet files and never-adopted leaves") {
    import spark.implicits._
    val t = freshTable()
    (0L until 20L).map(i => (i, s"g${i % 2}")).toDF("id", "grp")
      .write.partitionBy("grp").mode("overwrite").parquet(t)
    // a foreign marker file inside an adopted leaf, and a leaf that
    // holds NO parquet (never adopted) with its own payload
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "grp=g0", "NOTES.txt"),
      "keep me".getBytes)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(t, "grp=g9"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "grp=g9", "payload.bin"),
      Array[Byte](1, 2, 3))
    TxLog.convertPartitionedInPlace(spark, t)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(t, "grp=g0", "NOTES.txt")),
      "conversion must not destroy files it did not adopt")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(t, "grp=g9", "payload.bin")),
      "a never-adopted leaf is not ours to delete")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(t, "grp=g1")),
      "a fully-adopted leaf that emptied out is pruned")
    assert(TxLog.snapshot(spark, t, 0).count() === 20L)
  }

  test("a multi-byte percent escape in an adopted layout refuses " +
      "loudly, naming the path") {
    import spark.implicits._
    val t = freshTable()
    Seq((1L, "x")).toDF("id", "grp")
      .write.partitionBy("grp").mode("overwrite").parquet(t)
    // hand-build the foreign leaf: percent-encoded UTF-8 bytes (é)
    val src = java.nio.file.Paths.get(t, "grp=x")
    val bad = java.nio.file.Paths.get(t, "grp=caf%C3%A9")
    java.nio.file.Files.createDirectories(bad)
    val part = java.nio.file.Files.list(src).iterator().asScala()
      .find(p => p.getFileName.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith(".")).get
    java.nio.file.Files.copy(part, bad.resolve("part-0.parquet"))
    val e = intercept[IllegalArgumentException](
      TxLog.convertPartitionedInPlace(spark, t))
    assert(e.getMessage.contains("%C3") &&
      e.getMessage.contains("caf"),
      s"must name the escape and the path, got: ${e.getMessage}")
  }

  test("OPTIMIZE WHERE refuses a non-partition predicate column by " +
      "name") {
    import spark.implicits._
    val t = freshTable()
    (0L until 10L).map(i => (i, s"g${i % 2}")).toDF("id", "grp")
      .write.format(fmt).option("partitionBy", "grp")
      .mode(SaveMode.Append).save(t)
    val e = intercept[IllegalArgumentException](
      TxLog.compactPartitionsMoR(spark, t, Seq("id"),
        Seq("typo_col" -> "x")))
    assert(e.getMessage.contains("typo_col") &&
      e.getMessage.contains("not a partition column"))
  }

  test("compactMoR carries partition attribution when every folded " +
      "segment shares one value-set") {
    import spark.implicits._
    val t = freshTable()
    val df = (0L until 10L).map(i => (i, "g0")).toDF("id", "grp")
    df.write.format(fmt).option("partitionBy", "grp")
      .mode(SaveMode.Append).save(t)
    df.write.format(fmt).option("partitionBy", "grp")
      .mode(SaveMode.Append).save(t)
    val v = TxLog.compactMoR(spark, t, Seq("id"))
    val live = TxLog.liveSegments(t, v)
    assert(live.size === 1)
    assert(TxLog.segmentParts(t, live.head).exists(_.nonEmpty),
      "a single-leaf fold must not demote the table to unpartitioned")
  }

  test("ALTER ADD COLUMNS is atomic: a failing later column leaves " +
      "widen.json untouched") {
    val t = freshTable()
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "s").write.format(fmt)
      .mode(SaveMode.Append).save(t)
    TxLog.widenSchema(t, "w0", "STRING")
    val e = intercept[IllegalArgumentException](
      TxLog.widenSchemaAll(t, Seq("w1" -> "INT", "w0" -> "STRING")))
    assert(e.getMessage.contains("already"))
    assert(TxLog.widenedColumns(t) === Seq("w0" -> "STRING"),
      "the failed multi-ALTER must record NOTHING")
    // duplicates within one statement refuse too
    val dup = intercept[IllegalArgumentException](
      TxLog.widenSchemaAll(t, Seq("a" -> "INT", "A" -> "STRING")))
    assert(dup.getMessage.contains("duplicate"))
  }

  test("DROP COLUMN is O(1) metadata: reads project it away, re-ADD " +
      "refuses, the clone inherits it") {
    import spark.implicits._
    val t = freshTable()
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "x")
      .write.format(fmt).mode(SaveMode.Append).save(t)
    TxLog.dropColumnsMeta(t, Seq("x"))
    val read = TxLogRelation(spark.sqlContext, t, None, None)
    assert(read.schema.fieldNames.toSeq === Seq("id", "s"),
      "the dropped column disappears from the relation schema")
    assert(read.scanDf(Array("id", "s"), Array.empty).count() === 2L)
    // a post-drop write lacking the column still reads merged
    Seq((3L, "c")).toDF("id", "s").write.format(fmt)
      .mode(SaveMode.Append).save(t)
    assert(read.scanDf(Array("id"), Array.empty).count() === 3L)
    // re-adding the dropped name refuses (old values would resurrect)
    val e = intercept[IllegalArgumentException](
      TxLog.widenSchema(t, "x", "BIGINT"))
    assert(e.getMessage.contains("DROPPED"))
    // already-dropped refuses
    val e2 = intercept[IllegalArgumentException](
      TxLog.dropColumnsMeta(t, Seq("x")))
    assert(e2.getMessage.contains("already dropped"))
    // the metadata rides SHALLOW CLONE
    val dst = freshTable() + "/clone"
    TxLog.cloneTable(t, dst)
    assert(TxLog.droppedColumns(dst) === Seq("x"))
  }

  test("ZORDER on a partitioned table lays out WITHIN each leaf: " +
      "partition identity survives, tombstones retire") {
    import spark.implicits._
    val t = freshTable()
    val df = (0L until 80L).map(i => (i, i * 3 % 40, s"g${i % 2}"))
      .toDF("id", "x", "grp")
    df.write.format(fmt).option("partitionBy", "grp")
      .option("statsCols", "id").mode(SaveMode.Append).save(t)      // v0
    df.filter(col("id") < 10L).write.format(fmt)
      .option("partitionBy", "grp").option("statsCols", "id")
      .mode(SaveMode.Append).save(t)                                // v1
    TxLog.commitDeletes(Seq(7L).toDF("id"), t)                      // v2
    val folded = TxLog.compactZorderAllPartitions(spark, t,
      Seq("id"), Seq("id", "x"), nFiles = 4)
    assert(folded.map(_._1) ===
      Seq(Seq("grp" -> "g0"), Seq("grp" -> "g1")))
    val v = folded.head._2
    val live = TxLog.liveSegments(t, v)
    assert(live.size === 2 && !live.exists(_.startsWith("deletes__")),
      s"one z-ordered segment per leaf, tombstones retired: $live")
    live.foreach(s => assert(
      TxLog.segmentParts(t, s).exists(_.nonEmpty),
      s"partition identity must survive the zorder: $s"))
    // rows: 80 + 10 re-adds − 2 copies of id 7
    assert(TxLog.snapshot(spark, t, v, mergeSchema = true)
      .count() === 88L)
    // partition pruning intact; dynamic overwrite still composes
    assert(rel(t).keptSegments(Array(f.EqualTo("grp", "g1"))).size === 1)
    Seq((500L, 1L, "g1")).toDF("id", "x", "grp").write.format(fmt)
      .option("partitionBy", "grp")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite).save(t)
    assert(TxLog.snapshot(spark, t, TxLog.latestVersion(t).get,
      mergeSchema = true).filter(col("grp") === "g1").count() === 1L)
  }

  test("RESTORE to a tombstoned partitioned state materializes PER " +
      "LEAF: partition identity survives the recovery") {
    import spark.implicits._
    val t = freshTable()
    val df = (0L until 30L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    df.write.format(fmt).option("partitionBy", "grp")
      .option("statsCols", "id").mode(SaveMode.Append).save(t)      // v0
    df.filter(col("id") < 9L).write.format(fmt)
      .option("partitionBy", "grp").option("statsCols", "id")
      .mode(SaveMode.Append).save(t)                                // v1
    TxLog.commitDeletes(Seq(4L).toDF("id"), t)                      // v2
    // the OPTIMIZE retires the v0/v1 segments + the tombstone, so a
    // restore to v2 must RE-CREATE state (rewrite mode, not metadata)
    TxLog.compactAllPartitionsMoR(spark, t, Seq("id"))              // v3
    val res = TxLog.restore(spark, t, 2, keyCols = Seq("id"))
    assert(res.exists(_._2 == "rewrite"), s"got $res")
    val v = res.get._1
    val live = TxLog.liveSegments(t, v)
    assert(live.size === 3 && live.forall(_.startsWith("restore__")),
      s"one materialized segment per leaf, got $live")
    live.foreach(s => assert(
      TxLog.segmentParts(t, s).exists(_.nonEmpty),
      s"the restore must keep the partition identity: $s"))
    // rows = the v2 MoR state: 30 + 9 re-adds − 2 copies of id 4
    assert(TxLog.snapshot(spark, t, v, mergeSchema = true)
      .count() === 37L)
    // the recovered table still takes the layout verbs
    Seq((300L, "g2")).toDF("id", "grp").write.format(fmt)
      .option("partitionBy", "grp")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite).save(t)
    assert(TxLog.snapshot(spark, t, TxLog.latestVersion(t).get,
      mergeSchema = true).filter(col("grp") === "g2").count() === 1L)
  }

  test("maxBytesPerTrigger: capped drain in byte-bounded batches, " +
      "checkpoint resume, oversized commits still pass") {
    import spark.implicits._
    val t = freshTable()
    // four commits of visibly different sizes
    (0 until 4).foreach { i =>
      (0L until (i + 1) * 200L).toDF("id").coalesce(1)
        .write.format(fmt).mode(SaveMode.Append).save(t)
    }
    val sizes = (0 to 3).map(v => TxLog.versionAddedBytes(t, v))
    assert(sizes.forall(_ > 0) && sizes.last > sizes.head)
    val ckpt = java.nio.file.Files
      .createTempDirectory("txlog_bytes_ckpt").toString
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]
    def drain(): Unit = {
      val q = spark.readStream.format("graft-txlog")
        .option("maxBytesPerTrigger", (sizes.head + 1).toString)
        .load(t)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          out.add(id -> b.count()); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000); ()
    }
    drain()
    val counts = out.iterator().asScala().map(_._2).toSeq
    assert(counts.sum === (200L + 400L + 600L + 800L))
    assert(counts.size === 4,
      s"each version exceeds the budget alone → one version per " +
        s"batch, got $counts")
    // resume: a new commit drains from the checkpoint, no replay
    out.clear()
    (0L until 50L).toDF("id").coalesce(1)
      .write.format(fmt).mode(SaveMode.Append).save(t)
    drain()
    val resumed = out.iterator().asScala().map(_._2).toSeq
    assert(resumed.sum === 50L, s"resume must not replay, got $resumed")
  }

  private implicit class RichIt[A](val it: java.util.Iterator[A]) {
    def asScala(): Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }
}
