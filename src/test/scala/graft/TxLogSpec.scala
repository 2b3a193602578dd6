package graft

import graft.sources.TxLog
import org.apache.spark.sql.functions._

/** Contract tests for the minimal transaction-log table format. */
class TxLogSpec extends SparkSpec {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("txlog_spec").toString

  private def writeSeg(table: String, name: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("id").write.mode("overwrite").parquet(s"$table/$name")
  }

  test("version algebra: adds accumulate, removes drop, history stays") {
    val t = freshTable()
    writeSeg(t, "a", Seq(1L, 2L))
    writeSeg(t, "b", Seq(3L))
    writeSeg(t, "c", Seq(4L, 5L))
    assert(TxLog.versions(t).isEmpty)
    assert(TxLog.commit(t, Seq("a")) === 0)
    assert(TxLog.commit(t, Seq("b")) === 1)
    assert(TxLog.commit(t, Seq("c"), removes = Seq("a")) === 2)
    assert(TxLog.versions(t) === Seq(0, 1, 2))
    assert(TxLog.liveSegments(t, 0) === Seq("a"))
    assert(TxLog.liveSegments(t, 1) === Seq("a", "b"))
    assert(TxLog.liveSegments(t, 2) === Seq("b", "c"))
    def ids(v: Int) = TxLog.snapshot(spark, t, v)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(0) === Seq(1L, 2L))
    assert(ids(1) === Seq(1L, 2L, 3L))
    assert(ids(2) === Seq(3L, 4L, 5L)) // segment a invisible at v2...
    assert(ids(1) === Seq(1L, 2L, 3L)) // ...but still readable at v1
  }

  test("removing an unknown segment fails loudly AT COMMIT TIME") {
    val t = freshTable()
    writeSeg(t, "a", Seq(1L))
    TxLog.commit(t, Seq("a"))
    TxLog.commit(t, Seq.empty, removes = Seq("a"))
    // v1 removed 'a'; removing it again (a stale concurrent compactor,
    // or a typo) must be REFUSED before the manifest installs — a
    // committed double-remove would poison every later fold of the log
    val e = intercept[IllegalArgumentException](
      TxLog.commit(t, Seq.empty, removes = Seq("a")))
    assert(e.getMessage.contains("concurrent writer"))
    // the log stays fully readable after the refused commit
    assert(TxLog.latestVersion(t).get === 1)
    assert(TxLog.liveSegments(t, 1).isEmpty)
    assert(TxLog.liveSegments(t, 0) === Seq("a"))
  }

  test("unknown version and empty commit are rejected") {
    val t = freshTable()
    writeSeg(t, "a", Seq(1L))
    TxLog.commit(t, Seq("a"))
    intercept[IllegalArgumentException](TxLog.liveSegments(t, 7))
    intercept[IllegalArgumentException](TxLog.commit(t, Seq.empty))
    intercept[IllegalArgumentException](
      TxLog.commit(t, Seq("evil/../../etc")))
  }

  test("concurrent commits claim distinct sequential versions") {
    val t = freshTable()
    (0 until 8).foreach(i => writeSeg(t, s"s$i", Seq(i.toLong)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = TxLog.commit(t, Seq(s"s$i"))
        })
      }
      val versions = futs.map(_.get()).sorted
      assert(versions === (0 until 8)) // optimistic retry: no gaps, no dupes
      assert(TxLog.liveSegments(t, 7).sorted === (0 until 8).map(i => s"s$i"))
    } finally pool.shutdown()
  }

  test("snapshot schema and aggregate survive a remove-heavy history") {
    val t = freshTable()
    writeSeg(t, "x", 1L to 100L)
    writeSeg(t, "y", 101L to 150L)
    TxLog.commit(t, Seq("x", "y"))
    TxLog.commit(t, Seq.empty, removes = Seq("x"))
    val v1 = TxLog.snapshot(spark, t, 1).agg(count(lit(1)), sum("id")).head
    assert(v1.getLong(0) === 50L)
    assert(v1.getLong(1) === (101L to 150L).sum)
  }

  /** Reference fold: every manifest from v0, no checkpoint shortcut —
    * the semantics checkpoints must reproduce exactly. */
  private def manifestOnlyFold(t: String, asOf: Int): Seq[String] = {
    val live = scala.collection.mutable.LinkedHashSet[String]()
    (0 to asOf).foreach { v =>
      val body = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(t, "_txlog", s"v$v.json")),
        java.nio.charset.StandardCharsets.UTF_8)
      def arr(name: String): Seq[String] =
        s""""$name":\\[([^\\]]*)\\]""".r.findFirstMatchIn(body).get
          .group(1).split(",").map(_.trim.stripPrefix("\"")
            .stripSuffix("\"")).filter(_.nonEmpty).toSeq
      arr("adds").foreach(live += _)
      arr("removes").foreach(live -= _)
    }
    live.toSeq
  }

  test("checkpoints reproduce the manifest fold at every version") {
    val t = freshTable()
    // a grow-per-commit history long enough to cross two checkpoint
    // boundaries, with interleaved removes (compaction-style)
    (0 until 40).foreach { i =>
      writeSeg(t, s"g$i", Seq(i.toLong))
      val removes =
        if (i % 7 == 6) Seq(s"g${i - 3}") else Seq.empty
      TxLog.commit(t, Seq(s"g$i"), removes)
    }
    val ckpts = new java.io.File(s"$t/_txlog").listFiles()
      .map(_.getName).filter(_.startsWith("ckpt-v")).sorted.toSeq
    assert(ckpts === Seq("ckpt-v16.json", "ckpt-v32.json"),
      s"expected checkpoints at the 16-commit cadence, got $ckpts")
    // every pinned version reads identically through the checkpointed
    // fold and the full manifest replay — including versions BELOW,
    // AT, and ABOVE each checkpoint
    (0 until 40).foreach { v =>
      assert(TxLog.liveSegments(t, v) === manifestOnlyFold(t, v),
        s"checkpointed fold diverged at v$v")
    }
  }

  test("vacuum reclaims unreachable segments and orphans, bounded by the horizon") {
    val t = freshTable()
    writeSeg(t, "a", Seq(1L, 2L))
    writeSeg(t, "b", Seq(3L))
    writeSeg(t, "c", Seq(4L, 5L))
    writeSeg(t, "zz_orphan", Seq(99L)) // crashed install: never committed
    TxLog.commit(t, Seq("a"))                      // v0
    TxLog.commit(t, Seq("b"), removes = Seq("a"))  // v1
    TxLog.commit(t, Seq("c"))                      // v2
    val gone = TxLog.vacuum(t, keepFrom = 1)
    // a is unreachable from v1..v2; the orphan was never reachable
    assert(gone === Seq("a", "zz_orphan"))
    assert(!new java.io.File(t, "a").exists())
    // retained versions read exactly as before
    assert(TxLog.snapshot(spark, t, 1).count() === 1L)
    assert(TxLog.snapshot(spark, t, 2).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L, 5L))
    // the log is intact — version numbering (and so segment naming)
    // never rewinds, and the horizon is explicit: v0's data is gone
    assert(TxLog.versions(t) === Seq(0, 1, 2))
    assert(TxLog.liveSegments(t, 0) === Seq("a"))
    intercept[Exception] { TxLog.snapshot(spark, t, 0).count() }
    // idempotent: nothing left to reclaim
    assert(TxLog.vacuum(t, keepFrom = 1).isEmpty)
  }

  test("a corrupt checkpoint is skipped, never trusted") {
    val t = freshTable()
    (0 until 20).foreach { i =>
      writeSeg(t, s"s$i", Seq(i.toLong))
      TxLog.commit(t, Seq(s"s$i"))
    }
    val expect = TxLog.liveSegments(t, 19)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "_txlog", "ckpt-v16.json"),
      "{not json".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(TxLog.liveSegments(t, 19) === expect,
      "fold must fall back to manifests when the checkpoint is unreadable")
  }

  test("appendBatch: applies once, redelivery is a no-op") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch(Seq(1L, 2L).toDF("id"), 0L, t))
    assert(TxLog.appendBatch(Seq(3L).toDF("id"), 1L, t))
    val v1 = TxLog.latestVersion(t).get
    // crash-after-commit redelivery: same batch id, even different
    // rows (the re-read could differ) — must be skipped entirely
    assert(!TxLog.appendBatch(Seq(99L).toDF("id"), 0L, t))
    assert(TxLog.latestVersion(t).get === v1, "redelivery committed a version")
    val got = TxLog.snapshot(spark, t, v1).as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L, 3L))
  }

  test("appendBatch: crash-before-commit orphan is overwritten on redelivery") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch(Seq(1L).toDF("id"), 0L, t))
    // simulate the crash window: batch 1's data dir written, no commit
    writeSeg(t, "batch__000001", Seq(777L))
    assert(TxLog.latestVersion(t).get === 0)
    // redelivery of batch 1 overwrites the orphan and commits it
    assert(TxLog.appendBatch(Seq(2L, 3L).toDF("id"), 1L, t))
    val got = TxLog.snapshot(spark, t, 1).as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L, 3L), "orphan rows leaked into the table")
  }

  test("appendBatch: redelivery after a compaction retired the segment is still a no-op") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch(Seq(1L, 2L).toDF("id"), 0L, t))
    assert(TxLog.appendBatch(Seq(3L).toDF("id"), 1L, t))
    TxLog.compactMoR(spark, t, Seq("id")) // retires both batch__ segments
    // the redelivery test is manifest-HISTORY-based: the segment is no
    // longer live, but it was once added — re-appending would
    // double-count its rows
    assert(!TxLog.appendBatch(Seq(1L, 2L).toDF("id"), 0L, t),
      "crash-after-commit redelivery of a compacted-away batch must not re-append")
    assert(TxLog.snapshot(spark, t, TxLog.latestVersion(t).get)
      .count() === 3)
  }

  test("changes: each delta reads exactly the span's added segments") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch(Seq(1L, 2L).toDF("id"), 0L, t))
    assert(TxLog.appendBatch(Seq(3L).toDF("id"), 1L, t))
    assert(TxLog.appendBatch(Seq(4L, 5L).toDF("id"), 2L, t))
    def delta(f: Int, to: Int) = TxLog.changes(spark, t, f, to)
    assert(delta(-1, 0).as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(delta(0, 1).as[Long].collect().sorted.toSeq === Seq(3L))
    assert(delta(1, 2).as[Long].collect().sorted.toSeq === Seq(4L, 5L))
    assert(delta(0, 2).as[Long].collect().sorted.toSeq === Seq(3L, 4L, 5L))
    // O(delta) witness: the v1→v2 plan scans ONLY batch 2's segment
    val p = delta(1, 2).queryExecution.executedPlan.toString
    assert(p.contains("batch__000002"))
    assert(!p.contains("batch__000000") && !p.contains("batch__000001"),
      "delta scan touched segments outside the span")
  }

  test("MoR deletes: tombstones kill only older segments; re-inserts survive") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch(Seq(1L, 2L, 3L).toDF("id"), 0L, t))   // v0
    assert(TxLog.appendBatch(Seq(4L, 5L).toDF("id"), 1L, t))       // v1
    TxLog.commitDeletes(Seq(2L, 4L, 99L).toDF("id"), t)            // v2
    assert(TxLog.appendBatch(Seq(4L, 6L).toDF("id"), 2L, t))       // v3: 4 re-inserted
    def ids(v: Int) = TxLog.snapshotMoR(spark, t, v, Seq("id"))
      .as[Long].collect().sorted.toSeq
    assert(ids(3) === Seq(1L, 3L, 4L, 5L, 6L),
      "re-inserted key must survive its older tombstone")
    assert(ids(2) === Seq(1L, 3L, 5L), "tombstone must apply at its own version")
    assert(ids(1) === Seq(1L, 2L, 3L, 4L, 5L), "pre-delete snapshot unchanged")
    // stacking: a later tombstone kills the re-inserted key too
    TxLog.commitDeletes(Seq(4L).toDF("id"), t)                     // v4
    assert(ids(4) === Seq(1L, 3L, 5L, 6L))
    // changes() refuses a span that committed deletes
    val e = intercept[IllegalArgumentException](TxLog.changes(spark, t, 1, 2))
    assert(e.getMessage.contains("snapshotMoR"))
  }

  test("compactMoR applies tombstones physically; history stays readable") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch(Seq(1L, 2L, 3L).toDF("id"), 0L, t))   // v0
    TxLog.commitDeletes(Seq(2L).toDF("id"), t)                     // v1
    assert(TxLog.appendBatch(Seq(2L, 9L).toDF("id"), 1L, t))       // v2: 2 re-inserted
    val before = TxLog.snapshotMoR(spark, t, 2, Seq("id"))
      .as[Long].collect().sorted.toSeq
    val cv = TxLog.compactMoR(spark, t, Seq("id"))                 // v3
    val live = TxLog.liveSegments(t, cv)
    assert(live.size === 1 && live.head.startsWith("compact__"),
      s"one clean data segment expected, got $live")
    val after = TxLog.snapshotMoR(spark, t, cv, Seq("id"))
      .as[Long].collect().sorted.toSeq
    assert(after === before && after === Seq(1L, 2L, 3L, 9L))
    // plain snapshot agrees too (no tombstones live anymore)
    assert(TxLog.snapshot(spark, t, cv).as[Long].collect().sorted.toSeq === after)
    // time travel: the pre-compaction MoR state is still readable
    assert(TxLog.snapshotMoR(spark, t, 1, Seq("id"))
      .as[Long].collect().sorted.toSeq === Seq(1L, 3L))
  }

  test("changesCdf: folding the feed reproduces snapshotMoR at every version") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch(Seq(1L, 2L, 3L).toDF("id"), 0L, t))   // v0
    assert(TxLog.appendBatch(Seq(4L, 5L).toDF("id"), 1L, t))       // v1
    TxLog.commitDeletes(Seq(2L, 4L, 99L).toDF("id"), t)            // v2
    assert(TxLog.appendBatch(Seq(4L, 6L).toDF("id"), 2L, t))       // v3: 4 re-inserted
    TxLog.commitDeletes(Seq(4L).toDF("id"), t)                     // v4: kills the re-insert
    def fold(toV: Int): Seq[Long] = {
      val cdf = TxLog.changesCdf(spark, t, -1, toV)
      val ins = cdf.filter(col("_change_type") === "insert")
      val del = cdf.filter(col("_change_type") === "delete")
        .select(col("id").as("__dk"), col("_commit_version").as("__dv"))
      ins.join(del, ins("id") === del("__dk") &&
          del("__dv") > ins("_commit_version"), "left_anti")
        .select("id").as[Long].collect().sorted.toSeq
    }
    (0 to 4).foreach { v =>
      val mor = TxLog.snapshotMoR(spark, t, v, Seq("id"))
        .as[Long].collect().sorted.toSeq
      assert(fold(v) === mor, s"CDF fold diverged from snapshotMoR at v$v")
    }
    // delete rows carry the key and the version; nothing else exists
    // in a keys-only tombstone
    val dels = TxLog.changesCdf(spark, t, 3, 4)
    assert(dels.columns.toSeq === Seq("id", "_change_type", "_commit_version"))
    assert(dels.collect().map(r => (r.getLong(0), r.getString(1),
      r.getInt(2))).toSeq === Seq((4L, "delete", 4)))
    // incremental spans compose: (−1,2] ++ (2,4] ≡ (−1,4]
    val a = TxLog.changesCdf(spark, t, -1, 2).unionByName(
      TxLog.changesCdf(spark, t, 2, 4))
    val b = TxLog.changesCdf(spark, t, -1, 4)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("randomized histories: snapshotMoR and the CDF fold match a reference model at every version") {
    import spark.implicits._
    // seeded, bounded histories of appends (duplicate keys allowed,
    // re-inserts included) and deletes (sometimes of unknown or
    // already-dead keys): the on-log reads must equal a trivial
    // in-memory multiset model — arbitrary interleavings, not just
    // the handwritten fixtures above
    val rnd = new scala.util.Random(12)
    (0 until 5).foreach { trial =>
      val t = freshTable()
      var model = Vector.empty[Long] // live rows (multiset)
      var batchId = 0L
      val states = scala.collection.mutable.Map.empty[Int, Vector[Long]]
      val nOps = 5 + rnd.nextInt(3)
      (0 until nOps).foreach { op =>
        val dice = rnd.nextInt(6)
        if (model.nonEmpty && dice == 0) {
          val ids = Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(30).toLong).distinct
          TxLog.commitDeletes(ids.toDF("id"), t)
          model = model.filterNot(ids.contains)
        } else if (model.nonEmpty && dice == 1) {
          // interleaved OPTIMIZE (dataChange=false): the model is
          // unchanged — reads and change feeds must step over it
          TxLog.compactMoR(spark, t, Seq("id"))
          ()
        } else {
          val ids = Seq.fill(1 + rnd.nextInt(5))(rnd.nextInt(30).toLong)
          assert(TxLog.appendBatch(ids.toDF("id"), batchId, t))
          batchId += 1
          model = model ++ ids
        }
        states(TxLog.latestVersion(t).get) = model
      }
      states.toSeq.sortBy(_._1).foreach { case (v, expect) =>
        val mor = TxLog.snapshotMoR(spark, t, v, Seq("id"))
          .as[Long].collect().sorted.toSeq
        assert(mor === expect.sorted,
          s"trial $trial v$v: snapshotMoR diverged from the model")
        val cdf = TxLog.changesCdf(spark, t, -1, v)
        val ins = cdf.filter(col("_change_type") === "insert")
        val del = cdf.filter(col("_change_type") === "delete")
          .select(col("id").as("__dk"), col("_commit_version").as("__dv"))
        val folded = ins.join(del, ins("id") === del("__dk") &&
            del("__dv") > ins("_commit_version"), "left_anti")
          .select("id").as[Long].collect().sorted.toSeq
        assert(folded === mor,
          s"trial $trial v$v: CDF fold diverged from snapshotMoR " +
            "(maintenance commits must contribute no change rows)")
      }
    }
  }

  test("changesCdf: steps over an OPTIMIZE commit; fold still equals snapshotMoR") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch(Seq(1L, 2L).toDF("id"), 0L, t))       // v0
    TxLog.commitDeletes(Seq(2L).toDF("id"), t)                     // v1
    TxLog.compactMoR(spark, t, Seq("id"))                          // v2: maintenance
    assert(TxLog.appendBatch(Seq(9L).toDF("id"), 1L, t))           // v3
    // the feed continues THROUGH the compaction: its rows were
    // already delivered by v0/v1; only v0/v1/v3 contribute changes
    val cdf = TxLog.changesCdf(spark, t, -1, 3)
    assert(cdf.count() === 4) // inserts 1,2,9 + delete 2
    assert(!cdf.queryExecution.executedPlan.toString.contains("compact__"),
      "the CDF scan must not touch the maintenance commit's segment")
    val ins = cdf.filter(col("_change_type") === "insert")
    val del = cdf.filter(col("_change_type") === "delete")
      .select(col("id").as("__dk"), col("_commit_version").as("__dv"))
    val folded = ins.join(del, ins("id") === del("__dk") &&
        del("__dv") > ins("_commit_version"), "left_anti")
      .select("id").as[Long].collect().sorted.toSeq
    assert(folded === TxLog.snapshotMoR(spark, t, 3, Seq("id"))
      .as[Long].collect().sorted.toSeq)
    assert(TxLog.dataChangeVersions(t, -1, 3) === Seq(0, 1, 3))
  }

  test("changes: steps over maintenance commits; a maintenance-only span is empty") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch(Seq(1L).toDF("id"), 0L, t))           // v0
    assert(TxLog.appendBatch(Seq(2L).toDF("id"), 1L, t))           // v1
    writeSeg(t, "merged", Seq(1L, 2L))
    TxLog.commit(t, Seq("merged"),                                 // v2: OPTIMIZE
      removes = Seq("batch__000000", "batch__000001"), dataChange = false)
    assert(TxLog.appendBatch(Seq(3L).toDF("id"), 2L, t))           // v3
    // the whole span reads the data commits only — the compacted
    // segment (which would double-count 1 and 2) is never scanned
    val d = TxLog.changes(spark, t, -1, 3)
    assert(d.as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    assert(!d.queryExecution.executedPlan.toString.contains("merged"))
    assert(TxLog.changes(spark, t, 1, 3).as[Long].collect().toSeq === Seq(3L))
    // a span holding ONLY the maintenance commit has no delta
    assert(TxLog.dataChangeVersions(t, 1, 2).isEmpty)
    val e = intercept[IllegalArgumentException](TxLog.changes(spark, t, 1, 2))
    assert(e.getMessage.contains("no data-change"))
  }

  test("changes/changesCdf: a DATA commit that removes segments still fails loudly") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch(Seq(1L).toDF("id"), 0L, t))
    assert(TxLog.appendBatch(Seq(2L).toDF("id"), 1L, t))
    writeSeg(t, "merged", Seq(1L, 2L))
    TxLog.commit(t, Seq("merged"),                     // genuine rewrite
      removes = Seq("batch__000000", "batch__000001"))
    val e = intercept[IllegalArgumentException](
      TxLog.changes(spark, t, 0, 2))
    assert(e.getMessage.contains("re-snapshot"))
    val e2 = intercept[IllegalArgumentException](
      TxLog.changesCdf(spark, t, 0, 2))
    assert(e2.getMessage.contains("re-snapshot"))
    // the unaffected sub-span before the rewrite still reads
    assert(TxLog.changes(spark, t, 0, 1).as[Long].collect().toSeq === Seq(2L))
  }

  test("checkpointed liveV fold: add versions survive the checkpoint fast path") {
    import spark.implicits._
    val t = freshTable()
    // 20 commits with deletes sprinkled, so the MoR sequencing (which
    // version added each live segment) matters and crosses ckpt-v16
    (0 until 20).foreach { i =>
      // every 5th commit deletes the key appended just before it
      if (i % 5 == 4) TxLog.commitDeletes(Seq((i - 1).toLong).toDF("id"), t)
      else { assert(TxLog.appendBatch(Seq(i.toLong).toDF("id"), i.toLong, t)); () }
    }
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(t, "_txlog", "ckpt-v16.json")))
    val latest = TxLog.latestVersion(t).get
    // reference: replay every manifest (checkpoint-free) by hand
    val ref = scala.collection.mutable.LinkedHashMap[String, Int]()
    (0 to latest).foreach { v =>
      val body = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(t, "_txlog", s"v$v.json")),
        java.nio.charset.StandardCharsets.UTF_8)
      def arr(name: String): Seq[String] =
        s""""$name":\\[([^\\]]*)\\]""".r.findFirstMatchIn(body).get
          .group(1).split(",").map(_.trim.stripPrefix("\"")
            .stripSuffix("\"")).filter(_.nonEmpty).toSeq
      arr("adds").foreach(ref += _ -> v)
      arr("removes").foreach(ref -= _)
    }
    assert(TxLog.liveSegmentsWithVersion(t, latest) === ref.toSeq,
      "the liveV checkpoint fold diverged from a full manifest replay")
    // and the MoR read built on it stays correct (re-inserts survive)
    assert(TxLog.appendBatch(Seq(3L).toDF("id"), 20L, t))
    val got = TxLog.snapshotMoR(spark, t, TxLog.latestVersion(t).get,
      Seq("id")).as[Long].collect().sorted.toSeq
    val expect = ((0 until 20).filter(i => i % 5 != 4)
      .map(_.toLong).filterNot(Seq(3L, 8L, 13L, 18L).contains) :+ 3L).sorted
    assert(got === expect)
  }

  test("appendBatch: redelivery check rides the checkpoint's ever-added ledger") {
    import spark.implicits._
    val t = freshTable()
    (0 until 20).foreach(i =>
      assert(TxLog.appendBatch(Seq(i.toLong).toDF("id"), i.toLong, t)))
    // v16 wrote a checkpoint carrying the "ever" array; a redelivery
    // of a batch OLDER than the checkpoint must still be recognized
    // through the checkpoint fast path
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(t, "_txlog", "ckpt-v16.json")))
    assert(!TxLog.appendBatch(Seq(99L).toDF("id"), 3L, t),
      "pre-checkpoint redelivery must be skipped")
    assert(!TxLog.appendBatch(Seq(99L).toDF("id"), 19L, t))
    assert(TxLog.appendBatch(Seq(20L).toDF("id"), 20L, t))
    assert(TxLog.snapshot(spark, t, TxLog.latestVersion(t).get)
      .count() === 21)
  }

  test("changesCdf: a span crossing a schema-evolution boundary merges by name") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch(Seq(1L, 2L).toDF("id"), 0L, t))       // v0
    assert(TxLog.appendBatch(Seq((3L, "x")).toDF("id", "tag"), 1L, t)) // v1: +tag
    TxLog.commitDeletes(Seq(1L).toDF("id"), t)                     // v2
    val cdf = TxLog.changesCdf(spark, t, -1, 2)
    assert(cdf.columns.toSeq ===
      Seq("id", "tag", "_change_type", "_commit_version"))
    val rows = cdf.select("id", "tag", "_change_type").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
      .sortBy(x => (x._3, x._1))
    assert(rows.toSeq === Seq((1L, None, "delete"), (1L, None, "insert"),
      (2L, None, "insert"), (3L, Some("x"), "insert")))
    // a column-TYPE change inside the span is a rewrite, not evolution
    val bad = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row("4", "y")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("tag",
          org.apache.spark.sql.types.StringType))))
    bad.write.mode("overwrite").parquet(s"$t/typed")
    TxLog.commit(t, Seq("typed"))                                  // v3
    val e = intercept[IllegalArgumentException](
      TxLog.changesCdf(spark, t, -1, 3))
    assert(e.getMessage.contains("not schema evolution"))
  }

  test("vacuum minAgeMs spares recent directories (a racing install's staging)") {
    val t = freshTable()
    writeSeg(t, "a", Seq(1L))
    TxLog.commit(t, Seq("a"))
    // simulated in-flight install: segment staged, manifest not yet
    // committed — indistinguishable from a crashed install's orphan
    writeSeg(t, "staged", Seq(9L))
    assert(TxLog.vacuum(t, keepFrom = 0, minAgeMs = 3600000L) === Seq.empty,
      "a recent staging dir must survive a windowed vacuum")
    assert(new java.io.File(t, "staged").exists)
    // the strict single-maintainer default reclaims it immediately
    assert(TxLog.vacuum(t, keepFrom = 0) === Seq("staged"))
    assert(!new java.io.File(t, "staged").exists)
  }

  test("writeSegmentStats replaces a stale sidecar from a crashed attempt") {
    import spark.implicits._
    val t = freshTable()
    // crashed attempt: segment written + sidecar recorded, commit never
    // landed; the retry reuses the SAME name with different rows
    writeSeg(t, "batch__000000", Seq(1L, 2L))
    TxLog.writeSegmentStats(spark, t, "batch__000000", Seq("id"))
    assert(TxLog.segmentStats(t, "batch__000000").get("id") ===
      ("1", "2", "long"))
    writeSeg(t, "batch__000000", Seq(100L, 200L)) // the retry's rows
    TxLog.writeSegmentStats(spark, t, "batch__000000", Seq("id"))
    assert(TxLog.segmentStats(t, "batch__000000").get("id") ===
      ("100", "200", "long"),
      "a stale sidecar would prune segments that now hold matching rows")
    // a retry whose stats come out empty (all-NULL column) must DROP
    // the stale sidecar, not keep pruning by it
    Seq(300L).toDF("id")
      .select(when(col("id") < 0L, col("id")).as("id"))
      .write.mode("overwrite").parquet(s"$t/batch__000000")
    TxLog.writeSegmentStats(spark, t, "batch__000000", Seq("id"))
    assert(TxLog.segmentStats(t, "batch__000000").isEmpty,
      "stale sidecar must be deleted when the retry records no stats")
  }

  test("statsCmp orders strings by unsigned UTF-8 bytes, not UTF-16 code units") {
    // U+E000 (private use, BMP) vs U+1F600 (emoji, supplementary):
    // UTF-16 code units order the emoji FIRST (surrogate 0xD83D <
    // 0xE000); UTF8String — the order Spark computed the min/max in —
    // orders it LAST (F0 > EE). A reader comparing with String
    // .compareTo would wrongly prune segments.
    assert(TxLog.statsCmp("string", "😀", "").exists(_ > 0))
    assert(TxLog.statsCmp("string", "a", "").exists(_ < 0))
    assert(TxLog.statsCmp("string", "ab", "a").exists(_ > 0)) // prefix rule
    assert(TxLog.statsCmp("string", "a", "a").contains(0))
    assert(TxLog.statsCmp("long", "10", "9").exists(_ > 0)) // numeric, not lex
    assert(TxLog.statsCmp("long", "x", "9").isEmpty) // unparseable → keep
  }

  test("mergeSegmentStats: compaction carries a conservative range union forward") {
    import spark.implicits._
    val t = freshTable()
    // two stats-tracked installments with disjoint ranges + a delete
    assert(TxLog.appendBatch(Seq((1L, "a"), (5L, "b")).toDF("id", "s"),
      0L, t, statsCols = Seq("id", "s")))
    assert(TxLog.appendBatch(Seq((100L, "x"), (200L, "y")).toDF("id", "s"),
      1L, t, statsCols = Seq("id", "s")))
    TxLog.commitDeletes(Seq(5L).toDF("id"), t)
    TxLog.compactMoR(spark, t, Seq("id"))
    val seg = TxLog.liveSegments(t, TxLog.latestVersion(t).get)
    assert(seg.size === 1 && seg.head.startsWith("compact__"))
    val st = TxLog.segmentStats(t, seg.head)
    assert(st.isDefined, "OPTIMIZE must not end data skipping")
    assert(st.get("id") === ("1", "200", "long"),
      "merged range must be the union of the retired segments' ranges")
    assert(st.get("s") === ("a", "y", "string"))
    // one untracked retired segment → no merged sidecar (conservative)
    val t2 = freshTable()
    assert(TxLog.appendBatch(Seq(1L).toDF("id"), 0L, t2,
      statsCols = Seq("id")))
    assert(TxLog.appendBatch(Seq(9L).toDF("id"), 1L, t2)) // no stats
    TxLog.compactMoR(spark, t2, Seq("id"))
    val seg2 = TxLog.liveSegments(t2, TxLog.latestVersion(t2).get)
    assert(TxLog.segmentStats(t2, seg2.head).isEmpty,
      "an untracked input makes the merged range unknowable")
  }

  test("concurrent appendBatch writers both land; versions serialize") {
    import spark.implicits._
    val t = freshTable()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (0 until 4).map { i =>
        val batch = Seq(i.toLong).toDF("id").localCheckpoint(true)
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = TxLog.appendBatch(batch, i.toLong, t)
        })
      }
      assert(futs.forall(_.get()), "every writer must land its batch")
      assert(TxLog.versions(t) === Seq(0, 1, 2, 3),
        "optimistic retry must serialize to gap-free versions")
      assert(TxLog.snapshot(spark, t, 3).select("id").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    } finally pool.shutdown()
  }

  test("commit refuses to re-add a live segment (name reuse guard)") {
    val t = freshTable()
    writeSeg(t, "a", Seq(1L))
    writeSeg(t, "b", Seq(2L))
    TxLog.commit(t, Seq("a"))
    val e = intercept[IllegalArgumentException](TxLog.commit(t, Seq("a")))
    assert(e.getMessage.contains("already"))
    TxLog.commit(t, Seq("b"), removes = Seq("a"))
    // once retired, a RE-ADD is legal (restore's metadata path)
    assert(TxLog.commit(t, Seq("a")) === 2)
  }

  private def idsAt(t: String, v: Int): Seq[Long] =
    TxLog.snapshot(spark, t, v).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq

  test("restore: metadata mode re-points the head; history stays readable") {
    import spark.implicits._
    val t = freshTable()
    writeSeg(t, "a", Seq(1L, 2L))
    writeSeg(t, "b", Seq(3L))
    TxLog.commit(t, Seq("a"))                         // v0
    TxLog.commit(t, Seq("b"))                         // v1
    TxLog.commitDeletes(Seq(1L).toDF("id"), t)        // v2: tombstone live
    // target v1 has NO tombstones → metadata-only: remove the tombstone
    val Some((v3, mode)) = TxLog.restore(spark, t, toV = 1)
    assert(v3 === 3 && mode === "metadata")
    assert(idsAt(t, 3) === Seq(1L, 2L, 3L))
    assert(TxLog.liveSegments(t, 3) === Seq("a", "b"))
    // the undone version is still time-travelable
    assert(TxLog.snapshotMoR(spark, t, 2, Seq("id")).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L))
    // restore ACROSS a compaction re-adds retired segments
    TxLog.compactMoR(spark, t, Seq("id"))             // v4: fold a+b
    TxLog.commitDeletes(Seq(3L).toDF("id"), t)        // v5
    val Some((v6, mode2)) = TxLog.restore(spark, t, toV = 3)
    assert(v6 === 6 && mode2 === "metadata")
    assert(TxLog.liveSegments(t, 6).toSet === Set("a", "b"))
    assert(idsAt(t, 6) === Seq(1L, 2L, 3L))
    // restoring to the current state is a no-op
    assert(TxLog.restore(spark, t, toV = 6).isEmpty)
    assert(TxLog.restore(spark, t, toV = 3).isEmpty,
      "v3 and v6 hold the same live set — no-op")
  }

  test("restore: pure removal is metadata even when tombstones stay live") {
    import spark.implicits._
    val t = freshTable()
    writeSeg(t, "a", Seq(1L, 2L))
    TxLog.commit(t, Seq("a"))                         // v0
    TxLog.commitDeletes(Seq(1L).toDF("id"), t)        // v1
    writeSeg(t, "late", Seq(9L))
    TxLog.commit(t, Seq("late"))                      // v2
    // undo the append only: adds = ∅ (a, deletes__seg1 stay live with
    // their ORIGINAL versions) → sound metadata restore despite the
    // live tombstone in the target state
    val Some((v3, mode)) = TxLog.restore(spark, t, toV = 1)
    assert(v3 === 3 && mode === "metadata")
    assert(TxLog.snapshotMoR(spark, t, 3, Seq("id")).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(2L))
    assert(TxLog.liveSegments(t, 3).toSet === Set("a", "deletes__seg1"))
  }

  test("restore: a tombstoned target materializes the MoR snapshot") {
    import spark.implicits._
    val t = freshTable()
    writeSeg(t, "a", Seq(1L, 2L, 3L))
    TxLog.commit(t, Seq("a"))                         // v0
    TxLog.commitDeletes(Seq(2L).toDF("id"), t)        // v1
    TxLog.compactMoR(spark, t, Seq("id"))             // v2
    writeSeg(t, "late", Seq(9L))
    TxLog.commit(t, Seq("late"))                      // v3
    // v1's live set = {a, deletes__seg1}: metadata restore would
    // collapse the tombstone's version ordering → must materialize
    val e = intercept[IllegalArgumentException](
      TxLog.restore(spark, t, toV = 1))
    assert(e.getMessage.contains("key columns"))
    val Some((v4, mode)) = TxLog.restore(spark, t, toV = 1, Seq("id"))
    assert(v4 === 4 && mode === "rewrite")
    assert(idsAt(t, 4) === Seq(1L, 3L))
    val live = TxLog.liveSegments(t, 4)
    assert(live.size === 1 && live.head.startsWith("restore__"))
    // a restore is a DATA commit with removes: incremental reads fail
    val e2 = intercept[IllegalArgumentException](
      TxLog.changes(spark, t, fromV = 3, toV = 4))
    assert(e2.getMessage.contains("re-snapshot"))
  }

  test("restore: stats carried on materialize; vacuumed target fails loudly") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch(Seq(1L, 5L).toDF("id"), 0L, t,
      statsCols = Seq("id")))                         // v0
    assert(TxLog.appendBatch(Seq(9L).toDF("id"), 1L, t,
      statsCols = Seq("id")))                         // v1
    TxLog.commitDeletes(Seq(5L).toDF("id"), t)        // v2
    TxLog.compactMoR(spark, t, Seq("id"))             // v3: retires all
    // target v2 = {batch0, batch1, deletes2}, all retired by the fold:
    // the restore must RE-ADD into a tombstoned state → materialize
    val Some((_, mode)) = TxLog.restore(spark, t, toV = 2, Seq("id"))
    assert(mode === "rewrite")
    assert(idsAt(t, 4) === Seq(1L, 9L))
    val seg = TxLog.liveSegments(t, 4).head
    assert(TxLog.segmentStats(t, seg).exists(_.contains("id")),
      "restore's materialized segment must stay skippable")
    // vacuum away history → restoring past the horizon fails loudly
    TxLog.vacuum(t, keepFrom = 4)
    val e = intercept[IllegalArgumentException](
      TxLog.restore(spark, t, toV = 0, Seq("id")))
    assert(e.getMessage.contains("vacuum"))
  }

  test("versionAtTimestamp: greatest commit at or below; monotonic repair") {
    val t = freshTable()
    (0 to 2).foreach { i => writeSeg(t, s"s$i", Seq(i.toLong)) }
    (0 to 2).foreach(i => TxLog.commit(t, Seq(s"s$i")))
    val log = java.nio.file.Paths.get(t, "_txlog")
    def setMtime(v: Int, ms: Long): Unit =
      java.nio.file.Files.setLastModifiedTime(log.resolve(s"v$v.json"),
        java.nio.file.attribute.FileTime.fromMillis(ms))
    setMtime(0, 1000000L); setMtime(1, 2000000L); setMtime(2, 3000000L)
    assert(TxLog.versionAtTimestamp(t, 1000000L) === 0)
    assert(TxLog.versionAtTimestamp(t, 1999999L) === 0)
    assert(TxLog.versionAtTimestamp(t, 2000000L) === 1)
    assert(TxLog.versionAtTimestamp(t, 9999999L) === 2)
    val e = intercept[IllegalArgumentException](
      TxLog.versionAtTimestamp(t, 999999L))
    assert(e.getMessage.contains("predates"))
    // a shuffled-mtime log (files COPIED to a new location — the only
    // way manifest mtimes change, since the log never rewrites one)
    // still maps monotonically: v1's mtime regressed below v0's →
    // repaired by the running max
    val t2 = freshTable()
    val log2 = java.nio.file.Paths.get(t2, "_txlog")
    java.nio.file.Files.createDirectories(log2)
    (0 to 2).foreach { v =>
      java.nio.file.Files.copy(log.resolve(s"v$v.json"),
        log2.resolve(s"v$v.json"))
    }
    def setMtime2(v: Int, ms: Long): Unit =
      java.nio.file.Files.setLastModifiedTime(log2.resolve(s"v$v.json"),
        java.nio.file.attribute.FileTime.fromMillis(ms))
    setMtime2(0, 1000000L); setMtime2(1, 500000L); setMtime2(2, 3000000L)
    assert(TxLog.versionAtTimestamp(t2, 1000000L) === 1,
      "running max: v1's repaired time equals v0's")
    assert(TxLog.versionAtTimestamp(t2, 2999999L) === 1)
  }

  test("versionAtTimestamp memoizes the spine: one stat per NEW version") {
    val t = freshTable()
    (0 to 2).foreach { i => writeSeg(t, s"s$i", Seq(i.toLong)) }
    (0 to 2).foreach(i => TxLog.commit(t, Seq(s"s$i")))
    TxLog.versionAtTimestamp(t, System.currentTimeMillis() + 60000)
    // repeat call: the spine is memoized — zero new mtime stats
    val before = TxLog.mtimeStatCount.get()
    TxLog.versionAtTimestamp(t, System.currentTimeMillis() + 60000)
    assert(TxLog.mtimeStatCount.get() === before,
      "a repeat TIMESTAMP AS OF must not re-stat the whole history")
    // one new commit: exactly ONE new stat (O(delta), not O(history))
    writeSeg(t, "s3", Seq(3L))
    TxLog.commit(t, Seq("s3"))
    val before2 = TxLog.mtimeStatCount.get()
    TxLog.versionAtTimestamp(t, System.currentTimeMillis() + 60000)
    assert(TxLog.mtimeStatCount.get() === before2 + 1,
      "extending the spine stats only the versions committed since")
  }

  test("convertInPlace adopts loose parquet by hard link, zero copy") {
    import spark.implicits._
    val t = freshTable()
    Seq(1L, 2L, 3L, 4L).toDF("id").repartition(2)
      .write.mode("overwrite").parquet(t)
    val loose = new java.io.File(t).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(loose.length >= 2)
    val inode = java.nio.file.Files.getAttribute(
      loose.head.toPath, "unix:ino")
    val (seg, n) = TxLog.convertInPlace(spark, t, statsCols = Seq("id"))
    assert(seg === "convert__seg000000" && n === loose.length)
    assert(idsAt(t, 0) === Seq(1L, 2L, 3L, 4L))
    // zero copy: the adopted file is the SAME inode under the segment
    val adopted = new java.io.File(t, seg).listFiles()
      .filter(_.getName == loose.head.getName).head
    assert(java.nio.file.Files.getAttribute(adopted.toPath, "unix:ino")
      === inode, "convert must hard-link, never copy")
    // originals are owned now: no loose parquet remains
    assert(!new java.io.File(t).listFiles().exists(f =>
      f.isFile && f.getName.endsWith(".parquet")))
    assert(TxLog.segmentStats(t, seg).exists(_.contains("id")))
    // the table composes with the normal write path
    assert(TxLog.appendBatch(Seq(9L).toDF("id"), 0L, t))
    assert(idsAt(t, 1) === Seq(1L, 2L, 3L, 4L, 9L))
    val e = intercept[IllegalArgumentException](
      TxLog.convertInPlace(spark, t))
    assert(e.getMessage.contains("already"))
  }

  test("cloneTable: zero-copy, tombstone order preserved, divergence") {
    import spark.implicits._
    val src = freshTable()
    writeSeg(src, "write__seg000000", Seq(1L, 2L))
    TxLog.commit(src, Seq("write__seg000000"))        // v0
    writeSeg(src, "write__seg000001", Seq(2L, 3L))
    TxLog.commit(src, Seq("write__seg000001"))        // v1: re-insert 2
    TxLog.commitDeletes(Seq(2L).toDF("id"), src)      // v2... kills BOTH 2s
    TxLog.commitDeletes(Seq(1L).toDF("id"), src)      // v3
    writeSeg(src, "write__seg000004", Seq(1L))
    TxLog.commit(src, Seq("write__seg000004"))        // v4: revive 1
    def morIds(t: String) = TxLog.snapshotMoR(spark, t,
      TxLog.latestVersion(t).get, Seq("id")).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(morIds(src) === Seq(1L, 3L))
    val dst = freshTable() + "/clone"
    val commits = TxLog.cloneTable(src, dst)
    assert(commits === 5)
    // the clone reproduces the source's MoR state: tombstone versions
    // kept RELATIVE to their data (v3's delete must not kill v4's 1)
    assert(morIds(dst) === Seq(1L, 3L))
    // zero copy: same inode
    val srcFile = new java.io.File(src, "write__seg000000").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dstFile = new java.io.File(dst, "clone__seg0").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(java.nio.file.Files.getAttribute(srcFile.toPath, "unix:ino")
      === java.nio.file.Files.getAttribute(dstFile.toPath, "unix:ino"))
    // divergence: writes to the clone never touch the source
    assert(TxLog.appendBatch(Seq(7L).toDF("id"), 0L, dst))
    assert(morIds(dst) === Seq(1L, 3L, 7L))
    assert(morIds(src) === Seq(1L, 3L))
    // and vice versa
    TxLog.commitDeletes(Seq(3L).toDF("id"), src)
    assert(morIds(src) === Seq(1L))
    assert(morIds(dst) === Seq(1L, 3L, 7L))
    // a clone target with an existing log is refused
    val e = intercept[IllegalArgumentException](TxLog.cloneTable(src, dst))
    assert(e.getMessage.contains("already"))
  }

  test("bloom sidecars: point probes prune; merge unions; undersized stays sound") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      0L, t, bloomCols = Seq("id", "s")))
    assert(TxLog.appendBatch(Seq((100L, "x")).toDF("id", "s"),
      1L, t, bloomCols = Seq("id", "s")))
    val bf0 = TxLog.segmentBlooms(t, "batch__000000").get
    assert(bf0("id").mightContainLong(1L) && bf0("id").mightContainLong(2L))
    assert(!bf0("id").mightContainLong(100L),
      "a disjoint key must be definitely-absent")
    assert(bf0("s").mightContainString("a") &&
      !bf0("s").mightContainString("x"))
    // carry through compaction: union of the retired filters
    TxLog.compactMoR(spark, t, Seq("id"))
    val seg = TxLog.liveSegments(t, TxLog.latestVersion(t).get).head
    val merged = TxLog.segmentBlooms(t, seg).get
    assert(merged("id").mightContainLong(1L) &&
      merged("id").mightContainLong(100L))
    assert(!merged("id").mightContainLong(555L))
    // an undersized filter (bit cap) still never false-negatives
    val t2 = freshTable()
    Seq.range(0L, 1000L).toDF("id").write
      .format("graft.sources.txlog")
      .option("bloomCols", "id")
      .mode(org.apache.spark.sql.SaveMode.Append).save(t2)
    val tiny = TxLog.segmentBlooms(t2, "write__seg000000").get("id")
    assert((0L until 1000L).forall(tiny.mightContainLong),
      "present keys must never read as absent")
  }

  test("null tallies: recorded, merged as sums, all-NULL columns tracked") {
    import spark.implicits._
    val t = freshTable()
    assert(TxLog.appendBatch(
      Seq((1L, Some("a")), (2L, None), (3L, None)).toDF("id", "s"),
      0L, t, statsCols = Seq("id", "s")))
    val (rows, nulls) = TxLog.segmentNullStats(t, "batch__000000").get
    assert(rows === 3L && nulls("id") === 0L && nulls("s") === 2L)
    // an ALL-null column records its tally with no range
    assert(TxLog.appendBatch(
      Seq((4L, None: Option[String])).toDF("id", "s"), 1L, t,
      statsCols = Seq("id", "s")))
    val (r1, n1) = TxLog.segmentNullStats(t, "batch__000001").get
    assert(r1 === 1L && n1("s") === 1L)
    assert(!TxLog.segmentStats(t, "batch__000001").get.contains("s"),
      "an all-NULL column has no usable range")
    // merge: sums carried (upper bounds — sound for both prune rules)
    TxLog.compactMoR(spark, t, Seq("id"))
    val seg = TxLog.liveSegments(t, TxLog.latestVersion(t).get).head
    val (mr, mn) = TxLog.segmentNullStats(t, seg).get
    assert(mr === 4L && mn("id") === 0L)
  }

  test("cloneTable carries stats sidecars under the new names") {
    import spark.implicits._
    val src = freshTable()
    assert(TxLog.appendBatch(Seq(10L, 20L).toDF("id"), 0L, src,
      statsCols = Seq("id")))
    val dst = freshTable() + "/clone"
    TxLog.cloneTable(src, dst)
    assert(TxLog.segmentStats(dst, "clone__seg0")
      .exists(_.get("id").contains(("10", "20", "long"))))
  }
}
