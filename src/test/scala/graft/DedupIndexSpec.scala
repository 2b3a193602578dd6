package graft

import graft.operators.{Dedup, DedupIndex}
import org.apache.spark.sql.functions._

/** Cross-run dedup-index persistence (graft.operators.DedupIndex):
  * the d21 contract — installment 2 probes the STORED index and never
  * rescans the old corpus — plus incremental ≡ batch equality and the
  * atomic install swap. */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpStore(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_dedupidx_$tag").toString
    // DedupIndex.write overwrites subdirs; the root must exist only
    // for installAppended's rename discipline
    d + "/store"
  }

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"),
    (3L, "completely different content about spark engines and shuffles here"),
    (4L, "another unrelated document discussing benchmark oracles and gates"),
    (5L, "the quick brown fox jumps over the lazy dog again and again now")
  ).toDF("doc_id", "text")

  test("incremental candidates over a persisted store equal the batch recompute") {
    val store = tmpStore("incr")
    val oldDocs = corpus.filter(col("doc_id") % 2 === 0)
    val newDocs = corpus.filter(col("doc_id") % 2 =!= 0)
    DedupIndex.write(oldDocs, "doc_id", "text", 3, 16, 4, 4, store)
    val incr = DedupIndex
      .appendCandidates(spark, store, newDocs, "doc_id", "text", 3, 16, 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.minhashCandidates(
        Dedup.minhashSignatures(corpus, "doc_id", "text", 3, 16), 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incr === batch)
    assert(incr.nonEmpty, "fixture must produce near-dup candidates")
  }

  test("registry includes docs with no shingles; banded index excludes them") {
    val store = tmpStore("reg")
    val withEmpty = corpus.unionByName(Seq((99L, "too short")).toDF("doc_id", "text"))
    DedupIndex.write(withEmpty, "doc_id", "text", 3, 16, 4, 4, store)
    val reg = DedupIndex.readDocs(spark, store)
      .collect().map(_.getLong(0)).toSet
    assert(reg === (corpus.collect().map(_.getLong(0)).toSet + 99L))
    // "too short" has two tokens -> zero trigram shingles -> null sig
    assert(DedupIndex.readBanded(spark, store)
      .filter(col("doc_id") === 99L).count() === 0L)
  }

  /** (relative path → (size, mtime)) of every data file under `root`,
    * excluding the txlog — the byte-identity witness for "install
    * never rewrites existing segments". */
  private def fileState(root: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
        .sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    val rootF = new java.io.File(root)
    walk(rootF).filterNot(_.getPath.contains("_txlog"))
      .map(f => f.getPath.stripPrefix(rootF.getPath) ->
        (f.length, f.lastModified))
      .toMap
  }

  test("installAppended is O(delta): new segments only, one commit, answers like batch") {
    val store = tmpStore("inst")
    val oldDocs = corpus.filter(col("doc_id") % 2 === 0)
    val newDocs = corpus.filter(col("doc_id") % 2 =!= 0)
    DedupIndex.write(oldDocs, "doc_id", "text", 3, 16, 4, 4, store)
    val before = fileState(store)
    // an orphan segment dir (a crashed install: data written, manifest
    // never committed) must stay invisible to readers
    oldDocs.select(col("doc_id"))
      .write.mode("overwrite").parquet(store + "/docs__seg_orphan")
    assert(DedupIndex.readDocs(spark, store).count() === oldDocs.count())
    DedupIndex.installAppended(spark, store, newDocs,
      "doc_id", "text", 3, 16, 4, 4)
    // existing segments byte-identical; the delta landed as fresh
    // segments behind exactly one new txlog version
    val after = fileState(store)
    before.foreach { case (path, st) =>
      assert(after.get(path).contains(st), s"install rewrote $path")
    }
    assert((after.keySet -- before.keySet)
      .forall(p => p.contains("__seg1") || p.contains("__seg_orphan")),
      "delta must land in new segments only")
    assert(graft.sources.TxLog.versions(store) === Seq(0, 1))
    assert(DedupIndex.readDocs(spark, store).count() === corpus.count())
    val stored = DedupIndex.readPairs(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.minhashCandidates(
        Dedup.minhashSignatures(corpus, "doc_id", "text", 3, 16), 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored === batch)
  }

  test("compactFamily generalizes to the dedup store's unpartitioned families") {
    // One install discipline, one OPTIMIZE: the same compactFamily
    // that folds the ANN postings (partitioned, _meta-pinned) must
    // fold this store's plain families — no sidecar, no partitioning.
    val store = tmpStore("cmp")
    val oldDocs = corpus.filter(col("doc_id") % 2 === 0)
    val newDocs = corpus.filter(col("doc_id") % 2 =!= 0)
    DedupIndex.write(oldDocs, "doc_id", "text", 3, 16, 4, 4, store)
    DedupIndex.installAppended(spark, store, newDocs,
      "doc_id", "text", 3, 16, 4, 4)
    import graft.sources.TxLog
    assert(TxLog.familySegments(store, "banded").size === 2)
    val beforeRows = DedupIndex.readBanded(spark, store)
      .collect().map(_.toSeq).toSet
    graft.operators.AnnIndex.compactFamily(spark, store, "banded", Seq.empty)
    assert(TxLog.familySegments(store, "banded").size === 1)
    // sibling families untouched; content identical through the merge
    assert(TxLog.familySegments(store, "pairs").size === 2)
    assert(TxLog.familySegments(store, "docs").size === 2)
    assert(DedupIndex.readBanded(spark, store)
      .collect().map(_.toSeq).toSet === beforeRows)
  }

  test("deleteDocs: tombstones kill banded keys, registry rows, and pairs touching the doc") {
    val store = tmpStore("del")
    DedupIndex.write(corpus.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", 3, 16, 4, 4, store)
    DedupIndex.installAppended(spark, store,
      corpus.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", 3, 16, 4, 4)
    val before = DedupIndex.readPairs(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.exists(p => p._1 == 1L || p._2 == 1L),
      "fixture must give doc 1 candidate partners")
    DedupIndex.deleteDocs(spark, store, Seq(1L).toDF("doc_id"))
    // pairs touching doc 1 die with it; others survive untouched
    val after = DedupIndex.readPairs(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before.filterNot(p => p._1 == 1L || p._2 == 1L))
    assert(DedupIndex.readBanded(spark, store)
      .filter(col("doc_id") === 1L).count() === 0L)
    assert(DedupIndex.readDocs(spark, store)
      .filter(col("doc_id") === 1L).count() === 0L)
    // re-ingest revives: the new install's segments postdate the
    // tombstone, and its probe regenerates doc 1's pairs
    DedupIndex.installAppended(spark, store,
      corpus.filter(col("doc_id") === 1L), "doc_id", "text", 3, 16, 4, 4)
    val revived = DedupIndex.readPairs(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(revived === before, "re-ingest must regenerate the doc's pairs")
    // raw compactFamily is refused while tombstoned (structural guard)
    DedupIndex.deleteDocs(spark, store, Seq(2L).toDF("doc_id"))
    val guard = intercept[IllegalArgumentException] {
      graft.operators.AnnIndex.compactFamily(spark, store, "pairs", Seq.empty)
    }
    assert(guard.getMessage.contains("resurrect"))
    // the MoR compactor folds all three families + retires tombstones
    // in ONE commit; reads are bit-identical after
    val expect = DedupIndex.readPairs(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cv = DedupIndex.compactStoreMoR(spark, store)
    val live = graft.sources.TxLog.liveSegments(store, cv)
    assert(live.count(_.startsWith("banded__")) === 1)
    assert(live.count(_.startsWith("pairs__")) === 1)
    assert(live.count(_.startsWith("docs__")) === 1)
    assert(!live.exists(_.startsWith("deletes__")))
    assert(DedupIndex.readPairs(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === expect)
  }

  test("maintain dispatches a tombstoned dedup store to compactStoreMoR") {
    val store = tmpStore("maintain")
    DedupIndex.write(corpus.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", 3, 16, 4, 4, store)
    DedupIndex.installAppended(spark, store,
      corpus.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", 3, 16, 4, 4)
    DedupIndex.deleteDocs(spark, store, Seq(0L).toDF("doc_id"))
    val expect = DedupIndex.readPairs(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val done = graft.operators.AnnIndex.maintain(spark, store, threshold = 1)
    assert(done.size === 1 && Set("banded", "docs", "pairs")(done.head._1),
      s"tombstoned dedup store must fold once through compactStoreMoR, got $done")
    assert(graft.sources.TxLog.familySegments(store,
      graft.sources.TxLog.DeletesFamily).isEmpty)
    assert(DedupIndex.readPairs(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === expect)
    assert(graft.operators.AnnIndex.maintain(spark, store,
      threshold = 1).isEmpty, "idempotent after the fold")
  }

  test("d21 entry plan reads the store and landing file, never documents.parquet") {
    val df = Catalog.byName("d21_persisted_index")
      .build(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"),
      s"old corpus must not be rescanned:\n${p.take(3000)}")
    assert(p.contains("d21_store_"), "plan must read the persisted store")
    assert(p.contains("d21_land_"), "plan must read the landing file")
    // and the result is live (the oracle equality is the driver gate)
    assert(df.count() > 0)
  }
}
