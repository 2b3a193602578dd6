package graft

import graft.operators.{AnnIndex, Similarity}
import graft.sources.TxLog
import org.apache.spark.sql.functions._

/** Cross-run ANN index persistence (graft.operators.AnnIndex): the
  * s15/s16/s17/s18 contract — probe/encode against the STORED index,
  * never rescanning the embeddings that built it — plus
  * probe-of-stored ≡ in-process equality, the dynamic-partition-
  * pruning shape of the postings scan, and the O(delta) grow
  * guarantees (untouched segments byte-identical and unread; one
  * txlog commit per install; sibling families untouched). */
class AnnIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tmpStore(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_annidx_$tag")
      .toString + "/store"

  private def prepped = {
    val embs = Tables(spark, dir, "embeddings")
    Similarity.prep(embs, "vec_id", "embedding")
      .join(embs.select(col("vec_id").as("id"), col("label")), "id")
  }

  /** (relative path → (size, mtime)) of every data file under `root`,
    * excluding the txlog and meta — the byte-identity witness for
    * "grow never rewrites existing segments". */
  private def fileState(root: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
        .sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    val rootF = new java.io.File(root)
    walk(rootF)
      .filterNot(f => f.getPath.contains("_txlog") ||
        f.getPath.contains("_meta"))
      .map(f => f.getPath.stripPrefix(rootF.getPath) ->
        (f.length, f.lastModified))
      .toMap
  }

  test("probe of the stored IVF index equals the in-process build") {
    val store = tmpStore("ivf")
    val all = prepped
    val queries = all.filter(col("id") < 10).drop("label")
    val corpus = all.filter(col("id") >= 10)
    AnnIndex.writeIvf(corpus, "label", store)
    val stored = AnnIndex.probeIvf(spark, store, queries, k = 5, nProbe = 2)
      .orderBy("q_id", "rank").collect()
    val direct = Similarity.ivfTopK(queries, corpus, "label", k = 5, nProbe = 2)
      .orderBy("q_id", "rank").collect()
    assert(stored.length == direct.length && stored.length > 0)
    stored.zip(direct).foreach { case (a, b) => assert(a == b) }
  }

  test("postings are cluster-partitioned and the probe prunes them dynamically") {
    val store = tmpStore("dpp")
    val all = prepped
    AnnIndex.writeIvf(all.filter(col("id") >= 10), "label", store)
    // partition layout on disk: one directory per cluster, inside the
    // txlog-committed segment
    val dirs = new java.io.File(store + "/postings__seg0").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cluster="))
    assert(dirs.length == 10, s"expected 10 cluster dirs, got ${dirs.toSeq}")
    val queries = all.filter(col("id") < 10).drop("label")
    val p = AnnIndex.probeIvf(spark, store, queries, k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    // the routed broadcast must drive dynamic partition pruning on the
    // postings scan — only probed clusters' files open at scale
    assert(p.contains("dynamicpruning"),
      s"postings scan must be dynamically pruned:\n${p.take(3000)}")
  }

  test("past the broadcast gate the probe statically prunes and matches") {
    val store = tmpStore("gate")
    val all = prepped
    AnnIndex.writeIvf(all.filter(col("id") >= 10), "label", store)
    val queries = all.filter(col("id") < 10).drop("label")
    // an offline caller declares its batch big via the size hint —
    // the gate never fires a count job of its own
    val wide = AnnIndex.probeIvf(spark, store, queries, k = 5, nProbe = 2,
      queryRows = Some(queries.count()), maxBroadcastRows = 0)
    val p = wide.queryExecution.executedPlan.toString
    // fallback: the probed clusters become a STATIC IN-list restricting
    // the postings scan — pruning no longer depends on the routed frame
    // fitting a broadcast (at test SF AQE may still pick a broadcast
    // JOIN; the gate's point is the pruning mechanism, not the join
    // strategy)
    assert(p.contains("cluster") && p.contains("IN ("),
      s"fallback must statically prune probed clusters:\n${p.take(3000)}")
    val a = wide.orderBy("q_id", "rank").collect()
    val b = AnnIndex.probeIvf(spark, store, queries, k = 5, nProbe = 2)
      .orderBy("q_id", "rank").collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("encode against the stored codebook equals the in-process encode") {
    val store = tmpStore("pq")
    val all = prepped
    val first = all.filter(col("id") % 2 === 0)
    AnnIndex.writePq(first.select("id", "v"), first, m = 2, dim = 64, store)
    val rest = all.filter(col("id") % 2 =!= 0).select("id", "v")
    val stored = AnnIndex.encodeWith(spark, store, rest, m = 2, dim = 64)
      .orderBy("id").collect()
    val direct = Similarity.pqEncodeWith(rest,
        Similarity.centroids(first, "label")
          .select(col("cluster"), col("cv")),
        m = 2, dim = 64)
      .orderBy("id").collect()
    assert(stored.length == direct.length && stored.length > 0)
    stored.zip(direct).foreach { case (a, b) => assert(a == b) }
  }

  test("appendVectors is O(delta): new segment only, old files untouched, one commit") {
    val store = tmpStore("app")
    val all = prepped
    val first = all.filter(col("id") >= 10 && col("id") % 2 === 0)
    val second = all.filter(col("id") >= 10 && col("id") % 2 =!= 0)
      .drop("label")
    AnnIndex.writeIvf(first, "label", store)
    val expect = AnnIndex.readPostings(spark, store)
      .unionByName(AnnIndex.assignToStored(spark, store, second))
      .orderBy("n_id")
      .collect().map(r => (r.getLong(r.fieldIndex("n_id")),
        r.getInt(r.fieldIndex("cluster"))))
    // the grow's own plan must never scan existing postings — routing
    // reads only the dimension-sized centroids
    val growPlan = AnnIndex.assignToStored(spark, store, second)
      .queryExecution.executedPlan.toString
    assert(!growPlan.contains("postings__"),
      s"grow must not rescan existing postings:\n${growPlan.take(3000)}")
    val before = fileState(store)
    AnnIndex.appendVectors(spark, store, second)
    val after = fileState(store)
    // untouched segments byte-identical (same files, sizes, mtimes);
    // the delta landed as ONE new segment behind ONE new commit
    before.foreach { case (path, st) =>
      assert(after.get(path).contains(st), s"grow rewrote $path")
    }
    val newFiles = after.keySet -- before.keySet
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("postings__seg1")),
      s"delta must land in postings__seg1 only, got $newFiles")
    assert(TxLog.versions(store) == Seq(0, 1))
    val grown = AnnIndex.readPostings(spark, store).orderBy("n_id")
      .collect().map(r => (r.getLong(r.fieldIndex("n_id")),
        r.getInt(r.fieldIndex("cluster"))))
    assert(grown.toSeq === expect.toSeq)
    // centroids untouched: the code space must not move on ingest
    val cents = AnnIndex.readCentroids(spark, store).count()
    assert(cents == 10)
  }

  test("an uncommitted segment is invisible; IVF grow leaves PQ families intact") {
    val store = tmpStore("fam")
    val all = prepped
    val first = all.filter(col("id") >= 10 && col("id") % 2 === 0)
    AnnIndex.writeIvf(first, "label", store)
    // PQ family shares the SAME store: grow must not clobber it
    AnnIndex.writePq(first.select("id", "v"), first, m = 2, dim = 64, store)
    val pqBefore = AnnIndex.readCodes(spark, store).orderBy("id").collect()
    val nBefore = AnnIndex.readPostings(spark, store).count()
    // a crashed grow = segment dir written, manifest never committed:
    // readers still see the previous version
    val second = all.filter(col("id") >= 10 && col("id") % 2 =!= 0)
      .drop("label")
    AnnIndex.assignToStored(spark, store, second)
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$store/postings__seg_orphan")
    assert(AnnIndex.readPostings(spark, store).count() == nBefore,
      "uncommitted segment must be invisible to readers")
    // the real grow: postings grow, codebook/codes byte-identical
    AnnIndex.appendVectors(spark, store, second)
    assert(AnnIndex.readPostings(spark, store).count() > nBefore)
    val pqAfter = AnnIndex.readCodes(spark, store).orderBy("id").collect()
    assert(pqBefore.toSeq === pqAfter.toSeq)
  }

  test("probe of the grown LSH store equals the in-process multi-probe") {
    val store = tmpStore("lsh")
    val all = prepped.drop("label")
    val queries = all.filter(col("id") < 10)
    val first = all.filter(col("id") >= 10 && col("id") % 2 === 0)
    val second = all.filter(col("id") >= 10 && col("id") % 2 =!= 0)
    AnnIndex.writeLsh(first, nPlanes = 8, dim = 64, store)
    val before = fileState(store)
    AnnIndex.appendLshVectors(spark, store, second)
    val after = fileState(store)
    before.foreach { case (path, st) =>
      assert(after.get(path).contains(st), s"LSH grow rewrote $path")
    }
    assert((after.keySet -- before.keySet).forall(_.contains("buckets__seg1")))
    val stored = AnnIndex.probeLsh(spark, store, queries, k = 5)
      .orderBy("q_id", "rank").collect()
    val direct = Similarity.lshMultiProbeTopK(queries,
        all.filter(col("id") >= 10), k = 5, nPlanes = 8, dim = 64)
      .orderBy("q_id", "rank").collect()
    assert(stored.length == direct.length && stored.length > 0)
    stored.zip(direct).foreach { case (a, b) => assert(a == b) }
    // the probe plan prunes the bucket-partitioned scan
    val p = AnnIndex.probeLsh(spark, store, queries, k = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"bucket scan must be dynamically pruned:\n${p.take(3000)}")
  }

  test("compactFamily folds grow segments into one; history and siblings survive") {
    val store = tmpStore("cmp")
    val all = prepped
    AnnIndex.writeIvf(all.filter(col("id") >= 10 && col("id") % 3 === 0),
      "label", store)
    val second = all.filter(col("id") >= 10 && col("id") % 3 === 1).drop("label")
    val third = all.filter(col("id") >= 10 && col("id") % 3 === 2).drop("label")
    AnnIndex.appendVectors(spark, store, second)
    AnnIndex.appendVectors(spark, store, third)
    assert(TxLog.familySegments(store, "postings").size == 3)
    val queries = all.filter(col("id") < 10).drop("label")
    val beforeProbe = AnnIndex.probeIvf(spark, store, queries, k = 5, nProbe = 2)
      .orderBy("q_id", "rank").collect()
    val preVersion = TxLog.latestVersion(store).get
    val preCount = AnnIndex.readPostings(spark, store).count()
    val before = fileState(store)
    AnnIndex.compactFamily(spark, store, "postings", Seq("cluster"))
    // ONE live postings segment now; the old segment files are NOT
    // deleted (historical versions stay snapshot-readable) and NOT
    // rewritten (OPTIMIZE only adds the merged segment)
    val live = TxLog.familySegments(store, "postings")
    assert(live.size == 1, s"expected one live segment, got $live")
    before.foreach { case (path, st) =>
      assert(fileState(store).get(path).contains(st),
        s"compaction rewrote pre-existing file $path")
    }
    assert(TxLog.familySegments(store, "centroids").size == 1,
      "sibling family must be untouched")
    // time travel: the pre-compaction version still reads in full
    val snapCount = TxLog.liveSegments(store, preVersion)
      .filter(_.startsWith("postings__"))
      .map(s => spark.read.parquet(s"$store/$s").count()).sum
    assert(snapCount == preCount)
    // the probe of the compacted store is bit-identical and scans
    // ONLY the merged segment
    val compacted = AnnIndex.probeIvf(spark, store, queries, k = 5, nProbe = 2)
    val p = compacted.queryExecution.executedPlan.toString
    Seq("postings__seg0", "postings__seg1", "postings__seg2").foreach(old =>
      assert(!p.contains(old), s"probe must not scan compacted-away $old"))
    assert(p.contains(live.head), "probe must scan the merged segment")
    val afterProbe = compacted.orderBy("q_id", "rank").collect()
    assert(afterProbe.length == beforeProbe.length && afterProbe.length > 0)
    afterProbe.zip(beforeProbe).foreach { case (a, b) => assert(a == b) }
  }

  test("probeIvfPq: ADC shortlist over pqposts, exact re-rank, probed clusters only") {
    val store = tmpStore("adc")
    val all = prepped
    val corpus = all.filter(col("id") >= 10)
    AnnIndex.writeIvf(corpus, "label", store)
    AnnIndex.writePq(corpus.select("id", "v"), corpus, m = 2, dim = 64, store)
    AnnIndex.writePqPostings(spark, store, m = 2, dim = 64)
    val queries = all.filter(col("id") < 10).drop("label")
    val res = AnnIndex.probeIvfPq(spark, store, queries,
      k = 5, nProbe = 2, shortlist = 10, m = 2, dim = 64)
    val rows = res.orderBy("q_id", "rank").collect()
    val nq = queries.count()
    assert(rows.length == nq * 5, s"expected ${nq * 5} rows, got ${rows.length}")
    // the reported cosines are EXACT: recompute each returned pair
    // against the raw vectors
    val pairs = res.select("q_id", "n_id", "cosine")
    val recomputed = pairs
      .join(queries.select(col("id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn")), "q_id")
      .join(corpus.select(col("id").as("n_id"), col("v").as("cv"),
        col("nrm").as("cn")), "n_id")
      .select(col("q_id"), col("n_id"), col("cosine"),
        (graft.Dsl.dotFold(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("exact"))
      .collect()
    recomputed.foreach(r => assert(
      r.getDouble(r.fieldIndex("cosine")) == r.getDouble(r.fieldIndex("exact")),
      s"re-rank cosine must be the exact cosine: $r"))
    // every hit comes from a probed cluster (the IVF routing contract)
    val probedOk = res.select("q_id", "n_id")
      .join(AnnIndex.readPostings(spark, store).select("n_id", "cluster"), "n_id")
      .join(AnnIndex.probeIvf(spark, store, queries, k = 1000, nProbe = 2)
        .select(col("q_id"), col("n_id").as("__any")).groupBy("q_id")
        .agg(collect_set("__any").as("__probed")), "q_id")
      .filter(!array_contains(col("__probed"), col("n_id")))
      .count()
    assert(probedOk == 0, "an ADC hit escaped the probed clusters")
    // the ADC stage rides the code lists: the plan scans pqposts
    val p = res.queryExecution.executedPlan.toString
    assert(p.contains("pqposts__"), "ADC stage must scan the PQ inverted lists")
  }

  test("deleteVectors: probe excludes tombstoned ids, re-append revives, compact applies") {
    val store = tmpStore("del")
    val all = prepped
    val queries = all.filter(col("id") < 10).drop("label")
    val corpus = all.filter(col("id") >= 10)
    AnnIndex.writeIvf(corpus, "label", store)
    val doomed = corpus.select("id").filter(pmod(col("id"), lit(7L)) === 0)
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    assert(doomedIds.size >= 2, "fixture must tombstone several ids")
    AnnIndex.deleteVectors(spark, store, doomed)
    val hits = AnnIndex.probeIvf(spark, store, queries, k = 5, nProbe = 2)
      .select("n_id").collect().map(_.getLong(0))
    assert(hits.nonEmpty && !hits.exists(doomedIds),
      "a tombstoned id surfaced in the probe")
    // re-append ONE doomed id: a posting newer than the tombstone revives
    val back = doomedIds.min
    AnnIndex.appendVectors(spark, store,
      corpus.filter(col("id") === back).select("id", "v", "nrm"))
    val post = AnnIndex.readPostings(spark, store)
      .select("n_id").collect().map(_.getLong(0)).toSet
    assert(post.contains(back), "re-appended id must survive its older tombstone")
    assert((doomedIds - back).forall(!post.contains(_)),
      "other tombstoned ids must stay dead")
    // physical apply: one postings segment, tombstones retired,
    // rows unchanged, sibling centroids untouched
    val preRows = AnnIndex.readPostings(spark, store).count()
    val cv = AnnIndex.compactPostingsMoR(spark, store)
    val live = TxLog.liveSegments(store, cv)
    assert(live.count(_.startsWith("postings__")) === 1)
    assert(!live.exists(_.startsWith("deletes__")), "compaction must retire tombstones")
    assert(live.count(_.startsWith("centroids__")) === 1)
    assert(AnnIndex.readPostings(spark, store).count() === preRows)
  }

  test("s15/s16/s17/s19/s20 entry plans read the store and landing file, never embeddings.parquet") {
    for ((name, store, land) <- Seq(
      ("s15_persisted_ivf", "s15_store_", "s15_land_"),
      ("s16_incremental_pq", "s16_store_", "s16_land_"),
      ("s17_ivf_append", "s17_store_", "s17_q_"),
      ("s19_ivf_compact", "s19_store_", "s19_q_"),
      ("s20_ivfpq_adc", "s20_store_", "s20_q_"),
      ("s26_ivfpq_append", "s26_store_", "s26_q_"),
      ("s27_ivf_maintain", "s27_store_", "s27_q_"))) {
      val df = Catalog.byName(name).build(spark, dir)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("embeddings.parquet"),
        s"$name: the indexed corpus must not be rescanned:\n${p.take(3000)}")
      assert(p.contains(store), s"$name plan must read the persisted store")
      assert(p.contains(land), s"$name plan must read the landing file")
      assert(df.count() > 0)
    }
  }

  test("appendPqVectors grows postings+pqposts in one commit; probe equals full rebuild") {
    val all = prepped
    val even = all.filter(col("id") >= 10 && col("id") % 2 === 0)
    val odd = all.filter(col("id") >= 10 && col("id") % 2 =!= 0)
      .select("id", "v", "nrm")
    val queries = all.filter(col("id") < 10).drop("label")
    // grown store: one O(delta) append covering BOTH families
    val grown = tmpStore("pqgrow")
    AnnIndex.writeIvf(even, "label", grown)
    AnnIndex.writePq(even.select("id", "v"), even, m = 2, dim = 64, grown)
    AnnIndex.writePqPostings(spark, grown, m = 2, dim = 64)
    val v0 = TxLog.latestVersion(grown).get
    val before = fileState(grown)
    AnnIndex.appendPqVectors(spark, grown, odd, m = 2, dim = 64)
    assert(TxLog.latestVersion(grown).get === v0 + 1,
      "the grow must be ONE atomic commit over both families")
    val after = fileState(grown)
    before.foreach { case (path, sig) =>
      assert(after.get(path).contains(sig), s"grow rewrote $path")
    }
    Seq("postings", "pqposts").foreach { fam =>
      assert(TxLog.familySegments(grown, fam).size === 2,
        s"$fam must hold exactly build+grow segments")
    }
    // reference store: same history, but pqposts rebuilt over the
    // grown postings — the O(corpus) path the append replaces
    val rebuilt = tmpStore("pqrebuild")
    AnnIndex.writeIvf(even, "label", rebuilt)
    AnnIndex.writePq(even.select("id", "v"), even, m = 2, dim = 64, rebuilt)
    AnnIndex.appendVectors(spark, rebuilt, odd)
    AnnIndex.writePqPostings(spark, rebuilt, m = 2, dim = 64)
    val a = AnnIndex.probeIvfPq(spark, grown, queries,
      k = 5, nProbe = 2, shortlist = 10, m = 2, dim = 64)
      .orderBy("q_id", "rank").collect()
    val b = AnnIndex.probeIvfPq(spark, rebuilt, queries,
      k = 5, nProbe = 2, shortlist = 10, m = 2, dim = 64)
      .orderBy("q_id", "rank").collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("maintain: over-threshold families compact; tombstoned postings dispatch to the MoR fold") {
    val store = tmpStore("maintain")
    val all = prepped
    val corpus = all.filter(col("id") >= 10)
    val queries = all.filter(col("id") < 10).drop("label")
    AnnIndex.writeIvf(corpus.filter(col("id") % 4 === 0), "label", store)
    (1L to 3L).foreach(r => AnnIndex.appendVectors(spark, store,
      corpus.filter(col("id") % 4 === r).select("id", "v", "nrm")))
    val before = AnnIndex.probeIvf(spark, store, queries, k = 5, nProbe = 2)
      .orderBy("q_id", "rank").collect()
    // postings has 4 live segments (> threshold 3), centroids 1
    val done = AnnIndex.maintain(spark, store, threshold = 3)
    assert(done.map(_._1) === Seq("postings"),
      s"only the over-threshold family compacts, got $done")
    val live = TxLog.liveSegments(store, TxLog.latestVersion(store).get)
    assert(live.count(_.startsWith("postings__")) === 1)
    assert(live.count(_.startsWith("centroids__")) === 1)
    // the probe plan returns to a single-segment scan, rows unchanged
    val probed = AnnIndex.probeIvf(spark, store, queries, k = 5, nProbe = 2)
    val p = probed.queryExecution.executedPlan.toString
    Seq("postings__seg0", "postings__seg1", "postings__seg2",
      "postings__seg3").foreach(old =>
      assert(!p.contains(old), s"probe still scans compacted-away $old"))
    val after = probed.orderBy("q_id", "rank").collect()
    assert(after.length == before.length && after.length > 0)
    after.zip(before).foreach { case (a, b) => assert(a == b) }
    // idempotent: nothing is over threshold anymore
    assert(AnnIndex.maintain(spark, store, threshold = 3).isEmpty)
    // tombstoned postings DISPATCH to the MoR-aware compactor — the
    // cadence must not defer forever under continuous delete traffic,
    // and it must never raw-compact (the resurrect hazard)
    (4L to 8L).foreach(r => AnnIndex.appendVectors(spark, store,
      corpus.filter(col("id") % 11 === r).select("id", "v", "nrm")))
    AnnIndex.deleteVectors(spark, store,
      corpus.select("id").filter(pmod(col("id"), lit(7L)) === 0))
    assert(TxLog.familySegments(store, "postings").size > 3)
    val expect = AnnIndex.probeIvf(spark, store, queries, k = 5, nProbe = 2)
      .orderBy("q_id", "rank").collect()
    val done2 = AnnIndex.maintain(spark, store, threshold = 3)
    assert(done2.map(_._1) === Seq("postings"),
      s"tombstoned postings must dispatch to the MoR fold, got $done2")
    assert(TxLog.familySegments(store, "postings").size === 1)
    assert(TxLog.familySegments(store, TxLog.DeletesFamily).isEmpty,
      "the MoR fold must retire the tombstones it applied")
    val after2 = AnnIndex.probeIvf(spark, store, queries, k = 5, nProbe = 2)
      .orderBy("q_id", "rank").collect()
    assert(after2.length == expect.length && after2.length > 0)
    after2.zip(expect).foreach { case (a, b) => assert(a == b) }
    // idempotent: tombstones gone, one segment per family
    assert(AnnIndex.maintain(spark, store, threshold = 3).isEmpty)
  }

  test("maintain: a tombstoned TEXT store dispatches to compactIndexMoR (stats recomputed)") {
    val docs = spark.range(200).selectExpr("id AS doc_id",
      "concat('w', CAST(id % 7 AS STRING), ' w', CAST(id % 11 AS STRING), " +
        "' common w', CAST(id % 3 AS STRING)) AS text")
    val store = tmpStore("maintainText")
    graft.operators.TextIndex.writePostings(
      docs.filter(col("doc_id") % 4 === 0), store)
    (1L to 3L).foreach(r => graft.operators.TextIndex.appendDocs(spark, store,
      docs.filter(col("doc_id") % 4 === r)))
    graft.operators.TextIndex.deleteDocs(spark, store,
      docs.select("doc_id").filter(col("doc_id") % 5 === 0))
    val queries = docs.filter(col("doc_id") < 3)
    val expect = graft.operators.TextIndex.searchBm25(spark, store, queries,
      k = 5).orderBy("q_id", "rank").collect()
    assert(TxLog.familySegments(store, "postings").size > 3)
    val done = AnnIndex.maintain(spark, store, threshold = 3)
    assert(done.map(_._1) === Seq("postings"),
      s"text store must dispatch postings to compactIndexMoR, got $done")
    assert(TxLog.familySegments(store, "postings").size === 1)
    assert(TxLog.familySegments(store, "stats").size === 1,
      "compactIndexMoR must fold the stats family in the same commit")
    assert(TxLog.familySegments(store, TxLog.DeletesFamily).isEmpty)
    val after = graft.operators.TextIndex.searchBm25(spark, store, queries,
      k = 5).orderBy("q_id", "rank").collect()
    assert(after.length == expect.length && after.length > 0)
    after.zip(expect).foreach { case (a, b) => assert(a == b) }
  }

  test("maintainReport makes deferrals visible: unclassifiable and ambiguous-key skips are named") {
    import spark.implicits._
    // a tombstone-masked family maintain cannot classify: the refusal
    // is correct (structural guard) but must be OBSERVABLE — segment
    // counts growing with no signal is how a cadence silently dies
    val store = tmpStore("maintainSkip")
    (0 to 3).foreach { i =>
      Seq((i.toLong, s"x$i")).toDF("id", "x")
        .write.parquet(s"$store/weird__seg$i")
      TxLog.commit(store, Seq(s"weird__seg$i"))
    }
    TxLog.commitDeletes(Seq(1L).toDF("id"), store)
    val rep = AnnIndex.maintainReport(spark, store, threshold = 3)
    assert(rep.compacted.isEmpty)
    assert(rep.skipped.map(_._1) === Seq("weird"))
    assert(rep.skipped.head._2.contains("cannot classify"))
    // the compat surface still returns compactions only; nothing moved
    assert(AnnIndex.maintain(spark, store, threshold = 3).isEmpty)
    assert(TxLog.familySegments(store, "weird").size === 4)
    // a tombstoned PLAIN table whose tombstone key schemas disagree
    val store2 = tmpStore("maintainKeys")
    (0 to 3).foreach { i =>
      Seq((i.toLong, s"x$i")).toDF("id", "x")
        .write.parquet(s"$store2/batch__seg$i")
      TxLog.commit(store2, Seq(s"batch__seg$i"))
    }
    TxLog.commitDeletes(Seq(1L).toDF("id"), store2)
    TxLog.commitDeletes(Seq((2L, "x2")).toDF("id", "x"), store2)
    val rep2 = AnnIndex.maintainReport(spark, store2, threshold = 3)
    assert(rep2.compacted.isEmpty)
    assert(rep2.skipped.map(_._1) === Seq("batch"))
    assert(rep2.skipped.head._2.contains("disagree"))
    // a healthy store reports no skips
    val store3 = tmpStore("maintainClean")
    (0 to 1).foreach { i =>
      Seq(i.toLong).toDF("id").write.parquet(s"$store3/batch__seg$i")
      TxLog.commit(store3, Seq(s"batch__seg$i"))
    }
    val rep3 = AnnIndex.maintainReport(spark, store3, threshold = 3)
    assert(rep3.compacted.isEmpty && rep3.skipped.isEmpty)
  }

  test("structural guard: tombstones refuse raw compaction of any unlisted family") {
    import spark.implicits._
    val store = tmpStore("guard")
    Seq((1L, "a"), (2L, "b")).toDF("id", "x")
      .write.parquet(s"$store/batch__seg0")
    TxLog.commit(store, Seq("batch__seg0"))
    Seq((3L, "c")).toDF("id", "x").write.parquet(s"$store/batch__seg1")
    TxLog.commit(store, Seq("batch__seg1"))
    TxLog.commitDeletes(Seq(1L).toDF("id"), store)
    // a GENERIC data family (not named "postings") is protected too —
    // the guard is structural, not name-based
    val e = intercept[IllegalArgumentException] {
      AnnIndex.compactFamily(spark, store, "batch", Seq.empty)
    }
    assert(e.getMessage.contains("resurrect"))
    // maintain recognizes the PLAIN table shape and whole-table-folds
    // it through compactMoR with keys from the tombstone schema
    val done = AnnIndex.maintain(spark, store, threshold = 1)
    assert(done.map(_._1) === Seq("batch"),
      s"plain tombstoned table must dispatch to compactMoR, got $done")
    assert(TxLog.familySegments(store, TxLog.DeletesFamily).isEmpty)
    val rows = TxLog.snapshot(spark, store,
        TxLog.latestVersion(store).get)
      .select("id").as[Long].collect().sorted.toSeq
    assert(rows === Seq(2L, 3L), "the fold must apply the tombstone")
    // idempotent: one compact segment, nothing over threshold
    assert(AnnIndex.maintain(spark, store, threshold = 1).isEmpty)
  }

  test("default probes are lazy plan constructors: building them fires no Spark job") {
    val store = tmpStore("lazy")
    val all = prepped
    val corpus = all.filter(col("id") >= 10)
    AnnIndex.writeIvf(corpus, "label", store)
    AnnIndex.writePq(corpus.select("id", "v"), corpus, m = 2, dim = 64, store)
    AnnIndex.writePqPostings(spark, store, m = 2, dim = 64)
    AnnIndex.writeLsh(corpus.select("id", "v", "nrm"), nPlanes = 8,
      dim = 64, store)
    val queries = all.filter(col("id") < 10).drop("label")
    // parallel leaf-file LISTING jobs are fine (driver metadata over a
    // >32-dir partitioned store); what must never fire is a COMPUTE
    // job — the old queries.count() gate was one
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        if (!desc.startsWith("Listing leaf files")) { jobs.add(desc); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      AnnIndex.probeIvf(spark, store, queries, k = 5, nProbe = 2)
      AnnIndex.probeIvfPq(spark, store, queries,
        k = 5, nProbe = 2, shortlist = 10, m = 2, dim = 64)
      AnnIndex.probeLsh(spark, store, queries, k = 5)
      // listener events are async — drain the bus before asserting
      org.apache.spark.sql.graft.Bridge.drainListenerBus(
        spark.sparkContext, 30000)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.isEmpty,
      s"building a default probe must not fire an eager compute job " +
        s"(the old queries.count() gate recomputed the query frame " +
        s"before the probe); fired: ${jobs.toArray.mkString("; ")}")
  }
}
