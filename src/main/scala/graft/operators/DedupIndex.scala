package graft.operators

import graft.sources.TxLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-run persistence for the MinHash/LSH dedup index — the
  * operational loop d19 proves in-process, closed across processes:
  * an installment ENDS by writing its banded index + verified
  * candidate pair set + doc registry to parquet, and the NEXT
  * installment READS them instead of rescanning the old corpus. Per-
  * installment cost then follows the installment's bucket volume, not
  * the corpus' — at 100 TB the difference between a nightly delta job
  * and a nightly full recompute.
  *
  * Store layout — ONE [[graft.sources.TxLog]] table dir, segments
  * prefixed by family ([[AnnIndex]]'s discipline, so both index
  * stores share one install/atomicity story):
  * {{{
  *   <store>/_txlog/v<N>.json      — manifests
  *   <store>/banded__seg<N>/   (doc_id, band, band_sig)  — LSH index
  *   <store>/pairs__seg<N>/    (d1, d2)                  — candidates
  *   <store>/docs__seg<N>/     (doc_id)                  — registry incl.
  *                                                         shingle-less docs
  * }}}
  *
  * Scale notes: [[write]] scans the corpus text exactly ONCE (the
  * banding pass); the pair self-join runs over the banded PARQUET just
  * written, and the registry projects only the id column (parquet
  * column pruning — text bytes never read). [[appendCandidates]]'s
  * probe join touches the stored banded rows and the installment's —
  * never the old corpus' documents files (plan-audited in
  * DedupIndexSpec and by the d21 catalog entry). [[installAppended]]
  * is O(delta): the installment's banded keys, NEW pairs, and doc ids
  * land as fresh segments behind ONE atomic manifest commit — existing
  * segments are never re-read or rewritten, a crash before the commit
  * leaves the live store at its previous version, and there is no
  * rename window. Pair segments stay disjoint by construction: stored
  * pairs are old×old, an installment adds only pairs touching a new
  * doc.
  */
object DedupIndex {

  private def segName(store: String, family: String): String =
    s"${family}__seg${TxLog.versions(store).size}"

  private def readFamily(sp: SparkSession, store: String,
      family: String): DataFrame = {
    val segs = TxLog.familySegments(store, family)
    require(segs.nonEmpty, s"store $store has no live '$family' segments")
    sp.read.parquet(segs.map(s => s"$store/$s"): _*)
  }

  /** Live tombstones as (__del_id, __dv), or None when the store has
    * never seen a delete (zero plan overhead then) — doc_id-keyed,
    * [[AnnIndex]]'s shape. */
  private def liveDeletes(sp: SparkSession, store: String)
      : Option[DataFrame] = {
    val latest = TxLog.latestVersion(store)
      .getOrElse(sys.error(s"store $store has no commits"))
    val segs = TxLog.liveSegmentsWithVersion(store, latest)
      .filter(_._1.startsWith(s"${TxLog.DeletesFamily}__"))
    if (segs.isEmpty) None
    else Some(segs.map { case (s, v) =>
      sp.read.parquet(s"$store/$s")
        .select(col("doc_id").as("__del_id")).withColumn("__dv", lit(v))
    }.reduce(_.unionByName(_)))
  }

  /** A family read with the version-aware MoR subtraction on each of
    * `idCols`: a tombstone kills only rows from segments committed
    * BEFORE it (re-ingested docs revive), and a PAIR dies when EITHER
    * endpoint died — so the pairs read applies the anti-join once per
    * id column. The tombstone side is deleted-keys-sized and
    * broadcast; with no live tombstones this is exactly the plain
    * family read. */
  private def readFamilyMoR(sp: SparkSession, store: String,
      family: String, idCols: Seq[String]): DataFrame =
    liveDeletes(sp, store) match {
      case None => readFamily(sp, store, family)
      case Some(dels) =>
        val latest = TxLog.latestVersion(store).get
        val segs = TxLog.liveSegmentsWithVersion(store, latest)
          .filter(_._1.startsWith(s"${family}__"))
        require(segs.nonEmpty, s"store $store has no live '$family' segments")
        val data = segs.map { case (s, v) =>
          sp.read.parquet(s"$store/$s").withColumn("__v", lit(v))
        }.reduce(_.unionByName(_))
        idCols.foldLeft(data) { (df, c) =>
          val d = dels.select(col("__del_id").as(s"__del_$c"),
            col("__dv").as(s"__dv_$c"))
          df.join(broadcast(d), df(c) === d(s"__del_$c") &&
            d(s"__dv_$c") > df("__v"), "left_anti")
        }.drop("__v")
    }

  /** Build and persist the index for a (first or rebuilt) corpus
    * installment, committed as ONE txlog version (a rebuild on a live
    * store commits replacement segments). Returns the store path. */
  def write(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, bands: Int, rows: Int, store: String,
      salt: Int = 1, saltMinBucket: Int = Int.MaxValue): String = {
    val sp = docs.sparkSession
    val bSeg = segName(store, "banded")
    val pSeg = segName(store, "pairs")
    val dSeg = segName(store, "docs")
    val sigs = Dedup.minhashSignatures(docs, idCol, textCol, shingleN, k)
    Dedup.minhashBanded(sigs, bands, rows)
      .write.mode("overwrite").parquet(s"$store/$bSeg")
    // pairs derive from the banded parquet just written — the corpus
    // text is not scanned a second time
    Dedup.bandedCandidates(sp.read.parquet(s"$store/$bSeg"),
        salt, saltMinBucket)
      .write.mode("overwrite").parquet(s"$store/$pSeg")
    docs.select(col(idCol).as("doc_id"))
      .write.mode("overwrite").parquet(s"$store/$dSeg")
    // a full rebuild replaces the postings the tombstones applied to —
    // retire them in the same commit (writeIvf's rule)
    TxLog.commit(store, adds = Seq(bSeg, pSeg, dSeg),
      removes = TxLog.familySegments(store, "banded") ++
        TxLog.familySegments(store, "pairs") ++
        TxLog.familySegments(store, "docs") ++
        TxLog.familySegments(store, TxLog.DeletesFamily))
    store
  }

  def readBanded(sp: SparkSession, store: String): DataFrame =
    readFamilyMoR(sp, store, "banded", Seq("doc_id"))

  def readPairs(sp: SparkSession, store: String): DataFrame =
    readFamilyMoR(sp, store, "pairs", Seq("d1", "d2"))

  def readDocs(sp: SparkSession, store: String): DataFrame =
    readFamilyMoR(sp, store, "docs", Seq("doc_id"))

  /** Tombstone-delete indexed documents by id — the dedup twin of
    * [[AnnIndex.deleteVectors]] / [[TextIndex.deleteDocs]], completing
    * the delete verb across ALL FOUR persisted index families: the
    * doomed ids land as ONE keys-only segment behind one commit —
    * O(deleted ids), zero index rows rewritten. Every read subtracts
    * them version-aware: the doc's banded keys stop matching probes,
    * its registry row disappears, and every CANDIDATE PAIR touching it
    * dies (either endpoint dead kills the pair) — while a later
    * re-ingest of the same id revives through a newer segment.
    * `ids`: one column of doc ids. */
  def deleteDocs(sp: SparkSession, store: String, ids: DataFrame): Unit = {
    TxLog.commitDeletes(
      ids.select(col(ids.columns.head).as("doc_id")).distinct(), store)
    ()
  }

  /** Apply the tombstones physically — the store's MoR OPTIMIZE
    * ([[AnnIndex.compactPostingsMoR]]'s discipline on all three
    * families at once): fold the tombstone-subtracted banded / pairs /
    * docs rows into one segment each and retire every old segment plus
    * the tombstones in ONE atomic commit (dataChange=false — the
    * subtracted reads are unchanged, incremental consumers step over).
    * Prior versions stay snapshot-readable. Returns the version. */
  def compactStoreMoR(sp: SparkSession, store: String): Int = {
    val old = Seq("banded", "pairs", "docs", TxLog.DeletesFamily)
      .flatMap(TxLog.familySegments(store, _))
    val bSeg = segName(store, "banded")
    val pSeg = segName(store, "pairs")
    val dSeg = segName(store, "docs")
    readBanded(sp, store).write.mode("overwrite").parquet(s"$store/$bSeg")
    readPairs(sp, store).write.mode("overwrite").parquet(s"$store/$pSeg")
    readDocs(sp, store).write.mode("overwrite").parquet(s"$store/$dSeg")
    // per-family stats carry-forward (sound: MoR subtraction only
    // shrinks ranges; merging per family keeps ranges family-local)
    Seq("banded" -> bSeg, "pairs" -> pSeg, "docs" -> dSeg).foreach {
      case (fam, seg) =>
        TxLog.mergeSegmentStats(store, TxLog.familySegments(store, fam), seg)
    }
    TxLog.commit(store, adds = Seq(bSeg, pSeg, dSeg), removes = old,
      dataChange = false)
  }

  /** The banded LSH keys of an arriving installment. */
  def bandNew(newDocs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, bands: Int, rows: Int): DataFrame =
    Dedup.minhashBanded(
      Dedup.minhashSignatures(newDocs, idCol, textCol, shingleN, k),
      bands, rows)

  /** The DELTA pair set of an installment: its banded keys probe the
    * stored index plus themselves, so only new×(old ∪ new) bucket
    * pairs are computed — and since every pair touches a new doc,
    * the result is disjoint from every stored pair segment. Distinct
    * within the installment (a pair can collide in several bands). */
  private def newCandidates(sp: SparkSession, store: String,
      bandedNew: DataFrame): DataFrame =
    bandedNew.as("a")
      .join(readBanded(sp, store).unionByName(bandedNew).as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_sig") === col("b.band_sig") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"))
      .distinct()

  /** Incremental candidate maintenance against a persisted store: the
    * installment's banded keys probe the stored index, so only
    * new×(old ∪ new) bucket pairs are computed — old×old pairs come
    * from the stored pair set verbatim. The result is the candidate
    * set a from-scratch recompute over (old ∪ new) would produce
    * (hash-proven by the d21 oracle). */
  def appendCandidates(sp: SparkSession, store: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, bands: Int, rows: Int): DataFrame =
    readPairs(sp, store).unionByName(newCandidates(sp, store,
        bandNew(newDocs, idCol, textCol, shingleN, k, bands, rows)))
      .distinct()

  /** Install the post-installment index state — O(delta) and atomic:
    * the installment's banded keys, its NEW candidate pairs, and its
    * doc ids land as three fresh segments made live by a single
    * txlog commit. Existing segments are neither read back for a
    * rewrite nor moved ([[AnnIndex.appendVectors]]'s discipline); a
    * crash before the commit leaves the store byte-identical at its
    * previous version, and the retry overwrites the orphan segment
    * dirs. */
  def installAppended(sp: SparkSession, store: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, bands: Int, rows: Int): Unit = {
    val bSeg = segName(store, "banded")
    val pSeg = segName(store, "pairs")
    val dSeg = segName(store, "docs")
    val bandedNew =
      bandNew(newDocs, idCol, textCol, shingleN, k, bands, rows)
    bandedNew.write.mode("overwrite").parquet(s"$store/$bSeg")
    // the delta pairs probe the STORED banded segments plus the one
    // just written — the old pair segments are never read
    newCandidates(sp, store, sp.read.parquet(s"$store/$bSeg"))
      .write.mode("overwrite").parquet(s"$store/$pSeg")
    newDocs.select(col(idCol).as("doc_id"))
      .write.mode("overwrite").parquet(s"$store/$dSeg")
    TxLog.commit(store, adds = Seq(bSeg, pSeg, dSeg))
    ()
  }
}
