package graft.operators

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
  * Store layout (all plain parquet, so any engine can audit it):
  * {{{
  *   <store>/banded/   (doc_id, band, band_sig)  — the LSH index
  *   <store>/pairs/    (d1, d2)                  — candidate pairs so far
  *   <store>/docs/     (doc_id)                  — registry incl. docs
  *                                                 with no shingles
  * }}}
  *
  * Scale notes: [[write]] scans the corpus text exactly ONCE (the
  * banding pass); the pair self-join runs over the banded PARQUET just
  * written, and the registry projects only the id column (parquet
  * column pruning — text bytes never read). [[appendCandidates]]'s
  * probe join touches the stored banded rows and the installment's —
  * never the old corpus' documents files (plan-audited in
  * DedupIndexSpec and by the d21 catalog entry).
  */
object DedupIndex {

  /** Build and persist the index for a (first or rebuilt) corpus
    * installment. Returns the store path. */
  def write(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, bands: Int, rows: Int, store: String,
      salt: Int = 1, saltMinBucket: Int = Int.MaxValue): String = {
    val sp = docs.sparkSession
    val sigs = Dedup.minhashSignatures(docs, idCol, textCol, shingleN, k)
    Dedup.minhashBanded(sigs, bands, rows)
      .write.mode("overwrite").parquet(s"$store/banded")
    // pairs derive from the banded parquet just written — the corpus
    // text is not scanned a second time
    Dedup.bandedCandidates(sp.read.parquet(s"$store/banded"),
        salt, saltMinBucket)
      .write.mode("overwrite").parquet(s"$store/pairs")
    docs.select(col(idCol).as("doc_id"))
      .write.mode("overwrite").parquet(s"$store/docs")
    store
  }

  def readBanded(sp: SparkSession, store: String): DataFrame =
    sp.read.parquet(s"$store/banded")

  def readPairs(sp: SparkSession, store: String): DataFrame =
    sp.read.parquet(s"$store/pairs")

  def readDocs(sp: SparkSession, store: String): DataFrame =
    sp.read.parquet(s"$store/docs")

  /** The banded LSH keys of an arriving installment. */
  def bandNew(newDocs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, bands: Int, rows: Int): DataFrame =
    Dedup.minhashBanded(
      Dedup.minhashSignatures(newDocs, idCol, textCol, shingleN, k),
      bands, rows)

  /** Incremental candidate maintenance against a persisted store: the
    * installment's banded keys probe the stored index, so only
    * new×(old ∪ new) bucket pairs are computed — old×old pairs come
    * from the stored pair set verbatim. The result is the candidate
    * set a from-scratch recompute over (old ∪ new) would produce
    * (hash-proven by the d21 oracle). */
  def appendCandidates(sp: SparkSession, store: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, bands: Int, rows: Int): DataFrame = {
    val bandedNew =
      bandNew(newDocs, idCol, textCol, shingleN, k, bands, rows)
    val newPairs = bandedNew.as("a")
      .join(readBanded(sp, store).unionByName(bandedNew).as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_sig") === col("b.band_sig") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"))
    readPairs(sp, store).unionByName(newPairs).distinct()
  }

  /** Install the post-installment index state ATOMICALLY: the merged
    * banded keys / pairs / registry are written to `<store>__stage`
    * and swapped in via directory renames — a crash mid-write leaves
    * the live store untouched (the stage is swept on the next call),
    * mirroring the staged-install discipline of the JDBC sink
    * ([[graft.sources.Sinks.upsertJdbc]]). Single-filesystem rename
    * semantics (local/HDFS); object stores need their own committer. */
  def installAppended(sp: SparkSession, store: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int, bands: Int, rows: Int): Unit = {
    val stage = store + "__stage"
    val old = store + "__old"
    def rm(p: String): Unit = {
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
          .foreach(del)
        f.delete(); ()
      }
      del(new java.io.File(p))
    }
    rm(stage); rm(old)
    val bandedNew =
      bandNew(newDocs, idCol, textCol, shingleN, k, bands, rows)
    readBanded(sp, store).unionByName(bandedNew)
      .write.mode("overwrite").parquet(s"$stage/banded")
    appendCandidates(sp, store, newDocs, idCol, textCol,
        shingleN, k, bands, rows)
      .write.mode("overwrite").parquet(s"$stage/pairs")
    readDocs(sp, store).unionByName(newDocs.select(col(idCol).as("doc_id")))
      .write.mode("overwrite").parquet(s"$stage/docs")
    // the swap: two renames; the live store exists at all times except
    // between them, and a crash there leaves __old intact for recovery
    require(new java.io.File(store).renameTo(new java.io.File(old)),
      s"install: cannot move live store $store aside")
    require(new java.io.File(stage).renameTo(new java.io.File(store)),
      s"install: cannot move stage $stage into place (old state at $old)")
    rm(old)
  }
}
