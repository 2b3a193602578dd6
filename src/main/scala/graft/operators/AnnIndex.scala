package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-run persistence for the similarity indexes — the s-family
  * twin of [[DedupIndex]]: a 100 TB corpus embeds ONCE and probes
  * forever, so the IVF centroids/postings and the PQ codebook/codes
  * must outlive the process that built them. An installment ends by
  * writing its index to parquet; later installments (new queries, new
  * vectors) probe or extend the STORED index and never rescan the old
  * embeddings files (plan-audited in AnnIndexSpec and by the
  * s15/s16 catalog entries).
  *
  * Store layout (plain parquet, any engine can audit it):
  * {{{
  *   <store>/centroids/               (cluster, cv, cn)   — IVF coarse index
  *   <store>/postings/cluster=<c>/    (n_id, cv, cn)      — cluster-partitioned
  *   <store>/codebook/                (cluster, cv)       — PQ codewords
  *   <store>/codes/                   (id, code…, sq_err) — PQ-encoded corpus
  * }}}
  *
  * Scale notes: postings are PARTITIONED BY cluster, so a probe that
  * routes to nProbe clusters reads exactly those clusters' files —
  * the broadcast of the routed (query, cluster) pairs drives dynamic
  * partition pruning on the postings scan, Spark's native expression
  * of "open only the probed inverted lists". Centroids and codebook
  * are dimension-sized (|clusters| × dim) and always broadcast.
  */
object AnnIndex {

  /** Build and persist the IVF index for a corpus installment:
    * centroids from the corpus' label partition ([[Similarity
    * .centroids]] — bit-reproducible ordered folds) plus the corpus
    * vectors as cluster-partitioned postings. `corpus` schema:
    * (id, v, nrm, labelCol). Returns the store path. */
  def writeIvf(corpus: DataFrame, labelCol: String, store: String): String = {
    Similarity.centroids(corpus, labelCol)
      .write.mode("overwrite").parquet(s"$store/centroids")
    corpus.select(col(labelCol).as("cluster"), col("id").as("n_id"),
        col("v").as("cv"), col("nrm").as("cn"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$store/postings")
    store
  }

  def readCentroids(sp: SparkSession, store: String): DataFrame =
    sp.read.parquet(s"$store/centroids")

  def readPostings(sp: SparkSession, store: String): DataFrame =
    sp.read.parquet(s"$store/postings")

  /** IVF top-k against the STORED index: route each query to its
    * `nProbe` nearest stored centroids, then scan only those clusters'
    * postings. Identical math to [[Similarity.ivfTopK]] (the parquet
    * round trip is bit-exact for doubles), so a probe of the stored
    * index hash-matches the in-process build — the s15 contract.
    * Queries schema: (id, v, nrm). */
  def probeIvf(sp: SparkSession, store: String, queries: DataFrame,
      k: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = readCentroids(sp, store)
    val wProbe = Window.partitionBy("q_id")
      .orderBy(col("c_sim").desc, col("cluster"))
    val routed = queries
      .select(col("id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      .join(broadcast(cents))
      .select(col("q_id"), col("qv"), col("qn"), col("cluster"),
        (graft.Dsl.dotFold(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("c_sim"))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nProbe)
      .select("q_id", "qv", "qn", "cluster")
    // routed is (queries × nProbe) rows — broadcast it so the join is
    // a BroadcastHashJoin over the postings scan, which lets dynamic
    // partition pruning restrict the scan to the probed clusters only
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    broadcast(routed).join(readPostings(sp, store), "cluster")
      .select(col("q_id"), col("n_id"),
        (graft.Dsl.dotFold(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Train and persist the PQ index for a corpus installment: the
    * codebook ([[Similarity.centroids]] label means over `labeled`)
    * plus the installment's codes. `vectors`: (id, v); `labeled`:
    * (id, v, label). Returns the store path. */
  def writePq(vectors: DataFrame, labeled: DataFrame, m: Int, dim: Int,
      store: String): String = {
    val cents = Similarity.centroids(labeled, "label")
      .select(col("cluster"), col("cv"))
    cents.write.mode("overwrite").parquet(s"$store/codebook")
    val sp = vectors.sparkSession
    Similarity.pqEncodeWith(vectors,
        sp.read.parquet(s"$store/codebook"), m, dim)
      .write.mode("overwrite").parquet(s"$store/codes")
    store
  }

  def readCodebook(sp: SparkSession, store: String): DataFrame =
    sp.read.parquet(s"$store/codebook")

  def readCodes(sp: SparkSession, store: String): DataFrame =
    sp.read.parquet(s"$store/codes")

  /** Encode an arriving installment against the STORED (frozen)
    * codebook — the production PQ contract: codebooks are versioned
    * artifacts, new vectors must encode in the same code space as the
    * corpus they'll be searched with, and retraining is a deliberate
    * reindex, never a side effect of ingest. */
  def encodeWith(sp: SparkSession, store: String, vectors: DataFrame,
      m: Int, dim: Int): DataFrame =
    Similarity.pqEncodeWith(vectors, readCodebook(sp, store), m, dim)

  /** Assign vectors to their NEAREST stored centroid by cosine (ties
    * → smaller cluster id) — the routing step of the FAISS "add"
    * contract: on ingest, centroids NEVER move; re-clustering is a
    * deliberate reindex. One broadcast of the dimension-sized
    * centroid table; the argmax is a per-vector rank over |clusters|
    * candidates. Input (id, v, nrm) → output (cluster, n_id, cv, cn)
    * in postings schema. */
  def assignToStored(sp: SparkSession, store: String,
      vectors: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("n_id")
      .orderBy(col("__sim").desc, col("cluster"))
    vectors.select(col("id").as("n_id"), col("v").as("cv"),
        col("nrm").as("cn"))
      .join(broadcast(readCentroids(sp, store)
        .select(col("cluster"), col("cv").as("cv2"), col("cn").as("cn2"))))
      .select(col("cluster"), col("n_id"), col("cv"), col("cn"),
        (graft.Dsl.dotFold(col("cv"), col("cv2")) / (col("cn") * col("cn2")))
          .as("__sim"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select("cluster", "n_id", "cv", "cn")
  }

  /** Grow the persisted IVF index with an installment: new vectors
    * route to their nearest FROZEN centroid and append to the
    * cluster-partitioned postings, installed ATOMICALLY — the merged
    * postings are written to `<store>__stage` and swapped in via
    * directory renames ([[DedupIndex.installAppended]]'s discipline:
    * a crash mid-write leaves the live store untouched; stage/old
    * scratch is swept on the next call). Centroids are copied
    * verbatim: the index grows, the code space doesn't move. */
  def appendVectors(sp: SparkSession, store: String,
      vectors: DataFrame): Unit = {
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
    readCentroids(sp, store)
      .write.mode("overwrite").parquet(s"$stage/centroids")
    readPostings(sp, store)
      .unionByName(assignToStored(sp, store, vectors))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$stage/postings")
    require(new java.io.File(store).renameTo(new java.io.File(old)),
      s"install: cannot move live store $store aside")
    require(new java.io.File(stage).renameTo(new java.io.File(store)),
      s"install: cannot move stage $stage into place (old state at $old)")
    rm(old)
  }
}
