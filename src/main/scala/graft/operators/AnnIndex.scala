package graft.operators

import graft.sources.TxLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Cross-run persistence for the similarity indexes — the s-family
  * twin of [[DedupIndex]]: a 100 TB corpus embeds ONCE and probes
  * forever, so the IVF centroids/postings, the sign-LSH bucket
  * tables, and the PQ codebook/codes must outlive the process that
  * built them. An installment ends by writing its index segments and
  * COMMITTING them through [[graft.sources.TxLog]]; later
  * installments (new queries, new vectors) probe or extend the
  * STORED index and never rescan the old embeddings files
  * (plan-audited in AnnIndexSpec and by the s15/s16/s17/s18 catalog
  * entries).
  *
  * Store layout: ONE txlog table dir whose segments are prefixed by
  * family — several families share the store, and one commit covers
  * an install atomically (no cross-family crash window):
  * {{{
  *   <store>/_txlog/v<N>.json              — manifests (TxLog)
  *   <store>/centroids__seg<N>/            (cluster, cv, cn)
  *   <store>/postings__seg<N>/cluster=<c>/ (n_id, cv, cn)
  *   <store>/buckets__seg<N>/bucket=<b>/   (n_id, cv, cn)  — sign-LSH
  *   <store>/codebook__seg<N>/             (cluster, cv)   — PQ
  *   <store>/codes__seg<N>/                (id, code…, sq_err)
  *   <store>/pqposts__seg<N>/cluster=<c>/  (n_id, code…)   — IVFPQ lists
  *   <store>/_meta/                        — pinned schemas + LSH conf
  * }}}
  *
  * Scale notes:
  *  - GROW IS O(delta): [[appendVectors]] / [[appendLshVectors]]
  *    write ONLY the installment's assignments as a NEW segment and
  *    commit its manifest — untouched segments are never re-read or
  *    rewritten, and a crash before the commit leaves the store at
  *    its previous version (an uncommitted segment dir is invisible
  *    to readers and overwritten by the retry).
  *  - COMPACTION bounds the segment count: [[compactFamily]] folds a
  *    family's accumulated grow segments back into one (the OPTIMIZE
  *    half of the log-structured bargain) in a single atomic commit,
  *    leaving siblings and historical snapshots intact.
  *  - Postings/buckets are PARTITIONED BY cluster/bucket inside each
  *    segment, so a probe that routes to nProbe clusters reads
  *    exactly those partitions' files — the broadcast of the routed
  *    (query, cluster) pairs drives dynamic partition pruning on the
  *    scan, Spark's native expression of "open only the probed
  *    inverted lists". Past [[ProbeBroadcastRows]] routed rows the
  *    probe falls back to a shuffle join behind a static
  *    cluster-IN-list partition filter — same math, same result.
  *  - Centroids and codebook are dimension-sized (|clusters| × dim)
  *    and always broadcast.
  *  - The partition column's type is PINNED by a `_meta` schema
  *    sidecar written at build time: partition-directory type
  *    inference would otherwise re-derive it from the directory
  *    strings and could diverge from the centroids' stored label
  *    type (string labels that parse as numbers).
  */
object AnnIndex {

  private def saturatingMul(a: Long, b: Long): Long =
    if (a > 0 && b > 0 && a > Long.MaxValue / b) Long.MaxValue else a * b

  /** Routed-pair ceiling for the broadcast probe plan: below it the
    * routed (query × nProbe) frame broadcasts and drives dynamic
    * partition pruning; above it (large offline probe batches) the
    * probe joins by shuffle behind a static partition IN-filter —
    * collected probed-cluster ids are bounded by the centroid count,
    * which is dimension-table-sized by IVF design.
    *
    * The gate compares against a caller-supplied `queryRows` SIZE
    * HINT, never an eager `queries.count()`: counting would fire an
    * extra Spark job that recomputes whatever produced the query
    * frame before the probe even starts. `None` (the default)
    * declares the batch probe-shaped and takes the broadcast plan
    * outright; an offline caller probing with a huge derived frame
    * passes its known row count and gets the shuffle plan. */
  val ProbeBroadcastRows: Long = 1000000L

  private def segName(store: String, family: String): String =
    s"${family}__seg${TxLog.versions(store).size}"

  private def familyPaths(sp: SparkSession, store: String,
      family: String): Seq[String] = {
    val segs = TxLog.familySegments(store, family)
    require(segs.nonEmpty, s"store $store has no live '$family' segments")
    segs.map(s => s"$store/$s")
  }

  // ---- _meta sidecars: pinned read schemas + LSH configuration ----

  private def writeMeta(store: String, name: String, body: String): Unit = {
    val dir = new java.io.File(store, "_meta")
    dir.mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, name).toPath,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  private def readMeta(store: String, name: String): Option[String] = {
    val f = new java.io.File(new java.io.File(store, "_meta"), name)
    if (!f.exists()) None
    else Some(new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Read a partitioned family with its build-time schema pinned from
    * the `_meta` sidecar — partition values are CAST to the written
    * column type instead of re-inferred from directory strings. Each
    * segment is its own partition-discovery root (Spark refuses
    * multiple partitioned roots in one scan), unioned by name: the
    * partition filter of a probe prunes inside EVERY segment's scan,
    * and all segments share the pinned schema so the union is exact. */
  private def readPinned(sp: SparkSession, store: String,
      family: String): DataFrame = {
    val schema = readMeta(store, s"${family}_schema.json")
      .map(json => DataType.fromJson(json).asInstanceOf[StructType])
    familyPaths(sp, store, family)
      .map { p =>
        val r = sp.read
        schema.foreach(r.schema)
        r.parquet(p)
      }
      .reduce(_.unionByName(_))
  }

  // ---- IVF: build / read / probe / grow ----

  /** Build and persist the IVF index for a corpus installment:
    * centroids from the corpus' label partition ([[Similarity
    * .centroids]] — bit-reproducible ordered folds) plus the corpus
    * vectors as cluster-partitioned postings, committed as ONE txlog
    * version (a re-build on a live store commits replacement
    * segments; sibling families — PQ, LSH — are untouched).
    * `corpus` schema: (id, v, nrm, labelCol). Returns the store
    * path. */
  def writeIvf(corpus: DataFrame, labelCol: String, store: String): String = {
    val cSeg = segName(store, "centroids")
    val pSeg = segName(store, "postings")
    val cents = Similarity.centroids(corpus, labelCol)
    cents.write.mode("overwrite").parquet(s"$store/$cSeg")
    // pin the unpartitioned families' schemas too: a probe is then a
    // pure plan constructor — no schema-inference job at read time
    writeMeta(store, "centroids_schema.json", cents.schema.json)
    val posts = corpus.select(col(labelCol).as("cluster"),
      col("id").as("n_id"), col("v").as("cv"), col("nrm").as("cn"))
    posts.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$store/$pSeg")
    writeMeta(store, "postings_schema.json", posts.schema.json)
    // a full rebuild also retires any tombstones from the previous
    // generation — they applied to the postings being replaced
    TxLog.commit(store, adds = Seq(cSeg, pSeg),
      removes = TxLog.familySegments(store, "centroids") ++
        TxLog.familySegments(store, "postings") ++
        TxLog.familySegments(store, TxLog.DeletesFamily))
    store
  }

  def readCentroids(sp: SparkSession, store: String): DataFrame =
    readPinned(sp, store, "centroids")

  /** Live tombstones of the store as (__del_id, __dv), or None when
    * the store has never seen a delete (the common case — zero plan
    * overhead then). */
  private def liveDeletes(sp: SparkSession, store: String)
      : Option[DataFrame] = {
    val latest = TxLog.latestVersion(store)
      .getOrElse(sys.error(s"store $store has no commits"))
    val segs = TxLog.liveSegmentsWithVersion(store, latest)
      .filter(_._1.startsWith(s"${TxLog.DeletesFamily}__"))
    if (segs.isEmpty) None
    else Some(segs.map { case (s, v) =>
      sp.read.parquet(s"$store/$s")
        .select(col("n_id").as("__del_id")).withColumn("__dv", lit(v))
    }.reduce(_.unionByName(_)))
  }

  /** The live postings MINUS tombstones — the FAISS remove_ids
    * contract through the txlog MoR discipline ([[graft.sources
    * .TxLog.snapshotMoR]]'s rule applied to the postings family): a
    * tombstone kills only postings from segments committed BEFORE it,
    * so re-appending a deleted id revives it. With tombstones live,
    * the version-aware anti-join sits between the probe join and the
    * scan (dynamic partition pruning can degrade to static pruning) —
    * [[compactPostingsMoR]] is the hygiene that restores the clean
    * probe plan. With none, this is exactly the pinned family read. */
  def readPostings(sp: SparkSession, store: String): DataFrame =
    liveDeletes(sp, store) match {
      case None => readPinned(sp, store, "postings")
      case Some(dels) =>
        val latest = TxLog.latestVersion(store).get
        val schema = readMeta(store, "postings_schema.json")
          .map(json => DataType.fromJson(json).asInstanceOf[StructType])
        val data = TxLog.liveSegmentsWithVersion(store, latest)
          .filter(_._1.startsWith("postings__"))
          .map { case (s, v) =>
            val r = sp.read
            schema.foreach(r.schema)
            r.parquet(s"$store/$s").withColumn("__v", lit(v))
          }.reduce(_.unionByName(_))
        data.join(dels, data("n_id") === dels("__del_id") &&
            dels("__dv") > data("__v"), "left_anti")
          .drop("__v")
    }

  /** Tombstone-delete stored vectors by id — O(deleted ids), zero
    * postings rewritten: one keys-only segment, one commit. `ids`:
    * one column `id`. Centroids are NOT retrained (deletes never move
    * the code space; re-clustering is a deliberate reindex). */
  def deleteVectors(sp: SparkSession, store: String, ids: DataFrame): Unit = {
    TxLog.commitDeletes(ids.select(col("id").as("n_id")), store)
    ()
  }

  /** Apply the tombstones physically: fold the tombstone-subtracted
    * postings into ONE cluster-partitioned segment and retire every
    * live postings + tombstone segment in a single atomic commit —
    * [[compactFamily]]'s MoR form. Sibling families untouched; prior
    * versions stay snapshot-readable. Returns the committed version. */
  def compactPostingsMoR(sp: SparkSession, store: String): Int = {
    val old = TxLog.familySegments(store, "postings") ++
      TxLog.familySegments(store, TxLog.DeletesFamily)
    val seg = segName(store, "postings")
    readPostings(sp, store).write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$store/$seg")
    // carry any recorded stats forward (tombstone subtraction only
    // shrinks ranges, so the union of old ranges stays sound)
    TxLog.mergeSegmentStats(store, old, seg)
    // dataChange=false: the tombstone-subtracted snapshot is unchanged
    // (deletes were the data commits); incremental readers step over it
    TxLog.commit(store, adds = Seq(seg), removes = old, dataChange = false)
  }

  /** IVF top-k against the STORED index: route each query to its
    * `nProbe` nearest stored centroids, then scan only those clusters'
    * postings. Identical math to [[Similarity.ivfTopK]] (the parquet
    * round trip is bit-exact for doubles), so a probe of the stored
    * index hash-matches the in-process build — the s15 contract.
    * Queries schema: (id, v, nrm). `queryRows`: optional size hint
    * for the broadcast gate (see [[ProbeBroadcastRows]] — None =
    * probe-shaped, broadcast; no counting job is ever fired). */
  def probeIvf(sp: SparkSession, store: String, queries: DataFrame,
      k: Int, nProbe: Int, queryRows: Option[Long] = None,
      maxBroadcastRows: Long = ProbeBroadcastRows): DataFrame = {
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
    // hint, or the query plan's own LIMIT-derived bound (free to read)
    val qBound = queryRows.orElse(queries.queryExecution.analyzed.maxRows)
    val nRouted = qBound.map(r => saturatingMul(r, nProbe.toLong))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    probeJoin(sp, routed, readPostings(sp, store), "cluster",
        nRouted, maxBroadcastRows)
      .select(col("q_id"), col("n_id"),
        (graft.Dsl.dotFold(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** The probe join, size-gated: routed is (queries × nProbe) rows —
    * below the gate it is BROADCAST so the join is a
    * BroadcastHashJoin over the partitioned scan, which lets dynamic
    * partition pruning restrict the scan to the probed partitions
    * only. Past the gate (large offline probe batches would blow the
    * broadcast), the probed partition ids — bounded by the index's
    * partition count, a dimension table by construction — collect
    * into a static IN partition filter and the join shuffles. Both
    * plans compute the identical pairs. `nRouted` is the caller's
    * size hint; None declares the batch probe-shaped (broadcast) —
    * with one DEFENSIVE ceiling: when the hint is absent but the
    * routed plan's own `maxRows` bound (LIMIT-derived, free to read —
    * no job) proves the frame over the gate, the shuffle plan is
    * taken anyway, so a hint-less large-batch misuse degrades to a
    * shuffle instead of a broadcast OOM. */
  private def probeJoin(sp: SparkSession, routed: DataFrame,
      posts: DataFrame, key: String, nRouted: Option[Long],
      maxBroadcastRows: Long): DataFrame = {
    val bound = nRouted.orElse(routed.queryExecution.analyzed.maxRows)
    if (bound.forall(_ <= maxBroadcastRows)) broadcast(routed).join(posts, key)
    else {
      val probed = routed.select(key).distinct().collect().map(_.get(0))
      routed.join(posts.filter(col(key).isin(probed.toIndexedSeq: _*)), key)
    }
  }

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

  /** Grow the persisted IVF index with an installment — O(delta),
    * the FAISS "add" contract's scale shape: new vectors route to
    * their nearest FROZEN centroid and land as ONE NEW
    * cluster-partitioned postings segment, made visible by a single
    * txlog commit. Existing segments are neither read nor rewritten
    * (the routing reads only the dimension-sized centroids), the
    * commit is O(1) metadata, and a crash before it leaves the live
    * store byte-identical at its previous version — no rename
    * window, no sibling-family clobbering. */
  def appendVectors(sp: SparkSession, store: String,
      vectors: DataFrame): Unit = {
    val seg = segName(store, "postings")
    assignToStored(sp, store, vectors)
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$store/$seg")
    TxLog.commit(store, adds = Seq(seg))
    ()
  }

  /** Compact a family's live segments into ONE — the OPTIMIZE half of
    * the log-structured contract: N O(delta) grows leave N segments
    * whose per-partition files shrink toward the small-file cliff
    * (each probe opens nSegments × nProbe files; parquet footers and
    * task setup start to dominate). Compaction reads the family's
    * live rows ONCE, rewrites them as a single segment with the same
    * partitioning, and swaps the segment SET atomically in one txlog
    * commit (`adds=[merged], removes=[old…]`). Old segments are never
    * deleted from disk, so every pre-compaction version stays
    * snapshot-readable (time travel survives OPTIMIZE, as in
    * Delta/Iceberg), sibling families are untouched by construction
    * (the commit names only this family's segments), and a crash
    * before the commit leaves the live store at its previous version.
    * Returns the committed version. */
  /** Families a raw compaction can never resurrect deleted rows in:
    * none of these is ever read through the version-aware tombstone
    * anti-join (centroids/codebook are dimension-sized code spaces;
    * codes/pqposts are re-ranked against the MoR-subtracted postings;
    * stats fold additively and subtract tombstones AFTER the read), so
    * merging their segments under live tombstones is content-neutral. */
  private val RawCompactSafeUnderDeletes =
    Set("centroids", "codebook", "codes", "pqposts", "stats")

  def compactFamily(sp: SparkSession, store: String, family: String,
      partitionCols: Seq[String]): Int = {
    // A raw compaction of a TOMBSTONE-MASKED family would read the
    // pinned rows (deleted rows included), commit the merged segment
    // at a version NEWER than every tombstone, and leave the
    // tombstones live — the version-aware anti-join (tombstone __dv >
    // data __v) would never match again and every deleted row would
    // silently resurrect. The guard is STRUCTURAL, not name-based:
    // with any live tombstone segment, every family is refused except
    // those provably never MoR-read — so a generic txlog data family
    // ("batch"/"write"/"compact", readable via snapshotMoR or the
    // format's MoR-by-default reader) is protected too. Only the
    // MoR-aware compactors may touch a masked family.
    require(RawCompactSafeUnderDeletes(family) ||
        TxLog.familySegments(store, TxLog.DeletesFamily).isEmpty,
      s"store $store has live delete tombstones masking its '$family' " +
        "family: a raw family compaction would resurrect the deleted " +
        "rows — use the MoR-aware path (AnnIndex.compactPostingsMoR for " +
        "vector stores, TextIndex.compactIndexMoR for text stores, " +
        "TxLog.compactMoR for plain tables) instead")
    val old = TxLog.familySegments(store, family)
    require(old.nonEmpty, s"store $store has no live '$family' segments")
    val seg = segName(store, family)
    val rows =
      if (readMeta(store, s"${family}_schema.json").isDefined)
        readPinned(sp, store, family)
      else sp.read.parquet(familyPaths(sp, store, family): _*)
    val w = rows.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(s"$store/$seg")
    // carry any recorded stats forward — a compacted segment must stay
    // as prunable as the installments it folded (the merged rows are
    // exactly their union, so the union of ranges is the true range)
    TxLog.mergeSegmentStats(store, old, seg)
    // maintenance, not data — incremental consumers step over it
    TxLog.commit(store, adds = Seq(seg), removes = old, dataChange = false)
  }

  /** Partition columns of a written segment, inferred from its
    * on-disk `col=value` directory layout — what [[maintain]] needs
    * to re-partition a compacted family identically without every
    * store type registering its layout. */
  private def partitionColsOf(store: String, seg: String): Seq[String] = {
    @annotation.tailrec
    def walk(dir: java.io.File, acc: List[String]): List[String] = {
      val sub = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.contains("="))
        .sortBy(_.getName).headOption
      sub match {
        case Some(d) => walk(d, acc :+ d.getName.split("=")(0))
        case None => acc
      }
    }
    walk(new java.io.File(store, seg), Nil)
  }

  /** The OPTIMIZE cadence policy — what keeps the log-structured
    * bargain bounded BY CONSTRUCTION instead of by operator
    * discipline: every O(delta) grow adds a segment, and without a
    * trigger the per-probe file fan-out (nSegments × nProbe) and the
    * per-read union plan grow without bound. `maintain` compacts
    * every family whose live segment count exceeds `threshold`
    * (default [[graft.sources.TxLog.CheckpointEvery]] — one compact
    * per checkpoint's worth of grows), re-partitioning each exactly
    * as written (layout inferred from the segment dirs). A
    * tombstone-masked postings family is DISPATCHED to its MoR-aware
    * compactor instead of raw-compacted (the resurrect hazard
    * [[compactFamily]] guards against): a live stats family marks a
    * text store ([[graft.operators.TextIndex.compactIndexMoR]] — the
    * stats segment must be recomputed in the same commit), otherwise
    * [[compactPostingsMoR]] — so the cadence trigger never defers
    * forever under continuous delete traffic. The MoR fold runs FIRST
    * (it retires the tombstones, so the families after it compact
    * under a clean store) and also bounds the deletes-family segment
    * count, which the per-family threshold never sees. A tombstoned
    * PLAIN table (every family ∈ batch/write/compact — appendBatch,
    * the format writer, prior compactions) dispatches to
    * [[graft.sources.TxLog.compactMoR]] with the keys read from the
    * tombstone segments' own schema (a commitDeletes segment holds
    * exactly the keys), refusing only when tombstone schemas disagree;
    * a tombstoned DEDUP store (families banded/pairs/docs) dispatches
    * to [[DedupIndex.compactStoreMoR]] — so maintain is total over
    * every store shape this library writes. A tombstone-masked family
    * on a MIXED store maintain
    * can't classify is skipped (never raw-compacted — the structural
    * guard). Each compaction is its own atomic commit; a crash
    * between two leaves every family readable. Single-maintainer,
    * like [[graft.sources.TxLog.vacuum]]. Returns (family,
    * committedVersion) per compaction performed. */
  def maintain(sp: SparkSession, store: String,
      threshold: Int = graft.sources.TxLog.CheckpointEvery)
      : Seq[(String, Int)] = maintainReport(sp, store, threshold).compacted

  /** [[maintain]]'s result with its DEFERRALS made visible: `skipped`
    * names every over-threshold family maintain REFUSED to touch and
    * why — a tombstone-masked family on a store it can't classify, or
    * a tombstoned plain table whose tombstone key schemas disagree.
    * The refusals are correct (the structural guard prevents silent
    * resurrection), but without this report they were invisible: a
    * cadence that defers every fire lets segment counts grow without
    * bound and the operator learns only from degrading probe plans.
    * An empty `skipped` is the healthy state; a persistent entry
    * means the store needs its family-specific MoR compactor (or
    * explicit keyCols) invoked directly. */
  final case class MaintainReport(compacted: Seq[(String, Int)],
      skipped: Seq[(String, String)])

  /** Control-flow signal for [[maintainReport]]'s lazy key resolution:
    * tombstone key schemas disagree, so the partitioned fold cannot
    * derive keys — surfaced as a `skipped` deferral, never a crash. */
  private[operators] final class TombKeysDisagree(
      val keySets: Seq[Seq[String]]) extends RuntimeException

  def maintainReport(sp: SparkSession, store: String,
      threshold: Int = graft.sources.TxLog.CheckpointEvery)
      : MaintainReport = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val latest = TxLog.latestVersion(store)
    if (latest.isEmpty) return MaintainReport(Seq.empty, Seq.empty)
    val fams = TxLog.liveSegments(store, latest.get)
      .map(_.split("__")(0)).distinct
      .filterNot(_ == TxLog.DeletesFamily)
      // postings first: its MoR fold retires the tombstones, so the
      // families compacted after it see an unmasked store
      .sortBy(f => (if (f == "postings") 0 else 1, f))
    val plainTable = fams.forall(PlainTableFamilies)
    val compacted = Seq.newBuilder[(String, Int)]
    val skipped = Seq.newBuilder[(String, String)]
    // PARTITIONED plain tables dispatch to the partition-PRESERVING
    // whole-table fold: compactMoR/compactFamily would merge every
    // leaf into one unpartitioned segment, silently destroying the
    // partition identity dynamic overwrite and OPTIMIZE … WHERE
    // depend on — routine maintenance must not break the layout verbs.
    // Empty-parts markers (`{"cols":[]}` — an empty partitioned
    // batch's artifact) are NEUTRAL here: they belong to no leaf and
    // retire opportunistically, so a stray marker neither routes an
    // otherwise-plain table into the partitioned dispatch nor makes a
    // fully-partitioned table count as "mixed".
    val liveData = TxLog.liveSegments(store, latest.get)
      .filterNot(_.startsWith(s"${TxLog.DeletesFamily}__"))
    val segParts = liveData.map(s => s -> TxLog.segmentParts(store, s)).toMap
    val valueAttributed = liveData.filter(s => segParts(s).exists(_.nonEmpty))
    val plainSegs = liveData.filter(s => segParts(s).isEmpty)
    if (plainTable && valueAttributed.nonEmpty) {
      if (plainSegs.nonEmpty) {
        // mixed layout — and the deferral is only WORTH REPORTING when
        // maintenance would have fired at all (segment count over the
        // threshold, or live tombstones awaiting retirement); a
        // healthy under-threshold table must not log a skip
        if (liveData.size > threshold ||
            TxLog.familySegments(store, TxLog.DeletesFamily).nonEmpty)
          skipped += "partitioned" -> ("the table mixes partition-" +
            "attributed and plain segments: run OPTIMIZE … REPARTITION " +
            "BY (or TxLog.repartitionTable) to migrate the plain " +
            "segments, then OPTIMIZE folds per leaf")
      } else {
        // keys resolve LAZILY — compactAllPartitionsMoR forces them
        // only when a fold actually runs, so a no-op maintenance pass
        // (nothing over threshold) never pays the tombstone schema
        // reads; a key-schema disagreement surfaces as a deferral,
        // exactly like the eager check used to
        def lazyKeys: Seq[String] = {
          val delSegs = TxLog.familySegments(store, TxLog.DeletesFamily)
          if (delSegs.isEmpty)
            valueAttributed.flatMap(s => segParts(s).getOrElse(Seq.empty))
              .map(_._1).distinct
          else {
            val keySets = delSegs.map(s =>
              sp.read.parquet(s"$store/$s").schema.fieldNames.toSeq).distinct
            if (keySets.size > 1) throw new AnnIndex.TombKeysDisagree(keySets)
            keySets.head
          }
        }
        try {
          val folded = TxLog.compactAllPartitionsMoR(sp, store, lazyKeys,
            leafThreshold = threshold)
          compacted ++= folded.map { case (vals, v) =>
            (if (vals.isEmpty) "deletes"
             else vals.map(p => s"${p._1}=${p._2}").mkString("/")) -> v
          }
        } catch {
          case e: AnnIndex.TombKeysDisagree =>
            skipped += "partitioned" -> ("tombstone key schemas disagree " +
              s"(${e.keySets}): run TxLog.compactAllPartitionsMoR with " +
              "explicit keys")
        }
      }
      val report = MaintainReport(compacted.result(), skipped.result())
      report.skipped.foreach { case (fam, why) =>
        System.err.println(s"[graft.maintain] $store: family '$fam' " +
          s"over threshold but SKIPPED — $why")
      }
      return report
    }
    fams.foreach { fam =>
      // segment lists re-read FRESH per family: an earlier MoR fold in
      // this very loop may have retired tombstones or folded a sibling
      val segs = TxLog.familySegments(store, fam)
      val tombstoned =
        TxLog.familySegments(store, TxLog.DeletesFamily).nonEmpty
      if (segs.size <= threshold) ()
      else if (tombstoned && !RawCompactSafeUnderDeletes(fam)) {
        if (fam == "postings") {
          if (TxLog.familySegments(store, "stats").nonEmpty)
            compacted += fam -> TextIndex.compactIndexMoR(sp, store)
          else compacted += fam -> compactPostingsMoR(sp, store)
        } else if (fams.forall(DedupStoreFamilies)) {
          // the dedup index's three families fold together (a pair
          // dies with either endpoint, so they must move as one)
          compacted += fam -> DedupIndex.compactStoreMoR(sp, store)
        } else if (plainTable) {
          // whole-table fold, keys from the tombstones' own schema;
          // compactMoR is safe ONLY here — on an index store it would
          // merge sibling families into one segment
          val keySets = TxLog
            .familySegments(store, TxLog.DeletesFamily)
            .map(s => sp.read.parquet(s"$store/$s").schema.fieldNames.toSeq)
            .distinct
          if (keySets.size != 1)
            skipped += fam -> ("tombstone key schemas disagree " +
              s"($keySets): run TxLog.compactMoR with explicit keys")
          else compacted += fam -> TxLog.compactMoR(sp, store, keySets.head)
        } else skipped += fam -> ("tombstone-masked family on a store " +
          "maintain cannot classify: run its MoR-aware compactor directly")
      }
      else compacted += fam ->
        compactFamily(sp, store, fam, partitionColsOf(store, segs.head))
    }
    val report = MaintainReport(compacted.result(), skipped.result())
    // deferrals must be observable even when the caller ignores the
    // report (the cadence trigger usually does)
    report.skipped.foreach { case (fam, why) =>
      System.err.println(s"[graft.maintain] $store: family '$fam' over " +
        s"threshold but SKIPPED — $why")
    }
    report
  }

  /** The family names plain (non-index) txlog tables write — what
    * [[maintain]] uses to recognize a store it may whole-table-fold. */
  private val PlainTableFamilies = graft.sources.TxLog.PlainFamilies

  /** The [[DedupIndex]] store's family set — recognized by [[maintain]]
    * so a tombstoned dedup store dispatches to its MoR compactor. */
  private val DedupStoreFamilies = Set("banded", "pairs", "docs")

  // ---- PQ: build / read / encode ----

  /** Train and persist the PQ index for a corpus installment: the
    * codebook ([[Similarity.centroids]] label means over `labeled`)
    * plus the installment's codes, committed as ONE txlog version.
    * `vectors`: (id, v); `labeled`: (id, v, label). Returns the
    * store path. */
  def writePq(vectors: DataFrame, labeled: DataFrame, m: Int, dim: Int,
      store: String): String = {
    val bSeg = segName(store, "codebook")
    val cSeg = segName(store, "codes")
    val book = Similarity.centroids(labeled, "label")
      .select(col("cluster"), col("cv"))
    book.write.mode("overwrite").parquet(s"$store/$bSeg")
    writeMeta(store, "codebook_schema.json", book.schema.json)
    val sp = vectors.sparkSession
    val codes = Similarity.pqEncodeWith(vectors,
      sp.read.schema(book.schema).parquet(s"$store/$bSeg"), m, dim)
    codes.write.mode("overwrite").parquet(s"$store/$cSeg")
    writeMeta(store, "codes_schema.json", codes.schema.json)
    TxLog.commit(store, adds = Seq(bSeg, cSeg),
      removes = TxLog.familySegments(store, "codebook") ++
        TxLog.familySegments(store, "codes"))
    store
  }

  def readCodebook(sp: SparkSession, store: String): DataFrame =
    readPinned(sp, store, "codebook")

  def readCodes(sp: SparkSession, store: String): DataFrame =
    readPinned(sp, store, "codes")

  /** Encode an arriving installment against the STORED (frozen)
    * codebook — the production PQ contract: codebooks are versioned
    * artifacts, new vectors must encode in the same code space as the
    * corpus they'll be searched with, and retraining is a deliberate
    * reindex, never a side effect of ingest. */
  def encodeWith(sp: SparkSession, store: String, vectors: DataFrame,
      m: Int, dim: Int): DataFrame =
    Similarity.pqEncodeWith(vectors, readCodebook(sp, store), m, dim)

  /** Materialize the IVFPQ inverted lists: every stored posting's PQ
    * codes, CLUSTER-partitioned — the `pqposts` family. This is the
    * layout FAISS's IVFADC actually stores: the coarse lists hold m
    * one-byte-ish codes per vector, NOT the raw vectors, so the ADC
    * stage of a probe reads m bytes/vector from only the probed
    * partitions while the full-precision postings stay cold until
    * the shortlist re-rank. Requires live `postings` and `codebook`
    * families in the store; commits the lists as one txlog version
    * (replacing any previous pqposts — a code-space change is a
    * deliberate reindex, like [[writePq]]). */
  def writePqPostings(sp: SparkSession, store: String, m: Int,
      dim: Int): Unit = {
    val posts = readPostings(sp, store)
    val seg = segName(store, "pqposts")
    val rows = Similarity.pqEncodeWith(
        posts.select(col("n_id").as("id"), col("cv").as("v")),
        readCodebook(sp, store), m, dim)
      .drop("sq_err")
      .join(posts.select(col("n_id").as("id"), col("cluster")), "id")
      .select(col("cluster") +: col("id").as("n_id") +:
        (0 until m).map(s => col(s"code$s")): _*)
    rows.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$store/$seg")
    writeMeta(store, "pqposts_schema.json", rows.schema.json)
    TxLog.commit(store, adds = Seq(seg),
      removes = TxLog.familySegments(store, "pqposts"))
    ()
  }

  def readPqPostings(sp: SparkSession, store: String): DataFrame =
    readPinned(sp, store, "pqposts")

  /** Grow the persisted IVFPQ store with an installment — O(delta)
    * on BOTH families, closing the one grow gap [[writePqPostings]]
    * left (it rebuilds the whole corpus' code lists — right for a
    * code-space change, wrong as the ingest path): the new vectors
    * route to their nearest FROZEN centroid ([[assignToStored]] —
    * the postings segment) and encode against the FROZEN codebook
    * ([[Similarity.pqEncodeWith]] — the pqposts segment), and BOTH
    * segments commit behind ONE manifest, so a probe never sees a
    * store whose full-precision postings and code lists disagree.
    * Existing segments are neither read nor rewritten; the only
    * reads are the dimension-sized centroids and codebook. Input
    * (id, v, nrm). */
  def appendPqVectors(sp: SparkSession, store: String, vectors: DataFrame,
      m: Int, dim: Int): Unit = {
    val pSeg = segName(store, "postings")
    val qSeg = segName(store, "pqposts")
    val assigned = assignToStored(sp, store, vectors)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$store/$pSeg")
    val codes = Similarity.pqEncodeWith(
        vectors.select(col("id"), col("v")), readCodebook(sp, store), m, dim)
      .drop("sq_err")
    codes.join(assigned.select(col("n_id").as("id"), col("cluster")), "id")
      .select(col("cluster") +: col("id").as("n_id") +:
        (0 until m).map(s => col(s"code$s")): _*)
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$store/$qSeg")
    assigned.unpersist()
    TxLog.commit(store, adds = Seq(pSeg, qSeg))
    ()
  }

  /** Two-stage IVF+PQ top-k against the stored index — the IVFADC
    * search composed from the store's THREE families (centroids route,
    * pqposts shortlist, postings re-rank), in its non-residual form
    * (codes quantize the raw vectors, not centroid residuals — the
    * residual-free variant keeps an exact relational oracle):
    *
    *  1. ROUTE: each query to its `nProbe` nearest centroids
    *     (broadcast, dimension-sized).
    *  2. ADC: per query, a distance LUT to every codebook entry per
    *     subspace (|queries| × |codebook| × m rows, broadcast); the
    *     probed clusters' PQ codes — m small ints/vector, partition-
    *     pruned like [[probeIvf]] — join the LUT per subspace and the
    *     approximate distance is the fixed-order sum d0 + d1 + …,
    *     bit-reproducible against the oracle. Top-`shortlist` per
    *     query by (adc asc, n_id).
    *  3. RE-RANK: only the shortlist rows fetch their full-precision
    *     vectors from the postings (a (cluster, n_id) join, partition-
    *     pruned again) for exact cosine top-`k`.
    *
    * Scale shape: the 100 TB corpus is touched only through the two
    * partition-pruned scans — codes for candidates, vectors for the
    * shortlist (shortlist × |queries| rows, NOT candidates) — and
    * everything broadcast is dimension- or query-batch-sized.
    * Queries schema: (id, v, nrm). `queryRows`: optional size hint
    * for the three broadcast gates (routed pairs, shortlist side,
    * query side — see [[ProbeBroadcastRows]]; None = probe-shaped,
    * broadcast everywhere; no counting job is ever fired, and the
    * query frame is consumed without an extra pass). */
  def probeIvfPq(sp: SparkSession, store: String, queries: DataFrame,
      k: Int, nProbe: Int, shortlist: Int, m: Int, dim: Int,
      queryRows: Option[Long] = None,
      maxBroadcastRows: Long = ProbeBroadcastRows): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val cents = readCentroids(sp, store)
    val wProbe = Window.partitionBy("q_id")
      .orderBy(col("c_sim").desc, col("cluster"))
    val q = queries
      .select(col("id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val routed = q
      .join(broadcast(cents))
      .select(col("q_id"), col("cluster"),
        (graft.Dsl.dotFold(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("c_sim"))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nProbe)
      .select("q_id", "cluster")
    // Subspace distance LUT: same L2 expansion (and the same left-
    // associative shape) as Similarity.pqEncodeWith, so the oracle's
    // `a - 2.0*b + c` reproduces every distance bit-exactly.
    val lut = q.join(broadcast(
        readCodebook(sp, store).select(col("cluster").as("cb"), col("cv"))))
      .select(col("q_id") +: col("cb") +: (0 until m).map { s =>
        val lo = s * sub + 1
        val qS = slice(col("qv"), lo, sub)
        val cS = slice(col("cv"), lo, sub)
        (graft.Dsl.dotFold(qS, qS) - lit(2.0) * graft.Dsl.dotFold(qS, cS)
          + graft.Dsl.dotFold(cS, cS)).as(s"d$s")
      }: _*)
    val qBound = queryRows.orElse(queries.queryExecution.analyzed.maxRows)
    val cand = probeJoin(sp, routed, readPqPostings(sp, store), "cluster",
      qBound.map(r => saturatingMul(r, nProbe.toLong)), maxBroadcastRows)
    val withAdc = (0 until m).foldLeft(cand) { (acc, s) =>
      acc.join(broadcast(lut.select(col("q_id"),
          col("cb").as(s"code$s"), col(s"d$s"))),
        Seq("q_id", s"code$s"))
    }.withColumn("adc",
      (0 until m).map(s => col(s"d$s")).reduce(_ + _))
    val wShort = Window.partitionBy("q_id").orderBy(col("adc"), col("n_id"))
    val short = withAdc
      .withColumn("__sr", row_number().over(wShort))
      .filter(col("__sr") <= shortlist)
      .select("q_id", "cluster", "n_id", "adc")
    val wK = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    // The re-rank sides are query-batch-sized (shortlist × |queries|
    // and |queries| rows): broadcast them under the same gate so the
    // full-precision fetch is a broadcast join over the partitioned
    // postings scan at any corpus size, not an AQE judgment call.
    val shortSide =
      if (qBound.forall(r => saturatingMul(r, shortlist.toLong) <=
          maxBroadcastRows))
        broadcast(short) else short
    val qSide =
      if (qBound.forall(_ <= maxBroadcastRows)) broadcast(q) else q
    shortSide
      .join(readPostings(sp, store), Seq("cluster", "n_id"))
      .join(qSide, "q_id")
      .select(col("q_id"), col("n_id"), col("adc"),
        (graft.Dsl.dotFold(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("cosine"))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
  }

  // ---- Sign-LSH: build / read / probe / grow ----

  /** Build and persist the sign-LSH bucket table for a corpus
    * installment: every vector's [[Similarity.lshBuckets]] bucket id
    * (deterministic hyperplanes, seed 7), bucket-PARTITIONED so a
    * probe opens only its probed buckets' files. The (nPlanes, dim)
    * configuration is pinned in `_meta/lsh.json` — the hyperplanes
    * re-derive deterministically from it, so the stored table and
    * every later installment hash in the SAME code space. `corpus`
    * schema: (id, v, nrm). Returns the store path. */
  def writeLsh(corpus: DataFrame, nPlanes: Int, dim: Int,
      store: String): String = {
    val seg = segName(store, "buckets")
    val rows = Similarity.lshBuckets(corpus, nPlanes, dim)
      .select(col("bucket"), col("id").as("n_id"),
        col("v").as("cv"), col("nrm").as("cn"))
    rows.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$store/$seg")
    writeMeta(store, "buckets_schema.json", rows.schema.json)
    writeMeta(store, "lsh.json",
      s"""{"nPlanes":$nPlanes,"dim":$dim}""")
    TxLog.commit(store, adds = Seq(seg),
      removes = TxLog.familySegments(store, "buckets"))
    store
  }

  /** The pinned (nPlanes, dim) of a persisted sign-LSH store. */
  def readLshConf(store: String): (Int, Int) = {
    val body = readMeta(store, "lsh.json")
      .getOrElse(sys.error(s"store $store has no _meta/lsh.json"))
    def intField(name: String): Int =
      s""""$name":(\\d+)""".r.findFirstMatchIn(body)
        .getOrElse(sys.error(s"malformed lsh.json in $store")).group(1).toInt
    (intField("nPlanes"), intField("dim"))
  }

  def readLshBuckets(sp: SparkSession, store: String): DataFrame =
    readPinned(sp, store, "buckets")

  /** Grow the persisted sign-LSH table — O(delta), [[appendVectors]]'s
    * discipline: the installment hashes through the store's FROZEN
    * hyperplane configuration and lands as one new bucket-partitioned
    * segment behind a single txlog commit. Input (id, v, nrm). */
  def appendLshVectors(sp: SparkSession, store: String,
      vectors: DataFrame): Unit = {
    val (nPlanes, dim) = readLshConf(store)
    val seg = segName(store, "buckets")
    Similarity.lshBuckets(vectors, nPlanes, dim)
      .select(col("bucket"), col("id").as("n_id"),
        col("v").as("cv"), col("nrm").as("cn"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$store/$seg")
    TxLog.commit(store, adds = Seq(seg))
    ()
  }

  /** Multi-probe top-k against the STORED sign-LSH table: each query
    * probes its own bucket plus every 1-bit-flip neighbor (the s13
    * recall knob), candidates verify by exact cosine. Identical math
    * to [[Similarity.lshMultiProbeTopK]] over the same corpus, so a
    * probe of the stored table hash-matches the in-process build.
    * The probe set broadcasts (queries × (nPlanes+1) rows) and
    * drives partition pruning on the bucket-partitioned scan; past
    * the gate the same static-IN fallback as [[probeIvf]] applies.
    * Queries schema: (id, v, nrm). `queryRows`: optional size hint
    * for the broadcast gate (None = probe-shaped, broadcast; no
    * counting job is ever fired). */
  def probeLsh(sp: SparkSession, store: String, queries: DataFrame,
      k: Int, queryRows: Option[Long] = None,
      maxBroadcastRows: Long = ProbeBroadcastRows): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (nPlanes, dim) = readLshConf(store)
    val probes = Similarity.lshBuckets(
        queries.select(col("id"), col("v"), col("nrm")), nPlanes, dim)
      .select(col("id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(array(col("bucket") +: (0 until nPlanes).map(i =>
          col("bucket").bitwiseXOR(lit(1L << i))): _*)).as("bucket"))
    val nRouted = queryRows
      .orElse(queries.queryExecution.analyzed.maxRows)
      .map(r => saturatingMul(r, (nPlanes + 1).toLong))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    probeJoin(sp, probes, readLshBuckets(sp, store), "bucket",
        nRouted, maxBroadcastRows)
      .select(col("q_id"), col("n_id"),
        (graft.Dsl.dotFold(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
