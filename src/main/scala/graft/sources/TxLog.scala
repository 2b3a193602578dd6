package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Minimal transaction-log table format: Delta/Iceberg's snapshot
  * algebra reduced to its core — an append-only `_txlog/` directory of
  * version manifests, each listing data SEGMENTS (Spark-written
  * parquet directories) added and removed by that commit. A reader
  * pins a version, folds the manifests up to it into a live-segment
  * set, and reads exactly those segments; old segments are NEVER
  * rewritten, so every historical version stays readable (time
  * travel) and concurrent readers are immune to in-flight writers.
  *
  * Why this matters at 100 TB: directory listings stop being the
  * source of truth (a partial write can never be observed — a segment
  * becomes visible only when its manifest lands), deletes are O(1)
  * metadata (no data rewrite), and snapshot reads give repeatable
  * results under continuous ingest.
  *
  * Commit protocol: the manifest is staged as a temp file and
  * installed as `vN.json` via hard-link creation — the POSIX
  * atomic create-if-absent (a rename would silently REPLACE an
  * existing target, letting two racing writers both claim the same
  * version; link() fails with EEXIST instead). Version numbers are
  * claimed optimistically — a loser retries at the next version,
  * which is exactly Delta's optimistic-concurrency loop.
  */
object TxLog {

  private def logDir(tableDir: String) = Paths.get(tableDir, "_txlog")

  /** Committed versions, ascending (empty for a fresh table). */
  def versions(tableDir: String): Seq[Int] = {
    val d = logDir(tableDir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val it = Files.list(d)
      try it.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
        .toSeq.sorted
      finally it.close()
    }
  }
  private implicit class RichIt[A](val it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }

  /** Every [[CheckpointEvery]]-th commit also writes a CHECKPOINT —
    * the folded live-segment set as of that version — so a reader
    * starts its fold from the newest checkpoint at or below its
    * pinned version instead of replaying every manifest since v0.
    * This is Delta's `_last_checkpoint` discipline reduced to its
    * core: a store that grows by one O(delta) segment per ingest
    * installment accrues thousands of manifests per year, and
    * without checkpoints every snapshot read pays an O(versions)
    * metadata fold before it opens a single data file. Checkpoints
    * are pure optimization — best-effort written (a crash between
    * manifest and checkpoint costs nothing but fold length), named
    * `ckpt-v<N>.json` so [[versions]]' `v*.json` filter never sees
    * them, and installed with the same atomic create-if-absent link
    * as manifests (racing writers collapse to one winner). */
  val CheckpointEvery = 16

  private def checkpointVersions(tableDir: String): Seq[Int] = {
    val d = logDir(tableDir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val it = Files.list(d)
      try it.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("ckpt-v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("ckpt-v").stripSuffix(".json").toInt)
        .toSeq.sorted
      finally it.close()
    }
  }

  private def writeCheckpoint(tableDir: String, v: Int): Unit = {
    val d = logDir(tableDir)
    val live = foldSegments(tableDir, v)
    // "ever" = every segment any manifest ≤ v ADDED (live or since
    // retired): the fold base for appendBatch's exactly-once test, so
    // a long-lived stream's redelivery check is O(CheckpointEvery)
    // manifest reads instead of replaying the whole history per batch
    val ever = foldEverAdded(tableDir, v)
    // "liveV" = the live set WITH each segment's add version
    // ("seg@version" — '@' is rejected in segment names): the fold
    // base for MoR reads, which need sequencing information the plain
    // "live" set forgets
    val liveV = foldSegmentsWithVersion(tableDir, v)
      .map { case (s, sv) => s"$s@$sv" }
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val body = s"""{"version":$v,"live":${arr(live)},"ever":${arr(ever)},""" +
      s""""liveV":${arr(liveV)}}"""
    val tmp = d.resolve(s".tmp.ckpt.${java.util.UUID.randomUUID}")
    try {
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      Files.createLink(d.resolve(s"ckpt-v$v.json"), tmp)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => // racing winner
      case e: java.io.IOException =>
        // best-effort: a missing checkpoint only lengthens the fold
        System.err.println(s"[txlog] checkpoint v$v skipped: ${e.getMessage}")
    } finally { Files.deleteIfExists(tmp); () }
  }

  /** Commit a new version adding/removing the given segment names
    * (paths relative to the table dir). Returns the version claimed.
    * Manifest JSON is flat and order-stable, so a manifest is
    * byte-reproducible from its inputs.
    *
    * `dataChange = false` marks a MAINTENANCE commit — a layout
    * rewrite (compaction/OPTIMIZE) whose before- and after-snapshots
    * hold the same rows. Incremental consumers ([[changes]],
    * [[changesCdf]], the streaming source) step OVER such commits
    * instead of failing: the rows they rewrote were already delivered
    * by the data commits that first added them — Delta's
    * `dataChange=false` discipline, what lets OPTIMIZE and streaming
    * reads coexist on one table. A commit that removes segments with
    * `dataChange = true` (the default) is a genuine history rewrite
    * and still fails every incremental read loudly. */
  def commit(tableDir: String, adds: Seq[String],
      removes: Seq[String] = Seq.empty, dataChange: Boolean = true): Int = {
    // an empty MAINTENANCE manifest is a METADATA COMMIT — the version
    // marker schema changes (RENAME COLUMN) anchor to, adding/removing
    // no segments; an empty DATA commit stays refused (it would claim
    // a version for nothing)
    require(dataChange == false || adds.nonEmpty || removes.nonEmpty,
      "empty commit")
    // '@' is reserved as the checkpoint liveV separator
    val bad = (adds ++ removes).filter(s =>
      s.contains("\"") || s.contains("/") || s.contains("@"))
    require(bad.isEmpty, s"segment names must be simple dir names: $bad")
    val d = logDir(tableDir)
    Files.createDirectories(d)
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    // the marker is written only when false, so data-commit manifests
    // stay byte-identical to every pre-existing table's
    val dcField = if (dataChange) "" else ""","dataChange":false"""
    var attempt = 0
    while (true) {
      val v = versions(tableDir).lastOption.map(_ + 1).getOrElse(0)
      // Conflict detection (Delta's commit validation reduced to its
      // core): a remove must name a CURRENTLY-live segment. Without
      // this, two racing maintenance commits removing the same
      // segments would both install (the loser retries at the next
      // version with stale removes) and POISON the log — every later
      // fold would die on "removes unknown segment". Validated against
      // the head we're about to succeed; a lost link race re-validates
      // on retry, so the install point stays the serialization point.
      if (removes.nonEmpty || adds.nonEmpty) {
        val live =
          if (v == 0) Set.empty[String] else foldSegments(tableDir, v - 1).toSet
        val stale = removes.filterNot(live)
        require(stale.isEmpty,
          s"commit to $tableDir conflicts with a concurrent writer: " +
            s"removes $stale are not live at v${v - 1} — re-read the " +
            "table and retry the operation")
        // the dual guard: re-ADDING a live segment would silently
        // no-op in the fold (set semantics) while its data dir was
        // already overwritten by the writer — refuse before install
        val dup = adds.filter(live)
        require(dup.isEmpty,
          s"commit to $tableDir adds segments $dup that are already " +
            s"live at v${v - 1} — segment names must never be reused")
      }
      val body =
        s"""{"version":$v,"adds":${arr(adds)},"removes":${arr(removes)}$dcField}"""
      val tmp = d.resolve(s".tmp.${java.util.UUID.randomUUID}")
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      try {
        // createLink is the atomic create-if-absent: EEXIST on a lost
        // race (ATOMIC_MOVE would silently replace the winner).
        Files.createLink(d.resolve(s"v$v.json"), tmp)
        Files.deleteIfExists(tmp)
        if (v > 0 && v % CheckpointEvery == 0) writeCheckpoint(tableDir, v)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp) // lost the race; retry at next version
          attempt += 1
          require(attempt < 1000, s"txlog commit livelock in $tableDir")
      }
    }
    -1 // unreachable
  }

  /** The live segment set as of `asOf` (inclusive): start from the
    * newest readable checkpoint at or below `asOf`, fold the
    * manifests after it — O(CheckpointEvery) manifest reads however
    * many versions the table has accrued. */
  def liveSegments(tableDir: String, asOf: Int): Seq[String] = {
    val vs = versions(tableDir)
    require(vs.contains(asOf), s"version $asOf not in $vs")
    foldSegments(tableDir, asOf)
  }

  // flat JSON written by commit()/writeCheckpoint(): known string
  // arrays, no nesting
  private def jsonArr(body: String, name: String,
      where: => String): Seq[String] = {
    val m = s""""$name":\\[([^\\]]*)\\]""".r.findFirstMatchIn(body)
      .getOrElse(sys.error(s"malformed $where"))
    m.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
  }

  /** Tolerant array parse: None when the named array is absent (an
    * older-format checkpoint), so new fields stay backward-readable. */
  private def jsonArrOpt(body: String, name: String): Option[Seq[String]] =
    s""""$name":\\[([^\\]]*)\\]""".r.findFirstMatchIn(body).map(
      _.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq)

  /** One manifest, parsed: (adds, removes, dataChange). */
  private def readManifest(tableDir: String,
      v: Int): (Seq[String], Seq[String], Boolean) = {
    val body = new String(
      Files.readAllBytes(logDir(tableDir).resolve(s"v$v.json")),
      StandardCharsets.UTF_8)
    (jsonArr(body, "adds", s"manifest v$v in $tableDir"),
      jsonArr(body, "removes", s"manifest v$v in $tableDir"),
      !body.contains(""""dataChange":false"""))
  }

  /** Every segment ANY manifest ≤ asOf ever added (live or retired) —
    * the exactly-once ledger [[appendBatch]] tests redeliveries
    * against. Folds from the newest checkpoint carrying an "ever"
    * array (older checkpoints predate the field and are skipped), so
    * the read cost is O(CheckpointEvery) manifests at any history
    * length. */
  private def foldEverAdded(tableDir: String, asOf: Int): Seq[String] = {
    val ever = scala.collection.mutable.LinkedHashSet[String]()
    val base = checkpointVersions(tableDir).filter(_ <= asOf).reverse
      .collectFirst(Function.unlift { bv =>
        scala.util.Try {
          val body = new String(Files.readAllBytes(
            logDir(tableDir).resolve(s"ckpt-v$bv.json")),
            StandardCharsets.UTF_8)
          jsonArrOpt(body, "ever")
        }.toOption.flatten.map(bv -> _)
      })
    base.foreach { case (_, segs) => segs.foreach(ever += _) }
    versions(tableDir)
      .filter(v => v <= asOf && base.forall(v > _._1))
      .foreach(v => readManifest(tableDir, v)._1.foreach(ever += _))
    ever.toSeq
  }

  private def foldSegments(tableDir: String, asOf: Int): Seq[String] = {
    val live = scala.collection.mutable.LinkedHashSet[String]()
    // Base: newest checkpoint ≤ asOf that parses. A corrupt or
    // half-written checkpoint is skipped (cost: a longer fold), never
    // trusted — the manifests stay the source of truth.
    val base = checkpointVersions(tableDir).filter(_ <= asOf).reverse
      .collectFirst(Function.unlift { bv =>
        scala.util.Try {
          val body = new String(Files.readAllBytes(
            logDir(tableDir).resolve(s"ckpt-v$bv.json")),
            StandardCharsets.UTF_8)
          jsonArr(body, "live", s"checkpoint v$bv in $tableDir")
        }.toOption.map(bv -> _)
      })
    base.foreach { case (_, segs) => segs.foreach(live += _) }
    versions(tableDir)
      .filter(v => v <= asOf && base.forall(v > _._1)).foreach { v =>
      val body = new String(
        Files.readAllBytes(logDir(tableDir).resolve(s"v$v.json")),
        StandardCharsets.UTF_8)
      jsonArr(body, "adds", s"manifest v$v in $tableDir")
        .foreach(live += _)
      jsonArr(body, "removes", s"manifest v$v in $tableDir").foreach { r =>
        require(live.contains(r),
          s"manifest v$v removes unknown segment $r")
        live -= r
      }
    }
    live.toSeq
  }

  /** Snapshot read pinned at `asOf`: exactly the live DATA segments,
    * one multi-path parquet scan (partition pruning and pushdown apply
    * per segment as usual). Tombstone segments are metadata, never
    * data — they are excluded here but NOT applied; the raw snapshot
    * of a tombstoned table shows deleted rows ([[snapshotMoR]] is the
    * subtracting read).
    *
    * `mergeSchema` is the SCHEMA EVOLUTION rule: later segments may
    * ADD columns (a segment missing a column reads it as NULL —
    * union-by-name over the per-segment scans, so pushdown still
    * reaches each scan); a column whose TYPE differs between live
    * segments fails loudly — a type change is a rewrite, not
    * evolution (Delta's rule). Off by default: the plain snapshot
    * keeps the single multi-path scan and Spark's first-file schema. */
  def snapshot(spark: SparkSession, tableDir: String, asOf: Int,
      mergeSchema: Boolean = false,
      keepSeg: String => Boolean = _ => true): DataFrame = {
    // column mapping: renames anchored at or below the pinned version
    // re-map each OLDER segment's physical names to the read's logical
    // names (a read pinned below every anchor maps nothing — time
    // travel keeps the old names)
    val renames = renamedColumns(tableDir).filter(_._3 <= asOf)
    val segsV = liveSegmentsWithVersion(tableDir, asOf)
      .filterNot(_._1.startsWith(s"${DeletesFamily}__"))
      .filter(s => keepSeg(s._1))
    require(segsV.nonEmpty, s"version $asOf of $tableDir has no data segments")
    val parts = segsV.map { case (s, v) => (s, v, segmentParts(tableDir, s)) }
    if (renames.isEmpty && !mergeSchema && parts.forall(_._3.isEmpty))
      spark.read.parquet(segsV.map(s => s"$tableDir/${s._1}"): _*)
    else {
      // converted hive segments carry their partition values in a
      // sidecar, not the data files — attach them per segment before
      // the union so every branch exposes the full schema
      val dfs = parts.map { case (s, v, p) =>
        s -> applyRenames(attachParts(spark.read.parquet(s"$tableDir/$s"), p),
          renames, v, asOf) }
      checkMergeable(tableDir, dfs.map { case (s, df) => s -> df.schema })
      dfs.map(_._2).reduce(_.unionByName(_,
        allowMissingColumns = mergeSchema))
    }
  }

  /** Evolution guard for merged reads: columns may be ADDED across
    * segments, but a name whose type differs between two live
    * segments is a rewrite pretending to be evolution — refuse it
    * loudly instead of letting parquet readers produce garbage. */
  private def checkMergeable(tableDir: String,
      schemas: Seq[(String, org.apache.spark.sql.types.StructType)]): Unit = {
    val seen = scala.collection.mutable
      .Map[String, (org.apache.spark.sql.types.DataType, String)]()
    schemas.foreach { case (seg, sch) =>
      sch.fields.foreach { f =>
        seen.get(f.name) match {
          case Some((dt, firstSeg)) =>
            require(dt == f.dataType,
              s"mergeSchema on $tableDir: column '${f.name}' is $dt in " +
                s"$firstSeg but ${f.dataType} in $seg — a column-TYPE " +
                "change is not schema evolution; rewrite the table")
          case None => seen(f.name) = (f.dataType, seg); ()
        }
      }
    }
  }

  /** Latest committed version, if any. */
  def latestVersion(tableDir: String): Option[Int] =
    versions(tableDir).lastOption

  /** The commit log, oldest first: (version, adds, removes,
    * dataChange) per manifest — Delta's DESCRIBE HISTORY reduced to
    * what the log actually records. Driver-side JSON reads; O(history
    * length), which the manifest-per-commit design keeps tiny. */
  def history(tableDir: String): Seq[(Int, Seq[String], Seq[String], Boolean)] =
    versions(tableDir).map { v =>
      val (adds, removes, dataChange) = readManifest(tableDir, v)
      (v, adds, removes, dataChange)
    }

  // ---- merge-on-read row-level deletes ----------------------------
  //
  // The Delta/Iceberg MoR discipline reduced to its core: a DELETE
  // commits a `deletes__seg<N>` segment holding ONLY the doomed keys
  // (O(deleted keys), never a data rewrite); reads subtract it with a
  // version-aware anti-join — a tombstone applies ONLY to data
  // segments committed BEFORE it, so a later re-insert of the same
  // key survives; compaction applies the tombstones physically and
  // retires them in one atomic commit, with every pre-compaction
  // version still snapshot-readable.

  /** The live segments as of `asOf` WITH the version that added each —
    * the sequencing information MoR reads need. Folds from the newest
    * checkpoint carrying a "liveV" array (the set plus add versions;
    * older checkpoints predate the field and fall back to a full
    * manifest replay), so the read cost is O(CheckpointEvery)
    * manifests at any history length — the same discipline as
    * [[liveSegments]]. */
  def liveSegmentsWithVersion(tableDir: String,
      asOf: Int): Seq[(String, Int)] = {
    val vs = versions(tableDir)
    require(vs.contains(asOf), s"version $asOf not in $vs")
    foldSegmentsWithVersion(tableDir, asOf)
  }

  private def foldSegmentsWithVersion(tableDir: String,
      asOf: Int): Seq[(String, Int)] = {
    val live = scala.collection.mutable.LinkedHashMap[String, Int]()
    val base = checkpointVersions(tableDir).filter(_ <= asOf).reverse
      .collectFirst(Function.unlift { bv =>
        scala.util.Try {
          val body = new String(Files.readAllBytes(
            logDir(tableDir).resolve(s"ckpt-v$bv.json")),
            StandardCharsets.UTF_8)
          jsonArrOpt(body, "liveV").map(_.map { e =>
            val at = e.lastIndexOf('@')
            e.substring(0, at) -> e.substring(at + 1).toInt
          })
        }.toOption.flatten.map(bv -> _)
      })
    base.foreach { case (_, segs) => segs.foreach(live += _) }
    versions(tableDir)
      .filter(v => v <= asOf && base.forall(v > _._1)).foreach { v =>
      val (adds, removes, _) = readManifest(tableDir, v)
      adds.foreach(live += _ -> v)
      removes.foreach { r =>
        require(live.contains(r), s"manifest v$v removes unknown segment $r")
        live -= r
      }
    }
    live.toSeq
  }

  /** Family prefix of tombstone segments. */
  val DeletesFamily = "deletes"

  /** The segment families PLAIN (non-index-store) tables write — the
    * format writer (`write__`), the streaming ledger (`batch__`),
    * compaction (`compact__`), [[restore]]'s materialize path
    * (`restore__`), [[convertInPlace]] (`convert__`) and [[cloneTable]]
    * (`clone__`). Whole-table verbs (OPTIMIZE's fold, ZORDER, RESTORE,
    * CLONE) are safe exactly on stores whose live families all come
    * from this set; an index store's families must never merge. */
  val PlainFamilies: Set[String] =
    Set("batch", "write", "compact", "restore", "convert", "clone")

  /** The family names this library's INDEX stores write (IVF/PQ/LSH
    * vector indexes, the BM25 text index, the dedup store). Their
    * names are load-bearing — readers address families by prefix — so
    * whole-table verbs that rename or merge segments ([[restore]]'s
    * materialize path, [[cloneTable]]) refuse stores carrying any of
    * them; arbitrary OTHER family names (hand-committed segments) are
    * plain data and stay eligible. */
  val IndexStoreFamilies: Set[String] =
    Set("banded", "buckets", "centroids", "codebook", "codes", "docs",
      "pairs", "postings", "pqposts", "stats")

  /** Commit a row-level DELETE: `keys` (the key columns only) lands as
    * one tombstone segment behind one manifest — O(deleted keys) work
    * at any table size. The delete applies to every data segment live
    * BEFORE this commit and to nothing after it. */
  def commitDeletes(keys: DataFrame, tableDir: String): Int = {
    val seg = s"${DeletesFamily}__seg${versions(tableDir).size}"
    keys.write.mode("overwrite").parquet(s"$tableDir/$seg")
    commit(tableDir, adds = Seq(seg))
  }

  /** Merge-on-read snapshot at `asOf`: data segments minus the
    * tombstones that postdate them. One version-aware anti-join —
    * data rows carry their segment's add version, tombstones theirs,
    * and a row dies iff SOME live tombstone matches its key AND was
    * committed after the row's segment (so re-inserted keys survive
    * their older tombstones). With no live tombstones this is exactly
    * [[snapshot]]. The join's build side is the tombstone set —
    * deleted-key-cardinality, broadcastable in the common case. */
  def snapshotMoR(spark: SparkSession, tableDir: String, asOf: Int,
      keyCols: Seq[String], mergeSchema: Boolean = false,
      keepSeg: String => Boolean = _ => true): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(keyCols.nonEmpty, "snapshotMoR needs at least one key column")
    // keepSeg prunes DATA segments only (stats-based skipping: a
    // pruned segment provably holds no filter-matching rows, and
    // tombstones only ever REMOVE rows, so the prune stays sound);
    // tombstone segments always participate in the anti-join.
    val (delSegs, dataSegs0) = liveSegmentsWithVersion(tableDir, asOf)
      .partition(_._1.startsWith(s"${DeletesFamily}__"))
    val dataSegs = dataSegs0.filter(s => keepSeg(s._1))
    require(dataSegs.nonEmpty, s"version $asOf of $tableDir has no data segments")
    val renames = renamedColumns(tableDir).filter(_._3 <= asOf)
    val perSeg = dataSegs.map { case (s, v) =>
      s -> applyRenames(attachParts(spark.read.parquet(s"$tableDir/$s"),
        segmentParts(tableDir, s)), renames, v, asOf)
        .withColumn("__v", lit(v))
    }
    if (mergeSchema)
      checkMergeable(tableDir, perSeg.map { case (s, df) =>
        s -> df.drop("__v").schema })
    val data = perSeg.map(_._2)
      .reduce(_.unionByName(_, allowMissingColumns = mergeSchema))
    if (delSegs.isEmpty) data.drop("__v")
    else {
      val dels = delSegs.map { case (s, v) =>
        spark.read.parquet(s"$tableDir/$s")
          .select(keyCols.map(col): _*).withColumn("__dv", lit(v))
      }.reduce(_.unionByName(_))
        .withColumnsRenamed(keyCols.map(k => k -> s"__del_$k").toMap)
      val cond = keyCols.map(k => data(k) === dels(s"__del_$k"))
        .reduce(_ && _) && dels("__dv") > data("__v")
      data.join(dels, cond, "left_anti").drop("__v")
    }
  }

  /** Apply the tombstones physically — the MoR OPTIMIZE: fold the
    * current merge-on-read snapshot into ONE clean data segment and
    * retire every live data + tombstone segment in a single atomic
    * commit. Old segments stay on disk, so every pre-compaction
    * version (including its deletes) remains [[snapshotMoR]]-readable.
    * Returns the committed version. */
  def compactMoR(spark: SparkSession, tableDir: String,
      keyCols: Seq[String]): Int = {
    val latest = latestVersion(tableDir)
      .getOrElse(sys.error(s"compactMoR on empty table $tableDir"))
    val old = liveSegments(tableDir, latest)
    val seg = s"compact__seg${versions(tableDir).size}"
    snapshotMoR(spark, tableDir, latest, keyCols)
      .write.mode("overwrite").parquet(s"$tableDir/$seg")
    // carry the retired segments' stats forward so the compacted
    // segment stays prunable — OPTIMIZE must not end data skipping
    mergeSegmentStats(tableDir, old, seg)
    // partition attribution carries too when it is unambiguous: if
    // EVERY folded data segment records the same partition value-set,
    // the fold stays inside one leaf and its identity must survive
    // (folding a single-leaf table must not demote it to
    // unpartitioned). Mixed value-sets widen the identity and carry
    // nothing — but whole-table folds of partitioned tables go
    // through [[compactAllPartitionsMoR]], which never mixes leaves.
    val oldParts = old.filterNot(_.startsWith(s"${DeletesFamily}__"))
      .map(segmentParts(tableDir, _))
    oldParts.filter(_.exists(_.nonEmpty)).map(_.get).distinct match {
      case Seq(one) if oldParts.forall(_.isDefined) =>
        installSidecar(tableDir, s"parts-$seg.json",
          s"""{"cols":[${one.map { case (c, v, t) =>
            s"""{"name":"${jsonEsc(c)}","value":"${jsonEsc(v)}",""" +
              s""""type":"$t"}""" }.mkString(",")}]}""")
      case _ => ()
    }
    // maintenance, not data: the before- and after-snapshots hold the
    // same rows (tombstones applied physically), so incremental
    // consumers step over this commit instead of failing
    commit(tableDir, adds = Seq(seg), removes = old, dataChange = false)
  }

  /** The CLUSTERED MoR OPTIMIZE — `OPTIMIZE ... ZORDER BY`: fold the
    * current merge-on-read snapshot into ONE segment laid out on the
    * Morton curve of `zCols` ([[ClusteredWriter.writeZOrdered]]:
    * `nFiles` range-partitioned, in-partition-sorted part files, each
    * covering a narrow z-range), and retire every live data +
    * tombstone segment in a single atomic commit. Same contract as
    * [[compactMoR]] — history stays readable, dataChange=false — plus
    * the layout work: after this, a scan filtered on ANY clustered
    * column prunes most part files via parquet row-group min/max
    * (pushed filters), which at 100 TB is the difference between a
    * full-segment read and a few row groups. Stats sidecars are
    * RECOMPUTED over the folded rows for every previously-tracked
    * column plus `zCols` (the rewrite already reads every row, so the
    * recompute is tighter than a carry-forward union and free by
    * comparison). Returns the committed version. */
  def compactZorder(spark: SparkSession, tableDir: String,
      keyCols: Seq[String], zCols: Seq[String], nFiles: Int = 8): Int = {
    require(zCols.nonEmpty, "compactZorder needs at least one cluster column")
    val latest = latestVersion(tableDir)
      .getOrElse(sys.error(s"compactZorder on empty table $tableDir"))
    val old = liveSegments(tableDir, latest)
    val seg = s"compact__seg${versions(tableDir).size}"
    ClusteredWriter.writeZOrdered(
      snapshotMoR(spark, tableDir, latest, keyCols),
      s"$tableDir/$seg", nFiles, zCols)
    val tracked = old.filterNot(_.startsWith(s"${DeletesFamily}__"))
      .flatMap(s => segmentStats(tableDir, s).map(_.keySet).getOrElse(Set.empty))
    writeSegmentStats(spark, tableDir, seg, (tracked ++ zCols).distinct)
    // blooms carry as the union of the retired filters (subset-sound)
    mergeSegmentBlooms(tableDir,
      old.filterNot(_.startsWith(s"${DeletesFamily}__")), seg)
    commit(tableDir, adds = Seq(seg), removes = old, dataChange = false)
  }

  /** PARTITION-SCOPED MoR OPTIMIZE — `OPTIMIZE t WHERE <partition
    * predicate>`: compact only the live data segments whose recorded
    * partition values satisfy every given (column = value) pair,
    * leaving cold partitions' segments (and their inodes) untouched —
    * at 100 TB the maintenance verb is "fold the hot day", never
    * "rewrite the table". Segments fold PER DISTINCT partition
    * value-set (one compacted segment per leaf, its `parts-` sidecar
    * carried verbatim): folding across leaves would widen a segment's
    * partition identity and silently break dynamic partition
    * overwrite's exact value-set retirement. Tombstones are applied
    * to the folded rows (version-aware MoR subtraction) but stay LIVE
    * — they still mask every other partition's older segments; the
    * folded segments commit at a newer version, so the applied
    * tombstones no longer touch them. dataChange=false: the before-
    * and after-snapshots hold the same rows, and incremental
    * consumers step over the commit. Segments without partition
    * metadata cannot be attributed and fail loudly. Returns one
    * (partitionValues, committedVersion) per folded leaf — leaves
    * already down to one segment are skipped (idempotent). */
  def compactPartitionsMoR(spark: SparkSession, tableDir: String,
      keyCols: Seq[String],
      pred: Seq[(String, String)]): Seq[(Seq[(String, String)], Int)] = {
    require(pred.nonEmpty, "compactPartitionsMoR needs at least one " +
      "partition (column = value) pair")
    val latest = latestVersion(tableDir)
      .getOrElse(sys.error(s"OPTIMIZE on empty table $tableDir"))
    val dataLive = liveSegments(tableDir, latest)
      .filterNot(_.startsWith(s"${DeletesFamily}__"))
    val withParts = dataLive.map(s => s -> segmentParts(tableDir, s))
    val matched = withParts.filter { case (s, ps) =>
      pred.forall { case (c, v) =>
        ps.exists(_.exists(p => p._1 == c && p._2 == v)) }
    }
    val unattributed = withParts.collect {
      case (s, None) => s
    }
    require(unattributed.isEmpty,
      s"OPTIMIZE WHERE on $tableDir: segments $unattributed carry no " +
        "partition metadata — partition-scoped maintenance needs a " +
        "fully partitioned table (rewrite with option(partitionBy=…) " +
        "or run OPTIMIZE … REPARTITION BY first)")
    // a predicate naming a NON-PARTITION column would silently match
    // nothing and return an empty fold — refuse it loudly instead:
    // every predicate column must appear among the live segments'
    // recorded partition columns
    val recordedCols = withParts
      .flatMap(_._2.toSeq.flatten.map(_._1)).toSet
    val badCols = pred.map(_._1).filterNot(recordedCols)
    require(badCols.isEmpty,
      s"OPTIMIZE WHERE on $tableDir: ${badCols.distinct.mkString(", ")} " +
        s"is not a partition column of the table (partition columns: " +
        s"${recordedCols.toSeq.sorted.mkString(", ")}) — partition-" +
        "scoped maintenance folds by partition value only")
    val toFold = matched.groupBy(_._2.get.map(p => (p._1, p._2)))
      .toSeq.sortBy(_._1.map(_._2).mkString(" "))
      .filter(_._2.size > 1) // a single-segment leaf is already folded
      .map { case (vals, group) => (vals, group.map(_._1)) }
    // leaf folds touch DISJOINT segments, so their snapshot+write jobs
    // submit CONCURRENTLY (a WHERE matching hundreds of leaves must
    // not serialize hundreds of Spark jobs); the per-leaf COMMITS stay
    // sequential in leaf order — each leaf is its own atomic manifest,
    // a crash between two leaves the documented contract
    val folded = foldLeavesConcurrently(spark, tableDir, latest, keyCols,
      toFold)
    folded.map { case (vals, seg, segs) =>
      (vals, commit(tableDir, adds = Seq(seg), removes = segs,
        dataChange = false))
    }
  }

  /** Write one compacted segment PER LEAF, concurrently — the shared
    * execution half of [[compactPartitionsMoR]] and
    * [[compactAllPartitionsMoR]]: each leaf's merge-on-read snapshot
    * (scoped to exactly its segments) lands as `compact__seg<base>p<i>`
    * with the leaf's `parts-` sidecar carried VERBATIM and its range
    * stats merged. The leaves' segment sets are disjoint by
    * construction, so the Spark jobs are safely concurrent; nothing
    * commits here — the caller owns the manifest(s). Returns
    * (partitionValues, newSegment, retiredSegments) in leaf order. */
  private def foldLeavesConcurrently(spark: SparkSession, tableDir: String,
      latest: Int, keyCols: Seq[String],
      leaves: Seq[(Seq[(String, String)], Seq[String])])
      : Seq[(Seq[(String, String)], String, Seq[String])] = {
    if (leaves.isEmpty) return Seq.empty
    val base = versions(tableDir).size
    val named = leaves.zipWithIndex.map { case ((vals, segs), i) =>
      (vals, segs, s"compact__seg${base}p$i")
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, named.size))
    try {
      val tasks = named.map { case (vals, segs, seg) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            snapshotMoR(spark, tableDir, latest, keyCols,
              keepSeg = segs.toSet)
              .write.mode("overwrite").parquet(s"$tableDir/$seg")
            // the leaf's partition identity carries verbatim (same
            // values, same types — read from the first retired
            // sidecar), and the range stats union keeps the folded
            // segment prunable
            val src = segmentParts(tableDir, segs.head).get
            installSidecar(tableDir, s"parts-$seg.json",
              s"""{"cols":[${src.map { case (c, v, t) =>
                s"""{"name":"${jsonEsc(c)}","value":"${jsonEsc(v)}",""" +
                  s""""type":"$t"}""" }.mkString(",")}]}""")
            mergeSegmentStats(tableDir, segs, seg)
          }
        })
      }
      tasks.foreach(_.get()) // propagate the first failure
    } finally pool.shutdown()
    named.map { case (vals, segs, seg) => (vals, seg, segs) }
  }

  /** `OPTIMIZE … ZORDER BY` for PARTITIONED tables — Delta's
    * zorder-within-partitions: every leaf rewrites to ONE segment laid
    * out on the Morton curve of `zCols` ([[ClusteredWriter
    * .writeZOrdered]] per leaf, concurrent across leaves — disjoint
    * segments), parts sidecars carried VERBATIM, range stats carried
    * as the subset-sound union, tombstones applied and RETIRED (a
    * zorder is always a full rewrite of every leaf), all behind ONE
    * atomic dataChange=false commit. The intra-segment pruning
    * benefit needs no sidecar: the z-layout clusters rows so parquet
    * row-group min/max serve selective scans on ANY clustered column;
    * the segment-level sidecars keep partition pruning working
    * exactly as before. Unattributed segments refuse loudly, naming
    * the repartition verb. Returns one (partitionValues, version) per
    * leaf (one shared commit version). */
  def compactZorderAllPartitions(spark: SparkSession, tableDir: String,
      keyCols: Seq[String], zCols: Seq[String],
      nFiles: Int = 8): Seq[(Seq[(String, String)], Int)] = {
    require(zCols.nonEmpty, "ZORDER BY needs at least one column")
    val latest = latestVersion(tableDir)
      .getOrElse(sys.error(s"OPTIMIZE on empty table $tableDir"))
    val (delSegs, dataSegs) = liveSegmentsWithVersion(tableDir, latest)
      .partition(_._1.startsWith(s"${DeletesFamily}__"))
    val withParts = dataSegs.map { case (s, v) =>
      (s, v, segmentParts(tableDir, s)) }
    val unattributed = withParts.collect { case (s, _, None) => s }
    require(unattributed.isEmpty,
      s"partitioned ZORDER on $tableDir: segments $unattributed carry " +
        "no partition metadata — run OPTIMIZE … REPARTITION BY first")
    val empties = withParts.collect {
      case (s, _, Some(ps)) if ps.isEmpty => s }
    val groups = withParts
      .collect { case (s, _, Some(ps)) if ps.nonEmpty => (s, ps) }
      .groupBy(_._2.map(p => (p._1, p._2)))
      .toSeq.sortBy(_._1.map(_._2).mkString(" "))
      .map { case (vals, group) => (vals, group.map(_._1)) }
    require(groups.nonEmpty, s"ZORDER on $tableDir: no data to lay out")
    val base = versions(tableDir).size
    val named = groups.zipWithIndex.map { case ((vals, segs), i) =>
      (vals, segs, s"compact__seg${base}z$i") }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, named.size))
    try {
      named.map { case (vals, segs, seg) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            ClusteredWriter.writeZOrdered(
              snapshotMoR(spark, tableDir, latest, keyCols,
                keepSeg = segs.toSet),
              s"$tableDir/$seg", nFiles, zCols)
            val src = segmentParts(tableDir, segs.head).get
            installSidecar(tableDir, s"parts-$seg.json",
              s"""{"cols":[${src.map { case (c, v, t) =>
                s"""{"name":"${jsonEsc(c)}","value":"${jsonEsc(v)}",""" +
                  s""""type":"$t"}""" }.mkString(",")}]}""")
            mergeSegmentStats(tableDir, segs, seg)
          }
        })
      }.foreach(_.get())
    } finally pool.shutdown()
    val v = commit(tableDir,
      adds = named.map(_._3),
      removes = named.flatMap(_._2) ++ delSegs.map(_._1) ++ empties,
      dataChange = false)
    named.map { case (vals, _, _) => (vals, v) }
  }

  /** Whole-table OPTIMIZE for PARTITIONED tables — the partition-
    * preserving fold: every leaf with more than `leafThreshold` live
    * segments folds to ONE segment per leaf (its `parts-` sidecar
    * carried verbatim), behind ONE atomic dataChange=false commit —
    * never [[compactMoR]]'s single unpartitioned segment, which would
    * destroy the partition identity dynamic overwrite and `OPTIMIZE …
    * WHERE` depend on: routine maintenance must not break the layout
    * verbs. Leaf folds run CONCURRENTLY (disjoint segments).
    *
    * Tombstones: when they apply (`leafThreshold <= 1` — an explicit
    * OPTIMIZE — or the deletes family itself is over threshold, or
    * some leaf folds anyway), every leaf a tombstone masks is folded
    * too (the MoR subtraction lands physically) and the tombstones
    * RETIRE in the same commit; unmasked-unfolded leaves are
    * untouched, which retirement cannot affect. Zero-row empty-batch
    * artifacts (empty `parts-` markers) retire opportunistically
    * whenever a commit happens anyway. Unattributed segments refuse
    * loudly, naming the repartition verb. Idempotent: a fully-folded
    * tombstone-free table commits nothing and returns empty. Returns
    * one (partitionValues, version) per folded leaf (all sharing the
    * one commit's version), plus a `(Seq.empty, version)` marker when
    * a commit happened with no leaf folds (tombstone/empty-artifact
    * retirement only). */
  def compactAllPartitionsMoR(spark: SparkSession, tableDir: String,
      keyCols: => Seq[String],
      leafThreshold: Int = 1): Seq[(Seq[(String, String)], Int)] = {
    require(leafThreshold >= 1, s"leafThreshold must be >= 1")
    val latest = latestVersion(tableDir)
      .getOrElse(sys.error(s"OPTIMIZE on empty table $tableDir"))
    val (delSegs, dataSegs) = liveSegmentsWithVersion(tableDir, latest)
      .partition(_._1.startsWith(s"${DeletesFamily}__"))
    val withParts = dataSegs.map { case (s, v) =>
      (s, v, segmentParts(tableDir, s)) }
    val unattributed = withParts.collect { case (s, _, None) => s }
    require(unattributed.isEmpty,
      s"partitioned OPTIMIZE on $tableDir: segments $unattributed carry " +
        "no partition metadata — rewrite with option(partitionBy=…) or " +
        "run OPTIMIZE … REPARTITION BY first")
    val empties = withParts.collect {
      case (s, _, Some(ps)) if ps.isEmpty => s }
    val groups = withParts
      .collect { case (s, v, Some(ps)) if ps.nonEmpty => (s, v, ps) }
      .groupBy(_._3.map(p => (p._1, p._2)))
      .toSeq.sortBy(_._1.map(_._2).mkString(" "))
    val over = groups.filter(_._2.size > leafThreshold).map(_._1).toSet
    val masked = groups.filter(_._2.exists { case (_, v, _) =>
      delSegs.exists(_._2 > v) }).map(_._1).toSet
    val applyTomb = delSegs.nonEmpty &&
      (leafThreshold <= 1 || delSegs.size > leafThreshold || over.nonEmpty)
    val foldKeys = if (applyTomb) over ++ masked else over
    val toFold = groups.filter(g => foldKeys(g._1))
      .map { case (vals, group) => (vals, group.map(_._1)) }
    val retiringTombs = if (applyTomb) delSegs.map(_._1) else Seq.empty
    if (toFold.isEmpty && retiringTombs.isEmpty) return Seq.empty
    // keyCols is by-name and forced only HERE, when a fold actually
    // runs — callers may derive keys from the tombstone segments'
    // schemas, a read a no-op maintenance pass must never pay
    val folded =
      if (toFold.isEmpty) Seq.empty
      else foldLeavesConcurrently(spark, tableDir, latest, keyCols, toFold)
    val v = commit(tableDir,
      adds = folded.map(_._2),
      removes = folded.flatMap(_._3) ++ retiringTombs ++ empties,
      dataChange = false)
    if (folded.nonEmpty) folded.map { case (vals, _, _) => (vals, v) }
    else Seq((Seq.empty, v))
  }

  /** In-place plain→partitioned migration — `OPTIMIZE … REPARTITION
    * BY`: rewrite every live UNATTRIBUTED data segment (no `parts-`
    * sidecar — plain writes, whole-table folds, adopted flat layouts)
    * into one segment PER PARTITION VALUE behind ONE atomic
    * dataChange=false commit, making the "fully partitioned"
    * precondition of dynamic partition overwrite and `OPTIMIZE …
    * WHERE` reachable for legacy tables. Already-attributed segments
    * (and their inodes) are untouched — the verb rewrites exactly the
    * segments that block the layout verbs, O(unattributed rows).
    * Tombstones are applied to the rewritten rows (version-aware MoR —
    * the new segments commit after every tombstone, so none can
    * re-mask them) and stay LIVE for the untouched segments. Stats
    * sidecars track the union of the retired segments' recorded
    * columns plus the partition point ranges; partition column TYPES
    * come from the data schema. Time travel to every pre-repartition
    * version stays intact (old segments are retired, not deleted).
    *
    * LAYOUT EVOLUTION: on a table whose live leaves are already laid
    * out by DIFFERENT columns, the verb becomes the full-rewrite move
    * `PARTITIONED BY (a)` → `(b)` — every live data segment rewrites
    * under the new layout (leaf boundaries change; nothing cheaper is
    * sound), tombstones apply and retire, one atomic
    * dataChange=false commit, old versions still readable. The
    * "one table, one layout" invariant holds through the change.
    *
    * Returns None when the table is already fully partitioned BY THE
    * REQUESTED columns, else (newSegments, committedVersion). */
  def repartitionTable(spark: SparkSession, tableDir: String,
      partitionCols: Seq[String],
      keyCols: Seq[String]): Option[(Seq[String], Int)] = {
    require(partitionCols.nonEmpty,
      "repartitionTable needs at least one partition column")
    val latest = latestVersion(tableDir)
      .getOrElse(sys.error(s"REPARTITION on empty table $tableDir"))
    val allLive = liveSegments(tableDir, latest)
    val (delSegs, dataLive) =
      allLive.partition(_.startsWith(s"${DeletesFamily}__"))
    val recorded = dataLive.flatMap(s => segmentParts(tableDir, s))
      .filter(_.nonEmpty).map(_.map(_._1)).distinct
    // LAYOUT EVOLUTION: live leaves laid out by (a), the verb asks for
    // (b) — a FULL REWRITE of every live data segment under the new
    // layout (there is no cheaper move: the leaf boundaries change),
    // behind one atomic dataChange=false commit. Tombstones apply
    // (the rewrite reads every row anyway) and retire with it; every
    // pre-evolution version stays time-travelable. The "one table,
    // one layout" invariant holds THROUGH the change: after the
    // commit exactly one layout is live.
    if (recorded.nonEmpty && !(recorded.size == 1 &&
        recorded.head == partitionCols)) {
      val rows = snapshotMoR(spark, tableDir, latest, keyCols,
        mergeSchema = true)
      partitionCols.foreach(c => require(rows.columns.contains(c),
        s"REPARTITION BY on $tableDir: '$c' is not a column of the " +
          s"table (${rows.columns.toSeq})"))
      val tracked = dataLive
        .flatMap(s => segmentStats(tableDir, s).map(_.keySet)
          .getOrElse(Set.empty)).distinct
      val segs = writePartitionedSegments(rows, tableDir, partitionCols,
        s"compact__seg${versions(tableDir).size}m",
        statsCols = tracked.filterNot(partitionCols.contains))
      val v = commit(tableDir, adds = segs,
        removes = dataLive ++ delSegs, dataChange = false)
      return Some((segs, v))
    }
    val unattributed =
      dataLive.filter(s => segmentParts(tableDir, s).isEmpty)
    if (unattributed.isEmpty) return None
    val rows = snapshotMoR(spark, tableDir, latest, keyCols,
      mergeSchema = true, keepSeg = unattributed.toSet)
    partitionCols.foreach(c => require(rows.columns.contains(c),
      s"REPARTITION BY on $tableDir: '$c' is not a column of the " +
        s"table (${rows.columns.toSeq})"))
    val tracked = unattributed
      .flatMap(s => segmentStats(tableDir, s).map(_.keySet)
        .getOrElse(Set.empty)).distinct
    val segs = writePartitionedSegments(rows, tableDir, partitionCols,
      s"compact__seg${versions(tableDir).size}r",
      statsCols = tracked.filterNot(partitionCols.contains))
    val v = commit(tableDir, adds = segs, removes = unattributed,
      dataChange = false)
    Some((segs, v))
  }

  /** Incremental-consumer read: the rows ADDED between `fromV`
    * (exclusive; −1 = since table creation) and `toV` (inclusive) —
    * the read half of the [[appendBatch]] write half, and the txlog
    * form of the e19/e24 landing-file feeds: a consumer remembers the
    * last version it folded and scans ONLY the segments newer
    * commits added, O(delta) at any table size. Append-only by
    * contract: if any retained segment was REMOVED across the span
    * (a compaction or CDC rewrite landed), the delta is not
    * expressible as added rows and the consumer must re-snapshot —
    * enforced loudly here rather than returning double-counted
    * rows. */
  def changes(spark: SparkSession, tableDir: String, fromV: Int,
      toV: Int): DataFrame = {
    require(fromV < toV, s"need fromV < toV, got $fromV >= $toV")
    val vs = versions(tableDir)
    require(vs.contains(toV), s"version $toV not in $vs")
    require(fromV < 0 || vs.contains(fromV), s"version $fromV not in $vs")
    refuseRenameInSpan(tableDir, fromV, toV)
    // per-manifest walk, maintenance commits (dataChange=false:
    // compaction/OPTIMIZE) stepped over — their rewritten rows were
    // already delivered by the data commits that first added them, so
    // neither their adds nor their removes are part of the delta. A
    // DATA commit that removes segments is a genuine history rewrite
    // and fails loudly.
    val span = vs.filter(v => v > fromV && v <= toV)
      .map(v => v -> readManifest(tableDir, v))
    val dataSpan = span.filter(_._2._3)
    val removed = dataSpan.flatMap(_._2._2)
    require(removed.isEmpty,
      s"versions ${fromV + 1}..$toV of $tableDir removed segments " +
        s"$removed in a data commit (history rewrite): the span is not " +
        "append-only — re-snapshot instead of reading changes")
    val added = dataSpan.flatMap(_._2._1)
    require(added.nonEmpty,
      s"versions ${fromV + 1}..$toV of $tableDir added no data-change " +
        "segments")
    require(!added.exists(_.startsWith(s"${DeletesFamily}__")),
      s"versions ${fromV + 1}..$toV of $tableDir committed row-level " +
        "deletes: the delta is not append-only — re-snapshot (snapshotMoR) " +
        "instead of reading changes")
    val parts = added.map(s => s -> segmentParts(tableDir, s))
    if (parts.forall(_._2.isEmpty))
      spark.read.parquet(added.map(s => s"$tableDir/$s"): _*)
    else parts.map { case (s, p) =>
      attachParts(spark.read.parquet(s"$tableDir/$s"), p)
    }.reduce(_.unionByName(_))
  }

  /** Process-local memo for [[versionAddedBytes]]: a committed
    * version's added segments are immutable, so its byte size is
    * computed once per (table, version) however often the streaming
    * source's admission control consults it. Keyed by (path, v0
    * manifest's filesystem fileKey — the table's creation identity):
    * a table deleted and recreated at the SAME path gets a fresh v0
    * inode, so its entries never collide with the dead table's (which
    * would serve stale byte sizes to admission control). Bounded: the
    * map clears past a cap instead of growing with every table a
    * long-lived JVM ever streamed from — entries recompute cheaply. */
  private val addedBytesMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val AddedBytesMemoCap = 8192

  /** The table-creation identity for memo keys: v0.json's filesystem
    * fileKey (inode) PLUS its mtime — recreating the table at the
    * same path makes a new v0 file; the mtime guards the
    * inode-recycling corner (tmpfs hands a fresh file the dead one's
    * inode, and the manifest bytes are identical). */
  private def creationMarker(tableDir: String): String =
    scala.util.Try {
      val attrs = Files.readAttributes(
        logDir(tableDir).resolve("v0.json"),
        classOf[java.nio.file.attribute.BasicFileAttributes])
      s"${Option(attrs.fileKey).map(_.toString).getOrElse("nokey")}:" +
        s"${attrs.lastModifiedTime.toMillis}"
    }.getOrElse("nov0")

  /** The on-disk bytes a version's commit ADDED — the admission unit
    * for `maxBytesPerTrigger` (Delta's byte-based rate limit reduced
    * to this format's ledger): the sum of the version's added
    * segments' regular-file sizes, 0 for removes-only (maintenance)
    * commits, memoized per (table identity, version). A segment
    * already vacuumed sizes as 0 — by then the span is unreadable
    * anyway and the stream fails on the read, not the admission. */
  def versionAddedBytes(tableDir: String, v: Int): Long = {
    if (addedBytesMemo.size > AddedBytesMemoCap) addedBytesMemo.clear()
    addedBytesMemo.computeIfAbsent(
      s"$tableDir@$v@${creationMarker(tableDir)}", { _ =>
      val (adds, _, _) = readManifest(tableDir, v)
      java.lang.Long.valueOf(adds.map { seg =>
        val d = Paths.get(tableDir, seg)
        if (!Files.isDirectory(d)) 0L
        else {
          val it = Files.list(d)
          try it.iterator()
            .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
            .asScala.filter(Files.isRegularFile(_))
            .map(p => scala.util.Try(Files.size(p)).getOrElse(0L)).sum
          finally it.close()
        }
      }.sum)
    })
  }

  /** Incremental reads cannot cross a RENAME COLUMN anchor: segments
    * added before it store the old physical name, the consumer's
    * schema expects the head's logical one — the span's rows are not
    * name-consistent, so refuse loudly (re-snapshot past it, the
    * compaction rule's sibling). Anchors at or below `fromV` are fine:
    * every span segment postdates them and carries the new name. */
  private def refuseRenameInSpan(tableDir: String, fromV: Int,
      toV: Int): Unit = {
    val crossing = renamedColumns(tableDir)
      .filter(r => r._3 > fromV && r._3 <= toV)
    require(crossing.isEmpty,
      s"versions ${fromV + 1}..$toV of $tableDir cross RENAME COLUMN " +
        s"anchors ${crossing.map(r => s"${r._1}->${r._2}@v${r._3}")
          .mkString(", ")}: the span's rows are not name-consistent — " +
        "re-snapshot instead of reading changes")
  }

  /** The versions in (`fromV`, `toV`] whose commits CHANGED data —
    * what an incremental consumer must decide emptiness by: a span
    * holding only maintenance commits (dataChange=false) carries no
    * delta, and the streaming source emits an empty micro-batch for
    * it instead of calling [[changes]]/[[changesCdf]] (which require
    * a non-empty delta). */
  def dataChangeVersions(tableDir: String, fromV: Int, toV: Int): Seq[Int] =
    versions(tableDir).filter(v => v > fromV && v <= toV)
      .filter(v => readManifest(tableDir, v)._3)

  /** Change-data-feed read: every change the span (`fromV`, `toV`]
    * applied, as full rows tagged `_change_type` ∈ {insert, delete}
    * and `_commit_version` — Delta CDF's shape, built entirely from
    * segments the log already writes, giving incremental consumers a
    * path THROUGH delete-carrying spans where [[changes]] must fail
    * loudly (the loud failure stays the default; this read is the
    * opt-in). Insert rows are the span's added data segments; delete
    * rows are the span's tombstone keys (key columns populated,
    * every other column NULL — a keys-only tombstone records no
    * more). Folding the feed in version order (insert adds the row;
    * a delete at version d kills rows inserted at versions < d with
    * the same key) reproduces [[snapshotMoR]] at `toV` — the
    * version-aware re-insert semantics ride `_commit_version`, so a
    * key deleted at v2 and re-inserted at v3 folds back alive.
    * COMPACTION still fails the read: a span that REMOVED segments
    * rewrote history instead of appending changes, and its delta is
    * not expressible as change rows (re-snapshot past it — exactly
    * Delta CDF's rule for non-CDC rewrites). O(delta): only the
    * span's own segments are scanned, at any table size. */
  def changesCdf(spark: SparkSession, tableDir: String, fromV: Int,
      toV: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(fromV < toV, s"need fromV < toV, got $fromV >= $toV")
    val vs = versions(tableDir)
    require(vs.contains(toV), s"version $toV not in $vs")
    refuseRenameInSpan(tableDir, fromV, toV)
    // maintenance commits (dataChange=false) are stepped over — see
    // [[changes]]; only a DATA commit that removes segments is a
    // genuine rewrite the feed cannot express
    val perV = vs.filter(v => v > fromV && v <= toV)
      .map(v => v -> readManifest(tableDir, v))
      .filter(_._2._3)
    val removed = perV.flatMap(_._2._2)
    require(removed.isEmpty,
      s"versions ${fromV + 1}..$toV of $tableDir removed segments " +
        s"$removed in a data commit (history rewrite): the span's delta " +
        "is not expressible as change rows — re-snapshot instead of " +
        "reading the change feed")
    val added = perV.flatMap { case (v, (adds, _, _)) => adds.map(_ -> v) }
    require(added.nonEmpty,
      s"versions ${fromV + 1}..$toV of $tableDir added no data-change " +
        "segments")
    val (delAdds, dataAdds) =
      added.partition(_._1.startsWith(s"${DeletesFamily}__"))
    // The data schema every change row projects onto. A span crossing
    // a schema-evolution boundary (mergeSchema writes — columns ADDED
    // between segments) merges by name under snapshot's evolution rule
    // (checkMergeable still fails loudly on a type change), and rows
    // from pre-evolution segments null-fill the later columns; a
    // delete-only span takes the live table's merged schema.
    val schema =
      if (dataAdds.nonEmpty) {
        val perSeg = dataAdds.map { case (s, _) =>
          s -> attachParts(spark.read.parquet(s"$tableDir/$s"),
            segmentParts(tableDir, s)).schema }
        checkMergeable(tableDir, perSeg)
        val seen = scala.collection.mutable.LinkedHashMap[String,
          org.apache.spark.sql.types.StructField]()
        perSeg.foreach(_._2.fields.foreach(f =>
          if (!seen.contains(f.name)) seen(f.name) = f))
        org.apache.spark.sql.types.StructType(seen.values.toArray)
      } else snapshot(spark, tableDir, toV, mergeSchema = true).schema
    def project(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      df.select(schema.fields.map { f =>
        if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq: _*)
    }
    val inserts = dataAdds.map { case (s, v) =>
      project(attachParts(spark.read.parquet(s"$tableDir/$s"),
        segmentParts(tableDir, s)))
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(v))
    }
    val deletes = delAdds.map { case (s, v) =>
      project(spark.read.parquet(s"$tableDir/$s"))
        .withColumn("_change_type", lit("delete"))
        .withColumn("_commit_version", lit(v))
    }
    (inserts ++ deletes).reduce(_.unionByName(_))
  }

  /** Delete from disk every data segment that no RETAINED version can
    * reach — Delta's VACUUM reduced to its core, completing the
    * log-structured lifecycle (grow O(delta) → compact → vacuum).
    * Retained = versions `keepFrom..latest`: a segment is kept iff it
    * is live at any of them. Everything else goes — segments only
    * historical versions referenced (their disk cost is what vacuum
    * exists to reclaim) AND orphan dirs from crashed installs (data
    * written, manifest never committed). The manifest log itself is
    * NEVER deleted: segment names derive from `versions().size`, so
    * dropping manifests would recycle names onto live data; the tiny
    * manifests are the price of collision-free naming, and versions
    * below `keepFrom` simply stop being readable (their snapshot
    * fails on the missing dirs — time travel is bounded by the
    * vacuum horizon, exactly Delta's retention semantics).
    *
    * Contract: a MAINTENANCE operation, single-writer by default — an
    * install racing a vacuum stages its segment dir BEFORE committing
    * the manifest, and to a concurrent vacuum that staged dir is
    * indistinguishable from a crashed install's orphan. `minAgeMs`
    * is the defense when installs can't be quiesced: only directories
    * whose mtime is at least that old are reclaimed (Delta's retention
    * window reduced to its core — an in-flight install's staging is
    * recent BY DEFINITION, while genuine orphans and retired segments
    * age past any reasonable window). The default 0 keeps the strict
    * single-maintainer contract with immediate reclamation.
    * Returns the deleted directory names, sorted. */
  def vacuum(tableDir: String, keepFrom: Int,
      minAgeMs: Long = 0L): Seq[String] = {
    val vs = versions(tableDir)
    require(vs.contains(keepFrom), s"version $keepFrom not in $vs")
    val reachable = vs.filter(_ >= keepFrom)
      .flatMap(v => liveSegments(tableDir, v)).toSet
    val root = new java.io.File(tableDir)
    val now = System.currentTimeMillis()
    val doomed = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .filter(f => now - f.lastModified() >= minAgeMs)
      .map(_.getName)
      .filterNot(n => n == "_txlog" || n == "_meta" || reachable(n))
      .toSeq.sorted
    doomed.foreach { n =>
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(del)
        f.delete(); ()
      }
      del(new java.io.File(root, n))
    }
    doomed
  }

  // ---- point-in-time verbs: restore / timestamp / convert / clone --

  /** A commit's wall-clock time: the manifest file's mtime — exactly
    * Delta's commit-timestamp source (the log never re-writes a
    * manifest, so the install mtime IS the commit time). */
  def commitTimeMillis(tableDir: String, v: Int): Long = {
    mtimeStatCount.incrementAndGet()
    Files.getLastModifiedTime(logDir(tableDir).resolve(s"v$v.json")).toMillis
  }

  /** Observability hook for the timestamp-spine memoization contract:
    * counts manifest mtime stats, so a spec can assert a repeat
    * [[versionAtTimestamp]] call stats only the versions committed
    * since the last call (O(delta), not O(history)). */
  private[graft] val mtimeStatCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Per-table memo of the (version → running-max commit time) spine:
    * manifests are never rewritten, so a version's repaired commit
    * time is immutable once computed — a repeat TIMESTAMP AS OF pays
    * one mtime stat per NEW version, not a re-walk of the whole
    * history. Entries extend monotonically; the map is process-local
    * (the spine rebuilds from disk in a fresh JVM). */
  private val tsSpine =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[(Int, Long)]]()

  /** The repaired (monotone) commit-time spine as of the current
    * version list: memoized prefix + O(new versions) extension.
    * Commit times are non-decreasing in version order by construction
    * (manifests install sequentially); a log COPIED with shuffled
    * mtimes is repaired by taking the running max (Delta's
    * in-commit-timestamp adjustment reduced to its core), so the
    * version→time mapping stays monotonic and well-defined. */
  private def timeSpine(tableDir: String): Vector[(Int, Long)] = {
    val vs = versions(tableDir)
    val cached = Option(tsSpine.get(tableDir)).getOrElse(Vector.empty)
    // the cache is trusted only as a PREFIX of the current version
    // list (versions only ever append; a mismatch means a different
    // table was copied over this path — rebuild from scratch)
    val prefix =
      if (cached.map(_._1) == vs.take(cached.size)) cached else Vector.empty
    var run = prefix.lastOption.map(_._2).getOrElse(Long.MinValue)
    val extended = prefix ++ vs.drop(prefix.size).map { v =>
      run = math.max(run, commitTimeMillis(tableDir, v)); v -> run
    }
    tsSpine.put(tableDir, extended)
    extended
  }

  /** `TIMESTAMP AS OF` resolution: the greatest version whose
    * (repaired, monotone — see [[timeSpine]]) commit time is ≤
    * `tsMillis` — Delta's rule. A timestamp before the first commit
    * fails loudly (there is no table state to read). */
  def versionAtTimestamp(tableDir: String, tsMillis: Long): Int = {
    val fixed = timeSpine(tableDir)
    require(fixed.nonEmpty, s"$tableDir has no commits")
    fixed.filter(_._2 <= tsMillis).lastOption.map(_._1).getOrElse(
      throw new IllegalArgumentException(
        s"timestamp $tsMillis predates the first commit " +
          s"(${fixed.head._2}) of $tableDir — nothing to read"))
  }

  /** The SMALLEST version whose commit time is ≥ `tsMillis` — the
    * START-side timestamp rule for change feeds (Delta's
    * `startingTimestamp`: the first commit at or after the clock
    * reading; the END side uses [[versionAtTimestamp]]'s greatest-≤
    * rule). A timestamp after the last commit fails loudly — there is
    * no change at or after it to read. */
  def versionAtOrAfterTimestamp(tableDir: String, tsMillis: Long): Int = {
    val fixed = timeSpine(tableDir)
    require(fixed.nonEmpty, s"$tableDir has no commits")
    fixed.find(_._2 >= tsMillis).map(_._1).getOrElse(
      throw new IllegalArgumentException(
        s"timestamp $tsMillis postdates the last commit " +
          s"(${fixed.last._2}) of $tableDir — no changes at or after it"))
  }

  /** RESTORE the table's head to its state at `toV`, as ONE new commit
    * — history is never rewritten, so every version (including the
    * ones being undone) stays time-travelable, and the restore itself
    * is one more auditable entry in DESCRIBE HISTORY (Delta's RESTORE
    * semantics).
    *
    * Two execution modes, picked by what correctness allows:
    *
    *  - **metadata** (the common case — target state has no live
    *    tombstones): the commit re-ADDS the target's retired segments
    *    and removes the head's extra ones; O(1) data work at any table
    *    size — at 100 TB this is the whole point. Sound because the
    *    post-restore live set then contains no tombstone, so the MoR
    *    version collapse of re-adding everything at one new version
    *    cannot mis-order a delete against its data.
    *  - **rewrite** (target state HAS live tombstones): re-adding a
    *    tombstone at the restore version would postdate every data
    *    segment and mis-apply (the version-aware rule orders deletes
    *    by commit, and a restore commit is one version) — so the
    *    target state is MATERIALIZED instead: one `restore__` segment
    *    holding `snapshotMoR(toV)`, stats carried as the conservative
    *    union of the target's data-segment sidecars.
    *
    * Restorability is bounded by the vacuum horizon, exactly Delta's
    * rule: a target segment whose directory was reclaimed fails
    * loudly. The commit is a DATA commit that removes segments, so
    * incremental consumers ([[changes]]/[[changesCdf]]/streaming) fail
    * loudly across it and must re-snapshot — a restore is a genuine
    * history rewrite for them. Returns (committedVersion, mode), or
    * None when the head already equals the target state. */
  def restore(spark: SparkSession, tableDir: String, toV: Int,
      keyCols: Seq[String] = Seq.empty): Option[(Int, String)] = {
    val latest = latestVersion(tableDir)
      .getOrElse(sys.error(s"restore on empty table $tableDir"))
    val vs = versions(tableDir)
    require(vs.contains(toV), s"version $toV not in $vs")
    // renames are version-anchored and a restore RE-ANCHORS segments
    // (re-added dirs take the restore commit's version, above every
    // rename) — restoring BELOW a rename anchor would silently flip
    // re-added segments to post-rename mapping while the target state
    // expects pre-rename names: refuse loudly
    val renBelow = renamedColumns(tableDir).filter(_._3 > toV)
    require(renBelow.isEmpty,
      s"restore $tableDir to v$toV: RENAME COLUMN anchors " +
        s"${renBelow.map(r => s"${r._1}->${r._2}@v${r._3}").mkString(", ")} " +
        "postdate the target — rename history cannot re-anchor below " +
        "its commit; restore to a version at or above it, or rewrite " +
        "the table")
    val target = liveSegments(tableDir, toV)
    val cur = liveSegments(tableDir, latest)
    if (target.toSet == cur.toSet) return None
    val missing = target.filterNot(s =>
      Files.isDirectory(Paths.get(tableDir, s)))
    require(missing.isEmpty,
      s"restore $tableDir to v$toV: segments $missing were vacuumed — " +
        "the version is beyond the retention horizon")
    val tombstoned = target.exists(_.startsWith(s"${DeletesFamily}__"))
    val curSet = cur.toSet
    val adds = target.filterNot(curSet)
    // Metadata mode is sound in two cases: the target state has no
    // live tombstones (nothing to mis-order, whatever we re-add), OR
    // the restore re-adds NOTHING (pure removal of head segments —
    // every surviving segment keeps its original commit version, so
    // the target's tombstone-vs-data ordering is untouched: "undo the
    // recent appends while the deletes stay" is O(1) metadata work).
    // Only a restore that must RE-ADD segments into a tombstoned
    // target state materializes.
    if (!tombstoned || adds.isEmpty) {
      val targetSet = target.toSet
      val v = commit(tableDir, adds = adds,
        removes = cur.filterNot(targetSet))
      Some((v, "metadata"))
    } else {
      require(keyCols.nonEmpty,
        s"restore $tableDir to v$toV: the target state carries live " +
          "row-level deletes, so the restore must materialize the MoR " +
          "snapshot — pass the table's key columns")
      val idx = target.map(_.split("__")(0)).distinct
        .filter(IndexStoreFamilies)
      require(idx.isEmpty,
        s"restore $tableDir to v$toV: materializing a tombstoned target " +
          s"would merge index-store families $idx into one segment — " +
          "restore index stores only to tombstone-free versions")
      val targetData = target.filterNot(_.startsWith(s"${DeletesFamily}__"))
      val targetParts = targetData.map(s => s -> segmentParts(tableDir, s))
      val base = versions(tableDir).size
      // zero-row empty-batch markers neither materialize nor re-add —
      // they carry no rows, and the restored state reads identically
      val leafParts = targetParts.collect {
        case (s, Some(ps)) if ps.nonEmpty => (s, ps) }
      if (leafParts.nonEmpty && targetParts.forall(_._2.isDefined)) {
        // PARTITIONED target state: materialize PER LEAF so the
        // restored table keeps its partition identity — a restore
        // that demoted the layout would make dynamic overwrite and
        // OPTIMIZE … WHERE refuse on the very state it recovered
        val groups = leafParts
          .map { case (s, ps) => (s, ps.map(p => (p._1, p._2))) }
          .groupBy(_._2).toSeq.sortBy(_._1.map(_._2).mkString(" "))
        val named = groups.zipWithIndex.map { case ((_, g), i) =>
          (g.map(_._1), s"restore__seg${base}p$i") }
        named.foreach { case (segs, seg) =>
          snapshotMoR(spark, tableDir, toV, keyCols, keepSeg = segs.toSet)
            .write.mode("overwrite").parquet(s"$tableDir/$seg")
          val src = segmentParts(tableDir, segs.head).get
          installSidecar(tableDir, s"parts-$seg.json",
            s"""{"cols":[${src.map { case (c, v, t) =>
              s"""{"name":"${jsonEsc(c)}","value":"${jsonEsc(v)}",""" +
                s""""type":"$t"}""" }.mkString(",")}]}""")
          mergeSegmentStats(tableDir, segs, seg)
        }
        Some((commit(tableDir, adds = named.map(_._2), removes = cur),
          "rewrite"))
      } else {
        val seg = s"restore__seg$base"
        snapshotMoR(spark, tableDir, toV, keyCols)
          .write.mode("overwrite").parquet(s"$tableDir/$seg")
        mergeSegmentStats(tableDir, target, seg)
        Some((commit(tableDir, adds = Seq(seg), removes = cur), "rewrite"))
      }
    }
  }

  /** CONVERT an existing plain-parquet directory into a txlog table
    * IN PLACE, without copying or rewriting a byte of data — Delta's
    * `CONVERT TO DELTA` reduced to this format's invariants: the
    * directory's top-level `*.parquet` part files are HARD-LINKED into
    * a `convert__seg000000` segment directory (same filesystem, O(files)
    * metadata operations, zero data movement — at 100 TB the only
    * acceptable migration cost), the segment commits as v0, and the
    * now-owned loose originals are unlinked (the data survives through
    * the segment's links; a crash between commit and unlink leaves
    * harmless top-level litter the format never reads). Optional
    * `statsCols` records the segment's data-skipping sidecar. Flat
    * directories only (hive-partitioned layouts have per-directory
    * schema semantics this format does not model). Fails loudly if the
    * directory already has a log. Returns (segmentName, filesLinked). */
  def convertInPlace(spark: SparkSession, tableDir: String,
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty): (String, Int) = {
    require(versions(tableDir).isEmpty,
      s"$tableDir is already a txlog table — nothing to convert")
    val root = Paths.get(tableDir)
    require(Files.isDirectory(root), s"$tableDir is not a directory")
    val files = listParquet(root)
    require(files.nonEmpty,
      s"convert $tableDir: no top-level parquet files to adopt" +
        (if (hiveLeaves(root).nonEmpty)
          " (the directory is hive-partitioned — use " +
            "convertPartitionedInPlace)" else ""))
    val seg = "convert__seg000000"
    relinkInto(root.resolve(seg), files)
    writeSegmentStats(spark, tableDir, seg, statsCols)
    writeSegmentBlooms(spark, tableDir, seg, bloomCols)
    commit(tableDir, adds = Seq(seg))
    files.foreach(Files.deleteIfExists)
    (seg, files.size)
  }

  /** CONVERT a HIVE-PARTITIONED parquet directory into a txlog table
    * IN PLACE — the layout-aware sibling of [[convertInPlace]], same
    * zero-copy contract: each `col=value/...` LEAF directory becomes
    * one hard-linked `convert__seg<i>` segment (O(files) metadata
    * operations, zero data movement), all leaves commit as ONE atomic
    * v0 (no reader ever sees a half-adopted table), and the partition
    * values — which hive stores in the DIRECTORY NAMES, not the data
    * files — are recorded per segment in a `_txlog/parts-<seg>.json`
    * sidecar. Reads attach them as literal columns ([[snapshot]] /
    * [[snapshotMoR]] / [[changesCdf]]), so the adopted table reads
    * exactly like the hive layout did; and each partition column also
    * lands in the segment's STATS sidecar as a min=max=value range, so
    * a partition-predicate scan prunes by SEGMENT before any footer is
    * opened — the txlog spelling of hive partition pruning. Null
    * partitions (`__HIVE_DEFAULT_PARTITION__`) are refused loudly.
    * Partition value types are inferred globally (every value of a
    * column parses as a long → long, else string), so one column
    * carries ONE type across segments. Returns (segmentName,
    * filesLinked) per adopted leaf, in segment order. */
  def convertPartitionedInPlace(spark: SparkSession, tableDir: String,
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty): Seq[(String, Int)] = {
    require(versions(tableDir).isEmpty,
      s"$tableDir is already a txlog table — nothing to convert")
    val root = Paths.get(tableDir)
    require(Files.isDirectory(root), s"$tableDir is not a directory")
    val leaves = hiveLeaves(root)
    require(leaves.nonEmpty,
      s"convert $tableDir: no hive-partitioned (col=value) leaf " +
        "directories holding parquet files" +
        (if (listParquet(root).nonEmpty)
          " (the directory is flat — use convertInPlace)" else ""))
    val colSeqs = leaves.map(_._1.map(_._1)).distinct
    require(colSeqs.size == 1,
      s"convert $tableDir: inconsistent partition layouts across " +
        s"leaves: $colSeqs")
    refuseNullPartitions(s"convert $tableDir", leaves)
    val segs = linkLeafSegments(spark, tableDir, leaves,
      i => f"convert__seg$i%06d", statsCols, bloomCols,
      deferStats = true, deferBlooms = true)
    // one grouped aggregation over all adopted files computes every
    // leaf's stats sidecar — O(1) Spark jobs however many leaves;
    // bloom sidecars ride their own single grouped pass
    val ordered = leaves.sortBy(_._1.map(_._2).mkString(" "))
      .zip(segs.map(_._1))
    writeLeafStatsOnePass(spark, tableDir, ordered,
      statsCols, leafPartTypes(leaves, Map.empty))
    writeLeafBloomsOnePass(spark, tableDir, ordered, bloomCols)
    commit(tableDir, adds = segs.map(_._1))
    // The originals are now owned — unlink ONLY the files that were
    // actually hard-linked (the data survives through the segment
    // links) plus their Hadoop `.<name>.crc` checksum shadows (they
    // describe files we now own), then prune directories that emptied
    // out. OTHER non-parquet files and never-adopted leaf directories
    // are NOT ours to destroy: a foreign layout may carry _SUCCESS
    // markers, sidecar metadata, or data the adoption never touched —
    // conversion must leave them exactly where they were.
    leaves.map(_._2).foreach(l => listParquet(l).foreach { p =>
      Files.deleteIfExists(p)
      Files.deleteIfExists(
        p.resolveSibling(s".${p.getFileName.toString}.crc"))
    })
    val it = Files.list(root)
    val topParts =
      try it.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .asScala.filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.contains("=")).toSeq
      finally it.close()
    def pruneEmpty(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory).foreach(pruneEmpty)
      if (Option(f.listFiles()).getOrElse(Array.empty).isEmpty) {
        f.delete(); ()
      }
    }
    topParts.foreach(p => pruneEmpty(p.toFile))
    segs
  }

  /** Adopt hive `col=value` LEAVES as hard-linked segments: one
    * segment per leaf (named by `segName(i)` over the value-ordered
    * leaves), each with a `parts-` sidecar (read-time column
    * attachment), the partition values folded into the STATS sidecar
    * as min=max point ranges (segment-level pruning), and optional
    * statsCols/bloomCols sidecars over the data columns. Shared by
    * [[convertPartitionedInPlace]] (adopting a foreign layout) and
    * the format writer's native partitioned writes (adopting its own
    * staged output). Does NOT commit — the caller owns the one
    * atomic manifest. Returns (segmentName, filesLinked) per leaf. */
  /** One sidecar type per partition column over a whole adoption. The
    * WRITER'S declared schema wins when given (the native partitioned
    * write knows the DataFrame's types — a StringType value '007' must
    * come back as the string '007', never the long 7, and the type
    * must be stable ACROSS batches, which a per-batch directory-name
    * guess is not). String inference over all leaves is the fallback
    * for ADOPTED foreign layouts, where the directory names are the
    * only type evidence that exists. */
  private[sources] def leafPartTypes(
      leaves: Seq[(Seq[(String, String)], java.nio.file.Path)],
      declaredTypes: Map[String, String]): Map[String, String] =
    leaves.head._1.map(_._1).map { c =>
      c -> declaredTypes.getOrElse(c,
        if (leaves.forall { case (pvals, _) =>
          scala.util.Try(pvals.find(_._1 == c).get._2.toLong).isSuccess })
          "long" else "string")
    }.toMap

  private[sources] def linkLeafSegments(spark: SparkSession,
      tableDir: String,
      leaves: Seq[(Seq[(String, String)], java.nio.file.Path)],
      segName: Int => String, statsCols: Seq[String],
      bloomCols: Seq[String],
      declaredTypes: Map[String, String] = Map.empty,
      deferStats: Boolean = false,
      deferBlooms: Boolean = false): Seq[(String, Int)] = {
    val root = Paths.get(tableDir)
    val ptype = leafPartTypes(leaves, declaredTypes)
    leaves.sortBy(_._1.map(_._2).mkString(" "))
      .zipWithIndex.map { case ((pvals, leaf), i) =>
        val seg = segName(i)
        val files = listParquet(leaf)
        relinkInto(root.resolve(seg), files)
        installSidecar(tableDir, s"parts-$seg.json",
          s"""{"cols":[${pvals.map { case (c, v) =>
            s"""{"name":"${jsonEsc(c)}","value":"${jsonEsc(v)}",""" +
              s""""type":"${ptype(c)}"}""" }.mkString(",")}]}""")
        // deferStats/deferBlooms: the caller computes EVERY leaf's
        // sidecar in one grouped aggregation afterwards
        // ([[writeLeafStatsOnePass]] / [[writeLeafBloomsOnePass]])
        // instead of one Spark job per leaf (per column) here
        if (!deferStats) {
          writeSegmentStats(spark, tableDir, seg, statsCols)
          appendConstStats(tableDir, seg,
            pvals.map { case (c, v) => (c, v, ptype(c)) })
        }
        if (!deferBlooms) writeSegmentBlooms(spark, tableDir, seg, bloomCols)
        seg -> files.size
      }
  }

  /** Refuse `__HIVE_DEFAULT_PARTITION__` leaves loudly — a NULL
    * partition value cannot round-trip through the directory-name
    * encoding this format adopts. */
  private[sources] def refuseNullPartitions(where: String,
      leaves: Seq[(Seq[(String, String)], java.nio.file.Path)]): Unit =
    leaves.foreach { case (pvals, leaf) =>
      pvals.foreach { case (c, v) =>
        require(v != "__HIVE_DEFAULT_PARTITION__",
          s"$where: leaf $leaf has a NULL value for partition column " +
            s"'$c' — null partitions are not supported (backfill a " +
            "sentinel value first)")
      }
    }

  /** NATIVE partitioned write — table partitioning for the format's
    * own ingest, not just adopted layouts: the batch is written ONCE
    * through Spark's planner (`partitionBy` into a dot-prefixed
    * staging dir inside the table — one pass, however many partition
    * values), then each staged `col=value` leaf is HARD-LINKED into
    * its own `<baseName>p<i>` segment with the partition value in a
    * `parts-` sidecar and as a min=max point range in the stats
    * sidecar ([[linkLeafSegments]] — the same machinery the
    * partitioned CONVERT uses on foreign layouts). The caller commits
    * ALL returned segments behind ONE manifest, so a reader never
    * sees a half-partitioned batch, and a partition-predicate scan
    * prunes to exactly the touched values' segments before any
    * footer opens — at 100 TB this is the difference between "scan
    * the day" and "scan the table" for every partition-scoped query.
    * An EMPTY batch stages no leaves and falls back to one plain
    * `baseName` segment (schema preserved; the exactly-once ledger
    * still records the batch) carrying an EMPTY `parts-` sidecar
    * (`{"cols":[]}`) — the zero-row segment belongs to no partition
    * value, and the empty marker keeps it from poisoning the
    * fully-partitioned invariant dynamic overwrite and `OPTIMIZE …
    * WHERE` depend on (one empty streaming micro-batch must not make
    * those verbs refuse forever). A crash before the commit leaves the
    * staging dir and half-linked segments as orphans [[vacuum]]
    * reclaims. NULL partition values are refused loudly. Partition
    * column TYPES are taken from `data.schema`, never inferred from
    * the staged directory names — a StringType value '007' reads back
    * as the string '007', and the recorded type stays stable across
    * batches. Returns the segment names to commit. */
  def writePartitionedSegments(data: DataFrame, tableDir: String,
      partitionCols: Seq[String], baseName: String,
      statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty): Seq[String] = {
    require(partitionCols.nonEmpty, "writePartitionedSegments needs " +
      "at least one partition column")
    val declaredTypes = declaredPartTypes(data, tableDir, partitionCols)
    val stage = Paths.get(tableDir, s".stage_${java.util.UUID.randomUUID}")
    try {
      data.write.partitionBy(partitionCols: _*).mode("overwrite")
        .parquet(stage.toString)
      val leaves = hiveLeaves(stage)
      if (leaves.isEmpty) {
        // empty batch: partitionBy wrote no part files — land one
        // plain segment so the schema (and the batch id) still record
        data.write.mode("overwrite").parquet(s"$tableDir/$baseName")
        writeSegmentStats(data.sparkSession, tableDir, baseName, statsCols)
        writeSegmentBlooms(data.sparkSession, tableDir, baseName, bloomCols)
        installSidecar(tableDir, s"parts-$baseName.json", """{"cols":[]}""")
        Seq(baseName)
      } else {
        refuseNullPartitions(s"partitioned write to $tableDir", leaves)
        val linked = linkLeafSegments(data.sparkSession, tableDir, leaves,
          i => s"${baseName}p$i", statsCols, bloomCols,
          declaredTypes, deferStats = true, deferBlooms = true)
        val ordered = leaves.sortBy(_._1.map(_._2).mkString(" "))
          .zip(linked.map(_._1))
        writeLeafStatsOnePass(data.sparkSession, tableDir, ordered,
          statsCols, leafPartTypes(leaves, declaredTypes))
        writeLeafBloomsOnePass(data.sparkSession, tableDir, ordered,
          bloomCols)
        linked.map(_._1)
      }
    } finally {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(del)
        f.delete(); ()
      }
      del(stage.toFile)
    }
  }

  /** The sidecar type of each partition column, read from the
    * writer's DECLARED schema — the native write path's type source
    * (adopted foreign layouts fall back to directory-name inference,
    * the only evidence they have). Integral columns record "long",
    * strings "string"; any other partition type is refused loudly —
    * the sidecar encoding cannot round-trip it, and a silent string
    * fallback would change the column's read-back type. */
  private def declaredPartTypes(data: DataFrame, tableDir: String,
      partitionCols: Seq[String]): Map[String, String] =
    partitionCols.map { c =>
      require(data.columns.contains(c),
        s"partitioned write to $tableDir: partition column '$c' is not " +
          s"in the batch schema ${data.columns.toSeq}")
      c -> (data.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType => "long"
        case org.apache.spark.sql.types.StringType => "string"
        case other => throw new IllegalArgumentException(
          s"partitioned write to $tableDir: partition column '$c' has " +
            s"type ${other.sql} — the partition-value sidecar encodes " +
            "integral and string columns only; cast the column or " +
            "partition on another")
      })
    }.toMap

  /** Observability hook for the one-pass stats contract: counts the
    * Spark aggregation JOBS stats writes schedule, so a spec can
    * assert a partitioned write computes every leaf's sidecar in ONE
    * grouped aggregation regardless of leaf count. THREAD-LOCAL so a
    * spec's count is isolated from suites running concurrently in the
    * same JVM (the write path runs its stats job on the calling
    * thread). */
  private[graft] object statsJobCount {
    private val tl = new ThreadLocal[java.lang.Long] {
      override def initialValue(): java.lang.Long = 0L
    }
    def get(): Long = tl.get()
    def incrementAndGet(): Long = { val v = tl.get() + 1; tl.set(v); v }
  }

  /** All leaves' stats sidecars in ONE grouped aggregation — the
    * scale path for partitioned writes: the per-leaf
    * [[writeSegmentStats]] loop schedules O(partition values)
    * driver-sequential Spark jobs per batch, which a 1000-partition
    * batch turns into 1000 scans; here the staged dataset is read
    * ONCE, grouped by its leaf directory, and every leaf's
    * min/max/count row lands driver-side in one pass (the sidecar
    * write itself was always a driver-side JSON put). Sidecar bytes
    * are identical to the per-leaf path: same field order, same
    * rendering, partition-value point ranges appended last. A leaf
    * the grouped result cannot be matched to (URI-encoding corner of
    * its directory name) falls back to the per-leaf path — sound,
    * just slower. */
  private def writeLeafStatsOnePass(spark: SparkSession, tableDir: String,
      leavesWithSegs: Seq[((Seq[(String, String)], java.nio.file.Path),
        String)],
      statsCols: Seq[String], ptype: Map[String, String]): Unit = {
    import org.apache.spark.sql.functions.{col, count, expr, lit, max, min}
    def consts(pvals: Seq[(String, String)]) =
      pvals.map { case (c, v) => (c, v, ptype(c)) }
    if (statsCols.isEmpty) {
      // no tracked data columns: the sidecar is the partition-value
      // point ranges only — a driver-side JSON put per leaf, no job
      leavesWithSegs.foreach { case ((pvals, _), seg) =>
        appendConstStats(tableDir, seg, consts(pvals)) }
      return
    }
    val files = leavesWithSegs.flatMap(l => listParquet(l._1._2))
    val df = spark.read.parquet(files.map(_.toString): _*)
    val present = statsCols.filter(df.columns.contains)
    val typed = present.flatMap { c =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType => Some(c -> "long")
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => Some(c -> "double")
        case _: org.apache.spark.sql.types.DecimalType => Some(c -> "double")
        case org.apache.spark.sql.types.StringType => Some(c -> "string")
        case _ => None
      }
    }
    if (typed.isEmpty) {
      leavesWithSegs.foreach { case ((pvals, _), seg) =>
        appendConstStats(tableDir, seg, consts(pvals)) }
      return
    }
    val aggs = typed.flatMap { case (c, _) =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"),
        count(col(c)).as(s"__cnt_$c")) } :+ count(lit(1)).as("__rows")
    statsJobCount.incrementAndGet()
    val byLeaf = df
      .groupBy(expr("regexp_replace(input_file_name(), '/[^/]*$', '')")
        .as("__leaf"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .flatMap { r =>
        // the grouped key is the leaf dir as a Hadoop URI string;
        // decode it back to the raw filesystem path for matching
        scala.util.Try(new java.net.URI(r.getString(0)).getPath)
          .toOption.map(p => Paths.get(p).toAbsolutePath.normalize -> r)
      }.toMap
    leavesWithSegs.foreach { case ((pvals, leaf), seg) =>
      byLeaf.get(leaf.toAbsolutePath.normalize) match {
        case None =>
          // unmatched leaf (exotic directory-name encoding): the
          // per-leaf path is the sound fallback
          writeSegmentStats(spark, tableDir, seg, statsCols)
          appendConstStats(tableDir, seg, consts(pvals))
        case Some(row) =>
          val rows = row.getLong(1 + typed.size * 3)
          val fields = typed.zipWithIndex.flatMap { case ((c, t), i) =>
            val (mn, mx) = (row.get(1 + 3 * i), row.get(1 + 3 * i + 1))
            val nulls = rows - row.getLong(1 + 3 * i + 2)
            if (mn == null || mx == null) {
              if (nulls == rows && rows > 0)
                Some(s""""${jsonEsc(c)}":{"min":"","max":"",""" +
                  s""""type":"null","nulls":"$nulls"}""")
              else None
            }
            else Some(
              s""""${jsonEsc(c)}":{"min":"${jsonEsc(mn.toString)}",""" +
                s""""max":"${jsonEsc(mx.toString)}","type":"$t",""" +
                s""""nulls":"$nulls"}""")
          }
          val constFields = consts(pvals).map { case (c, v, t) =>
            s""""${jsonEsc(c)}":{"min":"${jsonEsc(v)}",""" +
              s""""max":"${jsonEsc(v)}","type":"$t","nulls":"0"}"""
          }
          val body =
            if (fields.isEmpty) s"{${constFields.mkString(",")}}"
            else s"""{"__rows":"$rows",${(fields ++ constFields)
              .mkString(",")}}"""
          writeStatsSidecar(tableDir, seg, body)
      }
    }
  }

  /** Observability hook for the one-pass BLOOM contract — the bloom
    * twin of [[statsJobCount]]: counts the Spark jobs bloom-sidecar
    * writes schedule, so a spec can assert a partitioned write builds
    * every leaf's filters in ONE grouped aggregation regardless of
    * leaf count (vs the per-leaf path's O(leaves × columns) jobs).
    * THREAD-LOCAL for the same isolation reason. */
  private[graft] object bloomJobCount {
    private val tl = new ThreadLocal[java.lang.Long] {
      override def initialValue(): java.lang.Long = 0L
    }
    def get(): Long = tl.get()
    def incrementAndGet(): Long = { val v = tl.get() + 1; tl.set(v); v }
  }

  /** All leaves' BLOOM sidecars in ONE grouped aggregation — the
    * bloom half of [[writeLeafStatsOnePass]] and the close of the r16
    * verdict's write-side scale item: the per-leaf
    * [[writeSegmentBlooms]] loop schedules one count job plus one
    * `df.stat.bloomFilter` job PER LEAF PER COLUMN (a 1000-leaf batch
    * with two bloom columns pays ~3000 driver-sequential jobs); here
    * the staged dataset is read ONCE, grouped by its leaf directory,
    * and every (leaf, column) filter lands driver-side in one pass
    * ([[graft.functions.SegmentBloomAgg]] — Spark's own sketch class
    * with its own putLong/putString inserts, so the bytes probe
    * exactly like the per-leaf path's: no false negatives, same
    * `mightContainLong`/`mightContainString` convention).
    *
    * Sizing: per-leaf row counts come from the staged parquet FOOTERS
    * (driver-side metadata reads, zero Spark jobs), and every leaf's
    * filter is sized for the LARGEST leaf (one shared aggregate
    * shape) — oversizing a small leaf's filter only lowers its fpp,
    * and the `maxBits` cap warns exactly like the per-leaf path. A
    * leaf the grouped result cannot be matched back to (exotic
    * directory-name encoding) falls back to the per-leaf path —
    * sound, just slower. Sidecar JSON shape is byte-compatible with
    * [[writeSegmentBlooms]]'s. */
  private[sources] def writeLeafBloomsOnePass(spark: SparkSession,
      tableDir: String,
      leavesWithSegs: Seq[((Seq[(String, String)], java.nio.file.Path),
        String)],
      bloomCols: Seq[String], fpp: Double = 0.001,
      maxBits: Long = 64L * 1024 * 1024): Unit = {
    import org.apache.spark.sql.functions.{col, expr}
    if (bloomCols.isEmpty || leavesWithSegs.isEmpty) return
    def dropStale(seg: String): Unit = {
      Files.deleteIfExists(logDir(tableDir).resolve(s"bloom-$seg.json")); ()
    }
    val files = leavesWithSegs.flatMap(l => listParquet(l._1._2))
    if (files.isEmpty) { leavesWithSegs.foreach(l => dropStale(l._2)); return }
    val df = spark.read.parquet(files.map(_.toString): _*)
    val eligible = bloomCols.filter(df.columns.contains).filter { c =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.StringType => true
        case _ => false
      }
    }
    if (eligible.isEmpty) { leavesWithSegs.foreach(l => dropStale(l._2)); return }
    // per-leaf row counts from the staged footers — driver-side
    // metadata, no jobs; any unreadable footer falls back to the
    // whole batch's footer total (an upper bound: oversized filters
    // stay sound)
    def footerRows(p: java.nio.file.Path): Option[Long] = scala.util.Try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri),
        spark.sessionState.newHadoopConf())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.toOption
    val perLeaf = leavesWithSegs.map { case ((_, leaf), _) =>
      val counts = listParquet(leaf).map(footerRows)
      if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
    }
    val n = math.max(64L,
      if (perLeaf.forall(_.isDefined)) perLeaf.flatten.max
      else files.map(footerRows).flatten.sum)
    val optimalBits = math.ceil(
      -n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    if (optimalBits > maxBits)
      System.err.println(s"[txlog] one-pass blooms for $tableDir capped " +
        s"at $maxBits bits (optimal $optimalBits for $n rows) — " +
        "point-skipping selectivity degrades; write smaller segments " +
        "or raise maxBits")
    val bits = math.min(optimalBits, maxBits)
    val aggs = eligible.map { c =>
      // integral columns build (and probe) as LONGS — the per-leaf
      // path's convention, so the hashes line up across widths
      val probed = df.schema(c).dataType match {
        case org.apache.spark.sql.types.StringType => col(c)
        case _ => col(c).cast(org.apache.spark.sql.types.LongType)
      }
      graft.functions.SegmentBloomAgg(probed, n, bits).as(s"__bf_$c")
    }
    bloomJobCount.incrementAndGet()
    val byLeaf = df
      .groupBy(expr("regexp_replace(input_file_name(), '/[^/]*$', '')")
        .as("__leaf"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .flatMap { r =>
        scala.util.Try(new java.net.URI(r.getString(0)).getPath)
          .toOption.map(p => Paths.get(p).toAbsolutePath.normalize -> r)
      }.toMap
    leavesWithSegs.foreach { case ((_, leaf), seg) =>
      byLeaf.get(leaf.toAbsolutePath.normalize) match {
        case None =>
          // unmatched leaf: the per-leaf path is the sound fallback
          writeSegmentBlooms(spark, tableDir, seg, bloomCols,
            fpp, maxBits)
        case Some(row) =>
          val fields = eligible.zipWithIndex.map { case (c, i) =>
            val b64 = java.util.Base64.getEncoder
              .encodeToString(row.getAs[Array[Byte]](i + 1))
            s""""${jsonEsc(c)}":"$b64""""
          }
          installSidecar(tableDir, s"bloom-$seg.json",
            s"{${fields.mkString(",")}}")
      }
    }
  }

  /** A segment's on-disk shape for observability verbs — (parquet
    * files, total bytes, rows), all O(metadata): file count and bytes
    * from a directory listing, rows from the stats sidecar's `__rows`
    * when recorded, else from the parquet FOOTERS (driver-side
    * metadata reads — never a Spark job). `SHOW PARTITIONS` /
    * `DESCRIBE DETAIL` list a 100 TB table from this without opening
    * a single data page. */
  def segmentShape(spark: SparkSession, tableDir: String,
      seg: String): (Int, Long, Long) = {
    val files = listParquet(Paths.get(tableDir, seg))
    val bytes = files.map(p => scala.util.Try(Files.size(p)).getOrElse(0L)).sum
    val rows = segmentNullStats(tableDir, seg).map(_._1).getOrElse {
      files.map { p =>
        scala.util.Try {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p.toUri),
            spark.sessionState.newHadoopConf())
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.getOrElse(0L)
      }.sum
    }
    (files.size, bytes, rows)
  }

  /** The hive partition columns a directory's `col=value` layout
    * declares (root→leaf order; empty for flat layouts) — the
    * pre-flight detection for `CONVERT … PARTITIONED BY` validation,
    * run BEFORE any adoption so a mis-declared clause converts
    * nothing. Fails loudly on inconsistent per-leaf layouts. */
  def detectPartitionColumns(tableDir: String): Seq[String] = {
    val colSeqs = hiveLeaves(Paths.get(tableDir)).map(_._1.map(_._1)).distinct
    require(colSeqs.size <= 1,
      s"$tableDir: inconsistent partition layouts across leaves: $colSeqs")
    colSeqs.headOption.getOrElse(Seq.empty)
  }

  /** The non-hidden `*.parquet` part files directly under `dir`. */
  private def listParquet(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val it = Files.list(dir)
    try it.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      .asScala.filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("."))
      .toSeq.sortBy(_.getFileName.toString)
    finally it.close()
  }

  /** Hard-link `files` into a fresh `segDir`, rebuilding from scratch
    * if a crashed earlier attempt left it half-linked. */
  private def relinkInto(segDir: java.nio.file.Path,
      files: Seq[java.nio.file.Path]): Unit = {
    if (Files.isDirectory(segDir)) {
      val it = Files.list(segDir)
      try it.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .asScala.foreach(Files.deleteIfExists)
      finally it.close()
    }
    Files.createDirectories(segDir)
    files.foreach(f => Files.createLink(segDir.resolve(f.getFileName), f))
  }

  /** The `col=value` leaf directories under `root` (depth-first,
    * name-ordered): (partition values root→leaf, leafDir) per leaf
    * that holds at least one parquet file. Values are unescaped from
    * hive's `%XX` path encoding — ASCII escapes only, which is every
    * escape Spark's and Hive's own writers emit (their escape sets are
    * ASCII; non-ASCII characters land raw in the directory name). A
    * MULTI-BYTE escape (`%XX` with XX ≥ 0x80 — a hand-built layout
    * that percent-encoded raw UTF-8 bytes) is REFUSED loudly with the
    * directory named: passing it through verbatim would round-trip a
    * mangled partition VALUE into the sidecar, and silently wrong
    * values are worse than a failed convert. */
  private def hiveLeaves(root: java.nio.file.Path)
      : Seq[(Seq[(String, String)], java.nio.file.Path)] = {
    def unescape(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '%' && i + 2 < s.length)
          scala.util.Try(Integer.parseInt(s.substring(i + 1, i + 3), 16))
            .toOption match {
            case Some(code) if code < 128 =>
              sb.append(code.toChar); i += 3
            case Some(code) =>
              throw new IllegalArgumentException(
                s"partition path segment '$s' under $root carries the " +
                  f"multi-byte percent escape %%$code%02X — this " +
                  "encoding cannot round-trip to a partition value; " +
                  "rename the directory with the raw UTF-8 characters " +
                  "instead of percent-encoded bytes")
            case None => sb.append(s.charAt(i)); i += 1
          }
        else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }
    def walk(dir: java.nio.file.Path, acc: Seq[(String, String)])
        : Seq[(Seq[(String, String)], java.nio.file.Path)] = {
      val it = Files.list(dir)
      val partDirs =
        try it.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
          .asScala.filter(p => Files.isDirectory(p) &&
            p.getFileName.toString.contains("=") &&
            !p.getFileName.toString.startsWith("."))
          .toSeq.sortBy(_.getFileName.toString)
        finally it.close()
      if (partDirs.isEmpty) {
        if (acc.nonEmpty && listParquet(dir).nonEmpty) Seq((acc, dir))
        else Seq.empty
      } else partDirs.flatMap { d =>
        val Array(k, v) = d.getFileName.toString.split("=", 2)
        walk(d, acc :+ (unescape(k) -> unescape(v)))
      }
    }
    walk(root, Nil)
  }

  /** Append CONSTANT-column entries (min = max = value, zero nulls) to
    * a segment's stats sidecar — how a converted hive layout's
    * partition predicates prune by segment: the directory name said
    * every row has this value, so the range collapses to a point. */
  private[graft] def appendConstStats(tableDir: String, seg: String,
      consts: Seq[(String, String, String)]): Unit = {
    if (consts.isEmpty) return
    val fields = consts.map { case (c, v, t) =>
      s""""${jsonEsc(c)}":{"min":"${jsonEsc(v)}","max":"${jsonEsc(v)}",""" +
        s""""type":"$t","nulls":"0"}"""
    }
    val f = logDir(tableDir).resolve(s"stats-$seg.json")
    val body =
      if (Files.isRegularFile(f)) {
        val cur = new String(Files.readAllBytes(f),
          StandardCharsets.UTF_8).trim
        cur.dropRight(1) + "," + fields.mkString(",") + "}"
      } else s"{${fields.mkString(",")}}"
    writeStatsSidecar(tableDir, seg, body)
  }

  /** A segment's recorded hive-partition values, (col, value, type)
    * in layout order — None for segments written with their columns
    * physical (every non-converted segment). `Some(Seq.empty)` is the
    * EMPTY-marker sidecar (`{"cols":[]}`) a partitioned write's empty
    * batch records: the zero-row segment belongs to no partition value
    * but IS partition-attributed, so it never breaks the
    * fully-partitioned invariant dynamic overwrite and `OPTIMIZE …
    * WHERE` require. */
  def segmentParts(tableDir: String,
      seg: String): Option[Seq[(String, String, String)]] = {
    val f = logDir(tableDir).resolve(s"parts-$seg.json")
    if (!Files.exists(f)) None
    else scala.util.Try {
      val body = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      val entry = ("""\{"name":"((?:[^"\\]|\\.)*)",""" +
        """"value":"((?:[^"\\]|\\.)*)","type":"(\w+)"\}""").r
      def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
      val entries = entry.findAllMatchIn(body).map(m =>
        (unesc(m.group(1)), unesc(m.group(2)), m.group(3))).toSeq
      if (entries.nonEmpty) Some(entries)
      // the explicit empty marker parses strictly — a malformed
      // sidecar must stay None (unattributed), never "empty"
      else if (body.replaceAll("\\s", "") == """{"cols":[]}""")
        Some(Seq.empty)
      else None
    }.toOption.flatten
  }

  /** Attach a converted segment's recorded partition values as literal
    * columns — a later physical materialization of the column (a
    * compaction rewrote the rows) wins over the sidecar. */
  private def attachParts(df: DataFrame,
      parts: Option[Seq[(String, String, String)]]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, when}
    parts.fold(df)(_.foldLeft(df) { case (d, (c, v, t)) =>
      if (d.columns.contains(c)) d
      else {
        // attached as NULLABLE even though the value never is: a
        // compaction materializes the column physically (nullable,
        // like any parquet read), and a catalog schema pinned NOT
        // NULL at CREATE would refuse the relation after the first
        // fold. The otherwise-less CaseWhen over a tautology is the
        // one literal shape ANALYSIS types as nullable; the optimizer
        // still folds it to the plain literal for execution.
        val anchor = col(d.columns.head)
        d.withColumn(c, when(anchor.isNotNull || anchor.isNull, t match {
          case "long" => lit(v.toLong)
          case _ => lit(v)
        }))
      }
    })
  }

  // ---- schema widening: ALTER TABLE ADD COLUMN --------------------
  //
  // The DDL spelling of the evolution the mergeSchema reader already
  // does: the widened schema is TABLE metadata (`_meta/widen.json` —
  // an ordered list of added nullable columns), never a data rewrite.
  // Readers attach absent widened columns as typed NULLs; writes that
  // follow the ALTER carry the column physically, and the two segment
  // generations merge by name under snapshot's evolution rule (a
  // TYPE change still fails loudly — checkMergeable).

  /** Record one widened (added, nullable) column. The caller is
    * responsible for validating the name against the table's current
    * schema; re-widening an already-widened name fails loudly here. */
  def widenSchema(tableDir: String, name: String, ddlType: String): Unit =
    widenSchemaAll(tableDir, Seq(name -> ddlType))

  /** Record SEVERAL widened columns behind ONE atomic metadata write —
    * the multi-column `ALTER TABLE ADD COLUMNS (a T1, b T2, …)` must
    * be all-or-nothing: every name is validated first (against the
    * already-widened set AND against duplicates within the statement),
    * and only then does widen.json replace atomically — a failing
    * later column can never leave an earlier one half-recorded while
    * the catalog schema was never updated. Re-adding a DROPPED name
    * refuses too: pre-drop segments still hold the old values, which
    * would silently resurrect under the re-added name. */
  def widenSchemaAll(tableDir: String,
      cols: Seq[(String, String)]): Unit = {
    require(cols.nonEmpty, "widenSchemaAll: no columns")
    val cur = widenedColumns(tableDir)
    val dropped = droppedColumns(tableDir)
    cols.foreach { case (name, _) =>
      require(!cur.exists(_._1.equalsIgnoreCase(name)),
        s"ALTER TABLE on $tableDir: column '$name' was already added " +
          s"(${cur.filter(_._1.equalsIgnoreCase(name)).map(_._2).mkString})")
      require(!dropped.exists(_.equalsIgnoreCase(name)),
        s"ALTER TABLE on $tableDir: column '$name' was DROPPED — " +
          "re-adding a dropped name would resurrect the old values " +
          "still stored in pre-drop segments; use a fresh name")
    }
    val dupIn = cols.groupBy(_._1.toLowerCase).filter(_._2.size > 1).keys
    require(dupIn.isEmpty,
      s"ALTER TABLE on $tableDir: duplicate column names in one " +
        s"statement: ${dupIn.mkString(", ")}")
    val all = cur ++ cols
    val body = s"""{"cols":[${all.map { case (n, t) =>
      s"""{"name":"${jsonEsc(n)}","type":"${jsonEsc(t)}"}""" }
      .mkString(",")}]}"""
    writeMetaFile(tableDir, "widen.json", body)
  }

  /** Atomic `_meta/<name>` replace — the table-metadata twin of
    * [[installSidecar]]. */
  private def writeMetaFile(tableDir: String, name: String,
      body: String): Unit = {
    val d = Paths.get(tableDir, "_meta")
    Files.createDirectories(d)
    val tmp = d.resolve(s".tmp.$name.${java.util.UUID.randomUUID}")
    try {
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, d.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    } finally { Files.deleteIfExists(tmp); () }
  }

  /** The widened columns in ALTER order, (name, DDL type string) —
    * empty for never-altered tables. */
  def widenedColumns(tableDir: String): Seq[(String, String)] = {
    val f = Paths.get(tableDir, "_meta", "widen.json")
    if (!Files.isRegularFile(f)) Seq.empty
    else {
      val body = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      val entry =
        ("""\{"name":"((?:[^"\\]|\\.)*)","type":"((?:[^"\\]|\\.)*)"\}""").r
      def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
      entry.findAllMatchIn(body).map(m =>
        unesc(m.group(1)) -> unesc(m.group(2))).toSeq
    }
  }

  // ---- schema narrowing: ALTER TABLE DROP COLUMN -------------------
  //
  // widen.json's reverse: dropped column names are TABLE metadata
  // (`_meta/dropped.json`), never a data rewrite — at 100 TB dropping
  // a column must be O(1) exactly like adding one. Readers PROJECT
  // the dropped names away after the snapshot (the bytes stay in the
  // segments; vacuum-after-rewrite is the only way to reclaim them,
  // Delta's rule without column mapping). Re-ADDING a dropped name
  // refuses ([[widenSchemaAll]]): the old values still sit in every
  // pre-drop segment and would silently resurrect.

  /** Record dropped columns behind one atomic metadata write.
    * Validation (the names exist, aren't key/partition columns) is the
    * caller's job — this is the metadata primitive. Dropping an
    * already-dropped name fails loudly. A dropped name that was a
    * WIDENED column is also removed from widen.json (its typed-NULL
    * attach must stop). */
  def dropColumnsMeta(tableDir: String, names: Seq[String]): Unit = {
    require(names.nonEmpty, "dropColumnsMeta: no columns")
    val cur = droppedColumns(tableDir)
    names.foreach { n =>
      require(!cur.exists(_.equalsIgnoreCase(n)),
        s"ALTER TABLE on $tableDir: column '$n' is already dropped")
    }
    val widened = widenedColumns(tableDir)
    val stillWidened = widened.filterNot { case (w, _) =>
      names.exists(_.equalsIgnoreCase(w)) }
    if (stillWidened != widened)
      writeMetaFile(tableDir, "widen.json",
        s"""{"cols":[${stillWidened.map { case (n, t) =>
          s"""{"name":"${jsonEsc(n)}","type":"${jsonEsc(t)}"}""" }
          .mkString(",")}]}""")
    val all = cur ++ names
    writeMetaFile(tableDir, "dropped.json",
      s"""{"cols":[${all.map(n => s""""${jsonEsc(n)}"""")
        .mkString(",")}]}""")
  }

  /** The dropped column names in ALTER order — empty for tables that
    * never dropped one. */
  def droppedColumns(tableDir: String): Seq[String] = {
    val f = Paths.get(tableDir, "_meta", "dropped.json")
    if (!Files.isRegularFile(f)) Seq.empty
    else {
      val body = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      val m = """"cols":\[([^\]]*)\]""".r.findFirstMatchIn(body)
      def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
      // entry-level, escape-aware parse (the segmentParts discipline):
      // the writer jsonEsc-escapes names, so a name holding a comma or
      // an escaped quote must round-trip — a naive split(",") would
      // silently shear it into wrong dropped names
      val entry = """"((?:[^"\\]|\\.)*)"""".r
      m.map(g => entry.findAllMatchIn(g.group(1))
        .map(x => unesc(x.group(1))).toSeq)
        .getOrElse(Seq.empty)
    }
  }

  // ---- column mapping: ALTER TABLE RENAME COLUMN -------------------
  //
  // Delta's column-mapping layer reduced to this format's core: a
  // rename is TABLE METADATA (`_meta/renames.json` — an ordered list
  // of {from, to, v} entries), never a data rewrite. Committed
  // segments keep the column under the name that was CURRENT when
  // they were written (their physical name); post-rename writes carry
  // the NEW name physically. Readers re-map per segment: a rename
  // recorded at version v applies to exactly the segments ADDED
  // before v, and only for reads pinned AT OR ABOVE v — so time
  // travel below the rename reads the old name (the rename anchors to
  // a dedicated empty METADATA COMMIT, which is what gives it a
  // position in the version order). Chained renames fold in record
  // order; re-ADDING the old name works (old segments map their
  // physical column away to the new name first, so the re-added
  // column reads as typed NULL there and physically thereafter).

  /** Record one column rename: claims a metadata commit (the rename's
    * version anchor), then appends the entry. Validation (the column
    * exists, target free, not a key/partition column) is the CALLER's
    * job — this is the metadata primitive. A WIDENED source name is
    * re-pointed in widen.json too (its typed-NULL attach must follow
    * the new name). Returns the anchor version. */
  def renameColumnMeta(tableDir: String, from: String, to: String): Int = {
    require(from.nonEmpty && to.nonEmpty && !from.equalsIgnoreCase(to),
      s"rename on $tableDir: need two distinct names, got '$from'->'$to'")
    val v = commit(tableDir, adds = Seq.empty, removes = Seq.empty,
      dataChange = false)
    val cur = renamedColumns(tableDir)
    val all = cur :+ ((from, to, v))
    writeMetaFile(tableDir, "renames.json",
      s"""{"renames":[${all.map { case (f, t, rv) =>
        s"""{"from":"${jsonEsc(f)}","to":"${jsonEsc(t)}","v":$rv}""" }
        .mkString(",")}]}""")
    val widened = widenedColumns(tableDir)
    if (widened.exists(_._1.equalsIgnoreCase(from)))
      writeMetaFile(tableDir, "widen.json",
        s"""{"cols":[${widened.map { case (n, t) =>
          val nn = if (n.equalsIgnoreCase(from)) to else n
          s"""{"name":"${jsonEsc(nn)}","type":"${jsonEsc(t)}"}""" }
          .mkString(",")}]}""")
    v
  }

  /** The recorded renames in ALTER order, (from, to, anchorVersion) —
    * empty for never-renamed tables. */
  def renamedColumns(tableDir: String): Seq[(String, String, Int)] = {
    val f = Paths.get(tableDir, "_meta", "renames.json")
    if (!Files.isRegularFile(f)) Seq.empty
    else {
      val body = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      val entry = ("""\{"from":"((?:[^"\\]|\\.)*)",""" +
        """"to":"((?:[^"\\]|\\.)*)","v":(\d+)\}""").r
      def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
      entry.findAllMatchIn(body).map(m =>
        (unesc(m.group(1)), unesc(m.group(2)), m.group(3).toInt)).toSeq
    }
  }

  /** Apply the rename mapping one SEGMENT's frame needs: every entry
    * anchored after the segment's add version and at or below the
    * read's pinned version, in record order (chained renames fold). */
  private def applyRenames(df: DataFrame,
      renames: Seq[(String, String, Int)], segV: Int,
      readV: Int): DataFrame =
    renames.foldLeft(df) { case (d, (from, to, v)) =>
      if (v <= readV && v > segV && d.columns.contains(from))
        d.withColumnRenamed(from, to)
      else d
    }

  /** The effective (segment-local) re-keying of a sidecar map under
    * the rename mapping — the PRUNING twin of [[applyRenames]]: a
    * sidecar records stats/blooms under the segment's PHYSICAL names,
    * while pushed filters name LOGICAL columns; re-keying keeps the
    * renamed column prunable on old segments AND keeps a re-added old
    * name from consulting the stale physical entry (which describes a
    * DIFFERENT logical column — an `IS NULL` probe against it would
    * wrongly prune). */
  private[graft] def remapSidecarKeys[V](m: Map[String, V],
      renames: Seq[(String, String, Int)], segV: Int,
      readV: Int): Map[String, V] =
    renames.foldLeft(m) { case (acc, (from, to, v)) =>
      if (v <= readV && v > segV) acc.get(from) match {
        case Some(value) => (acc - from) + (to -> value)
        case None => acc
      } else acc
    }

  /** SHALLOW-CLONE a plain table: a new independent txlog table at
    * `dstDir` whose segments HARD-LINK the source's live data — zero
    * data copied (O(files) metadata operations), after which the two
    * tables diverge freely: writes to either never touch the other,
    * and a vacuum on either only unlinks its own names (the shared
    * inodes survive until BOTH sides drop them — the local-FS
    * equivalent of Delta's shallow-clone file sharing, minus its
    * source-vacuum hazard).
    *
    * Correctness under tombstones: live segments are replayed as one
    * clone commit PER ORIGINAL ADD VERSION, in order — the MoR rule
    * orders tombstones against data by commit version, so the clone
    * must preserve the source's relative commit order (and same-commit
    * groups, e.g. an UPDATE's tombstone+replacement pair, must stay
    * same-commit). Segments are renamed `clone__seg<i>` /
    * `deletes__clone<i>`: clone names can never collide with any name
    * a future write derives from the clone's own version count. Stats
    * sidecars are carried under the new names. Plain tables only — an
    * index store's family names are load-bearing and a rename would
    * strand them. Returns the number of commits replayed. */
  def cloneTable(srcDir: String, dstDir: String): Int = {
    val latest = latestVersion(srcDir)
      .getOrElse(sys.error(s"clone of empty table $srcDir"))
    val live = liveSegmentsWithVersion(srcDir, latest)
    val idx = live.map(_._1.split("__")(0)).distinct
      .filter(IndexStoreFamilies)
    require(idx.isEmpty,
      s"clone of $srcDir: the table holds index-store families " +
        s"$idx — cloning renames segments, which plain tables " +
        "tolerate and index stores do not")
    require(versions(dstDir).isEmpty,
      s"clone target $dstDir already has a txlog — refuse to mix tables")
    // the clone replays live segments under COMPRESSED version
    // numbers; renames are anchored to the source's version order and
    // cannot re-anchor — refuse instead of silently mis-mapping names
    require(renamedColumns(srcDir).isEmpty,
      s"clone of $srcDir: the table carries RENAME COLUMN history, " +
        "which is version-anchored and cannot survive the clone's " +
        "commit re-numbering — CREATE TABLE AS SELECT instead")
    Files.createDirectories(Paths.get(dstDir))
    var i = 0
    val byVersion = live.groupBy(_._2).toSeq.sortBy(_._1)
    byVersion.foreach { case (_, segs) =>
      val adds = segs.map { case (orig, _) =>
        val name =
          if (orig.startsWith(s"${DeletesFamily}__"))
            s"${DeletesFamily}__clone$i"
          else s"clone__seg$i"
        i += 1
        val from = Paths.get(srcDir, orig)
        val to = Paths.get(dstDir, name)
        Files.createDirectories(to)
        val it = Files.list(from)
        try it.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
          .asScala.filter(p => Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet") &&
            !p.getFileName.toString.startsWith("."))
          .foreach(p => Files.createLink(to.resolve(p.getFileName), p))
        finally it.close()
        val sidecar = logDir(srcDir).resolve(s"stats-$orig.json")
        if (Files.isRegularFile(sidecar))
          writeStatsSidecar(dstDir, name,
            new String(Files.readAllBytes(sidecar), StandardCharsets.UTF_8))
        // bloom sidecars ride too — the clone's rows ARE the source's
        // rows (same inodes), so the filters stay exact under the new
        // names and the clone's point probes prune like the source's
        val bloom = logDir(srcDir).resolve(s"bloom-$orig.json")
        if (Files.isRegularFile(bloom))
          installSidecar(dstDir, s"bloom-$name.json",
            new String(Files.readAllBytes(bloom), StandardCharsets.UTF_8))
        // partition-value sidecars (converted hive layouts) carry
        // unchanged: the values describe the rows, not the names
        val parts = logDir(srcDir).resolve(s"parts-$orig.json")
        if (Files.isRegularFile(parts))
          installSidecar(dstDir, s"parts-$name.json",
            new String(Files.readAllBytes(parts), StandardCharsets.UTF_8))
        name
      }
      commit(dstDir, adds = adds)
    }
    // the widened/dropped-schema records are table metadata, not
    // segment data — without them the clone would read pre-evolution
    // segments under the wrong schema (positional INSERTs misalign,
    // dropped columns resurrect)
    Seq("widen.json", "dropped.json").foreach { n =>
      val src = Paths.get(srcDir, "_meta", n)
      if (Files.isRegularFile(src)) {
        Files.createDirectories(Paths.get(dstDir, "_meta"))
        Files.copy(src, Paths.get(dstDir, "_meta", n),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    }
    byVersion.size
  }

  // ---- segment statistics: data skipping --------------------------
  //
  // Delta's data-skipping shape reduced to its core: at write time a
  // segment records per-column min/max in a tiny `_txlog/stats-<seg>
  // .json` sidecar (one delta-sized agg over the just-written
  // segment); at read time a pushed filter prunes the SEGMENT LIST
  // before any parquet footer is opened. Stats are pure optimization:
  // a missing or unparseable sidecar only means the segment cannot be
  // skipped. Sidecars live in `_txlog/` (never vacuumed — stale ones
  // for vacuumed segments are harmless litter; names never collide
  // because segment names never recycle).

  /** Compute and record min/max stats for `cols` of a written segment
    * — call between the parquet write and the commit. One small agg
    * job over the segment (parquet row-group stats make it cheap).
    * Columns that are all-NULL in the segment (or of an unsupported
    * type) are omitted — readers treat absence as "cannot skip". */
  def writeSegmentStats(spark: SparkSession, tableDir: String, seg: String,
      cols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    if (cols.isEmpty) return
    val df = spark.read.parquet(s"$tableDir/$seg")
    val present = cols.filter(df.columns.contains)
    val typed = present.flatMap { c =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType => Some(c -> "long")
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => Some(c -> "double")
        case _: org.apache.spark.sql.types.DecimalType => Some(c -> "double")
        case org.apache.spark.sql.types.StringType => Some(c -> "string")
        case _ => None
      }
    }
    // Crash-retry hazard: segment names derive from versions().size, so
    // a write that crashed BETWEEN the parquet write and the commit
    // retries under the SAME segment name with possibly different rows —
    // the parquet is overwritten, and the sidecar must follow. Every
    // early return therefore DELETES any stale sidecar from the crashed
    // attempt (keeping it could prune a segment that now holds matching
    // rows — silent wrong results), and the success path atomically
    // REPLACES it (rename, not create-if-absent).
    def dropStale(): Unit = {
      Files.deleteIfExists(logDir(tableDir).resolve(s"stats-$seg.json")); ()
    }
    if (typed.isEmpty) { dropStale(); return }
    // one agg pass: per-column min/max + non-null count, plus the
    // segment row count — the null tallies serve IsNull/IsNotNull
    // pruning the same way the ranges serve comparisons
    val aggs = typed.flatMap { case (c, _) =>
      Seq(min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"),
        count(col(c)).as(s"__cnt_$c")) } :+ count(lit(1)).as("__rows")
    statsJobCount.incrementAndGet()
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getLong(typed.size * 3)
    val fields = typed.zipWithIndex.flatMap { case ((c, t), i) =>
      val (mn, mx) = (row.get(3 * i), row.get(3 * i + 1))
      val nulls = rows - row.getLong(3 * i + 2)
      if (mn == null || mx == null) {
        // an all-NULL column records no range (type "null": readers
        // treat the range as unknowable) but its null tally still
        // lets IsNotNull prune the whole segment
        if (nulls == rows && rows > 0)
          Some(s""""${jsonEsc(c)}":{"min":"","max":"",""" +
            s""""type":"null","nulls":"$nulls"}""")
        else None
      }
      else Some(s""""${jsonEsc(c)}":{"min":"${jsonEsc(mn.toString)}",""" +
        s""""max":"${jsonEsc(mx.toString)}","type":"$t","nulls":"$nulls"}""")
    }
    if (fields.isEmpty) { dropStale(); return }
    writeStatsSidecar(tableDir, seg,
      s"""{"__rows":"$rows",${fields.mkString(",")}}""")
  }

  /** Compute and record per-column BLOOM FILTERS for a written
    * segment — the equality/IN-probe half of data skipping: ranges
    * prune BAND disjointness, a bloom prunes POINT lookups on
    * high-cardinality keys where every segment's [min,max] straddles
    * the probe (at 100 TB, "fetch one doc_id" should open one
    * segment, not all of them). Built with Spark's own sketch
    * (`df.stat.bloomFilter` — one delta-sized job per column),
    * serialized into a `_txlog/bloom-<seg>.json` sidecar with the
    * same atomic-replace discipline as the range stats. Bits are
    * capped (`maxBits`, default 8 MiB/column — 64M bits, sized so
    * fpp holds through multi-million-row segments): an undersized filter
    * only raises false positives, and a bloom's "maybe present" never
    * prunes — soundness is independent of sizing. Long/int/string
    * columns only. */
  def writeSegmentBlooms(spark: SparkSession, tableDir: String, seg: String,
      cols: Seq[String], fpp: Double = 0.001,
      maxBits: Long = 64L * 1024 * 1024): Unit = {
    if (cols.isEmpty) return
    val df = spark.read.parquet(s"$tableDir/$seg")
    def dropStale(): Unit = {
      Files.deleteIfExists(logDir(tableDir).resolve(s"bloom-$seg.json")); ()
    }
    val eligible = cols.filter(df.columns.contains).filter { c =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.StringType => true
        case _ => false
      }
    }
    if (eligible.isEmpty) { dropStale(); return }
    bloomJobCount.incrementAndGet() // the sizing count job
    val n = math.max(64L, df.count())
    val fields = eligible.map { c =>
      val optimalBits = math.ceil(
        -n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
      if (optimalBits > maxBits)
        // the cap must be OBSERVABLE: a silently undersized filter
        // degrades every point probe on the segment to a full keep
        System.err.println(s"[txlog] bloom for $seg.$c capped at " +
          s"$maxBits bits (optimal $optimalBits for $n rows) — " +
          "point-skipping selectivity degrades; write smaller segments " +
          "or raise maxBits")
      // integral columns are built (and later probed) as LONGS so the
      // hashes line up regardless of the column's physical width
      val probed = df.schema(c).dataType match {
        case org.apache.spark.sql.types.StringType => df.select(c)
        case _ => df.select(org.apache.spark.sql.functions.col(c)
          .cast(org.apache.spark.sql.types.LongType).as(c))
      }
      bloomJobCount.incrementAndGet() // one build job per column
      val bf = probed.stat.bloomFilter(c, n, math.min(optimalBits, maxBits))
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      val b64 = java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
      s""""${jsonEsc(c)}":"$b64""""
    }
    val d = logDir(tableDir)
    Files.createDirectories(d)
    val tmp = d.resolve(s".tmp.bloom.${java.util.UUID.randomUUID}")
    try {
      Files.write(tmp, s"{${fields.mkString(",")}}"
        .getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, d.resolve(s"bloom-$seg.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    } finally { Files.deleteIfExists(tmp); () }
  }

  /** Observability hook for the lazy-bloom planning contract: counts
    * actual sidecar DECODES ([[segmentBlooms]] reads, not memo hits),
    * so a plan audit can assert a range-only scan never touches a
    * bloom sidecar and a repeat point probe decodes nothing new. */
  private[graft] val bloomDecodeCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** A segment's recorded bloom filters, col → sketch — None when the
    * segment has no (readable) bloom sidecar. */
  def segmentBlooms(tableDir: String, seg: String)
      : Option[Map[String, org.apache.spark.util.sketch.BloomFilter]] = {
    val f = logDir(tableDir).resolve(s"bloom-$seg.json")
    if (!Files.exists(f)) None
    else scala.util.Try {
      bloomDecodeCount.incrementAndGet()
      val body = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      val entry = "\"((?:[^\"\\\\]|\\\\.)*)\":\"([A-Za-z0-9+/=]+)\"".r
      def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
      entry.findAllMatchIn(body).map { m =>
        unesc(m.group(1)) -> org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(
            java.util.Base64.getDecoder.decode(m.group(2))))
      }.toMap
    }.toOption.filter(_.nonEmpty)
  }

  /** A segment's recorded (rowCount, col → nullCount) — None for
    * pre-null-tally sidecars (readers then cannot null-prune; ranges
    * still work). After a carry-forward merge the counts are UPPER
    * bounds on the compacted segment's true tallies (MoR subtraction
    * only removes rows), which keeps both prune rules sound:
    * IsNull prunes on nulls == 0 (no nulls in any retired row ⇒ none
    * in the subset), IsNotNull prunes on nulls == rows (every retired
    * row null in the column ⇒ every surviving row null too). */
  def segmentNullStats(tableDir: String, seg: String)
      : Option[(Long, Map[String, Long])] = {
    val f = logDir(tableDir).resolve(s"stats-$seg.json")
    if (!Files.exists(f)) None
    else scala.util.Try {
      val body = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      val rows = """"__rows":"(\d+)"""".r.findFirstMatchIn(body)
        .map(_.group(1).toLong)
      val entry = ("\"((?:[^\"\\\\]|\\\\.)*)\":\\{\"min\":\"(?:[^\"\\\\]|\\\\.)*\"," +
        "\"max\":\"(?:[^\"\\\\]|\\\\.)*\",\"type\":\"\\w+\"," +
        "\"nulls\":\"(\\d+)\"\\}").r
      def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
      rows.map(r => (r, entry.findAllMatchIn(body).map(m =>
        unesc(m.group(1)) -> m.group(2).toLong).toMap))
    }.toOption.flatten
  }

  /** Install a segment's stats sidecar ATOMICALLY, replacing any
    * earlier one — rename, not create-if-absent: the sidecar must track
    * the segment's LATEST parquet contents (a crashed-then-retried
    * write reuses the segment name with different rows), and an
    * atomic-move rename can never be observed half-written. */
  private def writeStatsSidecar(tableDir: String, seg: String,
      body: String): Unit = installSidecar(tableDir, s"stats-$seg.json", body)

  /** Install any `_txlog/` sidecar ATOMICALLY (rename, never
    * create-if-absent — a crashed-then-retried write reuses segment
    * names, so the sidecar must track the LATEST contents and an
    * atomic move can never be observed half-written). */
  private def installSidecar(tableDir: String, fileName: String,
      body: String): Unit = {
    val d = logDir(tableDir)
    Files.createDirectories(d)
    val tmp = d.resolve(s".tmp.side.${java.util.UUID.randomUUID}")
    try {
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, d.resolve(fileName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    } finally { Files.deleteIfExists(tmp); () }
  }

  /** Unsigned-UTF-8-byte string comparison — Spark's `UTF8String`
    * binary order, the order string min/max stats were computed under
    * (Spark's min/max aggregate on strings). `java.lang.String
    * .compareTo` (UTF-16 code-unit order) diverges for
    * supplementary-plane characters (surrogate pairs sort between
    * U+D7FF and U+E000 instead of above U+FFFF), so comparing recorded
    * bounds with it could WRONGLY prune a segment holding matching
    * rows. Never throws. */
  private[graft] def statsUtf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Compare two stats literals under the sidecar's recorded type —
    * None when either fails to parse (readers keep the segment). */
  private[graft] def statsCmp(typ: String, a: String,
      b: String): Option[Int] = typ match {
    case "string" => Some(statsUtf8Cmp(a, b))
    case _ => scala.util.Try(new java.math.BigDecimal(a)
      .compareTo(new java.math.BigDecimal(b))).toOption
  }

  /** Carry stats THROUGH compaction: give the merged segment a sidecar
    * built as the conservative per-column UNION of the retired data
    * segments' recorded ranges — min of mins, max of maxes, compared
    * under the recorded type. No data is read: the merge is a
    * driver-side fold over tiny JSON sidecars. Sound by construction:
    * every compaction verb writes a segment whose rows are a SUBSET of
    * the union of the retired data segments' rows (raw compaction is
    * exactly the union; MoR compaction subtracts tombstones, which
    * only shrinks ranges), so the union of old ranges always contains
    * the new segment's true range. Conservative where it must be: a
    * column is carried only when EVERY retired data segment recorded
    * it with one agreed type (absence anywhere means the merged range
    * is unknowable without a scan — the column is dropped and reads
    * simply cannot skip on it). Tombstone segments are metadata, never
    * carry sidecars, and are ignored. Without this, one OPTIMIZE would
    * silently end data skipping on the folded data forever — at 100 TB
    * the whole point of stats is post-compaction scans. */
  def mergeSegmentStats(tableDir: String, retired: Seq[String],
      newSeg: String): Unit = {
    val dataRetired = retired.filterNot(_.startsWith(s"${DeletesFamily}__"))
    if (dataRetired.isEmpty) return
    mergeSegmentBlooms(tableDir, dataRetired, newSeg)
    val sidecars = dataRetired.map(segmentStats(tableDir, _))
    if (sidecars.exists(_.isEmpty)) return // untracked segment → no merge
    val maps = sidecars.map(_.get)
    val common = maps.map(_.keySet).reduce(_ intersect _)
    // null tallies carry as SUMS — upper bounds on the compacted
    // segment's true counts (MoR subtraction only removes rows), which
    // both null-prune rules stay sound under; carried only when every
    // retired sidecar recorded them (see [[segmentNullStats]])
    val nullTallies = dataRetired.map(segmentNullStats(tableDir, _))
    val mergedNulls: Option[(Long, Map[String, Long])] =
      if (nullTallies.exists(_.isEmpty)) None
      else Some((nullTallies.map(_.get._1).sum,
        nullTallies.map(_.get._2.keySet).reduce(_ intersect _)
          .map(c => c -> nullTallies.map(_.get._2(c)).sum).toMap))
    def extreme(vals: Seq[String], t: String,
        takeMin: Boolean): Option[String] =
      vals.tail.foldLeft(Option(vals.head)) { (accOpt, v) =>
        accOpt.flatMap(acc => statsCmp(t, v, acc).map(c =>
          if ((c < 0) == takeMin) v else acc))
      }
    val fields = common.toSeq.sorted.flatMap { c =>
      val entries = maps.map(_(c))
      val nullsSuffix = mergedNulls.flatMap(_._2.get(c))
        .map(n => s""","nulls":"$n"""").getOrElse("")
      entries.map(_._3).distinct match {
        case Seq(t) =>
          for (mn <- extreme(entries.map(_._1), t, takeMin = true);
               mx <- extreme(entries.map(_._2), t, takeMin = false))
            yield s""""${jsonEsc(c)}":{"min":"${jsonEsc(mn)}",""" +
              s""""max":"${jsonEsc(mx)}","type":"$t"$nullsSuffix}"""
        case _ => None // type disagreement across sidecars — drop column
      }
    }
    val rowsPrefix = mergedNulls.map(m => s""""__rows":"${m._1}",""")
      .getOrElse("")
    if (fields.nonEmpty)
      writeStatsSidecar(tableDir, newSeg,
        s"{$rowsPrefix${fields.mkString(",")}}")
  }

  /** Carry bloom sidecars through compaction: the merged segment's
    * filter for a column is the UNION (`mergeInPlace`) of the retired
    * segments' filters — sound because the compacted rows are a subset
    * of the retired rows' union, and a bloom union can only widen the
    * "maybe present" set. Carried only when EVERY retired data segment
    * has a compatible filter for the column; otherwise the column's
    * bloom is dropped (reads then simply cannot point-prune on it). */
  private def mergeSegmentBlooms(tableDir: String, dataRetired: Seq[String],
      newSeg: String): Unit = {
    def dropStale(): Unit = {
      Files.deleteIfExists(logDir(tableDir).resolve(s"bloom-$newSeg.json"))
      ()
    }
    val sidecars = dataRetired.map(segmentBlooms(tableDir, _))
    if (sidecars.exists(_.isEmpty)) { dropStale(); return }
    val maps = sidecars.map(_.get)
    val common = maps.map(_.keySet).reduce(_ intersect _)
    val fields = common.toSeq.sorted.flatMap { c =>
      scala.util.Try {
        val merged = maps.head(c) // readFrom returns a fresh instance
        maps.tail.foreach(m => merged.mergeInPlace(m(c)))
        val bos = new java.io.ByteArrayOutputStream()
        merged.writeTo(bos)
        s""""${jsonEsc(c)}":"${java.util.Base64.getEncoder
          .encodeToString(bos.toByteArray)}""""
      }.toOption // IncompatibleMergeException → drop the column
    }
    if (fields.isEmpty) { dropStale(); return }
    val d = logDir(tableDir)
    val tmp = d.resolve(s".tmp.bloom.${java.util.UUID.randomUUID}")
    try {
      Files.write(tmp, s"{${fields.mkString(",")}}"
        .getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, d.resolve(s"bloom-$newSeg.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    } finally { Files.deleteIfExists(tmp); () }
  }

  private def jsonEsc(s: String) =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** A segment's recorded stats, col → (min, max, type) — None when
    * the segment has no (readable) sidecar. */
  def segmentStats(tableDir: String,
      seg: String): Option[Map[String, (String, String, String)]] = {
    val f = logDir(tableDir).resolve(s"stats-$seg.json")
    if (!Files.exists(f)) None
    else scala.util.Try {
      val body = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      // the trailing `,"nulls":"N"` is the v2 null tally — optional,
      // so pre-existing sidecars stay readable
      val entry = ("\"((?:[^\"\\\\]|\\\\.)*)\":\\{\"min\":\"((?:[^\"\\\\]|\\\\.)*)\"," +
        "\"max\":\"((?:[^\"\\\\]|\\\\.)*)\",\"type\":\"(\\w+)\"" +
        "(?:,\"nulls\":\"\\d+\")?\\}").r
      def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
      entry.findAllMatchIn(body).map(m => unesc(m.group(1)) ->
        (unesc(m.group(2)), unesc(m.group(3)), m.group(4))).toMap
        .filter(_._2._3 != "null") // all-NULL marker: no usable range
    }.toOption.filter(_.nonEmpty)
  }

  /** Streaming ingest terminal: append one micro-batch as ONE new
    * segment, exactly-once BY CONSTRUCTION — the segment name is a
    * deterministic function of `batchId`, so a batch whose segment
    * was EVER added by any manifest is a redelivery
    * (crash-after-commit) and is skipped without data writes or a new
    * version — tested against the full manifest history, not just
    * the latest live set, so a compaction or vacuum that retired the
    * segment cannot open a double-append window. A crash BEFORE the commit leaves an orphan data dir the
    * redelivery simply overwrites before committing (and [[vacuum]]
    * reclaims if the stream never returns). O(delta): the batch's own
    * rows are the only data written, the commit is one manifest —
    * existing segments are never read or touched. Single-writer per
    * table (foreachBatch already serializes a query's batches; two
    * CONCURRENT streams must target different tables or families).
    *
    * `statsCols`: optionally record the segment's min/max sidecar
    * ([[writeSegmentStats]]) so filtered reads can skip it — the
    * streaming-ingest half of the format writer's `statsCols` option.
    *
    * `checks`: CHECK constraints validated against the WRITTEN
    * parquet segment (not the input plan — the input executes exactly
    * once, and the validated rows are BY CONSTRUCTION the rows that
    * would commit); a violation removes the segment and throws, so
    * nothing lands — not even an orphan dir.
    *
    * @return true if the batch was applied, false on redelivery. */
  def appendBatch(batch: org.apache.spark.sql.DataFrame, batchId: Long,
      tableDir: String, statsCols: Seq[String] = Seq.empty,
      bloomCols: Seq[String] = Seq.empty,
      checks: Seq[String] = Seq.empty,
      partitionCols: Seq[String] = Seq.empty): Boolean = {
    require(batchId >= 0, s"batchId must be >= 0, got $batchId")
    val seg = f"batch__$batchId%06d"
    // the redelivery test is "was batch__N EVER added in any
    // manifest", not "is it live at the latest version": a compaction
    // or vacuum may retire the segment between the original commit
    // and a crash-after-commit redelivery, and liveness alone would
    // then append the batch's rows a second time. The ledger folds
    // from the newest checkpoint's "ever" array (foldEverAdded), so a
    // long-lived stream pays O(CheckpointEvery) manifest reads per
    // batch, not O(history).
    // partitioned batches land as `batch__Np<i>` — the ledger test
    // covers both spellings (exact plain name, or any `p<i>` leaf of
    // the same batch id; the zero-padded id plus the literal 'p'
    // keeps distinct ids from prefix-matching each other)
    val everAdded = versions(tableDir).lastOption
      .exists(last => foldEverAdded(tableDir, last)
        .exists(s => s == seg || s.startsWith(seg + "p")))
    if (everAdded) false
    else {
      val segs =
        if (partitionCols.isEmpty) {
          batch.write.mode("overwrite").parquet(s"$tableDir/$seg")
          Seq(seg)
        } else writePartitionedSegments(batch, tableDir, partitionCols,
          seg, statsCols, bloomCols)
      graft.sources.txlog.TxLogChecks.validateWritten(
        batch.sparkSession, tableDir, segs, checks)
      if (partitionCols.isEmpty) {
        writeSegmentStats(batch.sparkSession, tableDir, seg, statsCols)
        writeSegmentBlooms(batch.sparkSession, tableDir, seg, bloomCols)
      }
      commit(tableDir, adds = segs)
      true
    }
  }

  /** Multi-FAMILY stores (the index stores: IVF postings + centroids,
    * LSH buckets, PQ codebook + codes, dedup banded/pairs/docs) keep
    * every family in ONE txlog by naming segments `<family>__<tag>` —
    * so one commit covers an install that touches several families
    * ATOMICALLY (no cross-log crash window), and a grow commits ONLY
    * its delta segments, never rewriting a sibling family. This
    * returns the live segments of one family at the latest version
    * (empty for a fresh store). */
  def familySegments(tableDir: String, family: String): Seq[String] =
    latestVersion(tableDir)
      .map(v => liveSegments(tableDir, v).filter(_.startsWith(family + "__")))
      .getOrElse(Seq.empty)
}
