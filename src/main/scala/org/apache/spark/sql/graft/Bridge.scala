package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's package-private Column ⇄ Expression
  * converters (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * graft's native expressions get Column-API entry points. Same
  * pattern as public Spark-extension libraries (e.g. Qbeast's
  * DatasetFactory); no Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The analyzed logical plan behind a DataFrame — input for building
    * custom logical nodes (graft.plans.AsOfJoinNode) whose children
    * are existing frames. */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  /** Wrap a custom logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — the entry point every Spark extension library
    * needs to surface a custom operator through the public API. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Run `f` with the context's checkpoint dir temporarily swapped —
    * `SparkContext.setCheckpointDir` has no public inverse, and tests
    * of checkpoint-mode-sensitive operators (graft.operators.Components)
    * must not leak a reliable-checkpoint setting into the shared
    * session. `checkpointDir` is `private[spark]`, reachable from this
    * package. The dir must already exist (setCheckpointDir's mkdirs is
    * bypassed). */
  def withCheckpointDir[T](sc: org.apache.spark.SparkContext,
      dir: Option[String])(f: => T): T = {
    val prev = sc.checkpointDir
    sc.checkpointDir = dir
    try f finally sc.checkpointDir = prev
  }

  /** The materialization action for the truncation helpers below,
    * fused with an exact sum of a long column — an iterative driver
    * loop (graft.operators.Components) needs a convergence scalar
    * every round, and computing it during the materialization pass
    * halves the jobs per round versus materialize-then-aggregate.
    * Long-chunked BigInteger accumulation: exact at any node count
    * (the decimal-overflow rationale: 10^9 nodes × 10^18-sized ids
    * overflow a plain long sum), order-independent. */
  private def materializeWithSum(
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      sumIdx: Int): (java.math.BigInteger, Long) =
    rdd.mapPartitions { it =>
      var big = java.math.BigInteger.ZERO
      var acc = 0L
      var n = 0L
      while (it.hasNext) {
        val r = it.next()
        n += 1
        if (!r.isNullAt(sumIdx)) {
          val v = r.getLong(sumIdx)
          if ((v > 0 && acc > Long.MaxValue - v) ||
              (v < 0 && acc < Long.MinValue - v)) {
            big = big.add(java.math.BigInteger.valueOf(acc)); acc = v
          } else acc += v
        }
      }
      Iterator.single((big.add(java.math.BigInteger.valueOf(acc)), n))
    }.fold((java.math.BigInteger.ZERO, 0L)) { case ((s1, n1), (s2, n2)) =>
      (s1.add(s2), n1 + n2)
    }

  /** Local lineage truncation with an explicit block-release handle.
    *
    * `Dataset.localCheckpoint` persists the materialized rows but gives
    * the caller no way to free them — in an iterative algorithm the
    * superseded rounds' blocks pile up until a GC-driven ContextCleaner
    * pass. This does what `localCheckpoint(eager = true)` does (copy
    * the unsafe rows, localCheckpoint the internal RDD, materialize),
    * but returns the RDD's `unpersist` so each round can free its
    * predecessor deterministically — plus the fused exact sum of the
    * long column at `sumIdx`. Safe to call the release only once every
    * downstream consumer has moved to a newer frame — after truncation
    * the RDD cannot be recomputed. */
  def truncatedLocalSum(df: org.apache.spark.sql.DataFrame, sumIdx: Int)
      : (org.apache.spark.sql.DataFrame, java.math.BigInteger, () => Unit) = {
    val (out, sum, _, release) = truncatedLocalSumN(df, sumIdx)
    (out, sum, release)
  }

  /** [[truncatedLocalSum]] plus the ROW COUNT, fused into the same
    * materialization pass — iterative operators that gate a per-round
    * join strategy on the frame's size (Bfs frontier broadcasts) read
    * it for free instead of paying a count job. */
  def truncatedLocalSumN(df: org.apache.spark.sql.DataFrame, sumIdx: Int)
      : (org.apache.spark.sql.DataFrame, java.math.BigInteger, Long,
        () => Unit) = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    // unsafe rows are reused by the scan — copy before persisting,
    // exactly as Dataset.checkpoint does
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    val (sum, n) = materializeWithSum(rdd, sumIdx)
    val out = ds.sparkSession.internalCreateDataFrame(rdd, ds.schema)
    (out, sum, n, () => { rdd.unpersist(blocking = false); () })
  }

  /** Reliable lineage truncation with an explicit file-release handle.
    *
    * `Dataset.checkpoint(eager = true)` leaves every round's snapshot
    * on the checkpoint dir: the ContextCleaner only deletes checkpoint
    * files when `spark.cleaner.referenceTracking.cleanCheckpoints` is
    * on (default FALSE) — an iterative loop would otherwise write one
    * full copy of its state per round and delete none. Same shape as
    * [[truncatedLocalSum]]: the release deletes the superseded round's
    * files deterministically; call it only once every consumer has
    * moved to a newer frame (the data is gone afterwards). The RDD is
    * cached across the materialize action so the checkpoint write
    * reads the cache instead of recomputing the whole round's lineage
    * (RDD.checkpoint's documented recomputation pitfall); the cache is
    * dropped as soon as the file is written. Requires a checkpoint dir
    * on the context. */
  def truncatedReliableSum(df: org.apache.spark.sql.DataFrame, sumIdx: Int)
      : (org.apache.spark.sql.DataFrame, java.math.BigInteger, () => Unit) = {
    val (out, sum, _, release) = truncatedReliableSumN(df, sumIdx)
    (out, sum, release)
  }

  /** [[truncatedReliableSum]] plus the fused row count (see
    * [[truncatedLocalSumN]]). */
  def truncatedReliableSumN(df: org.apache.spark.sql.DataFrame, sumIdx: Int)
      : (org.apache.spark.sql.DataFrame, java.math.BigInteger, Long,
        () => Unit) = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val sc = ds.sparkSession.sparkContext
    require(sc.getCheckpointDir.isDefined,
      "truncatedReliableSum needs SparkContext.setCheckpointDir")
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.checkpoint()
    val (sum, n) = materializeWithSum(rdd, sumIdx) // also writes the checkpoint
    val out = ds.sparkSession.internalCreateDataFrame(rdd, ds.schema)
    val release = () => rdd.getCheckpointFile.foreach { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(sc.hadoopConfiguration).delete(path, true)
    }
    rdd.unpersist(blocking = false)            // reads now hit the file
    (out, sum, n, release)
  }

  /** Checkpoint-dir dispatch shared by the iterative operators
    * (Components, PageRank): reliable truncation when a dir is set
    * (survives executor loss — cluster deployment), local blocks
    * otherwise (local/test). The fused sum reads the raw 8-byte slot
    * at `sumIdx` (InternalRow.getLong) — a non-long column there would
    * be misread SILENTLY, so refuse it here for every caller. */
  def truncatedAutoSum(df: org.apache.spark.sql.DataFrame, sumIdx: Int)
      : (org.apache.spark.sql.DataFrame, java.math.BigInteger, () => Unit) = {
    val (out, sum, _, release) = truncatedAutoSumN(df, sumIdx)
    (out, sum, release)
  }

  /** [[truncatedAutoSum]] plus the fused row count (see
    * [[truncatedLocalSumN]]). */
  def truncatedAutoSumN(df: org.apache.spark.sql.DataFrame, sumIdx: Int)
      : (org.apache.spark.sql.DataFrame, java.math.BigInteger, Long,
        () => Unit) = {
    require(df.schema(sumIdx).dataType ==
        org.apache.spark.sql.types.LongType,
      s"truncatedAutoSum needs a LONG column at $sumIdx, " +
        s"got ${df.schema(sumIdx).dataType}")
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      truncatedReliableSumN(df, sumIdx)
    else truncatedLocalSumN(df, sumIdx)
  }

  /** Lineage truncation for BOUNDED frames (cardinality ∝ groups /
    * groups×buckets, never row count) that stay referenced by the
    * RETURNED lazy plan — so no release handle is possible and the
    * snapshot must survive until the consumer's action. Dispatch
    * mirrors [[truncatedAutoSum]]: a reliable checkpoint when the
    * context has a checkpoint dir (survives executor loss — the
    * cluster deployment; `Dataset.checkpoint`'s files are reaped by
    * ContextCleaner only under
    * `spark.cleaner.referenceTracking.cleanCheckpoints`, which a
    * deployment setting a dir should enable), executor-local blocks
    * otherwise (local/test — identical plan to the previous bare
    * `localCheckpoint(true)` call sites). */
  def truncateBounded(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Every persistent RDD in the context that is LOCALLY CHECKPOINTED
    * — the executor-pinned snapshots that per-call lineage truncation
    * ([[truncateBounded]], [[truncatedLocalSum]]) leaves behind when
    * the call site cannot own a release (the snapshot feeds a lazy
    * plan returned to the caller). A session-long driver (Bench,
    * Verify) sweeps these BETWEEN entries: once an entry's action has
    * run, its snapshots are dead weight — unreleased, they accumulate
    * into GC/eviction churn that taxes every later entry (measured:
    * r17's one-directional late-alphabet slowdown). Callers must NOT
    * sweep ids created by builds that outlive an entry (DfCache pins
    * etc.) — hence the exclude set, snapshot before the entry. */
  def locallyCheckpointedIds(sc: org.apache.spark.SparkContext)
      : Set[Int] =
    sc.getPersistentRDDs.collect {
      // RDD.isLocallyCheckpointed is private[rdd]; its implementation
      // — checkpointData is a LocalRDDCheckpointData — is reachable
      // from this package (both are private[spark])
      case (id, rdd) if rdd.checkpointData.exists(
          _.isInstanceOf[org.apache.spark.rdd.LocalRDDCheckpointData[_]]) =>
        id
    }.toSet

  /** Unpersist (non-blocking) the given persistent RDD ids if still
    * registered. */
  def unpersistIds(sc: org.apache.spark.SparkContext,
      ids: Set[Int]): Unit = {
    val live = sc.getPersistentRDDs
    ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
  }

  /** Drain the context's async listener bus — a test asserting on
    * SparkListener counters must flush pending events first;
    * `listenerBus` is `private[spark]`, reachable from this package. */
  def drainListenerBus(sc: org.apache.spark.SparkContext,
      timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)

  /** The inverse of [[asStreaming]]: re-wrap a V1 `Sink.addBatch`
    * frame (tagged isStreaming=true, so every batch write verb
    * refuses it) as a plain BATCH frame over the micro-batch's
    * executed rows — exactly what ForeachBatchSink does internally
    * before handing the frame to user code. One downstream action
    * executes the rows once; no copy is taken here. */
  def asBatch(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }

  /** Tag a batch DataFrame as STREAMING — the V1 `Source.getBatch`
    * contract: MicroBatchExecution rejects a returned frame whose
    * plan is not streaming, and the blessed way to satisfy it is an
    * `isStreaming = true` LogicalRDD over the batch plan's executed
    * rows (FileStreamSource does exactly this internally). The
    * physical plan freezes at call time, which is right for a
    * micro-batch: the span's segment set is already pinned. */
  def asStreaming(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }
}
