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

  /** Local lineage truncation with an explicit block-release handle.
    *
    * `Dataset.localCheckpoint` persists the materialized rows but gives
    * the caller no way to free them — in an iterative algorithm the
    * superseded rounds' blocks pile up until a GC-driven ContextCleaner
    * pass. This does what `localCheckpoint(eager = true)` does (copy
    * the unsafe rows, localCheckpoint the internal RDD, materialize),
    * but returns the RDD's `unpersist` so each round can free its
    * predecessor deterministically. Safe to call the release only
    * once every downstream consumer has moved to a newer frame —
    * after truncation the RDD cannot be recomputed.
    */
  /** Reliable lineage truncation with an explicit file-release handle.
    *
    * `Dataset.checkpoint(eager = true)` leaves every round's snapshot
    * on the checkpoint dir: the ContextCleaner only deletes checkpoint
    * files when `spark.cleaner.referenceTracking.cleanCheckpoints` is
    * on (default FALSE) — an iterative loop would otherwise write one
    * full copy of its state per round and delete none. Same shape as
    * [[truncatedLocal]]: the release deletes the superseded round's
    * files deterministically; call it only once every consumer has
    * moved to a newer frame (the data is gone afterwards). Requires a
    * checkpoint dir on the context. */
  def truncatedReliable(df: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, () => Unit) = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val sc = ds.sparkSession.sparkContext
    require(sc.getCheckpointDir.isDefined,
      "truncatedReliable needs SparkContext.setCheckpointDir")
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.checkpoint()
    rdd.count()
    val out = ds.sparkSession.internalCreateDataFrame(rdd, ds.schema)
    val release = () => rdd.getCheckpointFile.foreach { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(sc.hadoopConfiguration).delete(path, true)
    }
    (out, release)
  }

  def truncatedLocal(df: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, () => Unit) = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    // unsafe rows are reused by the scan — copy before persisting,
    // exactly as Dataset.checkpoint does
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count()
    val out = ds.sparkSession.internalCreateDataFrame(rdd, ds.schema)
    (out, () => { rdd.unpersist(blocking = false); () })
  }
}
