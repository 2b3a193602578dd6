package graft.sources.txlog

import graft.sources.TxLog
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft.sources.txlog")` — the transaction-log
  * table as a FIRST-CLASS DataSource, so a SQL/DataFrame user reaches
  * the format the way they reach parquet (and `CREATE TABLE ... USING
  * graft.sources.txlog` works through the catalog):
  *
  * {{{
  *   spark.read.format("graft.sources.txlog")
  *     .option("asOf", 3)                   // time travel (default: latest)
  *     .option("keyCols", "id")             // merge-on-read tombstones
  *     .load(dir)
  *   df.write.format("graft.sources.txlog")
  *     .mode(SaveMode.Append).save(dir)     // one segment, one commit
  * }}}
  *
  * Built on the STABLE V1 source API ([[RelationProvider]] +
  * [[PrunedFilteredScan]]): `buildScan` applies the pruned columns and
  * pushed filters to the inner [[TxLog.snapshot]]/[[TxLog.snapshotMoR]]
  * DataFrame BEFORE taking its RDD, so column pruning and predicate
  * pushdown reach the underlying parquet segment scans (the inner plan
  * is a normal multi-path parquet read with PushedFilters). The known
  * cost of the V1 bridge: the outer plan sees an RDD scan, so the
  * format boundary is a codegen fence — right for the interactive /
  * catalog surface this serves; performance-critical pipelines call
  * TxLog.snapshot directly and stay fused (both paths are the same
  * segments, same manifests).
  */
class DefaultSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-txlog"

  private def path(parameters: Map[String, String]): String = {
    val p = parameters.getOrElse("path",
      sys.error("graft.sources.txlog needs a path — use .load(dir)"))
    // the catalog resolves CREATE TABLE ... OPTIONS(path …) to a
    // file: URI; TxLog's manifest log is java.nio-based local I/O
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val dir = path(parameters)
    val asOf = parameters.get("asOf").map(_.trim.toInt)
      .orElse(TxLog.latestVersion(dir))
      .getOrElse(sys.error(s"txlog table $dir has no commits"))
    val keyCols = parameters.get("keyCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    TxLogRelation(sqlContext, dir, asOf, keyCols)
  }

  /** `df.write.format("graft.sources.txlog").mode(Append).save(dir)`:
    * the batch lands as ONE segment behind one atomic manifest commit
    * (the [[TxLog.appendBatch]] discipline with a write-scoped segment
    * name). Append-only by design: Overwrite/ErrorIfExists semantics
    * belong to rebuild tools, not the generic writer. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    require(mode == SaveMode.Append,
      s"graft.sources.txlog writes are append-only (one segment, one " +
        s"commit); got mode $mode")
    val dir = path(parameters)
    new java.io.File(dir).mkdirs()
    val seg = f"write__seg${TxLog.versions(dir).size}%06d"
    data.write.mode("overwrite").parquet(s"$dir/$seg")
    TxLog.commit(dir, adds = Seq(seg))
    createRelation(sqlContext, parameters - "asOf")
  }
}

/** The snapshot (or merge-on-read snapshot) of one txlog table at one
  * version, as a V1 relation with column pruning + filter pushdown
  * delegated to the inner parquet scan. */
case class TxLogRelation(sqlContext: SQLContext, dir: String, asOf: Int,
    keyCols: Option[Seq[String]]) extends BaseRelation
    with PrunedFilteredScan {

  private def snapshotDf: DataFrame = keyCols match {
    case Some(keys) =>
      TxLog.snapshotMoR(sqlContext.sparkSession, dir, asOf, keys)
    case None => TxLog.snapshot(sqlContext.sparkSession, dir, asOf)
  }

  override def schema: StructType = snapshotDf.schema

  // V1 contract: filters returned here are re-evaluated by Spark
  // above the scan; handling them all inside the inner DataFrame
  // (where they push into the parquet reader) and declaring none
  // unhandled keeps the work single-sided.
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filterNot(translate(_).isDefined)

  private def translate(f: Filter): Option[org.apache.spark.sql.Column] =
    f match {
      case EqualTo(a, v) => Some(col(a) === v)
      case GreaterThan(a, v) => Some(col(a) > v)
      case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
      case LessThan(a, v) => Some(col(a) < v)
      case LessThanOrEqual(a, v) => Some(col(a) <= v)
      case In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
      case IsNull(a) => Some(col(a).isNull)
      case IsNotNull(a) => Some(col(a).isNotNull)
      case StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case And(l, r) =>
        for (lc <- translate(l); rc <- translate(r)) yield lc && rc
      case Or(l, r) =>
        for (lc <- translate(l); rc <- translate(r)) yield lc || rc
      case Not(c) => translate(c).map(!_)
      case _ => None
    }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val base = snapshotDf
    val filtered = filters.flatMap(translate)
      .foldLeft(base)((df, c) => df.filter(c))
    // always select exactly the required columns — V1 consumes rows
    // positionally against requiredColumns, including the zero-column
    // COUNT(*) shape
    filtered.select(requiredColumns.map(col).toSeq: _*).rdd
  }
}
