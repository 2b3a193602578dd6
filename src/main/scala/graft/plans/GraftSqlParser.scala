package graft.plans

import graft.sources.TxLog
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.Bridge

/** SQL row-level DML and time travel for `USING graft-txlog` catalog
  * tables — the two keystrokes a SQL-first user reaches for right
  * after e50's CREATE/INSERT that Spark reserves for v2 catalogs:
  *
  * {{{
  *   DELETE FROM t WHERE o_orderkey % 4 = 1
  *   SELECT * FROM t VERSION AS OF 3
  * }}}
  *
  * Implemented as a DELEGATING PARSER (`SparkSessionExtensions
  * .injectParser` — the public extension point Delta used for exactly
  * these verbs before DSv2): every statement parses through Spark's
  * own parser first; the wrapper then rewrites only the two node
  * shapes Spark would otherwise reject for v1 tables, and ONLY when
  * the referenced catalog table's provider is this library's format —
  * any other table falls through untouched to Spark's own resolution
  * and its own errors.
  *
  *  - `DeleteFromTable(UnresolvedRelation, cond)` over a graft-txlog
  *    table → [[GraftTxLogDelete]]: the predicate's matched keys are
  *    scanned once and committed as ONE tombstone segment
  *    ([[TxLog.commitDeletes]]), O(matched keys) at any table size —
  *    never a data rewrite. The MoR read path (auto-derived keys,
  *    version-aware anti-join, CDF/compaction composition) already
  *    exists end to end, so SQL DELETE inherits it all.
  *  - `RelationTimeTravel(UnresolvedRelation, _, Some(v))` over a
  *    graft-txlog table → the format's `asOf` snapshot relation —
  *    `VERSION AS OF` is the SQL spelling of `option("asOf", v)`.
  *    `TIMESTAMP AS OF` is not supported (the manifest log records no
  *    wall-clock) and falls through to Spark's loud error.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    substitute(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    substitute(delegate.parsePlanWithParameters(sqlText, ctx))

  override def parseQuery(sqlText: String): LogicalPlan =
    substitute(delegate.parseQuery(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String)
      : org.apache.spark.sql.catalyst.FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String)
      : org.apache.spark.sql.types.StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String)
      : org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(sqlText)

  private def substitute(plan: LogicalPlan): LogicalPlan = plan match {
    case DeleteFromTable(u: UnresolvedRelation, cond) =>
      graftTable(u.multipartIdentifier) match {
        case Some((ti, _)) => GraftTxLogDelete(ti, PredicateHolder(cond))
        case None => plan
      }
    case _ => rewriteTimeTravel(plan)
  }

  /** VERSION AS OF may sit anywhere in a query tree — joins, subquery
    * expressions (IN/EXISTS/scalar, which a plain transformUp never
    * visits), AND CTE definitions (`UnresolvedWith.cteRelations` are
    * innerChildren, outside every transform's walk — recursed
    * explicitly). The walk costs one pattern match per node and
    * rewrites nothing unless the node is a version-pinned graft-txlog
    * reference. */
  private def rewriteTimeTravel(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.copy(cteRelations = w.cteRelations.map { case (n, sa, m) =>
          (n, rewriteTimeTravel(sa).asInstanceOf[SubqueryAlias], m)
        })
      case tt @ RelationTimeTravel(u: UnresolvedRelation, None, Some(v)) =>
        graftTable(u.multipartIdentifier) match {
          case Some((ti, meta)) =>
            // the format's own time travel, spliced in as an
            // already-resolved relation; aliased with the table name
            // so qualified column references keep resolving
            SubqueryAlias(ti.table,
              Bridge.analyzed(GraftSqlParser.asOfRead(session, meta, v)))
          case None => tt
        }
    }

  /** The catalog table behind a (possibly qualified) name, ONLY when
    * it exists and its provider is this library's format; None for
    * temp views, other providers, other catalogs, or any lookup
    * failure — those fall through to Spark's own path untouched. */
  private def graftTable(parts: Seq[String])
      : Option[(TableIdentifier, CatalogTable)] = {
    val ti = parts match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case Seq(cat, db, t) if cat.equalsIgnoreCase("spark_catalog") =>
        TableIdentifier(t, Some(db))
      case _ => return None
    }
    try {
      val catalog = session.sessionState.catalog
      if (catalog.isTempView(parts)) None
      else if (!catalog.tableExists(ti)) None
      else {
        val meta = catalog.getTableMetadata(ti)
        val graft = meta.provider.map(_.toLowerCase).exists(p =>
          p == "graft-txlog" || p == "graft.sources.txlog")
        if (graft) Some((ti, meta)) else None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}

object GraftSqlParser {
  /** The table dir as a local path (the catalog stores a file: URI;
    * the manifest log is java.nio local I/O). */
  private[plans] def localPath(meta: CatalogTable): String = {
    val loc = meta.location.toString
    if (loc.startsWith("file:")) new java.net.URI(loc).getPath else loc
  }

  /** The format read of a catalog table, its stored OPTIONS (keyCols,
    * statsCols, …) carried over, pinned at `asOf` when given. */
  private[plans] def asOfRead(session: SparkSession, meta: CatalogTable,
      asOf: String): org.apache.spark.sql.DataFrame = {
    val r = session.read.format("graft.sources.txlog")
      .options(meta.storage.properties)
    (if (asOf == null) r else r.option("asOf", asOf.trim))
      .load(localPath(meta))
  }
}

/** `DELETE FROM <graft-txlog table> WHERE <predicate>` — one
  * predicate-matched key scan, one tombstone segment, one commit
  * ([[TxLog.commitDeletes]]). O(matched keys): no data segment is
  * read back for a rewrite, which at 100 TB is the difference between
  * a metadata operation and rewriting the table. Matched keys are the
  * table's `keyCols` option when declared, else ALL columns (full-row
  * tombstones — exact SQL DELETE semantics including duplicates,
  * since the MoR anti-join kills every equal row). A predicate
  * matching nothing commits nothing. The delete applies to segments
  * live BEFORE the commit and to nothing after — later re-inserts of
  * the same key survive (the format's version-aware rule), CDF
  * streams continue across it (e48), and compaction retires it
  * (compactMoR). */
/** Opaque wrapper keeping the still-unresolved DELETE predicate out of
  * TreeNode's expression collection: the command resolves it itself at
  * run time against the table's own frame (`df.filter`), exactly where
  * the column names are in scope — CheckAnalysis would otherwise try
  * (and fail) to resolve it against the leaf command's empty output. */
case class PredicateHolder(e: Expression)

case class GraftTxLogDelete(ident: TableIdentifier,
    predicate: PredicateHolder) extends LeafRunnableCommand {
  private def condition: Expression = predicate.e
  override def run(session: SparkSession): Seq[Row] = {
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    val dir = GraftSqlParser.localPath(meta)
    // the MoR-by-default read: already-deleted rows can't re-match
    val table = GraftSqlParser.asOfRead(session, meta, asOf = null)
    val props = CaseInsensitiveMap(meta.storage.properties)
    val keys = props.get("keyCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(table.columns.toSeq)
    val matched = table.filter(Bridge.column(condition))
      .select(keys.map(col): _*).distinct()
    if (!matched.isEmpty) {
      TxLog.commitDeletes(matched, dir)
      // V1 relations pin their version at creation — drop the cached
      // one so the next spark.table() sees the post-delete snapshot
      session.catalog.refreshTable(ident.quotedString)
    }
    Seq.empty
  }
}
