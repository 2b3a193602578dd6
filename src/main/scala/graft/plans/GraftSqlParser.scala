package graft.plans

import graft.sources.TxLog
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateTable}
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
  *    `TIMESTAMP AS OF ts` resolves the wall-clock to a version via
  *    the manifest commit times ([[TxLog.versionAtTimestamp]]:
  *    greatest commit ≤ ts, Delta's rule) and reads that snapshot.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    maintenanceVerb(sqlText)
      .getOrElse(substitute(delegate.parsePlan(sqlText)))

  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    maintenanceVerb(sqlText)
      .getOrElse(substitute(delegate.parsePlanWithParameters(sqlText, ctx)))

  // ---- maintenance keystrokes Spark's grammar does not know --------
  //
  // `OPTIMIZE t` / `VACUUM t [RETAIN n VERSIONS]` / `DESCRIBE HISTORY
  // t` — Delta's maintenance surface on the txlog format. Matched
  // BEFORE delegation (Delta's DeltaSqlParser discipline): OPTIMIZE
  // and VACUUM are parse errors in Spark's grammar, but `DESCRIBE
  // HISTORY t` would mis-parse as describing a table named HISTORY —
  // so the statement is claimed only when its identifier resolves to a
  // graft-txlog catalog table, and every other statement (including
  // DESCRIBE over a real table named HISTORY) delegates untouched.

  private val OptimizeRe =
    ("""(?is)\s*OPTIMIZE\s+([\w.`]+)(?:\s+WHERE\s+(.+?))?""" +
      """(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*""").r
  private val RepartitionRe =
    ("""(?is)\s*OPTIMIZE\s+([\w.`]+)\s+REPARTITION\s+BY""" +
      """\s*\(([^)]+)\)\s*;?\s*""").r
  private val VacuumRe =
    ("""(?is)\s*VACUUM\s+([\w.`]+?)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?""" +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS)?(?:\s+(FORCE))?\s*;?\s*""").r
  private val HistoryRe =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([\w.`]+)\s*;?\s*""".r
  private val ShowPartitionsRe =
    """(?is)\s*SHOW\s+PARTITIONS\s+([\w.`]+)\s*;?\s*""".r
  private val DescribeDetailRe =
    """(?is)\s*DESCRIBE\s+DETAIL\s+([\w.`]+)\s*;?\s*""".r
  private val RestoreRe =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?([\w.`]+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val RestoreTsRe =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?([\w.`]+)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  private val ConvertRe =
    ("""(?is)\s*CONVERT\s+TO\s+GRAFT\s+parquet\s*\.\s*`([^`]+)`""" +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]+)\))?\s*;?\s*""").r
  private val CloneRe =
    ("""(?is)\s*CREATE\s+TABLE\s+([\w.`]+)\s+SHALLOW\s+CLONE\s+""" +
      """([\w.`]+)(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*""").r

  private def identParts(raw: String): Seq[String] =
    raw.split("\\.").map(_.stripPrefix("`").stripSuffix("`")).toSeq

  private def maintenanceVerb(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      // CONVERT is path-based (there is no table yet) and not Spark
      // grammar — claimed whenever it parses
      case ConvertRe(path, pby) => Some(GraftTxLogConvert(path,
        Option(pby).map(_.split(",")
          .map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty).toSeq)))
      // CLONE is claimed only when the SOURCE is a graft-txlog table;
      // any other source falls through to Spark's own parse error
      case CloneRe(target, source, location) =>
        graftTable(identParts(source)).flatMap { case (srcTi, _) =>
          identParts(target) match {
            case Seq(t) => Some(GraftTxLogClone(TableIdentifier(t), srcTi,
              Option(location)))
            case Seq(db, t) => Some(GraftTxLogClone(
              TableIdentifier(t, Some(db)), srcTi, Option(location)))
            case _ => None
          }
        }
      case _ => (sqlText match {
        case RepartitionRe(ident, cols) =>
          Some((ident, (ti: TableIdentifier) =>
            GraftTxLogRepartition(ti, cols.split(",")
              .map(_.trim.stripPrefix("`").stripSuffix("`"))
              .filter(_.nonEmpty).toSeq)))
        case OptimizeRe(ident, where, zorder) =>
          Some((ident, (ti: TableIdentifier) =>
            GraftTxLogOptimize(ti, Option(zorder).toSeq.flatMap(
              _.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
                .filter(_.nonEmpty)), Option(where))))
        case VacuumRe(ident, retain, hours, force) => Some((ident,
          (ti: TableIdentifier) => GraftTxLogVacuum(ti,
            Option(retain).map(_.toInt), Option(hours).map(_.toInt),
            force != null)))
        case HistoryRe(ident) => Some((ident, (ti: TableIdentifier) =>
          GraftTxLogHistory(ti)))
        // claimed only for graft-txlog identifiers (the flatMap below):
        // SHOW PARTITIONS over any other table falls through to
        // Spark's own resolution and its own errors, and DESCRIBE
        // DETAIL to Spark's parse of a table named DETAIL
        case ShowPartitionsRe(ident) => Some((ident,
          (ti: TableIdentifier) => GraftTxLogShowPartitions(ti)))
        case DescribeDetailRe(ident) => Some((ident,
          (ti: TableIdentifier) => GraftTxLogDescribeDetail(ti)))
        case RestoreRe(ident, v) => Some((ident, (ti: TableIdentifier) =>
          GraftTxLogRestore(ti, Some(v.toInt), None)))
        case RestoreTsRe(ident, ts) => Some((ident, (ti: TableIdentifier) =>
          GraftTxLogRestore(ti, None, Some(ts))))
        case _ => None
      }).flatMap { case (ident, build) =>
        graftTable(identParts(ident)).map { case (ti, _) => build(ti) }
      }
    }

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

  private def substitute(plan0: LogicalPlan): LogicalPlan = {
    // time travel first, so VERSION AS OF composes inside DML sources
    // (MERGE ... USING (SELECT ... FROM t VERSION AS OF 3) s ...)
    val plan = rewriteTimeTravel(plan0)
    plan match {
      case DeleteFromTable(rel, cond) =>
        targetOf(rel) match {
          case Some((ti, alias, _)) =>
            GraftTxLogDelete(ti, alias, PredicateHolder(cond))
          case None => plan
        }
      case u: UpdateTable =>
        targetOf(u.table) match {
          case Some((ti, alias, _)) =>
            GraftTxLogUpdate(ti, alias, AssignmentsHolder(u.assignments),
              PredicateHolder(u.condition.getOrElse(
                org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)))
          case None => plan
        }
      case a: org.apache.spark.sql.catalyst.plans.logical.AddColumns =>
        a.table match {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
            graftTable(u.multipartIdentifier) match {
              case Some((ti, _)) => GraftTxLogAddColumns(ti,
                a.columnsToAdd.map { c =>
                  require(c.path.isEmpty && c.name.size == 1,
                    s"ALTER TABLE ${ti.table} ADD COLUMNS: nested field " +
                      s"'${c.name.mkString(".")}' — the format stores " +
                      "rows, not cells; add top-level columns only")
                  require(c.nullable,
                    s"ALTER TABLE ${ti.table} ADD COLUMNS: column " +
                      s"'${c.colName}' is NOT NULL — pre-evolution rows " +
                      "read the added column as NULL, so it must be " +
                      "nullable")
                  require(c.position.isEmpty,
                    s"ALTER TABLE ${ti.table} ADD COLUMNS: FIRST/AFTER " +
                      "positions are not supported — added columns " +
                      "append at the end")
                  require(c.default.isEmpty,
                    s"ALTER TABLE ${ti.table} ADD COLUMNS: DEFAULT " +
                      "values are not supported — pre-evolution rows " +
                      "read NULL")
                  c.colName -> c.dataType
                })
              case None => plan
            }
          case _ => plan
        }
      case d: org.apache.spark.sql.catalyst.plans.logical.DropColumns =>
        d.table match {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
            graftTable(u.multipartIdentifier) match {
              case Some((ti, _)) => GraftTxLogDropColumns(ti,
                d.columnsToDrop.map { c =>
                  require(c.name.size == 1,
                    s"ALTER TABLE ${ti.table} DROP COLUMNS: nested " +
                      s"field '${c.name.mkString(".")}' — the format " +
                      "stores rows, not cells; drop top-level columns " +
                      "only")
                  c.name.head
                }, d.ifExists)
              case None => plan
            }
          case _ => plan
        }
      case r: org.apache.spark.sql.catalyst.plans.logical.RenameColumn =>
        r.table match {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
            graftTable(u.multipartIdentifier) match {
              case Some((ti, _)) =>
                require(r.column.name.size == 1,
                  s"ALTER TABLE ${ti.table} RENAME COLUMN: nested " +
                    s"field '${r.column.name.mkString(".")}' — the " +
                    "format stores rows, not cells; rename top-level " +
                    "columns only")
                GraftTxLogRenameColumn(ti, r.column.name.head, r.newName)
              case None => plan
            }
          case _ => plan
        }
      case m: MergeIntoTable =>
        targetOf(m.targetTable) match {
          case Some((ti, alias, _)) =>
            require(!m.withSchemaEvolution,
              "MERGE WITH SCHEMA EVOLUTION is not supported on graft-txlog " +
                "tables: evolve through writes (mergeSchema), then merge")
            GraftTxLogMerge(ti, alias, MergeHolder(m.sourceTable,
              m.mergeCondition, m.matchedActions, m.notMatchedActions,
              m.notMatchedBySourceActions))
          case None => plan
        }
      case _ => plan
    }
  }

  /** The graft-txlog catalog table a DML statement targets, seen
    * through its optional alias (`UPDATE t AS x ...` parses the target
    * as SubqueryAlias(x, UnresolvedRelation(t))); None when the target
    * is any other shape or any other provider — the statement then
    * falls through to Spark untouched. */
  private def targetOf(rel: LogicalPlan)
      : Option[(TableIdentifier, Option[String], CatalogTable)] = rel match {
    case u: UnresolvedRelation =>
      graftTable(u.multipartIdentifier).map { case (ti, m) => (ti, None, m) }
    case SubqueryAlias(id, u: UnresolvedRelation) =>
      graftTable(u.multipartIdentifier).map { case (ti, m) =>
        (ti, Some(id.name), m) }
    case _ => None
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
      case tvf: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
          if tvf.name.map(_.toLowerCase) == Seq("table_changes") =>
        tableChangesPlan(tvf).getOrElse(tvf)
      case tt @ RelationTimeTravel(u: UnresolvedRelation, Some(ts), None) =>
        graftTable(u.multipartIdentifier) match {
          case Some((ti, meta)) =>
            // TIMESTAMP AS OF: resolve the wall-clock to a version via
            // the manifest commit times (Delta's rule: greatest commit
            // ≤ the timestamp), then read that pinned snapshot
            val millis = GraftSqlParser.evalTimestampMillis(session, ts)
            val v = TxLog.versionAtTimestamp(
              GraftSqlParser.localPath(meta), millis)
            SubqueryAlias(ti.table,
              Bridge.analyzed(GraftSqlParser.asOfRead(session, meta,
                v.toString)))
          case None => tt
        }
    }

  /** `table_changes('t', startV [, endV])` — Delta's change-data-feed
    * TVF on the txlog format: the span's changes as rows tagged
    * `_change_type` ∈ {insert, delete} and `_commit_version`
    * ([[TxLog.changesCdf]]; startV/endV are INCLUSIVE commit versions,
    * Delta's contract — endV defaults to the latest). Resolved at
    * parse time like the time-travel rewrites; any first argument
    * that is not a graft-txlog table name falls through to Spark's
    * own unresolved-function error. O(delta): only the span's own
    * segments are read, at any table size. */
  private def tableChangesPlan(
      tvf: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction)
      : Option[LogicalPlan] = {
    def evalLit(e: Expression): Option[Any] =
      if (e.foldable) Option(e.eval(null)) else None
    for {
      nameArg <- tvf.functionArgs.headOption
      name <- evalLit(nameArg).map(_.toString)
      (ti, meta) <- graftTable(identParts(name))
    } yield {
      require(tvf.functionArgs.size >= 2 && tvf.functionArgs.size <= 3,
        "table_changes(table, startVersion [, endVersion]) takes 2 or 3 " +
          s"arguments, got ${tvf.functionArgs.size}")
      val dir = GraftSqlParser.localPath(meta)
      // each bound is a literal VERSION (integer) or TIMESTAMP
      // (string/timestamp literal — Delta's dual contract): the start
      // timestamp resolves to the first commit AT OR AFTER it, the
      // end timestamp to the last commit AT OR BEFORE it, so a
      // clock-bounded window reads exactly the commits inside it
      def bound(e: Expression, what: String, isStart: Boolean): Int =
        evalLit(e).map {
          case n: java.lang.Number => n.intValue
          case s if s.toString.matches("-?\\d+") => s.toString.toInt
          case _ =>
            val millis = GraftSqlParser.evalTimestampMillis(session, e)
            if (isStart) TxLog.versionAtOrAfterTimestamp(dir, millis)
            else TxLog.versionAtTimestamp(dir, millis)
        }.getOrElse(throw new IllegalArgumentException(
          s"table_changes: $what must be a literal version or timestamp"))
      val from = bound(tvf.functionArgs(1), "startVersion", isStart = true)
      val to = tvf.functionArgs.lift(2)
        .map(e => bound(e, "endVersion", isStart = false))
        .orElse(TxLog.latestVersion(dir))
        .getOrElse(throw new IllegalArgumentException(
          s"table_changes: $name has no commits"))
      SubqueryAlias("table_changes", Bridge.analyzed(
        TxLog.changesCdf(session, dir, from - 1, to)))
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

  /** Evaluate a `TIMESTAMP AS OF` expression to epoch millis in the
    * session timezone — literals (and foldable expressions over them)
    * only: the version must pin at PARSE time, before any distributed
    * execution exists. */
  private[plans] def evalTimestampMillis(session: SparkSession,
      e: Expression): Long = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.TimestampType
    val zone = session.sessionState.conf.sessionLocalTimeZone
    val cast = Cast(e, TimestampType, Some(zone))
    require(e.foldable, "TIMESTAMP AS OF over a graft-txlog table needs " +
      s"a literal timestamp, got ${e.sql}")
    val micros = cast.eval(null)
    require(micros != null,
      s"TIMESTAMP AS OF: cannot parse ${e.sql} as a timestamp")
    Math.floorDiv(micros.asInstanceOf[Long], 1000L)
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
/** Opaque wrappers keeping still-unresolved DML expressions out of
  * TreeNode's expression collection: each command resolves them itself
  * at run time against the table's own frame (`df.filter`/`select`),
  * exactly where the column names are in scope — CheckAnalysis would
  * otherwise try (and fail) to resolve them against the leaf command's
  * empty output. */
case class PredicateHolder(e: Expression)
case class AssignmentsHolder(
    a: Seq[org.apache.spark.sql.catalyst.plans.logical.Assignment])
case class MergeHolder(source: LogicalPlan, cond: Expression,
    matchedActions: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction],
    notMatchedActions: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction],
    notMatchedBySourceActions: Seq[org.apache.spark.sql.catalyst.plans.logical.MergeAction])

/** Shared row-level-DML machinery: the snapshot read, key selection,
  * assignment resolution, and the ONE-COMMIT write protocol every verb
  * ends in — tombstone segment (old keys) + replacement segment (new
  * rows) installed by a single atomic manifest, so no reader ever sees
  * the half-applied state. The version-aware MoR rule makes the single
  * commit CORRECT, not just atomic: both segments land at the same
  * version V, a tombstone kills only rows from segments with version
  * < V, so the old copies die and the same-commit replacements
  * survive. O(matched rows) at any table size — unmatched segments
  * are never read for a rewrite. */
private[plans] object TxLogDml {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute

  def keyColsOf(meta: CatalogTable, table: DataFrame): Seq[String] = {
    val props = CaseInsensitiveMap(meta.storage.properties)
    props.get("keyCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(table.columns.toSeq)
  }

  /** Resolve an assignment key to a real column of `cols` — simple
    * (possibly alias-qualified) names only; nested-field updates are
    * refused loudly (the format stores rows, not cells). */
  def resolveAssignKey(key: Expression, cols: Seq[String]): String = {
    val name = key match {
      case a: UnresolvedAttribute => a.nameParts.last
      case other => throw new IllegalArgumentException(
        s"graft-txlog DML: unsupported assignment target ${other.sql} — " +
          "only simple column names can be assigned")
    }
    cols.find(_.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"graft-txlog DML: assigned column '$name' is not a column of " +
          s"the target table (${cols.mkString(", ")})"))
  }

  /** Install one row-level change atomically: `tombKeys` (old key
    * values; may be empty) and `newRows` (replacement/new rows; may be
    * empty) land behind ONE manifest commit. Carries the table's
    * statsCols sidecar for the new segment, so DML-written segments
    * stay skippable. No-op when both sides are empty. */
  def commitChange(session: SparkSession, meta: CatalogTable,
      ident: TableIdentifier, tombKeys: Option[DataFrame],
      newRows: Option[DataFrame]): Unit = {
    val dir = GraftSqlParser.localPath(meta)
    // the table's CHECK constraints bind the DML-produced replacement
    // rows too (an UPDATE must not smuggle in a violating value) —
    // validated against the WRITTEN replacement segment before the
    // commit (the rows execute once, and the checked rows are the
    // rows that would land); a violation deletes every staged
    // segment and throws, so nothing commits — not even an orphan
    val checkList = CaseInsensitiveMap(meta.storage.properties)
      .get("checks")
      .map(_.split(";").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val v = TxLog.versions(dir).size
    val adds = Seq.newBuilder[String]
    tombKeys.foreach { k =>
      val seg = s"${TxLog.DeletesFamily}__seg$v"
      k.write.mode("overwrite").parquet(s"$dir/$seg")
      adds += seg
    }
    newRows.foreach { r =>
      val base = f"write__seg$v%06d"
      val props = CaseInsensitiveMap(meta.storage.properties)
      def colsOf(key: String) = props.get(key)
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
      // a `partitionBy` table's replacement rows land partitioned
      // too, so DML never degrades the layout's partition pruning
      val parts = colsOf("partitionBy")
      val segs =
        if (parts.isEmpty) {
          r.write.mode("overwrite").parquet(s"$dir/$base")
          Seq(base)
        } else TxLog.writePartitionedSegments(r, dir, parts, base,
          colsOf("statsCols"), colsOf("bloomCols"))
      try graft.sources.txlog.TxLogChecks.validateWritten(
        session, dir, segs, checkList)
      catch {
        case e: Throwable =>
          // the staged tombstone must not outlive the failed change
          adds.result().foreach { t =>
            def rm(f: java.io.File): Unit = {
              Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
              f.delete(); ()
            }
            rm(new java.io.File(dir, t))
          }
          throw e
      }
      if (parts.isEmpty) {
        TxLog.writeSegmentStats(session, dir, base, colsOf("statsCols"))
        TxLog.writeSegmentBlooms(session, dir, base, colsOf("bloomCols"))
      }
      adds ++= segs
    }
    val toAdd = adds.result()
    if (toAdd.nonEmpty) {
      TxLog.commit(dir, adds = toAdd)
      // V1 relations pin their version at creation — drop the cached
      // one so the next spark.table() sees the post-DML snapshot
      session.catalog.refreshTable(ident.quotedString)
    }
  }
}

/** `OPTIMIZE <graft-txlog table> [ZORDER BY (c1, c2, ...)]` — the
  * maintenance cadence as a SQL keystroke. Plain form:
  * [[graft.operators.AnnIndex.maintainReport]] at threshold 1 folds
  * every multi-segment family to one segment (MoR-dispatched under
  * tombstones, stats sidecars carried forward — e54's contract),
  * returning one row per compaction; a fully-compacted table returns
  * no rows (idempotent). ZORDER form: [[TxLog.compactZorder]] lays
  * the whole (plain) table out on the Morton curve of the named
  * columns — `zorderFiles` table option sets the part-file count
  * (default 8) — so selective scans on ANY clustered column prune
  * most row groups; always a rewrite (never a no-op), stats
  * recomputed for tracked ∪ zorder columns. */
case class GraftTxLogOptimize(ident: TableIdentifier,
    zorderCols: Seq[String] = Seq.empty,
    where: Option[String] = None) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{IntegerType, StringType}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("family", StringType, nullable = false)(),
      AttributeReference("version", IntegerType, nullable = false)())

  /** `WHERE` conjuncts as (partitionColumn, literal value) pairs —
    * Delta's rule: partition predicates only, equality conjunctions,
    * everything else refused loudly (a row predicate cannot scope a
    * segment-granular fold). */
  private def predPairs(session: SparkSession): Seq[(String, String)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Literal}
    def walk(e: Expression): Seq[(String, String)] = e match {
      case And(l, r) => walk(l) ++ walk(r)
      case EqualTo(a: UnresolvedAttribute, l: Literal) =>
        Seq(a.nameParts.last -> l.value.toString)
      case EqualTo(l: Literal, a: UnresolvedAttribute) =>
        Seq(a.nameParts.last -> l.value.toString)
      case other => throw new IllegalArgumentException(
        s"OPTIMIZE ${ident.table} WHERE: only conjunctions of " +
          s"<partitionColumn> = <literal> are supported, got ${other.sql}")
    }
    walk(session.sessionState.sqlParser.parseExpression(where.get))
  }

  override def run(session: SparkSession): Seq[Row] = {
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    val dir = GraftSqlParser.localPath(meta)
    if (where.isDefined) {
      // partition-scoped maintenance: fold only the hot leaves
      require(zorderCols.isEmpty,
        s"OPTIMIZE ${ident.table}: ZORDER BY cannot be combined with " +
          "WHERE — zorder is a whole-table layout")
      val keys = TxLogDml.keyColsOf(meta,
        GraftSqlParser.asOfRead(session, meta, asOf = null))
      val folded = TxLog.compactPartitionsMoR(session, dir, keys,
        predPairs(session))
      if (folded.nonEmpty)
        session.catalog.refreshTable(ident.quotedString)
      folded.map { case (vals, v) =>
        Row(vals.map(p => s"${p._1}=${p._2}").mkString("/"), v)
      }
    } else if (zorderCols.isEmpty) {
      val report = graft.operators.AnnIndex.maintainReport(session, dir,
        threshold = 1)
      if (report.compacted.nonEmpty)
        session.catalog.refreshTable(ident.quotedString)
      report.compacted.map { case (fam, v) => Row(fam, v) }
    } else {
      // whole-table clustered fold — meaningful only for plain tables
      // (an index store's families must never merge into one segment)
      val latest = TxLog.latestVersion(dir).getOrElse(sys.error(
        s"OPTIMIZE on empty table ${ident.table}"))
      val fams = TxLog.liveSegments(dir, latest)
        .map(_.split("__")(0)).distinct
        .filterNot(_ == TxLog.DeletesFamily)
      require(fams.forall(TxLog.PlainFamilies),
        s"OPTIMIZE ... ZORDER BY on ${ident.table}: the table holds " +
          s"index-store families $fams — zorder applies to plain tables")
      val props = CaseInsensitiveMap(meta.storage.properties)
      val keys = props.get("keyCols")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse {
          val delSegs = TxLog.familySegments(dir, TxLog.DeletesFamily)
          if (delSegs.isEmpty)
            TxLog.snapshot(session, dir, latest).columns.toSeq
          else {
            val keySets = delSegs.map(s => session.read
              .parquet(s"$dir/$s").schema.fieldNames.toSeq).distinct
            require(keySets.size == 1,
              s"OPTIMIZE ${ident.table}: tombstone key schemas disagree " +
                s"($keySets) — set the table's keyCols option")
            keySets.head
          }
        }
      val nFiles = props.get("zorderFiles").map(_.trim.toInt).getOrElse(8)
      // PARTITIONED tables z-order WITHIN each leaf (Delta's
      // zorder-within-partitions): folding leaves into one segment
      // would destroy the partition identity dynamic overwrite and
      // OPTIMIZE … WHERE depend on — the same hazard the plain fold
      // dispatches around
      val attributed = TxLog.liveSegments(dir, latest)
        .filterNot(_.startsWith(s"${TxLog.DeletesFamily}__"))
        .exists(s => TxLog.segmentParts(dir, s).isDefined)
      if (attributed) {
        val folded = TxLog.compactZorderAllPartitions(session, dir, keys,
          zorderCols, nFiles)
        session.catalog.refreshTable(ident.quotedString)
        folded.map { case (vals, v) =>
          Row("zorder " +
            vals.map(p => s"${p._1}=${p._2}").mkString("/"), v)
        }
      } else {
        val v = TxLog.compactZorder(session, dir, keys, zorderCols, nFiles)
        session.catalog.refreshTable(ident.quotedString)
        Seq(Row("zorder", v))
      }
    }
  }
}

/** `VACUUM <graft-txlog table> [RETAIN n VERSIONS] [RETAIN m HOURS]
  * [FORCE]` — reclaim disk from segments no retained version can
  * reach ([[TxLog.vacuum]]); RETAIN VERSIONS (default: latest only)
  * sets the version horizon, RETAIN HOURS the AGE WINDOW (Delta's
  * retention duration reduced to its core): only directories at least
  * that old are reclaimed, defaulting to [[GraftTxLogVacuum
  * .DefaultRetainHours]] — the concurrency guard. A vacuum racing an
  * in-flight writer sees the writer's staged spill (`.stage_<uuid>`)
  * and its relinked-but-not-yet-committed segment dirs as
  * unreachable orphans; at age 0 it would DELETE them and the
  * writer's subsequent commit would reference vanished directories —
  * an in-flight install's files are recent BY DEFINITION, so any
  * nonzero window protects them while genuine orphans and retired
  * segments age past it. `RETAIN 0 HOURS` therefore refuses unless
  * the statement also says FORCE (the single-maintainer escape hatch
  * — Delta's retentionDurationCheck override): immediate reclamation
  * is only safe when no write can possibly be in flight. Returns one
  * row per reclaimed directory, sorted. */
case class GraftTxLogVacuum(ident: TableIdentifier,
    retainVersions: Option[Int], retainHours: Option[Int] = None,
    force: Boolean = false) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.StringType
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("reclaimed", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    retainVersions.foreach(n => require(n >= 1,
      s"VACUUM ... RETAIN $n VERSIONS: must retain at least 1"))
    val hours = retainHours.getOrElse(GraftTxLogVacuum.DefaultRetainHours)
    require(hours > 0 || force,
      s"VACUUM ${ident.table} RETAIN 0 HOURS: an age window of zero " +
        "can reclaim a CONCURRENT writer's staged-but-uncommitted " +
        "segment directories (its commit would then reference vanished " +
        "data) — keep a nonzero window, or add FORCE if no write can " +
        "be in flight")
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    val dir = GraftSqlParser.localPath(meta)
    val vs = TxLog.versions(dir)
    require(vs.nonEmpty, s"VACUUM on empty table ${ident.table}")
    val keepFrom = retainVersions
      .map(n => vs.drop(math.max(0, vs.size - n)).head)
      .getOrElse(vs.last)
    TxLog.vacuum(dir, keepFrom, minAgeMs = hours * 3600L * 1000L)
      .map(Row(_))
  }
}

object GraftTxLogVacuum {
  /** Default age window for SQL VACUUM — one hour: far longer than
    * any install's stage-to-commit span, far shorter than any
    * retention a real lake would configure. */
  val DefaultRetainHours = 1
}

/** `DESCRIBE HISTORY <graft-txlog table>` — the commit log as rows
  * (version, adds, removes, data_change), newest first (Delta's
  * ordering). Segment lists are comma-joined in commit order. */
case class GraftTxLogHistory(ident: TableIdentifier)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{BooleanType, IntegerType, StringType,
    TimestampType}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("version", IntegerType, nullable = false)(),
      AttributeReference("timestamp", TimestampType, nullable = false)(),
      AttributeReference("adds", StringType, nullable = false)(),
      AttributeReference("removes", StringType, nullable = false)(),
      AttributeReference("data_change", BooleanType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    val dir = GraftSqlParser.localPath(meta)
    TxLog.history(dir).reverse.map { case (v, adds, removes, dc) =>
      Row(v, new java.sql.Timestamp(TxLog.commitTimeMillis(dir, v)),
        adds.mkString(","), removes.mkString(","), dc)
    }
  }
}

/** `SHOW PARTITIONS <graft-txlog table>` — partition observability
  * from the `parts-` sidecars alone: one row per live partition
  * value-set with its segment/file/row/byte tallies, O(metadata) at
  * any table size (sidecar JSON reads + directory listings; row
  * counts ride the stats sidecars' `__rows`, falling back to parquet
  * FOOTER metadata — never a Spark job, never a data page). Rows are
  * the STORED tallies (pre-MoR: live tombstones are not subtracted —
  * they are listed as their own `deletes` row so the masking is
  * visible instead of silently folded). Empty-batch markers belong to
  * no value and are skipped. A table with no partition-attributed
  * segments refuses, naming the repartition verb (Delta's
  * not-partitioned error). Ordered by partition value. */
case class GraftTxLogShowPartitions(ident: TableIdentifier)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("partition", StringType, nullable = false)(),
      AttributeReference("segments", IntegerType, nullable = false)(),
      AttributeReference("files", IntegerType, nullable = false)(),
      AttributeReference("rows", LongType, nullable = false)(),
      AttributeReference("bytes", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    val dir = GraftSqlParser.localPath(meta)
    val latest = TxLog.latestVersion(dir).getOrElse(
      sys.error(s"SHOW PARTITIONS on empty table ${ident.table}"))
    val (delSegs, dataSegs) = TxLog.liveSegments(dir, latest)
      .partition(_.startsWith(s"${TxLog.DeletesFamily}__"))
    val withParts = dataSegs.map(s => s -> TxLog.segmentParts(dir, s))
    val attributed = withParts.collect {
      case (s, Some(ps)) if ps.nonEmpty => (s, ps) }
    require(attributed.nonEmpty,
      s"SHOW PARTITIONS ${ident.table}: the table has no partition-" +
        "attributed segments — it is not partitioned (write with " +
        "option(partitionBy=…) or run OPTIMIZE … REPARTITION BY)")
    def shapeRow(name: String, segs: Seq[String]): Row = {
      val shapes = segs.map(TxLog.segmentShape(session, dir, _))
      Row(name, segs.size, shapes.map(_._1).sum,
        shapes.map(_._3).sum, shapes.map(_._2).sum)
    }
    val leaves = attributed
      .groupBy(_._2.map(p => s"${p._1}=${p._2}").mkString("/"))
      .toSeq.sortBy(_._1)
      .map { case (name, group) => shapeRow(name, group.map(_._1)) }
    // live tombstones surface as their own row — the masking is
    // visible, never silently folded into the per-leaf tallies
    val dels =
      if (delSegs.isEmpty) Seq.empty else Seq(shapeRow("deletes", delSegs))
    leaves ++ dels
  }
}

/** `DESCRIBE DETAIL <graft-txlog table>` — Delta's one-row table
  * summary from the log's metadata alone: format, location, the
  * partition layout (from the live segments' `parts-` sidecars),
  * segment/file/row/byte tallies and the current version — all
  * O(metadata) (sidecars + directory listings + parquet footers,
  * never a Spark job). `num_rows` is the STORED tally (pre-MoR);
  * `num_tombstones` makes live masking visible next to it. */
case class GraftTxLogDescribeDetail(ident: TableIdentifier)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("format", StringType, nullable = false)(),
      AttributeReference("location", StringType, nullable = false)(),
      AttributeReference("partition_columns", StringType, nullable = false)(),
      AttributeReference("num_segments", IntegerType, nullable = false)(),
      AttributeReference("num_files", IntegerType, nullable = false)(),
      AttributeReference("num_rows", LongType, nullable = false)(),
      AttributeReference("size_bytes", LongType, nullable = false)(),
      AttributeReference("num_tombstones", IntegerType, nullable = false)(),
      AttributeReference("version", IntegerType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    val dir = GraftSqlParser.localPath(meta)
    val latest = TxLog.latestVersion(dir).getOrElse(
      sys.error(s"DESCRIBE DETAIL on empty table ${ident.table}"))
    val (delSegs, dataSegs) = TxLog.liveSegments(dir, latest)
      .partition(_.startsWith(s"${TxLog.DeletesFamily}__"))
    val partCols = dataSegs.flatMap(s => TxLog.segmentParts(dir, s))
      .filter(_.nonEmpty).map(_.map(_._1)).distinct
    val shapes = dataSegs.map(TxLog.segmentShape(session, dir, _))
    Seq(Row("graft-txlog", dir,
      partCols.headOption.map(_.mkString(",")).getOrElse(""),
      dataSegs.size, shapes.map(_._1).sum, shapes.map(_._3).sum,
      shapes.map(_._2).sum, delSegs.size, latest))
  }
}

/** `RESTORE TABLE <graft-txlog table> TO VERSION AS OF n` — re-point
  * the head at a historical state as ONE new commit, history intact
  * ([[TxLog.restore]]): metadata-only (O(1) data work — re-add the
  * retired segments, remove the head's extras) when the target state
  * has no live tombstones; a materializing rewrite of the target's
  * MoR snapshot when it does (re-adding a tombstone at the restore
  * version would mis-order it against every data segment). Returns
  * one row: (restored_to, committed_version, mode) with mode ∈
  * {metadata, rewrite, noop}. Restorability is bounded by the vacuum
  * horizon — a reclaimed target segment fails loudly (Delta's rule).
  * The restore is a data commit that removes segments, so incremental
  * consumers must re-snapshot across it. */
case class GraftTxLogRestore(ident: TableIdentifier, toVOpt: Option[Int],
    toTs: Option[String]) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{IntegerType, StringType}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("restored_to", IntegerType, nullable = false)(),
      AttributeReference("committed_version", IntegerType, nullable = true)(),
      AttributeReference("mode", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    val dir = GraftSqlParser.localPath(meta)
    // `TO TIMESTAMP AS OF` resolves through the same manifest
    // commit-time spine as SELECT's TIMESTAMP AS OF (greatest commit
    // ≤ the clock reading — Delta's rule), then restores that version
    val toV = toVOpt.getOrElse {
      val lit = org.apache.spark.sql.catalyst.expressions.Literal(
        toTs.getOrElse(sys.error("RESTORE: no version or timestamp")))
      TxLog.versionAtTimestamp(dir,
        GraftSqlParser.evalTimestampMillis(session, lit))
    }
    // keys are needed only by the materialize path: the declared
    // keyCols option, else the TARGET state's own tombstone schemas
    // (a commitDeletes segment holds exactly the keys)
    val keys = CaseInsensitiveMap(meta.storage.properties).get("keyCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse {
        val delSegs = TxLog.liveSegments(dir, toV)
          .filter(_.startsWith(s"${TxLog.DeletesFamily}__"))
        val keySets = delSegs.map(s => session.read
          .parquet(s"$dir/$s").schema.fieldNames.toSeq).distinct
        if (keySets.size == 1) keySets.head else Seq.empty
      }
    val res = TxLog.restore(session, dir, toV, keys)
    if (res.isDefined) session.catalog.refreshTable(ident.quotedString)
    res match {
      case Some((v, mode)) => Seq(Row(toV, v, mode))
      case None => Seq(Row(toV, null, "noop"))
    }
  }
}

/** `CONVERT TO GRAFT parquet.`/path/to/dir` [PARTITIONED BY (c, …)]`
  * — adopt an existing plain-parquet directory as a txlog table IN
  * PLACE, zero bytes copied ([[TxLog.convertInPlace]]: the part files
  * are hard-linked into a v0 segment — at 100 TB the only acceptable
  * migration cost is O(files) metadata operations). A HIVE-PARTITIONED
  * layout (`col=value` subdirectories) adopts through
  * [[TxLog.convertPartitionedInPlace]] — one hard-linked segment per
  * leaf, partition values materialized as columns at read time and
  * recorded as point ranges in the stats sidecars so partition
  * predicates prune by segment; the layout is AUTO-DETECTED, and a
  * `PARTITIONED BY` clause (Delta's spelling) is validated against
  * the detected columns. Returns one row per adopted segment:
  * (segment, files_linked, version). The directory can then be
  * registered as a catalog table (`CREATE TABLE t USING graft-txlog
  * OPTIONS (path ...)`) and used with the full SQL surface. */
case class GraftTxLogConvert(path: String,
    partitionedBy: Option[Seq[String]] = None) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{IntegerType, StringType}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("segment", StringType, nullable = false)(),
      AttributeReference("files_linked", IntegerType, nullable = false)(),
      AttributeReference("version", IntegerType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val local = if (path.startsWith("file:"))
      new java.net.URI(path).getPath else path
    val hasLoose = new java.io.File(local).listFiles() != null &&
      new java.io.File(local).listFiles().exists(f =>
        f.isFile && f.getName.endsWith(".parquet") &&
          !f.getName.startsWith("."))
    if (hasLoose) {
      require(partitionedBy.isEmpty,
        s"CONVERT $path: PARTITIONED BY given but the directory holds " +
          "top-level parquet files (a flat layout)")
      val (seg, n) = TxLog.convertInPlace(session, local)
      Seq(Row(seg, n, 0))
    } else {
      partitionedBy.foreach { declared =>
        val detected = TxLog.detectPartitionColumns(local)
        require(declared == detected,
          s"CONVERT $path: PARTITIONED BY $declared does not match the " +
            s"detected layout $detected — nothing was converted")
      }
      val segs = TxLog.convertPartitionedInPlace(session, local)
      segs.map { case (seg, n) => Row(seg, n, 0) }
    }
  }
}

/** `ALTER TABLE <graft-txlog table> ADD COLUMN[S] (c TYPE, …)` — the
  * DDL spelling of the schema evolution the format reader already
  * does (mergeSchema): the widened schema lands as TABLE METADATA
  * (`_meta/widen.json` via [[TxLog.widenSchema]]), never a data
  * rewrite — at 100 TB adding a column must be O(1). Pre-evolution
  * segments read the column as a typed NULL; post-ALTER writes carry
  * it physically (positional INSERT aligns against the widened
  * relation schema), and the generations merge by name. Nullable,
  * top-level, default-free columns only; adding a name the table
  * already has — or re-declaring a widened name with a different
  * type — fails loudly (a type change is a rewrite, not evolution).
  * Returns one row per added column: (column, type). */
case class GraftTxLogAddColumns(ident: TableIdentifier,
    cols: Seq[(String, org.apache.spark.sql.types.DataType)])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.StringType
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("column", StringType, nullable = false)(),
      AttributeReference("type", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    require(cols.nonEmpty, s"ALTER TABLE ${ident.table}: no columns to add")
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    val dir = GraftSqlParser.localPath(meta)
    val existing = GraftSqlParser.asOfRead(session, meta, asOf = null)
      .schema.fields
    // validate EVERY column first, then record them behind ONE atomic
    // metadata write (widenSchemaAll) — a failure on a later column
    // must never leave an earlier one half-recorded in widen.json
    // while the catalog schema was never updated
    cols.foreach { case (n, dt) =>
      existing.find(_.name.equalsIgnoreCase(n)).foreach { f =>
        require(f.dataType == dt,
          s"ALTER TABLE ${ident.table}: column '$n' already exists as " +
            s"${f.dataType.sql} — a column-TYPE change is not schema " +
            "evolution; rewrite the table")
        throw new IllegalArgumentException(
          s"ALTER TABLE ${ident.table}: column '$n' already exists")
      }
    }
    TxLog.widenSchemaAll(dir, cols.map { case (n, dt) => n -> dt.sql })
    // the catalog stores the CREATE-time schema and Spark verifies a
    // data-source relation against it — record the widened schema
    // there too (what AlterTableAddColumnsCommand does natively)
    session.sessionState.catalog.alterTableDataSchema(ident,
      org.apache.spark.sql.types.StructType(
        meta.dataSchema.fields ++ cols.map { case (n, dt) =>
          org.apache.spark.sql.types.StructField(n, dt, nullable = true)
        }))
    session.catalog.refreshTable(ident.quotedString)
    cols.map { case (n, dt) => Row(n, dt.sql) }
  }
}

/** `ALTER TABLE <graft-txlog table> DROP COLUMN[S] (c, …)` — the O(1)
  * reverse of ADD COLUMNS: the dropped names land as TABLE METADATA
  * (`_meta/dropped.json` via [[TxLog.dropColumnsMeta]]), never a data
  * rewrite — readers PROJECT the columns away after the snapshot, the
  * bytes stay in the committed segments (reclaiming them is a rewrite
  * plus vacuum, Delta's rule without column mapping). Re-ADDING a
  * dropped name refuses loudly (pre-drop segments still hold the old
  * values, which would silently resurrect). Key and partition columns
  * refuse — the MoR anti-join and the layout verbs depend on them.
  * Returns one row per dropped column. */
case class GraftTxLogDropColumns(ident: TableIdentifier,
    cols: Seq[String], ifExists: Boolean = false)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.StringType
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("column", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    require(cols.nonEmpty, s"ALTER TABLE ${ident.table}: no columns to drop")
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    val dir = GraftSqlParser.localPath(meta)
    val rel = GraftSqlParser.asOfRead(session, meta, asOf = null)
    val have = rel.columns.toSeq
    val props = CaseInsensitiveMap(meta.storage.properties)
    val keyCols = props.get("keyCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val partCols = props.get("partitionBy")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    // IF EXISTS: missing names fall out of the statement (SQL's
    // contract); without it a missing name refuses loudly below
    val toDrop =
      if (!ifExists) cols
      else cols.filter(n => have.exists(_.equalsIgnoreCase(n)))
    if (toDrop.isEmpty) return Seq.empty
    toDrop.foreach { n =>
      require(have.exists(_.equalsIgnoreCase(n)),
        s"ALTER TABLE ${ident.table}: column '$n' does not exist " +
          s"(columns: ${have.mkString(", ")})")
      require(!keyCols.exists(_.equalsIgnoreCase(n)),
        s"ALTER TABLE ${ident.table}: column '$n' is a key column " +
          "(keyCols option) — row-level deletes anti-join on it; " +
          "change the table's keys before dropping it")
      require(!partCols.exists(_.equalsIgnoreCase(n)),
        s"ALTER TABLE ${ident.table}: column '$n' is a partition " +
          "column — dropping it would strand the table's layout; " +
          "repartition first")
      require(have.count(c => !toDrop.exists(_.equalsIgnoreCase(c))) > 0,
        s"ALTER TABLE ${ident.table}: cannot drop every column")
    }
    // the two mutations (dropped.json, catalog schema) must not come
    // apart: if the catalog update throws after dropped.json landed,
    // reads would already project the column away while the catalog
    // still declares it — and the DDL could not be retried (double-
    // drop refuses). Snapshot the _meta files first and roll them
    // back on a catalog failure, so a failed ALTER leaves NOTHING
    // half-applied and the statement stays retryable.
    val metaDir = java.nio.file.Paths.get(dir, "_meta")
    def readOpt(n: String): Option[Array[Byte]] = {
      val p = metaDir.resolve(n)
      if (java.nio.file.Files.isRegularFile(p))
        Some(java.nio.file.Files.readAllBytes(p))
      else None
    }
    val prevDropped = readOpt("dropped.json")
    val prevWiden = readOpt("widen.json")
    TxLog.dropColumnsMeta(dir, toDrop)
    try {
      // alterTableSchema, not alterTableDataSchema: the latter refuses
      // any schema that REMOVES a column (it exists for ADD), while the
      // drop is exactly a removal (these tables carry no catalog-level
      // partitioning, so full schema = data schema)
      session.sessionState.catalog.alterTableSchema(ident,
        org.apache.spark.sql.types.StructType(
          meta.schema.fields.filterNot(f =>
            toDrop.exists(_.equalsIgnoreCase(f.name)))))
    } catch {
      case e: Throwable =>
        def restore(n: String, prev: Option[Array[Byte]]): Unit = prev match {
          case Some(b) =>
            java.nio.file.Files.write(metaDir.resolve(n), b); ()
          case None =>
            java.nio.file.Files.deleteIfExists(metaDir.resolve(n)); ()
        }
        restore("dropped.json", prevDropped)
        restore("widen.json", prevWiden)
        throw e
    }
    session.catalog.refreshTable(ident.quotedString)
    toDrop.map(Row(_))
  }
}

/** `ALTER TABLE <graft-txlog table> RENAME COLUMN a TO b` — Delta's
  * column-mapping layer reduced to this format's core
  * ([[TxLog.renameColumnMeta]]): the rename is TABLE METADATA
  * (`_meta/renames.json`) anchored to a dedicated empty metadata
  * commit, never a data rewrite — at 100 TB renaming a column must be
  * O(1) exactly like adding or dropping one. Committed segments keep
  * the column under its PHYSICAL (write-time) name; readers re-map
  * per segment (renames apply to segments added before the anchor,
  * for reads pinned at or above it), so time travel below the anchor
  * reads the OLD name, post-rename writes carry the new name
  * physically, and re-ADDING the old name works (old segments map
  * their physical column away first and read the re-added one as
  * typed NULL). Key and partition columns refuse (the MoR anti-join
  * and the layout verbs depend on them); a name referenced by the
  * table's CHECK constraints refuses (the checks would silently stop
  * binding); renaming ONTO a dropped name refuses (pre-drop segments
  * still store values under it). The table's statsCols/bloomCols
  * option lists follow the rename so NEW segments keep recording
  * skipping sidecars; old sidecars stay keyed physically and the
  * pruning path re-keys them per segment. Returns one row:
  * (column, renamed_to, version). */
case class GraftTxLogRenameColumn(ident: TableIdentifier,
    from: String, to: String) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{IntegerType, StringType}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("column", StringType, nullable = false)(),
      AttributeReference("renamed_to", StringType, nullable = false)(),
      AttributeReference("version", IntegerType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    val dir = GraftSqlParser.localPath(meta)
    val rel = GraftSqlParser.asOfRead(session, meta, asOf = null)
    val have = rel.columns.toSeq
    val src = have.find(_.equalsIgnoreCase(from)).getOrElse(
      throw new IllegalArgumentException(
        s"ALTER TABLE ${ident.table}: column '$from' does not exist " +
          s"(columns: ${have.mkString(", ")})"))
    require(!have.exists(_.equalsIgnoreCase(to)),
      s"ALTER TABLE ${ident.table}: column '$to' already exists")
    require(!TxLog.droppedColumns(dir).exists(_.equalsIgnoreCase(to)),
      s"ALTER TABLE ${ident.table}: column '$to' was DROPPED — " +
        "pre-drop segments still store values under that physical " +
        "name, which a rename onto it would silently resurrect; use " +
        "a fresh name")
    val props = CaseInsensitiveMap(meta.storage.properties)
    def colsOf(key: String) = props.get(key)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    require(!colsOf("keyCols").exists(_.equalsIgnoreCase(from)),
      s"ALTER TABLE ${ident.table}: column '$from' is a key column " +
        "(keyCols option) — row-level deletes anti-join on it under " +
        "its physical name; change the table's keys first")
    require(!colsOf("partitionBy").exists(_.equalsIgnoreCase(from)),
      s"ALTER TABLE ${ident.table}: column '$from' is a partition " +
        "column — the layout's value sidecars record it under its " +
        "physical name; repartition first")
    val checksRefs = TxLogChecksNames.parse(props.get("checks"))
      .filter(c => ("""(?i)(?<![\w`])""" +
        java.util.regex.Pattern.quote(from) + """(?![\w`])""").r
        .findFirstIn(c).isDefined)
    require(checksRefs.isEmpty,
      s"ALTER TABLE ${ident.table}: column '$from' is referenced by " +
        s"the table's CHECK constraints (${checksRefs.mkString("; ")}) " +
        "— the checks would silently stop binding; update the checks " +
        "option first")
    // metadata first, catalog second, with rollback — a catalog
    // failure must not leave reads already re-mapping while the
    // catalog still declares the old name (the DropColumns rule; the
    // empty anchor commit itself is harmless to leave behind)
    val metaDir = java.nio.file.Paths.get(dir, "_meta")
    def readOpt(n: String): Option[Array[Byte]] = {
      val p = metaDir.resolve(n)
      if (java.nio.file.Files.isRegularFile(p))
        Some(java.nio.file.Files.readAllBytes(p))
      else None
    }
    val prevRenames = readOpt("renames.json")
    val prevWiden = readOpt("widen.json")
    val v = TxLog.renameColumnMeta(dir, src, to)
    try {
      session.sessionState.catalog.alterTableSchema(ident,
        org.apache.spark.sql.types.StructType(meta.schema.fields.map(f =>
          if (f.name.equalsIgnoreCase(from)) f.copy(name = to) else f)))
      // statsCols/bloomCols follow the rename: new segments record
      // their sidecars under the name the data now carries
      val follows = Seq("statsCols", "bloomCols").flatMap { k =>
        val cur = colsOf(k)
        if (cur.exists(_.equalsIgnoreCase(from)))
          Some(k -> cur.map(c =>
            if (c.equalsIgnoreCase(from)) to else c).mkString(","))
        else None
      }
      if (follows.nonEmpty) {
        val updated = meta.storage.copy(
          properties = meta.storage.properties ++ follows)
        session.sessionState.catalog.alterTable(
          session.sessionState.catalog.getTableMetadata(ident)
            .copy(storage = updated))
      }
    } catch {
      case e: Throwable =>
        def restore(n: String, prev: Option[Array[Byte]]): Unit =
          prev match {
            case Some(b) =>
              java.nio.file.Files.write(metaDir.resolve(n), b); ()
            case None =>
              java.nio.file.Files.deleteIfExists(metaDir.resolve(n)); ()
          }
        restore("renames.json", prevRenames)
        restore("widen.json", prevWiden)
        throw e
    }
    session.catalog.refreshTable(ident.quotedString)
    Seq(Row(src, to, v))
  }
}

/** Shared checks-option split (semicolon-separated SQL expressions). */
private[plans] object TxLogChecksNames {
  def parse(opt: Option[String]): Seq[String] =
    opt.map(_.split(";").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
}

/** `OPTIMIZE <graft-txlog table> REPARTITION BY (c1, …)` — the
  * in-place plain→partitioned migration ([[TxLog.repartitionTable]]):
  * every live UNATTRIBUTED data segment is rewritten into one segment
  * per partition value behind ONE atomic dataChange=false commit, so
  * the "fully partitioned" precondition of dynamic partition
  * overwrite and `OPTIMIZE … WHERE` becomes reachable for adopted /
  * legacy tables; already-attributed leaves (and their inodes) are
  * untouched, and every pre-repartition version stays
  * time-travelable. Returns one row per new leaf segment. */
case class GraftTxLogRepartition(ident: TableIdentifier,
    cols: Seq[String]) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{IntegerType, StringType}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("segment", StringType, nullable = false)(),
      AttributeReference("partition", StringType, nullable = false)(),
      AttributeReference("version", IntegerType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    val dir = GraftSqlParser.localPath(meta)
    val keys = TxLogDml.keyColsOf(meta,
      GraftSqlParser.asOfRead(session, meta, asOf = null))
    TxLog.repartitionTable(session, dir, cols, keys) match {
      case None => Seq.empty // already fully partitioned — idempotent
      case Some((segs, v)) =>
        // partition columns now surface LAST in the relation schema
        // (the leaf data files physically lack them — the same
        // convention as e72's native partitioned writes); the catalog
        // pins the CREATE-time order and Spark verifies a data-source
        // relation against it, so record the reordered schema
        session.sessionState.catalog.alterTableDataSchema(ident,
          GraftSqlParser.asOfRead(session, meta, asOf = null).schema)
        // a LAYOUT CHANGE must re-point the table's partitionBy
        // option too, or every later INSERT/dynamic-overwrite would
        // stage under the RETIRED layout and poison the one-layout
        // invariant the migration just established
        val declared = CaseInsensitiveMap(meta.storage.properties)
          .get("partitionBy")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        if (declared.exists(_ != cols)) {
          val cur = session.sessionState.catalog.getTableMetadata(ident)
          session.sessionState.catalog.alterTable(cur.copy(storage =
            cur.storage.copy(properties = cur.storage.properties +
              ("partitionBy" -> cols.mkString(",")))))
        }
        session.catalog.refreshTable(ident.quotedString)
        segs.map { seg =>
          val vals = TxLog.segmentParts(dir, seg).getOrElse(Seq.empty)
            .map(p => s"${p._1}=${p._2}").mkString("/")
          Row(seg, vals, v)
        }
    }
  }
}

/** `CREATE TABLE <new> SHALLOW CLONE <graft-txlog table> [LOCATION
  * '/path']` — a new catalog table over a ZERO-COPY clone of the
  * source's live state ([[TxLog.cloneTable]]: live segments
  * hard-linked under fresh names, original commit order replayed so
  * MoR tombstones keep their relative version ordering, stats
  * sidecars carried). The clone inherits the source's table OPTIONS
  * (keyCols, statsCols, …) and diverges freely from its first write.
  * Location defaults to the session warehouse path for the new table
  * name. Returns one row: (commits_replayed, location). */
case class GraftTxLogClone(target: TableIdentifier,
    source: TableIdentifier, location: Option[String])
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{IntegerType, StringType}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("commits_replayed", IntegerType, nullable = false)(),
      AttributeReference("location", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val catalog = session.sessionState.catalog
    require(!catalog.tableExists(target),
      s"SHALLOW CLONE: target table ${target.quotedString} already exists")
    val srcMeta = catalog.getTableMetadata(source)
    val srcDir = GraftSqlParser.localPath(srcMeta)
    val dstDir = location.map(l => if (l.startsWith("file:"))
      new java.net.URI(l).getPath else l)
      .getOrElse(catalog.defaultTablePath(target).getPath)
    val commits = TxLog.cloneTable(srcDir, dstDir)
    val opts = (srcMeta.storage.properties - "path" - "PATH" + ("path" -> dstDir))
      .map { case (k, v) => s"$k '${v.replace("'", "''")}'" }
      .mkString(", ")
    session.sql(s"CREATE TABLE ${target.quotedString} " +
      s"USING `graft-txlog` OPTIONS ($opts)")
    Seq(Row(commits, dstDir))
  }
}

case class GraftTxLogDelete(ident: TableIdentifier, alias: Option[String],
    predicate: PredicateHolder) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    val dir = GraftSqlParser.localPath(meta)
    // the MoR-by-default read: already-deleted rows can't re-match
    val base = GraftSqlParser.asOfRead(session, meta, asOf = null)
    val table = alias.map(base.alias).getOrElse(base)
    val keys = TxLogDml.keyColsOf(meta, base)
    val matched = table.filter(Bridge.column(predicate.e))
      .select(keys.map(col): _*).distinct()
    if (!matched.isEmpty) {
      TxLog.commitDeletes(matched, dir)
      session.catalog.refreshTable(ident.quotedString)
    }
    Seq.empty
  }
}

/** `UPDATE <graft-txlog table> SET c = expr, ... [WHERE p]` — matched
  * rows are rewritten as one scan: their OLD key values become the
  * tombstone segment, their assigned projections the replacement
  * segment, both behind ONE atomic commit ([[TxLogDml.commitChange]]).
  * Assigned values cast to the column's existing type (an UPDATE must
  * never be a covert schema change). A predicate matching nothing
  * commits nothing. */
case class GraftTxLogUpdate(ident: TableIdentifier, alias: Option[String],
    assignments: AssignmentsHolder, predicate: PredicateHolder)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    val base = GraftSqlParser.asOfRead(session, meta, asOf = null)
    val table = alias.map(base.alias).getOrElse(base)
    val assigned: Map[String, Expression] = assignments.a.map(a =>
      TxLogDml.resolveAssignKey(a.key, base.columns.toSeq) -> a.value).toMap
    val matched = table.filter(Bridge.column(predicate.e))
    val keys = TxLogDml.keyColsOf(meta, base)
    // tombstone rides the PRE-assignment key values: updating a key
    // column must kill the row under its old identity
    val tomb = matched.select(keys.map(col): _*).distinct()
    val updated = matched.select(base.schema.fields.map { f =>
      assigned.get(f.name) match {
        case Some(v) => Bridge.column(v).cast(f.dataType).as(f.name)
        case None => col(f.name)
      }
    }.toSeq: _*)
    if (!matched.isEmpty)
      TxLogDml.commitChange(session, meta, ident, Some(tomb), Some(updated))
    Seq.empty
  }
}

/** `MERGE INTO <graft-txlog table> t USING <source> s ON <cond>` with
  * `WHEN MATCHED [AND c] THEN UPDATE SET …|DELETE`, `WHEN NOT MATCHED
  * [AND c] THEN INSERT …`, and `WHEN NOT MATCHED BY SOURCE [AND c]
  * THEN UPDATE …|DELETE` — Delta's MERGE shape on the txlog format,
  * first-match-wins across each clause list, `*` actions mapped by
  * name. Execution is join-shaped and O(|target ⋈ source| + |source|):
  * one inner join drives the matched clauses, two anti-joins the
  * not-matched sides; every produced row casts to the target schema.
  * The whole statement lands as ONE tombstone segment (old keys of
  * every updated/deleted row) plus ONE data segment (updated +
  * inserted rows) behind ONE atomic commit — a crash mid-merge leaves
  * the table at its previous version, and no reader ever sees a
  * half-merged state. Delta's cardinality rule is enforced: a target
  * row matching several source rows fails loudly instead of
  * duplicating. */
case class GraftTxLogMerge(ident: TableIdentifier, alias: Option[String],
    merge: MergeHolder) extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction,
    InsertAction, InsertStarAction, MergeAction, UpdateAction,
    UpdateStarAction}
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions.lit

  override def run(session: SparkSession): Seq[Row] = {
    val meta = session.sessionState.catalog.getTableMetadata(ident)
    val base = GraftSqlParser.asOfRead(session, meta, asOf = null)
    val tgt = alias.map(base.alias).getOrElse(base)
    val src = Bridge.ofRows(session, merge.source)
    val cond = Bridge.column(merge.cond)
    val keys = TxLogDml.keyColsOf(meta, base)
    val fields = base.schema.fields.toSeq

    // ---- WHEN MATCHED: one inner join drives updates AND deletes
    val pairs = tgt.join(src, cond, "inner")
    def tKey(k: String): Column = tgt(k) // disambiguated via plan ids
    def firstMatchWins(actions: Seq[MergeAction])
        : Seq[(Column, MergeAction)] = {
      var remaining: Column = lit(true)
      actions.map { a =>
        val c = a.condition.map(Bridge.column).getOrElse(lit(true))
        val fires = remaining && c
        remaining = remaining && !c
        (fires, a)
      }
    }
    def projected(df: DataFrame, assigned: Map[String, Expression],
        matchedSide: Boolean): DataFrame =
      df.select(fields.map { f =>
        assigned.get(f.name) match {
          case Some(v) => Bridge.column(v).cast(f.dataType).as(f.name)
          case None =>
            if (matchedSide) tgt(f.name).as(f.name) // unassigned: keep
            else lit(null).cast(f.dataType).as(f.name) // insert: null-fill
        }
      }: _*)
    def assignedOf(a: MergeAction): Map[String, Expression] = a match {
      case ua: UpdateAction => ua.assignments.map(x =>
        TxLogDml.resolveAssignKey(x.key, base.columns.toSeq) -> x.value).toMap
      case ia: InsertAction => ia.assignments.map(x =>
        TxLogDml.resolveAssignKey(x.key, base.columns.toSeq) -> x.value).toMap
      case _ => Map.empty
    }
    // `UPDATE SET *` / `INSERT *`: every target column from the
    // source's same-named column (the CDC upsert shorthand)
    def starAssigned: Map[String, Expression] = fields.map(f =>
      f.name -> Bridge.expression(src(f.name))).toMap

    val matchedFired = firstMatchWins(merge.matchedActions)
    val anyMatchedFires = matchedFired.map(_._1)
      .foldLeft(lit(false))(_ || _)
    // Delta's cardinality rule: an update/delete of a target row fed
    // by TWO source rows is ambiguous — fail, never duplicate
    if (merge.matchedActions.nonEmpty) {
      val dup = pairs.filter(anyMatchedFires)
        .groupBy(keys.map(tKey): _*)
        .count().filter(col("count") > 1).limit(1)
      require(dup.isEmpty,
        s"MERGE into ${ident.table}: a target row matches multiple " +
          "source rows — deduplicate the source or tighten the ON clause")
    }
    val tombMatched =
      if (merge.matchedActions.isEmpty) None
      else Some(pairs.filter(anyMatchedFires)
        .select(keys.map(k => tKey(k).as(k)): _*))
    val updatedRows = matchedFired.collect {
      case (fires, ua: UpdateAction) =>
        projected(pairs.filter(fires),
          if (ua.fromStar) starAssigned else assignedOf(ua),
          matchedSide = true)
      case (fires, _: UpdateStarAction) =>
        projected(pairs.filter(fires), starAssigned, matchedSide = true)
      // DeleteAction contributes to the tombstone only
    }

    // ---- WHEN NOT MATCHED (by target): insert from the source side
    val srcOnly = src.join(tgt, cond, "left_anti")
    val insertedRows = firstMatchWins(merge.notMatchedActions).map {
      case (fires, ia: InsertAction) =>
        projected(srcOnly.filter(fires), assignedOf(ia), matchedSide = false)
      case (fires, _: InsertStarAction) =>
        projected(srcOnly.filter(fires), starAssigned, matchedSide = false)
      case (_, other) => throw new IllegalArgumentException(
        s"MERGE into ${ident.table}: unsupported NOT MATCHED action $other")
    }

    // ---- WHEN NOT MATCHED BY SOURCE: update/delete unmatched target
    val nbs = firstMatchWins(merge.notMatchedBySourceActions)
    val tgtOnly =
      if (nbs.isEmpty) null else tgt.join(src, cond, "left_anti")
    val anyNbsFires = nbs.map(_._1).foldLeft(lit(false))(_ || _)
    val tombNbs =
      if (nbs.isEmpty) None
      else Some(tgtOnly.filter(anyNbsFires).select(keys.map(col): _*))
    val nbsUpdatedRows = nbs.collect {
      case (fires, ua: UpdateAction) =>
        // no source columns in scope here — assignments must be
        // target-only expressions, which resolve against tgtOnly
        projected(tgtOnly.filter(fires),
          if (ua.fromStar) throw new IllegalArgumentException(
            "MERGE: UPDATE SET * is meaningless NOT MATCHED BY SOURCE")
          else assignedOf(ua), matchedSide = true)
      case (_, other) if !other.isInstanceOf[DeleteAction] =>
        throw new IllegalArgumentException(
          s"MERGE into ${ident.table}: unsupported NOT MATCHED BY SOURCE " +
            s"action $other")
    }

    val tomb = (tombMatched.toSeq ++ tombNbs.toSeq)
      .reduceOption(_ unionByName _).map(_.distinct())
    val news = (updatedRows ++ insertedRows ++ nbsUpdatedRows)
      .reduceOption(_ unionByName _)
    TxLogDml.commitChange(session, meta, ident,
      tomb.filterNot(_.isEmpty), news.filterNot(_.isEmpty))
    Seq.empty
  }
}
